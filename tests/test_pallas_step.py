"""Fused whole-step kernel numerics vs the XLA decode_step (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from chattts_tpu.config import GPTConfig
from chattts_tpu.models import llama
from chattts_tpu.ops import pallas_step

CFG = GPTConfig(
    hidden_size=128,
    intermediate_size=256,
    num_attention_heads=2,
    num_hidden_layers=3,
    max_position_embeddings=128,
    num_audio_tokens=626,
    num_text_tokens=300,
    num_vq=4,
)
B, T = 2, 32


def _setup(seed=0, cur=11, lo_vals=(0, 3)):
    params = llama.init_params(jax.random.PRNGKey(seed), CFG)
    packed = pallas_step.pack_step_params(params, CFG)
    k0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.num_attention_heads,
                                                   CFG.head_dim), jnp.bfloat16)
    v0 = jax.random.normal(jax.random.PRNGKey(2), (B, T, CFG.num_attention_heads,
                                                   CFG.head_dim), jnp.bfloat16)
    cache = llama.KVCache(
        tuple(k0 for _ in range(CFG.num_hidden_layers)),
        tuple(v0 for _ in range(CFG.num_hidden_layers)))
    emb = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.hidden_size),
                            jnp.float32) * 0.3
    lo = jnp.asarray(lo_vals, jnp.int32)
    # key_valid for the reference path: [lo, cur] inclusive once written
    slots = np.arange(T)
    kv = jnp.asarray((slots[None, :] >= np.asarray(lo_vals)[:, None])
                     & (slots[None, :] <= cur))
    pos = jnp.full((B,), cur, jnp.int32) - lo  # rope positions differ per row
    return params, packed, cache, emb, lo, kv, pos


def test_rope_rotate_matrix_matches_apply_rope():
    HD = CFG.num_attention_heads * CFG.head_dim
    R = pallas_step.rope_rotate_matrix(CFG.head_dim, HD)
    x = np.random.default_rng(0).standard_normal((B, HD)).astype(np.float32)
    xh = x.reshape(B, CFG.num_attention_heads, CFG.head_dim)
    half = CFG.head_dim // 2
    expect = np.concatenate([-xh[..., half:], xh[..., :half]], -1).reshape(B, HD)
    np.testing.assert_allclose(x @ R, expect, atol=1e-6)


def test_fused_step_matches_decode_step():
    cur = 11
    params, packed, cache, emb, lo, kv, pos = _setup(cur=cur)
    h_ref, cache_ref = llama.decode_step(
        params, emb, cache, jnp.int32(cur), kv, pos, CFG)

    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    x_out, kc2, vc2 = pallas_step.decode_step_fused(
        packed, emb, kc, vc, jnp.int32(cur), lo, pos, CFG,
        t_chunk=8, interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)

    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.05, rtol=0.05)
    # the appended k/v rows must match the reference cache update
    for li in range(CFG.num_hidden_layers):
        ref_k = np.asarray(cache_ref.k[li][:, cur].reshape(B, HD), np.float32)
        got_k = np.asarray(kc2[li, :, cur], np.float32)
        np.testing.assert_allclose(got_k, ref_k, atol=0.15, rtol=0.05)
        # history rows round-trip unchanged
        np.testing.assert_array_equal(
            np.asarray(kc2[li, :, :cur]),
            np.asarray(cache.k[li].reshape(B, T, HD)[:, :cur]))


def test_fused_step_chunk_skipping_consistent():
    """Different t_chunk values (and therefore chunk skipping patterns)
    produce identical results."""
    cur = 9
    params, packed, cache, emb, lo, kv, pos = _setup(cur=cur)
    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    outs = []
    for tc in (8, 16, 32):
        x_out, _, _ = pallas_step.decode_step_fused(
            packed, emb, kc, vc, jnp.int32(cur), lo, pos, CFG,
            t_chunk=tc, interpret=True)
        outs.append(np.asarray(x_out))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-3)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-3)


def test_fused_step_per_slot_cur():
    """Vector ``cur`` (continuous batching): every row appends at its own
    position and attends its own [lo, cur] range."""
    params, packed, cache, emb, lo, kv, pos = _setup(cur=11)
    HD = CFG.num_attention_heads * CFG.head_dim
    cur = jnp.asarray([11, 17], jnp.int32)
    slots = np.arange(T)
    kv = jnp.asarray(
        (slots[None, :] >= np.asarray([0, 3])[:, None])
        & (slots[None, :] <= np.asarray(cur)[:, None]))
    pos_s = cur - lo
    h_ref, cache_ref = llama.decode_step(params, emb, cache, cur, kv,
                                         pos_s, CFG)
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    x_out, kc2, vc2 = pallas_step.decode_step_fused(
        packed, emb, kc, vc, cur, lo, pos_s, CFG, t_chunk=8, interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.05, rtol=0.05)
    for b, c in enumerate([11, 17]):
        ref_k = np.asarray(
            cache_ref.k[0][b, c].reshape(HD), np.float32)
        np.testing.assert_allclose(np.asarray(kc2[0, b, c], np.float32),
                                   ref_k, atol=0.15, rtol=0.05)
        # other rows' windows untouched at this row's position
        np.testing.assert_array_equal(
            np.asarray(kc2[0, b, :c - 8]),
            np.asarray(cache.k[0].reshape(B, T, HD)[b, :c - 8]))


def test_int8_pack_quantization_error_bounded():
    """Dequantized int8 slabs stay within the per-column scale's rounding
    error (|err| <= scale/2 elementwise)."""
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ref = pallas_step.pack_step_params(params, CFG)
    q = pallas_step.pack_step_params(params, CFG, int8=True)
    assert q["W"].dtype == jnp.int8
    L, S, D = q["wscale"].shape
    W_ref = np.asarray(ref["W"], np.float32).reshape(L * S, D, D)
    W_deq = (np.asarray(q["W"], np.float32)
             * np.asarray(q["wscale"]).reshape(L * S, 1, D))
    err = np.abs(W_deq - W_ref)
    bound = np.asarray(q["wscale"]).reshape(L * S, 1, D) * 0.5 + 1e-3
    assert (err <= bound + np.abs(W_ref) * 8e-3).all()  # bf16 ref rounding


def test_fused_step_int8_close_to_xla():
    """int8-slab fused step tracks the f32 XLA step within quantization
    tolerance (per-slot cur path included)."""
    cur = 11
    params, _, cache, emb, lo, kv, pos = _setup(cur=cur)
    packed = pallas_step.pack_step_params(params, CFG, int8=True)
    h_ref, _ = llama.decode_step(
        params, emb, cache, jnp.int32(cur), kv, pos, CFG)
    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    x_out, _, _ = pallas_step.decode_step_fused(
        packed, emb, kc, vc, jnp.int32(cur), lo, pos, CFG,
        t_chunk=8, interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.15, rtol=0.15)


def test_generator_with_fused_step(monkeypatch):
    """The whole Generator loop runs with CHATTTS_PALLAS_STEP=1 (interpret
    mode on CPU) and stays seed-deterministic.  KV_INT8=0 pins the bf16
    cache path (kv8 defaults on; test_generator_with_kv8 covers it)."""
    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT8", "0")
    from chattts_tpu.engine import generate as gen_mod
    gen_mod._build_fns.cache_clear()
    try:
        from chattts_tpu.models import embed as embed_mod

        params = llama.init_params(jax.random.PRNGKey(0), CFG)
        eparams = embed_mod.init_params(jax.random.PRNGKey(1), CFG)
        g = gen_mod.Generator(CFG, params, eparams, prefill_bucket=16)
        assert g._packed  # fused path active
        rng = np.random.default_rng(0)
        req = gen_mod.GenerateRequest(
            ids=rng.integers(5, 50, (2, 9, CFG.num_vq)).astype(np.int32),
            attn_mask=np.ones((2, 9), bool), text_mask=np.ones((2, 9), bool),
            infer_text=False, eos_token=CFG.num_audio_tokens - 1,
            temperature=np.full((CFG.num_vq,), 0.7, np.float32),
            max_new=8, min_new=4, seed=11, return_hidden=True)
        out1 = next(g.generate(req))
        out2 = next(g.generate(req))
        for a, b in zip(out1.ids, out2.ids):
            np.testing.assert_array_equal(a, b)
        assert 4 <= out1.ids[0].shape[0] <= 8
        assert (out1.ids[0] < CFG.num_audio_tokens - 1).all()
        assert out1.hiddens_dev is not None
    finally:
        gen_mod._build_fns.cache_clear()


def test_fused_step_multi_step_sequence():
    """Three consecutive fused steps equal three reference decode_steps."""
    params, packed, cache, emb, lo, kv, pos = _setup(cur=11)
    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    h_ref = emb
    h_fused = emb
    kv_ref = kv
    for step in range(3):
        cur = 11 + step
        kv_ref = kv_ref.at[:, cur].set(True)
        pos_s = jnp.full((B,), cur, jnp.int32) - lo
        h_ref_out, cache = llama.decode_step(
            params, h_ref, cache, jnp.int32(cur), kv_ref, pos_s, CFG)
        x_out, kc, vc = pallas_step.decode_step_fused(
            packed, h_fused, kc, vc, jnp.int32(cur), lo, pos_s, CFG,
            t_chunk=16, interpret=True)
        h_fused_out = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)
        np.testing.assert_allclose(np.asarray(h_fused_out),
                                   np.asarray(h_ref_out),
                                   atol=0.08, rtol=0.08)
        h_ref = h_ref_out * 0.1  # feed something step-dependent back in
        h_fused = h_fused_out * 0.1


def test_fused_step_bundle_sizes_consistent(monkeypatch):
    """Weight-DMA bundle size (CHATTTS_STEP_WBUNDLE) never changes the
    result: BS=1 (one DMA per slab, the original scheme) equals BS=2/5
    (bundled copies).  The env is read at trace time, so the jit cache is
    cleared between settings."""
    cur = 11
    params, packed, cache, emb, lo, kv, pos = _setup(cur=cur)
    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    outs = []
    for bs in ("1", "2", "5"):  # S=10 for the test config
        monkeypatch.setenv("CHATTTS_STEP_WBUNDLE", bs)
        pallas_step.decode_step_fused.clear_cache()
        x_out, _, _ = pallas_step.decode_step_fused(
            packed, emb, kc, vc, jnp.int32(cur), lo, pos, CFG,
            t_chunk=8, interpret=True)
        outs.append(np.asarray(x_out))
    pallas_step.decode_step_fused.clear_cache()
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


def test_int4_pack_quantization_error_bounded():
    """Dequantized int4 slabs stay within the per-(group, column) scale's
    rounding error (|err| <= scale/2 elementwise after unpacking)."""
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ref = pallas_step.pack_step_params(params, CFG)
    q = pallas_step.pack_step_params(params, CFG, int4=True)
    D = CFG.hidden_size
    gs, G = pallas_step._int4_groups(D)
    L, S, G_, D_ = q["wscale"].shape
    assert (G_, D_) == (G, D) and q["W"].shape[1] == D // 2
    W_ref = np.asarray(ref["W"], np.float32)             # (LS, D, D)
    packed = np.asarray(q["W"], np.int32)                # (LS, D/2, D)
    lo = (packed << 28) >> 28
    hi = packed >> 4
    W_q = np.concatenate([lo, hi], axis=1)               # (LS, D, D)
    scale = np.asarray(q["wscale"], np.float32).reshape(L * S, G, 1, D)
    W_deq = (W_q.reshape(L * S, G, gs, D) * scale).reshape(L * S, D, D)
    err = np.abs(W_deq - W_ref)
    bound = np.repeat(scale, gs, axis=2).reshape(L * S, D, D) * 0.5 + 1e-3
    assert (err <= bound + np.abs(W_ref) * 8e-3).all()  # bf16 ref rounding


def test_fused_step_int4_close_to_xla():
    """int4-slab fused step tracks the f32 XLA step within quantization
    tolerance (wider than int8's: 4-bit weights, group-128 scales)."""
    cur = 11
    params, _, cache, emb, lo, kv, pos = _setup(cur=cur)
    packed = pallas_step.pack_step_params(params, CFG, int4=True)
    h_ref, _ = llama.decode_step(
        params, emb, cache, jnp.int32(cur), kv, pos, CFG)
    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    x_out, _, _ = pallas_step.decode_step_fused(
        packed, emb, kc, vc, jnp.int32(cur), lo, pos, CFG,
        t_chunk=8, interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.35, rtol=0.35)


# ---- int8 KV cache (CHATTTS_KV_INT8) --------------------------------------


def test_kv8_quantize_round_trip():
    """Dequantized kv8 rows stay within half a quantization step of the
    source, with the (m, e) scale pair's <=0.8% upward slack."""
    rng = np.random.default_rng(0)
    H, Dh = CFG.num_attention_heads, CFG.head_dim
    HD = H * Dh
    x = (rng.standard_normal((3, 2, 16, HD)) * 2.5).astype(np.float32)
    x[0, 0, 3] = 0.0  # all-zero row: scale 0, must round-trip to zeros
    rows = pallas_step.kv8_quantize(jnp.asarray(x), CFG)
    assert rows.shape == (3, 2, 16, HD + pallas_step.KV_PAD)
    assert rows.dtype == jnp.int8
    deq = np.asarray(pallas_step.kv8_dequantize(rows, CFG))
    a = np.abs(x.reshape(3, 2, 16, H, Dh)).max(-1)   # per-head absmax
    # step = scale <= (absmax/127) * (1 + 1/64); |err| <= step/2
    bound = (a / 127.0) * 1.02 * 0.5 + 1e-7
    err = np.abs(deq - x).reshape(3, 2, 16, H, Dh).max(-1)
    assert (err <= bound).all()
    np.testing.assert_array_equal(deq[0, 0, 3], np.zeros(HD))


def _kv8_caches(cache):
    HD = CFG.num_attention_heads * CFG.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    return (pallas_step.kv8_quantize(kc, CFG),
            pallas_step.kv8_quantize(vc, CFG))


def test_fused_step_kv8_close_to_xla():
    """int8-KV fused step tracks the XLA step (bf16 cache) within
    quantization tolerance, and the appended row dequantizes to the
    reference k/v within one quantization step."""
    cur = 11
    params, packed, cache, emb, lo, kv, pos = _setup(cur=cur)
    h_ref, cache_ref = llama.decode_step(
        params, emb, cache, jnp.int32(cur), kv, pos, CFG)
    kc8, vc8 = _kv8_caches(cache)
    hist_k = np.asarray(kc8)  # history rows must round-trip untouched
    x_out, kc2, vc2 = pallas_step.decode_step_fused(
        packed, emb, kc8, vc8, jnp.int32(cur), lo, pos, CFG,
        t_chunk=8, interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.15, rtol=0.15)
    HD = CFG.num_attention_heads * CFG.head_dim
    for li in range(CFG.num_hidden_layers):
        got = np.asarray(pallas_step.kv8_dequantize(kc2[li, :, cur], CFG))
        ref = np.asarray(cache_ref.k[li][:, cur].reshape(B, HD), np.float32)
        np.testing.assert_allclose(got, ref, atol=0.2, rtol=0.1)
        np.testing.assert_array_equal(np.asarray(kc2[li, :, :cur]),
                                      hist_k[li, :, :cur])


def test_fused_step_kv8_per_slot_cur():
    """Per-slot cur (continuous batching) with the int8 KV cache."""
    params, packed, cache, emb, lo, kv, pos = _setup(cur=11)
    cur = jnp.asarray([11, 17], jnp.int32)
    slots = np.arange(T)
    kv = jnp.asarray(
        (slots[None, :] >= np.asarray([0, 3])[:, None])
        & (slots[None, :] <= np.asarray(cur)[:, None]))
    pos_s = cur - lo
    h_ref, cache_ref = llama.decode_step(params, emb, cache, cur, kv,
                                         pos_s, CFG)
    kc8, vc8 = _kv8_caches(cache)
    x_out, kc2, vc2 = pallas_step.decode_step_fused(
        packed, emb, kc8, vc8, cur, lo, pos_s, CFG, t_chunk=8,
        interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.15, rtol=0.15)
    HD = CFG.num_attention_heads * CFG.head_dim
    for b, c in enumerate([11, 17]):
        got = np.asarray(pallas_step.kv8_dequantize(kc2[0, b, c], CFG))
        ref = np.asarray(cache_ref.k[0][b, c].reshape(HD), np.float32)
        np.testing.assert_allclose(got, ref, atol=0.2, rtol=0.1)


def test_fused_step_kv8_chunk_consistent():
    """Chunk size never changes the kv8 result (scale folding is exact
    w.r.t. the stored int8 values, independent of chunking)."""
    params, packed, cache, emb, lo, kv, pos = _setup(cur=9)
    kc8, vc8 = _kv8_caches(cache)
    outs = []
    for tc in (8, 16, 32):
        x_out, _, _ = pallas_step.decode_step_fused(
            packed, emb, kc8, vc8, jnp.int32(9), lo, pos, CFG,
            t_chunk=tc, interpret=True)
        outs.append(np.asarray(x_out))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-3)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-3)


def test_generator_with_kv8(monkeypatch):
    """The whole Generator loop runs with CHATTTS_KV_INT8=1 (fused path in
    interpret mode) and stays seed-deterministic."""
    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT8", "1")
    from chattts_tpu.engine import generate as gen_mod
    gen_mod._build_fns.cache_clear()
    try:
        from chattts_tpu.models import embed as embed_mod

        assert gen_mod.kv_int8(CFG)
        params = llama.init_params(jax.random.PRNGKey(0), CFG)
        eparams = embed_mod.init_params(jax.random.PRNGKey(1), CFG)
        g = gen_mod.Generator(CFG, params, eparams, prefill_bucket=16)
        rng = np.random.default_rng(0)
        req = gen_mod.GenerateRequest(
            ids=rng.integers(5, 50, (2, 9, CFG.num_vq)).astype(np.int32),
            attn_mask=np.ones((2, 9), bool), text_mask=np.ones((2, 9), bool),
            infer_text=False, eos_token=CFG.num_audio_tokens - 1,
            temperature=np.full((CFG.num_vq,), 0.7, np.float32),
            max_new=8, min_new=4, seed=11, return_hidden=True)
        out1 = next(g.generate(req))
        out2 = next(g.generate(req))
        for a, b in zip(out1.ids, out2.ids):
            np.testing.assert_array_equal(a, b)
        assert 4 <= out1.ids[0].shape[0] <= 8
        assert (out1.ids[0] < CFG.num_audio_tokens - 1).all()
    finally:
        gen_mod._build_fns.cache_clear()


def test_engine_with_kv8(monkeypatch):
    """The continuous-batching engine runs on the int8 KV cache (fused
    interpret path): state cache is int8 + padded width, outputs are
    seed-deterministic and valid."""
    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT8", "1")
    from chattts_tpu.engine.batching import (Engine, EngineConfig,
                                             EngineRequest)
    from chattts_tpu.models import embed as embed_mod

    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    eparams = embed_mod.init_params(jax.random.PRNGKey(1), CFG)
    ecfg = EngineConfig(max_num_seqs=2, max_prompt_len=16, max_new_tokens=8,
                        chunk_steps=4, infer_text=False, collect_hidden=True)

    def run():
        eng = Engine(CFG, ecfg, params, eparams, seed=7)
        assert eng._kv8
        kc, vc = eng.state.cache
        HD = CFG.num_attention_heads * CFG.head_dim
        assert kc.dtype == jnp.int8
        assert kc.shape[3] == HD + pallas_step.KV_PAD
        assert kc.shape[2] % 32 == 0
        rng = np.random.default_rng(3)
        reqs = [EngineRequest(
            request_id=f"r{i}",
            ids=rng.integers(5, 50, (6 + i, CFG.num_vq)).astype(np.int32),
            text_mask=np.ones((6 + i,), bool),
            temperature=np.full((CFG.num_vq,), 0.7, np.float32),
            min_new=3, max_new=6, seed=100 + i) for i in range(3)]
        return eng.generate(reqs)

    outs1, outs2 = run(), run()
    for a, b in zip(outs1, outs2):
        np.testing.assert_array_equal(a.ids, b.ids)
        assert 3 <= a.ids.shape[0] <= 6
        assert (a.ids < CFG.num_audio_tokens - 1).all()
        assert a.finish_reason in ("eos", "length")


# ---- int4 KV cache (CHATTTS_KV_INT4, opt-in) -------------------------------
# kv4 needs HD % 256 == 0 (nibble halves split into whole 128-lane tiles);
# the shared CFG has HD=128, so these tests run their own geometry.

CFG4 = GPTConfig(
    hidden_size=256,
    intermediate_size=512,
    num_attention_heads=2,
    num_hidden_layers=2,
    max_position_embeddings=128,
    num_audio_tokens=626,
    num_text_tokens=300,
    num_vq=4,
)


def _setup4(cur=11, lo_vals=(0, 3)):
    params = llama.init_params(jax.random.PRNGKey(0), CFG4)
    packed = pallas_step.pack_step_params(params, CFG4)
    k0 = jax.random.normal(jax.random.PRNGKey(1),
                           (B, T, CFG4.num_attention_heads, CFG4.head_dim),
                           jnp.bfloat16)
    v0 = jax.random.normal(jax.random.PRNGKey(2),
                           (B, T, CFG4.num_attention_heads, CFG4.head_dim),
                           jnp.bfloat16)
    cache = llama.KVCache(
        tuple(k0 for _ in range(CFG4.num_hidden_layers)),
        tuple(v0 for _ in range(CFG4.num_hidden_layers)))
    emb = jax.random.normal(jax.random.PRNGKey(3), (B, CFG4.hidden_size),
                            jnp.float32) * 0.3
    lo = jnp.asarray(lo_vals, jnp.int32)
    slots = np.arange(T)
    kv = jnp.asarray((slots[None, :] >= np.asarray(lo_vals)[:, None])
                     & (slots[None, :] <= cur))
    pos = jnp.full((B,), cur, jnp.int32) - lo
    HD = CFG4.num_attention_heads * CFG4.head_dim
    kc = jnp.stack([c.reshape(B, T, HD) for c in cache.k])
    vc = jnp.stack([c.reshape(B, T, HD) for c in cache.v])
    return (params, packed, cache, emb, lo, kv, pos,
            pallas_step.kv4_quantize(kc, CFG4),
            pallas_step.kv4_quantize(vc, CFG4))


def test_kv4_quantize_round_trip():
    """Dequantized kv4 rows stay within half a quantization step (absmax/7
    per (token, head), with the (m, e) pair's <=0.8% upward slack), and the
    nibble packing reconstructs the original feature order."""
    rng = np.random.default_rng(0)
    H, Dh = CFG4.num_attention_heads, CFG4.head_dim
    HD = H * Dh
    x = (rng.standard_normal((3, 2, 16, HD)) * 2.5).astype(np.float32)
    x[0, 0, 3] = 0.0
    rows = pallas_step.kv4_quantize(jnp.asarray(x), CFG4)
    assert rows.shape == (3, 2, 16, HD // 2 + pallas_step.KV_PAD)
    assert rows.dtype == jnp.int8
    deq = np.asarray(pallas_step.kv4_dequantize(rows, CFG4))
    a = np.abs(x.reshape(3, 2, 16, H, Dh)).max(-1)
    bound = (a / 7.0) * 1.02 * 0.5 + 1e-7
    err = np.abs(deq - x).reshape(3, 2, 16, H, Dh).max(-1)
    assert (err <= bound).all()
    np.testing.assert_array_equal(deq[0, 0, 3], np.zeros(HD))
    # feature order: perturb ONE feature, exactly one dequant lane moves
    y = x.copy()
    y[1, 1, 5, 7] += 1.0
    deq_y = np.asarray(pallas_step.kv4_dequantize(
        pallas_step.kv4_quantize(jnp.asarray(y), CFG4), CFG4))
    changed = np.nonzero((deq_y != deq)[1, 1, 5])[0]
    assert changed.size >= 1 and set(changed) <= set(range(Dh))  # head 0


def test_fused_step_kv4_close_to_xla():
    """int4-KV fused step tracks the XLA step (bf16 cache) within the
    coarser int4 tolerance; the appended row dequantizes to the reference
    k/v within one int4 quantization step; history rows are untouched."""
    cur = 11
    (params, packed, cache, emb, lo, kv, pos, kc4, vc4) = _setup4(cur=cur)
    h_ref, cache_ref = llama.decode_step(
        params, emb, cache, jnp.int32(cur), kv, pos, CFG4)
    hist_k = np.asarray(kc4)
    x_out, kc2, vc2 = pallas_step.decode_step_fused(
        packed, emb, kc4, vc4, jnp.int32(cur), lo, pos, CFG4,
        t_chunk=8, interpret=True)
    h_fused = llama.rms_norm(x_out, params["norm"], CFG4.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.6, rtol=0.6)
    HD = CFG4.num_attention_heads * CFG4.head_dim
    for li in range(CFG4.num_hidden_layers):
        got = np.asarray(pallas_step.kv4_dequantize(kc2[li, :, cur], CFG4))
        ref = np.asarray(cache_ref.k[li][:, cur].reshape(B, HD), np.float32)
        a = np.abs(ref).reshape(B, CFG4.num_attention_heads, -1).max(-1)
        step = np.repeat(a / 7.0 * 1.02, CFG4.head_dim, axis=1)
        assert (np.abs(got - ref) <= step * 0.5 + 0.08).all()
        np.testing.assert_array_equal(np.asarray(kc2[li, :, :cur]),
                                      hist_k[li, :, :cur])


def test_fused_step_kv4_per_slot_cur_and_chunks():
    """Per-slot cur works on the int4 cache, and chunk size never changes
    the result (unpack + scale folding are exact w.r.t. the stored
    nibbles)."""
    (params, packed, cache, emb, lo, kv, pos, kc4, vc4) = _setup4()
    cur = jnp.asarray([11, 17], jnp.int32)
    pos_s = cur - lo
    outs = []
    for tc in (8, 16, 32):
        x_out, _, _ = pallas_step.decode_step_fused(
            packed, emb, kc4, vc4, cur, lo, pos_s, CFG4,
            t_chunk=tc, interpret=True)
        outs.append(np.asarray(x_out))
    # online-softmax f32 accumulation order shifts with TC; the stored
    # nibbles are identical (3e-3 vs kv8's 1e-3: coarser values, same class)
    np.testing.assert_allclose(outs[0], outs[1], atol=3e-3)
    np.testing.assert_allclose(outs[0], outs[2], atol=3e-3)
    slots = np.arange(T)
    kvm = jnp.asarray(
        (slots[None, :] >= np.asarray([0, 3])[:, None])
        & (slots[None, :] <= np.asarray(cur)[:, None]))
    h_ref, _ = llama.decode_step(params, emb, cache, cur, kvm, pos_s, CFG4)
    h_fused = llama.rms_norm(jnp.asarray(outs[0]), params["norm"],
                             CFG4.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref),
                               atol=0.6, rtol=0.6)


def test_generator_with_kv4(monkeypatch):
    """The whole Generator loop runs with CHATTTS_KV_INT4=1 (fused path in
    interpret mode) and stays seed-deterministic."""
    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT4", "1")
    from chattts_tpu.engine import generate as gen_mod
    gen_mod._build_fns.cache_clear()
    try:
        from chattts_tpu.models import embed as embed_mod

        assert gen_mod.kv_quant_bits(CFG4) == 4
        assert gen_mod.kv_quant_bits(CFG) == 8  # HD=128 falls back to kv8
        params = llama.init_params(jax.random.PRNGKey(0), CFG4)
        eparams = embed_mod.init_params(jax.random.PRNGKey(1), CFG4)
        g = gen_mod.Generator(CFG4, params, eparams, prefill_bucket=16)
        rng = np.random.default_rng(0)
        req = gen_mod.GenerateRequest(
            ids=rng.integers(5, 50, (2, 9, CFG4.num_vq)).astype(np.int32),
            attn_mask=np.ones((2, 9), bool), text_mask=np.ones((2, 9), bool),
            infer_text=False, eos_token=CFG4.num_audio_tokens - 1,
            temperature=np.full((CFG4.num_vq,), 0.7, np.float32),
            max_new=8, min_new=4, seed=11, return_hidden=True)
        out1 = next(g.generate(req))
        out2 = next(g.generate(req))
        for a, b in zip(out1.ids, out2.ids):
            np.testing.assert_array_equal(a, b)
        assert 4 <= out1.ids[0].shape[0] <= 8
        assert (out1.ids[0] < CFG4.num_audio_tokens - 1).all()
    finally:
        gen_mod._build_fns.cache_clear()


def test_engine_with_kv4(monkeypatch):
    """The continuous-batching engine runs on the int4 KV cache (fused
    interpret path): state cache is int8 at the nibble-packed width,
    outputs are seed-deterministic and valid."""
    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT4", "1")
    from chattts_tpu.engine import batching as bat
    from chattts_tpu.engine.batching import (Engine, EngineConfig,
                                             EngineRequest)
    from chattts_tpu.models import embed as embed_mod

    bat._build_kernels.cache_clear()
    try:
        params = llama.init_params(jax.random.PRNGKey(0), CFG4)
        eparams = embed_mod.init_params(jax.random.PRNGKey(1), CFG4)
        ecfg = EngineConfig(max_num_seqs=2, max_prompt_len=16,
                            max_new_tokens=8, chunk_steps=4,
                            infer_text=False, collect_hidden=True)

        def run():
            eng = Engine(CFG4, ecfg, params, eparams, seed=7)
            assert eng._kvb == 4
            kc, vc = eng.state.cache
            HD = CFG4.num_attention_heads * CFG4.head_dim
            assert kc.dtype == jnp.int8
            assert kc.shape[3] == HD // 2 + pallas_step.KV_PAD
            assert kc.shape[2] % 32 == 0
            rng = np.random.default_rng(3)
            reqs = [EngineRequest(
                request_id=f"r{i}",
                ids=rng.integers(5, 50, (6 + i, CFG4.num_vq)).astype(np.int32),
                text_mask=np.ones((6 + i,), bool),
                temperature=np.full((CFG4.num_vq,), 0.7, np.float32),
                min_new=3, max_new=6, seed=100 + i) for i in range(3)]
            return eng.generate(reqs)

        outs1, outs2 = run(), run()
        for a, b in zip(outs1, outs2):
            np.testing.assert_array_equal(a.ids, b.ids)
            assert 3 <= a.ids.shape[0] <= 6
            assert (a.ids < CFG4.num_audio_tokens - 1).all()
            assert a.finish_reason in ("eos", "length")
    finally:
        bat._build_kernels.cache_clear()
