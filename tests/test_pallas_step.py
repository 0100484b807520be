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
    mode on CPU) and stays seed-deterministic."""
    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
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
