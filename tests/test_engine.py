"""Continuous-batching engine tests (tiny config, CPU mesh)."""

import zlib

import numpy as np
import jax
import pytest

from chattts_tpu.engine.batching import Engine, EngineConfig, EngineRequest
from chattts_tpu.models import embed as embed_mod
from chattts_tpu.models import llama


@pytest.fixture(scope="module")
def params(tiny_config):
    cfg = tiny_config.gpt
    return (llama.init_params(jax.random.PRNGKey(0), cfg),
            embed_mod.init_params(jax.random.PRNGKey(1), cfg))


def _mk_engine(tiny_config, params, **kw):
    cfg = tiny_config.gpt
    defaults = dict(max_num_seqs=4, max_prompt_len=16, max_new_tokens=12,
                    chunk_steps=4, infer_text=False, collect_hidden=True)
    defaults.update(kw)
    ecfg = EngineConfig(**defaults)
    return Engine(cfg, ecfg, params[0], params[1])


def _req(cfg, rid, n=6, **kw):
    # zlib.crc32, NOT hash(): str hash is PYTHONHASHSEED-randomized per
    # process, so hash-seeded prompts re-roll every pytest run.  The
    # preemption-resume exactness tests compare a recomputed-prefill run
    # against an uninterrupted one — bit-different reduction orders whose
    # sampled tokens agree only when no post-resume step lands on a
    # razor-thin top-p/gumbel margin.  With random weights (near-flat
    # logits) ~1 in 8 random prompts has such a near-tie and flips ONE
    # codebook at the first post-resume step (root-caused round 5:
    # PYTHONHASHSEED=0 fails 2/2 deterministically, seeds 1-7 pass 0/2).
    # Pinning the prompt freezes the margins and makes the suite
    # deterministic.
    rng = np.random.default_rng(zlib.crc32(rid.encode()) % 1000)
    d = dict(
        request_id=rid,
        ids=rng.integers(5, 50, (n, cfg.num_vq)).astype(np.int32),
        text_mask=np.ones((n,), bool),
        temperature=np.full((cfg.num_vq,), 0.7, np.float32),
        min_new=2, max_new=8)
    d.update(kw)
    return EngineRequest(**d)


def test_offline_generate_batch(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    reqs = [_req(cfg, f"r{i}", n=4 + i) for i in range(6)]  # > slots
    outs = eng.generate(reqs)
    assert [o.request_id for o in outs] == [f"r{i}" for i in range(6)]
    for o in outs:
        assert o.ids.ndim == 2 and o.ids.shape[1] == cfg.num_vq
        assert 0 <= o.ids.shape[0] <= 8
        assert o.host_hiddens().shape == (o.ids.shape[0], cfg.hidden_size)
        assert o.finish_reason in ("eos", "length")
        # EOS token never appears in kept output
        assert (o.ids < cfg.num_audio_tokens - 1).all()
    assert not eng.has_unfinished()


def test_length_finish_keeps_all_tokens(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    # min_new == max_new: EOS suppressed throughout -> always length-finish
    outs = eng.generate([_req(cfg, "r0", min_new=8, max_new=8)])
    assert outs[0].finish_reason == "length"
    assert outs[0].ids.shape[0] == 8


def test_continuous_admission(tiny_config, params):
    """More requests than slots: later requests admitted as slots free."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=2)
    outs = eng.generate([_req(cfg, f"r{i}") for i in range(5)])
    assert len(outs) == 5
    assert eng.stats["prefills"] == 5
    assert eng.stats["requests_finished"] == 5


def test_streaming_callback(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, chunk_steps=2)
    got = []
    req = _req(cfg, "s0", min_new=6, max_new=8,
               on_tokens=lambda rid, ids, hid, fin: got.append(
                   (ids.shape[0], hid is not None, fin)))
    outs = eng.generate([req])
    total = sum(g[0] for g in got)
    assert total == outs[0].ids.shape[0]
    assert all(g[1] for g in got)


def test_abort(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    eng.add_request(_req(cfg, "a0", max_new=8))
    eng.add_request(_req(cfg, "a1", max_new=8))
    dropped = eng.abort_request("a1")  # still waiting
    assert dropped is not None and dropped.request_id == "a1"
    eng.step()  # admits + runs a0
    assert eng.abort_request("a0")  # now running
    assert not eng.abort_request("missing")
    assert not eng.has_unfinished()


def test_abort_notifies_streaming_consumer(tiny_config, params):
    """Aborting a STREAMING request must fire the final on_tokens
    notification (like interrupt) - a consumer blocked on that callback
    would otherwise wait forever (llm_engine.py:365-371 parity)."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=1, chunk_steps=2)
    events = {"queued": [], "running": []}
    eng.add_request(_req(
        cfg, "run", min_new=8, max_new=12,
        on_tokens=lambda rid, ids, hid, fin: events["running"].append(
            (ids is None, fin))))
    eng.add_request(_req(
        cfg, "queue", max_new=8,
        on_tokens=lambda rid, ids, hid, fin: events["queued"].append(
            (ids is None, fin))))
    eng.step()  # admits "run" (1 slot); "queue" stays waiting
    assert eng.abort_request("run")
    assert eng.abort_request("queue")
    # both consumers saw a FINAL notification with no payload
    assert events["running"][-1] == (True, True)
    assert events["queued"][-1] == (True, True)
    assert not eng.has_unfinished()


def test_service_abort_unblocks_waiter(tiny_config):
    """TTSService.abort drops one request and fails its mailbox waiter
    instead of leaving it blocked (driver stopped: deterministic)."""
    import pytest as _pytest

    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    try:
        svc._stop = True  # halt the driver so the abort races nothing
        svc._work.set()
        svc._driver.join(timeout=10)
        p = Chat.InferCodeParams(max_new_token=32, min_new_token=32)
        futs = svc._submit(chat._engine_for_code(),
                           svc._code_reqs(["abort target"], p))
        rid = next(iter(svc._pending))
        assert svc.abort(rid)
        with _pytest.raises(InterruptedError):
            svc._result(futs[0])
        assert rid not in svc._pending
        assert not svc.abort(rid)  # already gone
    finally:
        svc.close()


def test_service_failure_scoped_to_failed_engine(tiny_config):
    """When one engine's step() throws, ONLY that engine's waiters fail;
    a concurrent request on the other, healthy engine still returns
    (per-engine abort semantics, reference llm_engine.py:365-371)."""
    import pytest as _pytest

    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    try:
        svc._stop = True  # drive manually for determinism
        svc._work.set()
        svc._driver.join(timeout=10)
        code_eng = chat._engine_for_code()
        text_eng = chat._engine_for_text()

        # poison the CODE engine's step
        orig_step = code_eng.step
        code_eng.step = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected step failure"))

        p = Chat.InferCodeParams(max_new_token=8, min_new_token=8)
        code_futs = svc._submit(code_eng, svc._code_reqs(["will fail"], p))
        from chattts_tpu.engine.batching import EngineRequest

        rp = Chat.RefineTextParams(max_new_token=6, min_new_token=2)
        ids, attn, tmask = chat.tokenizer.encode(
            ["healthy refine"], chat.config.gpt.num_vq)
        n = int(attn[0].sum())
        text_futs = svc._submit(text_eng, [EngineRequest(
            request_id="svc-refine-healthy",
            ids=ids[0, ids.shape[1] - n:],
            text_mask=tmask[0, ids.shape[1] - n:],
            temperature=np.asarray([rp.temperature], np.float32),
            min_new=rp.min_new_token, max_new=rp.max_new_token, seed=1)])

        # run the driver's loop body once by hand: code engine throws
        svc._stop = False
        svc._work.set()
        import threading

        t = threading.Thread(target=svc._drive, daemon=True)
        t.start()
        # healthy engine's request completes...
        out = text_futs[0].get(timeout=30)
        assert out is not None and out.request_id == "svc-refine-healthy"
        # ...while the poisoned engine's waiter failed fast
        with _pytest.raises(InterruptedError):
            svc._result(code_futs[0])
        code_eng.step = orig_step
    finally:
        svc.close()


def test_text_mode(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, infer_text=True,
                     text_eos_token=cfg.num_text_tokens - 1,
                     collect_hidden=False)
    outs = eng.generate([_req(cfg, "t0", temperature=np.asarray([0.7]))])
    assert outs[0].ids.ndim == 1
    assert outs[0].hiddens is None
    assert (outs[0].ids != cfg.num_text_tokens - 1).all()


def test_per_request_seed_deterministic_across_loads(tiny_config, params):
    """Same seed -> identical tokens, regardless of co-resident requests or
    engine history (manual_seed semantics, reference gpt.py:501-508)."""
    cfg = tiny_config.gpt
    seeded = _req(cfg, "det", n=6, min_new=4, max_new=8, seed=1234)

    eng1 = _mk_engine(tiny_config, params)
    out_alone = eng1.generate([seeded])[0]

    eng2 = _mk_engine(tiny_config, params)
    # different co-residents and queue position
    others = [_req(cfg, f"o{i}", n=4 + i, min_new=2, max_new=6)
              for i in range(3)]
    outs = eng2.generate(others + [seeded])
    out_busy = next(o for o in outs if o.request_id == "det")
    np.testing.assert_array_equal(out_alone.ids, out_busy.ids)


def test_per_request_eos_token(tiny_config, params):
    """EngineRequest.eos_token overrides the engine default (text mode)."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, infer_text=True,
                     text_eos_token=cfg.num_text_tokens - 1,
                     collect_hidden=False)
    custom_eos = 7
    out = eng.generate([_req(cfg, "e0", temperature=np.asarray([0.7]),
                             min_new=0, max_new=10, seed=5,
                             eos_token=custom_eos,
                             ensure_non_empty=False)])[0]
    # the custom EOS id never appears in kept output
    assert (out.ids != custom_eos).all()


def test_ensure_non_empty_retries(tiny_config, params):
    """Immediate EOS triggers re-dispatch (gpt.py:527-570); attempts are
    bounded."""
    import jax
    import jax.numpy as jnp
    from chattts_tpu.models import embed as embed_mod

    cfg = tiny_config.gpt
    eos = cfg.num_audio_tokens - 1
    eparams = embed_mod.init_params(jax.random.PRNGKey(1), cfg)
    # fixed prompt (no hash-based randomness) ...
    pids = np.full((6, cfg.num_vq), 7, np.int32)
    tmask = np.ones((6,), bool)
    # ... and an EOS head column aligned with the prompt's actual last
    # hidden, so logit_eos = 50*sum|h| dominates for ANY weight draw
    emb = embed_mod.embed_prompt(eparams, jnp.asarray(pids)[None],
                                 jnp.asarray(tmask)[None])
    from chattts_tpu.models import llama as llama_mod

    cache = llama_mod.KVCache.create(cfg, 1, 8)
    pos = jnp.arange(6)[None, :].astype(jnp.int32)
    h_all, _ = llama_mod.prefill(params[0], emb, jnp.ones((1, 6), bool),
                                 pos, llama_mod.KVCache.create(cfg, 1, 6),
                                 cfg)
    h_last = np.asarray(h_all[0, -1])
    head = np.zeros(eparams["head_code"].shape, np.float32)
    head[:, :, eos] = 50.0 * np.sign(h_last)[None, :]
    eparams = dict(eparams, head_code=np.asarray(head))

    def req(rid, ensure):
        return EngineRequest(
            request_id=rid, ids=pids, text_mask=tmask,
            temperature=np.full((cfg.num_vq,), 0.7, np.float32),
            top_k=1, min_new=0, max_new=8, ensure_non_empty=ensure)

    eng = Engine(cfg, EngineConfig(max_num_seqs=2, max_prompt_len=16,
                                   max_new_tokens=8, chunk_steps=4),
                 params[0], eparams)
    out = eng.generate([req("r0", True)])[0]
    assert out.ids.shape[0] == 0
    assert eng.stats.get("retries") == 3

    eng2 = Engine(cfg, EngineConfig(max_num_seqs=2, max_prompt_len=16,
                                    max_new_tokens=8, chunk_steps=4),
                  params[0], eparams)
    eng2.generate([req("r1", False)])
    assert eng2.stats.get("retries") is None

    # a streaming consumer must see EXACTLY ONE finished=True - after the
    # last attempt - not one per silently retried empty attempt (a consumer
    # stops listening at the first final notification)
    eng3 = Engine(cfg, EngineConfig(max_num_seqs=2, max_prompt_len=16,
                                    max_new_tokens=8, chunk_steps=4),
                  params[0], eparams)
    notes = []
    r = req("r2", True)
    r.on_tokens = lambda rid, ids, hid, fin: notes.append(fin)
    eng3.generate([r])
    assert eng3.stats.get("retries") == 3
    assert [f for f in notes if f] == [True] and notes[-1] is True


def test_preemption_admits_short_request(tiny_config, params):
    """Starvation control: with every slot held by long requests, a short
    request still gets admitted (preempt-by-recompute time slicing,
    scheduler.py:222-249) and no generated work is lost."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=2, chunk_steps=2,
                     max_new_tokens=16, preempt_after_chunks=1)
    finished_order = []
    longs = [_req(cfg, f"L{i}", n=4, min_new=12, max_new=12, seed=i)
             for i in range(2)]
    short = _req(cfg, "short", n=4, min_new=2, max_new=2, seed=9)
    for r in longs:
        eng.add_request(r)
    outs = []
    outs.extend(eng.step())  # both longs admitted and running
    eng.add_request(short)
    while eng.has_unfinished():
        for o in eng.step():
            finished_order.append(o.request_id)
            outs.append(o)
    assert eng.stats.get("preemptions", 0) > 0
    assert finished_order[0] == "short"  # didn't wait for a 12-token slot
    by_id = {o.request_id: o for o in outs}
    assert by_id["short"].ids.shape[0] == 2
    for i in range(2):
        o = by_id[f"L{i}"]
        assert o.ids.shape[0] == 12  # resumed tokens + new tokens, none lost
        assert o.host_hiddens().shape == (12, cfg.hidden_size)


def test_engine_interrupt_drains(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    from chattts_tpu.engine.generate import Interrupt

    ctx = Interrupt()
    eng.add_request(_req(cfg, "i0", min_new=8, max_new=8))
    eng.step()
    ctx.set(True)
    outs = eng.generate([_req(cfg, "i1", min_new=8, max_new=8)], context=ctx)
    assert outs == []
    assert not eng.has_unfinished()


def test_engine_with_fused_step_kernel(monkeypatch):
    """The engine runs on the whole-step megakernel (per-slot cur path,
    interpret mode on CPU) with seed determinism intact."""
    import jax
    from chattts_tpu.config import GPTConfig
    from chattts_tpu.engine import batching as bat
    from chattts_tpu.models import embed as embed_mod
    from chattts_tpu.models import llama

    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT8", "0")  # pin the bf16-cache path
    bat._build_kernels.cache_clear()
    try:
        cfg = GPTConfig(hidden_size=128, intermediate_size=256,
                        num_attention_heads=2, num_hidden_layers=2,
                        max_position_embeddings=128, num_audio_tokens=626,
                        num_text_tokens=300, num_vq=4)
        gp = llama.init_params(jax.random.PRNGKey(0), cfg)
        ep = embed_mod.init_params(jax.random.PRNGKey(1), cfg)
        ecfg = bat.EngineConfig(max_num_seqs=2, max_prompt_len=16,
                                max_new_tokens=8, chunk_steps=4)
        eng = bat.Engine(cfg, ecfg, gp, ep)
        assert eng._fused
        rng = np.random.default_rng(3)
        reqs = [bat.EngineRequest(
            request_id=f"f{i}",
            ids=rng.integers(5, 50, (5 + i, cfg.num_vq)).astype(np.int32),
            text_mask=np.ones((5 + i,), bool),
            temperature=np.full((cfg.num_vq,), 0.7, np.float32),
            min_new=3, max_new=6, seed=40 + i) for i in range(3)]
        outs = eng.generate(reqs)
        assert len(outs) == 3
        for o in outs:
            assert 3 <= o.ids.shape[0] <= 6
            assert o.host_hiddens().shape[1] == cfg.hidden_size
        # seed determinism on the fused engine
        eng2 = bat.Engine(cfg, ecfg, gp, ep)
        outs2 = eng2.generate([reqs[0].__class__(**{
            **reqs[0].__dict__, "request_id": "f0b", "on_tokens": None})])
        np.testing.assert_array_equal(outs[0].ids, outs2[0].ids)
    finally:
        bat._build_kernels.cache_clear()


def test_engine_warmup(tiny_config, params):
    """Engine.warmup pre-executes every (bucket, wave) prefill combo plus
    the chunk/harvest paths (the vLLM capture-at-init analog) and leaves
    the engine CLEAN: empty slots/queues, zeroed stats, and bit-identical
    subsequent generations vs a cold engine (warmup must not perturb seeded
    request results - slot RNG is keyed per request, not engine history)."""
    cfg = tiny_config.gpt
    cold = _mk_engine(tiny_config, params)
    base = cold.generate([_req(cfg, "w0", min_new=6, max_new=6, seed=11)])

    warm = _mk_engine(tiny_config, params)
    warm.warmup()
    assert all(r is None for r in warm.slots) and not warm.waiting
    assert warm.stats["requests_finished"] == 0
    assert warm.latency_stats() == {}
    outs = warm.generate([_req(cfg, "w0", min_new=6, max_new=6, seed=11)])
    np.testing.assert_array_equal(outs[0].ids, base[0].ids)


def test_engine_64_slot_kv4_config(monkeypatch):
    """Pin the documented slot-count-over-throughput configuration: a
    64-slot fused engine with the int4 KV cache compiles and generates
    (interpret mode on CPU).  PERF.md round 4 measured this config at 7.8k
    steps/s on TPU (-30% aggregate vs the 32-slot peak) as the 2x-capacity
    trade; kv4 is mandatory there (kv8 halves it again, bf16 cannot fit
    64x2560 in HBM at all)."""
    import jax
    from chattts_tpu.config import GPTConfig
    from chattts_tpu.engine import batching as bat
    from chattts_tpu.models import embed as embed_mod
    from chattts_tpu.models import llama

    monkeypatch.setenv("CHATTTS_PALLAS_STEP", "1")
    monkeypatch.setenv("CHATTTS_KV_INT4", "1")
    monkeypatch.setenv("CHATTTS_ENGINE_FUSED_SLOTS", "64")
    bat._build_kernels.cache_clear()
    try:
        # kv4 needs HD % 256 == 0 (nibble halves as whole 128-lane tiles)
        cfg = GPTConfig(hidden_size=256, intermediate_size=512,
                        num_attention_heads=2, num_hidden_layers=2,
                        max_position_embeddings=256, num_audio_tokens=626,
                        num_text_tokens=300, num_vq=4)
        assert bat.fused_slot_limit(cfg) == 64
        gp = llama.init_params(jax.random.PRNGKey(0), cfg)
        ep = embed_mod.init_params(jax.random.PRNGKey(1), cfg)
        ecfg = bat.EngineConfig(max_num_seqs=64, max_prompt_len=16,
                                max_new_tokens=8, chunk_steps=4)
        eng = bat.Engine(cfg, ecfg, gp, ep)
        assert eng._fused and eng._kvb == 4
        rng = np.random.default_rng(9)
        # enough requests to occupy slots past the 32-peak boundary
        reqs = [bat.EngineRequest(
            request_id=f"w{i}",
            ids=rng.integers(5, 50, (4, cfg.num_vq)).astype(np.int32),
            text_mask=np.ones((4,), bool),
            temperature=np.full((cfg.num_vq,), 0.7, np.float32),
            min_new=4, max_new=4, seed=100 + i) for i in range(40)]
        outs = eng.generate(reqs)
        assert len(outs) == 40
        assert eng.stats.get("peak_slots", 0) > 32
        for o in outs:
            assert o.ids.shape[0] == 4
    finally:
        bat._build_kernels.cache_clear()


def test_prompt_too_long_rejected(tiny_config, params):
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params)
    with pytest.raises(ValueError):
        eng.add_request(_req(cfg, "x", n=20))


def test_mesh_sharded_engine(tiny_config, params):
    """Engine state/params shard over a dp x tp mesh; results stay correct."""
    from chattts_tpu.parallel.mesh import make_mesh

    cfg = tiny_config.gpt
    mesh = make_mesh(dp=4, tp=2)
    eng = _mk_engine(tiny_config, params)  # unsharded baseline
    base = eng.generate([_req(cfg, "m0", min_new=6, max_new=8)])

    from chattts_tpu.engine.batching import Engine, EngineConfig

    ecfg = EngineConfig(max_num_seqs=4, max_prompt_len=16, max_new_tokens=12,
                        chunk_steps=4, infer_text=False, collect_hidden=True)
    eng_m = Engine(cfg, ecfg, params[0], params[1], mesh=mesh)
    with mesh:
        outs = eng_m.generate([_req(cfg, "m0", min_new=6, max_new=8)])
    assert len(outs) == 1
    assert outs[0].ids.ndim == 2 and outs[0].ids.shape[1] == cfg.num_vq
    assert 6 <= outs[0].ids.shape[0] <= 8
    assert outs[0].host_hiddens().shape == (outs[0].ids.shape[0], cfg.hidden_size)
    # note: token-exact equality with the unsharded engine is NOT required -
    # tp-sharded reductions reassociate floats and can flip sampling ties.
    # determinism within the sharded engine must hold:
    eng_m2 = Engine(cfg, ecfg, params[0], params[1], mesh=mesh)
    with mesh:
        outs2 = eng_m2.generate([_req(cfg, "m0", min_new=6, max_new=8)])
    np.testing.assert_array_equal(outs[0].ids, outs2[0].ids)
    assert base[0].ids.shape[1] == outs[0].ids.shape[1]


def test_mesh_bad_dp_rejected(tiny_config, params):
    from chattts_tpu.parallel.mesh import make_mesh
    from chattts_tpu.engine.batching import Engine, EngineConfig

    mesh = make_mesh(dp=8, tp=1)
    ecfg = EngineConfig(max_num_seqs=6, max_prompt_len=16, max_new_tokens=8)
    with pytest.raises(ValueError):
        Engine(tiny_config.gpt, ecfg, params[0], params[1], mesh=mesh)


def test_prompt_buckets(tiny_config, params):
    """Short prompts prefill in a small bucket, long ones in a larger bucket;
    results keep per-request semantics."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, prompt_buckets=(8, 16))
    outs = eng.generate([_req(cfg, "b0", n=5, min_new=3, max_new=6),
                         _req(cfg, "b1", n=12, min_new=3, max_new=6)])
    assert len(outs) == 2
    for o in outs:
        assert 3 <= o.ids.shape[0] <= 6


def test_prompt_bucket_validation(tiny_config, params):
    from chattts_tpu.engine.batching import Engine, EngineConfig

    ecfg = EngineConfig(max_num_seqs=2, max_prompt_len=16,
                        max_new_tokens=8, prompt_buckets=(8, 32))
    with pytest.raises(ValueError):
        Engine(tiny_config.gpt, ecfg, params[0], params[1])


def test_long_chunks_match_short_chunks(tiny_config, params):
    """Offline generate amortizes host sync with long chunks when nothing is
    waiting/streaming; tokens must be bit-identical to short-chunk stepping
    and the steps stat must count steps actually executed (early exit)."""
    cfg = tiny_config.gpt
    mk = lambda: _mk_engine(tiny_config, params, max_num_seqs=4,
                            chunk_steps=2, max_new_tokens=16)
    reqs = lambda: [_req(cfg, f"c{i}", min_new=4, max_new=10, seed=i)
                    for i in range(3)]

    eng_long = mk()
    assert eng_long.ecfg.chunk_steps_max >= 16
    outs_long = eng_long.generate(reqs())  # generate() opts into long chunks

    eng_short = mk()
    for r in reqs():
        eng_short.add_request(r)
    outs_short = []
    while eng_short.has_unfinished():
        outs_short.extend(eng_short.step())  # serving quantum: short chunks

    by_id = {o.request_id: o for o in outs_short}
    for o in outs_long:
        np.testing.assert_array_equal(o.ids, by_id[o.request_id].ids)
    # the long-chunk engine ran everything in ONE dispatch and its steps
    # stat reflects actual executed steps, not the requested chunk length
    assert eng_long.stats["steps"] <= eng_long.ecfg.chunk_steps_max
    assert eng_long.stats["steps"] >= max(o.ids.shape[0] for o in outs_long)


def test_speculation_equivalence(tiny_config, params):
    """Dispatch-ahead speculation must not change tokens: same seeds with
    speculate on/off produce identical outputs (the speculative chunk after
    all-finish is a no-op and harvest reads append-only state)."""
    cfg = tiny_config.gpt
    outs = {}
    for spec in (True, False):
        eng = _mk_engine(tiny_config, params, chunk_steps=2, speculate=spec)
        rs = [_req(cfg, f"q{i}", min_new=3, max_new=9, seed=100 + i)
              for i in range(3)]
        outs[spec] = eng.generate(rs)
        assert not eng.has_unfinished()
    for a, b in zip(outs[True], outs[False]):
        assert a.request_id == b.request_id
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_array_equal(a.host_hiddens(), b.host_hiddens())


def test_engine_chaos_invariants(tiny_config, params):
    """Randomized serving chaos: interleaved admissions, aborts, long/short
    requests, and a mid-run interrupt must never strand work - every
    request either finishes (with its exact requested length bounds) or is
    accounted for as dropped, and the engine ends drained."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=2, chunk_steps=2,
                     max_new_tokens=16, preempt_after_chunks=2)
    rng = np.random.default_rng(0)
    submitted, finished, aborted = {}, {}, set()
    k = 0
    for it in range(60):
        if rng.random() < 0.5 and len(submitted) < 20:
            n = int(rng.integers(2, 12))
            r = _req(cfg, f"x{k}", min_new=min(2, n), max_new=n, seed=k)
            submitted[r.request_id] = n
            eng.add_request(r)
            k += 1
        if rng.random() < 0.15 and submitted:
            rid = rng.choice([r for r in submitted
                              if r not in finished and r not in aborted] or
                             list(submitted))
            if eng.abort_request(rid):
                aborted.add(rid)
        for o in eng.step():
            finished[o.request_id] = o
    # mid-run interrupt drops whatever is in flight
    dropped = {r.request_id for r in eng.interrupt()}
    assert not eng.has_unfinished()
    # drain: everything submitted is finished, aborted, or dropped
    for rid, max_n in submitted.items():
        if rid in finished:
            o = finished[rid]
            assert 0 <= o.ids.shape[0] <= max_n
            assert o.host_hiddens().shape[0] == o.ids.shape[0]
            assert o.finish_reason in ("eos", "length")
        else:
            assert rid in aborted or rid in dropped, rid
    assert finished  # the chaos actually completed work
    # the engine is reusable afterwards
    outs = eng.generate([_req(cfg, "post", min_new=2, max_new=4, seed=1)])
    assert len(outs) == 1 and outs[0].ids.shape[0] >= 2


def test_outputs_to_generation_device_batch(tiny_config, params):
    """Non-streaming engine outputs keep hiddens on device; the stacked
    GenerationOutputs batch must decode identically to the host copies."""
    from chattts_tpu.engine.batching import outputs_to_generation

    cfg = tiny_config.gpt
    # (a) equal lengths: all finish in ONE chunk and share a single harvest
    # gather - outputs_to_generation reuses it without a pad/stack per row
    eng = _mk_engine(tiny_config, params)
    outs = eng.generate([_req(cfg, f"d{i}", min_new=6, max_new=6, seed=i)
                         for i in range(3)])
    assert all(o._hb is not None for o in outs)
    assert all(o._hb is outs[0]._hb for o in outs)  # one shared gather
    g = outputs_to_generation(outs)
    assert g.hiddens_dev is not None and g.end_dev is not None
    assert g.hiddens_dev.shape == (3, 6, cfg.hidden_size)
    ends = np.asarray(g.end_dev)
    for i, o in enumerate(outs):
        n = o.host_hiddens().shape[0]
        assert ends[i] == n == o.ids.shape[0]
        np.testing.assert_array_equal(np.asarray(g.hiddens_dev[i, :n]),
                                      o.host_hiddens())

    # (b) mixed lengths finish in different chunks (different gathers):
    # the batch falls back to per-output pad+stack with zero padding
    eng = _mk_engine(tiny_config, params)
    outs = eng.generate([_req(cfg, f"m{i}", min_new=3, max_new=3 + 4 * i,
                              seed=i) for i in range(3)])
    assert all(o.dev_hiddens() is not None for o in outs)
    g = outputs_to_generation(outs)
    ends = np.asarray(g.end_dev)
    n_max = int(ends.max())
    assert g.hiddens_dev.shape == (3, n_max, cfg.hidden_size)
    for i, o in enumerate(outs):
        n = o.host_hiddens().shape[0]
        assert ends[i] == n
        np.testing.assert_array_equal(np.asarray(g.hiddens_dev[i, :n]),
                                      o.host_hiddens())
        if len({int(e) for e in ends}) > 1:
            assert not np.asarray(g.hiddens_dev[i, n:]).any()  # zero pad

    # streaming requests keep the host/callback path (no device copy)
    eng2 = _mk_engine(tiny_config, params)
    got = []
    req = _req(cfg, "s", min_new=3, max_new=6,
               on_tokens=lambda rid, ids, hid, fin: got.append(hid))
    outs2 = eng2.generate([req])
    assert outs2[0].dev_hiddens() is None and outs2[0].hiddens is not None

def test_device_streaming_hiddens(tiny_config, params):
    """stream_hiddens_dev: on_tokens receives the FULL (max_new, D) device
    hiddens row (cumulative, fixed shape); its kept prefix bit-matches the
    host streaming increments, and the finished output still carries
    device-resident hiddens (VERDICT r2 #2: engine streaming without the
    per-chunk host round trip)."""
    cfg = tiny_config.gpt
    inc = []
    eng1 = _mk_engine(tiny_config, params, chunk_steps=2)
    r1 = _req(cfg, "h0", seed=77, min_new=5, max_new=8,
              on_tokens=lambda rid, ids, hid, fin: inc.append(hid))
    out1 = eng1.generate([r1])

    eng2 = _mk_engine(tiny_config, params, chunk_steps=2)
    seen = {"dev": False, "rows": None}

    def on2(rid, ids, hid, fin):
        if hid is not None:
            seen["dev"] = isinstance(hid, jax.Array)
            seen["rows"] = hid

    r2 = _req(cfg, "h0", seed=77, min_new=5, max_new=8, on_tokens=on2,
              stream_hiddens_dev=True)
    out2 = eng2.generate([r2])

    np.testing.assert_array_equal(out1[0].ids, out2[0].ids)
    n = out2[0].ids.shape[0]
    assert seen["dev"], "hiddens crossed to host"
    assert seen["rows"].shape[0] == eng2.ecfg.max_new_tokens  # full row
    host_hid = np.concatenate([h for h in inc if h is not None])
    np.testing.assert_array_equal(np.asarray(seen["rows"])[:n], host_hid)
    # finish keeps device-resident hiddens despite the streaming callback
    assert out2[0].dev_hiddens() is not None
    np.testing.assert_array_equal(np.asarray(out2[0].dev_hiddens()),
                                  out1[0].host_hiddens())


def test_device_streaming_slot_preemptable(tiny_config, params):
    """Device-streaming slots ARE preemptable (round-4): the resume prefill
    re-scatters the teacher-forced prefix's hiddens into the new slot at
    GLOBAL positions, so the consumer's cumulative snapshots stay
    position-aligned, tokens are exact, and a short request no longer
    starves behind a long stream."""
    cfg = tiny_config.gpt
    mk = lambda **kw: _mk_engine(tiny_config, params, max_num_seqs=1,
                                 chunk_steps=2, max_new_tokens=16, **kw)

    # reference run: no contention, no preemption
    ref_inc = []
    eng0 = mk()
    eng0.generate([_req(cfg, "pin", seed=3, min_new=14, max_new=14,
                        stream_hiddens_dev=True,
                        on_tokens=lambda rid, ids, hid, fin:
                        ref_inc.append((None if ids is None else ids.copy(),
                                        hid)))])

    eng = mk(preempt_after_chunks=1)
    inc = []
    last_snap = {}

    def on_tokens(rid, ids, hid, fin):
        inc.append(None if ids is None else ids.copy())
        if hid is not None:
            last_snap["hid"] = hid

    long = _req(cfg, "pin", seed=3, min_new=14, max_new=14,
                on_tokens=on_tokens, stream_hiddens_dev=True)
    short = _req(cfg, "short", seed=4, min_new=2, max_new=2)
    eng.add_request(long)
    eng.add_request(short)
    outs, order = [], []
    while eng.has_unfinished():
        for o in eng.step():
            outs.append(o)
            order.append(o.request_id)
    assert eng.stats.get("preemptions", 0) > 0
    assert order[0] == "short"  # no longer starved
    by_id = {o.request_id: o for o in outs}
    assert by_id["pin"].ids.shape[0] == 14
    assert by_id["short"].ids.shape[0] == 2
    # streamed ids across the preemption stitch back token-exact
    streamed = np.concatenate([i for i in inc if i is not None])
    np.testing.assert_array_equal(streamed, by_id["pin"].ids)
    ref_streamed = np.concatenate([i for i, _ in ref_inc if i is not None])
    np.testing.assert_array_equal(streamed, ref_streamed)
    # the final cumulative snapshot is position-aligned: rows [0, 14) are
    # the request's own hiddens (recomputed prefix within float tolerance)
    ref_hid = np.asarray([h for _, h in ref_inc if h is not None][-1])[:14]
    got_hid = np.asarray(last_snap["hid"])[:14]
    np.testing.assert_allclose(got_hid, ref_hid, rtol=2e-2, atol=2e-3)


def test_host_streamer_preemption_resume(tiny_config, params):
    """A HOST-streaming request (on_tokens without stream_hiddens_dev)
    survives preemption-by-recompute: streamed ids stay token-exact and the
    per-increment hiddens keep global positions (the post-resume windows
    slice the re-scattered buffer at the right offsets)."""
    cfg = tiny_config.gpt
    mk = lambda **kw: _mk_engine(tiny_config, params, max_num_seqs=1,
                                 chunk_steps=2, max_new_tokens=16, **kw)
    ref_ids, ref_hid = [], []
    eng0 = mk()
    eng0.generate([_req(cfg, "h", seed=7, min_new=12, max_new=12,
                        on_tokens=lambda rid, ids, hid, fin: (
                            ref_ids.append(ids), ref_hid.append(hid)))])

    eng = mk(preempt_after_chunks=1)
    got_ids, got_hid = [], []
    long = _req(cfg, "h", seed=7, min_new=12, max_new=12,
                on_tokens=lambda rid, ids, hid, fin: (
                    got_ids.append(ids), got_hid.append(hid)))
    short = _req(cfg, "s", seed=1, min_new=2, max_new=2)
    eng.add_request(long)
    eng.add_request(short)
    outs = []
    while eng.has_unfinished():
        outs.extend(eng.step())
    assert eng.stats.get("preemptions", 0) > 0
    ids_a = np.concatenate([i for i in ref_ids if i is not None])
    ids_b = np.concatenate([i for i in got_ids if i is not None])
    np.testing.assert_array_equal(ids_a, ids_b)
    hid_a = np.concatenate([h for h in ref_hid if h is not None])
    hid_b = np.concatenate([h for h in got_hid if h is not None])
    assert hid_a.shape == hid_b.shape == (12, cfg.hidden_size)
    # post-resume hiddens recompute the prefix via prefill: float-close
    np.testing.assert_allclose(hid_b, hid_a, rtol=2e-2, atol=2e-3)
    out = next(o for o in outs if o.request_id == "h")
    np.testing.assert_allclose(out.host_hiddens(), hid_a,
                               rtol=2e-2, atol=2e-3)


def test_stream_slot_cap_bounds_starvation(tiny_config, params):
    """max_stream_slots: a streaming-majority mix cannot hold every slot -
    capped streamers queue while non-streaming work admits past them, so
    queued short requests complete in bounded chunks even when streams run
    too long to stay preemptable."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=2, chunk_steps=2,
                     max_new_tokens=16, max_stream_slots=1)
    streams = [_req(cfg, f"st{i}", seed=i, min_new=12, max_new=12,
                    on_tokens=lambda *a: None, stream_hiddens_dev=True)
               for i in range(3)]
    for r in streams:
        eng.add_request(r)
    outs = []
    outs.extend(eng.step())
    # only ONE stream admitted despite 2 free slots
    live = [r for r in eng.slots if r is not None]
    assert sum(r.stream_hiddens_dev for r in live) == 1
    short = _req(cfg, "short", seed=9, min_new=2, max_new=2)
    eng.add_request(short)
    steps = 0
    while eng.has_unfinished():
        outs.extend(eng.step())
        steps += 1
        assert steps < 50
    order = [o.request_id for o in outs]
    # the short request did NOT wait for all three 12-token streams
    assert order.index("short") < order.index("st2")
    assert {o.request_id for o in outs} == {"st0", "st1", "st2", "short"}
    for o in outs:
        want = 2 if o.request_id == "short" else 12
        assert o.ids.shape[0] == want


def test_final_notification_on_chunk_boundary_eos(tiny_config, params):
    """EOS sampled on a chunk's FIRST step adds no kept tokens (the EOS
    token is dropped); the streaming consumer must still get its
    finished=True notification - a waiter blocked on it would otherwise
    hang forever (e.g. TTSService.synthesize_stream)."""
    cfg = tiny_config.gpt
    CH = 4
    # probe with EOS disabled (id outside the vocab never sampled;
    # min_new=0 keeps sampling identical between probe and real run)
    probe_eng = _mk_engine(tiny_config, params, chunk_steps=CH,
                           max_new_tokens=16)
    found = None
    for seed in range(8):
        probe = probe_eng.generate([_req(
            cfg, f"probe{seed}", seed=seed, min_new=0, max_new=16,
            eos_token=cfg.num_audio_tokens + 9)])[0]
        toks = probe.ids  # (16, num_vq), length-finished
        if toks.shape[0] < 16:
            continue
        for i in (CH, 2 * CH):
            for v in toks[i]:
                if int(v) not in toks[:i]:
                    found = (seed, i, int(v))
                    break
            if found:
                break
        if found:
            break
    assert found is not None, "no chunk-boundary EOS candidate"
    seed, i, v = found
    eng = _mk_engine(tiny_config, params, chunk_steps=CH, max_new_tokens=16)
    finals = []
    req = _req(cfg, f"probe{seed}", seed=seed, min_new=0, max_new=16,
               eos_token=v,
               on_tokens=lambda rid, ids, hid, fin: finals.append(
                   (0 if ids is None else ids.shape[0], fin)))
    out = eng.generate([req])[0]
    assert out.finish_reason == "eos"
    assert out.ids.shape[0] == i  # EOS right at the chunk boundary
    assert finals and finals[-1][1] is True
    assert sum(n for n, _ in finals) == i


def test_service_synthesize_stream_device(tiny_config):
    """TTSService.synthesize_stream rides the device-resident engine path:
    deterministic for a seed, and the hiddens handed to the callback never
    materialize on host inside the service."""
    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    try:
        p = Chat.InferCodeParams(max_new_token=24, min_new_token=24,
                                 manual_seed=9, stream_batch=4)
        ca = list(svc.synthesize_stream("stream me", p))
        cb = list(svc.synthesize_stream("stream me", p))
        assert all(c.ndim == 2 and c.shape[0] == 1 for c in ca)  # (1, n)
        a = np.concatenate(ca, axis=1)
        b = np.concatenate(cb, axis=1)
        assert a.dtype == np.float32 and a.size > 0
        np.testing.assert_allclose(a, b, atol=1e-6)
    finally:
        svc.close()


def test_service_warmup_stream_resets_stats(tiny_config):
    """warmup_stream pre-compiles the streaming surface (window vocoder +
    deferred-PCM jits - the population Engine.warmup does NOT cover) and
    then resets engine counters/latency windows, so production percentiles
    measure real traffic only; streams after it stay seed-deterministic."""
    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)  # CPU: construction warmup defaults off
    try:
        p = Chat.InferCodeParams(max_new_token=24, min_new_token=24,
                                 manual_seed=9, stream_batch=4)
        ref = np.concatenate(list(svc.synthesize_stream("stream me", p)),
                             axis=1)
        svc.warmup_stream(p)
        eng = chat._engine_for_code()
        assert eng.latency_stats() == {}             # windows dropped
        assert eng.stats["requests_finished"] == 0   # counters zeroed
        assert svc.stats()["pending"] == 0           # nothing left queued
        got = np.concatenate(list(svc.synthesize_stream("stream me", p)),
                             axis=1)
        np.testing.assert_allclose(got, ref, atol=1e-6)
    finally:
        svc.close()


def test_service_stream_cadence(tiny_config):
    """synthesize_stream honors the reference cadence (core.py:487-503):
    pass_first_n_batches withholds early yields (they accumulate and emit
    together), stream_speed bounds every mid-stream yield, and the samples
    themselves are invariant to the cadence parameters."""
    import dataclasses

    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    try:
        base = Chat.InferCodeParams(max_new_token=72, min_new_token=72,
                                    manual_seed=9, stream_batch=4)
        big = 1 << 30
        b = list(svc.synthesize_stream("cadence", dataclasses.replace(
            base, pass_first_n_batches=0, stream_speed=big)))
        a = list(svc.synthesize_stream("cadence", dataclasses.replace(
            base, pass_first_n_batches=1, stream_speed=big)))
        ca, cb = np.concatenate(a, axis=1), np.concatenate(b, axis=1)
        # same audio regardless of cadence
        np.testing.assert_allclose(ca, cb, atol=1e-5)
        # the withheld first batch emits together with the second
        assert len(a) < len(b) or a[0].shape[1] > b[0].shape[1]
        # stream_speed bounds every yield; the final flush carries the rest
        d = list(svc.synthesize_stream("cadence", dataclasses.replace(
            base, pass_first_n_batches=0, stream_speed=512)))
        assert all(c.shape[1] <= 512 for c in d[:-1])
        cd = np.concatenate(d, axis=1)
        n = min(1024, cd.shape[1], cb.shape[1])
        np.testing.assert_allclose(cd[:, :n], cb[:, :n], atol=1e-5)
    finally:
        svc.close()


def test_service_stream_abandonment_aborts(tiny_config):
    """Closing a synthesize_stream generator mid-stream (what the HTTP
    layer does when a client disconnects) aborts the engine request: the
    slot frees promptly instead of decoding to max_new, and no further
    increments queue (VERDICT r4 missing #2)."""
    import time

    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    try:
        p = Chat.InferCodeParams(max_new_token=512, min_new_token=512,
                                 manual_seed=4, stream_batch=4,
                                 pass_first_n_batches=0, stream_speed=256)
        gen = svc.synthesize_stream("abandoned stream", p)
        first = next(gen)
        assert first.size
        eng = chat._engine_for_code()
        assert any(r is not None for r in eng.slots)
        gen.close()  # consumer disconnected
        deadline = time.time() + 30
        while time.time() < deadline and (
                any(r is not None for r in eng.slots) or eng.waiting
                or svc._pending):
            time.sleep(0.02)
        assert not any(r is not None for r in eng.slots), \
            "abandoned request still holds its slot"
        assert not eng.waiting and not svc._pending
        # the service stays healthy: a fresh stream completes normally
        p2 = Chat.InferCodeParams(max_new_token=16, min_new_token=16,
                                  manual_seed=5, stream_batch=4)
        chunks = list(svc.synthesize_stream("fresh stream", p2))
        assert sum(c.shape[1] for c in chunks) > 0
    finally:
        svc.close()


def test_service_soak_repeated_waves(tiny_config):
    """Soak the serving spine: successive waves of mixed concurrent work
    (stream + synthesize + refine) on ONE service must not degrade across
    waves (guards the BENCH_r04 repeat-run collapse shape: runs 1-2 hit
    TTFA ~= wall on a warm process) and must leave every engine's slots and
    queues empty between waves (guards the abandonment-leak class)."""
    import threading
    import time

    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    try:
        sp = Chat.InferCodeParams(max_new_token=48, min_new_token=48,
                                  manual_seed=7, stream_batch=4,
                                  pass_first_n_batches=0, stream_speed=1024)
        npar = Chat.InferCodeParams(max_new_token=12, min_new_token=8,
                                    manual_seed=8)
        rp = Chat.RefineTextParams(max_new_token=8, min_new_token=2,
                                   manual_seed=9)
        walls, ttfas = [], []
        for wave in range(6):  # wave 0 = compile warmup
            t0 = time.perf_counter()
            ttfa = [None]
            errs = []

            def stream_client():
                try:
                    for c in svc.synthesize_stream("soak stream", sp):
                        if c.size and ttfa[0] is None:
                            ttfa[0] = time.perf_counter() - t0
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            def synth_client():
                try:
                    svc.synthesize("soak synth", None, npar,
                                   skip_refine_text=True)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            def refine_client():
                try:
                    svc.refine(["soak refine"], rp)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            ts = [threading.Thread(target=f)
                  for f in (stream_client, synth_client, refine_client)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=180)
            assert not errs, errs
            assert ttfa[0] is not None
            if wave:
                walls.append(time.perf_counter() - t0)
                ttfas.append(ttfa[0])
            # between waves: every engine drained (clients may unblock a
            # hair before the driver clears the freed slots - poll briefly)
            deadline = time.time() + 20

            def drained():
                return (not svc._pending and all(
                    not e.waiting and all(r is None for r in e.slots)
                    for e in svc._engines()))

            while time.time() < deadline and not drained():
                time.sleep(0.01)
            assert drained(), f"wave {wave} left engine state behind"
        # no cross-wave degradation (band generous for CI scheduling noise;
        # the BENCH_r04 collapse shape was 7-25x)
        assert max(walls) <= 5 * min(walls), walls
        assert max(ttfas) <= 6 * min(ttfas) + 0.25, ttfas
        # latency observability populated (VERDICT r4 #7)
        snap = svc.stats()
        assert snap["code"]["first_emission_n"] >= 10
        assert snap["code"]["queue_delay_p50_s"] >= 0.0
        assert snap["text"]["first_emission_n"] >= 5
    finally:
        svc.close()


def test_engine_latency_stats(tiny_config, params):
    """Engine.latency_stats exposes submit->admit and admit->first-emission
    percentiles: a queued request (no free slot) must show a larger queue
    delay than the request occupying the slot."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, max_num_seqs=1, chunk_steps=2)
    outs = eng.generate([_req(cfg, "a", min_new=6, max_new=6, seed=1),
                         _req(cfg, "b", min_new=6, max_new=6, seed=2)])
    assert len(outs) == 2
    lat = eng.latency_stats()
    assert lat["queue_delay_n"] == 2
    assert lat["first_emission_n"] == 2
    # "b" waited for "a"'s full 6-token run before admission; "a" admitted
    # on the first step -> the max queue delay clearly dominates the min
    delays = sorted(eng._lat_queue)
    assert delays[1] > delays[0] + 1e-4
    assert lat["queue_delay_max_s"] == delays[1]
    assert lat["first_emission_max_s"] > 0.0


def test_inc_queue_bounds_lagging_consumer():
    """The streaming increment queue collapses non-final increments past
    its bound (cumulative rows supersede) but never drops finals."""
    from chattts_tpu.serving import _IncQueue

    q = _IncQueue(maxsize=3)
    for i in range(10):
        q.put((f"row{i}", i + 1, False))
    assert len(q) == 3
    q.put((None, 10, True))  # final always appends
    assert len(q) == 4
    items = [q.get() for _ in range(4)]
    assert [it[1] for it in items] == [1, 2, 10, 10]
    assert items[-1][2] is True
    q.drain()
    assert len(q) == 0


def test_speculation_streaming_equivalence(tiny_config, params):
    """Dispatch-ahead now also covers STREAMING consumers (the chunk's ids
    ride the packed status transfer, so harvest never blocks on the
    in-flight speculative chunk): increments and finals must bit-match the
    non-speculative engine."""
    cfg = tiny_config.gpt
    runs = {}
    for spec in (True, False):
        eng = _mk_engine(tiny_config, params, chunk_steps=2, speculate=spec)
        inc = {}

        def on_tokens(rid, ids, hid, fin, inc=inc):
            if ids is not None:
                inc.setdefault(rid, []).append(np.asarray(ids))

        rs = [_req(cfg, f"ss{i}", min_new=3, max_new=9, seed=50 + i,
                   on_tokens=on_tokens) for i in range(3)]
        outs = eng.generate(rs)
        runs[spec] = (outs, {k: np.concatenate(v) for k, v in inc.items()})
    for a, b in zip(runs[True][0], runs[False][0]):
        assert a.request_id == b.request_id
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_array_equal(a.host_hiddens(), b.host_hiddens())
    for rid, ids in runs[True][1].items():
        np.testing.assert_array_equal(ids, runs[False][1][rid])


def test_speculation_held_until_first_stream_emission(tiny_config, params):
    """Dispatch-ahead is HELD while a device-streaming slot has not yet
    emitted its first window (the consumer's first window vocode dispatches
    right after that harvest; a speculative chunk in the device queue would
    delay it by a full chunk's compute — the concurrent-stream TTFA lever,
    PERF.md round 5 probe v6/v7), then resumes for steady-state yields."""
    cfg = tiny_config.gpt
    eng = _mk_engine(tiny_config, params, chunk_steps=2, speculate=True)
    emissions = []
    r = _req(cfg, "hold", min_new=8, max_new=8, seed=3,
             on_tokens=lambda rid, ids, hid, fin: emissions.append(fin),
             stream_hiddens_dev=True)
    eng.add_request(r)
    eng.step()
    # first chunk harvested (first emission just delivered) - the hold must
    # have kept the device queue empty for the consumer's window vocode
    assert emissions and r._first_done
    assert eng._spec is None
    eng.step()
    # steady state: dispatch-ahead resumes to hide the status round trip
    assert eng._spec is not None
    while eng.has_unfinished():
        eng.step()
    assert emissions[-1] is True


def test_host_slot_key_matches_jax_fold_in():
    """The engine's host-derived slot key MUST be bit-identical to the
    generator's jax derivation (PRNGKey(seed) + fold_in(attempt)): the
    engine and generator paths are pinned token-exact against each other,
    and the slot key seeds the shared device-side fold-in chain."""
    from chattts_tpu.engine.batching import _host_slot_key

    for seed, att in [(0, 0), (4, 0), (4, 1), (123456789, 7),
                      (2**31 - 1, 3), (42, 255)]:
        ref = np.asarray(jax.random.key_data(jax.random.fold_in(
            jax.random.PRNGKey(seed), att)), np.uint32)
        np.testing.assert_array_equal(_host_slot_key(seed, att), ref)


def test_chunk_steps_exceeding_max_rejected():
    """The packed per-chunk id transfer carries chunk_steps_max ids per
    slot; a longer quantum would silently truncate the host-side id
    accumulator, so the config must refuse it at construction."""
    with pytest.raises(ValueError, match="chunk_steps"):
        EngineConfig(chunk_steps=256, chunk_steps_max=128)


def test_service_first_window_dispatch_gated_on_warm_cadence(tiny_config):
    """The engine-driver-thread first-window dispatch (serving.py
    on_tokens -> speculate_window) only fires for a stream_batch whose
    window jits are known-compiled: on TPU a cold window jit is a 0.5-13 s
    remote compile, and paying it in the driver thread under the service
    mutex would freeze every concurrent stream (the BENCH_r04 stall class).
    A cold cadence's first stream compiles in its own consumer thread and
    warms the set; later streams of that cadence dispatch driver-side."""
    import threading

    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = Chat(config=tiny_config)
    chat.load(source="random", seed=0, use_engine=True)
    svc = TTSService(chat)
    spec_threads = []
    orig = Chat._device_stream_decoder

    def wrapped(self, *a, **kw):
        sd = orig(self, *a, **kw)
        inner = sd.speculate_window

        def spy(*aa, **kk):
            spec_threads.append(threading.current_thread().name)
            return inner(*aa, **kk)

        sd.speculate_window = spy
        return sd

    Chat._device_stream_decoder = wrapped
    try:
        # >1 engine chunk: a request that finishes inside its first
        # chunk only ever delivers a FINAL increment, which never
        # dispatches driver-side regardless of warmth
        p = Chat.InferCodeParams(max_new_token=160, min_new_token=160,
                                 manual_seed=9, stream_batch=4)
        assert 4 not in svc._warm_windows
        ref = np.concatenate(list(svc.synthesize_stream("warm gate", p)),
                             axis=1)
        # cold cadence: nothing dispatched from the engine driver thread
        assert not any(t.startswith("tts-engine-driver")
                       for t in spec_threads)
        assert 4 in svc._warm_windows
        spec_threads.clear()
        got = np.concatenate(list(svc.synthesize_stream("warm gate", p)),
                             axis=1)
        # warm cadence: the first window DID dispatch driver-side, and the
        # speculation contract keeps the audio bit-identical
        assert any(t.startswith("tts-engine-driver") for t in spec_threads)
        np.testing.assert_allclose(got, ref, atol=1e-6)
    finally:
        Chat._device_stream_decoder = orig
        svc.close()
