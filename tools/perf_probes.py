"""On-chip perf probes (run on the real TPU chip, ONE process at a time).

Each probe prints its measurements to stdout; results are recorded in
PERF.md.  Alternating same-process A/Bs only - single runs swing +-10-20%
with chip weather (see CLAUDE.md).

Usage: python tools/perf_probes.py <probe>

  tier_ab    - facade use_engine=True with DEFAULT InferCodeParams (max_new
               2048 ceiling, EOS-terminated ~400-step batch) vs the
               generator path: the round-3 VERDICT's routing acceptance
               (within ~25% = tier routing fixed).
  longform   - capacity tier at the advertised workload: 16 slots x 2048
               steps end to end; compares per-step time vs 16 x 384 to
               price the KV stream at depth (kv-int8 ship/close decision).
  service_ab - TTSService.synthesize_stream wall vs the facade
               engine-backend stream (same params): the service must ride
               the same latency machinery (round-3 weak #3).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable as `python tools/perf_probes.py` (script dir is sys.path[0])
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(use_engine=True):
    from chattts_tpu.config import Config
    from chattts_tpu.core import Chat

    cfg = Config().with_runtime(wire_int16=True)
    chat = Chat(config=cfg)
    chat.load(source="random", seed=0, use_engine=use_engine)
    return chat


def tier_ab():
    from chattts_tpu.core import Chat

    chat = _load()
    texts = ["Benchmark sentence number %d for tier routing." % i
             for i in range(8)]
    # DEFAULT ceiling (2048), EOS-terminated around ~400 steps: min_new
    # forces 384, then any-codebook EOS lands within ~tens of steps on
    # seeded-random weights.  Same seed => generator and engine produce
    # token-identical sequences (wire-pinned), so walls are comparable.
    params = Chat.InferCodeParams(min_new_token=384, manual_seed=11,
                                  show_tqdm=False)

    def run(use_engine):
        chat.use_engine = use_engine
        t0 = time.perf_counter()
        wavs = chat._generate_wavs(texts, True, params)
        return time.perf_counter() - t0, wavs.shape

    for be in (True, False):
        w, shape = run(be)
        print(f"warmup use_engine={be}: {w:.2f}s {shape}")
    walls = {True: [], False: []}
    for i in range(4):  # alternating A/B
        for be in (True, False):
            w, shape = run(be)
            walls[be].append(w)
            print(f"run {i} use_engine={be}: wall={w:.3f}s wav={shape}")
    ge, gg = min(walls[True]), min(walls[False])
    print(f"BEST engine={ge:.3f}s generator={gg:.3f}s "
          f"ratio={gg / ge:.3f} (target >= 0.75)")


def longform():
    from chattts_tpu.core import Chat

    chat = _load()
    eng = chat._engine_for_code("capacity")
    texts = ["Long form serving sentence %d." % i for i in range(16)]

    def run(steps):
        params = Chat.InferCodeParams(
            max_new_token=steps, min_new_token=steps, manual_seed=5,
            show_tqdm=False)
        reqs = chat._code_requests(texts, params)
        for i, r in enumerate(reqs):
            r.request_id = f"lf-{steps}-{time.monotonic_ns()}-{i}"
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        wall = time.perf_counter() - t0
        total = sum(o.metrics["gen_tokens"] for o in outs)
        return wall, total

    run(384)  # warmup/compile
    for steps in (384, 2048, 384, 2048):  # alternating
        wall, total = run(steps)
        per_step = wall / steps * 1e3
        print(f"16x{steps}: wall={wall:.2f}s steps/s={total / wall:.0f} "
              f"speech tokens/s/chip={4 * total / wall:.0f} "
              f"chunk-step={per_step:.3f} ms (16 rows)")


def service_ab():
    from chattts_tpu.core import Chat
    from chattts_tpu.serving import TTSService

    chat = _load()
    params = Chat.InferCodeParams(
        max_new_token=384, min_new_token=384, manual_seed=3,
        stream_batch=24, pass_first_n_batches=0, stream_speed=12000,
        show_tqdm=False)
    text = "Service streaming A B sentence."
    svc = TTSService(chat)

    def run_svc():
        t0 = time.perf_counter()
        ttfa = None
        n = 0
        for c in svc.synthesize_stream(text, params):
            if c.size and ttfa is None:
                ttfa = time.perf_counter() - t0
            n += c.shape[1]
        return time.perf_counter() - t0, ttfa, n

    def run_facade():
        chat.use_engine = True
        t0 = time.perf_counter()
        ttfa = None
        n = 0
        for c in chat.infer(text, stream=True, skip_refine_text=True,
                            params_infer_code=params):
            if c.size and ttfa is None:
                ttfa = time.perf_counter() - t0
            n += c.shape[1]
        return time.perf_counter() - t0, ttfa, n

    try:
        run_svc()
        run_facade()
        for i in range(4):
            ws, ts, ns = run_svc()
            wf, tf, nf = run_facade()
            print(f"run {i}: service wall={ws:.3f}s ttfa={ts * 1e3:.0f}ms "
                  f"n={ns} | facade wall={wf:.3f}s ttfa={tf * 1e3:.0f}ms "
                  f"n={nf}")
    finally:
        svc.close()




def stream_scale():
    """Concurrent-stream scaling through TTSService: N clients share the
    capacity engine's decode slots.  Reports per-N wall / aggregate
    steps/s / TTFA p50, plus an instrumented breakdown of where the wall
    goes (window-decode count and cumulative update_dev time per stream)
    - the input for deciding whether a shared batched window vocode
    across streams is worth building.  STREAM_TRACE=1 wraps the N=4 run
    in jax.profiler.trace (dir /tmp/stream_trace)."""
    import threading

    from chattts_tpu.core import Chat
    from chattts_tpu.engine import streaming as streaming_mod
    from chattts_tpu.serving import TTSService

    chat = _load()
    svc = TTSService(chat)
    S_STEPS = 256
    params = Chat.InferCodeParams(
        max_new_token=S_STEPS, min_new_token=S_STEPS, manual_seed=7,
        stream_batch=16, pass_first_n_batches=0, stream_speed=12000,
        show_tqdm=False)

    # instrument: count window decodes + cumulative update_dev wall across
    # all streams (thread-safe enough for coarse accounting)
    stats = {"windows": 0, "upd_s": 0.0}
    orig_decode = streaming_mod.DeviceStreamingDecoder._decode_window
    orig_decode_async = streaming_mod.AsyncDeviceWindows._decode_window
    orig_update = streaming_mod.DeviceStreamingDecoder.update_dev

    def counting_decode(self, lo, hi, pad_left):
        stats["windows"] += 1
        return orig_decode(self, lo, hi, pad_left)

    def counting_decode_async(self, lo, hi, pad_left):
        stats["windows"] += 1
        return orig_decode_async(self, lo, hi, pad_left)

    def timing_update(self, feats_dev, n, final=False, end_dev=None):
        t0 = time.perf_counter()
        out = orig_update(self, feats_dev, n, final=final, end_dev=end_dev)
        stats["upd_s"] += time.perf_counter() - t0
        return out

    streaming_mod.DeviceStreamingDecoder._decode_window = counting_decode
    streaming_mod.AsyncDeviceWindows._decode_window = counting_decode_async
    streaming_mod.DeviceStreamingDecoder.update_dev = timing_update

    def run(n_clients):
        ttfas = [None] * n_clients
        done = [0.0] * n_clients

        def client(i):
            t0 = time.perf_counter()
            for chunk in svc.synthesize_stream(
                    "Concurrent scale client %d sentence." % i, params):
                if chunk.size and ttfas[i] is None:
                    ttfas[i] = time.perf_counter() - t0
            done[i] = time.perf_counter() - t0

        stats["windows"] = 0
        stats["upd_s"] = 0.0
        t0 = time.perf_counter()
        ts = [threading.Thread(target=client, args=(i,))
              for i in range(n_clients)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        tt = sorted(t for t in ttfas if t is not None)
        p50 = tt[len(tt) // 2] if tt else float("nan")
        return wall, p50, stats["windows"], stats["upd_s"]

    try:
        for n in (1, 2, 4, 8):
            run(n)  # warmup that N's shapes
            for i in range(2):
                if (n == 4 and i == 1
                        and os.environ.get("STREAM_TRACE") == "1"):
                    import jax

                    with jax.profiler.trace("/tmp/stream_trace"):
                        wall, p50, nw, upd = run(n)
                    print("  (trace written to /tmp/stream_trace)")
                else:
                    wall, p50, nw, upd = run(n)
                agg = n * S_STEPS / wall
                eng = svc._engs[0]
                print(f"N={n} run {i}: wall={wall:.3f}s agg={agg:.0f} "
                      f"steps/s ttfa_p50={p50 * 1e3:.0f}ms "
                      f"windows={nw} update_dev={upd:.3f}s "
                      f"stats={dict(eng.stats)}")
    finally:
        streaming_mod.DeviceStreamingDecoder._decode_window = orig_decode
        streaming_mod.AsyncDeviceWindows._decode_window = orig_decode_async
        streaming_mod.DeviceStreamingDecoder.update_dev = orig_update
        svc.close()


def append_ab():
    """Price the per-slot append RMW: the fused step at identical geometry
    with (a) scalar cur (per_slot=False, ONE batched RW-window RMW per
    layer), (b) per-row cur with EQUAL values (per_slot=True, 4B DMA
    issues per layer - isolates issue COUNT from alignment), (c) per-row
    cur with staggered values (the real continuous-batching shape).

    Motivation: engine chunk-step time scales ~linearly with slot count
    (0.845 / 1.49 / 2.75 / 8.2 ms at B=8/16/32/64) while the KV chunk
    reads are already batched - the per-row append windows (4B async
    copies per layer per step) are the suspected per-row cost.  Measured
    inside ONE jitted scan (the dispatch-latency trap, CLAUDE.md).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from chattts_tpu.config import Config
    from chattts_tpu.models import llama
    from chattts_tpu.ops import pallas_step

    cfg = Config().gpt
    HD = cfg.num_attention_heads * cfg.head_dim
    L = cfg.num_hidden_layers
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    packed = pallas_step.pack_step_params(params, cfg)
    B = int(os.environ.get("APPEND_AB_B", "16"))
    T0, STEPS = 128, 128
    T = ((T0 + STEPS + 31) // 32) * 32
    k0 = (jax.random.normal(jax.random.PRNGKey(2), (L, B, T, HD),
                            jnp.bfloat16) * 0.1)
    v0 = (jax.random.normal(jax.random.PRNGKey(3), (L, B, T, HD),
                            jnp.bfloat16) * 0.1)
    kq = pallas_step.kv8_quantize(k0, cfg)
    vq = pallas_step.kv8_quantize(v0, cfg)
    emb = jax.random.normal(jax.random.PRNGKey(4), (B, cfg.hidden_size),
                            jnp.float32) * 0.1
    lo = jnp.zeros((B,), jnp.int32)

    def body(packed, emb, lo, carry, _):
        k, v, cur = carry
        pos = jnp.broadcast_to(jnp.max(cur), (B,))
        x, k2, v2 = pallas_step.decode_step_fused(
            packed, emb, k, v, cur, lo, pos, cfg=cfg)
        return (k2, v2, cur + 1), jnp.sum(x)

    @jax.jit
    def run_scan(k, v, cur):
        fn = functools.partial(body, packed, emb, lo)
        (k, v, cur), xs = lax.scan(fn, (k, v, cur), None, length=STEPS)
        return jnp.sum(xs)

    variants = {
        "scalar cur (batched RMW)": jnp.int32(T0),
        "per-row cur EQUAL": jnp.full((B,), T0, jnp.int32),
        "per-row cur staggered": (T0 - 8 * (jnp.arange(B, dtype=jnp.int32)
                                            % 8)).astype(jnp.int32),
    }
    for name, cur in variants.items():  # compile
        run_scan(kq, vq, cur).block_until_ready()
    for i in range(3):
        for name, cur in variants.items():
            t0 = time.perf_counter()
            run_scan(kq, vq, cur).block_until_ready()
            dt = (time.perf_counter() - t0) / STEPS * 1e3
            print(f"run {i} B={B} kv8 {name}: {dt:.3f} ms/step")


def longform_kv8():
    """Same-process A/B of the int8 KV cache at the long-form serving
    shape (16 x 2048) and the bench shape (16 x 384).  Builds one engine
    per cache dtype from the same loaded weights (the env flag is read at
    Engine construction), so chip weather hits both sides alike."""
    import os

    from chattts_tpu.core import Chat
    from chattts_tpu.engine.batching import Engine

    chat = _load()
    texts = ["Long form serving sentence %d." % i for i in range(16)]
    engines = {}
    for kv8 in (False, True):
        os.environ["CHATTTS_KV_INT8"] = "1" if kv8 else "0"
        engines[kv8] = Engine(
            chat.config.gpt, chat._code_engine_geometry("capacity"),
            chat.gpt_params, chat.embed_params,
            spk_emb_ids=chat.tokenizer.spk_emb_ids,
            packed=chat._step_slabs())
        assert engines[kv8]._kv8 == kv8

    def run(eng, steps):
        params = Chat.InferCodeParams(
            max_new_token=steps, min_new_token=steps, manual_seed=5,
            show_tqdm=False)
        reqs = chat._code_requests(texts, params)
        for i, r in enumerate(reqs):
            r.request_id = f"lf8-{steps}-{time.monotonic_ns()}-{i}"
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        wall = time.perf_counter() - t0
        return wall, sum(o.metrics["gen_tokens"] for o in outs)

    for kv8 in (False, True):  # warmup/compile both
        run(engines[kv8], 384)
    for steps in (384, 2048, 384, 2048):
        for kv8 in (False, True):
            wall, total = run(engines[kv8], steps)
            print(f"16x{steps} kv8={int(kv8)}: wall={wall:.2f}s "
                  f"steps/s={total / wall:.0f} "
                  f"chunk-step={wall / steps * 1e3:.3f} ms")


def longform_kv4():
    """Same-process A/B of the int4 vs int8 KV cache at the long-form
    serving shape (16 x 2048) and the bench shape (16 x 384).  One engine
    per tier from the same loaded weights (the env flags are read at
    Engine construction), so chip weather hits both sides alike."""
    import os

    from chattts_tpu.core import Chat
    from chattts_tpu.engine.batching import Engine

    chat = _load()
    texts = ["Long form serving sentence %d." % i for i in range(16)]
    engines = {}
    for kv4 in (False, True):
        os.environ["CHATTTS_KV_INT4"] = "1" if kv4 else "0"
        engines[kv4] = Engine(
            chat.config.gpt, chat._code_engine_geometry("capacity"),
            chat.gpt_params, chat.embed_params,
            spk_emb_ids=chat.tokenizer.spk_emb_ids,
            packed=chat._step_slabs())
        assert engines[kv4]._kvb == (4 if kv4 else 8)
    os.environ.pop("CHATTTS_KV_INT4", None)

    def run(eng, steps):
        params = Chat.InferCodeParams(
            max_new_token=steps, min_new_token=steps, manual_seed=5,
            show_tqdm=False)
        reqs = chat._code_requests(texts, params)
        for i, r in enumerate(reqs):
            r.request_id = f"lf4-{steps}-{time.monotonic_ns()}-{i}"
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        wall = time.perf_counter() - t0
        return wall, sum(o.metrics["gen_tokens"] for o in outs)

    for kv4 in (False, True):  # warmup/compile both
        run(engines[kv4], 384)
    for steps in (384, 2048, 384, 2048):
        for kv4 in (False, True):
            wall, total = run(engines[kv4], steps)
            print(f"16x{steps} kv4={int(kv4)}: wall={wall:.2f}s "
                  f"steps/s={total / wall:.0f} "
                  f"chunk-step={wall / steps * 1e3:.3f} ms")


def kv8_kl():
    """Teacher-forced logits divergence of the int8 KV cache vs bf16 at
    full geometry (the PERF.md quantization-tier methodology: identical
    per-step inputs, code logits at T=0.7, never free-running)."""
    import jax
    import jax.numpy as jnp

    from chattts_tpu.config import Config
    from chattts_tpu.models import embed as embed_mod
    from chattts_tpu.models import llama
    from chattts_tpu.ops import pallas_step

    cfg = Config().gpt
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    eparams = embed_mod.init_params(jax.random.PRNGKey(1), cfg)
    packed = pallas_step.pack_step_params(params, cfg)
    B, T0, steps = 8, 64, 64
    HD = cfg.num_attention_heads * cfg.head_dim
    T = T0 + ((steps + 31) // 32) * 32
    rng = jax.random.PRNGKey(42)
    k0 = jax.random.normal(jax.random.PRNGKey(2), (cfg.num_hidden_layers,
                                                   B, T, HD), jnp.bfloat16)
    v0 = jax.random.normal(jax.random.PRNGKey(3), (cfg.num_hidden_layers,
                                                   B, T, HD), jnp.bfloat16)
    mask = (jnp.arange(T)[None, :] < T0).astype(jnp.bfloat16)[None, :, :, None]
    k0, v0 = k0 * mask, v0 * mask  # only the prompt region is live
    caches = {
        "bf16": (k0, v0),
        "kv8": (pallas_step.kv8_quantize(k0, cfg),
                pallas_step.kv8_quantize(v0, cfg)),
    }
    lo = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def logits_of(x_out):
        h = llama.rms_norm(x_out, params["norm"], cfg.rms_norm_eps)
        lg = embed_mod.head_code(eparams, h)  # (B, num_vq, V)
        return jax.nn.log_softmax(lg.astype(jnp.float32) / 0.7, axis=-1)

    kls, top1 = [], []
    embs = jax.random.normal(rng, (steps, B, cfg.hidden_size),
                             jnp.float32) * 0.3
    for s in range(steps):
        cur = jnp.int32(T0 + s)
        pos = jnp.full((B,), T0 + s, jnp.int32)
        outs = {}
        for name in ("bf16", "kv8"):
            x, kc, vc = pallas_step.decode_step_fused(
                packed, embs[s], caches[name][0], caches[name][1],
                cur, lo, pos, cfg=cfg)
            caches[name] = (kc, vc)
            outs[name] = logits_of(x)
        pa, pb = outs["bf16"], outs["kv8"]
        kl = jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1)
        kls.append(float(jnp.mean(kl)))
        top1.append(float(jnp.mean(
            (jnp.argmax(pa, -1) == jnp.argmax(pb, -1)))))
    print(f"kv8 teacher-forced divergence over {steps} steps "
          f"(B={B}, T0={T0}): mean KL {np.mean(kls):.4f} nats "
          f"(max {np.max(kls):.4f}), top-1 agreement {np.mean(top1):.3f}")


def kv4_kl():
    """Feasibility: teacher-forced logits divergence of a HYPOTHETICAL int4
    KV cache (per-(token,head) symmetric scales, values in [-7, 7]) vs the
    bf16 cache, before building any kernel.  The bf16 fused kernel runs on
    both caches; the kv4 cache's rows are round-tripped through
    quant4/dequant at append time (and the prompt region up front), which
    is bit-for-bit the numerics an in-kernel kv4 path would see.  Bytes:
    (HD/2 + 128) / (2*HD) = 33% of bf16 (vs kv8's 58%) -> ~+10% at the
    16x2048 long-form tier if quality holds."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from chattts_tpu.config import Config
    from chattts_tpu.models import embed as embed_mod
    from chattts_tpu.models import llama
    from chattts_tpu.ops import pallas_step

    cfg = Config().gpt
    H, Dh = cfg.num_attention_heads, cfg.head_dim

    def qdq4(rows):
        """(..., HD) f32/bf16 -> int4 per-(token,head) round trip."""
        x = rows.astype(jnp.float32)
        xh = x.reshape(x.shape[:-1] + (H, Dh))
        sc = jnp.max(jnp.abs(xh), axis=-1, keepdims=True) / 7.0
        q = jnp.clip(jnp.round(xh / jnp.maximum(sc, 1e-30)), -7, 7)
        return (q * sc).reshape(x.shape).astype(rows.dtype)

    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    eparams = embed_mod.init_params(jax.random.PRNGKey(1), cfg)
    packed = pallas_step.pack_step_params(params, cfg)
    B, T0, steps = 8, 64, 64
    HD = H * Dh
    T = T0 + ((steps + 31) // 32) * 32
    k0 = jax.random.normal(jax.random.PRNGKey(2), (cfg.num_hidden_layers,
                                                   B, T, HD), jnp.bfloat16)
    v0 = jax.random.normal(jax.random.PRNGKey(3), (cfg.num_hidden_layers,
                                                   B, T, HD), jnp.bfloat16)
    mask = (jnp.arange(T)[None, :] < T0).astype(jnp.bfloat16)[None, :, :, None]
    k0, v0 = k0 * mask, v0 * mask
    caches = {"bf16": (k0, v0), "kv4": (qdq4(k0), qdq4(v0))}
    lo = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def logits_of(x_out):
        h = llama.rms_norm(x_out, params["norm"], cfg.rms_norm_eps)
        lg = embed_mod.head_code(eparams, h)
        return jax.nn.log_softmax(lg.astype(jnp.float32) / 0.7, axis=-1)

    @jax.jit
    def requant_row(kc, vc, cur):
        row_k = lax.dynamic_slice_in_dim(kc, cur, 1, axis=2)
        row_v = lax.dynamic_slice_in_dim(vc, cur, 1, axis=2)
        kc = lax.dynamic_update_slice_in_dim(kc, qdq4(row_k), cur, axis=2)
        vc = lax.dynamic_update_slice_in_dim(vc, qdq4(row_v), cur, axis=2)
        return kc, vc

    kls, top1 = [], []
    embs = jax.random.normal(jax.random.PRNGKey(42),
                             (steps, B, cfg.hidden_size), jnp.float32) * 0.3
    for s in range(steps):
        cur = jnp.int32(T0 + s)
        pos = jnp.full((B,), T0 + s, jnp.int32)
        outs = {}
        for name in ("bf16", "kv4"):
            x, kc, vc = pallas_step.decode_step_fused(
                packed, embs[s], caches[name][0], caches[name][1],
                cur, lo, pos, cfg=cfg)
            if name == "kv4":
                kc, vc = requant_row(kc, vc, cur)
            caches[name] = (kc, vc)
            outs[name] = logits_of(x)
        pa, pb = outs["bf16"], outs["kv4"]
        kl = jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1)
        kls.append(float(jnp.mean(kl)))
        top1.append(float(jnp.mean(
            (jnp.argmax(pa, -1) == jnp.argmax(pb, -1)))))
    print(f"kv4 teacher-forced divergence over {steps} steps "
          f"(B={B}, T0={T0}): mean KL {np.mean(kls):.4f} nats "
          f"(max {np.max(kls):.4f}), top-1 agreement {np.mean(top1):.3f}")


def gen_kv8():
    """Generator-path (headline bench shape, 8x384 pipelined non-streaming)
    same-process A/B of the int8 KV cache, alone and composed with the
    int8 weight slabs.  kv_int8 is read per _run_once call (an explicit
    _build_fns cache key), so flipping the env between calls A/Bs cleanly;
    the weight-slab tier needs a fresh load per setting."""
    import os

    from chattts_tpu.core import Chat

    chat = _load(use_engine=False)
    texts = ["This is a benchmark sentence for the speech system."] * 8
    params = Chat.InferCodeParams(
        max_new_token=384, min_new_token=384, manual_seed=3, show_tqdm=False)

    def run(kv8):
        os.environ["CHATTTS_KV_INT8"] = "1" if kv8 else "0"
        t0 = time.perf_counter()
        wavs = chat._generate_wavs(texts, True, params)
        return time.perf_counter() - t0, wavs.shape

    for tier in ("bf16", "int8"):
        if tier == "int8":
            os.environ["CHATTTS_STEP_INT8"] = "1"
            chat.unload()
            chat = _load(use_engine=False)
        for kv8 in (False, True):
            run(kv8)  # warmup/compile
        best = {False: [], True: []}
        for i in range(3):
            for kv8 in (False, True):
                w, shape = run(kv8)
                best[kv8].append(w)
                audio = shape[0] * shape[1] / 24000
                print(f"w={tier} kv8={int(kv8)} run {i}: wall={w:.3f}s "
                      f"rtf={audio / w:.1f}")
        print(f"BEST w={tier}: kv8=0 {min(best[False]):.3f}s | "
              f"kv8=1 {min(best[True]):.3f}s")
    os.environ.pop("CHATTTS_STEP_INT8", None)
    os.environ.pop("CHATTTS_KV_INT8", None)


def wide_engine():
    """Saturated-throughput probe at 32 slots: can the int8 KV cache (halved
    VMEM per position -> TC 48 at a 6 MB budget instead of bf16's OOM)
    revive the fused megakernel above 16 slots?  Compares 16-slot fused
    kv8 (today's best), 32-slot fused kv8, and 32-slot XLA bf16 (today's
    wide default) on 384-step saturated offline batches."""
    import os

    from chattts_tpu.core import Chat
    from chattts_tpu.engine.batching import Engine, EngineConfig

    os.environ["CHATTTS_STEP_VMEM_MB"] = "6"
    # 32-slot fused needs every VMEM saving at once: int8-kv chunks, small
    # TC, AND int8 weight slabs (bf16's 4.7 MB ring + 6 MB chunks measured
    # scoped-OOM by 2.39 MB; WIDE=4 still scoped-OOMed by 1.5 MB)
    os.environ["CHATTTS_STEP_VMEM_MB_WIDE"] = os.environ.get(
        "WIDE_PROBE_MB", "3")
    chat = _load()
    geo16 = chat._code_engine_geometry("capacity")

    def mk(slots, kv8, fused_slots, w_int8=False):
        os.environ["CHATTTS_KV_INT8"] = "1" if kv8 else "0"
        os.environ["CHATTTS_STEP_INT8"] = "1" if w_int8 else "0"
        os.environ["CHATTTS_ENGINE_FUSED_SLOTS"] = str(fused_slots)
        import dataclasses

        geo = dataclasses.replace(geo16, max_num_seqs=slots)
        return Engine(chat.config.gpt, geo, chat.gpt_params,
                      chat.embed_params,
                      spk_emb_ids=chat.tokenizer.spk_emb_ids,
                      packed=chat._step_slabs())

    # ONE arm: the 32-slot XLA bf16 comparison arm is impossible on this
    # chip - its (S, T, H, Dh) cache layout lane-pads Dh=64 -> 128 (2.7x,
    # XLA OOM report: bf16[32,2560,12,64] = 320M/layer/side = 12.8G), so
    # 32 x 2560 only exists through the fused kv8 cache (2.9G).  The
    # reference numbers are the 16-slot fused kv8 10.7k steps/s at 16x384
    # / 7.7k at 16x2048 (PERF.md).  WIDE_PROBE_W8=0 measures the default
    # bf16 weight tier instead.
    w8 = os.environ.get("WIDE_PROBE_W8", "1") == "1"
    slots = int(os.environ.get("WIDE_PROBE_SLOTS", "32"))
    # WIDE_PROBE_KV4=1 uses the int4 cache (halved HBM again - the 64-slot
    # enabler); kv8 otherwise
    if os.environ.get("WIDE_PROBE_KV4", "0") == "1":
        os.environ["CHATTTS_KV_INT4"] = "1"
    engines = {
        f"{slots} fused kv{'4' if os.environ.get('CHATTTS_KV_INT4') else '8'}"
        f"{'+w8' if w8 else ''}": mk(slots, True, slots, w_int8=w8),
    }
    for name, eng in engines.items():
        print(name, "fused=", eng._fused, "kv8=", eng._kv8)

    def run(eng, n):
        params = Chat.InferCodeParams(
            max_new_token=384, min_new_token=384, manual_seed=5,
            show_tqdm=False)
        texts = ["Wide engine probe sentence %d." % i for i in range(n)]
        reqs = chat._code_requests(texts, params)
        for i, r in enumerate(reqs):
            r.request_id = f"we-{time.monotonic_ns()}-{i}"
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        wall = time.perf_counter() - t0
        return sum(o.metrics["gen_tokens"] for o in outs) / wall

    for name, eng in engines.items():
        run(eng, eng.ecfg.max_num_seqs)  # warmup/compile
    for i in range(3):
        for name, eng in engines.items():
            tps = run(eng, eng.ecfg.max_num_seqs)
            print(f"run {i} {name}: {tps:.0f} steps/s "
                  f"({tps * 4:.0f} speech tokens/s)")
    for v in ("CHATTTS_STEP_VMEM_MB", "CHATTTS_STEP_VMEM_MB_WIDE",
              "CHATTTS_KV_INT8", "CHATTTS_KV_INT4", "CHATTTS_STEP_INT8",
              "CHATTTS_ENGINE_FUSED_SLOTS"):
        os.environ.pop(v, None)


if __name__ == "__main__":
    probe = sys.argv[1] if len(sys.argv) > 1 else "tier_ab"
    {"tier_ab": tier_ab, "longform": longform,
     "service_ab": service_ab, "longform_kv8": longform_kv8,
     "longform_kv4": longform_kv4,
     "kv8_kl": kv8_kl, "kv4_kl": kv4_kl, "gen_kv8": gen_kv8,
     "wide_engine": wide_engine, "stream_scale": stream_scale,
     "append_ab": append_ab}[probe]()
