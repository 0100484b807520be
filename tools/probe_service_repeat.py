"""Probe: does the BENCH_r04 service-path collapse reproduce, and where?

BENCH_r04 witnessed service run 0 clean (wall 0.65 s, TTFA p50 288 ms) then
runs 1-2 collapsed (wall ~5 s, TTFA p50 ~= wall) on the same warm process.
This probe repeats the bench's 4-stream service section N times on ONE warm
service, interleaving a generator-path streaming run (chip-weather control)
after each, then runs a fresh-TTSService arm (service-state isolation).
After each service run it snapshots Engine.latency_stats() so a collapse
decomposes into submit->admit vs admit->first-emission vs downstream
(window vocode + pacer in the client threads).

Run alone on the TPU (one process per chip).
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: F401


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from chattts_tpu.config import Config
    from chattts_tpu.core import Chat
    from chattts_tpu import serving as serving_mod
    from chattts_tpu.engine import batching as bat
    from chattts_tpu.engine import streaming as streaming_mod
    from chattts_tpu.serving import TTSService

    jax.config.update("jax_log_compiles", True)

    # --- stall instrumentation: where does a collapsed run spend time? ---
    spans = {"step": [], "get_wait": [], "mat": [], "update_dev": []}

    def wrap(cls, name, key):
        orig = getattr(cls, name)

        def timed(self, *a, **k):
            t0 = time.perf_counter()
            out = orig(self, *a, **k)
            spans[key].append(time.perf_counter() - t0)
            return out

        setattr(cls, name, timed)

    wrap(bat.Engine, "step", "step")
    wrap(serving_mod._IncQueue, "get", "get_wait")
    wrap(streaming_mod.EmissionPacer, "_mat", "mat")
    wrap(streaming_mod.DeviceStreamingDecoder, "update_dev", "update_dev")

    def span_report():
        out = []
        for k, v in spans.items():
            if v:
                out.append(f"{k}: n={len(v)} max={max(v)*1e3:.0f}ms "
                           f"sum={sum(v)*1e3:.0f}ms")
            v.clear()
        return " | ".join(out)

    cfg = Config().with_runtime(wire_int16=True)
    chat = Chat(config=cfg)
    chat.load(source="random", seed=0)

    N_CLIENTS, S_STEPS = 4, 256
    sp = Chat.InferCodeParams(
        max_new_token=S_STEPS, min_new_token=S_STEPS, manual_seed=7,
        stream_batch=16, pass_first_n_batches=0, stream_speed=12000,
        show_tqdm=False)

    def run_service(svc):
        ttfas = [None] * N_CLIENTS
        firsts = [None] * N_CLIENTS  # first increment seen by the client

        def client(i):
            t0 = time.perf_counter()
            for chunk in svc.synthesize_stream(
                    "Concurrent stream client %d sentence." % i, sp):
                if chunk.size and ttfas[i] is None:
                    ttfas[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ts = [threading.Thread(target=client, args=(i,))
              for i in range(N_CLIENTS)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        tt = sorted(t for t in ttfas if t is not None)
        return wall, tt, firsts

    def gen_stream_run():
        """Single-utterance generator-path streaming (chip-weather control)."""
        t0 = time.perf_counter()
        ttfa = None
        for chunk in chat.infer("Weather control sentence.", stream=True,
                                skip_refine_text=True, params_infer_code=sp):
            if chunk.size and ttfa is None:
                ttfa = time.perf_counter() - t0
        return time.perf_counter() - t0, ttfa

    t0 = time.perf_counter()
    svc = TTSService(chat)  # auto-warms its engines on TPU
    log(f"TTSService construction (incl. engine warmup): "
        f"{time.perf_counter() - t0:.1f}s")
    try:
        log("== warmup ==")
        w, tt, _ = run_service(svc)
        log(f"warmup: wall={w:.3f}s")
        gen_stream_run()

        span_report()  # clear warmup spans
        eng = chat._engine_for_code()
        log("== warm-service arm (12 runs, interleaved weather control) ==")
        for i in range(12):
            n0_q, n0_f = len(eng._lat_queue), len(eng._lat_first)
            wall, tt, _ = run_service(svc)
            new_q = [f"{v*1e3:.0f}" for v in list(eng._lat_queue)[n0_q:]]
            new_f = [f"{v*1e3:.0f}" for v in list(eng._lat_first)[n0_f:]]
            p50 = tt[len(tt) // 2] if tt else float("nan")
            log(f"svc run {i}: wall={wall:.3f}s ttfa={['%.0f' % (t*1e3) for t in tt]}ms "
                f"p50={p50*1e3:.0f}ms agg={N_CLIENTS*S_STEPS/wall:.0f} st/s")
            log(f"   queue(ms)={new_q} first-emit(ms)={new_f}")
            log(f"   spans: {span_report()}")
            gw, gt = gen_stream_run()
            log(f"   weather: gen stream wall={gw:.3f}s ttfa={gt*1e3:.0f}ms")
            span_report()
    finally:
        svc.close()

    log("== fresh-service arm (3 runs, new TTSService each) ==")
    for i in range(3):
        svc = TTSService(chat)
        try:
            wall, tt, _ = run_service(svc)
            p50 = tt[len(tt) // 2] if tt else float("nan")
            log(f"fresh run {i}: wall={wall:.3f}s p50={p50*1e3:.0f}ms "
                f"agg={N_CLIENTS*S_STEPS/wall:.0f} st/s")
        finally:
            svc.close()
    log("done")


if __name__ == "__main__":
    main()
