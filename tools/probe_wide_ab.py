"""Alternating same-process A/B: 32-slot wide tier vs 16-slot capacity.

Round 4 measured wide at 11.6k steps/s vs 10.7k capacity; the round-5
bench preview showed them within noise of each other (10.7k vs 11.1k) on a
different chip-weather window.  Alternating rounds in ONE process is the
only trustworthy comparison on this chip (PERF.md chip-weather warnings).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from chattts_tpu.config import Config
    from chattts_tpu.core import Chat

    cfg = Config().with_runtime(wire_int16=True)
    chat = Chat(config=cfg)
    chat.load(source="random", seed=0)

    STEPS = 384
    params = Chat.InferCodeParams(
        max_new_token=STEPS, min_new_token=STEPS, manual_seed=5,
        show_tqdm=False)

    def run(eng, n):
        texts = ["A/B saturated sentence %d." % i for i in range(n)]
        reqs = chat._code_requests(texts, params)
        for i, r in enumerate(reqs):
            r.request_id = f"ab-{time.monotonic_ns()}-{i}"
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        wall = time.perf_counter() - t0
        total = sum(o.metrics["gen_tokens"] for o in outs)
        return total / wall

    cap = chat._engine_for_code("capacity")
    wide = chat._engine_for_code("wide")
    assert wide.ecfg.max_num_seqs == 32 and wide._fused
    log("warmup (compiles)...")
    run(cap, 16)
    run(wide, 32)
    caps, wides = [], []
    for r in range(5):
        c = run(cap, 16)
        w = run(wide, 32)
        caps.append(c)
        wides.append(w)
        log(f"round {r}: capacity16 {c:.0f} steps/s | wide32 {w:.0f} steps/s"
            f" | ratio {w / c:.3f}")
    caps.sort()
    wides.sort()
    log(f"medians: capacity {caps[2]:.0f}, wide {wides[2]:.0f}, "
        f"ratio {wides[2] / caps[2]:.3f}")


if __name__ == "__main__":
    main()
