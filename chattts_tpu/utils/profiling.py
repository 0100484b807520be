"""Tracing and serving metrics.

The reference has no profiling beyond tqdm bars (SURVEY.md section 5); its
engine logs throughput every 5 s (velocity/llm_engine.py:667-740).  Here:

* :func:`trace` wraps ``jax.profiler`` so any region can be captured to a
  TensorBoard-compatible trace directory (device + host timelines);
* :class:`Metrics` provides the serving counters the baseline asks for -
  speech token-steps/s, RTF, and time-to-first-audio percentiles.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

SAMPLES_PER_STEP = 512  # 1 code step -> 512 samples @ 24 kHz
SAMPLE_RATE = 24000


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/chattts_trace"):
    """jax.profiler trace context: ``with trace("/tmp/t"): chat.infer(...)``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _percentile(sorted_vals: List[float], q: float) -> float:
    if not sorted_vals:
        return float("nan")
    idx = min(int(q * (len(sorted_vals) - 1) + 0.5), len(sorted_vals) - 1)
    return sorted_vals[idx]


@dataclass
class Metrics:
    """Rolling serving metrics (tokens/s, RTF, TTFA)."""

    started: float = field(default_factory=time.monotonic)
    steps: int = 0
    sequences: int = 0
    audio_samples: int = 0
    busy_seconds: float = 0.0
    ttfa_seconds: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def timed(self):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.busy_seconds += time.monotonic() - t0

    def record_steps(self, n_steps: int, batch: int = 1):
        self.steps += n_steps * batch
        self.audio_samples += n_steps * batch * SAMPLES_PER_STEP

    def record_ttfa(self, seconds: float):
        self.ttfa_seconds.append(seconds)

    def record_sequences(self, n: int):
        self.sequences += n

    def snapshot(self) -> Dict[str, float]:
        wall = max(time.monotonic() - self.started, 1e-9)
        busy = max(self.busy_seconds, 1e-9)
        ttfa = sorted(self.ttfa_seconds)
        return {
            "steps_per_sec": self.steps / busy,
            "speech_tokens_per_sec": self.steps * 4 / busy,
            "rtf": (self.audio_samples / SAMPLE_RATE) / busy,
            "sequences": float(self.sequences),
            "wall_seconds": wall,
            "busy_seconds": busy,
            "ttfa_p50": _percentile(ttfa, 0.50),
            "ttfa_p90": _percentile(ttfa, 0.90),
        }
