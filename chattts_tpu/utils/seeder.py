"""Reproducible-RNG context (reference ``tools/seeder/ctx.py:4-15``).

The reference saves/restores the torch RNG state so the WebUI can sample a
deterministic speaker timbre per seed.  Our host RNG state lives on the
Speaker object (numpy Generator), so the context swaps that - JAX device
sampling is already key-based and needs no context.
"""

from __future__ import annotations

import numpy as np


class SpeakerSeedContext:
    """with SpeakerSeedContext(speaker, seed): ... -> deterministic timbre."""

    def __init__(self, speaker, seed: int):
        self._speaker = speaker
        self._seed = seed
        self._saved = None

    def __enter__(self):
        self._saved = self._speaker._rng
        self._speaker._rng = np.random.default_rng(self._seed)
        return self._speaker

    def __exit__(self, *exc):
        self._speaker._rng = self._saved
        return False
