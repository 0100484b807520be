"""chattts_tpu: a TPU-native text-to-speech framework.

A from-scratch JAX/XLA rebuild of the ChatTTS capability set: autoregressive
4-codebook speech-token generation with a Llama-architecture decoder, GFSQ
quantization, ConvNeXt mel decoding and a Vocos-style ISTFT vocoder - built
around jitted static-shape decode loops, fused on-device sampling, and
jax.sharding meshes instead of per-token host loops and NCCL process groups.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: TPU compiles in this environment go through a
# remote service and take minutes per graph; caching executables on disk makes
# repeat runs (benchmarks, servers restarting) start fast. Opt out with
# CHATTTS_NO_COMPILE_CACHE=1.
if not _os.environ.get("CHATTTS_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "CHATTTS_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

from .config import Config
from .core import Chat
from .engine.generate import Interrupt

__version__ = "0.1.0"

__all__ = ["Chat", "Config", "Interrupt", "__version__"]
