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
#
# CPU runs (tests, multichip dryruns) get a cache dir KEYED BY THE HOST'S
# ISA FEATURES: XLA:CPU AOT executables bake in the compile machine's
# instruction-set features, and loading an executable cached by a different
# machine can codegen differently (cpu_aot_loader warns about exactly this,
# up to SIGILL) — which showed up as one-in-N sampled-token flips in the
# engine's preemption/exactness tests when the repo's `.jax_cache/` crossed
# VMs. Same-machine runs stay warm; a new machine starts cold instead of
# loading foreign executables. TPU executables come from the remote compile
# service (machine-independent) and keep the shared dir.


def _cpu_cache_key() -> str:
    import hashlib
    import platform as _platform

    feat = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feat += _platform.processor()
    return hashlib.sha256(feat.encode()).hexdigest()[:12]


_plat = _os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip().lower()
if not _os.environ.get("CHATTTS_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "CHATTTS_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"))
    if _plat == "cpu" and not _os.environ.get("CHATTTS_COMPILE_CACHE"):
        _cache_dir = _os.path.join(_cache_dir, "cpu-" + _cpu_cache_key())
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
