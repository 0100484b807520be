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
# CPU IDENTITY: XLA:CPU AOT executables bake in the compile machine's
# target features, and loading an executable cached by a different
# machine can codegen differently (cpu_aot_loader warns about exactly this,
# up to SIGILL) — which showed up as one-in-N sampled-token flips in the
# engine's preemption/exactness tests when the repo's `.jax_cache/` crossed
# VMs. The key hashes the ISA flags AND the family/model/stepping lines AND
# the jaxlib version: LLVM derives tuning features (+prefer-no-gather,
# +prefer-no-scatter) from the CPU *model*, not from cpuinfo flags, so two
# VMs with identical flag strings can still bake incompatible executables
# (observed: foreign-feature AOT loads inside a flags-keyed dir flipping
# near-tie sampled tokens via a different FP reduction order). Same-machine
# runs stay warm; a new machine starts cold instead of loading foreign
# executables. TPU executables come from the remote compile service
# (machine-independent) and keep the shared dir.


def _cpu_cache_key(cpuinfo_text=None) -> str:
    import hashlib
    import platform as _platform

    feat = [_platform.machine()]
    try:
        import jaxlib

        feat.append(getattr(jaxlib, "__version__", ""))
    except Exception:  # noqa: BLE001
        pass
    want = ("flags", "Features", "vendor_id", "cpu family", "model",
            "model name", "stepping", "CPU implementer", "CPU part")
    seen = set()
    try:
        if cpuinfo_text is None:
            with open("/proc/cpuinfo") as f:
                cpuinfo_text = f.read()
        for line in cpuinfo_text.splitlines():
            key = line.split(":", 1)[0].strip()
            if key in want and key not in seen and ":" in line:
                seen.add(key)
                val = line.split(":", 1)[1].split()
                feat.append(key + "=" + " ".join(sorted(val)))
            if seen and (len(seen) == len(want) or not line.strip()):
                break  # first processor block only
    except OSError:
        feat.append(_platform.processor())
    return hashlib.sha256("|".join(feat).encode()).hexdigest()[:12]


# Platforms whose executables come from a machine-independent compiler
# (remote compile service / accelerator toolchains) share the top-level
# cache dir.  CPU — and an UNSET platform, which defaults to CPU on hosts
# without an accelerator — gets the machine-keyed subdir: assuming shared
# on "unknown" would load foreign CPU AOT executables, the exact hazard
# above; assuming machine-keyed merely costs an accelerator host one cold
# cache fill.  (Callers that flip platforms after import via
# jax.config.update should set JAX_PLATFORMS in the environment first,
# as tests/conftest.py does, so this decision sees the real platform.)
_SHARED_CACHE_PLATFORMS = ("axon", "tpu", "cuda", "rocm", "gpu", "proxy")


def _cache_dir_for(plat: str, base: str) -> str:
    if plat in _SHARED_CACHE_PLATFORMS:
        return base
    return _os.path.join(base, "cpu-" + _cpu_cache_key())


_plat = _os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip().lower()
if not _os.environ.get("CHATTTS_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get("CHATTTS_COMPILE_CACHE")
    if _cache_dir is None:
        _cache_dir = _cache_dir_for(
            _plat, _os.path.join(
                _os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"))
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
