"""chattts_tpu: a TPU-native text-to-speech framework.

A from-scratch JAX/XLA rebuild of the ChatTTS capability set: autoregressive
4-codebook speech-token generation with a Llama-architecture decoder, GFSQ
quantization, ConvNeXt mel decoding and a Vocos-style ISTFT vocoder - built
around jitted static-shape decode loops, fused on-device sampling, and
jax.sharding meshes instead of per-token host loops and NCCL process groups.
"""

from .config import Config
from .core import Chat
from .engine.generate import Interrupt

__version__ = "0.1.0"

__all__ = ["Chat", "Config", "Interrupt", "__version__"]
