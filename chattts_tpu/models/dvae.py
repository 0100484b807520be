"""DVAE: speech-token <-> mel-spectrogram model, TPU-native.

Functional JAX rebuild of the reference DVAE (``ChatTTS/model/dvae.py:209-303``),
covering all three roles it plays:

* **decode from code indices** - GFSQ embed -> 2-group channel-to-time
  interleave -> ConvNeXt stack -> mel (the ``use_decoder=False`` audio path);
* **decode from transformer hidden states** - same stack minus the VQ (the
  default high-quality "Decoder" instance, ``ChatTTS/config/config.py:14-21``);
* **encode audio to code indices** - log-mel -> strided downsample -> ConvNeXt
  encoder -> GFSQ quantize (zero-shot voice clone, ``dvae.py:265-274``).

All activations are channels-last (B, T, C); the public helpers below accept
and return that layout. The per-mel-bin ``coef`` vector and its b14 string
form (``dvae.py:220-226,245-248``) are preserved for wire compatibility.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import codecs
from ..config import DVAEConfig, DecoderConfig, MelConfig, ConvStackConfig, GFSQConfig
from ..ops.stft import log_mel_spectrogram
from . import convnext, gfsq


def interleave_groups(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) -> (B, 2T, C//2): timestep t expands to [first-half(t),
    second-half(t)] - the reference's view/permute/flatten at dvae.py:281-287
    re-expressed channels-last."""
    B, T, C = x.shape
    a = x[..., : C // 2]
    b = x[..., C // 2 :]
    return jnp.stack([a, b], axis=2).reshape(B, 2 * T, C // 2)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_decoder_params(key: jax.Array, cfg: DecoderConfig,
                        coef: Optional[np.ndarray] = None) -> dict:
    """The no-VQ hidden->mel "Decoder" instance."""
    k1, k2, k3 = jax.random.split(key, 3)
    if coef is None:
        coef = jax.random.uniform(k3, (cfg.n_mels,), jnp.float32)
    return {
        "coef": jnp.asarray(coef, jnp.float32),
        "decoder": convnext.init_stack(k1, cfg.stack),
        "out_conv": {
            "w": jax.random.normal(k2, (3, cfg.stack.odim, cfg.n_mels))
            / np.sqrt(3 * cfg.stack.odim)
        },
    }


def init_dvae_params(key: jax.Array, cfg: DVAEConfig,
                     coef: Optional[np.ndarray] = None) -> dict:
    """Full DVAE: encoder + GFSQ + decoder."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    if coef is None:
        coef = jax.random.uniform(k6, (cfg.n_mels,), jnp.float32)
    dim = cfg.decoder.idim
    return {
        "coef": jnp.asarray(coef, jnp.float32),
        "downsample": {
            "conv0": {
                "w": jax.random.normal(k1, (3, cfg.n_mels, dim))
                / np.sqrt(3 * cfg.n_mels),
                "b": jnp.zeros((dim,)),
            },
            "conv1": {
                "w": jax.random.normal(k2, (4, dim, dim)) / np.sqrt(4 * dim),
                "b": jnp.zeros((dim,)),
            },
        },
        "encoder": convnext.init_stack(k3, cfg.encoder),
        "decoder": convnext.init_stack(k4, cfg.decoder),
        "out_conv": {
            "w": jax.random.normal(k5, (3, cfg.decoder.odim, cfg.n_mels))
            / np.sqrt(3 * cfg.decoder.odim)
        },
        "vq": gfsq.init_params(k6, cfg.vq),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _decode_stack(params: dict, feats: jnp.ndarray, stack_cfg: ConvStackConfig
                  ) -> jnp.ndarray:
    """Shared tail: interleave -> ConvNeXt -> out_conv -> x coef."""
    y = interleave_groups(feats)  # (B, 2T, idim)
    y = convnext.apply_stack(params["decoder"], y, stack_cfg)
    mel = convnext.conv1d(y, params["out_conv"]["w"], None, padding=1)
    return mel * params["coef"][None, None, :]


def decode_from_indices(params: dict, indices: jnp.ndarray, cfg: DVAEConfig
                        ) -> jnp.ndarray:
    """Code indices (B, T, num_vq) int32 -> mel (B, 2T, n_mels)."""
    feats = gfsq.embed(params["vq"], indices, cfg.vq)  # (B, T, 1024)
    return _decode_stack(params, feats, cfg.decoder)


def decode_from_hidden(params: dict, hidden: jnp.ndarray, cfg: DecoderConfig
                       ) -> jnp.ndarray:
    """Transformer hiddens (B, T, 768) -> mel (B, 2T, n_mels)."""
    return _decode_stack(params, hidden, cfg.stack)


def encode_audio(params: dict, audio: jnp.ndarray, cfg: DVAEConfig,
                 mel_cfg: MelConfig) -> jnp.ndarray:
    """Waveform (B, N) -> code indices (B, T, num_vq) int32 (voice clone)."""
    mel = log_mel_spectrogram(audio, mel_cfg)  # (B, n_mels, F)
    x = mel.transpose(0, 2, 1) / params["coef"][None, None, :]
    x = convnext.gelu(
        convnext.conv1d(x, params["downsample"]["conv0"]["w"],
                        params["downsample"]["conv0"]["b"], padding=1)
    )
    x = convnext.gelu(
        convnext.conv1d(x, params["downsample"]["conv1"]["w"],
                        params["downsample"]["conv1"]["b"], stride=2, padding=1)
    )
    x = convnext.apply_stack(params["encoder"], x, cfg.encoder)
    return gfsq.quantize(params["vq"], x, cfg.vq)


def decoder_stream_offset(cfg: DecoderConfig) -> int:
    """Mel-stream offset of decode_from_hidden_stream (stack + out_conv)."""
    return convnext.stack_stream_offset(cfg.stack) + 1


def decoder_stream_init(batch: int, cfg: DecoderConfig) -> dict:
    return {
        "stack": convnext.stack_stream_init(batch, cfg.stack),
        "out": convnext.conv_stream_init(batch, 3, 1, cfg.stack.odim),
    }


def decode_from_hidden_stream(params: dict, hidden: jnp.ndarray, state: dict,
                              cfg: DecoderConfig, t0=None
                              ) -> tuple[jnp.ndarray, dict, int]:
    """Streaming hidden->mel: (B, Fh, 768) new positions -> (B, 2*Fh,
    n_mels) mel stream frames + state + downstream cum offset.

    ``t0`` is the MEL-frame stream index of this chunk's first frame
    (2x the hidden position); the interleave is frame-local so it adds no
    state or offset."""
    y = interleave_groups(hidden)  # (B, 2*Fh, idim)
    y, stack_state, cum = convnext.apply_stack_stream(
        params["decoder"], y, state["stack"], cfg.stack, t0=t0)
    mel, out_c = convnext.conv1d_stream(
        y, state["out"], params["out_conv"]["w"], None, t0=t0, cum_off=cum)
    cum += 1
    mel = mel * params["coef"][None, None, :]
    return mel, {"stack": stack_state, "out": out_c}, cum


def coef_string(params: dict) -> str:
    """Portable b14 representation of the mel coefficients (dvae.py:245-248)."""
    return codecs.encode_coef(np.asarray(params["coef"], dtype=np.float32))


# ---------------------------------------------------------------------------
# Checkpoint key maps (reference safetensors -> our pytree)
# ---------------------------------------------------------------------------


def decoder_torch_key_map(cfg: DecoderConfig) -> dict:
    m = convnext.stack_torch_key_map("decoder", "decoder.", cfg.stack)
    m["coef"] = ("coef", "SQUEEZE")  # stored (1, 100, 1)
    m["out_conv/w"] = ("out_conv.weight", "C")
    return m


def dvae_torch_key_map(cfg: DVAEConfig) -> dict:
    m = convnext.stack_torch_key_map("decoder", "decoder.", cfg.decoder)
    m.update(convnext.stack_torch_key_map("encoder", "encoder.", cfg.encoder))
    m["coef"] = ("coef", "SQUEEZE")
    m["out_conv/w"] = ("out_conv.weight", "C")
    m["downsample/conv0/w"] = ("downsample_conv.0.weight", "C")
    m["downsample/conv0/b"] = ("downsample_conv.0.bias", "")
    m["downsample/conv1/w"] = ("downsample_conv.2.weight", "C")
    m["downsample/conv1/b"] = ("downsample_conv.2.bias", "")
    m.update(
        {
            f"vq/{k}": v
            for k, v in gfsq.torch_key_map("vq_layer.quantizer.", cfg.vq).items()
        }
    )
    return m
