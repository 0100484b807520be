"""Vocos vocoder (ConvNeXt backbone + ISTFT head), TPU-native.

Rebuild of the external ``vocos`` package pieces the reference instantiates
from config at ``ChatTTS/core.py:298-318`` (``VocosBackbone`` with
input 100 / dim 512 / intermediate 1536 / 8 layers and an ``ISTFTHead`` with
n_fft 1024 / hop 256): mel -> ConvNeXt features -> (magnitude, phase) ->
complex STFT -> inverse STFT -> 24 kHz waveform.  The whole chain is one
jittable function; the ISTFT is XLA (see ops/stft.py) so mel->waveform never
leaves the device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import VocosConfig
from ..ops.stft import istft
from . import convnext


def init_params(key: jax.Array, cfg: VocosConfig) -> dict:
    k1, k2, kb = jax.random.split(key, 3)
    blocks = [
        convnext.init_block(
            k, cfg.dim, cfg.intermediate_dim, kernel=7,
            layer_scale=1.0 / cfg.num_layers,
        )
        for k in jax.random.split(kb, cfg.num_layers)
    ]
    out_dim = cfg.n_fft + 2
    return {
        "embed": {
            "w": jax.random.normal(k1, (7, cfg.input_channels, cfg.dim))
            / np.sqrt(7 * cfg.input_channels),
            "b": jnp.zeros((cfg.dim,)),
        },
        "norm": {"scale": jnp.ones((cfg.dim,)), "bias": jnp.zeros((cfg.dim,))},
        "blocks": blocks,
        "final_norm": {
            "scale": jnp.ones((cfg.dim,)),
            "bias": jnp.zeros((cfg.dim,)),
        },
        "head": {
            "w": jax.random.normal(k2, (cfg.dim, out_dim)) / np.sqrt(cfg.dim),
            "b": jnp.zeros((out_dim,)),
        },
    }


def decode(params: dict, mel: jnp.ndarray, cfg: VocosConfig) -> jnp.ndarray:
    """mel (B, T, n_mels) channels-last -> waveform (B, (T-1)*hop)."""
    x = convnext.conv1d(mel, params["embed"]["w"], params["embed"]["b"], padding=3)
    x = convnext.layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    for bp in params["blocks"]:
        x = convnext.apply_block(bp, x, kernel=7, dilation=1)
    x = convnext.layer_norm(
        x, params["final_norm"]["scale"], params["final_norm"]["bias"]
    )
    h = x @ params["head"]["w"] + params["head"]["b"]  # (B, T, n_fft + 2)
    nf = cfg.n_fft // 2 + 1
    mag = jnp.clip(jnp.exp(h[..., :nf]), max=1e2)
    phase = h[..., nf:]
    spec = (mag * jnp.exp(1j * phase.astype(jnp.float32))).transpose(0, 2, 1)
    return istft(spec, cfg.n_fft, cfg.hop_length)


def stream_offset(cfg: VocosConfig) -> int:
    """Backbone stream offset in mel frames (embed k7 + ConvNeXt k7 blocks)."""
    return 3 + cfg.num_layers * 3


def stream_init(batch: int, cfg: VocosConfig) -> dict:
    return {
        "embed": convnext.conv_stream_init(batch, 7, 1, cfg.input_channels),
        "blocks": [
            convnext.conv_stream_init(batch, 7, 1, cfg.dim)
            for _ in range(cfg.num_layers)
        ],
    }


def features_stream(params: dict, mel: jnp.ndarray, state: dict,
                    cfg: VocosConfig, t0=None, cum_off: int = 0
                    ) -> tuple[jnp.ndarray, dict]:
    """Streaming backbone+head: mel (B, F, n_mels) -> complex spec
    (B, F, n_fft//2+1) stream frames (offset ``stream_offset`` + cum_off).

    The ISTFT is NOT applied here - feed the spec stream to
    ops.stft.istft_stream (delayed past the conv offset so it sees the
    full decode's frame sequence exactly)."""
    x, c_embed = convnext.conv1d_stream(
        mel, state["embed"], params["embed"]["w"], params["embed"]["b"],
        t0=t0, cum_off=cum_off)
    cum_off += 3
    x = convnext.layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    new_blocks = []
    for bp, bc in zip(params["blocks"], state["blocks"]):
        x, nc = convnext.apply_block_stream(bp, x, bc, kernel=7, dilation=1,
                                            t0=t0, cum_off=cum_off)
        new_blocks.append(nc)
        cum_off += 3
    x = convnext.layer_norm(
        x, params["final_norm"]["scale"], params["final_norm"]["bias"]
    )
    h = x @ params["head"]["w"] + params["head"]["b"]
    nf = cfg.n_fft // 2 + 1
    mag = jnp.clip(jnp.exp(h[..., :nf]), max=1e2)
    phase = h[..., nf:]
    spec = mag * jnp.exp(1j * phase.astype(jnp.float32))
    return spec, {"embed": c_embed, "blocks": new_blocks}


def torch_key_map(cfg: VocosConfig) -> dict:
    """Our pytree paths -> vocos-package state-dict keys."""
    m = {
        "embed/w": ("backbone.embed.weight", "C"),
        "embed/b": ("backbone.embed.bias", ""),
        "norm/scale": ("backbone.norm.weight", ""),
        "norm/bias": ("backbone.norm.bias", ""),
        "final_norm/scale": ("backbone.final_layer_norm.weight", ""),
        "final_norm/bias": ("backbone.final_layer_norm.bias", ""),
        "head/w": ("head.out.weight", "T"),
        "head/b": ("head.out.bias", ""),
    }
    for i in range(cfg.num_layers):
        bp = f"backbone.convnext.{i}."
        m.update(
            {
                f"blocks/{i}/dwconv/w": (f"{bp}dwconv.weight", "D"),
                f"blocks/{i}/dwconv/b": (f"{bp}dwconv.bias", ""),
                f"blocks/{i}/norm/scale": (f"{bp}norm.weight", ""),
                f"blocks/{i}/norm/bias": (f"{bp}norm.bias", ""),
                f"blocks/{i}/pw1/w": (f"{bp}pwconv1.weight", "T"),
                f"blocks/{i}/pw1/b": (f"{bp}pwconv1.bias", ""),
                f"blocks/{i}/pw2/w": (f"{bp}pwconv2.weight", "T"),
                f"blocks/{i}/pw2/b": (f"{bp}pwconv2.bias", ""),
                f"blocks/{i}/gamma": (f"{bp}gamma", ""),
            }
        )
    return m
