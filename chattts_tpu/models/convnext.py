"""1-D ConvNeXt building blocks, TPU-native.

The reference's DVAE decoder/encoder and the Vocos backbone are all stacks of
the same ConvNeXt-1d block (depthwise conv -> LayerNorm -> pointwise MLP with
GELU -> layer scale -> residual; reference ``ChatTTS/model/dvae.py:14-66`` and
the external vocos package).  We keep activations in (B, T, C) layout - the
TPU-friendly channels-last form - so the pointwise convs are plain matmuls on
the MXU and LayerNorm reduces over the contiguous last axis; only the
depthwise conv uses a grouped ``lax.conv_general_dilated``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import ConvStackConfig

_DN = ("NWC", "WIO", "NWC")  # channels-last conv dimension numbers


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """x: (B, T, Cin), w: (k, Cin//groups, Cout) -> (B, T', Cout)."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * scale + bias


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU() default: exact erf form
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# ConvNeXt block
# ---------------------------------------------------------------------------


def init_block(key: jax.Array, dim: int, intermediate: int, kernel: int,
               layer_scale: float = 1e-6, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": {
            "w": jax.random.normal(k1, (kernel, 1, dim), dtype) / np.sqrt(kernel),
            "b": jnp.zeros((dim,), dtype),
        },
        "norm": {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)},
        "pw1": {
            "w": jax.random.normal(k2, (dim, intermediate), dtype) / np.sqrt(dim),
            "b": jnp.zeros((intermediate,), dtype),
        },
        "pw2": {
            "w": jax.random.normal(k3, (intermediate, dim), dtype)
            / np.sqrt(intermediate),
            "b": jnp.zeros((dim,), dtype),
        },
        "gamma": jnp.full((dim,), layer_scale, dtype),
    }


def apply_block(p: dict, x: jnp.ndarray, *, kernel: int, dilation: int = 1
                ) -> jnp.ndarray:
    """One ConvNeXt-1d block on (B, T, C)."""
    dim = x.shape[-1]
    pad = dilation * (kernel // 2)
    y = conv1d(x, p["dwconv"]["w"], p["dwconv"]["b"], dilation=dilation,
               padding=pad, groups=dim)
    y = layer_norm(y, p["norm"]["scale"], p["norm"]["bias"])
    y = gelu(y @ p["pw1"]["w"] + p["pw1"]["b"])
    y = y @ p["pw2"]["w"] + p["pw2"]["b"]
    if p.get("gamma") is not None:
        y = y * p["gamma"]
    return x + y


# ---------------------------------------------------------------------------
# DVAE-style stack: conv_in (3x conv -> GELU -> 3x conv) -> blocks -> conv_out
# Reference: DVAEDecoder, dvae.py:131-172.
# ---------------------------------------------------------------------------


def init_stack(key: jax.Array, cfg: ConvStackConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, kb = jax.random.split(key, 4)
    blocks = [
        init_block(k, cfg.hidden, cfg.hidden * 4, cfg.kernel, dtype=dtype)
        for k in jax.random.split(kb, cfg.n_layer)
    ]
    return {
        "conv_in0": {
            "w": jax.random.normal(k1, (3, cfg.idim, cfg.bn_dim), dtype)
            / np.sqrt(3 * cfg.idim),
            "b": jnp.zeros((cfg.bn_dim,), dtype),
        },
        "conv_in1": {
            "w": jax.random.normal(k2, (3, cfg.bn_dim, cfg.hidden), dtype)
            / np.sqrt(3 * cfg.bn_dim),
            "b": jnp.zeros((cfg.hidden,), dtype),
        },
        "blocks": blocks,
        "conv_out": {
            "w": jax.random.normal(k3, (1, cfg.hidden, cfg.odim), dtype)
            / np.sqrt(cfg.hidden),
        },
    }


def apply_stack(p: dict, x: jnp.ndarray, cfg: ConvStackConfig) -> jnp.ndarray:
    """(B, T, idim) -> (B, T, odim)."""
    y = conv1d(x, p["conv_in0"]["w"], p["conv_in0"]["b"], padding=1)
    y = gelu(y)
    y = conv1d(y, p["conv_in1"]["w"], p["conv_in1"]["b"], padding=1)
    for bp in p["blocks"]:
        y = apply_block(bp, y, kernel=cfg.kernel, dilation=cfg.dilation)
    return conv1d(y, p["conv_out"]["w"], None)


# ---------------------------------------------------------------------------
# Streaming (stateful) apply: O(new frames) per call, exact steady state
#
# Every SAME-padded conv keeps a cache of its last (k-1)*dilation INPUT
# frames.  Feeding F new frames then convolving [cache | x] with VALID
# padding emits exactly F output frames at a constant stream offset of
# pad = dilation*(k//2) frames per conv (stream index j of a layer's
# output corresponds to full-decode index j - cumulative_pad).  Exactness
# at the stream head needs one extra rule: a layer's input frames whose
# FULL-decode index is negative must be zeroed before the conv - the full
# decode pads each layer's input with its OWN zeros there, whereas the
# upstream stream supplies its (nonzero) left-edge outputs.  ``t0`` (the
# stream index of the chunk's first frame) makes that mask computable;
# it is a data-dependent no-op once the stream has advanced past the
# receptive cone.  Stream ENDS are flushed by the caller with a
# right-aligned full-window decode (in-tensor zero padding is NOT inert,
# see engine/streaming.py) - there is no exact static-shape flush.
# ---------------------------------------------------------------------------


def conv_stream_init(batch: int, k: int, dilation: int, cin: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((batch, (k - 1) * dilation, cin), dtype)


def _mask_head(ext: jnp.ndarray, t0, m: int, cum_off: int) -> jnp.ndarray:
    """Zero ext frames whose full-decode index (stream - cum_off) is < 0.

    ext frame e sits at stream index t0 + e - m (m = cache length)."""
    e = jnp.arange(ext.shape[1])
    full_idx = t0 + e - m - cum_off
    return jnp.where((full_idx >= 0)[None, :, None], ext, 0.0)


def conv1d_stream(x: jnp.ndarray, cache: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None, *, dilation: int = 1,
                  groups: int = 1, t0=None, cum_off: int = 0
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Valid conv over [cache | x]; returns (F new frames, new cache)."""
    F = x.shape[1]
    ext = jnp.concatenate([cache, x], axis=1)
    if t0 is not None:
        ext = _mask_head(ext, t0, cache.shape[1], cum_off)
    y = conv1d(ext, w, b, dilation=dilation, groups=groups)
    return y, ext[:, F:]


def apply_block_stream(p: dict, x: jnp.ndarray, cache: jnp.ndarray, *,
                       kernel: int, dilation: int = 1, t0=None,
                       cum_off: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming ConvNeXt block: residual taps the input stream at the
    conv's offset so both terms align on the same full-decode index."""
    dim = x.shape[-1]
    F = x.shape[1]
    pad = dilation * (kernel // 2)
    ext = jnp.concatenate([cache, x], axis=1)  # (B, F + 2*pad, C)
    if t0 is not None:
        ext = _mask_head(ext, t0, cache.shape[1], cum_off)
    y = conv1d(ext, p["dwconv"]["w"], p["dwconv"]["b"], dilation=dilation,
               groups=dim)  # valid: (B, F, C)
    y = layer_norm(y, p["norm"]["scale"], p["norm"]["bias"])
    y = gelu(y @ p["pw1"]["w"] + p["pw1"]["b"])
    y = y @ p["pw2"]["w"] + p["pw2"]["b"]
    if p.get("gamma") is not None:
        y = y * p["gamma"]
    return ext[:, pad : pad + F] + y, ext[:, F:]


def stack_stream_offset(cfg: ConvStackConfig) -> int:
    """Cumulative stream offset (frames) of apply_stack_stream's output."""
    return 1 + 1 + cfg.n_layer * cfg.dilation * (cfg.kernel // 2)


def stack_stream_init(batch: int, cfg: ConvStackConfig, dtype=jnp.float32
                      ) -> dict:
    return {
        "in0": conv_stream_init(batch, 3, 1, cfg.idim, dtype),
        "in1": conv_stream_init(batch, 3, 1, cfg.bn_dim, dtype),
        "blocks": [
            conv_stream_init(batch, cfg.kernel, cfg.dilation, cfg.hidden,
                             dtype)
            for _ in range(cfg.n_layer)
        ],
    }


def apply_stack_stream(p: dict, x: jnp.ndarray, state: dict,
                       cfg: ConvStackConfig, t0=None, cum_off: int = 0
                       ) -> tuple[jnp.ndarray, dict, int]:
    """(B, F, idim) new frames -> (B, F, odim) stream frames + new state.

    Returns the downstream cumulative offset as the third element so
    chained stacks (decoder -> vocos) keep masking correctly."""
    bpad = cfg.dilation * (cfg.kernel // 2)
    y, c_in0 = conv1d_stream(x, state["in0"], p["conv_in0"]["w"],
                             p["conv_in0"]["b"], t0=t0, cum_off=cum_off)
    y = gelu(y)
    cum_off += 1
    y, c_in1 = conv1d_stream(y, state["in1"], p["conv_in1"]["w"],
                             p["conv_in1"]["b"], t0=t0, cum_off=cum_off)
    cum_off += 1
    new_blocks = []
    for bp, bc in zip(p["blocks"], state["blocks"]):
        y, nc = apply_block_stream(bp, y, bc, kernel=cfg.kernel,
                                   dilation=cfg.dilation, t0=t0,
                                   cum_off=cum_off)
        new_blocks.append(nc)
        cum_off += bpad
    y = conv1d(y, p["conv_out"]["w"], None)  # k=1: stateless
    return y, {"in0": c_in0, "in1": c_in1, "blocks": new_blocks}, cum_off


def stack_torch_key_map(path: str, prefix: str, cfg: ConvStackConfig) -> dict:
    """Param-tree path -> (reference state-dict key, transform) for a stack.

    Transforms: 'C' = conv weight (out,in,k)->(k,in,out); 'D' = depthwise
    (dim,1,k)->(k,1,dim); 'T' = linear transpose; '' = as-is.
    """
    m = {
        f"{path}/conv_in0/w": (f"{prefix}conv_in.0.weight", "C"),
        f"{path}/conv_in0/b": (f"{prefix}conv_in.0.bias", ""),
        f"{path}/conv_in1/w": (f"{prefix}conv_in.2.weight", "C"),
        f"{path}/conv_in1/b": (f"{prefix}conv_in.2.bias", ""),
        f"{path}/conv_out/w": (f"{prefix}conv_out.weight", "C"),
    }
    for i in range(cfg.n_layer):
        bp = f"{prefix}decoder_block.{i}."
        m.update(
            {
                f"{path}/blocks/{i}/dwconv/w": (f"{bp}dwconv.weight", "D"),
                f"{path}/blocks/{i}/dwconv/b": (f"{bp}dwconv.bias", ""),
                f"{path}/blocks/{i}/norm/scale": (f"{bp}norm.weight", ""),
                f"{path}/blocks/{i}/norm/bias": (f"{bp}norm.bias", ""),
                f"{path}/blocks/{i}/pw1/w": (f"{bp}pwconv1.weight", "T"),
                f"{path}/blocks/{i}/pw1/b": (f"{bp}pwconv1.bias", ""),
                f"{path}/blocks/{i}/pw2/w": (f"{bp}pwconv2.weight", "T"),
                f"{path}/blocks/{i}/pw2/b": (f"{bp}pwconv2.bias", ""),
                f"{path}/blocks/{i}/gamma": (f"{bp}weight", ""),
            }
        )
    return m
