"""Grouped-residual finite scalar quantization (GFSQ), TPU-native.

Re-derivation of the quantizer the reference pulls in from
``vector_quantize_pytorch.GroupedResidualFSQ`` (used at
``ChatTTS/model/dvae.py:69-128``): the feature dim is split into ``G`` groups;
each group runs ``R`` residual FSQ stages. One FSQ stage projects the group
features to ``len(levels)`` scalars, bounds them with tanh, rounds each scalar
to one of ``levels[k]`` uniformly spaced values, and packs the digits into a
single code index. Residual stage ``r`` operates on the remaining error at
scale ``(levels-1)**-r``.

With levels (5,5,5,5), G=2, R=2 this yields 4 codebooks x 625 codes - the four
parallel speech-token streams of ChatTTS (EOS id 625 is appended outside the
quantizer).

Everything here is pure jnp on (B, T, C) arrays; both directions (embed =
indices->features, quantize = features->indices) are jit-friendly with static
shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GFSQConfig

_BOUND_EPS = 1e-3  # FSQ tanh bound epsilon (vector_quantize_pytorch FSQ.bound)


def _levels_np(cfg: GFSQConfig) -> np.ndarray:
    return np.asarray(cfg.levels, dtype=np.int32)


def _basis_np(cfg: GFSQConfig) -> np.ndarray:
    lv = _levels_np(cfg)
    return np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)


def init_params(key: jax.Array, cfg: GFSQConfig, dtype=jnp.float32) -> dict:
    """Random init of the per-group projections (for asset-free testing)."""
    dpg = cfg.dim // cfg.groups
    cd = len(cfg.levels)
    groups = []
    for g in range(cfg.groups):
        k1, k2, key = jax.random.split(key, 3)
        groups.append(
            {
                "project_in": {
                    "w": jax.random.normal(k1, (dpg, cd), dtype) / np.sqrt(dpg),
                    "b": jnp.zeros((cd,), dtype),
                },
                "project_out": {
                    "w": jax.random.normal(k2, (cd, dpg), dtype) / np.sqrt(cd),
                    "b": jnp.zeros((dpg,), dtype),
                },
            }
        )
    return {"groups": groups}


def codebook(cfg: GFSQConfig) -> jnp.ndarray:
    """Implicit FSQ codebook: (codebook_size, len(levels)) normalized codes.

    Entry ``i`` holds ``(digits(i) - half_width) / half_width`` per level.
    """
    lv = _levels_np(cfg)
    basis = _basis_np(cfg)
    half = lv // 2
    idx = np.arange(int(np.prod(lv)))[:, None]
    digits = (idx // basis[None, :]) % lv[None, :]
    codes = (digits - half[None, :]) / half[None, :]
    return jnp.asarray(codes, dtype=jnp.float32)


def _scales(cfg: GFSQConfig) -> np.ndarray:
    """Residual-stage scales: (R, len(levels)); stage r uses (levels-1)**-r."""
    lv = _levels_np(cfg).astype(np.float64)
    return np.stack(
        [(lv - 1.0) ** (-float(r)) for r in range(cfg.residuals)]
    ).astype(np.float32)


def embed(params: dict, indices: jnp.ndarray, cfg: GFSQConfig) -> jnp.ndarray:
    """Code indices -> features.

    indices: (B, T, G*R) int32 laid out [g0r0, g0r1, ..., g1r0, ...] as in the
    reference's ``GFSQ._embed`` (dvae.py:92-102).
    Returns (B, T, dim) float32.
    """
    cb = codebook(cfg)  # (S, cd)
    scales = jnp.asarray(_scales(cfg))  # (R, cd)
    outs = []
    for g in range(cfg.groups):
        gp = params["groups"][g]
        acc = None
        for r in range(cfg.residuals):
            ind = indices[..., g * cfg.residuals + r]  # (B, T)
            codes = cb[ind] * scales[r]  # (B, T, cd)
            acc = codes if acc is None else acc + codes
        out = acc @ gp["project_out"]["w"] + gp["project_out"]["b"]
        outs.append(out)
    return jnp.concatenate(outs, axis=-1)


def _fsq_quantize(z: jnp.ndarray, cfg: GFSQConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One FSQ stage: bounded round. z: (..., cd) -> (codes_norm, index)."""
    lv = jnp.asarray(_levels_np(cfg), dtype=jnp.float32)
    half_l = (lv - 1.0) * (1.0 + _BOUND_EPS) / 2.0
    offset = jnp.where(jnp.asarray(_levels_np(cfg)) % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    bounded = jnp.tanh(z + shift) * half_l - offset
    half_width = jnp.asarray(_levels_np(cfg) // 2, dtype=jnp.float32)
    quantized = jnp.round(bounded) / half_width  # normalized in [-1, 1]
    digits = quantized * half_width + half_width
    basis = jnp.asarray(_basis_np(cfg), dtype=jnp.float32)
    index = jnp.sum(digits * basis, axis=-1).astype(jnp.int32)
    return quantized, index


def quantize(params: dict, x: jnp.ndarray, cfg: GFSQConfig) -> jnp.ndarray:
    """Features -> code indices (the DVAE encode / voice-clone path).

    x: (B, T, dim) float32. Returns (B, T, G*R) int32 with the same codebook
    layout as :func:`embed`.
    """
    dpg = cfg.dim // cfg.groups
    scales = _scales(cfg)
    inds = []
    for g in range(cfg.groups):
        gp = params["groups"][g]
        xg = x[..., g * dpg : (g + 1) * dpg]
        residual = xg @ gp["project_in"]["w"] + gp["project_in"]["b"]
        residual = residual.astype(jnp.float32)
        for r in range(cfg.residuals):
            scale = jnp.asarray(scales[r])
            codes_norm, index = _fsq_quantize(residual / scale, cfg)
            residual = residual - codes_norm * scale
            inds.append(index)
    # currently [g0r0, g0r1, g1r0, g1r1] in append order already
    return jnp.stack(inds, axis=-1)


def torch_key_map(prefix: str, cfg: GFSQConfig) -> dict:
    """Map our param tree paths -> reference state-dict keys.

    Reference keys look like
    ``vq_layer.quantizer.rvqs.{g}.project_in.weight`` (torch Linear stores
    (out, in); our convention is (in, out), so the loader transposes entries
    flagged 'T').
    """
    m = {}
    for g in range(cfg.groups):
        m[f"groups/{g}/project_in/w"] = (f"{prefix}rvqs.{g}.project_in.weight", "T")
        m[f"groups/{g}/project_in/b"] = (f"{prefix}rvqs.{g}.project_in.bias", "")
        m[f"groups/{g}/project_out/w"] = (f"{prefix}rvqs.{g}.project_out.weight", "T")
        m[f"groups/{g}/project_out/b"] = (f"{prefix}rvqs.{g}.project_out.bias", "")
    return m
