"""Pallas TPU kernel: single-query (decode) attention over a KV cache.

The decode step's attention is one query row against the full cache - a
bandwidth-bound streaming reduction. XLA expresses it as matmul + softmax +
matmul with the (B, H, 1, T) score tensor materialized between them; this
kernel fuses the whole thing flash-style (online max/denominator over T
chunks) so the cache is read exactly once per step, with the padding/future
mask applied inline from scalar lengths and the current token's k/v folded
in as a final self column.

Grid: one program per batch row; each program streams its row's (T, H, Dh)
K/V through VMEM in chunks, computing all heads at once (H x Dh fits VMEM
comfortably at ChatTTS scale: 12 x 64).

Masking contract: cache slot ``t`` of row ``b`` is visible iff
``lo[b] <= t < hi[b]`` - left padding below ``lo``, future/garbage slots at
and above ``hi``.  The self column is always visible.

Used behind ``RuntimeConfig.use_pallas_attention``; numerics are pinned
against the jnp path in tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(lo_ref, hi_ref, q_ref, ks_ref, vs_ref, k_ref, v_ref, o_ref, *,
            t_chunk: int, t_total: int, scale: float):
    """One batch row: q/k_self/v_self (H, Dh); k/v cache (T, H, Dh)."""
    H, Dh = q_ref.shape
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = hi_ref[b]
    q = q_ref[...].astype(jnp.float32) * scale  # (H, Dh)

    num_chunks = t_total // t_chunk

    def body(c, carry):
        m_prev, l_prev, acc = carry  # (H, 1), (H, 1), (H, Dh)
        k = k_ref[pl.ds(c * t_chunk, t_chunk), :, :].astype(jnp.float32)
        v = v_ref[pl.ds(c * t_chunk, t_chunk), :, :].astype(jnp.float32)
        kt = jnp.transpose(k, (1, 0, 2))  # (H, Tc, Dh)
        vt = jnp.transpose(v, (1, 0, 2))
        # per-head q . K^T: batch over H, contract Dh -> (H, Tc)
        s = jax.lax.dot_general(
            q[:, None, :], kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        t_ids = c * t_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, t_chunk), 1)
        s = jnp.where((t_ids >= lo) & (t_ids < hi), s, NEG)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p[:, None, :], vt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]  # (H, Dh)
        return m_new, l_new, acc * corr + pv

    m0 = jnp.full((H, 1), NEG, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    # fold in the current token (always visible)
    k_self = ks_ref[...].astype(jnp.float32)
    v_self = vs_ref[...].astype(jnp.float32)
    s_self = jnp.sum(q * k_self, axis=-1, keepdims=True)  # (H, 1)
    m_f = jnp.maximum(m, s_self)
    corr = jnp.exp(m - m_f)
    p_self = jnp.exp(s_self - m_f)
    l_f = l * corr + p_self
    acc_f = acc * corr + p_self * v_self
    o_ref[...] = acc_f / l_f


def decode_attention(
    q: jnp.ndarray,          # (B, H, Dh)
    k_self: jnp.ndarray,     # (B, H, Dh) current token's key
    v_self: jnp.ndarray,     # (B, H, Dh) current token's value
    k_cache: jnp.ndarray,    # (B, T, H, Dh)
    v_cache: jnp.ndarray,    # (B, T, H, Dh)
    lo: jnp.ndarray,         # (B,) int32 first visible cache slot
    hi: jnp.ndarray,         # (B,) int32 one-past-last visible cache slot
    *,
    t_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused decode attention; returns o (B, H, Dh) float32."""
    B, T, H, Dh = k_cache.shape
    if T % t_chunk:
        t_chunk = min(t_chunk, T)
        while T % t_chunk:
            t_chunk //= 2
    kernel = functools.partial(
        _kernel, t_chunk=t_chunk, t_total=T, scale=1.0 / np.sqrt(Dh))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hi (B,)
            pl.BlockSpec((None, H, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, H, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, T, H, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, T, H, Dh), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, Dh), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
        interpret=interpret,
    )(lo.astype(jnp.int32), hi.astype(jnp.int32), q, k_self, v_self,
      k_cache, v_cache)
