"""Pallas TPU kernel v2: decode attention with an HBM-resident KV cache.

Where ops/pallas_attention.py lets the Pallas runtime stage full (T, H, Dh)
cache rows through VMEM, this kernel keeps the cache in HBM and manages the
data movement itself:

* **chunked manual DMA**: each program streams only the chunks that overlap
  its row's visible range [0, hi) - early decode steps read a fraction of
  the cache instead of all of it;
* **in-kernel cache append with aliasing**: the current token's k/v row is
  DMA-written into the cache at ``cur`` inside the kernel, and the cache
  buffers are input/output-aliased - the update is in place by construction.
  This sidesteps the XLA behavior where a cache write plus a read of the
  same buffer in one step materializes a full-leaf copy (see PERF.md).

Returns (o, k_cache', v_cache'); numerics match the jnp reference (tests run
the kernel in interpret mode on CPU).

STATUS: correct in interpret mode; on real TPU Mosaic currently rejects the
(1, Tc, 12, 64) DMA slices ("slice shape along dimension 2 must be aligned
to tiling (8)") - H=12 heads are not sublane-aligned.  The fix is a flat
(B, T, H*Dh) cache layout (aligned (8,128) tiles) with the per-head score
computed as a block-diagonal matmul; tracked for round 2 (see CLAUDE.md).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(lo_ref, hi_ref, cur_ref, q_ref, ks_ref, vs_ref, k_hbm, v_hbm,
            o_ref, k_out, v_out, scratch_k, scratch_v, sems, *,
            t_chunk: int, t_total: int, scale: float):
    """Grid (B,): one program per batch row.

    q/ks/vs blocks are (1, H, Dh) VMEM; k_hbm/v_hbm (and the aliased
    k_out/v_out) are the full (B, T, H, Dh) arrays in ANY/HBM space.
    """
    del k_hbm, v_hbm  # aliased: read through k_out/v_out
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = hi_ref[b]
    cur = cur_ref[b]
    q = q_ref[0].astype(jnp.float32) * scale  # (H, Dh)
    H, Dh = q.shape

    num_chunks = t_total // t_chunk

    def body(c, carry):
        m_prev, l_prev, acc = carry

        def live(carry):
            m_prev, l_prev, acc = carry
            # DMA this chunk of k and v into VMEM scratch
            ck = pltpu.make_async_copy(
                k_out.at[b, pl.ds(c * t_chunk, t_chunk)], scratch_k,
                sems.at[0])
            cv = pltpu.make_async_copy(
                v_out.at[b, pl.ds(c * t_chunk, t_chunk)], scratch_v,
                sems.at[1])
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()
            k = scratch_k[...].astype(jnp.float32)  # (Tc, H, Dh)
            v = scratch_v[...].astype(jnp.float32)
            kt = jnp.transpose(k, (1, 0, 2))
            vt = jnp.transpose(v, (1, 0, 2))
            s = jax.lax.dot_general(
                q[:, None, :], kt, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # (H, Tc)
            t_ids = c * t_chunk + jax.lax.broadcasted_iota(
                jnp.int32, (1, t_chunk), 1)
            s = jnp.where((t_ids >= lo) & (t_ids < hi), s, NEG)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p[:, None, :], vt, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
            return m_new, l_new, acc * corr + pv

        # skip chunks entirely outside the visible range
        return jax.lax.cond(c * t_chunk < hi, live, lambda cr: cr, carry)

    m0 = jnp.full((H, 1), NEG, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, Dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    # fold in the current token (always visible)
    k_self = ks_ref[0].astype(jnp.float32)
    v_self = vs_ref[0].astype(jnp.float32)
    s_self = jnp.sum(q * k_self, axis=-1, keepdims=True)
    m_f = jnp.maximum(m, s_self)
    corr = jnp.exp(m - m_f)
    p_self = jnp.exp(s_self - m_f)
    l_f = l * corr + p_self
    o_ref[0] = ((acc * corr + p_self * v_self) / l_f).astype(o_ref.dtype)

    # append the current token's k/v into the cache (in place via aliasing)
    wk = pltpu.make_async_copy(ks_ref, k_out.at[b, pl.ds(cur, 1)], sems.at[0])
    wv = pltpu.make_async_copy(vs_ref, v_out.at[b, pl.ds(cur, 1)], sems.at[1])
    wk.start()
    wv.start()
    wk.wait()
    wv.wait()


def decode_attention_hbm(
    q: jnp.ndarray,        # (B, H, Dh) f32/bf16
    k_self: jnp.ndarray,   # (B, H, Dh) same dtype as cache
    v_self: jnp.ndarray,   # (B, H, Dh)
    k_cache: jnp.ndarray,  # (B, T, H, Dh)
    v_cache: jnp.ndarray,  # (B, T, H, Dh)
    lo: jnp.ndarray,       # (B,) first visible cache slot
    hi: jnp.ndarray,       # (B,) one-past-last visible slot (== cur)
    cur: jnp.ndarray,      # (B,) append position for the current token
    *,
    t_chunk: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused decode attention + in-place cache append.

    Returns (o (B, H, Dh) f32, k_cache', v_cache').  The cache outputs alias
    the inputs - callers must treat the inputs as consumed.
    """
    B, T, H, Dh = k_cache.shape
    if T % t_chunk:
        t_chunk = min(t_chunk, T)
        while T % t_chunk:
            t_chunk //= 2
    kernel = functools.partial(
        _kernel, t_chunk=t_chunk, t_total=T, scale=1.0 / np.sqrt(Dh))
    cdt = k_cache.dtype
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hi
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cur
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0)),   # q
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0)),   # k_self
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0)),   # v_self
            pl.BlockSpec(memory_space=pltpu.ANY),            # k_cache (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),            # v_cache (HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0)),   # o
            pl.BlockSpec(memory_space=pltpu.ANY),            # k_cache out
            pl.BlockSpec(memory_space=pltpu.ANY),            # v_cache out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, T, H, Dh), cdt),
            jax.ShapeDtypeStruct((B, T, H, Dh), cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_chunk, H, Dh), cdt),
            pltpu.VMEM((t_chunk, H, Dh), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lo.astype(jnp.int32), hi.astype(jnp.int32), cur.astype(jnp.int32),
      q, k_self.astype(cdt), v_self.astype(cdt), k_cache, v_cache)
    return out
