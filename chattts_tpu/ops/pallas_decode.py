"""Pallas TPU kernel v2: decode attention with an HBM-resident KV cache.

Where ops/pallas_attention.py lets the Pallas runtime stage full cache rows
through VMEM, this kernel keeps the cache in HBM and manages the data
movement itself:

* **chunked manual DMA**: each program streams only the chunks that overlap
  its row's visible range [0, hi) - early decode steps read a fraction of
  the cache instead of all of it;
* **in-kernel cache append with aliasing**: the current token's k/v row is
  DMA-written into the cache at ``cur`` inside the kernel, and the cache
  buffers are input/output-aliased - the update is in place by construction.
  This sidesteps the XLA behavior where a cache write plus a read of the
  same buffer in one step materializes a full-leaf copy (see PERF.md).

Layout: the kernel works on FLAT (B, T, H*Dh) cache views - Mosaic requires
DMA slice shapes aligned to the (8, 128) tile, which the head dim H=12 is
not; flattening heads into the 128-aligned lane dim satisfies it.  Per-head
scores then come from block-diagonal selector matmuls:

    scores (Tc, H)  = K_flat (Tc, HD) @ Qm (HD, H)   Qm[i, h] = q[i] iff i in head h
    p_exp  (Tc, HD) = p (Tc, H) @ E (H, HD)           E[h, i] = 1 iff i in head h

(12x redundant FLOPs on a few-MFLOP op - negligible; bandwidth dominates.)

Returns (o, k_cache', v_cache'); numerics match the jnp reference (tests run
the kernel in interpret mode on CPU; also validated on hardware).
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
            o_ref, k_out, v_out, scratch_k, scratch_v, row_k, row_v, sems, *,
            t_chunk: int, t_total: int, heads: int, scale: float):
    """Grid (B,): one program per row; q/ks/vs blocks are (1, HD) slices."""
    del k_hbm, v_hbm  # aliased: read/write through k_out/v_out
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = hi_ref[b]
    cur = cur_ref[b]
    HD = q_ref.shape[1]
    Dh = HD // heads
    q = q_ref[...].astype(jnp.float32) * scale  # (1, HD)

    # block-diagonal selectors
    head_of = jax.lax.broadcasted_iota(jnp.int32, (HD, heads), 0) // Dh
    col = jax.lax.broadcasted_iota(jnp.int32, (HD, heads), 1)
    qm = jnp.where(head_of == col, q.reshape(HD, 1), 0.0)  # (HD, H)
    e = jnp.where(head_of == col, 1.0, 0.0)                # (HD, H)

    num_chunks = t_total // t_chunk

    def body(c, carry):
        m_prev, l_prev, acc = carry  # (1, H), (1, H), (1, HD)

        def live(carry):
            m_prev, l_prev, acc = carry
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
            k = scratch_k[...].astype(jnp.float32)  # (Tc, HD)
            v = scratch_v[...].astype(jnp.float32)
            s = jax.lax.dot_general(
                k, qm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Tc, H)
            t_ids = c * t_chunk + jax.lax.broadcasted_iota(
                jnp.int32, (t_chunk, 1), 0)
            s = jnp.where((t_ids >= lo) & (t_ids < hi), s, NEG)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp(s - m_new)  # (Tc, H)
            corr = jnp.exp(m_prev - m_new)  # (1, H)
            l_new = l_prev * corr + jnp.sum(p, axis=0, keepdims=True)
            p_exp = jax.lax.dot_general(
                p, e, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Tc, HD)
            pv = jnp.sum(p_exp * v, axis=0, keepdims=True)  # (1, HD)
            corr_exp = jax.lax.dot_general(
                corr, e, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, HD)
            return m_new, l_new, acc * corr_exp + pv

        return jax.lax.cond(c * t_chunk < hi, live, lambda cr: cr, carry)

    m0 = jnp.full((1, heads), NEG, jnp.float32)
    l0 = jnp.zeros((1, heads), jnp.float32)
    acc0 = jnp.zeros((1, HD), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    # fold in the current token (always visible)
    k_self = ks_ref[...].astype(jnp.float32)  # (1, HD)
    v_self = vs_ref[...].astype(jnp.float32)
    s_self = jax.lax.dot_general(
        q * k_self, e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (1, H)
    m_f = jnp.maximum(m, s_self)
    corr = jnp.exp(m - m_f)
    p_self = jnp.exp(s_self - m_f)
    l_f = l * corr + p_self

    def expand(x):  # (1, H) -> (1, HD)
        return jax.lax.dot_general(
            x, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    o = (acc * expand(corr) + expand(p_self) * v_self) / expand(l_f)
    o_ref[...] = o.astype(o_ref.dtype)

    # Append the current token's k/v into the cache (in place via aliasing).
    # Mosaic requires HBM<->VMEM slice sizes AND starts 8-aligned in the
    # sublane (T) dim, so a single row cannot be written directly: read the
    # aligned 8-row window containing `cur`, masked-insert the new row, and
    # write the window back.  Rows below cur round-trip unchanged (history);
    # rows above are future slots nobody reads before their own append.
    start8 = (cur // 8) * 8
    rk = pltpu.make_async_copy(
        k_out.at[b, pl.ds(start8, 8)], row_k, sems.at[0])
    rv = pltpu.make_async_copy(
        v_out.at[b, pl.ds(start8, 8)], row_v, sems.at[1])
    rk.start()
    rv.start()
    rk.wait()
    rv.wait()
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    sel = row_ids == (cur - start8)
    row_k[...] = jnp.where(sel, ks_ref[...].astype(row_k.dtype), row_k[...])
    row_v[...] = jnp.where(sel, vs_ref[...].astype(row_v.dtype), row_v[...])
    wk = pltpu.make_async_copy(row_k, k_out.at[b, pl.ds(start8, 8)], sems.at[0])
    wv = pltpu.make_async_copy(row_v, v_out.at[b, pl.ds(start8, 8)], sems.at[1])
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
    the inputs - callers must treat the inputs as consumed.  Head/feature
    dims are flattened for the kernel and reshaped back (free bitcasts).
    """
    B, T, H, Dh = k_cache.shape
    HD = H * Dh
    if T % 8:
        # the aligned 8-row append RMW reads/writes [start8, start8+8) and
        # chunk DMAs need 8-row alignment (Mosaic sublane rule); callers must
        # size the cache to a multiple of 8 (generate/batching round up)
        raise ValueError(f"cache length {T} must be a multiple of 8")
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU/testing: Pallas TPU kernels only interpret
    if T % t_chunk:
        t_chunk = min(t_chunk, T)
        while T % t_chunk:
            t_chunk //= 2
    assert t_chunk >= 8 and T % t_chunk == 0
    kernel = functools.partial(
        _kernel, t_chunk=t_chunk, t_total=T, heads=H,
        scale=1.0 / np.sqrt(Dh))
    cdt = k_cache.dtype
    o, k2, v2 = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hi
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cur
            # (B, 1, HD) arrays, (1, HD) blocks: last-two dims equal the
            # array dims, satisfying the Pallas TPU block constraint while
            # staying per-row
            pl.BlockSpec((None, 1, HD), lambda b: (b, 0, 0)),  # q
            pl.BlockSpec((None, 1, HD), lambda b: (b, 0, 0)),  # k_self
            pl.BlockSpec((None, 1, HD), lambda b: (b, 0, 0)),  # v_self
            pl.BlockSpec(memory_space=pltpu.HBM),      # k_cache
            pl.BlockSpec(memory_space=pltpu.HBM),      # v_cache
        ],
        out_specs=(
            pl.BlockSpec((None, 1, HD), lambda b: (b, 0, 0)),  # o
            pl.BlockSpec(memory_space=pltpu.HBM),      # k_cache out
            pl.BlockSpec(memory_space=pltpu.HBM),      # v_cache out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, T, HD), cdt),
            jax.ShapeDtypeStruct((B, T, HD), cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_chunk, HD), cdt),
            pltpu.VMEM((t_chunk, HD), cdt),
            pltpu.VMEM((8, HD), cdt),
            pltpu.VMEM((8, HD), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lo.astype(jnp.int32), hi.astype(jnp.int32), cur.astype(jnp.int32),
      q.reshape(B, 1, HD), k_self.astype(cdt).reshape(B, 1, HD),
      v_self.astype(cdt).reshape(B, 1, HD),
      k_cache.reshape(B, T, HD), v_cache.reshape(B, T, HD))
    return (o.reshape(B, H, Dh), k2.reshape(B, T, H, Dh),
            v2.reshape(B, T, H, Dh))
