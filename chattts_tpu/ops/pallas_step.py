"""Fused whole-decode-step Pallas TPU kernel.

One ``pallas_call`` per autoregressive step covers ALL transformer layers
(the work the reference does eagerly per step at ``ChatTTS/model/gpt.py:
394-618``): rmsnorm -> fused qkv -> rope -> cache append -> attention ->
out-proj -> rmsnorm -> SwiGLU MLP, for every layer, in a single dispatch.

Why a megakernel: the decode step is HBM-bandwidth-bound (weights ~19 MB +
KV ~10 MB per layer per step) and XLA's per-op execution leaves measured
~1.26 ms/step at (B=8, T=448) vs a ~0.7 ms byte-movement floor.  Here the
data movement is explicit:

* **weight slabs**: all per-layer weights are pre-packed into square
  (D, D) bf16 slabs - ``[q | k | v | wo | gate... | up... | down...]`` -
  and streamed HBM->VMEM through a 4-deep ring of async copies, so slab
  ``g+4`` loads while slab ``g`` multiplies.  Every matmul is a plain
  (B, D) @ (D, D) MXU op with f32 accumulation.
* **KV cache** stays in HBM in flat (L, B, T, HD) layout (lane-aligned;
  the (H, Dh)=(12, 64) head layout pads 2.67x on TPU tiles).  Chunks of
  ``TC`` timesteps stream through a double buffer; chunks beyond the
  visible range [0, cur] are skipped, so early steps read only the live
  prefix.  The current token's k/v are appended in place first (aligned
  8-row read-modify-write window, input/output aliasing) and attention
  reads [lo, cur] inclusive - write-then-attend, no separate self column.
* **rope** on the flat (B, HD) layout via a constant +-1 permutation
  matrix R: ``rotate_half(x) == x @ R`` per 64-wide head block, so the
  kernel never reshapes lanes.

Scores per row are (TC, HD) @ (HD, H) block-diagonal selector matmuls with
an online (flash-style) softmax across chunks - the round-1 HBM-cache
attention kernel's scheme hoisted to whole-step scope (that kernel and the
VMEM-staged variant are superseded by this one and were removed).

Enable with ``CHATTTS_PALLAS_STEP=1`` (generator scalar-``cur`` path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
WRING = 4   # weight-slab ring depth
KRING = 2   # kv chunk double buffer
KV_PAD = 128  # int8-kv row pad lanes carrying embedded per-head scales


def rope_rotate_matrix(head_dim: int, hd: int) -> np.ndarray:
    """(HD, HD) +-1 matrix with x @ R == rotate_half per head block."""
    R = np.zeros((hd, hd), np.float32)
    half = head_dim // 2
    for base in range(0, hd, head_dim):
        for d in range(half):
            # out[d] = -x[d + half];  out[d + half] = x[d]
            R[base + d + half, base + d] = -1.0
            R[base + d, base + d + half] = 1.0
    return R


def _int4_groups(D: int):
    """(group_size, n_groups) for int4 scales: 128-row contraction groups,
    shrunk when a half-slab is narrower so no group straddles the nibble
    halves (each half must split evenly into groups)."""
    gs = 128 if (D // 2) % 128 == 0 else D // 2
    if (D // 2) % gs:
        raise ValueError("geometry not int4-groupable")
    return gs, D // gs


def kv8_quantize(flat: jnp.ndarray, cfg) -> jnp.ndarray:
    """Quantize (..., T, HD) k/v rows to the int8-kv wire layout.

    Row layout (lane axis): ``[q(HD) | m(H) | e(H) | zeros]`` padded to
    ``HD + KV_PAD`` lanes (a 128-lane pad keeps the row a whole number of
    TPU tiles).  Each head's scale is stored as a (mantissa, exponent)
    int8 pair with ``scale = m * 2^e`` and m in [64, 127] (7-bit mantissa,
    <= 0.8% scale error); ``m`` is rounded UP so the quantized values never
    clip past +-127.  All-zero heads store m = 0 (scale 0).

    The decode kernel appends new rows with the same scheme, so a cache
    quantized here (the prefill -> decode boundary) and rows appended
    in-kernel dequantize identically.  Net row bytes vs bf16:
    (HD + 128) / (2 * HD) ~ 58% at HD=768 - the KV stream at long context
    costs ~35% of the capacity tier's step time (PERF.md 16x2048), so the
    saved bytes buy real time.
    """
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    HD = H * Dh
    if 2 * H > KV_PAD:
        raise ValueError("too many heads for the kv-int8 scale lanes")
    x = flat.astype(jnp.float32)
    lead = x.shape[:-1]
    xh = x.reshape(lead + (H, Dh))
    a = jnp.max(jnp.abs(xh), axis=-1)          # (..., H) per-head absmax
    sc = a / 127.0
    e = jnp.floor(jnp.log2(jnp.maximum(sc, 1e-30)))
    m = jnp.ceil(sc * jnp.exp2(-e) * 64.0)     # in [64, 128]
    e = jnp.where(m > 127.0, e + 1.0, e)
    m = jnp.where(m > 127.0, 64.0, m)
    m = jnp.where(a > 0.0, m, 0.0)
    es = jnp.clip(e - 6.0, -126.0, 126.0)
    sdec = m * jnp.exp2(es)                    # decoded scale >= sc
    q = jnp.clip(jnp.round(xh / jnp.maximum(sdec, 1e-30)[..., None]),
                 -127.0, 127.0).astype(jnp.int8)
    pad = jnp.zeros(lead + (KV_PAD - 2 * H,), jnp.int8)
    return jnp.concatenate(
        [q.reshape(lead + (HD,)), m.astype(jnp.int8), es.astype(jnp.int8),
         pad], axis=-1)


def kv8_dequantize(rows: jnp.ndarray, cfg) -> jnp.ndarray:
    """Inverse of :func:`kv8_quantize`: (..., T, HD + KV_PAD) int8 -> f32."""
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    HD = H * Dh
    lead = rows.shape[:-1]
    q = rows[..., :HD].astype(jnp.float32).reshape(lead + (H, Dh))
    m = rows[..., HD:HD + H].astype(jnp.float32)
    es = rows[..., HD + H:HD + 2 * H].astype(jnp.float32)
    return (q * (m * jnp.exp2(es))[..., None]).reshape(lead + (HD,))


def kv4_quantize(flat: jnp.ndarray, cfg) -> jnp.ndarray:
    """Quantize (..., T, HD) k/v rows to the int4-kv wire layout.

    Same per-(token, head) (mantissa, exponent) scale scheme as
    :func:`kv8_quantize` but values quantize to [-7, 7] and two features
    pack per byte: feature ``f`` (f < HD/2) rides byte ``f``'s LOW nibble
    and feature ``HD/2 + f`` its HIGH nibble, so unpack-and-concat
    reconstructs the original feature order.  Row layout (lane axis):
    ``[packed(HD/2) | m(H) | e(H) | zeros]`` padded to ``HD/2 + KV_PAD``
    lanes.  Net row bytes vs bf16: (HD/2 + 128) / (2 * HD) = 33% at HD=768
    (vs kv8's 58%) - the aggressive long-context tier, opt-in like the
    int4 weight slabs (teacher-forced KL ~0.01 nats, PERF.md round 4)."""
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    HD = H * Dh
    if 2 * H > KV_PAD:
        raise ValueError("too many heads for the kv-int4 scale lanes")
    if Dh % 2 or (HD // 2) % 128:
        raise ValueError("geometry not kv-int4-packable")
    x = flat.astype(jnp.float32)
    lead = x.shape[:-1]
    xh = x.reshape(lead + (H, Dh))
    a = jnp.max(jnp.abs(xh), axis=-1)          # (..., H) per-head absmax
    sc = a / 7.0
    e = jnp.floor(jnp.log2(jnp.maximum(sc, 1e-30)))
    m = jnp.ceil(sc * jnp.exp2(-e) * 64.0)     # in [64, 128]
    e = jnp.where(m > 127.0, e + 1.0, e)
    m = jnp.where(m > 127.0, 64.0, m)
    m = jnp.where(a > 0.0, m, 0.0)
    es = jnp.clip(e - 6.0, -126.0, 126.0)
    sdec = m * jnp.exp2(es)                    # decoded scale >= sc
    q = jnp.clip(jnp.round(xh / jnp.maximum(sdec, 1e-30)[..., None]),
                 -7.0, 7.0).astype(jnp.int32).reshape(lead + (HD,))
    qlo, qhi = q[..., :HD // 2], q[..., HD // 2:]
    u = (qlo & 15) | ((qhi & 15) << 4)         # [0, 255]
    packed = ((u << 24) >> 24).astype(jnp.int8)  # sign-extend low byte
    pad = jnp.zeros(lead + (KV_PAD - 2 * H,), jnp.int8)
    return jnp.concatenate(
        [packed, m.astype(jnp.int8), es.astype(jnp.int8), pad], axis=-1)


def kv4_dequantize(rows: jnp.ndarray, cfg) -> jnp.ndarray:
    """Inverse of :func:`kv4_quantize`: (..., T, HD/2 + KV_PAD) int8 -> f32."""
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    HD = H * Dh
    HD2 = HD // 2
    lead = rows.shape[:-1]
    qp = rows[..., :HD2].astype(jnp.int32)
    lo4 = ((qp << 28) >> 28).astype(jnp.float32)
    hi4 = (qp >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo4, hi4], axis=-1).reshape(lead + (H, Dh))
    m = rows[..., HD2:HD2 + H].astype(jnp.float32)
    es = rows[..., HD2 + H:HD2 + 2 * H].astype(jnp.float32)
    return (q * (m * jnp.exp2(es))[..., None]).reshape(lead + (HD,))


def pack_step_params(params: dict, cfg, int8: bool = False,
                     int4: bool = False) -> dict:
    """Pre-pack layer weights into the kernel's slab layout.

    Returns {"W": (L*S, D, D) bf16, "ln1": (L, D) f32, "ln2": (L, D) f32,
    "rope": (HD, HD) bf16, "wscale": (L, S, D) f32}; S = 4 + 3*(I/D) square
    slabs per layer.

    ``int8=True`` (env ``CHATTTS_STEP_INT8=1``) quantizes each slab to int8
    with a per-output-column symmetric scale — the decode step is
    HBM-bandwidth-bound on the ~378 MB/step weight stream, so halving the
    slab bytes buys real time; the kernel dequantizes after the DMA
    (astype to bf16, scale applied to the (B, D) matmul result).  Per-column
    scales keep the relative weight error ~0.4%; opt-in, pass
    ``tests/test_pallas_step.py::test_fused_step_int8*`` before trusting a
    new geometry.

    ``int4=True`` (env ``CHATTTS_STEP_INT4=1``) packs two 4-bit weights per
    byte — W becomes (L*S, D/2, D) int8 with contraction rows [0, D/2) in
    the low nibble and [D/2, D) in the high nibble — quartering the weight
    stream.  Accuracy needs finer scales than int8's per-column: ``wscale``
    becomes (L, S, G, D) with a scale per (128-row contraction group,
    output column) (G = D/128; the GPTQ/AWQ "group size 128" convention),
    and the kernel computes per-group partial matmuls and folds the scale
    into each partial — exact w.r.t. the quantized weights, no expanded
    scale tensor.
    """
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    HD = H * Dh
    if HD != D or I % D or D % 128:
        raise ValueError("geometry not slab-compatible")
    r = I // D
    slabs, ln1, ln2 = [], [], []
    for lp in params["layers"]:
        wqkv = lp["attn"]["wqkv"].reshape(D, 3 * HD)
        for j in range(3):
            slabs.append(wqkv[:, j * D:(j + 1) * D])
        slabs.append(lp["attn"]["wo"])
        wgu = lp["mlp"]["wgu"].reshape(D, 2 * I)
        for j in range(r):          # gate slabs
            slabs.append(wgu[:, j * D:(j + 1) * D])
        for j in range(r):          # up slabs
            slabs.append(wgu[:, I + j * D: I + (j + 1) * D])
        down = lp["mlp"]["down"]    # (I, D)
        for j in range(r):          # contraction-chunk slabs
            slabs.append(down[j * D:(j + 1) * D, :])
        ln1.append(lp["ln1"])
        ln2.append(lp["ln2"])
    S = 4 + 3 * r
    L = len(params["layers"])
    if int8 and int4:
        raise ValueError("int8 and int4 slabs are mutually exclusive")
    W = jnp.stack(slabs)  # (L*S, D, D)
    if int4:
        gs, G = _int4_groups(D)
        Wg = W.astype(jnp.float32).reshape(L * S, G, gs, D)
        scale = jnp.maximum(jnp.max(jnp.abs(Wg), axis=2), 1e-8) / 7.0
        q = jnp.clip(jnp.round(Wg / scale[:, :, None, :]), -7, 7).astype(
            jnp.int32).reshape(L * S, D, D)
        lo, hi = q[:, : D // 2], q[:, D // 2 :]
        W = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)  # (L*S, D/2, D)
        wscale = scale.astype(jnp.float32).reshape(L, S, G, D)
    elif int8:
        scale = jnp.maximum(jnp.max(jnp.abs(W), axis=1), 1e-8) / 127.0
        W = jnp.clip(jnp.round(W / scale[:, None, :]), -127, 127).astype(
            jnp.int8)
        wscale = scale.astype(jnp.float32).reshape(L, S, D)
    else:
        W = W.astype(jnp.bfloat16)
        wscale = jnp.ones((L, S, D), jnp.float32)
    return {
        "W": W,
        "wscale": wscale,
        "ln1": jnp.stack(ln1).astype(jnp.float32),
        "ln2": jnp.stack(ln2).astype(jnp.float32),
        "rope": jnp.asarray(rope_rotate_matrix(Dh, HD), jnp.bfloat16),
    }


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * lax.rsqrt(var + eps) * w[None, :]


def _kernel(cur_ref, curv_ref, lo_ref, cosf_ref, sinf_ref, ln1_ref, ln2_ref,
            ws_ref, x_ref, rope_ref, w_hbm, kc_hbm, vc_hbm,
            x_out, kc_out, vc_out,
            wbuf, kbuf, vbuf, rowk, rowv, xs, gate_s, up_s,
            wsem, ksem, vsem, rsem, *,
            B: int, D: int, HD: int, H: int, I: int, T: int, TC: int,
            S: int, L: int, eps: float, scale: float, per_slot: bool,
            int8: bool, int4: bool, WRING: int, BS: int, kv8: bool,
            kv4: bool = False):
    l = pl.program_id(0)
    r = I // D
    kvq = kv8 or kv4    # int8-dtype cache with embedded per-head scales
    QW = HD // 2 if kv4 else HD  # quantized-value lanes before the scales
    RW = 32 if kvq else 8  # append-window rows (int8 tiles are 32-sublane)
    NBL = S // BS       # weight bundles per layer: BS consecutive slabs
    #                     ride ONE async copy (BS=1 == one DMA per slab,
    #                     the measured-best default; see wrapper comment)
    cur_max = cur_ref[0]        # max append position (chunk loop bound)
    cur_min = cur_ref[1 + B]    # min append position (prefetch safety)
    curv = curv_ref[...].astype(jnp.int32)  # (B, 1) per-row positions
    nc = cur_max // TC + 1  # visible chunks (attention reads [0, cur])
    lo = lo_ref[...].astype(jnp.int32)  # (B, 1) first visible slot per row
    # chunk 0 of layer l+1 can stream during layer l's MLP iff no append
    # window can touch rows [0, TC) — i.e. every row's cur is past chunk 0
    prefetch0 = cur_min >= TC

    def start_wdma(gb):
        # one copy per BUNDLE: slabs [gb*BS, (gb+1)*BS) -> ring slot
        cp = pltpu.make_async_copy(w_hbm.at[pl.ds(gb * BS, BS)],
                                   wbuf.at[gb % WRING],
                                   wsem.at[gb % WRING])
        cp.start()

    def start_kv(li, c, slot):
        pltpu.make_async_copy(kc_out.at[li, :, pl.ds(c * TC, TC)],
                              kbuf.at[slot], ksem.at[slot]).start()
        pltpu.make_async_copy(vc_out.at[li, :, pl.ds(c * TC, TC)],
                              vbuf.at[slot], vsem.at[slot]).start()

    @pl.when(l == 0)
    def _():
        xs[...] = x_ref[...]
        # prologue fill, bounded by the TOTAL bundle count: tiny
        # geometries (e.g. int4's ring depth 16 on a 1-2 layer test
        # model) can have fewer bundles than ring slots, and an
        # unguarded start would DMA from past the end of the slab
        # array (the refill site below guards the same way)
        for g in range(min(WRING, L * NBL)):
            start_wdma(g)

    def mm(a, w):  # (B, D) f32 x (D, D) bf16 -> (B, D) f32 on the MXU
        return lax.dot_general(a.astype(jnp.bfloat16), w,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def mm_slab(a, s):
        """a @ slab ``base+s``: wait for its bundle's ring slot on FIRST
        use, multiply, and after the bundle's LAST slab is consumed refill
        the slot with bundle ``gb+WRING`` (wraps into following layers) -
        the refill must not be issued before the consuming matmul or it
        races the read.  BS divides S, so a slab's bundle offset is static
        at every call site; ring slots are keyed by the global bundle id
        so each wait matches the start that filled the slot."""
        gb = l * NBL + s // BS  # global bundle id (s // BS is static)
        so = s % BS             # slab offset in the bundle (static)
        if so == 0:
            pltpu.make_async_copy(w_hbm.at[pl.ds(gb * BS, BS)],
                                  wbuf.at[gb % WRING],
                                  wsem.at[gb % WRING]).wait()
        w = wbuf[gb % WRING, so]
        if int4:
            # nibble-packed slab (D/2, D): unpack via int32 shifts, then a
            # per-128-row-group partial matmul with the (group, column)
            # scale folded into each partial - the unpack + G thin matmuls
            # are VPU/MXU work hidden behind the quartered DMA stream
            gs, G = _int4_groups(D)
            G2 = G // 2
            wi = w.astype(jnp.int32)
            lo4 = ((wi << 28) >> 28).astype(jnp.bfloat16)  # rows [0, D/2)
            hi4 = (wi >> 4).astype(jnp.bfloat16)           # rows [D/2, D)
            ab = a.astype(jnp.bfloat16)
            out = jnp.zeros((a.shape[0], D), jnp.float32)
            for gi in range(G):
                half = lo4 if gi < G2 else hi4
                blk = half[(gi % G2) * gs:((gi % G2) + 1) * gs]
                part = lax.dot_general(
                    ab[:, gi * gs:(gi + 1) * gs], blk,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = out + part * ws_ref[s, gi][None, :]
        elif int8:
            # dequant: int8 slab -> bf16, per-output-column scale folded
            # into the (B, D) result (cheap VPU work vs the halved DMA)
            out = mm(a, w.astype(jnp.bfloat16)) * ws_ref[s][None, :]
        else:
            out = mm(a, w)
        if so == BS - 1:  # bundle fully consumed: refill its ring slot
            nxt = gb + WRING

            @pl.when(nxt < L * NBL)
            def _():
                start_wdma(nxt)
        return out

    # append-window RMW reads depend only on ``cur`` — start them first so
    # the HBM round trip hides behind the qkv matmuls + rope
    if per_slot:
        for b in range(B):
            s8 = (cur_ref[1 + b] // RW) * RW
            pltpu.make_async_copy(kc_out.at[l, b, pl.ds(s8, RW)], rowk.at[b],
                                  rsem.at[0, b]).start()
            pltpu.make_async_copy(vc_out.at[l, b, pl.ds(s8, RW)], rowv.at[b],
                                  rsem.at[1, b]).start()
    else:
        start8 = (cur_max // RW) * RW
        pltpu.make_async_copy(kc_out.at[l, :, pl.ds(start8, RW)], rowk,
                              rsem.at[0, 0]).start()
        pltpu.make_async_copy(vc_out.at[l, :, pl.ds(start8, RW)], rowv,
                              rsem.at[1, 0]).start()

    x = xs[...]  # (B, D) f32
    h = _rms(x, ln1_ref[0], eps)
    q = mm_slab(h, 0)
    k = mm_slab(h, 1)
    v = mm_slab(h, 2)

    rope = rope_ref[...]
    cosf = cosf_ref[...]  # (B, HD) f32
    sinf = sinf_ref[...]
    q = q * cosf + mm(q, rope) * sinf
    k = k * cosf + mm(k, rope) * sinf

    # (hoisted constants: the kv8 append quantizer needs the head selector)
    head_of = lax.broadcasted_iota(jnp.int32, (HD, H), 0) // (HD // H)
    colh = lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    eh = (head_of == colh)
    ehf = eh.astype(jnp.float32)

    if kvq:
        Dh = HD // H
        maxq = 7.0 if kv4 else 127.0

        def _q_row(xrow):
            """(B, HD) f32 -> (B, QW + KV_PAD) int8 row — kv8_quantize's /
            kv4_quantize's scheme in-kernel (per-head absmax -> (m, e)
            scale pair; kv4 additionally nibble-packs feature f with
            feature HD/2 + f), so appended rows and prefill-quantized rows
            dequantize alike."""
            parts = [jnp.max(jnp.abs(xrow[:, hh * Dh:(hh + 1) * Dh]), axis=1)
                     for hh in range(H)]
            a = jnp.stack(parts, axis=1)             # (B, H)
            sc = a / maxq
            e = jnp.floor(jnp.log2(jnp.maximum(sc, 1e-30)))
            mant = jnp.ceil(sc * jnp.exp2(-e) * 64.0)
            e = jnp.where(mant > 127.0, e + 1.0, e)
            mant = jnp.where(mant > 127.0, 64.0, mant)
            mant = jnp.where(a > 0.0, mant, 0.0)
            es = jnp.clip(e - 6.0, -126.0, 126.0)
            sdec = mant * jnp.exp2(es)               # (B, H)
            sexp = lax.dot_general(sdec, ehf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            qf = jnp.clip(jnp.round(xrow / jnp.maximum(sexp, 1e-30)),
                          -maxq, maxq)
            if kv4:
                qi = qf.astype(jnp.int32)
                u = ((qi[:, :QW] & 15) | ((qi[:, QW:] & 15) << 4))
                qr = ((u << 24) >> 24).astype(jnp.int8)
            else:
                qr = qf.astype(jnp.int8)
            return jnp.concatenate(
                [qr, mant.astype(jnp.int8), es.astype(jnp.int8),
                 jnp.zeros((B, KV_PAD - 2 * H), jnp.int8)], axis=1)

        k_row = _q_row(k)
        v_row = _q_row(v)
    else:
        k_row, v_row = k, v

    # ---- append k/v at cur (aligned RW-row RMW) --------------------------
    # single-generation path: all rows share cur -> one batched RMW window;
    # continuous-batching path (per_slot): every row has its own aligned
    # window - all 2B reads (then writes) go out concurrently and the waits
    # drain them, so the cost is one DMA round trip, not B of them.
    if per_slot:
        wr = []
        for b in range(B):
            s8 = (cur_ref[1 + b] // RW) * RW
            pltpu.make_async_copy(
                kc_out.at[l, b, pl.ds(s8, RW)], rowk.at[b], rsem.at[0, b]).wait()
            pltpu.make_async_copy(
                vc_out.at[l, b, pl.ds(s8, RW)], rowv.at[b], rsem.at[1, b]).wait()
        start8v = (curv // RW) * RW  # (B, 1)
        sel = (lax.broadcasted_iota(jnp.int32, (B, RW, 1), 1)
               == (curv - start8v)[:, :, None])
        rowk[...] = jnp.where(sel, k_row[:, None, :].astype(rowk.dtype),
                              rowk[...])
        rowv[...] = jnp.where(sel, v_row[:, None, :].astype(rowv.dtype),
                              rowv[...])
        for b in range(B):
            s8 = (cur_ref[1 + b] // RW) * RW
            wr.append((pltpu.make_async_copy(
                rowk.at[b], kc_out.at[l, b, pl.ds(s8, RW)], rsem.at[0, b]),
                pltpu.make_async_copy(
                rowv.at[b], vc_out.at[l, b, pl.ds(s8, RW)], rsem.at[1, b])))
        for ck, cv in wr:
            ck.start()
            cv.start()
        for ck, cv in wr:
            ck.wait()
            cv.wait()
    else:
        start8 = (cur_max // RW) * RW
        pltpu.make_async_copy(kc_out.at[l, :, pl.ds(start8, RW)], rowk,
                              rsem.at[0, 0]).wait()
        pltpu.make_async_copy(vc_out.at[l, :, pl.ds(start8, RW)], rowv,
                              rsem.at[1, 0]).wait()
        sel = (lax.broadcasted_iota(jnp.int32, (1, RW, 1), 1)
               == (cur_max - start8))
        rowk[...] = jnp.where(sel, k_row[:, None, :].astype(rowk.dtype),
                              rowk[...])
        rowv[...] = jnp.where(sel, v_row[:, None, :].astype(rowv.dtype),
                              rowv[...])
        pltpu.make_async_copy(rowk, kc_out.at[l, :, pl.ds(start8, RW)],
                              rsem.at[0, 0]).start()
        pltpu.make_async_copy(rowv, vc_out.at[l, :, pl.ds(start8, RW)],
                              rsem.at[1, 0]).start()
        pltpu.make_async_copy(rowk, kc_out.at[l, :, pl.ds(start8, RW)],
                              rsem.at[0, 0]).wait()
        pltpu.make_async_copy(rowv, vc_out.at[l, :, pl.ds(start8, RW)],
                              rsem.at[1, 0]).wait()

    # (deferring these write waits into the chunk loop measured ~15 us
    # SLOWER per step across repeated A/Bs - the waits are already off the
    # critical path here and the extra in-loop control flow costs more)

    # ---- attention over chunks [0, cur], online softmax ------------------
    qms = [jnp.where(eh, (q[b] * scale)[:, None], 0.0).astype(jnp.bfloat16)
           for b in range(B)]  # per-row (HD, H) block-diag selectors

    # chunk 0 was prefetched at the end of layer l-1 unless this is layer 0
    # or prefetch was unsafe; the wait in chunk_body pairs with either start
    @pl.when((l == 0) | jnp.logical_not(prefetch0))
    def _():
        start_kv(l, 0, 0)

    def chunk_body(c, carry):
        m_p, l_p, acc = carry  # (B, H), (B, H), (B, HD) f32
        slot = c % KRING

        @pl.when(c + 1 < nc)
        def _():
            start_kv(l, c + 1, (c + 1) % KRING)
        pltpu.make_async_copy(kc_out.at[l, :, pl.ds(c * TC, TC)],
                              kbuf.at[slot], ksem.at[slot]).wait()
        pltpu.make_async_copy(vc_out.at[l, :, pl.ds(c * TC, TC)],
                              vbuf.at[slot], vsem.at[slot]).wait()
        kc = kbuf[slot]  # (B, TC, HD) bf16 | (B, TC, QW + KV_PAD) int8
        vc = vbuf[slot]
        if kvq:
            # embedded per-(token, head) scales: fold k's into the scores
            # AFTER the matmul and v's into p BEFORE the accumulation -
            # exact dequantization at (TC, H) cost instead of (TC, HD)
            ksc = (kc[:, :, QW:QW + H].astype(jnp.float32)
                   * jnp.exp2(kc[:, :, QW + H:QW + 2 * H].astype(
                       jnp.float32)))
            vsc = (vc[:, :, QW:QW + H].astype(jnp.float32)
                   * jnp.exp2(vc[:, :, QW + H:QW + 2 * H].astype(
                       jnp.float32)))

        def unq(xc, b, dt):
            """Quantized chunk rows -> (TC, HD) values in feature order
            (kv4 nibble-unpack via int32 shifts, same idiom as the int4
            weight slabs; scale folding stays at (TC, H) cost outside)."""
            if not kvq:
                return xc[b].astype(dt)
            if not kv4:
                return xc[b, :, :HD].astype(dt)
            qp = xc[b, :, :QW].astype(jnp.int32)
            lo4 = ((qp << 28) >> 28).astype(dt)  # features [0, HD/2)
            hi4 = (qp >> 4).astype(dt)           # features [HD/2, HD)
            return jnp.concatenate([lo4, hi4], axis=1)

        t_ids = c * TC + lax.broadcasted_iota(jnp.int32, (1, TC, 1), 1)
        rows = []
        for b in range(B):
            kb = unq(kc, b, jnp.bfloat16)
            s_b = lax.dot_general(kb, qms[b], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            rows.append(s_b)  # (TC, H)
        s = jnp.stack(rows)  # (B, TC, H)
        if kvq:
            s = s * ksc
        vis = (t_ids >= lo[:, :, None]) & (t_ids <= curv[:, :, None])
        s = jnp.where(vis, s, NEG)
        m_n = jnp.maximum(m_p, jnp.max(s, axis=1))      # (B, H)
        p = jnp.exp(s - m_n[:, None, :])                # (B, TC, H)
        corr = jnp.exp(m_p - m_n)                       # (B, H)
        l_n = l_p * corr + jnp.sum(p, axis=1)
        # o(b, hD) += sum_t p(b,t,h(D)) v(b,t,hD)
        pv_rows = []
        for b in range(B):
            pb = (p[b] * vsc[b]) if kvq else p[b]
            p_exp = lax.dot_general(pb.astype(jnp.bfloat16),
                                    eh.astype(jnp.bfloat16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            vb = unq(vc, b, jnp.float32)
            pv_rows.append(jnp.sum(p_exp * vb, axis=0))
        pv = jnp.stack(pv_rows)  # (B, HD)
        corr_exp = lax.dot_general(corr, ehf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return m_n, l_n, acc * corr_exp + pv

    m0 = jnp.full((B, H), NEG, jnp.float32)
    l0 = jnp.zeros((B, H), jnp.float32)
    acc0 = jnp.zeros((B, HD), jnp.float32)
    m_f, l_f, acc = lax.fori_loop(0, nc, chunk_body, (m0, l0, acc0))
    l_exp = lax.dot_general(l_f, ehf, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = acc / l_exp  # (B, HD)

    x = x + mm_slab(o, 3)

    @pl.when((l + 1 < L) & prefetch0)
    def _():
        start_kv(l + 1, 0, 0)   # overlap next layer's first kv chunk w/ MLP
    h2 = _rms(x, ln2_ref[0], eps)
    for j in range(r):
        gate_s[:, j * D:(j + 1) * D] = mm_slab(h2, 4 + j)
    for j in range(r):
        up_s[:, j * D:(j + 1) * D] = mm_slab(h2, 4 + r + j)
    act = jax.nn.silu(gate_s[...]) * up_s[...]  # (B, I) f32
    for j in range(r):
        x = x + mm_slab(act[:, j * D:(j + 1) * D], 4 + 2 * r + j)
    xs[...] = x

    @pl.when(l == L - 1)
    def _():
        x_out[...] = x


@functools.partial(jax.jit, static_argnames=("cfg", "t_chunk", "interpret"))
def decode_step_fused(
    packed: dict,            # pack_step_params output
    emb: jnp.ndarray,        # (B, D) f32 current-token embedding
    k_cache: jnp.ndarray,    # (L, B, T, W) - consumed (aliased); see below
    v_cache: jnp.ndarray,    # (L, B, T, W) - consumed (aliased); see below
    cur: jnp.ndarray,        # () i32 shared position, or (B,) per-slot
    lo: jnp.ndarray,         # (B,) i32 first visible slot per row
    positions: jnp.ndarray,  # (B,) i32 rope position of the current token
    cfg,
    t_chunk: int = 128,
    interpret: bool = False,
):
    """Run all layers of one decode step; returns (x_out, k_cache', v_cache').

    ``x_out`` is the PRE-final-norm residual stream (B, D) f32 - callers
    apply the final rms_norm.  Cache arrays alias in place.  A scalar
    ``cur`` is the single-generation path (one batched append window);
    a (B,) ``cur`` is the continuous-batching path (per-row windows).

    Cache layouts (tier auto-detected from dtype/width, matching the
    producers ``kv8_quantize``/``kv4_quantize``):

    * bf16 (W = HD): plain rows, 8-row append windows.
    * kv8 int8 (W = HD + KV_PAD): per-(token, head) (mantissa, exponent)
      scales embedded in the padding lanes ``[q(HD) | m(H) | e(H) | pad]``;
      32-row append windows (int8 tile sublane).
    * kv4 int8 (W = HD//2 + KV_PAD): two nibbles per byte plus the same
      embedded scale lanes.

    ``T`` must be a multiple of 8 (bf16) / 32 (quantized tiers).
    """
    from ..models.llama import rope_tables

    D, I = cfg.hidden_size, cfg.intermediate_size
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    HD = H * Dh
    L = cfg.num_hidden_layers
    B, T = k_cache.shape[1], k_cache.shape[2]
    r = I // D
    S = 4 + 3 * r
    kvq = k_cache.dtype == jnp.int8  # kv8_/kv4_quantize row layout
    kv4 = kvq and k_cache.shape[3] == HD // 2 + KV_PAD  # nibble-packed
    kv8 = kvq and not kv4
    KW = (HD // 2 if kv4 else HD) + KV_PAD if kvq else HD
    if kvq and (k_cache.shape[3] != KW or 2 * H > KV_PAD):
        raise ValueError("cache width does not match the kv-int8/int4 layout")
    if T % (32 if kvq else 8):
        # int8 tiles are 32-sublane: the append RMW windows are 32-row
        raise ValueError("cache length must be a multiple of %d"
                         % (32 if kvq else 8))
    # kv chunk buffers are (KRING, B, TC, HD) x2: cap TC so they stay inside
    # scoped VMEM at any batch size.  Other scratch (gate/up, append windows,
    # per-row selectors) also grows with B, so the kv budget shrinks for
    # large slot counts (measured: 6 MB OOMs at B=32; 3 MB fits).
    # CHATTTS_STEP_VMEM_MB overrides the B<=16 budget (read at trace time);
    # larger budgets mean longer kv chunks - fewer per-chunk fixed costs at
    # wide batch, at the price of VMEM pressure.
    import os

    mb = int(os.environ.get("CHATTTS_STEP_VMEM_MB", "6"))
    # wide batch keeps a smaller chunk budget under the raised scoped-VMEM
    # limit below (B=32 kv8 measured at 4 MB -> TC=32: 11.6k steps/s)
    mb_wide = int(os.environ.get("CHATTTS_STEP_VMEM_MB_WIDE", "4"))
    budget = (mb << 20) if B <= 16 else (mb_wide << 20)
    kv_pos_bytes = KW if kvq else HD * 2  # bytes per (row, position)
    budget_rows = max(8, budget // (2 * KRING * B * kv_pos_bytes))
    # largest multiple of 8 that divides T and fits the requested chunk
    TC = min(t_chunk, T, (budget_rows // 8) * 8)
    while T % TC:
        TC -= 8
    assert TC >= 8
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    cos_t, sin_t = rope_tables(cfg)
    cos = jnp.asarray(cos_t)[positions]  # (B, Dh)
    sin = jnp.asarray(sin_t)[positions]
    cosf = jnp.tile(cos, (1, H)).astype(jnp.float32)  # (B, HD)
    sinf = jnp.tile(sin, (1, H)).astype(jnp.float32)

    per_slot = cur.ndim == 1
    cur_rows = (cur if per_slot else jnp.broadcast_to(cur, (B,))).astype(
        jnp.int32)
    # SMEM scalars: [cur_max, cur_0..cur_B-1, cur_min] (per-row append
    # windows need scalar reads); VMEM copy for the vectorized visibility
    # mask.  cur_min gates the next-layer chunk-0 prefetch.
    cur_smem = jnp.concatenate(
        [jnp.max(cur_rows)[None], cur_rows, jnp.min(cur_rows)[None]])

    quant = packed["W"].dtype == jnp.int8
    int4 = quant and packed["W"].shape[1] == D // 2  # nibble-packed rows
    int8 = quant and not int4
    wscale = packed.get("wscale")
    if wscale is None:
        wscale = jnp.ones((L, S, D), jnp.float32)
    # Weight stream: BS consecutive slabs ride one async copy (bundle) and
    # ``wring`` bundles are in flight.  The ring byte budget is pinned at
    # the 4-slab bf16 footprint (scoped VMEM is 16 MB total; 9 MB of
    # weight ring OOMs next to the 6 MB kv ring), so BS clamps to what
    # fits at ring depth 2 — max bundle per precision bf16:2 / int8:4 /
    # int4:8.  BS must divide S.  DEFAULT 1: on-chip A/B (PERF.md "RULED
    # OUT: weight-DMA bundling") measured bundling flat for bf16/int4 and
    # ~15% SLOWER for int8 — fewer DMA issues don't pay for the coarser
    # overlap (first matmul waits on the whole bundle; a ring slot only
    # refills after its last slab is consumed).  Env knob kept for A/B.
    wrows = D // 2 if int4 else D
    slab_bytes = wrows * D * np.dtype(packed["W"].dtype).itemsize
    ring_bytes = WRING * D * D * 2
    BS = max(1, min(S, int(os.environ.get("CHATTTS_STEP_WBUNDLE", "1"))))
    while S % BS or 2 * BS * slab_bytes > ring_bytes:
        BS -= 1
    wring = max(2, ring_bytes // (BS * slab_bytes))
    kernel = functools.partial(
        _kernel, B=B, D=D, HD=HD, H=H, I=I, T=T, TC=TC, S=S, L=L,
        eps=cfg.rms_norm_eps, scale=1.0 / float(np.sqrt(Dh)),
        per_slot=per_slot, int8=int8, int4=int4, WRING=wring, BS=BS,
        kv8=kv8, kv4=kv4)
    ws_spec = (pl.BlockSpec((None,) + wscale.shape[1:],
                            lambda l: (l, 0, 0, 0)) if int4 else
               pl.BlockSpec((None, S, D), lambda l: (l, 0, 0)))
    x_out, k2, v2 = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cur scalars (1+B,)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # curv (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lo (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cosf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sinf
            # per-layer rows streamed by the grid (dynamic VMEM sublane
            # indexing is not provably aligned; blocks are).  The (None,1,D)
            # block shape keeps the last-two dims equal to the array dims
            # (Mosaic block rule) while staying per-layer.
            pl.BlockSpec((None, 1, D), lambda l: (l, 0, 0)),  # ln1 row
            pl.BlockSpec((None, 1, D), lambda l: (l, 0, 0)),  # ln2 row
            ws_spec,                                          # dequant scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x in
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rope matrix
            pl.BlockSpec(memory_space=pltpu.HBM),    # W slabs
            pl.BlockSpec(memory_space=pltpu.HBM),    # k cache
            pl.BlockSpec(memory_space=pltpu.HBM),    # v cache
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((wring, BS, wrows, D), packed["W"].dtype),  # w ring
            pltpu.VMEM((KRING, B, TC, KW), k_cache.dtype),
            pltpu.VMEM((KRING, B, TC, KW), v_cache.dtype),
            # append RMW windows (int8 tiles are 32-sublane -> 32 rows)
            pltpu.VMEM((B, 32 if kvq else 8, KW), k_cache.dtype),
            pltpu.VMEM((B, 32 if kvq else 8, KW), v_cache.dtype),
            pltpu.VMEM((B, D), jnp.float32),              # hidden carry
            pltpu.VMEM((B, I), jnp.float32),              # gate
            pltpu.VMEM((B, I), jnp.float32),              # up
            pltpu.SemaphoreType.DMA((wring,)),
            pltpu.SemaphoreType.DMA((KRING,)),
            pltpu.SemaphoreType.DMA((KRING,)),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
        input_output_aliases={11: 1, 12: 2},
        # B <= 16 keeps Mosaic's default 16 MB scoped-VMEM limit (the
        # measured speed-of-light config); wide batches raise it - the
        # chip has 128 MB of VMEM and the B=32 scratch alone (append
        # windows, gate/up, f32 carries) overflows 16 MB even at TC=16.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=(None if B <= 16 else int(os.environ.get(
                "CHATTTS_STEP_VMEM_LIMIT_MB", "32")) << 20)),
        interpret=interpret,
    )(cur_smem, cur_rows.reshape(B, 1), lo.reshape(B, 1).astype(jnp.int32),
      cosf, sinf,
      packed["ln1"].reshape(L, 1, D), packed["ln2"].reshape(L, 1, D),
      wscale,
      emb.astype(jnp.float32),
      packed["rope"], packed["W"], k_cache, v_cache)
    return x_out, k2, v2
