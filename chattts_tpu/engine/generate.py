"""Jitted autoregressive generation engine.

TPU-native replacement for the reference's eager per-token Python loop
(``ChatTTS/model/gpt.py:315-618``).  Design differences, deliberately:

* the whole decode loop runs inside one ``jax.jit`` as a ``lax.while_loop``
  over a static-shape state (preallocated token/hidden buffers, dense KV
  cache) - zero host sync per token, vs. the reference's per-step
  ``.to(device, float32)`` logits round-trip (gpt.py:430-432);
* sampling (temperature / repetition penalty / top-p / top-k / EOS
  suppression / categorical draw) is fused into the step (ops/sampling.py);
* prompt lengths are bucketed to multiples of ``prefill_bucket`` so the
  number of distinct compiled shapes stays small;
* streaming runs the same compiled loop in ``stream_batch``-step chunks with
  the state (including the KV cache) donated between dispatches, giving the
  reference's yield cadence (gpt.py:579-589) without leaving the device.

Both generation modes are covered: ``infer_text`` (refine-text pass, text
head, scalar temperature) and code generation (4 codebook streams, per-stream
temperature, any-codebook EOS, hidden-state capture for the decoder path).
"""

from __future__ import annotations

import functools
import os
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from typing import NamedTuple

from ..config import GPTConfig
from ..models import embed as embed_mod
from ..models import llama
from ..models.llama import KVCache
from ..ops import sampling

REP_WINDOW = 16  # trailing-token window of the repetition penalty (processors.py:54)


class GenState(NamedTuple):
    cache: KVCache
    ids: jnp.ndarray        # (B, Tbuf, num_vq) i32 token buffer
    key_valid: jnp.ndarray  # (B, Tbuf) bool - non-padding cache slots
    hidden: jnp.ndarray     # (B, D) f32 - produces the next token's logits
    cur: jnp.ndarray        # () i32 - write slot of the next sampled token
    pos_next: jnp.ndarray   # (B,) i32 - rope position of the next token
    finish: jnp.ndarray     # (B,) bool
    end_idx: jnp.ndarray    # (B,) i32 - tokens generated before EOS
    hiddens: jnp.ndarray    # (B, max_new, D) f32
    step: jnp.ndarray       # () i32
    rng: jax.Array


@dataclass
class GenerationOutputs:
    """Host-side results; mirrors GPT.GenerationOutputs (gpt.py:292-304).

    For the non-streaming decoder path the hidden states additionally stay
    resident on the device (``hiddens_dev``/``end_dev``): the only consumer
    is the jitted mel-decoder, and round-tripping (B, T, 768) float32
    through the host costs more than the decode itself.
    """

    ids: List[np.ndarray]       # per-seq (Ti,) text ids or (Ti, num_vq) codes
    hiddens: List[np.ndarray]   # per-seq (Ti, D) or empty
    finished: np.ndarray        # (B,) bool
    hiddens_dev: Optional[jax.Array] = None  # (B, n_max, D) on device
    end_dev: Optional[jax.Array] = None      # (B,) int32 kept lengths
    # valid prefix length of hiddens_dev when the buffer is LARGER than the
    # kept max (engine streaming hands fixed-shape full slot rows so the
    # window decode compiles once; rows >= n_valid are garbage)
    n_valid: Optional[int] = None
    # True for streaming partials; False for an attempt's final output.
    # A yield AFTER a final one means the empty-generation retry restarted
    # the attempt - streaming consumers must reset their accumulation.
    partial: bool = False

    @property
    def hid_n(self) -> int:
        """Valid hidden positions in ``hiddens_dev`` (buffer may be larger)."""
        if self.hiddens_dev is None:
            return 0
        return (self.n_valid if self.n_valid is not None
                else self.hiddens_dev.shape[1])

    def materialize_hiddens(self) -> List[np.ndarray]:
        """Per-seq host copies of the hiddens (device path included)."""
        if self.hiddens or self.hiddens_dev is None:
            return self.hiddens
        hid = np.asarray(self.hiddens_dev)
        end = np.asarray(self.end_dev)
        return [hid[b, : int(end[b])].copy() for b in range(hid.shape[0])]

    def destroy(self):  # API parity; GC handles the rest
        self.ids = []
        self.hiddens = []
        self.hiddens_dev = None
        self.end_dev = None


class Interrupt:
    """Cooperative cancel flag, polled between decode chunks.

    Mirrors ``GPT.Context`` (gpt.py:103-111); host-side because the jitted
    loop cannot observe Python state mid-flight.
    """

    def __init__(self):
        self._flag = False

    def set(self, v: bool):
        self._flag = v

    def get(self) -> bool:
        return self._flag


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_geometry_ok(cfg: GPTConfig) -> bool:
    D, I = cfg.hidden_size, cfg.intermediate_size
    HD = cfg.num_attention_heads * cfg.head_dim
    return HD == D and I % D == 0 and D % 128 == 0


def use_fused_step(cfg: GPTConfig) -> bool:
    """Whole-step Pallas megakernel (ops/pallas_step.py).

    Default ON for TPU backends with slab-compatible geometry (measured
    ~0.96 ms/step vs 1.26 ms for the XLA step at B=8, T=448 -> bench RTF
    108 vs 85); ``CHATTTS_PALLAS_STEP=0`` forces the XLA path, ``=1``
    forces the kernel (interpret mode off-TPU, for tests).
    """
    flag = os.environ.get("CHATTTS_PALLAS_STEP", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return _fused_geometry_ok(cfg)
    import jax

    return jax.default_backend() == "tpu" and _fused_geometry_ok(cfg)


def step_int8() -> bool:
    """Opt-in int8 weight slabs for the fused step (CHATTTS_STEP_INT8=1).

    Halves the per-step weight stream (the dominant HBM traffic); weights
    are quantized per-output-column at pack time and dequantized in-kernel.
    """
    return (os.environ.get("CHATTTS_STEP_INT8", "0") == "1"
            and not step_int4())


def step_int4() -> bool:
    """Opt-in int4 weight slabs (CHATTTS_STEP_INT4=1; wins over INT8).

    Quarters the weight stream; nibble-packed slabs with per-(128-row
    group, column) scales dequantized in-kernel (ops/pallas_step.py)."""
    return os.environ.get("CHATTTS_STEP_INT4", "0") == "1"


def kv_int8(cfg: GPTConfig) -> bool:
    """int8 KV cache, fused-step path only (CHATTTS_KV_INT8=0 disables).

    Rows store int8 values with embedded per-(token, head) (mantissa,
    exponent) scales (ops/pallas_step.kv8_quantize); the kernel quantizes
    appends and folds the dequant scales into the attention scores/probs.
    Cuts the KV stream to ~58% of bf16 - at the capacity tier's long-form
    shape (16 x 2048, PERF.md) the KV stream costs ~35% of the step, so
    this is the depth-scaling lever.  Orthogonal to the weight-slab tiers
    (CHATTTS_STEP_INT8/INT4).

    Default ON since round 4: it wins at every measured shape (+4%
    generator 8x384, +19-23% engine 16x384, +31% long-form 16x2048,
    PERF.md) and its divergence is at the measurement noise floor - mean
    KL 0.0001 nats / top-1 98.4% vs the SAME kernel with bf16 caches,
    which itself sits 0.0009 nats from the f32 XLA step.  The per-(token,
    head) scales are exactly the granularity that absorbs per-head
    magnitude outliers on trained weights."""
    return (os.environ.get("CHATTTS_KV_INT8", "1") == "1"
            and use_fused_step(cfg))


def kv_int4(cfg: GPTConfig) -> bool:
    """Opt-in int4 KV cache (CHATTTS_KV_INT4=1), fused-step path only.

    Nibble-packed rows with the same per-(token, head) (mantissa, exponent)
    scales (ops/pallas_step.kv4_quantize): the KV stream drops to ~33% of
    bf16 (vs kv8's 58%) and the cache to HALF of kv8's HBM footprint.
    Measured perf-NEUTRAL at every 16-slot serving shape, both weight
    tiers (PERF.md round 4: kv8 already sits under the weight-DMA overlap
    ceiling) - this is the HBM-capacity tier for 64-slot / long-context
    engines, not a speed lever.  Teacher-forced KL ~0.01 nats / top-1
    ~83% - the int8 WEIGHT slab quality class, an order noisier than
    kv8's 0.0001, so it stays opt-in; anchor on real trained weights
    before trusting it further.  Wins over kv8 when both are set.
    Requires HD % 256 == 0 (nibble halves split into whole 128-lane
    tiles); other geometries fall back to the kv8/bf16 tier."""
    HD = cfg.num_attention_heads * cfg.head_dim
    return (os.environ.get("CHATTTS_KV_INT4", "0") == "1"
            and use_fused_step(cfg) and HD % 256 == 0)


def kv_quant_bits(cfg: GPTConfig) -> int:
    """The KV cache tier as a width: 4 (opt-in), 8 (default), 0 (bf16)."""
    if kv_int4(cfg):
        return 4
    return 8 if kv_int8(cfg) else 0


@functools.lru_cache(maxsize=32)
def _build_fns(cfg: GPTConfig, infer_text: bool, B: int, T0: int, max_new: int,
               apply_spk: bool, kvb: int = 0):
    """Compile-cached (prefill_fn, chunk_fn) for one shape bucket.

    ``kvb`` is the KV quantization width (0 bf16 / 8 / 4) and an explicit
    cache key (callers pass ``kv_quant_bits(cfg)``): the tier changes the
    traced cache dtype/width, so reading the env inside would hand a stale
    cached fn to a process that flips the env between loads (the same trap
    the packed-slab dtype avoids by being an arg)."""
    num_vq = cfg.num_vq
    # cache/buffer lengths stay multiples of 8 (Pallas DMA sublane alignment;
    # T0 is already bucketed).  Generation still stops at the caller's
    # max_new; the rounded tail slots are never written.
    max_new = _round_up(max_new, 8)
    Tbuf = T0 + max_new
    # int8-kv append windows are 32-row (int8 tile sublane): pad the CACHE
    # length only; ids/key_valid/hiddens stay at Tbuf/max_new
    Tcache = _round_up(Tbuf, 32) if kvb else Tbuf
    eos_token = (cfg.num_audio_tokens - 1) if not infer_text else None
    max_penalized = (cfg.num_audio_tokens - 1) if not infer_text else cfg.num_text_tokens
    fused = use_fused_step(cfg)
    HD = cfg.num_attention_heads * cfg.head_dim

    def prefill_fn(pg, pe, ids0, attn_mask, text_mask, spk_vec, spk_emb_ids, rng):
        emb0 = embed_mod.embed_prompt(pe, ids0, text_mask)
        if apply_spk:
            n = spk_vec / jnp.maximum(
                jnp.linalg.norm(spk_vec), 1e-12)  # F.normalize(speaker.py:36-42)
            cond = (ids0[..., 0] == spk_emb_ids)[..., None]
            emb0 = jnp.where(cond, n[None, None, :].astype(emb0.dtype), emb0)
        positions = jnp.maximum(jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1, 0)
        cache = KVCache.create(cfg, B, Tbuf)
        hidden_all, cache = llama.prefill(pg, emb0, attn_mask, positions, cache, cfg)
        hidden = hidden_all[:, -1]
        key_valid = jnp.pad(attn_mask, ((0, 0), (0, max_new)))
        if fused:
            # flat stacked layout for the megakernel's manual DMA
            cache = (jnp.stack([c.reshape(B, Tbuf, HD) for c in cache.k]),
                     jnp.stack([c.reshape(B, Tbuf, HD) for c in cache.v]))
            if kvb:
                from ..ops.pallas_step import kv4_quantize, kv8_quantize

                quant = kv4_quantize if kvb == 4 else kv8_quantize
                pad = ((0, 0), (0, 0), (0, Tcache - Tbuf), (0, 0))
                cache = tuple(quant(jnp.pad(c, pad), cfg) for c in cache)
        return GenState(
            cache=cache,
            ids=jnp.pad(ids0, ((0, 0), (0, max_new), (0, 0))),
            key_valid=key_valid,
            hidden=hidden,
            cur=jnp.int32(T0),
            pos_next=attn_mask.astype(jnp.int32).sum(1),
            finish=jnp.zeros((B,), jnp.bool_),
            end_idx=jnp.zeros((B,), jnp.int32),
            hiddens=jnp.zeros((B, max_new, cfg.hidden_size), jnp.float32),
            step=jnp.int32(0),
            rng=rng,
        )

    def step_body(pg, pe, packed, carry):
        st, sp, eos_text = carry
        rng, sub = jax.random.split(st.rng)
        eos = eos_token if eos_token is not None else eos_text

        if infer_text:
            logits = embed_mod.head_text(pe, st.hidden)  # (B, V)
        else:
            logits = embed_mod.head_code(pe, st.hidden).reshape(
                B * num_vq, cfg.num_audio_tokens)

        # trailing-16 generated-token window (prompt tokens masked out)
        start = jnp.clip(st.cur - REP_WINDOW, 0, Tbuf - REP_WINDOW)
        win = lax.dynamic_slice(st.ids, (0, start, 0), (B, REP_WINDOW, num_vq))
        wpos = start + jnp.arange(REP_WINDOW)
        wmask = (wpos >= T0) & (wpos < st.cur)  # (W,)
        if infer_text:
            win_rows = win[:, :, 0]
            wmask_rows = jnp.broadcast_to(wmask[None], (B, REP_WINDOW))
        else:
            win_rows = win.transpose(0, 2, 1).reshape(B * num_vq, REP_WINDOW)
            wmask_rows = jnp.broadcast_to(wmask[None], (B * num_vq, REP_WINDOW))

        ids_next = sampling.sample(
            sub, logits, sp, win_rows, wmask_rows, st.step, eos, max_penalized)
        if infer_text:
            token = jnp.broadcast_to(ids_next[:, None], (B, num_vq))
            eos_hit = ids_next == eos
        else:
            token = ids_next.reshape(B, num_vq)
            eos_hit = jnp.any(token == eos, axis=-1)

        finish = st.finish | eos_hit
        ids = lax.dynamic_update_slice(st.ids, token[:, None, :], (0, st.cur, 0))
        key_valid = st.key_valid.at[:, st.cur].set(True)
        hiddens = lax.dynamic_update_slice(
            st.hiddens, st.hidden[:, None, :], (0, st.step, 0))
        end_idx = st.end_idx + (~finish).astype(jnp.int32)

        emb = (embed_mod.embed_text_step(pe, token[:, 0]) if infer_text
               else embed_mod.embed_code_step(pe, token))
        if fused:
            from ..ops.pallas_step import decode_step_fused

            lo = jnp.argmax(key_valid, axis=1).astype(jnp.int32)
            lo = jnp.where(jnp.any(key_valid, axis=1), lo, 0)
            x_out, kc, vc = decode_step_fused(
                packed, emb, st.cache[0], st.cache[1], st.cur, lo,
                st.pos_next, cfg=cfg)
            hidden = llama.rms_norm(x_out, pg["norm"], cfg.rms_norm_eps)
            cache = (kc, vc)
        else:
            hidden, cache = llama.decode_step(
                pg, emb, st.cache, st.cur, key_valid, st.pos_next, cfg)
        return (
            GenState(cache, ids, key_valid, hidden, st.cur + 1, st.pos_next + 1,
                     finish, end_idx, hiddens, st.step + 1, rng),
            sp, eos_text,
        )

    def chunk_fn(pg, pe, st: GenState, sp: sampling.SamplingParams,
                 step_end: jnp.ndarray, eos_text: jnp.ndarray,
                 packed: dict):
        def cond(carry):
            s = carry[0]
            return (s.step < step_end) & ~jnp.all(s.finish)

        # params bind via functools.partial, NOT mutable closure cells: a
        # shared body function whose cells hold the previous trace's
        # tracers hits jax's while_loop jaxpr cache (keyed on function
        # identity + avals) on any retrace - e.g. swapping the packed-slab
        # quantization between loads - and reuses the STALE tracers as
        # constants (UnexpectedTracerError).  A fresh partial per trace
        # makes the cache key unique to this trace's tracers.
        body = functools.partial(step_body, pg, pe, packed)
        st, _, _ = lax.while_loop(cond, body, (st, sp, eos_text))
        # every scalar the host scheduler reads, in ONE packed array: this
        # link's blocking reads cost ~20-30 ms each, so separate step /
        # finish / end_idx fetches dominated short generations
        status = jnp.concatenate([
            st.step[None],
            jnp.all(st.finish)[None].astype(jnp.int32),
            jnp.any(st.finish & (st.end_idx == 0))[None].astype(jnp.int32),
            st.end_idx,
            st.finish.astype(jnp.int32),
        ])
        # generated-region ids ride along so the host fetches status + ids
        # in one device_get (a second blocking read costs another ~25 ms)
        ids_gen = lax.slice_in_dim(st.ids, T0, T0 + max_new, axis=1)
        return st, status, ids_gen

    prefill_jit = jax.jit(prefill_fn)
    chunk_jit = jax.jit(chunk_fn, donate_argnums=(2,))
    return prefill_jit, chunk_jit


@dataclass
class GenerateRequest:
    """Host-side inputs for one generation call."""

    ids: np.ndarray          # (B, T0, num_vq) int32, left-padded
    attn_mask: np.ndarray    # (B, T0) bool
    text_mask: np.ndarray    # (B, T0) bool
    infer_text: bool
    eos_token: int           # text eos id (code path uses num_audio_tokens-1)
    temperature: np.ndarray  # (num_vq,) or (1,)
    top_p: float = 0.7
    top_k: int = 20
    repetition_penalty: float = 1.0
    max_new: int = 2048
    min_new: int = 0
    spk_vec: Optional[np.ndarray] = None  # (D,) raw speaker embedding
    spk_emb_ids: int = 0
    seed: Optional[int] = None
    ensure_non_empty: bool = True
    stream_batch: int = 0    # >0: yield partial outputs every N steps
    return_hidden: bool = False
    # dispatch chunk k+1 BEFORE blocking on chunk k's status so the host
    # link round trip (~25 ms here) hides behind device compute.  Partial
    # yields then reference the in-flight successor state - safe because
    # rows [0, done_k) of the hidden/ids buffers are append-only, and a
    # speculative chunk dispatched after everything finished is a no-op
    # (the jitted loop's cond fails immediately).  Off by default: the
    # streaming consumer materializes each window synchronously and would
    # see +1 chunk of first-emission latency.
    speculate: bool = False
    # with speculate=True, run this many chunks synchronously before
    # dispatch-ahead starts: streaming sets 2 so the FIRST emission (the
    # TTFA-critical window) is not queued behind a speculative chunk,
    # while steady-state yields gain the hidden round trip
    speculate_from: int = 0
    # host progress hook fn(done_steps), called at every chunk sync (the
    # sync already exists, so reporting is free); the facade wires it to
    # tqdm for show_tqdm (reference gpt.py:383-390)
    on_progress: Optional[callable] = None
    # dispatch hook fn(newest GenState, predicted kept-step count), fired
    # right after each decode chunk is ENQUEUED - before the blocking
    # status read.  A streaming consumer uses it to enqueue its vocode
    # window + async PCM copy so those transfers overlap the status round
    # trip (DeviceStreamingDecoder.speculate_window).  The predicted count
    # is exact unless generation fully finishes mid-chunk; consumers must
    # guard consumption accordingly.
    on_dispatch: Optional[callable] = None


class Generator:
    """Drives the jitted loop: bucketing, chunking, retry, output trimming."""

    def __init__(self, cfg: GPTConfig, gpt_params: dict, embed_params: dict,
                 prefill_bucket: int = 32, packed: Optional[dict] = None):
        self.cfg = cfg
        self.gpt_params = gpt_params
        self.embed_params = embed_params
        self.prefill_bucket = prefill_bucket
        self._rng_counter = 0
        self._packed = {}
        if use_fused_step(cfg):
            if packed is not None:
                # shared pre-packed slabs (~L*S*D*D bytes of HBM): the
                # facade hands ONE copy to the generator and every engine
                # tier instead of each packing its own
                self._packed = packed
            else:
                from ..ops.pallas_step import pack_step_params

                self._packed = pack_step_params(gpt_params, cfg,
                                                int8=step_int8(),
                                                int4=step_int4())

    def _pad_prompt(self, req: GenerateRequest):
        """Left-extend prompts to the bucketed length (padding stays left)."""
        B, T0, num_vq = req.ids.shape
        Tpad = max(_round_up(T0, self.prefill_bucket), self.prefill_bucket)
        if Tpad == T0:
            return req.ids, req.attn_mask, req.text_mask, T0
        d = Tpad - T0
        ids = np.pad(req.ids, ((0, 0), (d, 0), (0, 0)))
        attn = np.pad(req.attn_mask, ((0, 0), (d, 0)))
        tmask = np.pad(req.text_mask, ((0, 0), (d, 0)))
        return ids, attn, tmask, Tpad

    def _next_seed(self, req: GenerateRequest, attempt: int) -> jax.Array:
        if req.seed is not None:
            return jax.random.PRNGKey(req.seed)
        self._rng_counter += 1
        seed = np.random.SeedSequence(
            [self._rng_counter, attempt]).generate_state(1)[0]
        return jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)

    def generate(self, req: GenerateRequest, context: Optional[Interrupt] = None):
        """Generator yielding GenerationOutputs (partials if streaming)."""
        context = context or Interrupt()
        max_attempts = 4 if (req.ensure_non_empty and req.seed is None) else 1
        for attempt in range(max_attempts):
            st, status, ids_np = yield from self._run_once(
                req, context, attempt)
            any_empty = bool(status[2])
            if not any_empty or attempt == max_attempts - 1 or context.get():
                yield self._materialize(req, st, status, ids_np)
                return
            # reference regenerates on unexpected immediate EOS (gpt.py:527-570)
            if req.stream_batch > 0:
                # streaming consumers detect the restart by a yield ARRIVING
                # AFTER an attempt-final one (partial=False); without this
                # yield the discarded attempt has no final and downstream
                # accumulators would stitch two attempts together
                yield self._materialize(req, st, status, ids_np)

    def _run_once(self, req: GenerateRequest, context: Interrupt, attempt: int):
        ids, attn, tmask, T0 = self._pad_prompt(req)
        B = ids.shape[0]
        apply_spk = req.spk_vec is not None
        prefill_jit, chunk_jit = _build_fns(
            self.cfg, req.infer_text, B, T0, req.max_new, apply_spk,
            kv_quant_bits(self.cfg))

        spk_vec = (jnp.asarray(req.spk_vec, jnp.float32) if apply_spk
                   else jnp.zeros((self.cfg.hidden_size,), jnp.float32))
        st = prefill_jit(
            self.gpt_params, self.embed_params,
            jnp.asarray(ids, jnp.int32), jnp.asarray(attn, jnp.bool_),
            jnp.asarray(tmask, jnp.bool_), spk_vec,
            jnp.int32(req.spk_emb_ids), self._next_seed(req, attempt))

        sp = sampling.SamplingParams(
            temperature=jnp.asarray(req.temperature, jnp.float32),
            top_p=jnp.float32(req.top_p),
            top_k=jnp.int32(req.top_k),
            repetition_penalty=jnp.float32(req.repetition_penalty),
            min_new=jnp.int32(req.min_new),
        )
        eos_text = jnp.int32(req.eos_token)
        chunk = req.stream_batch if req.stream_batch > 0 else req.max_new
        done = 0
        status_np = ids_np = None
        sync_until = (req.speculate_from * chunk if req.speculate
                      else req.max_new)
        if req.speculate and req.stream_batch > 0 and sync_until <= 0:
            st, status_np, ids_np = yield from self._run_speculative(
                req, context, st, sp, eos_text, chunk, chunk_jit)
        else:
            finished = False
            while done < req.max_new:
                step_end = jnp.int32(min(done + chunk, req.max_new))
                st, status, ids_gen = chunk_jit(
                    self.gpt_params, self.embed_params, st, sp,
                    step_end, eos_text, self._packed)
                if req.on_dispatch is not None:
                    req.on_dispatch(st, int(step_end))
                # ONE host sync per chunk: scheduling scalars + generated ids
                status_np, ids_np = jax.device_get((status, ids_gen))
                done = int(status_np[0])
                finished = bool(status_np[1])
                if req.on_progress is not None:
                    req.on_progress(done)
                if req.stream_batch > 0 and not finished and done < req.max_new:
                    yield self._materialize(req, st, status_np, ids_np,
                                            partial=True)
                if finished:
                    break
                if context.get():
                    break
                if done >= sync_until and req.stream_batch > 0:
                    # switch to dispatch-ahead for the steady state
                    break
            if (req.speculate and req.stream_batch > 0 and not finished
                    and done < req.max_new and not context.get()):
                st, status_np, ids_np = yield from self._run_speculative(
                    req, context, st, sp, eos_text, chunk, chunk_jit,
                    start_hi=done)
        if status_np is None:  # max_new == 0: nothing generated
            status_np = np.zeros(3 + 2 * B, np.int32)
            ids_np = np.zeros((B, 0, self.cfg.num_vq), np.int32)
        return st, status_np, ids_np

    def _run_speculative(self, req: GenerateRequest, context: Interrupt,
                         st, sp, eos_text, chunk, chunk_jit,
                         start_hi: int = 0):
        """Chunk loop with one chunk of dispatch-ahead (req.speculate).

        Keeps at most one unread chunk in flight: chunk k+1 is enqueued on
        the device BEFORE the host blocks on chunk k's status, so the
        blocking read's link round trip overlaps chunk k+1's compute.
        ``st`` always refers to the NEWEST dispatched state; partial
        materializes against it are valid because the generated prefix of
        every buffer is append-only and in-order device execution
        guarantees any reader enqueued later sees completed rows.  If
        chunk k reports all-finished, the already-dispatched chunk k+1 ran
        as a no-op (its while_loop cond fails), leaving ids/end_idx/
        hiddens unchanged - st stays the correct final state and the
        speculative status need not be read."""
        pending = deque()  # (status_dev, ids_dev) of dispatched chunks
        next_hi = start_hi

        def dispatch():
            nonlocal st, next_hi
            hi = min(next_hi + chunk, req.max_new)
            st2, s_d, i_d = chunk_jit(
                self.gpt_params, self.embed_params, st, sp,
                jnp.int32(hi), eos_text, self._packed)
            st = st2
            pending.append((s_d, i_d))
            next_hi = hi
            if req.on_dispatch is not None:
                req.on_dispatch(st, hi)

        status_np = ids_np = None
        dispatch()
        while pending:
            if (next_hi < req.max_new and len(pending) < 2
                    and not context.get()):
                dispatch()  # speculative: enqueued before the blocking read
            s_d, i_d = pending.popleft()
            status_np, ids_np = jax.device_get((s_d, i_d))
            done = int(status_np[0])
            if req.on_progress is not None:
                req.on_progress(done)
            if bool(status_np[1]) or context.get():
                break  # in-flight successors are no-ops; st stays correct
            if done < req.max_new:
                yield self._materialize(req, st, status_np, ids_np,
                                        partial=True)
        return st, status_np, ids_np

    def _materialize(self, req: GenerateRequest, st: GenState,
                     status_np: np.ndarray, ids_np: np.ndarray,
                     partial: bool = False) -> GenerationOutputs:
        B = st.ids.shape[0]
        end = status_np[3:3 + B]  # packed by chunk_fn; no extra device read
        n_max = int(end.max()) if end.size else 0
        hiddens_dev = end_dev = None
        if req.return_hidden:
            # the hiddens stay on device for BOTH final and partial yields:
            # the mel decoder and the device streaming vocoder consume them
            # there, and the host link is the expensive resource
            # (materialize_hiddens() gives host copies on demand)
            hiddens_dev = st.hiddens[:, :n_max]
            end_dev = st.end_idx
        out_ids = []
        for b in range(ids_np.shape[0]):
            n = int(end[b])
            seq = ids_np[b, :n]
            out_ids.append(seq[:, 0].copy() if req.infer_text else seq.copy())
        return GenerationOutputs(
            ids=out_ids, hiddens=[],
            finished=status_np[3 + B:3 + 2 * B].astype(bool),
            hiddens_dev=hiddens_dev, end_dev=end_dev, partial=partial)
