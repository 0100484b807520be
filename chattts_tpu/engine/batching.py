"""Continuous-batching serving engine (the reference's "velocity" layer,
rebuilt TPU-first).

The reference forks vLLM: Ray workers, NCCL broadcasts, a paged-KV block
manager with copy-on-write, CPU swap, and CUDA-graph capture per batch size
(``ChatTTS/model/velocity/``: scheduler.py, block_manager.py, worker.py,
model_runner.py, llm_engine.py).  On TPU all of that machinery collapses:

* **slots, not pages** - the engine owns one static-shape decode state of
  ``max_num_seqs`` slots (dense per-slot KV regions).  XLA wants static
  shapes; at ChatTTS scale (~2.3k max positions x 768) a slot's KV region is
  ~6 MB - page-granular sharing buys nothing and costs a gather per step.
  Admission = prefill into a free slot; completion frees it.  This is the
  same *scheduling policy* as the reference (FCFS admission, iteration-level
  batching, per-sequence sampling state) with allocation by slot.
* **no workers / broadcasts** - single-controller JAX; multi-chip versions
  of the state shard over the mesh (parallel/mesh.state_specs) and XLA moves
  the bytes.
* **no CUDA-graph capture** - the jitted chunk IS the captured graph.
* **preemption-by-recompute for FAIRNESS, not memory** (the reference
  preempts under KV-memory pressure, scheduler.py:222-249; slot memory here
  is static, so preemption instead time-slices long requests when the
  queue is blocked - ``EngineConfig.preempt_after_chunks``).  CPU swap is
  dropped (recompute suffices at this model size; SURVEY.md section 7).
* on TPU the decode chunk runs the whole-step Pallas megakernel
  (ops/pallas_step.py, per-slot ``cur``); sharded mesh engines keep the
  pjit-partitioned XLA step.

Mirrored semantics: per-request sampling params (velocity/sampling_params.py
extras: min_new_token/max_new_token/infer_text/eos_token/spk_emb) INCLUDING
per-request seeds (slot-keyed RNG: draws depend only on the request's own
seed and depth), per-step hidden-state capture in outputs
(velocity/sequence.py:84-88 - the fork's raison d'etre), any-codebook EOS,
16-token repetition window, empty-generation retry (gpt.py:527-570),
interrupt, and throughput/occupancy stats (llm_engine.py:667-740).
"""

from __future__ import annotations

import collections
import functools
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import GPTConfig
from ..models import embed as embed_mod
from ..models import llama
from ..models.llama import KVCache
from ..ops import sampling
from .generate import REP_WINDOW


@dataclass(frozen=True)
class EngineConfig:
    """Static engine geometry (compiled into the step functions)."""

    max_num_seqs: int = 8          # decode slots (vLLM max_num_seqs analog)
    max_prompt_len: int = 256      # prompt region size in the slot cache
    # prompts left-pad to the smallest bucket that fits (one compiled prefill
    # per bucket); None = single bucket of max_prompt_len
    prompt_buckets: tuple = None
    max_new_tokens: int = 2048     # per-slot generation region
    chunk_steps: int = 16          # decode steps between host scheduling
    # upper chunk for the offline ``generate`` loop: when nothing is waiting
    # and no active request streams, the scheduler has nothing to decide
    # between chunks, so it runs longer chunks to amortize the per-chunk
    # host sync (the jitted loop exits early once every slot finishes, so
    # long chunks never waste decode steps).  ``n_steps`` is a traced
    # argument - no recompile per chunk length.  ``step()`` keeps the
    # short ``chunk_steps`` quantum unless told otherwise: the serving loop
    # admits/aborts/preempts only at chunk boundaries, so the quantum IS
    # the scheduling latency there.
    chunk_steps_max: int = 128
    # dispatch chunk k+1 before blocking on chunk k's status whenever the
    # scheduler is idle (see Engine.step); hides the per-chunk host-link
    # round trip behind device compute.  Costs at most one extra chunk of
    # admission latency for requests arriving mid-chunk.
    speculate: bool = True
    infer_text: bool = False       # text mode (refine pass) vs code mode
    text_eos_token: int = 0        # [Ebreak] id (text mode; default per engine)
    collect_hidden: bool = True    # accumulate per-step hiddens (decoder path)
    # starvation control: with requests waiting and no free slot, the
    # longest-remaining running request is preempted BY RECOMPUTE once it
    # has held its slot for this many chunks (reference
    # velocity/scheduler.py:222-249 preemption; None disables).  The
    # preempted request re-queues at the back with its generated tokens as
    # a teacher-forced prompt extension (no work lost), giving round-robin
    # time slices under contention.
    preempt_after_chunks: Optional[int] = None
    # starvation bound for STREAMING saturation: at most this many
    # device-streaming (stream_hiddens_dev) slots run concurrently; further
    # streaming requests queue (order preserved) while non-streaming work
    # admits past them.  Complements preemption: a long stream becomes
    # unpreemptable once its resume prompt outgrows the prefill bucket, so
    # without a cap a streaming-majority mix could hold every slot forever
    # (reference fairness via preemption, velocity/scheduler.py:222-249).
    # None = no cap.
    max_stream_slots: Optional[int] = None

    def __post_init__(self):
        # the packed per-chunk id transfer carries at most chunk_steps_max
        # ids per slot; a longer scheduling quantum would silently truncate
        # the host-side id accumulator (see decode_chunk/_ingest)
        if self.chunk_steps > self.chunk_steps_max:
            raise ValueError(
                f"chunk_steps ({self.chunk_steps}) must be <= "
                f"chunk_steps_max ({self.chunk_steps_max})")

    @property
    def cache_len(self) -> int:
        # rounded up to a multiple of 8 (Pallas DMA sublane alignment); the
        # extra slots are never written
        raw = self.max_prompt_len + self.max_new_tokens
        return ((raw + 7) // 8) * 8

    @property
    def buckets(self) -> tuple:
        bs = self.prompt_buckets or (self.max_prompt_len,)
        if any(b > self.max_prompt_len for b in bs):
            raise ValueError("prompt bucket exceeds max_prompt_len")
        return tuple(sorted(bs))


@dataclass
class EngineRequest:
    """One queued generation request."""

    request_id: str
    ids: np.ndarray              # (T0, num_vq) int32 prompt (unpadded)
    text_mask: np.ndarray        # (T0,) bool
    temperature: np.ndarray      # (num_vq,) or (1,)
    top_p: float = 0.7
    top_k: int = 20
    repetition_penalty: float = 1.0
    min_new: int = 0
    max_new: int = 2048
    eos_token: Optional[int] = None  # text mode: per-request EOS override
    spk_vec: Optional[np.ndarray] = None
    seed: Optional[int] = None   # per-request determinism (manual_seed)
    ensure_non_empty: bool = True  # retry on immediate EOS (gpt.py:527-570)
    # streaming callback: fn(request_id, new_ids, new_hiddens, finished)
    on_tokens: Optional[Callable] = None
    # device-resident streaming (the velocity fork's hiddens-in-outputs
    # purpose, sequence.py:84-88, kept ON DEVICE): ``on_tokens`` receives
    # the request's FULL cumulative (max_new, D) device hiddens row (rows
    # beyond the kept count are garbage; track length via the id counts)
    # instead of a host increment - the consumer vocodes windows on device
    # and only PCM crosses the host link.  Preemption-by-recompute is
    # allowed: the resume prefill re-scatters the teacher-forced prefix's
    # hiddens into the new slot's buffer (GLOBAL positions), so post-resume
    # snapshots stay position-aligned.  Tokens are exact across a resume;
    # the prefix hiddens are recomputed (prefill vs step numerics differ by
    # bf16 reduction order), so conv context near the seam can drift by
    # float epsilon.
    stream_hiddens_dev: bool = False
    # host progress hook fn(done_steps), fired from harvest every chunk
    # (rides the existing per-chunk status read; show_tqdm support)
    on_progress: Optional[Callable] = None
    arrival: float = field(default_factory=time.monotonic)
    # -- internal (engine-managed) ---------------------------------------
    _attempts: int = 0           # ensure_non_empty retries so far
    _resume_ids: Optional[np.ndarray] = None      # (n, num_vq) generated
    _emitted: int = 0            # tokens already streamed via on_tokens
    _admit_t: float = 0.0        # first admission time (latency stats)
    _first_done: bool = False    # admit->first-emission already recorded

    @property
    def resume_len(self) -> int:
        return 0 if self._resume_ids is None else self._resume_ids.shape[0]


@dataclass
class EngineOutput:
    request_id: str
    ids: np.ndarray              # (T, num_vq) or (T,) generated tokens
    hiddens: Optional[np.ndarray]  # (T, D) host copy, or None (see below)
    finish_reason: str           # "eos" | "length"
    metrics: Dict[str, float] = field(default_factory=dict)
    # device-resident (T, D) hiddens: non-streaming requests keep their
    # hiddens ON DEVICE (the only consumer is the jitted mel decoder, and
    # a host round trip of (T, 768) f32 costs more than the decode);
    # ``dev_hiddens()``/``host_hiddens()`` materialize on demand
    hiddens_dev: Optional[jax.Array] = None
    # shared-batch reference: harvest gathers ALL slots finishing in one
    # chunk with a SINGLE device op (per-slot eager slices each cost a
    # dispatch round trip); this row view materializes lazily
    _hb: Optional[jax.Array] = None   # (W, max_new, D) shared gather
    _hb_row: int = 0
    _hb_n: int = 0

    def dev_hiddens(self) -> Optional[jax.Array]:
        """Per-request (T, D) device hiddens (materializes the shared-batch
        row on first access)."""
        if self.hiddens_dev is None and self._hb is not None:
            self.hiddens_dev = self._hb[self._hb_row, : self._hb_n]
        return self.hiddens_dev

    def host_hiddens(self) -> Optional[np.ndarray]:
        if self.hiddens is None and self.dev_hiddens() is not None:
            self.hiddens = np.asarray(self.hiddens_dev)
        return self.hiddens


def outputs_to_generation(outs: List["EngineOutput"]):
    """Stack finished EngineOutputs into a GenerationOutputs batch.

    When every output kept its hiddens device-resident, the batch stays on
    device (hiddens_dev + end_dev) and feeds the device decode path
    directly - no host round trip of the hidden states.  Outputs that share
    one harvest gather reuse it: the whole batch costs ONE device slice (or
    one take + slice when the order differs) instead of a pad+stack per
    output."""
    from .generate import GenerationOutputs

    finished = np.asarray([o.finish_reason == "eos" for o in outs])
    if outs and all(o.hiddens_dev is not None or o._hb is not None
                    for o in outs):
        lens = [o._hb_n if o.hiddens_dev is None else o.hiddens_dev.shape[0]
                for o in outs]
        n_max = max(lens)
        if n_max:
            hb0 = outs[0]._hb
            if hb0 is not None and all(o._hb is hb0 for o in outs):
                rows = [o._hb_row for o in outs]
                hb = (hb0 if rows == list(range(hb0.shape[0]))
                      else jnp.take(hb0, jnp.asarray(rows), axis=0))
                if hb.shape[1] != n_max:
                    hb = hb[:, :n_max]
                # rows beyond a request's own length hold garbage from the
                # generation buffer; end_dev masks them in the decode
                return GenerationOutputs(
                    ids=[o.ids for o in outs], hiddens=[], finished=finished,
                    hiddens_dev=hb, end_dev=jnp.asarray(lens, jnp.int32))
            hb = jnp.stack([
                jnp.pad(o.dev_hiddens(),
                        ((0, n_max - o.dev_hiddens().shape[0]), (0, 0)))
                for o in outs])
            return GenerationOutputs(
                ids=[o.ids for o in outs], hiddens=[], finished=finished,
                hiddens_dev=hb, end_dev=jnp.asarray(lens, jnp.int32))
    return GenerationOutputs(
        ids=[o.ids for o in outs],
        hiddens=[o.host_hiddens() for o in outs],
        finished=finished)


class SlotState(NamedTuple):
    """Device-side engine state; one entry per slot along the S axis."""

    cache: KVCache               # (L, S, Tc, H, Dh)
    ids: jnp.ndarray             # (S, Tc, num_vq)
    key_valid: jnp.ndarray       # (S, Tc)
    hidden: jnp.ndarray          # (S, D) last hidden (produces next token)
    cur: jnp.ndarray             # (S,) next write slot
    pos_next: jnp.ndarray        # (S,) rope position of next token
    step_in: jnp.ndarray         # (S,) tokens generated so far
    active: jnp.ndarray          # (S,) slot is live
    finish: jnp.ndarray          # (S,) sequence hit EOS / length
    end_idx: jnp.ndarray         # (S,) kept tokens (pre-EOS)
    hiddens: jnp.ndarray         # (S, max_new, D) or (S, 1, 1) when disabled
    temperature: jnp.ndarray     # (S, num_vq)
    top_p: jnp.ndarray           # (S,)
    top_k: jnp.ndarray           # (S,)
    rep_penalty: jnp.ndarray     # (S,)
    min_new: jnp.ndarray         # (S,) GLOBAL bound (vs seq_off + step_in)
    max_new: jnp.ndarray         # (S,) GLOBAL bound
    eos: jnp.ndarray             # (S,) per-slot EOS token id
    seq_off: jnp.ndarray         # (S,) tokens generated BEFORE this slot
    #                              tenure (preemption-by-recompute resume)
    rng: jax.Array               # (S, 2) uint32 per-slot keys: sampling for
    #                              a slot depends only on its own key/depth


def _threefry2x32_host(key: tuple, count: tuple) -> np.ndarray:
    """numpy threefry-2x32: bit-identical to jax's on-device block.

    Plain-int arithmetic masked to 32 bits; pinned against jax in
    test_engine.py (host_slot_key golden)."""
    m = 0xFFFFFFFF
    ks0, ks1 = int(key[0]) & m, int(key[1]) & m
    ks = (ks0, ks1, ks0 ^ ks1 ^ 0x1BD11BDA)
    x0, x1 = (int(count[0]) + ks0) & m, (int(count[1]) + ks1) & m
    rotations = ((13, 15, 26, 6), (17, 29, 16, 24))
    for i in range(5):
        for r in rotations[i % 2]:
            x0 = (x0 + x1) & m
            x1 = ((x1 << r) | (x1 >> (32 - r))) & m
            x1 ^= x0
        x0 = (x0 + ks[(i + 1) % 3]) & m
        x1 = (x1 + ks[(i + 2) % 3] + i + 1) & m
    return np.asarray([x0, x1], np.uint32)


def _host_slot_key(seed: int, attempt: int) -> np.ndarray:
    """Per-request slot RNG key, derived ENTIRELY on the host.

    MUST equal jax.random.key_data(fold_in(PRNGKey(seed), attempt)) bit
    for bit: the generator derives its per-row keys the same way, and the
    engine/generator paths are pinned token-exact against each other
    (wire tests, long-prompt fallback).  Deriving it WITH jax cost
    per-request device dispatches plus a BLOCKING device->host read each
    - ~200 ms of an 8-request admission wave over this host link - so we
    run the same threefry math on the host: PRNGKey(seed) = [hi, lo] of
    the seed; fold_in(key, d) = threefry2x32(key, [0, d])."""
    return _threefry2x32_host(
        ((int(seed) >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF), (0, attempt))


def _init_state(cfg: GPTConfig, ecfg: EngineConfig, seed: int,
                fused: bool = False, kvb: int = 0) -> SlotState:
    S, Tc = ecfg.max_num_seqs, ecfg.cache_len
    D = cfg.hidden_size
    HD = cfg.num_attention_heads * cfg.head_dim
    L = cfg.num_hidden_layers
    hshape = (S, ecfg.max_new_tokens, D) if ecfg.collect_hidden else (S, 1, 1)
    if fused:
        # flat stacked layout for the whole-step megakernel's manual DMA;
        # kvb = quantized rows + embedded scales (ops/pallas_step
        # kv8_/kv4_quantize), cache length padded to the 32-row int8
        # append-window alignment
        if kvb:
            from ..ops.pallas_step import KV_PAD

            QW = HD // 2 if kvb == 4 else HD
            Tc8 = ((Tc + 31) // 32) * 32
            cache = (jnp.zeros((L, S, Tc8, QW + KV_PAD), jnp.int8),
                     jnp.zeros((L, S, Tc8, QW + KV_PAD), jnp.int8))
        else:
            cache = (jnp.zeros((L, S, Tc, HD), jnp.bfloat16),
                     jnp.zeros((L, S, Tc, HD), jnp.bfloat16))
    else:
        cache = KVCache.create(cfg, S, Tc)
    return SlotState(
        cache=cache,
        ids=jnp.zeros((S, Tc, cfg.num_vq), jnp.int32),
        key_valid=jnp.zeros((S, Tc), jnp.bool_),
        hidden=jnp.zeros((S, D), jnp.float32),
        cur=jnp.full((S,), ecfg.max_prompt_len, jnp.int32),
        pos_next=jnp.zeros((S,), jnp.int32),
        step_in=jnp.zeros((S,), jnp.int32),
        active=jnp.zeros((S,), jnp.bool_),
        finish=jnp.zeros((S,), jnp.bool_),
        end_idx=jnp.zeros((S,), jnp.int32),
        hiddens=jnp.zeros(hshape, jnp.float32),
        temperature=jnp.ones((S, cfg.num_vq), jnp.float32),
        top_p=jnp.ones((S,), jnp.float32),
        top_k=jnp.zeros((S,), jnp.int32),
        rep_penalty=jnp.ones((S,), jnp.float32),
        min_new=jnp.zeros((S,), jnp.int32),
        max_new=jnp.full((S,), ecfg.max_new_tokens, jnp.int32),
        eos=jnp.zeros((S,), jnp.int32),
        seq_off=jnp.zeros((S,), jnp.int32),
        rng=jnp.stack([jax.random.key_data(jax.random.PRNGKey(seed + i))
                       for i in range(S)]).astype(jnp.uint32),
    )


def _state_specs(cfg: GPTConfig, ecfg: EngineConfig):
    """PartitionSpec tree matching SlotState: slots over dp, heads over tp."""
    from jax.sharding import PartitionSpec as P

    L = cfg.num_hidden_layers
    return SlotState(
        cache=KVCache(tuple(P("dp", None, "tp", None) for _ in range(L)),
                      tuple(P("dp", None, "tp", None) for _ in range(L))),
        ids=P("dp", None, None),
        key_valid=P("dp", None),
        hidden=P("dp", None),
        cur=P("dp"),
        pos_next=P("dp"),
        step_in=P("dp"),
        active=P("dp"),
        finish=P("dp"),
        end_idx=P("dp"),
        hiddens=P("dp", None, None),
        temperature=P("dp", None),
        top_p=P("dp"),
        top_k=P("dp"),
        rep_penalty=P("dp"),
        min_new=P("dp"),
        max_new=P("dp"),
        eos=P("dp"),
        seq_off=P("dp"),
        rng=P("dp", None),
    )


# ---------------------------------------------------------------------------
# jitted kernels (built per (cfg, ecfg) pair)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _build_kernels(cfg: GPTConfig, ecfg: EngineConfig, fused: bool = False,
                   kvb: int = 0, sharded: bool = False):
    # ``sharded`` is cache-key-only: mesh engines must NOT share a prefill
    # dict with single-chip ones — Engine.warmup's _aot_compile replaces
    # the dict's retrace-capable jit wrappers with jax.stages.Compiled
    # executables specialized to unsharded arguments, which cannot retrace
    # for mesh-sharded state.
    S, Tp, Tc = ecfg.max_num_seqs, ecfg.max_prompt_len, ecfg.cache_len
    num_vq = cfg.num_vq
    HD = cfg.num_attention_heads * cfg.head_dim
    infer_text = ecfg.infer_text
    eos_token = (ecfg.text_eos_token if infer_text
                 else cfg.num_audio_tokens - 1)
    max_penalized = (cfg.num_text_tokens if infer_text
                     else cfg.num_audio_tokens - 1)

    def make_prefill(Tpb: int, W: int):
        """Wave prefill: W prompts of bucket Tpb in ONE jitted call.

        The prompt occupies cache slots [Tp - Tpb, Tp); everything below
        stays padding.  The host packs the whole admission wave into TWO
        uploads (one int32, one float32) and dispatches once - per-request
        dispatches (and per-array uploads) cost a host-link round trip
        each (~tens of ms over this tunnel), which dominated admission
        before batching.  Waves smaller than W pad by REPEATING row 0
        (identical values written to the same slot index are
        order-independent).

        ``ints`` = [slots (W,) | keys (W, 2) bitcast | tok (W, Tpb,
        num_vq + 2) = ids|attn|tmask], ``floats`` = [spk (W, D) | scal
        (W, 9 + num_vq) = spk_emb_ids, top_p, top_k, rep, min_new,
        max_new, eos, seq_off, has_spk, temp...].
        """
        off = Tp - Tpb
        L = cfg.num_hidden_layers
        D = cfg.hidden_size

        def prefill_wave(gp, ep, packed, st: SlotState, ints,
                         floats) -> SlotState:
            nvq = cfg.num_vq
            slots = ints[:W]
            keys = lax.bitcast_convert_type(
                ints[W : 3 * W].reshape(W, 2), jnp.uint32)
            tok = ints[3 * W :].reshape(W, Tpb, nvq + 2)
            spk = floats[: W * D].reshape(W, D)
            scal = floats[W * D :].reshape(W, 9 + nvq)
            ids = tok[:, :, :nvq]
            attn = tok[:, :, nvq] != 0
            tmask = tok[:, :, nvq + 1] != 0
            spk_emb_ids = scal[:, 0].astype(jnp.int32)
            top_p = scal[:, 1]
            top_k = scal[:, 2].astype(jnp.int32)
            rep = scal[:, 3]
            min_new = scal[:, 4].astype(jnp.int32)
            max_new = scal[:, 5].astype(jnp.int32)
            eos = scal[:, 6].astype(jnp.int32)
            seq_off = scal[:, 7].astype(jnp.int32)
            has_spk = scal[:, 8]
            temp = scal[:, 9:9 + nvq]
            emb = embed_mod.embed_prompt(ep, ids, tmask)
            nvec = spk / jnp.maximum(
                jnp.linalg.norm(spk, axis=-1, keepdims=True), 1e-12)
            cond = ((ids[..., 0] == spk_emb_ids[:, None])
                    & (has_spk[:, None] > 0))[..., None]
            emb = jnp.where(cond, nvec[:, None, :].astype(emb.dtype), emb)
            positions = jnp.maximum(
                jnp.cumsum(attn.astype(jnp.int32), axis=1) - 1, 0)
            mini_cache = KVCache.create(cfg, W, Tpb)
            hidden_all, mini_cache = llama.prefill(
                gp, emb, attn, positions, mini_cache, cfg)

            if fused:
                kc, vc = st.cache
                # a single advanced index keeps its axis IN PLACE, so the
                # scatter value is (L, W, Tpb, HD)
                mk = jnp.stack(mini_cache.k, axis=0).reshape(L, W, Tpb, HD)
                mv = jnp.stack(mini_cache.v, axis=0).reshape(L, W, Tpb, HD)
                if kvb:
                    # quantize at the prefill -> decode boundary; appended
                    # rows use the same scheme in-kernel
                    from ..ops.pallas_step import kv4_quantize, kv8_quantize

                    quant = kv4_quantize if kvb == 4 else kv8_quantize
                    mk = quant(mk, cfg)
                    mv = quant(mv, cfg)
                kc = kc.at[:, slots, off:off + Tpb].set(mk)
                vc = vc.at[:, slots, off:off + Tpb].set(mv)
                cache = (kc, vc)
            else:
                cache = KVCache(
                    tuple(ck.at[slots, off:off + Tpb].set(mk)
                          for ck, mk in zip(st.cache.k, mini_cache.k)),
                    tuple(cv.at[slots, off:off + Tpb].set(mv)
                          for cv, mv in zip(st.cache.v, mini_cache.v)),
                )
            ids_pad = jnp.pad(ids, ((0, 0), (off, Tc - Tp), (0, 0)))
            kv_pad = jnp.pad(attn, ((0, 0), (off, Tc - Tp)))
            if ecfg.collect_hidden:
                # preemption-resume: the hiddens buffer uses GLOBAL token
                # positions, so re-seed [0, seq_off) with the teacher-forced
                # prefix's hiddens, recomputed by this very prefill.  The
                # producer of generated token j sits at prompt position
                # Tpb - seq_off + j - 1 (resume tokens are the prompt tail).
                # Rows >= seq_off zero (rewritten as decode progresses or
                # masked by end counts).  Fresh admissions (seq_off == 0)
                # just clear the reused slot's stale rows.
                Hp = min(Tpb, ecfg.max_new_tokens)
                jr = jnp.arange(Hp)
                src = jnp.clip(Tpb - seq_off[:, None] - 1 + jr[None, :],
                               0, Tpb - 1)
                prefix = jnp.take_along_axis(
                    hidden_all, src[:, :, None], axis=1)
                prefix = jnp.where(
                    (jr[None, :] < seq_off[:, None])[:, :, None],
                    prefix.astype(st.hiddens.dtype), 0.0)
                new_hiddens = st.hiddens.at[slots, :Hp].set(prefix)
            else:
                new_hiddens = st.hiddens
            return st._replace(
                cache=cache,
                ids=st.ids.at[slots].set(ids_pad),
                key_valid=st.key_valid.at[slots].set(kv_pad),
                hiddens=new_hiddens,
                hidden=st.hidden.at[slots].set(
                    hidden_all[:, -1].astype(st.hidden.dtype)),
                cur=st.cur.at[slots].set(Tp),
                pos_next=st.pos_next.at[slots].set(
                    attn.astype(jnp.int32).sum(axis=1)),
                step_in=st.step_in.at[slots].set(0),
                active=st.active.at[slots].set(True),
                finish=st.finish.at[slots].set(False),
                end_idx=st.end_idx.at[slots].set(0),
                temperature=st.temperature.at[slots].set(temp),
                top_p=st.top_p.at[slots].set(top_p),
                top_k=st.top_k.at[slots].set(top_k),
                rep_penalty=st.rep_penalty.at[slots].set(rep),
                min_new=st.min_new.at[slots].set(min_new),
                max_new=st.max_new.at[slots].set(max_new),
                eos=st.eos.at[slots].set(eos),
                seq_off=st.seq_off.at[slots].set(seq_off),
                rng=st.rng.at[slots].set(keys),
            )

        return jax.jit(prefill_wave, donate_argnums=(3,))

    def step_body(carry):
        st, gp, ep, packed, _ = carry
        live = st.active & ~st.finish  # (S,)
        gstep = st.seq_off + st.step_in  # global generated count per slot

        # per-slot keys folded by global depth: a slot's draws depend only on
        # its own (seed, depth), never on co-resident slots or engine history
        sub_slot = jax.vmap(jax.random.fold_in)(st.rng, gstep)  # (S, 2)

        if infer_text:
            logits = embed_mod.head_text(ep, st.hidden)  # (S, Vt)
            N = S
            temp = st.temperature[:, 0]
            top_p, top_k = st.top_p, st.top_k
            rep = st.rep_penalty
            step_rows = gstep
            min_new_rows = st.min_new
            eos_rows = st.eos
            keys_rows = sub_slot
        else:
            logits = embed_mod.head_code(ep, st.hidden).reshape(
                S * num_vq, cfg.num_audio_tokens)
            N = S * num_vq
            temp = st.temperature.reshape(-1)
            top_p = jnp.repeat(st.top_p, num_vq)
            top_k = jnp.repeat(st.top_k, num_vq)
            rep = jnp.repeat(st.rep_penalty, num_vq)
            step_rows = jnp.repeat(gstep, num_vq)
            min_new_rows = jnp.repeat(st.min_new, num_vq)
            eos_rows = jnp.repeat(st.eos, num_vq)
            keys_rows = jax.vmap(jax.random.fold_in)(
                jnp.repeat(sub_slot, num_vq, axis=0),
                jnp.tile(jnp.arange(num_vq), S))

        # per-slot trailing window over GENERATED tokens: the generated
        # region starts at Tp - seq_off (a resumed request's prior tokens sit
        # at the tail of its prompt and stay visible to the penalty)
        start = jnp.clip(st.cur - REP_WINDOW, 0, Tc - REP_WINDOW)  # (S,)
        gather_pos = start[:, None] + jnp.arange(REP_WINDOW)[None, :]
        win = jnp.take_along_axis(
            st.ids, gather_pos[:, :, None], axis=1)  # (S, W, num_vq)
        wmask = ((gather_pos >= (Tp - st.seq_off)[:, None])
                 & (gather_pos < st.cur[:, None]))
        if infer_text:
            win_rows = win[:, :, 0]
            wmask_rows = wmask
        else:
            win_rows = win.transpose(0, 2, 1).reshape(N, REP_WINDOW)
            wmask_rows = jnp.repeat(wmask, num_vq, axis=0)

        sp = sampling.SamplingParams(
            temperature=temp, top_p=top_p, top_k=top_k,
            repetition_penalty=rep, min_new=min_new_rows)
        ids_next = sampling.sample(
            keys_rows, logits, sp, win_rows, wmask_rows, step_rows,
            eos_rows, max_penalized)

        if infer_text:
            token = jnp.broadcast_to(ids_next[:, None], (S, num_vq))
            eos_hit = ids_next == st.eos
        else:
            token = ids_next.reshape(S, num_vq)
            eos_hit = jnp.any(token == st.eos[:, None], axis=-1)

        # EOS drops the final token (reference end_idx semantics,
        # gpt.py:512-525,598-601); a length stop keeps it.
        eos_finish = live & eos_hit
        length_hit = (gstep + 1) >= st.max_new
        finish = st.finish | eos_finish | (live & length_hit)

        rows = jnp.arange(S)
        # only live slots write state
        ids = st.ids.at[rows, st.cur].set(
            jnp.where(live[:, None], token, st.ids[rows, st.cur]))
        key_valid = st.key_valid.at[rows, st.cur].set(
            st.key_valid[rows, st.cur] | live)
        if ecfg.collect_hidden:
            # GLOBAL position: buffer index == the request's generated-token
            # index even across preemption-resume (the prefill re-scatters
            # the teacher-forced prefix's hiddens at [0, seq_off)), so every
            # consumer - harvest windows, device-streaming snapshots, the
            # finish gather - indexes hiddens by global counts directly
            hid_pos = jnp.clip(st.seq_off + st.step_in, 0,
                               ecfg.max_new_tokens - 1)
            hiddens = st.hiddens.at[rows, hid_pos].set(
                jnp.where(live[:, None], st.hidden, st.hiddens[rows, hid_pos]))
        else:
            hiddens = st.hiddens
        end_idx = st.end_idx + (live & ~eos_finish).astype(jnp.int32)

        emb = (embed_mod.embed_text_step(ep, token[:, 0]) if infer_text
               else embed_mod.embed_code_step(ep, token))
        if fused:
            from ..ops.pallas_step import decode_step_fused

            lo = jnp.argmax(key_valid, axis=1).astype(jnp.int32)
            lo = jnp.where(jnp.any(key_valid, axis=1), lo, 0)
            x_out, kc, vc = decode_step_fused(
                packed, emb, st.cache[0], st.cache[1], st.cur, lo,
                st.pos_next, cfg=cfg)
            hidden = llama.rms_norm(x_out, gp["norm"], cfg.rms_norm_eps)
            cache = (kc, vc)
        else:
            hidden, cache = llama.decode_step(
                gp, emb, st.cache, st.cur, key_valid, st.pos_next, cfg)
        hidden = jnp.where(live[:, None], hidden, st.hidden)

        st = st._replace(
            cache=cache, ids=ids, key_valid=key_valid, hidden=hidden,
            cur=st.cur + live.astype(jnp.int32),
            pos_next=st.pos_next + live.astype(jnp.int32),
            step_in=st.step_in + live.astype(jnp.int32),
            finish=finish, end_idx=end_idx, hiddens=hiddens)
        return (st, gp, ep, packed, carry[4] + 1)

    def decode_chunk(gp, ep, packed, st: SlotState, n_steps):
        cur0 = st.cur  # per-slot write position at chunk entry

        def cond(carry):
            s = carry[0]
            return (carry[4] < n_steps) & jnp.any(s.active & ~s.finish)

        st, _, _, _, ran = lax.while_loop(
            cond, step_body, (st, gp, ep, packed, jnp.int32(0)))
        # ALL per-chunk host data rides ONE device->host transfer (the link
        # round trip dominates engine overhead otherwise): the per-slot
        # scheduling scalars AND the ids generated THIS chunk.  Shipping the
        # chunk's ids here (instead of slicing live state at harvest) means
        # harvest never blocks on in-flight speculative chunks - the status
        # read of chunk k stays consistent even while chunk k+1 computes.
        # Scalar row 6 carries the number of decode steps actually executed
        # (the loop exits early once every slot finishes).
        status = jnp.stack([
            st.finish.astype(jnp.int32), st.active.astype(jnp.int32),
            st.end_idx, st.step_in, st.max_new, st.seq_off,
            jnp.full_like(st.end_idx, ran)])
        Cmax = ecfg.chunk_steps_max
        gather_pos = jnp.clip(
            cur0[:, None] + jnp.arange(Cmax)[None, :], 0, Tc - 1)
        ids_new = jnp.take_along_axis(
            st.ids, gather_pos[:, :, None], axis=1)  # (S, Cmax, num_vq)
        flat = jnp.concatenate(
            [status.reshape(-1), ids_new.reshape(-1)])
        return st, flat

    # wave-size buckets (powers of two up to the slot count); jit wrappers
    # are lazy - only (bucket, wave) shapes actually admitted ever compile
    waves = tuple(w for w in (1, 2, 4, 8, 16, 32, 64) if w < S) + (S,)
    prefill_jits = {(b, w): make_prefill(b, w)
                    for b in ecfg.buckets for w in waves}
    chunk_jit = jax.jit(decode_chunk, donate_argnums=(3,))
    return prefill_jits, chunk_jit


# ---------------------------------------------------------------------------
# Host-side engine
# ---------------------------------------------------------------------------

# Per-slot state surgery helpers with TRACED indices, jitted once.  The
# eager spellings (``buf[s]``, ``mask.at[s].set(False)``) bake the Python
# int into the executable, so every new slot index / index-vector length
# mints a fresh compile - on this chip's remote compile service each costs
# ~0.5-1 s of blocked Engine.step, which a concurrent-serving client sees
# as a multi-second TTFA spike mid-deployment (the BENCH_r04 "service
# collapse": first-hit shapes, not chip weather).  Traced indices + the
# power-of-two padding below bound the compiled-shape population.


@jax.jit
def _slot_row(buf, i):
    """buf[i] for one traced slot index (one compile serves every slot)."""
    return buf[i]


@jax.jit
def _mask_off_one(mask, i):
    return mask.at[i].set(False)


@jax.jit
def _mask_off_rows(mask, rows):
    return mask.at[rows].set(False)


@jax.jit
def _gather_rows(buf, rows):
    return buf[rows]


@functools.partial(jax.jit, static_argnames=("n",))
def _gather_rows_prefix(buf, rows, n):
    return buf[rows, :n]


def _pow2ceil(n: int) -> int:
    """Smallest power of two >= n (>= 1)."""
    return 1 << max(n - 1, 0).bit_length()


def _pow2_pad(idx: List[int]) -> np.ndarray:
    """Pad an index list to the next power-of-two length by repeating its
    first entry.  Duplicate rows are harmless everywhere this is used
    (gathers re-read, scatters re-write the same value), and the padding
    caps the distinct compiled gather/scatter shapes at log2(slots)+1
    instead of one per occupancy count."""
    n = len(idx)
    return np.asarray(idx + [idx[0]] * (_pow2ceil(n) - n), np.int32)


def fused_slot_limit(cfg: GPTConfig) -> int:
    """Widest slot count the whole-step megakernel serves (0 = XLA step).

    The sharded (mesh) engine always keeps the XLA step, which pjit
    partitions (per-chip slot counts stay small under dp).  Single-chip,
    the gate default is 32 WITH a quantized KV cache (round 4): wide
    batches raise the kernel's scoped-VMEM limit (ops/pallas_step
    CompilerParams) and the int8-kv chunks halve the per-position VMEM
    cost - 32 x 384 fused kv8+w8 matches the 16-slot tier's aggregate
    throughput (~10.8k steps/s, alternating A/B ratio 0.998, PERF.md
    round 5) at 2x the concurrent capacity.  With a bf16 cache
    (CHATTTS_KV_INT8=0) the default falls back to 16: round 3 measured
    the bf16 fused kernel LOSING to XLA past 16 slots, and the wide
    justification was kv8-only (advisor r4).  Note the 32-slot XLA
    alternative cannot exist on one chip either way: its (S, T, H, Dh)
    cache lane-pads Dh 64 -> 128 (2.7x = 12.8 GB at 32 x 2560, XLA
    HBM-OOM report in PERF.md round 4).  ``CHATTTS_ENGINE_FUSED_SLOTS``
    overrides (e.g. 64 for the documented slot-count-over-throughput
    configuration with kv4)."""
    import os as _os

    from .generate import kv_quant_bits, use_fused_step

    if not use_fused_step(cfg):
        return 0
    return int(_os.environ.get("CHATTTS_ENGINE_FUSED_SLOTS",
                               "32" if kv_quant_bits(cfg) else "16"))


class Engine:
    """FCFS continuous-batching engine over the jitted slot state.

    ``step()`` = admit waiting requests into free slots (prefill) -> run one
    decode chunk -> harvest finished slots; mirrors LLMEngine.step()
    (velocity/llm_engine.py:637-665) without workers or RPC.
    """

    def __init__(self, cfg: GPTConfig, ecfg: EngineConfig, gpt_params: dict,
                 embed_params: dict, spk_emb_ids: int = 0, seed: int = 0,
                 mesh=None, packed=None):
        """``mesh``: optional jax.sharding.Mesh with ("dp", "tp") axes.

        When given, parameters shard over `tp` (heads/FFN) and the slot state
        over `dp` (slots are the request axis) - the multi-chip serving
        layout; XLA inserts the collectives.  ``max_num_seqs`` must divide by
        the dp size.
        """
        self.cfg = cfg
        self.ecfg = ecfg
        from .generate import kv_quant_bits

        self._fused = (mesh is None
                       and fused_slot_limit(cfg) >= ecfg.max_num_seqs)
        self._kvb = kv_quant_bits(cfg) if self._fused else 0
        self._kv8 = self._kvb == 8  # kept for probes/back-compat asserts
        self._packed = {}
        if self._fused:
            if packed is not None:
                # shared pre-packed slabs (see Generator.__init__): one
                # HBM copy serves every tier of the same weights
                self._packed = packed
            else:
                from .generate import step_int4, step_int8
                from ..ops.pallas_step import pack_step_params

                self._packed = pack_step_params(gpt_params, cfg,
                                                int8=step_int8(),
                                                int4=step_int4())
        self.state = _init_state(cfg, ecfg, seed, fused=self._fused,
                                 kvb=self._kvb)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import mesh as mesh_mod

            if ecfg.max_num_seqs % mesh.shape["dp"]:
                raise ValueError("max_num_seqs must divide dp size")
            gpt_params = mesh_mod.shard_params(
                gpt_params, mesh_mod.gpt_param_specs(cfg), mesh)
            embed_params = mesh_mod.shard_params(
                embed_params, mesh_mod.embed_param_specs(cfg), mesh)
            specs = _state_specs(cfg, ecfg)
            self.state = jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                self.state, specs)
        self.mesh = mesh
        self.gpt_params = gpt_params
        self.embed_params = embed_params
        self.spk_emb_ids = spk_emb_ids
        self._prefill, self._chunk = _build_kernels(
            cfg, ecfg, fused=self._fused, kvb=self._kvb,
            sharded=mesh is not None)
        self._wave_sizes = sorted({w for _, w in self._prefill})
        self.waiting: collections.deque[EngineRequest] = collections.deque()
        self.slots: List[Optional[EngineRequest]] = [None] * ecfg.max_num_seqs
        self._slot_chunks = [0] * ecfg.max_num_seqs
        self._status = None  # per-slot scalars from the last processed chunk
        self._spec = None    # packed device result of a dispatch-ahead chunk
        # host-side per-slot generated ids, accumulated from the per-chunk
        # deltas that ride the status transfer; harvest and preemption read
        # these instead of slicing live device state (which would block on
        # in-flight speculative chunks)
        Z = np.zeros((0, cfg.num_vq), np.int32)
        self._acc_ids: List[np.ndarray] = [Z] * ecfg.max_num_seqs
        self._entry_steps = [0] * ecfg.max_num_seqs
        self._host_rng = np.random.default_rng(seed ^ 0x5EED)
        # stats (reference logs every 5 s, llm_engine.py:667-740)
        self.stats = {"tokens_generated": 0, "requests_finished": 0,
                      "steps": 0, "prefills": 0}
        # latency observability (VERDICT r4 #7): submit->admit queue delay
        # and admit->first-emission, rolling windows so a production
        # collapse (TTFA ~= wall) is visible in stats, not just benches
        self._lat_queue: collections.deque = collections.deque(maxlen=512)
        self._lat_first: collections.deque = collections.deque(maxlen=512)
        self._last_log = time.monotonic()

    # -- public API ----------------------------------------------------

    def add_request(self, req: EngineRequest) -> None:
        limit = max(self.ecfg.buckets)
        if req.ids.shape[0] > limit:
            raise ValueError(
                f"prompt length {req.ids.shape[0]} exceeds engine "
                f"prompt capacity {limit}")
        self.waiting.append(req)

    def abort_request(self, request_id: str) -> Optional[EngineRequest]:
        """Drop a queued or running request (llm_engine.py:365-371).

        Mirrors ``interrupt`` for a single request: fires the final
        ``on_tokens(rid, None, None, True)`` notification so a streaming
        consumer blocked on this request unblocks, and returns the dropped
        request (None when unknown) so serving layers can fail its waiters.
        """
        req = None
        for i, r in enumerate(self.waiting):
            if r.request_id == request_id:
                del self.waiting[i]
                req = r
                break
        if req is None:
            for s, r in enumerate(self.slots):
                if r is not None and r.request_id == request_id:
                    self.slots[s] = None
                    self.state = self.state._replace(
                        active=_mask_off_one(self.state.active,
                                             jnp.int32(s)))
                    req = r
                    break
        if req is not None and req.on_tokens is not None:
            req.on_tokens(req.request_id, None, None, True)
        return req

    def has_unfinished(self) -> bool:
        return bool(self.waiting) or any(r is not None for r in self.slots)

    def interrupt(self) -> List[EngineRequest]:
        """Drain all queued and running requests (Chat.interrupt analog,
        reference core.py:272-273 / gpt.py:592).

        Returns the dropped requests so callers (the serving layer) can
        fail their waiters instead of leaving them blocked; streaming
        callbacks get a final ``finished=True`` notification.
        """
        dropped = list(self.waiting)
        self.waiting.clear()
        for s, r in enumerate(self.slots):
            if r is not None:
                self.slots[s] = None
                dropped.append(r)
        self._spec = None  # any in-flight chunk's status is now irrelevant
        self.state = self.state._replace(
            active=jnp.zeros_like(self.state.active))
        for r in dropped:
            if r.on_tokens is not None:
                r.on_tokens(r.request_id, None, None, True)
        return dropped

    def _dispatch_chunk(self, long_chunk: bool) -> jax.Array:
        chunk = self.ecfg.chunk_steps
        if (long_chunk and chunk < self.ecfg.chunk_steps_max
                and not self.waiting):
            # nothing to admit: amortize the per-chunk host sync.  The
            # caller's ``long_chunk`` carries the latency intent - callers
            # that stream to a live listener keep the short quantum, bulk
            # consumers (offline generate, the pipelined decode) accept
            # chunk_steps_max of scheduling latency
            chunk = self.ecfg.chunk_steps_max
        self.state, status = self._chunk(
            self.gpt_params, self.embed_params, self._packed, self.state,
            jnp.int32(chunk))
        for s, r in enumerate(self.slots):
            if r is not None:
                self._slot_chunks[s] += 1
        return status

    def step(self, long_chunk: bool = False) -> List[EngineOutput]:
        if self._spec is not None and all(r is None for r in self.slots):
            # the speculative chunk outlived its batch (all slots finished
            # or were aborted): it ran as a no-op - discard its status so
            # this step admits new work instead of processing a dead chunk
            self._spec = None
        if self._spec is None:
            self._maybe_preempt()
            self._admit()
            occ = sum(r is not None for r in self.slots)
            self.stats["peak_slots"] = max(
                self.stats.get("peak_slots", 0), occ)
            if not occ:
                return []
            status = self._dispatch_chunk(long_chunk)
        else:
            status = self._spec
            self._spec = None
        # dispatch-ahead: enqueue chunk k+1 BEFORE blocking on chunk k's
        # status so the read's host-link round trip (~25 ms here) hides
        # behind device compute.  Safe whenever no admission is pending:
        # chunk k's status AND its generated ids ride the same packed
        # transfer (no live-state reads), device writes are append-only
        # prefixes, and a speculative chunk dispatched after every slot
        # finished is a no-op (the jitted loop's cond fails).  A request
        # arriving mid-chunk waits at most one extra chunk for admission;
        # streaming consumers benefit the most - their per-chunk status
        # read hides behind the next chunk's compute.  EXCEPT host-hidden
        # streamers: their harvest does a blocking bulk hiddens read
        # against live state, which would wait out the in-flight chunk
        # k+1's compute - re-serializing the exact latency this hides and
        # delaying every token callback by a full chunk.
        if (self.ecfg.speculate and not self.waiting
                and any(r is not None for r in self.slots)
                and not (self.ecfg.collect_hidden and any(
                    r is not None and r.on_tokens is not None
                    and not r.stream_hiddens_dev for r in self.slots))
                # ALSO hold speculation while any device-streaming slot has
                # yet to emit its first window: the consumer's first window
                # vocode dispatches right after this harvest, and a
                # speculative chunk already in the device queue would delay
                # it by a full chunk's compute (~24 ms of the concurrent-
                # stream TTFA).  After first emissions, steady-state yields
                # want the status round trip hidden again - resume.
                and not any(r is not None and r.stream_hiddens_dev
                            and r.on_tokens is not None
                            and not r._first_done for r in self.slots)):
            self._spec = self._dispatch_chunk(long_chunk)
        self._ingest(np.asarray(status))  # ONE host read per chunk
        self.stats["steps"] += int(self._status[6, 0])
        return self._harvest()

    def _ingest(self, raw: np.ndarray) -> None:
        """Unpack a chunk's packed transfer: scheduling scalars + the ids
        generated in that chunk, appended to the per-slot host buffers."""
        S = self.ecfg.max_num_seqs
        Cmax = self.ecfg.chunk_steps_max
        nvq = self.cfg.num_vq
        self._status = raw[: 7 * S].reshape(7, S)
        deltas = raw[7 * S :].reshape(S, Cmax, nvq)
        step_in = self._status[3]
        for s, r in enumerate(self.slots):
            if r is None:
                continue
            ran = int(step_in[s]) - self._entry_steps[s]
            if ran > 0:
                self._acc_ids[s] = np.concatenate(
                    [self._acc_ids[s], deltas[s, :ran]])
                self._entry_steps[s] = int(step_in[s])

    def generate(self, requests: List[EngineRequest],
                 context=None) -> List[EngineOutput]:
        """Offline batch entry point (velocity/llm.py:122-180 analog).

        ``context``: optional Interrupt flag polled between chunks; when set,
        active work is drained and whatever finished is returned.
        """
        for r in requests:
            self.add_request(r)
        outputs: List[EngineOutput] = []
        while self.has_unfinished():
            if context is not None and context.get():
                self.interrupt()
                break
            outputs.extend(self.step(long_chunk=True))
        order = {r.request_id: i for i, r in enumerate(requests)}
        outputs.sort(key=lambda o: order.get(o.request_id, 1 << 30))
        return outputs

    def warmup(self) -> None:
        """Pre-execute every compiled surface a serving deployment hits.

        The vLLM analog captures CUDA graphs for all batch sizes at worker
        init (velocity/worker.py); here the lazily-compiled population is
        the (prompt bucket x wave size) prefill jits, the decode chunk, and
        the harvest's gather/scatter helpers.  On this chip the compile
        service is REMOTE: a first-hit shape inside Engine.step costs 1-13 s
        of blocked stepping (trace + cache-hit deserialization + first-
        execution load over the tunnel) - measured as the BENCH_r04
        "service collapse", where a mid-deployment admission wave of a new
        (bucket, wave) shape froze all concurrent streams for ~13 s while
        holding the serving mutex.  Running one dummy wave per combo at
        startup moves that cost out of the request path.

        Each wave: exactly ``w`` requests whose prompt lands in the target
        bucket, ``max_new=1`` (the chunk's while_loop exits after one
        step), device-streaming callbacks on up to ``max_stream_slots`` of
        them (warms the streaming harvest path) and plain outputs on the
        rest (warms the finish-gather path).

        Compiles run AHEAD of the dummy waves via the AOT path
        (``lower().compile()``) on a thread pool: the expensive leg is the
        REMOTE compile RPC (measured 6-15 s per prefill variant, GIL
        released while waiting), so 8-wide parallelism turns ~16 serial
        compiles into ~2 rounds.  The compiled executables then REPLACE
        the lazy jit wrappers (same signature, donation preserved) so the
        real serving path runs exactly what warmup loaded."""
        ecfg = self.ecfg
        nvq = self.cfg.num_vq
        if self.mesh is None:
            self._aot_compile()
        prev_len = 0
        for b in ecfg.buckets:
            plen = max(1, prev_len + 1)  # smallest length mapping to b
            prev_len = b
            for w in self._wave_sizes:
                cap = ecfg.max_stream_slots
                reqs = []
                for i in range(w):
                    stream = (self.ecfg.collect_hidden
                              and (cap is None or i < cap))
                    reqs.append(EngineRequest(
                        request_id=f"warmup-{b}-{w}-{i}",
                        ids=np.zeros((plen, nvq), np.int32),
                        text_mask=np.ones((plen,), bool),
                        temperature=np.ones((nvq,), np.float32),
                        min_new=1, max_new=1, seed=0,
                        on_tokens=(lambda *a: None) if stream else None,
                        stream_hiddens_dev=stream,
                        ensure_non_empty=False))
                self.generate(reqs)
        # the remaining one-compile helpers (abort/preempt scatter)
        _mask_off_one(self.state.active, jnp.int32(0))
        self.reset_stats()

    def _aot_compile(self, parallel: int = 8) -> None:
        """Ahead-of-time compile every prefill variant + the chunk fn,
        with the remote compile RPCs in flight concurrently."""
        from concurrent.futures import ThreadPoolExecutor

        def absify(tree):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.asarray(x).dtype), tree)

        gp_a, ep_a = absify(self.gpt_params), absify(self.embed_params)
        pk_a, st_a = absify(self._packed), absify(self.state)
        nvq = self.cfg.num_vq
        D = self.cfg.hidden_size
        lowered = {}
        for (Tpb, W), fn in self._prefill.items():
            if isinstance(fn, jax.stages.Compiled):
                continue  # shared kernel dict: another engine warmed it
            ints = jax.ShapeDtypeStruct((W * (3 + Tpb * (nvq + 2)),),
                                        jnp.int32)
            floats = jax.ShapeDtypeStruct((W * (D + 9 + nvq),), jnp.float32)
            # tracing is GIL-bound - serial; the compile RPC parallelizes
            lowered[(Tpb, W)] = fn.lower(gp_a, ep_a, pk_a, st_a, ints,
                                         floats)
        chunk_lowered = None
        if not isinstance(self._chunk, jax.stages.Compiled):
            chunk_lowered = self._chunk.lower(
                gp_a, ep_a, pk_a, st_a,
                jax.ShapeDtypeStruct((), jnp.int32))
        with ThreadPoolExecutor(max_workers=parallel) as ex:
            futs = {k: ex.submit(lo.compile) for k, lo in lowered.items()}
            cf = (ex.submit(chunk_lowered.compile)
                  if chunk_lowered is not None else None)
            for k, f in futs.items():
                self._prefill[k] = f.result()
            if cf is not None:
                self._chunk = cf.result()

    # -- internals -----------------------------------------------------

    def _prompt_arrays(self, req: EngineRequest):
        """Prompt + teacher-forced resume tokens (preemption recompute)."""
        if req._resume_ids is None:
            return req.ids, req.text_mask
        ids = np.concatenate([req.ids, req._resume_ids.astype(np.int32)])
        tmask = np.concatenate(
            [req.text_mask, np.zeros((req.resume_len,), bool)])
        return ids, tmask

    def _admit(self):
        """Admit waiting requests into free slots.

        The whole wave packs into TWO host->device uploads per prompt
        bucket (one int32 array [slots | keys | tok], one float32
        [spk | scal], unpacked inside the jit) and ONE wave-prefill
        dispatch: per-request dispatches each cost a host-link round trip
        (tens of ms over this tunnel) and dominated admission before
        batching (measured ~330 ms for an 8-request wave, vs ~60 ms
        batched).  Short waves pad to the next wave-size bucket by
        repeating row 0 (identical duplicate writes, order-independent).
        """
        ecfg = self.ecfg
        nvq = self.cfg.num_vq
        wave: List = []  # (slot, req, bucket)
        free = [s for s in range(ecfg.max_num_seqs) if self.slots[s] is None]
        cap = ecfg.max_stream_slots
        stream_live = sum(1 for r in self.slots
                          if r is not None and r.stream_hiddens_dev)
        deferred: List[EngineRequest] = []  # streamers past the cap
        fi = 0
        while fi < len(free) and self.waiting:
            req = self.waiting.popleft()
            if (cap is not None and req.stream_hiddens_dev
                    and stream_live >= cap):
                deferred.append(req)  # later non-streaming work admits past
                continue
            s = free[fi]
            fi += 1
            stream_live += bool(req.stream_hiddens_dev)
            pids, _ = self._prompt_arrays(req)
            Tpb = next(b for b in ecfg.buckets if b >= pids.shape[0])
            wave.append((s, req, Tpb))
        for r in reversed(deferred):  # preserve queue order at the front
            self.waiting.appendleft(r)
        for Tpb in sorted({b for _, _, b in wave}):
            group = [(s, r) for s, r, b in wave if b == Tpb]
            n = len(group)
            Wb = next(w for w in self._wave_sizes if w >= n)
            tok = np.zeros((Wb, Tpb, nvq + 2), np.int32)
            spk = np.zeros((Wb, self.cfg.hidden_size), np.float32)
            scal = np.zeros((Wb, 9 + nvq), np.float32)
            keys = np.zeros((Wb, 2), np.uint32)
            slots_arr = np.zeros((Wb,), np.int32)
            for i, (s, req) in enumerate(group):
                pids, ptmask = self._prompt_arrays(req)
                T0 = pids.shape[0]
                slots_arr[i] = s
                tok[i, Tpb - T0 :, :nvq] = pids
                tok[i, Tpb - T0 :, nvq] = 1
                tok[i, Tpb - T0 :, nvq + 1] = ptmask
                if req.spk_vec is not None:
                    spk[i] = req.spk_vec
                temp = np.asarray(req.temperature, np.float32)
                if temp.shape[0] != nvq:
                    temp = np.full((nvq,), float(temp[0]), np.float32)
                eos = (req.eos_token if req.eos_token is not None
                       else (ecfg.text_eos_token if ecfg.infer_text
                             else self.cfg.num_audio_tokens - 1))
                # per-request determinism: the slot key derives from the
                # request seed alone (retries fold the attempt index,
                # mirroring the reference's regenerate-with-advanced-RNG,
                # gpt.py:527-570); derived host-side - no device traffic
                seed = (req.seed if req.seed is not None
                        else int(self._host_rng.integers(1 << 31)))
                keys[i] = _host_slot_key(seed, req._attempts)
                scal[i] = np.concatenate([
                    [self.spk_emb_ids, req.top_p, req.top_k,
                     req.repetition_penalty, req.min_new,
                     min(req.max_new, ecfg.max_new_tokens), eos,
                     req.resume_len, 0.0 if req.spk_vec is None else 1.0],
                    temp])
            for i in range(n, Wb):  # pad rows: exact copies of row 0
                tok[i], spk[i], scal[i] = tok[0], spk[0], scal[0]
                keys[i], slots_arr[i] = keys[0], slots_arr[0]
            ints = np.concatenate(
                [slots_arr, keys.view(np.int32).ravel(), tok.ravel()])
            floats = np.concatenate([spk.ravel(), scal.ravel()])
            self.state = self._prefill[(Tpb, Wb)](
                self.gpt_params, self.embed_params, self._packed,
                self.state, jnp.asarray(ints), jnp.asarray(floats))
            for s, req in group:
                self.slots[s] = req
                self._slot_chunks[s] = 0
                self._acc_ids[s] = np.zeros((0, nvq), np.int32)
                self._entry_steps[s] = 0
                self.stats["prefills"] += 1
                if not req._admit_t:  # first admission only (not resumes)
                    req._admit_t = time.monotonic()
                    self._lat_queue.append(req._admit_t - req.arrival)

    def _maybe_preempt(self):
        """Starvation control: preempt-by-recompute the longest-remaining
        running slot once the queue is blocked (scheduler.py:222-249)."""
        pa = self.ecfg.preempt_after_chunks
        if pa is None or not self.waiting or self._status is None:
            return
        if any(r is None for r in self.slots):
            return
        finish, _, end_idx, step_in, _, seq_off = self._status[:6]
        max_bucket = max(self.ecfg.buckets)
        cands = []
        for s, req in enumerate(self.slots):
            if req is None or finish[s] or self._slot_chunks[s] < pa:
                continue
            gen = int(end_idx[s])
            resume_total = req.ids.shape[0] + int(seq_off[s]) + gen
            if resume_total > max_bucket:
                continue  # resume prompt would not fit; keep running
            remaining = req.max_new - int(seq_off[s]) - int(step_in[s])
            cands.append((remaining, s))
        if not cands:
            return
        _, s = max(cands)
        req = self.slots[s]
        gen = int(end_idx[s])
        # ids already live on the host (per-chunk packed transfer); hiddens
        # need NO capture - the resume prefill recomputes the teacher-forced
        # prefix's hiddens straight into the new slot's buffer (global
        # positions), so preemption costs zero device reads
        new_ids = self._acc_ids[s][:gen]
        prev = req._resume_ids
        req._resume_ids = (new_ids if prev is None
                           else np.concatenate([prev, new_ids]))
        self.slots[s] = None
        self.state = self.state._replace(
            active=_mask_off_one(self.state.active, jnp.int32(s)))
        # requeue at the BACK: the freed slot goes to the waiting head and
        # long requests round-robin in preempt_after_chunks time slices
        # (each admission runs at least that long, so progress is guaranteed)
        self.waiting.append(req)
        self.stats["preemptions"] = self.stats.get("preemptions", 0) + 1

    def _new_ids_slice(self, s: int, req: EngineRequest, lo: int, n: int
                       ) -> np.ndarray:
        """Generated ids [lo, n) in GLOBAL counts: stitches the stashed
        resume prefix (tokens generated before this slot tenure that were
        never streamed - a preemption can land between a token's generation
        and its emission) with this tenure's accumulated ids."""
        off = req.resume_len
        parts = []
        if lo < off:
            parts.append(req._resume_ids[lo:off].astype(np.int32))
        if n > off:
            parts.append(self._acc_ids[s][max(0, lo - off): n - off])
        if not parts:
            return np.zeros((0, self.cfg.num_vq), np.int32)
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def _harvest(self) -> List[EngineOutput]:
        st = self.state
        finish, active, end_idx, step_in, max_new, _ = self._status[:6]
        outputs: List[EngineOutput] = []
        freed: List[int] = []  # slots released this harvest
        # generated ids already live on the host (self._acc_ids, fed by the
        # per-chunk packed transfer); only host-streaming hiddens still need
        # a bulk device read - pre-scan WHICH slots and how much.  The
        # hiddens buffer uses GLOBAL positions (resume prefixes re-scattered
        # at prefill), so slicing indexes by global counts directly.
        def dev_hiddens_ok(req):
            # non-streaming and device-streaming requests keep hiddens ON
            # DEVICE (batched gather at finish) - including resumed ones
            # (the prefix lives in the buffer); only host-streaming
            # consumers need host windows
            return (self.ecfg.collect_hidden
                    and (req.on_tokens is None or req.stream_hiddens_dev))

        need_hid = 0
        need_rows: List[int] = []  # slots whose hiddens must cross to host
        for s, req in enumerate(self.slots):
            if req is None or not active[s]:
                continue
            off = req.resume_len
            need_s = 0
            if (req.on_tokens is not None and not req.stream_hiddens_dev
                    and off + step_in[s] > req._emitted):
                need_s = off + int(min(end_idx[s], step_in[s]))
            if finish[s] and not dev_hiddens_ok(req):
                need_s = max(need_s, off + int(end_idx[s]))
            if need_s:
                need_rows.append(s)
                need_hid = max(need_hid, need_s)
        hid_np = None
        hid_row = {}
        if need_rows and self.ecfg.collect_hidden:
            # ONE gather of ONLY the needing slots' windows (a full
            # (S, need, D) read taxed every host-streamer with the whole
            # engine's hiddens - a 16x overfetch at capacity shape);
            # prefix-stable even with a speculative chunk in flight (writes
            # append at positions >= the statused counts for live slots).
            # Rows pad to a power of two and the prefix length rounds up
            # likewise (<= 2x overfetch) so the gather's compiled-shape
            # population stays log-bounded instead of one per (occupancy,
            # progress) pair - each first-hit shape costs a ~0.5-1 s
            # remote compile that would stall Engine.step mid-serving.
            nb = min(_pow2ceil(need_hid), st.hiddens.shape[1])
            hid_np = np.asarray(_gather_rows_prefix(
                st.hiddens, jnp.asarray(_pow2_pad(need_rows)), nb))
            hid_row = {s: i for i, s in enumerate(need_rows)}
        dev_gather: List = []  # (output_index, slot, total) finishing slots
        for s, req in enumerate(self.slots):
            if req is None or not active[s]:
                continue
            off = req.resume_len  # tokens generated before this slot tenure
            if req.on_progress is not None:
                req.on_progress(off + int(step_in[s]))
            fin = bool(finish[s])
            # empty-generation retry decision, hoisted ABOVE the streaming
            # callback: a silently retried attempt must not emit its
            # finished=True notification (a streaming consumer would stop
            # listening while the engine regenerates unheard)
            total_fin = off + int(end_idx[s])
            will_retry = (fin and total_fin == 0
                          and total_fin < int(max_new[s])
                          and req.ensure_non_empty and req._attempts < 3)
            # streaming callback with newly generated tokens (global counts).
            # A finishing slot ALWAYS gets its final notification, even when
            # the chunk added no kept tokens (EOS on the chunk's first step
            # drops the token: n == emitted) - otherwise a consumer blocked
            # on finished=True waits forever.
            if (req.on_tokens is not None and not will_retry
                    and off + step_in[s] > req._emitted):
                n = off + int(min(end_idx[s], step_in[s]))
                lo = req._emitted
                if n > lo or fin:
                    new_ids = self._new_ids_slice(s, req, lo, n)
                    if not self.ecfg.collect_hidden:
                        new_hid = None
                    elif req.stream_hiddens_dev:
                        # FULL slot row (max_new, D), a fixed-shape device
                        # copy: materializes its own buffer before any later
                        # chunk/prefill rewrites the slot's rows (in-order
                        # device execution), and the single compiled shape
                        # avoids a per-length eager-dispatch compile every
                        # chunk.  Rows >= the request's kept count hold
                        # garbage; consumers track the true length from the
                        # id counts and mask beyond it.  Traced slot index:
                        # buf[s] would compile once PER SLOT (~0.5-1 s
                        # remote compiles stalling early serving steps).
                        new_hid = _slot_row(st.hiddens, jnp.int32(s))
                    else:
                        new_hid = (hid_np[hid_row[s], lo:n] if n > lo
                                   else np.zeros((0, st.hiddens.shape[-1]),
                                                 np.float32))
                    req.on_tokens(req.request_id, new_ids, new_hid, fin)
                    req._emitted = n
                    if not req._first_done:
                        req._first_done = True
                        self._lat_first.append(
                            time.monotonic() - req._admit_t)
            if not finish[s]:
                continue
            n = int(end_idx[s])
            seq = self._acc_ids[s][:n]
            if req._resume_ids is not None:
                seq = np.concatenate([req._resume_ids.astype(np.int32), seq])
            total = off + n
            out_ids = seq[:, 0].copy() if self.ecfg.infer_text else seq.copy()
            hid = hid_dev = None
            use_gather = False
            if self.ecfg.collect_hidden:
                if dev_hiddens_ok(req):
                    # device-resident: all slots finishing this chunk ride
                    # ONE batched gather enqueued below - it materializes
                    # its own buffer before the freed slots' rows can be
                    # rewritten (in-order device execution; the next
                    # prefill is enqueued strictly later), and one op
                    # replaces a per-slot dispatch round trip each
                    use_gather = True
                else:
                    hid = (hid_np[hid_row[s], :total].copy() if total
                           else np.zeros((0, st.hiddens.shape[-1]),
                                         np.float32))
            reason = "length" if total >= int(max_new[s]) else "eos"
            self.slots[s] = None
            freed.append(s)  # active flags clear in ONE batched scatter below
            if will_retry:
                # empty-generation retry: re-dispatch with the attempt index
                # folded into the key (reference regenerates recursively,
                # gpt.py:527-570)
                req._attempts += 1
                self.waiting.appendleft(req)
                self.stats["retries"] = self.stats.get("retries", 0) + 1
                continue
            if not req._first_done:  # non-streaming: first output IS the
                req._first_done = True  # first emission
                self._lat_first.append(time.monotonic() - req._admit_t)
            out = EngineOutput(
                request_id=req.request_id, ids=out_ids, hiddens=hid,
                hiddens_dev=hid_dev, finish_reason=reason,
                metrics={"gen_tokens": float(total),
                         "latency_s": time.monotonic() - req.arrival})
            if use_gather:
                dev_gather.append((len(outputs), s, total))
            outputs.append(out)
            # `total` counts resumed tokens too; they were never tallied at
            # preemption time, so this does not double count
            self.stats["tokens_generated"] += total
            self.stats["requests_finished"] += 1
        if freed:
            # one batched scatter for every slot released this harvest: the
            # per-slot ``.at[s].set`` eager dispatches each paid a ~3-8 ms
            # host-link round trip (device-trace finding: 8 finishing slots
            # cost ~25-40 ms of device idle in the harvest tail).  Power-of-
            # two padding (duplicate False writes are idempotent) bounds the
            # compiled scatter shapes.
            self.state = self.state._replace(
                active=_mask_off_rows(self.state.active,
                                      jnp.asarray(_pow2_pad(freed))))
        if dev_gather:
            hb = _gather_rows(
                st.hiddens,
                jnp.asarray(_pow2_pad([s for _, s, _ in dev_gather])))
            for row, (oi, _, n) in enumerate(dev_gather):
                outputs[oi]._hb = hb
                outputs[oi]._hb_row = row
                outputs[oi]._hb_n = n
        self._maybe_log()
        return outputs

    def latency_stats(self) -> Dict[str, float]:
        """Rolling-window latency percentiles (seconds): submit->admit
        queue delay and admit->first-emission.  The reference's analog is
        the 5 s throughput log (llm_engine.py:667-740); these two are the
        terms a concurrent-serving TTFA decomposes into, so a production
        collapse (first audio arriving at request end) is observable here
        rather than only in benches."""
        out: Dict[str, float] = {}
        for name, window in (("queue_delay", self._lat_queue),
                             ("first_emission", self._lat_first)):
            if window:
                v = np.sort(np.asarray(window, np.float64))
                out[f"{name}_p50_s"] = float(v[len(v) // 2])
                out[f"{name}_p90_s"] = float(v[(len(v) * 9) // 10])
                out[f"{name}_max_s"] = float(v[-1])
                out[f"{name}_n"] = len(v)
        return out

    def _maybe_log(self):
        now = time.monotonic()
        if now - self._last_log < 5.0:
            return
        self._last_log = now
        occ = sum(r is not None for r in self.slots)
        import logging

        lat = self.latency_stats()
        logging.getLogger(__name__).info(
            "engine: %d/%d slots, %d waiting, %d finished, %d tokens, "
            "queue p50 %.0f ms, first-emission p50 %.0f ms",
            occ, self.ecfg.max_num_seqs, len(self.waiting),
            self.stats["requests_finished"], self.stats["tokens_generated"],
            lat.get("queue_delay_p50_s", 0.0) * 1e3,
            lat.get("first_emission_p50_s", 0.0) * 1e3)

    def reset_stats(self) -> None:
        """Zero the counters and drop the latency windows, so production
        percentiles measure real traffic rather than warmup requests
        (``warmup``/``TTSService.warmup_stream`` call this when done).
        NOTE: defined at the END of this file on purpose — the persistent
        compile cache keys jaxprs by source location, so edits above the
        traced kernels re-pay their remote TPU compiles (CLAUDE.md)."""
        for k in self.stats:
            self.stats[k] = 0
        self.stats.pop("peak_slots", None)
        self._lat_queue.clear()
        self._lat_first.clear()
