"""Fused on-device sampling: temperature, repetition penalty, top-p/top-k.

The reference samples on host every step through a chain of HF logits
processors (``ChatTTS/model/processors.py:6-58``, applied at
``ChatTTS/model/gpt.py:476-508``): divide by temperature, windowed repetition
penalty, TopP(min_keep=3), TopK(min_keep=3), optional EOS suppression, then a
multinomial draw.  Here the whole chain is one jit-compiled function over the
(N, V) logits batch - no host round-trip per token, which is the reference's
single biggest decode-loop cost (gpt.py:430-432 syncs logits to host-visible
memory as f32 every step).

Semantics match the reference processor by processor:

* repetition penalty counts token frequencies over the trailing 16 generated
  tokens only (processors.py:21-27; window passed in by the caller), scales
  negative scores by ``alpha`` and divides positive ones, and only penalizes
  columns below ``max_penalized`` (EOS is exempt in the code path);
* top-p replicates HF's ascending-sort formulation including min_tokens_to_keep;
* top-k keeps ties like HF (strict ``<`` threshold comparison).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


class SamplingParams(NamedTuple):
    """Dynamic (traced) sampling parameters.

    Every field is either a scalar (one generation call) or per-row (N,)
    (continuous batching: each sequence carries its own knobs).
    """

    temperature: jnp.ndarray  # (num_streams,) or (N,) f32
    top_p: jnp.ndarray        # () or (N,) f32
    top_k: jnp.ndarray        # () or (N,) i32
    repetition_penalty: jnp.ndarray  # () or (N,) f32 (1.0 disables)
    min_new: jnp.ndarray      # () or (N,) i32: suppress EOS while step < min_new


def repetition_penalty(
    scores: jnp.ndarray,       # (N, V) f32
    window_ids: jnp.ndarray,   # (N, W) int32 trailing generated tokens
    window_mask: jnp.ndarray,  # (N, W) bool: valid window entries
    penalty: jnp.ndarray,      # () or (N,) f32
    max_penalized: int,        # only columns < this are penalized
) -> jnp.ndarray:
    N, V = scores.shape
    W = window_ids.shape[1]
    # frequency count as a one-hot compare-reduce instead of a scatter-add:
    # TPU scatters serialize; this is W vectorized compares over (N, V)
    ids = jnp.clip(window_ids, 0, V - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W, V), 2)
    hits = (ids[:, :, None] == col) & window_mask[:, :, None]
    freq = hits.astype(jnp.float32).sum(axis=1)  # (N, V)
    if max_penalized < V:
        col2 = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        freq = jnp.where(col2 < max_penalized, freq, 0.0)
    pen = jnp.broadcast_to(jnp.asarray(penalty), (N,))[:, None]
    alpha = jnp.power(pen, freq)
    return jnp.where(scores < 0, scores * alpha, scores / alpha)


def top_p_mask(scores: jnp.ndarray, top_p: jnp.ndarray,
               min_keep: int = 3) -> jnp.ndarray:
    """HF TopPLogitsWarper: mask (True = remove), ascending-sort semantics."""
    N, V = scores.shape
    order = jnp.argsort(scores, axis=-1)  # ascending
    sorted_scores = jnp.take_along_axis(scores, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_scores, axis=-1), axis=-1)
    p = jnp.broadcast_to(jnp.asarray(top_p), (N,))[:, None]
    remove_sorted = cum <= (1.0 - p)
    keep_tail = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) >= V - min_keep
    remove_sorted = remove_sorted & ~keep_tail
    rows = jnp.broadcast_to(jnp.arange(N)[:, None], (N, V))
    remove = jnp.zeros((N, V), jnp.bool_).at[rows, order].set(remove_sorted)
    return remove


def top_k_mask(scores: jnp.ndarray, top_k: jnp.ndarray,
               min_keep: int = 3) -> jnp.ndarray:
    """HF TopKLogitsWarper: remove scores strictly below the k-th largest."""
    N, V = scores.shape
    k = jnp.clip(jnp.maximum(jnp.asarray(top_k), min_keep), 1, V)
    k = jnp.broadcast_to(k, (N,))[:, None]
    sorted_desc = jnp.sort(scores, axis=-1)[:, ::-1]
    kth = jnp.take_along_axis(sorted_desc, k - 1, axis=-1)
    return scores < kth


def sample(
    rng: jax.Array,
    logits: jnp.ndarray,        # (N, V) f32
    params: SamplingParams,
    window_ids: jnp.ndarray,    # (N, W)
    window_mask: jnp.ndarray,   # (N, W)
    step: jnp.ndarray,          # () i32 current generation step
    eos_token,
    max_penalized: int,
) -> jnp.ndarray:
    """Full reference sampling chain; returns sampled ids (N,) int32.

    ``step`` may be a scalar (single generation) or per-row (N,) (continuous
    batching, where every sequence is at its own depth).  ``eos_token`` may
    likewise be a scalar or per-row (N,).  ``rng`` is a single key, or
    per-row keys (N, 2): each row's draw then depends only on its own key,
    which is what makes continuous-batching slots deterministic under a
    per-request seed regardless of co-resident requests (manual_seed
    semantics, reference gpt.py:501-508).
    """
    temp = params.temperature
    if temp.ndim == 1 and temp.shape[0] != logits.shape[0]:
        # per-codebook temperatures tiled over the batch: (B*num_vq,)
        temp = jnp.tile(temp, logits.shape[0] // temp.shape[0])
    scores = logits / temp[:, None]
    rp = params.repetition_penalty
    if rp.ndim == 0:
        scores = jax.lax.cond(
            rp != 1.0,
            lambda s: repetition_penalty(
                s, window_ids, window_mask, rp, max_penalized),
            lambda s: s,
            scores,
        )
    else:  # per-row penalties: always apply (1.0 rows are a no-op)
        scores = repetition_penalty(
            scores, window_ids, window_mask, rp, max_penalized)

    # The whole filter chain runs in SORTED space off one ascending sort
    # (values + original indices in a single lax.sort - no gathers, no
    # scatters; TPU lowers both poorly).  Equivalent to top_p_mask then
    # top_k_mask for tie-free rows: top-p removes an ascending PREFIX, so
    # the masked row stays sorted and the k-th-largest threshold is a
    # positional read.
    N, V = scores.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, V), 1)
    s_asc, order = jax.lax.sort((scores, pos), dimension=-1, num_keys=1)

    # top-p (HF ascending semantics, min_tokens_to_keep=3)
    cum = jnp.cumsum(jax.nn.softmax(s_asc, axis=-1), axis=-1)
    p = jnp.broadcast_to(jnp.asarray(params.top_p), (N,))[:, None]
    keep_tail = pos >= V - 3
    s_asc = jnp.where((cum <= 1.0 - p) & ~keep_tail, NEG_INF, s_asc)

    # top-k (HF: strictly below the k-th largest goes; min_keep=3)
    k = jnp.clip(jnp.maximum(jnp.asarray(params.top_k), 3), 1, V)
    k = jnp.broadcast_to(k, (N,))[:, None]
    kth = jnp.sum(jnp.where(pos == V - k, s_asc, 0.0), axis=-1, keepdims=True)
    s_asc = jnp.where(s_asc < kth, NEG_INF, s_asc)

    # EOS suppression while step < min_new (applied after the warpers, as in
    # gpt.py:512-525); eos's sorted position found by comparing indices
    eos_sup = jnp.broadcast_to(step < params.min_new, (N,))
    eos_rows = jnp.broadcast_to(jnp.asarray(eos_token), (N,))
    s_asc = jnp.where(eos_sup[:, None] & (order == eos_rows[:, None]),
                      NEG_INF, s_asc)

    # categorical draw in sorted space, mapped back through `order`
    if rng.ndim == 2:  # per-row keys: categorical == argmax(logits + gumbel)
        g = jax.vmap(lambda k: jax.random.gumbel(k, (V,)))(rng)
        j = jnp.argmax(s_asc + g, axis=-1)
    else:
        j = jax.random.categorical(rng, s_asc, axis=-1)
    return jnp.sum(jnp.where(pos == j[:, None], order, 0),
                   axis=-1).astype(jnp.int32)
