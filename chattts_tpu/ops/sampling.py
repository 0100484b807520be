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
    freq = jnp.zeros((N, V), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(N)[:, None], window_ids.shape)
    ids = jnp.clip(window_ids, 0, V - 1)
    freq = freq.at[rows, ids].add(window_mask.astype(jnp.float32))
    if max_penalized < V:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        freq = jnp.where(col < max_penalized, freq, 0.0)
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
    eos_token: int,
    max_penalized: int,
) -> jnp.ndarray:
    """Full reference sampling chain; returns sampled ids (N,) int32.

    ``step`` may be a scalar (single generation) or per-row (N,) (continuous
    batching, where every sequence is at its own depth).
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
    scores = jnp.where(top_p_mask(scores, params.top_p), NEG_INF, scores)
    scores = jnp.where(top_k_mask(scores, params.top_k), NEG_INF, scores)
    eos_sup = jnp.broadcast_to(step < params.min_new, (scores.shape[0],))
    scores = scores.at[:, eos_token].set(
        jnp.where(eos_sup, NEG_INF, scores[:, eos_token])
    )
    return jax.random.categorical(rng, scores, axis=-1).astype(jnp.int32)
