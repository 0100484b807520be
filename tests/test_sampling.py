"""Sampling-chain golden tests vs HF logits warpers and reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
from transformers.generation import TopKLogitsWarper, TopPLogitsWarper

from chattts_tpu.ops import sampling


def test_top_p_mask_matches_hf(rng):
    scores = rng.standard_normal((5, 40)).astype(np.float32) * 3
    warper = TopPLogitsWarper(0.7, min_tokens_to_keep=3)
    ref = warper(None, torch.tensor(scores)).numpy()
    mask = np.asarray(sampling.top_p_mask(jnp.asarray(scores), jnp.float32(0.7)))
    ours = np.where(mask, -np.inf, scores)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_top_k_mask_matches_hf(rng):
    scores = rng.standard_normal((5, 40)).astype(np.float32) * 3
    warper = TopKLogitsWarper(7, min_tokens_to_keep=3)
    ref = warper(None, torch.tensor(scores)).numpy()
    mask = np.asarray(sampling.top_k_mask(jnp.asarray(scores), jnp.int32(7)))
    ours = np.where(mask, -np.inf, scores)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_repetition_penalty_reference_semantics(rng):
    """Matches CustomRepetitionPenaltyLogitsProcessorRepeat (processors.py:6-35):
    count token freq over the window, alpha = penalty**freq, multiply negative
    scores / divide positive ones, only the first max_penalized columns."""
    V, W, penalty, max_pen = 20, 16, 1.4, 18
    scores = rng.standard_normal((3, V)).astype(np.float32)
    window = rng.integers(0, V, (3, W)).astype(np.int32)
    valid = rng.random((3, W)) > 0.3

    out = np.asarray(sampling.repetition_penalty(
        jnp.asarray(scores), jnp.asarray(window), jnp.asarray(valid),
        jnp.float32(penalty), max_pen))

    # torch reference computation
    freq = np.zeros((3, V), np.float32)
    for b in range(3):
        for w in range(W):
            if valid[b, w]:
                freq[b, window[b, w]] += 1
    freq[:, max_pen:] = 0
    alpha = penalty ** freq
    expected = np.where(scores < 0, scores * alpha, scores / alpha)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_sample_deterministic_and_min_new():
    V = 30
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, V)).astype(np.float32))
    sp = sampling.SamplingParams(
        temperature=jnp.ones((1,)), top_p=jnp.float32(1.0),
        top_k=jnp.int32(V), repetition_penalty=jnp.float32(1.0),
        min_new=jnp.int32(5))
    win = jnp.zeros((4, 16), jnp.int32)
    wm = jnp.zeros((4, 16), jnp.bool_)
    eos = V - 1
    key = jax.random.PRNGKey(0)
    a = sampling.sample(key, logits, sp, win, wm, jnp.int32(0), eos, V)
    b = sampling.sample(key, logits, sp, win, wm, jnp.int32(0), eos, V)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eos cannot be sampled while step < min_new, even with eos-only logits
    eos_logits = jnp.full((4, V), -100.0).at[:, eos].set(100.0)
    for step in range(5):
        got = sampling.sample(jax.random.PRNGKey(step), eos_logits, sp, win,
                              wm, jnp.int32(step), eos, V)
        assert not (np.asarray(got) == eos).any()
    got = sampling.sample(key, eos_logits, sp, win, wm, jnp.int32(5), eos, V)
    assert (np.asarray(got) == eos).all()


def test_fused_sample_respects_standalone_masks(rng):
    """The sorted-space fused chain in sample() must only ever draw tokens
    that survive the sequential top_p_mask -> top_k_mask path (the
    HF-golden-tested formulation)."""
    N, V = 6, 64
    logits = rng.standard_normal((N, V)).astype(np.float32) * 2
    sp = sampling.SamplingParams(
        temperature=jnp.ones((1,)), top_p=jnp.float32(0.6),
        top_k=jnp.int32(5), repetition_penalty=jnp.float32(1.0),
        min_new=jnp.int32(0))
    win = jnp.zeros((N, 16), jnp.int32)
    wm = jnp.zeros((N, 16), jnp.bool_)
    s = jnp.asarray(logits)
    s1 = jnp.where(sampling.top_p_mask(s, jnp.float32(0.6)), -np.inf, s)
    s2 = jnp.where(sampling.top_k_mask(s1, jnp.int32(5)), -np.inf, s1)
    kept = np.asarray(s2) > -np.inf
    for seed in range(30):
        got = np.asarray(sampling.sample(
            jax.random.PRNGKey(seed), s, sp, win, wm, jnp.int32(3), V - 1, V))
        assert all(kept[n, got[n]] for n in range(N))


def test_greedy_like_sampling():
    """top_k=1 reduces to argmax regardless of key."""
    logits = jnp.asarray(
        np.random.default_rng(1).standard_normal((6, 50)).astype(np.float32))
    sp = sampling.SamplingParams(
        temperature=jnp.ones((1,)), top_p=jnp.float32(0.005),
        top_k=jnp.int32(1), repetition_penalty=jnp.float32(1.0),
        min_new=jnp.int32(0))
    win = jnp.zeros((6, 16), jnp.int32)
    wm = jnp.zeros((6, 16), jnp.bool_)
    got = sampling.sample(jax.random.PRNGKey(3), logits, sp, win, wm,
                          jnp.int32(0), 0, 50)
    # min_tokens_to_keep=3 keeps 3 candidates; the argmax must be among them
    # and with top_k clamped to min_keep the top-3 survive; check top-1 is
    # always possible: probability mass concentrated after filtering.
    kept = np.argsort(np.asarray(logits), 1)[:, -3:]
    assert all(g in k for g, k in zip(np.asarray(got), kept))
