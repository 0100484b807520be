"""Pallas decode-attention kernel vs reference jnp computation (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chattts_tpu.ops.pallas_attention import decode_attention


def _reference(q, k_self, v_self, k_cache, v_cache, lo, hi):
    B, T, H, Dh = k_cache.shape
    t_ids = np.arange(T)
    mask = (t_ids[None, :] >= lo[:, None]) & (t_ids[None, :] < hi[:, None])
    s = np.einsum("bhd,bthd->bht", q, k_cache) / np.sqrt(Dh)
    s = np.where(mask[:, None, :], s, -1e30)
    s_self = np.einsum("bhd,bhd->bh", q, k_self)[..., None] / np.sqrt(Dh)
    full = np.concatenate([s, s_self], axis=-1)
    p = np.exp(full - full.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    o = np.einsum("bht,bthd->bhd", p[..., :T], v_cache)
    o = o + p[..., T:] * v_self
    return o


@pytest.mark.parametrize("T", [64, 96])
def test_matches_reference(rng, T):
    B, H, Dh = 3, 4, 16
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    ks = rng.standard_normal((B, H, Dh)).astype(np.float32)
    vs = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    lo = np.array([0, 5, 2], np.int32)
    hi = np.array([T, 40, 17], np.int32)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(kc),
        jnp.asarray(vc), jnp.asarray(lo), jnp.asarray(hi),
        t_chunk=32, interpret=True)
    ref = _reference(q, ks, vs, kc, vc, lo, hi)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_empty_cache_range(rng):
    """hi == lo: only the self column contributes."""
    B, T, H, Dh = 2, 32, 4, 16
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    ks = rng.standard_normal((B, H, Dh)).astype(np.float32)
    vs = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    lo = np.zeros(B, np.int32)
    hi = np.zeros(B, np.int32)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(kc),
        jnp.asarray(vc), jnp.asarray(lo), jnp.asarray(hi),
        t_chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), vs, atol=2e-5)


def test_bf16_cache(rng):
    B, T, H, Dh = 2, 64, 4, 16
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    ks = rng.standard_normal((B, H, Dh)).astype(np.float32)
    vs = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    lo = np.zeros(B, np.int32)
    hi = np.full(B, T, np.int32)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(kc, jnp.bfloat16), jnp.asarray(vc, jnp.bfloat16),
        jnp.asarray(lo), jnp.asarray(hi), t_chunk=32, interpret=True)
    ref = _reference(q, ks, vs, kc, vc, lo, hi)
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.05, rtol=0.05)
