"""HBM-cache Pallas decode kernel vs jnp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chattts_tpu.ops.pallas_decode import decode_attention_hbm


def _reference(q, ks, vs, kc, vc, lo, hi):
    B, T, H, Dh = kc.shape
    t_ids = np.arange(T)
    mask = (t_ids[None] >= lo[:, None]) & (t_ids[None] < hi[:, None])
    s = np.einsum("bhd,bthd->bht", q, kc.astype(np.float32)) / np.sqrt(Dh)
    s = np.where(mask[:, None, :], s, -1e30)
    ss = np.einsum("bhd,bhd->bh", q, ks)[..., None] / np.sqrt(Dh)
    full = np.concatenate([s, ss], -1)
    p = np.exp(full - full.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("bht,bthd->bhd", p[..., :T], vc.astype(np.float32))
    return o + p[..., T:] * vs


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_matches_reference_and_appends(rng, dtype):
    B, T, H, Dh = 3, 96, 4, 16
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    ks = rng.standard_normal((B, H, Dh)).astype(np.float32)
    vs = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    lo = np.array([0, 5, 2], np.int32)
    hi = np.array([40, 33, 17], np.int32)
    cur = hi.copy()

    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    o, k2, v2 = decode_attention_hbm(
        jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(kc, cdt), jnp.asarray(vc, cdt),
        jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(cur),
        t_chunk=32, interpret=True)

    ref = _reference(q, ks, vs, np.asarray(jnp.asarray(kc, cdt), np.float32),
                     np.asarray(jnp.asarray(vc, cdt), np.float32), lo, hi)
    tol = 2e-5 if dtype == np.float32 else 0.05
    np.testing.assert_allclose(np.asarray(o), ref, atol=tol, rtol=tol)

    # the current token's k/v were appended at cur, everything else intact
    k2 = np.asarray(k2, np.float32)
    v2 = np.asarray(v2, np.float32)
    for b in range(B):
        np.testing.assert_allclose(k2[b, cur[b]],
                                   np.asarray(jnp.asarray(ks[b], cdt),
                                              np.float32), atol=tol)
        np.testing.assert_allclose(v2[b, cur[b]],
                                   np.asarray(jnp.asarray(vs[b], cdt),
                                              np.float32), atol=tol)
        keep = np.arange(T) != cur[b]
        np.testing.assert_allclose(
            k2[b, keep],
            np.asarray(jnp.asarray(kc, cdt), np.float32)[b, keep], atol=tol)


def test_chunk_skipping_matches(rng):
    """Small hi: untouched chunks are skipped yet results stay exact."""
    B, T, H, Dh = 2, 128, 4, 16
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    ks = rng.standard_normal((B, H, Dh)).astype(np.float32)
    vs = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, T, H, Dh)).astype(np.float32)
    lo = np.zeros(B, np.int32)
    hi = np.array([3, 10], np.int32)
    o, _, _ = decode_attention_hbm(
        jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(kc),
        jnp.asarray(vc), jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(hi),
        t_chunk=32, interpret=True)
    ref = _reference(q, ks, vs, kc, vc, lo, hi)
    np.testing.assert_allclose(np.asarray(o), ref, atol=2e-5, rtol=1e-4)
