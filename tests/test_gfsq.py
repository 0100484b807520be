"""GFSQ correctness: index packing, FSQ round trips, embed/quantize shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from chattts_tpu.config import GFSQConfig
from chattts_tpu.models import gfsq

CFG = GFSQConfig()  # dim 1024, levels (5,5,5,5), G=2, R=2


def test_codebook_shape_and_range():
    cb = np.asarray(gfsq.codebook(CFG))
    assert cb.shape == (625, 4)
    # codes for level 5 live on {-1, -0.5, 0, 0.5, 1}
    assert set(np.unique(cb).tolist()) == {-1.0, -0.5, 0.0, 0.5, 1.0}


def test_index_packing_bijective():
    """digits -> index -> digits is the identity over all 625 codes."""
    cb = np.asarray(gfsq.codebook(CFG))
    basis = np.array([1, 5, 25, 125])
    digits = cb * 2 + 2  # back to {0..4}
    idx = (digits * basis).sum(-1).astype(int)
    np.testing.assert_array_equal(idx, np.arange(625))


def test_fsq_quantize_recovers_codebook():
    """Feeding (pre-tanh) values aiming at each code recovers its index."""
    cb = np.asarray(gfsq.codebook(CFG))  # normalized codes in [-1, 1]
    half_l = (5 - 1) * (1 + 1e-3) / 2
    targets = cb * 2  # integer grid {-2..2}
    z = np.arctanh(np.clip(targets / half_l, -0.999999, 0.999999))
    codes, idx = gfsq._fsq_quantize(jnp.asarray(z), CFG)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(625))
    np.testing.assert_allclose(np.asarray(codes), cb, atol=1e-6)


def test_embed_quantize_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    params = gfsq.init_params(key, CFG)
    ind = jax.random.randint(key, (2, 7, 4), 0, 625)
    feats = gfsq.embed(params, ind, CFG)
    assert feats.shape == (2, 7, 1024)
    ind2 = gfsq.quantize(params, feats, CFG)
    assert ind2.shape == (2, 7, 4)
    assert ind2.dtype == jnp.int32
    assert (np.asarray(ind2) >= 0).all() and (np.asarray(ind2) < 625).all()
    # jit parity
    feats_j = jax.jit(lambda p, i: gfsq.embed(p, i, CFG))(params, ind)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_j), atol=1e-6)


def test_residual_scales():
    s = gfsq._scales(CFG)
    np.testing.assert_allclose(s[0], np.ones(4))
    np.testing.assert_allclose(s[1], np.full(4, 0.25))


def test_residual_fsq_pinned_golden_vectors():
    """Cross-implementation exactness golden for the residual FSQ core.

    The literal expectations below were produced by an INDEPENDENT numpy
    implementation of vector_quantize_pytorch's ResidualFSQ algorithm
    (bound = tanh(z + shift)*half_l - offset with eps=1e-3, round-half-even,
    index = sum(digit * cumprod-basis), stage-r scale = (levels-1)^-r) -
    written separately from chattts_tpu.models.gfsq - and are pinned here as
    literals so any drift in bound/round/packing semantics fails loudly.
    Reference: ChatTTS/model/dvae.py:69-128 (GroupedResidualFSQ usage).

    PROVENANCE CAVEAT: both implementations were written by the same
    author from the same reading of the algorithm; this proves
    self-consistency, not equivalence with vector_quantize_pytorch (not
    installable in this environment).  The first true external anchor is
    tests/test_real_assets.py::test_real_assets_gfsq_round_trip, which
    runs the day a real asset tree is present (see README "Tests").
    """
    z = np.array([[-2.1357, 1.8956, -1.306, -0.3888],
                  [-0.113, -1.1113, -2.0517, 0.9733],
                  [0.5416, -2.9293, 3.5211, 1.4527]])
    expect_idx = np.array([[145, 395], [502, 256], [603, 602]])
    expect_emb = np.array([[-1.25, 1.25, -1.25, -0.375],
                           [-0.125, -1.125, -1.25, 1.0],
                           [0.5, -1.25, 1.25, 1.25]])

    # drive the residual loop exactly as quantize() does, sans projections
    scales = gfsq._scales(CFG)  # (R, 4)
    residual = jnp.asarray(z, jnp.float32)
    inds = []
    for r in range(CFG.residuals):
        codes, idx = gfsq._fsq_quantize(residual / scales[r], CFG)
        residual = residual - codes * scales[r]
        inds.append(np.asarray(idx))
    np.testing.assert_array_equal(np.stack(inds, -1), expect_idx)

    cb = np.asarray(gfsq.codebook(CFG))
    emb = sum(cb[expect_idx[:, r]] * scales[r] for r in range(CFG.residuals))
    np.testing.assert_allclose(emb, expect_emb, atol=1e-6)


def test_grouped_quantize_embed_pinned_golden():
    """Full quantize()/embed() path with pinned projection weights.

    Expectations from the same independent numpy implementation; both groups
    share the weights, so the [g0r0, g0r1, g1r0, g1r1] layout is covered.
    """
    from chattts_tpu.config import GFSQConfig

    cfg = GFSQConfig(dim=16, levels=(5, 5, 5, 5), groups=2, residuals=2)
    w_in = np.array([[-0.38, 0.451, -0.233, -0.03],
                     [0.394, -0.628, 0.288, 0.699],
                     [0.661, -0.15, 0.451, -0.811],
                     [-0.079, 0.225, -0.672, -0.041],
                     [0.862, 1.309, 0.389, 0.414],
                     [-0.479, -0.605, -0.706, 0.271],
                     [0.376, -0.329, -0.614, 0.129],
                     [0.156, -0.065, 0.635, -0.046]], np.float32)
    b_in = np.array([-0.007, -0.111, 0.014, 0.135], np.float32)
    w_out = np.array([[0.031, 0.035, 0.217, 0.139, 0.265, 0.268, 0.309, -0.398],
                      [0.15, -0.801, 0.133, -0.631, -0.036, 0.237, -0.207, 0.049],
                      [-0.82, -0.429, 0.344, -0.577, 0.325, -0.694, -0.454, -0.548],
                      [0.004, 0.267, -0.533, -0.091, 0.811, -0.159, -0.408, 0.193]],
                     np.float32)
    b_out = np.array([-0.022, -0.07, -0.18, 0.082, -0.057, 0.0, -0.106, 0.13],
                     np.float32)
    xg = np.array([[0.7479, 0.9809, -0.1104, 0.4679,
                    0.8906, 1.023, 0.3124, -0.0619],
                   [-0.3595, -0.7486, -0.9655, 0.36,
                    -0.2446, -1.9959, -0.1552, 1.0638]], np.float32)
    expect_idx_g = np.array([[538, 516], [247, 497]])
    expect_emb_g = np.array(
        [[0.628375, 0.4985, -1.00625, 0.37425,
          0.807875, 0.451875, -0.1855, 0.639125],
         [-0.861, -1.707625, 0.616125, -1.393875,
          0.000125, -0.511625, -0.77925, -0.566125]], np.float32)

    params = {"groups": [
        {"project_in": {"w": jnp.asarray(w_in), "b": jnp.asarray(b_in)},
         "project_out": {"w": jnp.asarray(w_out), "b": jnp.asarray(b_out)}}
        for _ in range(2)]}
    x = jnp.asarray(np.concatenate([xg, xg], axis=-1))[None]  # (1, 2, 16)
    idx = np.asarray(gfsq.quantize(params, x, cfg))[0]  # (2, 4)
    np.testing.assert_array_equal(idx[:, :2], expect_idx_g)
    np.testing.assert_array_equal(idx[:, 2:], expect_idx_g)
    emb = np.asarray(gfsq.embed(params, jnp.asarray(idx)[None], cfg))[0]
    np.testing.assert_allclose(emb[:, :8], expect_emb_g, atol=1e-5)
    np.testing.assert_allclose(emb[:, 8:], expect_emb_g, atol=1e-5)


def test_quantize_embed_fixed_point_when_projections_align():
    """With project_in == pinv(project_out), quantize/embed reaches a fixed
    point after one round trip.

    Neither index- nor feature-level identity can hold in residual FSQ: the
    two stages are redundant (codes (1, -1) and (0.5, 1) both sum to 0.75)
    and the tanh bound makes extremes like 0.875 = (1, -0.5) unreachable
    after re-quantization (stage-1 range is +-0.25) - the reference
    quantizer (vector_quantize_pytorch ResidualFSQ) is lossy the same way.
    What must hold: re-quantizing an embedded quantization result is stable.
    """
    key = jax.random.PRNGKey(42)
    params = gfsq.init_params(key, CFG)
    # make projections consistent: in = pinv(out), zero biases
    for g in range(CFG.groups):
        w_out = np.asarray(params["groups"][g]["project_out"]["w"])  # (4, 512)
        params["groups"][g]["project_in"]["w"] = jnp.asarray(
            np.linalg.pinv(w_out))
        params["groups"][g]["project_in"]["b"] = jnp.zeros(4)
        params["groups"][g]["project_out"]["b"] = jnp.zeros(512)
    ind = jax.random.randint(key, (1, 50, 4), 0, 625)
    ind2 = gfsq.quantize(params, gfsq.embed(params, ind, CFG), CFG)
    ind3 = gfsq.quantize(params, gfsq.embed(params, ind2, CFG), CFG)
    np.testing.assert_array_equal(np.asarray(ind3), np.asarray(ind2))
