"""ConvNeXt stack golden tests vs a torch re-execution of the same math.

torch (CPU) builds the reference-architecture block from our weights; outputs
must agree to float tolerance.  This pins conv layouts, padding, dilation,
LayerNorm epsilon, exact-GELU and layer-scale semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from chattts_tpu.config import ConvStackConfig
from chattts_tpu.models import convnext


def _torch_block(p, x_t, kernel, dilation):
    """Reference ConvNeXt block math in torch (dvae.py:14-66), channels-first."""
    dim = x_t.shape[1]
    w_dw = torch.tensor(np.asarray(p["dwconv"]["w"]).transpose(2, 1, 0))
    b_dw = torch.tensor(np.asarray(p["dwconv"]["b"]))
    y = torch.nn.functional.conv1d(
        x_t, w_dw, b_dw, padding=dilation * (kernel // 2),
        dilation=dilation, groups=dim)
    y = y.transpose(1, 2)
    y = torch.nn.functional.layer_norm(
        y, (dim,), torch.tensor(np.asarray(p["norm"]["scale"])),
        torch.tensor(np.asarray(p["norm"]["bias"])), eps=1e-6)
    y = y @ torch.tensor(np.asarray(p["pw1"]["w"])) + torch.tensor(
        np.asarray(p["pw1"]["b"]))
    y = torch.nn.functional.gelu(y)
    y = y @ torch.tensor(np.asarray(p["pw2"]["w"])) + torch.tensor(
        np.asarray(p["pw2"]["b"]))
    y = y * torch.tensor(np.asarray(p["gamma"]))
    return x_t + y.transpose(1, 2)


def test_block_matches_torch(rng):
    dim, inter, kernel, dilation = 32, 64, 7, 2
    p = convnext.init_block(jax.random.PRNGKey(0), dim, inter, kernel)
    x = rng.standard_normal((2, 20, dim)).astype(np.float32)
    ours = np.asarray(convnext.apply_block(p, jnp.asarray(x), kernel=kernel,
                                           dilation=dilation))
    theirs = _torch_block(p, torch.tensor(x.transpose(0, 2, 1)), kernel,
                          dilation).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_stack_matches_torch(rng):
    cfg = ConvStackConfig(idim=24, odim=16, hidden=32, n_layer=2, bn_dim=8)
    p = convnext.init_stack(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((1, 30, cfg.idim)).astype(np.float32)

    x_t = torch.tensor(x.transpose(0, 2, 1))
    w0 = torch.tensor(np.asarray(p["conv_in0"]["w"]).transpose(2, 1, 0))
    y = torch.nn.functional.conv1d(
        x_t, w0, torch.tensor(np.asarray(p["conv_in0"]["b"])), padding=1)
    y = torch.nn.functional.gelu(y)
    w1 = torch.tensor(np.asarray(p["conv_in1"]["w"]).transpose(2, 1, 0))
    y = torch.nn.functional.conv1d(
        y, w1, torch.tensor(np.asarray(p["conv_in1"]["b"])), padding=1)
    for bp in p["blocks"]:
        y = _torch_block(bp, y, cfg.kernel, cfg.dilation)
    wo = torch.tensor(np.asarray(p["conv_out"]["w"]).transpose(2, 1, 0))
    y = torch.nn.functional.conv1d(y, wo)
    theirs = y.numpy().transpose(0, 2, 1)

    ours = np.asarray(convnext.apply_stack(p, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_interleave_matches_reference_permute(rng):
    """Our channels-last interleave == the reference view/permute/flatten
    (dvae.py:281-287) executed in torch channels-first."""
    from chattts_tpu.models.dvae import interleave_groups

    B, C, T = 2, 8, 5
    x_cf = rng.standard_normal((B, C, T)).astype(np.float32)
    ref = (
        torch.tensor(x_cf)
        .view(B, 2, C // 2, T)
        .permute(0, 2, 3, 1)
        .flatten(2)
        .numpy()
    )  # (B, C/2, 2T)
    ours = np.asarray(interleave_groups(jnp.asarray(x_cf.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=0)
