"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env before jax initializes (any import of jax in a test module
happens after this file loads).
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS to the single real
# TPU tunnel (and the sitecustomize hook imports jax before this file runs,
# latching that value), so both the env var and the live jax config must be
# overridden; tests always run on the 8-device virtual host mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from chattts_tpu.config import (  # noqa: E402
    Config,
    ConvStackConfig,
    DVAEConfig,
    DecoderConfig,
    GFSQConfig,
    GPTConfig,
    MelConfig,
    VocosConfig,
)


@pytest.fixture(scope="session")
def tiny_config() -> Config:
    """A miniature but structurally faithful config for fast CPU tests."""
    gpt = GPTConfig(
        hidden_size=64,
        intermediate_size=128,
        num_attention_heads=4,
        num_hidden_layers=2,
        max_position_embeddings=512,
        num_audio_tokens=626,
        num_text_tokens=300,
        num_vq=4,
    )
    dvae = DVAEConfig(
        encoder=ConvStackConfig(idim=512, odim=1024, hidden=64, n_layer=2),
        decoder=ConvStackConfig(idim=512, odim=128, hidden=64, n_layer=2),
        vq=GFSQConfig(),
    )
    decoder = DecoderConfig(
        stack=ConvStackConfig(idim=gpt.hidden_size // 2, odim=96,
                              hidden=64, n_layer=2)
    )
    vocos = VocosConfig(dim=64, intermediate_dim=128, num_layers=2)
    cfg = Config(gpt=gpt, dvae=dvae, decoder=decoder, vocos=vocos)
    return cfg.with_runtime(prefill_bucket=16, decode_bucket=32)


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
