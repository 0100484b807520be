"""Transformer golden tests vs HF LlamaModel with identical weights.

Builds a small HF LlamaModel (the architecture the reference wraps,
gpt.py:75-78), copies our randomly initialized pytree into it, and compares:
prefill hidden states (with left padding), and prefill+decode_step
consistency against a longer prefill.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from chattts_tpu.config import GPTConfig
from chattts_tpu.models import llama

CFG = GPTConfig(
    hidden_size=64,
    intermediate_size=128,
    num_attention_heads=4,
    num_hidden_layers=2,
    max_position_embeddings=256,
    num_text_tokens=100,
)


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(
        lambda a: a.astype(jnp.float32),
        llama.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32),
    )


@pytest.fixture(scope="module")
def hf_model(params):
    from transformers import LlamaConfig, LlamaModel

    hf_cfg = LlamaConfig(
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_attention_heads,
        num_hidden_layers=CFG.num_hidden_layers,
        max_position_embeddings=CFG.max_position_embeddings,
        vocab_size=CFG.num_text_tokens,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        attn_implementation="eager",
    )
    m = LlamaModel(hf_cfg)
    sd = {}
    D = CFG.hidden_size
    for i, lp in enumerate(params["layers"]):
        pre = f"layers.{i}."
        wqkv = np.asarray(lp["attn"]["wqkv"]).reshape(D, 3, -1)
        sd[pre + "self_attn.q_proj.weight"] = torch.tensor(wqkv[:, 0].T.copy())
        sd[pre + "self_attn.k_proj.weight"] = torch.tensor(wqkv[:, 1].T.copy())
        sd[pre + "self_attn.v_proj.weight"] = torch.tensor(wqkv[:, 2].T.copy())
        sd[pre + "self_attn.o_proj.weight"] = torch.tensor(
            np.asarray(lp["attn"]["wo"]).T)
        wgu = np.asarray(lp["mlp"]["wgu"])
        sd[pre + "mlp.gate_proj.weight"] = torch.tensor(wgu[:, 0].T.copy())
        sd[pre + "mlp.up_proj.weight"] = torch.tensor(wgu[:, 1].T.copy())
        sd[pre + "mlp.down_proj.weight"] = torch.tensor(
            np.asarray(lp["mlp"]["down"]).T)
        sd[pre + "input_layernorm.weight"] = torch.tensor(np.asarray(lp["ln1"]))
        sd[pre + "post_attention_layernorm.weight"] = torch.tensor(
            np.asarray(lp["ln2"]))
    sd["norm.weight"] = torch.tensor(np.asarray(params["norm"]))
    sd["embed_tokens.weight"] = torch.zeros(
        CFG.num_text_tokens, CFG.hidden_size)
    m.load_state_dict(sd)
    return m.eval()


def test_prefill_matches_hf(params, hf_model, rng):
    B, T = 2, 10
    emb = rng.standard_normal((B, T, CFG.hidden_size)).astype(np.float32) * 0.1
    # left padding on row 1
    mask = np.ones((B, T), bool)
    mask[1, :3] = False
    positions = np.maximum(np.cumsum(mask, 1) - 1, 0).astype(np.int32)

    cache = llama.KVCache.create(CFG, B, T, dtype=jnp.float32)
    hidden, _ = llama.prefill(
        params, jnp.asarray(emb), jnp.asarray(mask), jnp.asarray(positions),
        cache, CFG, dtype=jnp.float32)

    with torch.no_grad():
        out = hf_model(
            inputs_embeds=torch.tensor(emb),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            position_ids=torch.tensor(positions.astype(np.int64)),
        ).last_hidden_state.numpy()
    # compare on valid positions only
    np.testing.assert_allclose(
        np.asarray(hidden)[mask], out[mask], atol=2e-4, rtol=1e-3)


def test_decode_step_matches_prefill(params, rng):
    """prefill(T+1) last hidden == prefill(T) + decode_step consistency."""
    B, T = 2, 8
    emb = rng.standard_normal((B, T + 1, CFG.hidden_size)).astype(np.float32) * 0.1
    mask = np.ones((B, T + 1), bool)
    positions = np.maximum(np.cumsum(mask, 1) - 1, 0).astype(np.int32)

    cache_full = llama.KVCache.create(CFG, B, T + 1, dtype=jnp.float32)
    hidden_full, _ = llama.prefill(
        params, jnp.asarray(emb), jnp.asarray(mask), jnp.asarray(positions),
        cache_full, CFG, dtype=jnp.float32)

    cache = llama.KVCache.create(CFG, B, T + 1, dtype=jnp.float32)
    _, cache = llama.prefill(
        params, jnp.asarray(emb[:, :T]), jnp.asarray(mask[:, :T]),
        jnp.asarray(positions[:, :T]), cache, CFG, dtype=jnp.float32)
    key_valid = jnp.asarray(mask)
    hidden_step, _ = llama.decode_step(
        params, jnp.asarray(emb[:, T]), cache, jnp.int32(T), key_valid,
        jnp.asarray(positions[:, T]), CFG, dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(hidden_step), np.asarray(hidden_full)[:, -1],
        atol=2e-5, rtol=1e-4)
