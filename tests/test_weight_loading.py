"""Checkpoint-loading path tests: reference-format state dicts -> params.

The one path real users hit first is loading the upstream safetensors
(reference load chain ChatTTS/core.py:275-384).  These tests synthesize
state dicts in the exact torch formats the reference writes - key names from
the reference module definitions, (out, in)/(out, in, k) layouts,
weight-normed ``parametrizations.weight.original{0,1}`` pairs - and verify
the loaders (utils/io.apply_key_map, models/*.load_from_state) fill every
parameter with correctly transformed values.  A broken key map (wrong name,
wrong transform, missing entry) fails here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from chattts_tpu.models import dvae as dvae_mod
from chattts_tpu.models import embed as embed_mod
from chattts_tpu.models import llama
from chattts_tpu.models import vocos as vocos_mod
from chattts_tpu.utils import io as io_utils


def _inverse_transform(arr: np.ndarray, how: str) -> np.ndarray:
    """Turn a param-layout array back into the torch checkpoint layout."""
    if how == "":
        return arr
    if how == "T":
        return arr.T
    if how in ("C", "D"):
        return arr.transpose(2, 1, 0)
    if how == "SQUEEZE":  # coef stored (1, n_mels, 1)
        return arr.reshape(1, -1, 1)
    raise ValueError(how)


def _synth_state(params: dict, key_map: dict, rng) -> dict:
    """Random torch-format state dict matching the key map's expectations."""
    state = {}
    for tree_path, (torch_key, how) in key_map.items():
        leaf = io_utils.get_path(params, tree_path)
        arr = rng.standard_normal(leaf.shape).astype(np.float32)
        state[torch_key] = _inverse_transform(arr, how)
    return state


def _assert_all_leaves_loaded(params, loaded, key_map):
    """Every mapped leaf must have changed from its random init (a silently
    unloaded leaf means a dead key-map entry)."""
    for tree_path in key_map:
        before = np.asarray(io_utils.get_path(params, tree_path))
        after = np.asarray(io_utils.get_path(loaded, tree_path))
        assert not np.array_equal(before, after), f"leaf never loaded: {tree_path}"


@pytest.mark.parametrize("which", ["dvae", "decoder", "vocos"])
def test_key_map_loads_every_leaf_with_correct_transforms(
        tiny_config, rng, which):
    if which == "dvae":
        cfg = tiny_config.dvae
        init = lambda k: dvae_mod.init_dvae_params(k, cfg)  # noqa: E731
        key_map = dvae_mod.dvae_torch_key_map(cfg)
    elif which == "decoder":
        cfg = tiny_config.decoder
        init = lambda k: dvae_mod.init_decoder_params(k, cfg)  # noqa: E731
        key_map = dvae_mod.decoder_torch_key_map(cfg)
    else:
        cfg = tiny_config.vocos
        init = lambda k: vocos_mod.init_params(k, cfg)  # noqa: E731
        key_map = vocos_mod.torch_key_map(cfg)

    params0 = init(jax.random.PRNGKey(0))
    state = _synth_state(params0, key_map, rng)
    loaded = init(jax.random.PRNGKey(0))
    io_utils.apply_key_map(loaded, state, key_map)
    _assert_all_leaves_loaded(init(jax.random.PRNGKey(0)), loaded, key_map)
    # transform correctness: conv weights land as (k, in, out), linears as
    # (in, out)
    for tree_path, (torch_key, how) in key_map.items():
        got = np.asarray(io_utils.get_path(loaded, tree_path))
        expect = io_utils._transform(np.asarray(state[torch_key]), how)
        np.testing.assert_array_equal(got, expect)


def test_key_map_names_match_reference_modules(tiny_config):
    """The torch key names must follow the reference module structure
    (ChatTTS/model/dvae.py:131-248, vocos package layout)."""
    dmap = dvae_mod.dvae_torch_key_map(tiny_config.dvae)
    torch_keys = {k for k, _ in dmap.values()}
    assert "coef" in torch_keys
    assert "out_conv.weight" in torch_keys
    assert "downsample_conv.0.weight" in torch_keys
    assert "downsample_conv.2.weight" in torch_keys
    assert "decoder.conv_in.0.weight" in torch_keys
    assert "decoder.decoder_block.0.dwconv.weight" in torch_keys
    assert "vq_layer.quantizer.rvqs.0.project_in.weight" in torch_keys
    vmap = vocos_mod.torch_key_map(tiny_config.vocos)
    vkeys = {k for k, _ in vmap.values()}
    assert "backbone.embed.weight" in vkeys
    assert "backbone.convnext.0.gamma" in vkeys
    assert "head.out.weight" in vkeys


def test_missing_checkpoint_key_fails_loudly(tiny_config, rng):
    cfg = tiny_config.decoder
    key_map = dvae_mod.decoder_torch_key_map(cfg)
    params = dvae_mod.init_decoder_params(jax.random.PRNGKey(0), cfg)
    state = _synth_state(params, key_map, rng)
    del state["out_conv.weight"]
    with pytest.raises(KeyError, match="out_conv.weight"):
        io_utils.apply_key_map(params, state, key_map)


def test_wrong_layout_fails_loudly(tiny_config, rng):
    cfg = tiny_config.vocos
    key_map = vocos_mod.torch_key_map(cfg)
    params = vocos_mod.init_params(jax.random.PRNGKey(0), cfg)
    state = _synth_state(params, key_map, rng)
    # an un-transposed head weight must be caught by the shape check
    state["head.out.weight"] = state["head.out.weight"].T
    with pytest.raises(ValueError, match="shape mismatch"):
        io_utils.apply_key_map(params, state, key_map)


def test_weight_norm_fold_matches_torch(rng):
    """fold_weight_norm must reproduce torch's weight_norm composition
    (reference Embed heads, embed.py:23-35)."""
    lin = torch.nn.Linear(12, 34, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(
            rng.standard_normal((34, 12)).astype(np.float32)))
    wn = torch.nn.utils.parametrizations.weight_norm(lin)
    state = {k: v.detach().numpy() for k, v in wn.state_dict().items()}
    assert "parametrizations.weight.original0" in state
    folded = io_utils.fold_weight_norm(
        {f"head_text.{k}": v for k, v in state.items()})
    np.testing.assert_allclose(
        folded["head_text.weight"], wn.weight.detach().numpy(), atol=1e-6)


def test_embed_load_from_reference_format_state(tiny_config, rng):
    """Full Embed chain: weight-normed reference keys -> fold -> load ->
    heads/embeddings behave as the torch Linears would."""
    cfg = tiny_config.gpt
    D, Vt, Va, Q = (cfg.hidden_size, cfg.num_text_tokens,
                    cfg.num_audio_tokens, cfg.num_vq)
    state = {
        "emb_text.weight": rng.standard_normal((Vt, D)).astype(np.float32),
    }
    head_text_w = rng.standard_normal((Vt, D)).astype(np.float32)
    heads_code_w = [rng.standard_normal((Va, D)).astype(np.float32)
                    for _ in range(Q)]
    for q in range(Q):
        state[f"emb_code.{q}.weight"] = rng.standard_normal(
            (Va, D)).astype(np.float32)

    def wn_pair(prefix, w):
        # torch weight_norm stores g = ||w|| (dim 1+ reduced) and v = w
        g = np.sqrt((w * w).sum(axis=1, keepdims=True))
        state[f"{prefix}.parametrizations.weight.original0"] = g.astype(
            np.float32)
        state[f"{prefix}.parametrizations.weight.original1"] = w

    wn_pair("head_text", head_text_w)
    for q in range(Q):
        wn_pair(f"head_code.{q}", heads_code_w[q])

    folded = io_utils.fold_weight_norm(state)
    params = embed_mod.init_params(jax.random.PRNGKey(0), cfg)
    embed_mod.load_from_state(params, folded, cfg, lambda a: jnp.asarray(a))

    h = rng.standard_normal((3, D)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(embed_mod.head_text(params, jnp.asarray(h))),
        h @ head_text_w.T, atol=1e-4)
    got_code = np.asarray(embed_mod.head_code(params, jnp.asarray(h)))
    for q in range(Q):
        np.testing.assert_allclose(got_code[:, q], h @ heads_code_w[q].T,
                                   atol=1e-4)
    ids = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.int32)
    got = np.asarray(embed_mod.embed_code_step(params, jnp.asarray(ids)))
    expect = sum(np.asarray(state[f"emb_code.{q}.weight"])[ids[:, q]]
                 for q in range(Q))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_gpt_load_from_hf_state_dict(tiny_config, rng):
    """HF LlamaModel state dict -> llama.load_from_state -> prefill matches
    the HF forward (the reverse direction of test_llama, covering the
    loader's fusion/transposes against real HF key names)."""
    from transformers import LlamaConfig, LlamaModel

    cfg = tiny_config.gpt
    hf_cfg = LlamaConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_attention_heads,
        num_hidden_layers=cfg.num_hidden_layers,
        max_position_embeddings=cfg.max_position_embeddings,
        vocab_size=cfg.num_text_tokens,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    m = LlamaModel(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    llama.load_from_state(params, state, cfg, dtype=jnp.float32)

    B, T = 2, 6
    emb = rng.standard_normal((B, T, cfg.hidden_size)).astype(np.float32) * 0.1
    attn = np.ones((B, T), bool)
    pos = np.broadcast_to(np.arange(T), (B, T)).astype(np.int32)
    cache = llama.KVCache.create(cfg, B, T, dtype=jnp.float32)
    ours, _ = llama.prefill(params, jnp.asarray(emb), jnp.asarray(attn),
                            jnp.asarray(pos), cache, cfg, dtype=jnp.float32)
    with torch.no_grad():
        theirs = m(inputs_embeds=torch.tensor(emb),
                   attention_mask=torch.tensor(np.ones((B, T), np.int64)),
                   ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)
