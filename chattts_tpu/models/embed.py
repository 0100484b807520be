"""Shared input embeddings and output heads, TPU-native.

Rebuild of the reference ``Embed`` module (``ChatTTS/model/embed.py:8-79``):
one text embedding table, ``num_vq`` audio-code tables (summed when a position
holds a 4-tuple code token), a text LM head and ``num_vq`` code heads.  The
reference's weight-normed heads are folded into plain matrices at load time
(utils/io.fold_weight_norm), and its boolean-mask scatter becomes a
``jnp.where`` select - jit-friendly, no dynamic shapes.

The four code tables/heads are stored stacked - (num_vq, V, D) / (num_vq, D,
V) - so the per-step 4-head projection is a single batched matmul on the MXU
instead of the reference's Python loop over heads (``gpt.py:443-455``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GPTConfig


def init_params(key: jax.Array, cfg: GPTConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    D = cfg.hidden_size
    return {
        "emb_text": jax.random.normal(k1, (cfg.num_text_tokens, D), dtype) * 0.02,
        "emb_code": jax.random.normal(
            k2, (cfg.num_vq, cfg.num_audio_tokens, D), dtype) * 0.02,
        "head_text": jax.random.normal(k3, (D, cfg.num_text_tokens), dtype)
        / np.sqrt(D),
        "head_code": jax.random.normal(
            k4, (cfg.num_vq, D, cfg.num_audio_tokens), dtype) / np.sqrt(D),
    }


def _use_onehot() -> bool:
    """Embedding lookups as one-hot matmuls on TPU.

    XLA:TPU lowers small row gathers from large tables very poorly
    (measured ~1.9 ms/step for four (8,)-row gathers from (626, 768)
    tables); a one-hot contraction reads the table once at full HBM
    bandwidth through the MXU (~10 us).  On CPU the gather is the faster
    lowering, so tests keep it.
    """
    return jax.default_backend() == "tpu"


def _lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table (V, D), ids (...,) int32 -> (..., D)."""
    if not _use_onehot():
        return table[jnp.clip(ids, 0, table.shape[0] - 1)]
    oh = jax.nn.one_hot(ids, table.shape[0], dtype=table.dtype)
    return jax.lax.dot_general(
        oh.reshape(-1, table.shape[0]), table,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(*ids.shape, table.shape[1]).astype(table.dtype)


def embed_prompt(params: dict, ids: jnp.ndarray, text_mask: jnp.ndarray
                 ) -> jnp.ndarray:
    """ids (B, T, num_vq) int32, text_mask (B, T) bool -> (B, T, D).

    Text positions embed ids[..., 0] via the text table; code positions embed
    the sum of the per-codebook tables (embed.py:52-79).
    """
    num_vq = params["emb_code"].shape[0]
    text_ids = jnp.clip(ids[..., 0], 0, params["emb_text"].shape[0] - 1)
    e_text = _lookup(params["emb_text"], text_ids)
    code_ids = jnp.clip(ids, 0, params["emb_code"].shape[1] - 1)
    e_code = sum(
        _lookup(params["emb_code"][q], code_ids[..., q]) for q in range(num_vq)
    )
    return jnp.where(text_mask[..., None], e_text, e_code)


def embed_code_step(params: dict, ids_q: jnp.ndarray) -> jnp.ndarray:
    """Decode-step code embedding: ids_q (B, num_vq) -> (B, D)."""
    tables = params["emb_code"]  # (num_vq, V, D)
    Q, V, D = tables.shape
    if not _use_onehot():
        return sum(tables[q][ids_q[..., q]] for q in range(Q))
    # one flat one-hot matmul (B, Q*V) @ (Q*V, D): the per-codebook sum is
    # the block structure of the flattened table (measured 30 us vs 113 us
    # for the gather form and 99 us for a batched q-einsum)
    offs = ids_q + jnp.arange(Q)[None, :] * V  # (B, Q)
    oh = jax.nn.one_hot(offs, Q * V, dtype=tables.dtype).sum(1)
    return jax.lax.dot_general(
        oh, tables.reshape(Q * V, D), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(tables.dtype)


def embed_text_step(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    """Decode-step text embedding: ids (B,) -> (B, D)."""
    return _lookup(params["emb_text"], ids)


def head_text(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """(..., D) -> text logits (..., V_text), f32."""
    return (hidden.astype(jnp.float32)
            @ params["head_text"].astype(jnp.float32))


def head_code(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """(B, D) -> code logits (B, num_vq, V_audio), f32: one batched matmul."""
    return jnp.einsum(
        "bd,qdv->bqv",
        hidden.astype(jnp.float32),
        params["head_code"].astype(jnp.float32),
    )


def torch_key_map(cfg: GPTConfig) -> dict:
    """Tree paths -> Embed.safetensors keys (after weight-norm folding).

    Stacked tensors are assembled by the loader below rather than mapped 1:1.
    """
    return {
        "emb_text": ("emb_text.weight", ""),
        "head_text": ("head_text.weight", "T"),
    }


def load_from_state(params: dict, state: dict, cfg: GPTConfig, cast) -> dict:
    """Fill params from a folded reference Embed state dict."""
    params["emb_text"] = cast(np.asarray(state["emb_text.weight"]))
    params["head_text"] = cast(np.asarray(state["head_text.weight"]).T)
    params["emb_code"] = cast(
        np.stack([np.asarray(state[f"emb_code.{q}.weight"])
                  for q in range(cfg.num_vq)])
    )
    params["head_code"] = cast(
        np.stack([np.asarray(state[f"head_code.{q}.weight"]).T
                  for q in range(cfg.num_vq)])
    )
    return params
