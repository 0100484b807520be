"""Llama-architecture decoder, TPU-native (functional JAX).

The reference wraps HF ``LlamaModel`` (``ChatTTS/model/gpt.py:75-78``; config
``ChatTTS/config/config.py:51-63``: hidden 768, 20 layers, 12 heads, MHA).  We
re-express it as pure functions over a parameter pytree with two entry points:

* :func:`prefill` - batched full-sequence forward with a causal+padding mask,
  writing the KV cache at positions [0, T0);
* :func:`decode_step` - single-token forward against a static-shape KV cache
  (dynamic_update_slice write, masked full-length attention read).  The cache
  is (L, B, Tmax, H, Dh) so batch shards over the `dp` mesh axis and heads
  over `tp`; XLA inserts the all-reduces implied by the head/FFN shardings.

Weights live in (in, out) layout so every projection is a plain MXU matmul in
bfloat16 with f32 accumulation; RMSNorm runs in f32 like the HF reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import GPTConfig

# additive attention-mask value: large-finite so fully-masked softmax rows
# stay NaN-free (see prefill)
_MASK_VALUE = -1e9


def init_params(key: jax.Array, cfg: GPTConfig, dtype=jnp.bfloat16) -> dict:
    """Parameter tree.  Q/K/V and gate/up are stored FUSED -
    ``wqkv (D, 3, H, Dh)`` and ``wgu (D, 2, I)`` - so each is one MXU matmul
    per step instead of three/two; the extra leading axis keeps head (H) and
    FFN (I) dims intact for tensor-parallel sharding."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, Dh = cfg.num_attention_heads, cfg.head_dim

    def lin(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    layers = []
    for lk in jax.random.split(key, cfg.num_hidden_layers):
        ks = jax.random.split(lk, 4)
        layers.append(
            {
                "attn": {
                    "wqkv": lin(ks[0], (D, 3, H, Dh)),
                    "wo": lin(ks[1], (H * Dh, D)),
                },
                "mlp": {
                    "wgu": lin(ks[2], (D, 2, I)),
                    "down": lin(ks[3], (I, D)),
                },
                "ln1": jnp.ones((D,), jnp.float32),
                "ln2": jnp.ones((D,), jnp.float32),
            }
        )
    return {"layers": layers, "norm": jnp.ones((D,), jnp.float32)}


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * w).astype(x.dtype)


def rope_tables(cfg: GPTConfig) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin tables (max_pos, head_dim), HF half-rotation layout."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    t = np.arange(cfg.max_position_embeddings, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (T, d/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, Dh); cos/sin: (B, T, Dh) or (T, Dh)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)


class KVCache(NamedTuple):
    """Per-layer KV leaves: k/v are tuples of L arrays (B, Tmax, H, Dh).

    Profiling showed a single stacked (L, B, T, H, Dh) buffer forces XLA to
    materialize a relayout copy on every per-layer read (the 5-D tiled
    layout differs from the 4-D slice's) and a full-cache copy on the
    per-step write - together ~80% of decode step time.  Separate leaves
    make each layer's update an in-place dynamic-update-slice and each read
    a zero-copy operand.
    """

    k: tuple  # L x (B, Tmax, H, Dh)
    v: tuple  # L x (B, Tmax, H, Dh)

    @staticmethod
    def create(cfg: GPTConfig, batch: int, max_len: int, dtype=jnp.bfloat16
               ) -> "KVCache":
        shape = (batch, max_len, cfg.num_attention_heads, cfg.head_dim)
        return KVCache(
            tuple(jnp.zeros(shape, dtype)
                  for _ in range(cfg.num_hidden_layers)),
            tuple(jnp.zeros(shape, dtype)
                  for _ in range(cfg.num_hidden_layers)),
        )


def _mlp(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    gu = jnp.einsum("btd,dci->btci", x, p["wgu"])  # (B, T, 2, I)
    return (jax.nn.silu(gu[:, :, 0]) * gu[:, :, 1]) @ p["down"]


def _qkv(p: dict, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x (B, T, D) -> q, k, v each (B, T, H, Dh) via one fused matmul."""
    qkv = jnp.einsum("btd,dchk->btchk", x, p["wqkv"])
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def prefill_bias(attn_mask: jnp.ndarray) -> jnp.ndarray:
    """Additive attention bias (B, 1, T0, T0) for a full-sequence forward:
    query i attends key j iff j <= i and mask[j].  Large-finite instead of
    -inf: queries at (left-)pad positions have no visible keys, and softmax
    over an all--inf row is NaN, which would poison the KV cache through
    the residual stream (HF masks the same way)."""
    T0 = attn_mask.shape[1]
    causal = jnp.tril(jnp.ones((T0, T0), jnp.bool_))
    bias = jnp.where(causal[None] & attn_mask[:, None, :], 0.0, _MASK_VALUE)
    return bias[:, None]


def prefill_block(lp: dict, x: jnp.ndarray, bias: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray, cfg: GPTConfig,
                  dtype=jnp.bfloat16
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One transformer layer of the full-sequence forward:
    (x (B, T, D), bias (B, 1, T, T), cos/sin (B, T, Dh)) -> (x, k, v).
    Shared by :func:`prefill` and the pipeline-parallel stage scan
    (parallel/pipeline.py)."""
    eps = cfg.rms_norm_eps
    B, T0, _ = x.shape
    h = rms_norm(x, lp["ln1"], eps)
    q, k, v = _qkv(lp["attn"], h)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(cfg.head_dim) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    x = x + o.reshape(B, T0, -1) @ lp["attn"]["wo"]
    h = rms_norm(x, lp["ln2"], eps)
    return x + _mlp(lp["mlp"], h), k, v


def prefill(
    params: dict,
    emb: jnp.ndarray,           # (B, T0, D) input embeddings
    attn_mask: jnp.ndarray,     # (B, T0) bool, False at (left) padding
    positions: jnp.ndarray,     # (B, T0) int32 rope positions
    cache: KVCache,
    cfg: GPTConfig,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, KVCache]:
    """Full-sequence forward; returns (hidden (B, T0, D) f32, updated cache)."""
    cos_t, sin_t = rope_tables(cfg)
    cos = jnp.asarray(cos_t)[positions]  # (B, T0, Dh)
    sin = jnp.asarray(sin_t)[positions]
    bias = prefill_bias(attn_mask)

    x = emb.astype(dtype)
    ks, vs = [], []
    for lp in params["layers"]:
        x, k, v = prefill_block(lp, x, bias, cos, sin, cfg, dtype)
        ks.append(k)
        vs.append(v)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps).astype(jnp.float32)
    new_cache = KVCache(
        tuple(lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, 0, 0))
              for ck, k in zip(cache.k, ks)),
        tuple(lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, 0, 0))
              for cv, v in zip(cache.v, vs)),
    )
    return hidden, new_cache


def decode_step(
    params: dict,
    emb: jnp.ndarray,        # (B, D) current-token embedding
    cache: KVCache,
    cur: jnp.ndarray,        # () or (B,) int32: write position per sequence
    key_valid: jnp.ndarray,  # (B, Tmax) bool: which cache slots are readable
    positions: jnp.ndarray,  # (B,) int32 rope position of the current token
    cfg: GPTConfig,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, KVCache]:
    """One AR step; returns (hidden (B, D) f32, updated cache).

    ``cur`` scalar: all sequences at the same depth (single generate call;
    cache writes are dynamic-update-slices).  ``cur`` vector: per-slot depths
    (continuous batching; cache writes become per-row scatters).
    """
    H, Dh, eps = cfg.num_attention_heads, cfg.head_dim, cfg.rms_norm_eps
    cos_t, sin_t = rope_tables(cfg)
    cos = jnp.asarray(cos_t)[positions][:, None, :]  # (B, 1, Dh)
    sin = jnp.asarray(sin_t)[positions][:, None, :]

    B = emb.shape[0]
    Tmax = cache.k[0].shape[1]
    per_slot = cur.ndim == 1
    slot_ids = lax.broadcasted_iota(jnp.int32, (Tmax,), 0)
    cur_b = cur[:, None] if per_slot else cur
    rows = jnp.arange(B)
    # Write-then-attend: the current token's k/v are written into the
    # cache FIRST and the softmax runs over [.. cur] inclusive.  The
    # attention read then depends on the written buffer, so XLA keeps
    # the dynamic-update-slice in place inside the decode loop.
    # Measured in-loop at (B=8, T=416): 1.33 ms/step vs 1.76 ms for the
    # previous strictly-past + logsumexp-self-merge formulation, whose
    # read-before-write left XLA copying cache leaves in the loop body.
    # (On TPU the generator path goes through the fused whole-step Pallas
    # kernel instead - ops/pallas_step.py, ~0.96 ms/step.)
    ok = key_valid & (slot_ids[None, :] <= cur_b)
    bias = jnp.where(ok, 0.0, _MASK_VALUE)[:, None, None, :]

    def write(buf, val):
        # buf (B, Tmax, H, Dh); val (B, 1, H, Dh)
        if per_slot:
            return buf.at[rows, cur].set(val[:, 0].astype(buf.dtype))
        return lax.dynamic_update_slice(buf, val.astype(buf.dtype),
                                        (0, cur, 0, 0))

    x = emb[:, None, :].astype(dtype)  # (B, 1, D)
    k_leaves, v_leaves = [], []
    for li, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["ln1"], eps)
        q, k, v = _qkv(lp["attn"], h)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_cache = write(cache.k[li], k)
        v_cache = write(cache.v[li], v)
        k_leaves.append(k_cache)
        v_leaves.append(v_cache)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache.astype(dtype),
                       preferred_element_type=jnp.float32)
        s = s / np.sqrt(Dh) + bias                    # (B, H, 1, T)
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v_cache.astype(dtype))
        x = x + o.reshape(B, 1, -1) @ lp["attn"]["wo"]
        h = rms_norm(x, lp["ln2"], eps)
        x = x + _mlp(lp["mlp"], h)

    hidden = rms_norm(x[:, 0], params["norm"], eps).astype(jnp.float32)
    return hidden, KVCache(tuple(k_leaves), tuple(v_leaves))


def load_from_state(params: dict, state: dict, cfg: GPTConfig,
                    dtype=jnp.bfloat16) -> dict:
    """Fill params from an HF LlamaModel state dict ('model.' prefix already
    stripped), fusing q/k/v and gate/up into the stacked layouts."""
    import numpy as np  # noqa: PLC0415

    D, H, Dh, I = (cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim,
                   cfg.intermediate_size)

    def t(key):  # torch Linear (out, in) -> (in, out)
        return np.asarray(state[key]).T

    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        lp = params["layers"][i]
        qkv = np.stack([t(p + "self_attn.q_proj.weight"),
                        t(p + "self_attn.k_proj.weight"),
                        t(p + "self_attn.v_proj.weight")], axis=1)
        lp["attn"]["wqkv"] = jnp.asarray(
            qkv.reshape(D, 3, H, Dh), dtype)
        lp["attn"]["wo"] = jnp.asarray(t(p + "self_attn.o_proj.weight"), dtype)
        gu = np.stack([t(p + "mlp.gate_proj.weight"),
                       t(p + "mlp.up_proj.weight")], axis=1)
        lp["mlp"]["wgu"] = jnp.asarray(gu.reshape(D, 2, I), dtype)
        lp["mlp"]["down"] = jnp.asarray(t(p + "mlp.down_proj.weight"), dtype)
        lp["ln1"] = jnp.asarray(state[p + "input_layernorm.weight"],
                                jnp.float32)
        lp["ln2"] = jnp.asarray(state[p + "post_attention_layernorm.weight"],
                                jnp.float32)
    params["norm"] = jnp.asarray(state["norm.weight"], jnp.float32)
    return params
