"""Training step for the speech-token LM (TPU-native, sharded).

The reference ships no training code (SURVEY.md section 0); this module
completes the framework with the training counterpart of the inference stack:
next-token cross-entropy over the mixed text/audio-code stream - text
positions score against the text head, code positions against all
``num_vq`` code heads (the dual of the Embed scatter at
``ChatTTS/model/embed.py:52-79``) - with optax AdamW and full dp/tp sharding
from parallel/mesh.py.  ``make_train_step`` returns a pjit-compiled function
whose gradients all-reduce over ``dp`` and whose matmul partials all-reduce
over ``tp``, both inserted by XLA from the parameter PartitionSpecs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .config import GPTConfig
from .models import embed as embed_mod
from .models import llama
from .models.llama import KVCache


class TrainBatch(NamedTuple):
    ids: jnp.ndarray        # (B, T, num_vq) int32
    attn_mask: jnp.ndarray  # (B, T) bool
    text_mask: jnp.ndarray  # (B, T) bool: True = text token position


class TrainState(NamedTuple):
    gpt: dict
    embed: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _forward_hidden(gpt_params, embed_params, batch: TrainBatch,
                    cfg: GPTConfig) -> jnp.ndarray:
    emb = embed_mod.embed_prompt(embed_params, batch.ids, batch.text_mask)
    positions = jnp.maximum(
        jnp.cumsum(batch.attn_mask.astype(jnp.int32), axis=1) - 1, 0)
    B, T = batch.attn_mask.shape
    cache = KVCache.create(cfg, B, T)
    hidden, _ = llama.prefill(
        gpt_params, emb, batch.attn_mask, positions, cache, cfg)
    return hidden  # (B, T, D) f32


def loss_fn(gpt_params, embed_params, batch: TrainBatch, cfg: GPTConfig
            ) -> jnp.ndarray:
    """Mixed text/code next-token CE, averaged over valid target positions."""
    hidden = _forward_hidden(gpt_params, embed_params, batch, cfg)
    return loss_from_hidden(embed_params, hidden, batch)


def loss_from_hidden(embed_params, hidden: jnp.ndarray, batch: TrainBatch
                     ) -> jnp.ndarray:
    """CE given the transformer's output hidden states (B, T, D) f32 - the
    head/objective half of :func:`loss_fn`, shared with the
    pipeline-parallel step (parallel/pipeline.py) whose forward replaces
    :func:`_forward_hidden`."""
    h = hidden[:, :-1]                      # predict position t+1 from t
    tgt_ids = batch.ids[:, 1:]              # (B, T-1, num_vq)
    tgt_text = batch.text_mask[:, 1:]
    tgt_valid = batch.attn_mask[:, 1:]

    text_logits = embed_mod.head_text(embed_params, h)  # (B, T-1, Vt)
    text_lp = jax.nn.log_softmax(text_logits, axis=-1)
    text_nll = -jnp.take_along_axis(
        text_lp, tgt_ids[..., :1], axis=-1)[..., 0]

    code_logits = jnp.einsum(
        "btd,qdv->btqv", h.astype(jnp.float32),
        embed_params["head_code"].astype(jnp.float32))
    code_lp = jax.nn.log_softmax(code_logits, axis=-1)
    code_nll = -jnp.take_along_axis(
        code_lp, tgt_ids[..., None], axis=-1)[..., 0].sum(-1)

    nll = jnp.where(tgt_text, text_nll, code_nll)
    nll = jnp.where(tgt_valid, nll, 0.0)
    return nll.sum() / jnp.maximum(tgt_valid.sum(), 1)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup: int = 100) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, 10_000)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def init_train_state(key: jax.Array, cfg: GPTConfig,
                     optimizer: optax.GradientTransformation) -> TrainState:
    k1, k2 = jax.random.split(key)
    gpt = llama.init_params(k1, cfg)
    emb = embed_mod.init_params(k2, cfg)
    opt_state = optimizer.init((gpt, emb))
    return TrainState(gpt, emb, opt_state, jnp.int32(0))


def make_train_step(cfg: GPTConfig, optimizer: optax.GradientTransformation):
    """Returns jit-compiled train_step(state, batch) -> (state, metrics).

    Shard by placing ``state``/``batch`` with parallel.mesh specs before the
    first call; XLA propagates the shardings through grads and updates.
    """

    def train_step(state: TrainState, batch: TrainBatch):
        def wrapped(params):
            gpt, emb = params
            return loss_fn(gpt, emb, batch, cfg)

        loss, grads = jax.value_and_grad(wrapped)((state.gpt, state.embed))
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.gpt, state.embed))
        gpt, emb = optax.apply_updates((state.gpt, state.embed), updates)
        new_state = TrainState(gpt, emb, opt_state, state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))


def random_batch(key: jax.Array, cfg: GPTConfig, batch: int, seq: int
                 ) -> TrainBatch:
    """Synthetic batch shaped like real data (text prefix + code suffix)."""
    k1, k2 = jax.random.split(key)
    text_len = seq // 2
    text_ids = jax.random.randint(k1, (batch, seq, cfg.num_vq), 0,
                                  cfg.num_text_tokens)
    code_ids = jax.random.randint(k2, (batch, seq, cfg.num_vq), 0,
                                  cfg.num_audio_tokens - 1)
    pos = jnp.arange(seq)[None, :]
    text_mask = jnp.broadcast_to(pos < text_len, (batch, seq))
    ids = jnp.where(text_mask[..., None], text_ids, code_ids)
    return TrainBatch(
        ids=ids.astype(jnp.int32),
        attn_mask=jnp.ones((batch, seq), jnp.bool_),
        text_mask=text_mask,
    )
