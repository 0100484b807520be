"""Export the model graphs as serialized StableHLO artifacts.

TPU-native analog of the reference's ONNX exporter
(``examples/onnx/exporter.py``, which splits the GPT into per-op graphs
with static KV-cache I/O): here each stage is jitted and exported with
``jax.export`` - the same static-shape KV-cache signature, but as
portable StableHLO that any XLA runtime (TPU/GPU/CPU, IREE, PJRT
plugins) can load without Python.

Exports:
  * ``prefill.stablehlo``      - prompt embedding + full-sequence forward
  * ``decode_step.stablehlo``  - one AR step against the static KV cache
  * ``heads.stablehlo``        - hidden -> 4-codebook logits
  * ``vocoder.stablehlo``      - hidden states -> mel -> waveform

    python examples/exporter.py --out exported/ [--steps N]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, ".")

# export portable XLA ops only (the Pallas megakernel serializes as a
# TPU-specific custom call; the plain path runs anywhere)
os.environ.setdefault("CHATTTS_PALLAS_STEP", "0")

import jax
import jax.numpy as jnp


def export_all(out_dir: str, batch: int = 1, prompt_len: int = 64,
               max_new: int = 512) -> dict:
    from chattts_tpu.config import Config
    from chattts_tpu.models import dvae as dvae_mod
    from chattts_tpu.models import embed as embed_mod
    from chattts_tpu.models import llama
    from chattts_tpu.models import vocos as vocos_mod
    from chattts_tpu.models.llama import KVCache

    try:  # custom pytree containers need registered names to serialize
        jax.export.register_namedtuple_serialization(
            KVCache, serialized_name="chattts_tpu.KVCache")
    except ValueError:
        pass  # already registered

    cfg = Config()
    g = cfg.gpt
    key = jax.random.PRNGKey(0)
    gp = llama.init_params(key, g)
    ep = embed_mod.init_params(jax.random.PRNGKey(1), g)
    dp = dvae_mod.init_decoder_params(jax.random.PRNGKey(2), cfg.decoder)
    vp = vocos_mod.init_params(jax.random.PRNGKey(3), cfg.vocos)

    B, T0 = batch, prompt_len
    Tbuf = T0 + max_new

    def prefill_fn(gp, ep, ids, attn, tmask):
        emb = embed_mod.embed_prompt(ep, ids, tmask)
        pos = jnp.maximum(jnp.cumsum(attn.astype(jnp.int32), axis=1) - 1, 0)
        cache = KVCache.create(g, B, Tbuf)
        hidden, cache = llama.prefill(gp, emb, attn, pos, cache, g)
        return hidden[:, -1], cache

    def decode_fn(gp, ep, token, cache, cur, key_valid, pos):
        emb = embed_mod.embed_code_step(ep, token)
        return llama.decode_step(gp, emb, cache, cur, key_valid, pos, g)

    def heads_fn(ep, hidden):
        return embed_mod.head_code(ep, hidden)

    def vocoder_fn(dp, vp, hiddens):
        mel = dvae_mod.decode_from_hidden(dp, hiddens, cfg=cfg.decoder)
        return vocos_mod.decode(vp, mel, cfg=cfg.vocos)

    ids = jnp.zeros((B, T0, g.num_vq), jnp.int32)
    attn = jnp.ones((B, T0), jnp.bool_)
    cache = KVCache.create(g, B, Tbuf)
    kv = jnp.ones((B, Tbuf), jnp.bool_)
    token = jnp.zeros((B, g.num_vq), jnp.int32)
    hidden = jnp.zeros((B, g.hidden_size), jnp.float32)
    hiddens = jnp.zeros((B, 128, g.hidden_size), jnp.float32)

    jobs = {
        "prefill": (prefill_fn, (gp, ep, ids, attn, attn)),
        "decode_step": (decode_fn, (gp, ep, token, cache, jnp.int32(T0),
                                    kv, jnp.full((B,), T0, jnp.int32))),
        "heads": (heads_fn, (ep, hidden)),
        "vocoder": (vocoder_fn, (dp, vp, hiddens)),
    }
    os.makedirs(out_dir, exist_ok=True)
    sizes = {}
    for name, (fn, args) in jobs.items():
        exported = jax.export.export(jax.jit(fn))(*args)
        blob = exported.serialize()
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        sizes[name] = len(blob)
        print(f"exported {name}: {len(blob) / 1e6:.2f} MB "
              f"-> {path}", flush=True)
    return sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exported")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--steps", type=int, default=512)
    args = ap.parse_args()
    export_all(args.out, args.batch, args.prompt_len, args.steps)


if __name__ == "__main__":
    main()
