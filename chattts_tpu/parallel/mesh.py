"""Device mesh and sharding layouts.

TPU-native replacement for the reference's distributed runtime (NCCL process
groups + Ray actors + explicit broadcasts, ``ChatTTS/model/velocity/worker.py:
207-238``, ``llm_engine.py:151-256``): a single-controller JAX mesh with two
axes -

* ``dp`` (data parallel): requests/batch shard across chips; the scaling axis
  for throughput serving (the reference has no DP at all - its only batch
  parallelism is continuous batching on one GPU);
* ``sp`` (sequence parallel): the time axis of training activations shards
  across chips, cutting per-chip activation memory for long sequences; the
  attention all-gathers GSPMD inserts ride the ICI.  The reference has no
  sequence parallelism anywhere (SURVEY.md section 2.6) and decode is one
  token per step, so ``sp`` applies to training/prefill only — serving
  meshes keep ``sp=1``;
* ``tp`` (tensor parallel): attention heads and FFN columns shard across
  chips for latency; the all-reduces the reference codes by hand inside
  Row/ColumnParallelLinear (``velocity/llama.py:106-151``) are inserted by
  XLA from these PartitionSpecs and ride the ICI.

All specs are plain ``PartitionSpec`` trees matching our parameter/state
pytrees; apply them with ``shard_params`` / ``jax.jit(in_shardings=...)``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GPTConfig


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: the single call replacing the reference's whole
    worker/NCCL/Ray layer (velocity/worker.py:207-238, llm_engine.py:151-256).

    With no arguments jax.distributed reads the cluster env (TPU pods set it
    automatically); afterwards ``jax.devices()`` spans all hosts and
    :func:`make_mesh` lays the global mesh over them.  Safe to call when
    already initialized or single-host (no-op).
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-host / no cluster env: run locally


def make_mesh(dp: Optional[int] = None, tp: int = 1, sp: int = 1,
              devices=None) -> Mesh:
    """(dp, sp, tp) mesh; unmentioned axes in a PartitionSpec replicate, so
    every existing dp/tp spec works unchanged on a mesh with sp == 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    if dp * sp * tp != n:
        raise ValueError(f"dp*sp*tp={dp * sp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def gpt_param_specs(cfg: GPTConfig) -> dict:
    """PartitionSpec tree for the transformer parameters (TP over heads/FFN)."""
    layer = {
        "attn": {
            # fused (D, 3, H, Dh): heads shard over tp
            "wqkv": P(None, None, "tp", None),
            "wo": P("tp", None),
        },
        # fused (D, 2, I): FFN columns shard over tp
        "mlp": {"wgu": P(None, None, "tp"), "down": P("tp", None)},
        "ln1": P(None),
        "ln2": P(None),
    }
    return {"layers": [layer] * cfg.num_hidden_layers, "norm": P(None)}


def embed_param_specs(cfg: GPTConfig) -> dict:
    """Embedding tables replicate (gathered by token id); heads shard vocab."""
    return {
        "emb_text": P(None, None),
        "emb_code": P(None, None, None),
        "head_text": P(None, "tp"),
        "head_code": P(None, None, "tp"),
    }


def train_batch_specs() -> dict:
    """PartitionSpec tree for a train.TrainBatch: batch over ``dp``, the
    sequence (time) axis over ``sp``.  Parameters stay replicated over
    ``sp``; GSPMD inserts the attention all-gathers and the psum of the
    loss/grad reductions across both axes.  Returned as a TrainBatch of
    specs so it tree-maps against a real batch in :func:`shard_params`."""
    from ..train import TrainBatch

    return TrainBatch(
        ids=P("dp", "sp", None),
        attn_mask=P("dp", "sp"),
        text_mask=P("dp", "sp"),
    )


def state_specs(cfg: GPTConfig) -> dict:
    """Decode-loop state: batch over dp, KV heads over tp (GenState order)."""
    leaf = P("dp", None, "tp", None)  # per-layer (B, T, H, Dh)
    L = cfg.num_hidden_layers
    return {
        "cache": {"k": tuple(leaf for _ in range(L)),
                  "v": tuple(leaf for _ in range(L))},
        "ids": P("dp", None, None),
        "key_valid": P("dp", None),
        "hidden": P("dp", None),
        "cur": P(),
        "pos_next": P("dp"),
        "finish": P("dp"),
        "end_idx": P("dp"),
        "hiddens": P("dp", None, None),
        "step": P(),
        "rng": P(),
    }


def shard_params(params, specs, mesh: Mesh):
    """Place a parameter pytree on the mesh according to a spec tree."""
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
