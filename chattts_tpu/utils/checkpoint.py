"""Checkpoint save/load for our parameter pytrees and training state.

The reference is inference-only: its "checkpointing" is loading torch
safetensors with sha256 verification (``ChatTTS/utils/io.py:19-25``,
``utils/dl.py:12-43``).  We cover both directions:

* :func:`save_params` / :func:`load_params` - flat safetensors round trip of
  any of our pytrees (interchange format, torch-readable);
* :func:`save_train_state` / :func:`restore_train_state` - orbax-backed full
  training-state checkpoints (params + optimizer state + step), the piece
  the reference lacks entirely.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def _flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
        return out
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def save_params(path: str, params: Any) -> None:
    """Pytree -> one safetensors file with '/'-joined keys."""
    from safetensors.numpy import save_file

    flat = _flatten(params)
    # widen bf16 to f32: numpy safetensors consumers can't represent it
    cast = {
        k: (np.asarray(jax.numpy.asarray(v), np.float32)
            if str(v.dtype) == "bfloat16" else v)
        for k, v in flat.items()
    }
    save_file(cast, path)


def load_params(path: str, template: Any, dtype=None) -> Any:
    """safetensors file -> pytree shaped like ``template``."""
    from safetensors.numpy import load_file

    from . import io as io_utils

    flat = load_file(path)
    for key, arr in flat.items():
        leaf = io_utils.get_path(template, key)
        val = jax.numpy.asarray(
            arr, dtype if dtype is not None else
            (leaf.dtype if hasattr(leaf, "dtype") else None))
        io_utils.set_path(template, key, val)
    return template


def save_train_state(ckpt_dir: str, state, step: int | None = None) -> str:
    """Orbax checkpoint of a train.TrainState; returns the written path."""
    import orbax.checkpoint as ocp

    step = int(step if step is not None else state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, template):
    """Restore a train.TrainState saved by :func:`save_train_state`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
