"""Checkpoint I/O: reference safetensors -> JAX pytrees.

The reference loads five torch safetensors checkpoints plus an HF-format GPT
directory (``ChatTTS/utils/io.py:19-25``, ``ChatTTS/model/gpt.py:75-77``).  We
load the same files with ``safetensors.numpy`` and remap them into our pytree
layout via per-module key maps: each map entry is
``tree_path -> (torch_key, transform)`` where the transform converts torch
weight layouts to TPU-friendly ones (convs to (k, in, out), linears to
(in, out), weight-norm heads folded to plain matrices at load time).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Tuple

import numpy as np


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def _transform(arr: np.ndarray, how: str) -> np.ndarray:
    if how == "":
        return arr
    if how == "T":  # torch Linear (out, in) -> (in, out)
        return arr.T
    if how == "C":  # torch Conv1d (out, in, k) -> (k, in, out)
        return arr.transpose(2, 1, 0)
    if how == "D":  # torch depthwise Conv1d (dim, 1, k) -> (k, 1, dim)
        return arr.transpose(2, 1, 0)
    if how == "SQUEEZE":
        return arr.reshape(-1)
    raise ValueError(f"unknown transform {how!r}")


def set_path(tree, path: str, value):
    """Set ``a/b/0/c``-style path in a nested dict/list pytree."""
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
    last = keys[-1]
    if isinstance(node, (list, tuple)):
        node[int(last)] = value
    else:
        node[last] = value


def get_path(tree, path: str):
    node = tree
    for k in path.split("/"):
        node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
    return node


def apply_key_map(
    params: dict,
    state: Dict[str, np.ndarray],
    key_map: Dict[str, Tuple[str, str]],
    *,
    to_jnp: Callable | None = None,
    strict: bool = True,
) -> dict:
    """Fill ``params`` (in place) from a torch state dict using ``key_map``."""
    import jax.numpy as jnp

    cast = to_jnp or (lambda a: jnp.asarray(a))
    missing = []
    for tree_path, (torch_key, how) in key_map.items():
        if torch_key not in state:
            # torch weight_norm parametrizations store two tensors; handled
            # by fold_weight_norm before we get here.
            missing.append(torch_key)
            continue
        arr = _transform(np.asarray(state[torch_key]), how)
        expected = get_path(params, tree_path)
        if expected is not None and tuple(expected.shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch at {tree_path}: checkpoint {arr.shape} vs "
                f"model {tuple(expected.shape)}"
            )
        set_path(params, tree_path, cast(arr))
    if missing and strict:
        raise KeyError(f"missing checkpoint keys: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    return params


def fold_weight_norm(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch ``weight_norm`` parametrizations into plain weights.

    The reference Embed heads are weight-normed (``embed.py:23-35``); their
    checkpoints carry ``<name>.parametrizations.weight.original0`` (g) and
    ``...original1`` (v) with ``weight = g * v / ||v||`` (norm over dim 1+).
    """
    out = dict(state)
    for key in list(state.keys()):
        marker = ".parametrizations.weight.original0"
        if key.endswith(marker):
            base = key[: -len(marker)]
            g = np.asarray(state[key], dtype=np.float64)
            v = np.asarray(state[base + ".parametrizations.weight.original1"],
                          dtype=np.float64)
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
            out[base + ".weight"] = (g * v / norm).astype(state[key].dtype)
            del out[key]
            del out[base + ".parametrizations.weight.original1"]
    return out


def find_assets_dir(custom_path: str | None = None) -> str | None:
    """Locate a ChatTTS asset directory (env var, custom path, cwd)."""
    candidates = []
    if custom_path:
        candidates.append(custom_path)
    env = os.environ.get("CHATTTS_ASSETS")
    if env:
        candidates.append(env)
    candidates.append(os.path.join(os.getcwd(), "asset"))
    for c in candidates:
        probe = c if os.path.basename(c) == "asset" else os.path.join(c, "asset")
        if os.path.isfile(os.path.join(probe, "Embed.safetensors")):
            return os.path.dirname(probe)
    return None
