"""Optax training loop over the dp+tp mesh.

The full-featured sibling of ``sharding.make_sharded_train_step`` (which
stays minimal for the multichip dry run): AdamW via optax, gradient
clipping, optional per-block rematerialization (``llama.forward(remat=
True)``, the HBM-for-FLOPs trade), and checkpoint/resume through
``models/checkpoint.py``. Quantized linears are frozen (no useful
gradient through rounding); float leaves train.

The reference has no training story at all (SURVEY.md §2.6) — this module
exists because the framework's north star (serving + multichip) implies a
train/finetune path, and because the dry-run driver exercises a real
sharded step.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.parallel.sharding import shard_params


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["params", "opt_state", "step"],
                   meta_fields=[])
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def is_float_leaf(leaf) -> bool:
    """True for trainable (inexact) dtypes. NOTE: ``dtype.kind`` is NOT
    usable here — ml_dtypes gives bfloat16 kind 'V', so a kind=='f'
    check silently froze every bf16 weight (caught in review)."""
    return jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)


def _float_indices(leaves):
    return [i for i, leaf in enumerate(leaves) if is_float_leaf(leaf)]


def split_trainable(params):
    """(float_leaves, rebuild): quantized (int) leaves are frozen, so the
    optimizer and autodiff only ever see the float subset."""
    leaves, treedef = jax.tree.flatten(params)
    idx = _float_indices(leaves)

    def rebuild(float_leaves, all_leaves=None):
        base = list(all_leaves if all_leaves is not None else leaves)
        for i, v in zip(idx, float_leaves):
            base[i] = v
        return jax.tree.unflatten(treedef, base)

    return [leaves[i] for i in idx], rebuild


def sgd_update(floats, grads, lr):
    """Plain SGD on the float-leaf list, preserving each leaf's dtype
    (bf16 params get bf16 updates). Shared by llama.sgd_train_step and
    pipeline.make_pp_train_step so the update rule can't diverge."""
    return [(p - lr * g.astype(p.dtype)).astype(p.dtype)
            for p, g in zip(floats, grads)]


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.01,
                   clip: float = 1.0):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_train_state(params, optimizer, mesh: Mesh | None = None
                     ) -> TrainState:
    if mesh is not None:
        params = shard_params(params, mesh)
    floats, _ = split_trainable(params)
    opt_state = optimizer.init(floats)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg, optimizer, mesh: Mesh | None = None,
                    remat: bool = False, flash_train: bool = False):
    """Returns (step_fn, token_sharding). step_fn(state, tokens) ->
    (state, loss); jit-compiled, dp-sharded batch when a mesh is given."""
    def step(state: TrainState, tokens):
        all_leaves = jax.tree.leaves(state.params)
        floats, rebuild = split_trainable(state.params)

        def loss_of(floats):
            return llama.loss_fn(rebuild(floats, all_leaves), cfg,
                                 tokens, False, remat, flash_train)

        loss, grads = jax.value_and_grad(loss_of)(floats)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              floats)
        floats = optax.apply_updates(floats, updates)
        params = rebuild(floats, all_leaves)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    token_sharding = (NamedSharding(mesh, P("dp", None))
                      if mesh is not None else None)
    in_shardings = (None, token_sharding) if mesh is not None else None
    return jax.jit(step, in_shardings=in_shardings), token_sharding


def train(cfg, params, tokens_iter, n_steps: int, mesh: Mesh | None = None,
          lr: float = 3e-4, remat: bool = False,
          checkpoint_dir: str | None = None,
          checkpoint_every: int = 0,
          resume_from: str | None = None):
    """Minimal loop: iterate ``tokens_iter`` for n_steps total;
    checkpoints carry the FULL train state (params + optimizer moments +
    step), so ``resume_from`` continues a run bit-exactly — the
    elastic-recovery capability slot (SURVEY.md §5: the reference has
    none; fail-fast + resume-from-snapshot is the TPU-fleet idiom).
    ``n_steps`` counts the whole run: resuming at step k runs
    ``n_steps - k`` more."""
    from how_to_optimize_gemm_tpu.models import checkpoint
    optimizer = make_optimizer(lr)
    state = init_train_state(params, optimizer, mesh)
    if resume_from is not None:
        state = checkpoint.load_train_state(resume_from, state)
    step_fn, _ = make_train_step(cfg, optimizer, mesh, remat)
    losses = []
    for i in range(state.step, n_steps):
        tokens = next(tokens_iter)
        if mesh is not None:
            tokens = jax.device_put(
                tokens, NamedSharding(mesh, P("dp", None)))
        state, loss = step_fn(state, tokens)
        losses.append(float(loss))
        if (checkpoint_dir and checkpoint_every
                and (i + 1) % checkpoint_every == 0):
            checkpoint.save_train_state(
                f"{checkpoint_dir}/step_{i + 1:06d}", state)
    return state, losses

