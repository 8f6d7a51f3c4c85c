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
import numpy as np
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


# ----------------------------------------------------------- soak CLI

def _affine_batch(rng: np.random.Generator, batch: int, seq: int,
                  vocab: int, a: int = 7, c: int = 31,
                  noise: float = 0.02) -> np.ndarray:
    """Learnable synthetic stream: x[t+1] = (a*x[t] + c) % vocab with
    a little token noise. Random-uniform tokens would pin the loss at
    ln(vocab) (nothing to learn); an affine next-token map gives the
    soak a real falling loss curve whose floor is the noise entropy."""
    x = np.empty((batch, seq), np.int64)
    x[:, 0] = rng.integers(0, vocab, batch)
    for t in range(1, seq):
        x[:, t] = (a * x[:, t - 1] + c) % vocab
    flip = rng.random((batch, seq)) < noise
    x[flip] = rng.integers(0, vocab, int(flip.sum()))
    return x.astype(np.int32)


def soak_main(argv=None):
    """On-chip training soak (round-5 task 5): N optimizer steps on the
    real device with a committed loss curve, steady-state tokens/s and
    MFU vs the bf16 MXU roofline, a mid-run checkpoint, and (second
    invocation with --resume-from) a bit-exact-continuation check
    against the first run's artifact. The training twin of the
    serving-side 592 tok/s protocol (reference discipline: committed
    results per run, ``aarch64/output_MMult_4x4_18.m``)."""
    import argparse
    import json
    import pathlib
    import time

    ap = argparse.ArgumentParser(description=soak_main.__doc__)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--n-layers", type=int, default=22)
    ap.add_argument("--d-ff", type=int, default=5632)
    ap.add_argument("--n-heads", type=int, default=32)
    ap.add_argument("--n-kv-heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--flash-train", action="store_true")
    ap.add_argument("--checkpoint-every", type=int, default=100)
    ap.add_argument("--ckpt-dir", default="outputs/train_soak_ckpt")
    ap.add_argument("--artifact", default="outputs/train_soak.json")
    ap.add_argument("--resume-from", default=None,
                    help="checkpoint dir; continues and asserts the "
                         "loss tail equals the artifact's bit-exactly")
    ap.add_argument("--sync-every", type=int, default=25,
                    help="block on the loss every N steps (bounds the "
                         "async dispatch queue; per-step fetches would "
                         "add the relay round trip to every step)")
    args = ap.parse_args(argv)

    cfg = llama.LlamaConfig(
        vocab=args.vocab, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=args.n_heads, n_kv_heads=args.n_kv_heads,
        d_ff=args.d_ff, max_seq=args.seq, weight_kind="bf16")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(args.lr)
    state = init_train_state(params, optimizer)
    start_step = 0
    if args.resume_from:
        from how_to_optimize_gemm_tpu.models import checkpoint
        state = checkpoint.load_train_state(args.resume_from, state)
        start_step = int(state.step)
        print(f"# resumed from {args.resume_from} at step {start_step}")
    step_fn, _ = make_train_step(cfg, optimizer, remat=args.remat,
                                 flash_train=args.flash_train)

    # deterministic data stream: step i's batch is a pure function of i,
    # so a resumed run replays the identical token sequence
    def batch_at(i):
        return _affine_batch(np.random.default_rng(1234 + i),
                             args.batch, args.seq, args.vocab)

    # warm the compile (the first step is the remote-compile step)
    state, loss0 = step_fn(state, jnp.asarray(batch_at(start_step)))
    jax.block_until_ready(loss0)
    losses = [loss0]
    t0 = time.perf_counter()
    marks = []
    from how_to_optimize_gemm_tpu.models import checkpoint
    for i in range(start_step + 1, args.steps):
        state, loss = step_fn(state, jnp.asarray(batch_at(i)))
        losses.append(loss)
        if args.sync_every and (i + 1) % args.sync_every == 0:
            jax.block_until_ready(loss)
            marks.append((i + 1, time.perf_counter() - t0))
        if (args.checkpoint_every
                and (i + 1) % args.checkpoint_every == 0
                and (i + 1) < args.steps):
            jax.block_until_ready(state.params)
            p = f"{args.ckpt_dir}/step_{i + 1:06d}"
            checkpoint.save_train_state(p, state)
            print(f"# checkpoint @ step {i + 1} -> {p}")
    jax.block_until_ready(losses[-1])
    wall = time.perf_counter() - t0
    losses = [float(l) for l in losses]

    n_steps_timed = args.steps - start_step - 1
    toks = args.batch * args.seq
    tps = n_steps_timed * toks / wall if n_steps_timed else 0.0
    # MFU: 6 * n_params * tokens fwd+bwd FLOPs vs the measured bf16
    # MXU rate (probes: ~181 TF/s on this v5e)
    nparams = sum(x.size for x in jax.tree.leaves(params)
                  if hasattr(x, "size"))
    mfu = 6.0 * nparams * tps / 181e12
    print(f"# {n_steps_timed} steps in {wall:.1f}s = "
          f"{tps:,.0f} tok/s, loss {losses[0]:.4f} -> {losses[-1]:.4f}"
          f", MFU {mfu * 100:.1f}% of 181 TF bf16")

    art = {
        "config": {k: getattr(args, k) for k in
                   ("d_model", "n_layers", "d_ff", "n_heads",
                    "n_kv_heads", "vocab", "seq", "batch", "steps",
                    "lr", "remat")},
        "start_step": start_step, "losses": losses,
        "tokens_per_s": round(tps, 1), "mfu_pct": round(mfu * 100, 2),
        "wall_s": round(wall, 2),
        "sync_marks": marks,
    }
    path = pathlib.Path(args.artifact)
    if args.resume_from:
        prior = json.loads(path.read_text())
        tail = prior["losses"][start_step - prior["start_step"]:]
        same = np.array_equal(np.asarray(tail, np.float64),
                              np.asarray(losses, np.float64))
        art["bitexact_resume_vs"] = str(path)
        art["bitexact_resume"] = bool(same)
        path = path.with_suffix(".resume.json")
        print(f"# resume bit-exact vs artifact: {same}"
              + ("" if same else f"  (first diff at "
                 f"{next(i for i, (a, b) in enumerate(zip(tail, losses)) if a != b)})"))
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(art) + "\n")
    print(f"# artifact -> {path}")


if __name__ == "__main__":
    soak_main()
