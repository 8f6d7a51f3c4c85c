"""Finetune on the dp+tp mesh with optax + remat + checkpoints.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train.py --dp 2 --tp 4 --steps 10

Runs on whatever devices exist (virtual CPU mesh or a real slice).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import itertools

import jax

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.parallel import training
from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    # the CLI topology is explicit user input: running on a prefix of a
    # bigger host is intentional here, not a typo
    mesh = (make_mesh(dp=args.dp, tp=args.tp, allow_subset=True)
            if args.dp * args.tp > 1 else None)
    cfg = llama.LlamaConfig(vocab=512, d_model=64 * max(args.tp, 1),
                            n_layers=2, n_heads=max(args.tp, 1) * 2,
                            n_kv_heads=max(args.tp, 1) * 2,
                            d_ff=128 * max(args.tp, 1), max_seq=64,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    key = jax.random.PRNGKey(1)
    batch = jax.random.randint(key, (2 * max(args.dp, 1), 32), 0,
                               cfg.vocab)
    state, losses = training.train(
        cfg, params, itertools.repeat(batch), n_steps=args.steps,
        mesh=mesh, remat=args.remat,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=5 if args.checkpoint_dir else 0)
    print("losses:", [f"{x:.3f}" for x in losses])


if __name__ == "__main__":
    main()
