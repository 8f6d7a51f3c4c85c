#!/usr/bin/env python
"""QLoRA-style finetune of a quantized-expert MoE model.

The expert stacks are quantized (int8 W8A16 by default, nibble-packed
int4 with --bits 4) and FROZEN — integer leaves never receive
gradients; the router, scales, norms, embeddings and attention float
leaves train. With --ragged the MLPs run through the grouped (ragged)
Pallas GEMM whose custom VJP keeps the quantized stacks frozen and
streams them at their stored width (1 B/elt int8, 0.5 B/elt int4) in
both passes.

Run hermetically:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/moe_finetune.py --steps 4 [--ragged] [--bits 4]
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import itertools

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--ragged", action="store_true",
                    help="route MLPs through the grouped-GEMM kernel")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--bits", type=int, default=8, choices=[4, 8],
                    help="expert-stack width (8 = W8A16, 4 = packed "
                         "nibbles)")
    args = ap.parse_args()

    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel import training

    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=32,
                            weight_kind="fp32", n_experts=4,
                            moe_ragged=args.ragged)
    qkey = "w_in_q" if args.bits == 8 else "w_in_q4"
    params = llama.requantize(
        llama.init_params(jax.random.PRNGKey(0), cfg),
        "int8" if args.bits == 8 else "w4a8")
    assert params["layers"][0]["moe"][qkey].dtype == jnp.int8

    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                cfg.vocab)
    before = jax.tree.map(lambda x: x, params)
    state, losses = training.train(cfg, params,
                                   itertools.repeat(tokens),
                                   n_steps=args.steps, lr=args.lr)
    moe0, moe1 = (p["layers"][0]["moe"]
                  for p in (before, state.params))
    frozen = bool(jnp.array_equal(moe0[qkey], moe1[qkey]))
    router_moved = not jnp.array_equal(moe0["router"], moe1["router"])
    scales_moved = not jnp.array_equal(moe0["w_in_s"], moe1["w_in_s"])
    print(f"losses: {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"(int{args.bits} stacks frozen={frozen}, "
          f"router moved={router_moved}, "
          f"scales moved={scales_moved}, ragged={args.ragged})")
    assert frozen and router_moved and scales_moved
    assert losses[-1] < losses[0]


if __name__ == "__main__":
    main()
