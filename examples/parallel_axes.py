#!/usr/bin/env python
"""Every parallelism axis in one script: dp+tp train, pp train,
ep MoE, sp ring attention — all on whatever devices are visible.

Run on the 8-device virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/parallel_axes.py
On a real slice the same code shards over the chips (dp over DCN,
tp/pp/ep hops over ICI).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.mesh import (
        make_axis_mesh, make_mesh)
    from how_to_optimize_gemm_tpu.parallel.moe import (
        init_moe_params, moe_ffn)
    from how_to_optimize_gemm_tpu.parallel.pipeline import llama_pp_forward
    from how_to_optimize_gemm_tpu.parallel.ring_attention import (
        ring_attention)
    from how_to_optimize_gemm_tpu.parallel.sharding import (
        make_sharded_train_step, shard_params)

    n = len(jax.devices())
    key = jax.random.PRNGKey(args.seed)

    # --- dp + tp: Megatron-sharded train step -------------------------
    dp = 2 if n % 2 == 0 else 1
    tp = n // dp
    mesh = make_mesh(dp=dp, tp=tp)
    cfg = llama.LlamaConfig(vocab=128, d_model=16 * tp, n_layers=2,
                            n_heads=tp, n_kv_heads=tp, d_ff=32 * tp,
                            max_seq=32, weight_kind="fp32")
    params = shard_params(llama.init_params(key, cfg), mesh)
    step, tok_sh = make_sharded_train_step(cfg, mesh, lr=0.1)
    tokens = jax.device_put(
        jax.random.randint(key, (2 * dp, 16), 0, cfg.vocab), tok_sh)
    _, loss = step(params, tokens)
    print(f"dp={dp} tp={tp} train loss: {float(loss):.4f}")

    # --- pp: GPipe over ppermute, gradients exact ---------------------
    pp_mesh = make_axis_mesh(pp=n)
    pcfg = llama.LlamaConfig(vocab=128, d_model=32, n_layers=n,
                             n_heads=4, n_kv_heads=2, d_ff=64,
                             max_seq=16, weight_kind="fp32")
    pparams = llama.init_params(key, pcfg)
    ptokens = jax.random.randint(key, (4, 8), 0, pcfg.vocab)

    def pp_loss(p):
        logits = llama_pp_forward(p, pcfg, ptokens[:, :-1], pp_mesh,
                                  n_micro=2)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        tgt = jax.nn.one_hot(ptokens[:, 1:], pcfg.vocab)
        return -jnp.mean(jnp.sum(logp * tgt, -1))

    val, grads = jax.value_and_grad(pp_loss)(pparams)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree.leaves(grads)))
    print(f"pp={n} stages loss: {float(val):.4f} "
          f"grad-norm: {float(gnorm):.4f}")

    # --- ep: top-2 routed MoE over all_to_all -------------------------
    ep_mesh = make_axis_mesh(ep=n)
    mparams = init_moe_params(key, 16, 32, 2 * n)
    mx = jax.random.normal(key, (8 * n, 16), jnp.float32)
    my = moe_ffn(mparams, mx, ep_mesh, k=2, capacity_factor=2.0)
    print(f"ep={n} moe out: shape={my.shape} "
          f"mean|y|={float(jnp.abs(my).mean()):.4f}")

    # --- sp/cp: ring attention, sequence sharded ----------------------
    s = 32 * n
    q = jax.random.normal(key, (1, 2, s, 64), jnp.float32)
    kv = jax.random.normal(key, (1, 1, s, 64), jnp.float32)
    out = ring_attention(q, kv, kv, ep_mesh, axis="ep", causal=True)
    print(f"sp ring attention S={s}: out {out.shape} finite="
          f"{bool(jnp.isfinite(out).all())}")


if __name__ == "__main__":
    main()
