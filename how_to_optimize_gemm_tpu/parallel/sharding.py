"""Parameter/activation shardings for the flagship model.

Classic Megatron-style tensor parallelism expressed as NamedShardings over
the (dp, tp) mesh — XLA's sharding propagation inserts the ICI collectives
(all-gather into attention, reduce-scatter/psum after the row-parallel
projections), which is the TPU-native replacement for hand-written NCCL
calls (SURVEY.md §2.6):

- wq/wk/wv, w_gate/w_up: column-parallel  -> shard output dim on tp
- wo, w_down:            row-parallel     -> shard input dim on tp
- lm_head:               column-parallel over vocab
- norms, embed:          replicated
- batch (tokens):        sharded on dp
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _linear_specs(col_parallel: bool) -> dict[str, P]:
    """Specs for every storage format of models/linear.make_linear.

    Weight is (d_in, d_out): column-parallel shards d_out, row-parallel
    shards d_in. int8 per-column scales (1, d_out) follow the d_out
    sharding; int4 packed weights are (d_in//2, d_out), same layout.
    """
    if col_parallel:
        w = P(None, "tp")
        scale = P(None, "tp")
    else:
        w = P("tp", None)
        scale = P()  # per-column scales of a row-sharded W are replicated
    return {
        "fp32_w": w, "bf16_w": w,
        "int8_qw": w, "int8_sw": scale,
        "int4_packed": w, "int4_sw": scale, "int4_kdim": P(),
        "w4a8_packed": w, "w4a8_sw": scale, "w4a8_kdim": P(),
    }


def _spec_for_linear(lin: dict[str, Any], col_parallel: bool):
    table = _linear_specs(col_parallel)
    return {k: table[k] for k in lin}


def param_specs(params: dict[str, Any]) -> dict[str, Any]:
    """PartitionSpec pytree matching models/llama.init_params output."""
    col = True
    layers = []
    for layer in params["layers"]:
        specs = {
            "attn_norm": P(),
            "wq": _spec_for_linear(layer["wq"], col),
            "wk": _spec_for_linear(layer["wk"], col),
            "wv": _spec_for_linear(layer["wv"], col),
            "wo": _spec_for_linear(layer["wo"], not col),
            "mlp_norm": P(),
        }
        if "moe" in layer:
            # Megatron INSIDE each expert: w_in/w_gate column-parallel
            # on d_ff, w_out row-parallel — XLA psums after the down
            # projection exactly as for the dense MLP. Without this the
            # mixtral-class expert stacks (~90 GB bf16 at 8x7B) would
            # replicate onto every chip. Expert parallelism over an ep
            # axis (parallel/moe.moe_ffn) composes separately.
            col3 = P(None, None, "tp")
            row3 = P(None, "tp", None)
            moe_table = {
                "router": P(),
                "w_in": col3, "w_in_q": col3, "w_in_q4": col3,
                "w_in_s": col3,
                "w_gate": col3, "w_gate_q": col3, "w_gate_q4": col3,
                "w_gate_s": col3,
                "w_out": row3, "w_out_q": row3, "w_out_q4": row3,
                # scales of the row-sharded down projection are per
                # output column -> replicated
                "w_out_s": P(),
            }
            specs["moe"] = {k: moe_table[k] for k in layer["moe"]}
        else:
            specs["w_gate"] = _spec_for_linear(layer["w_gate"], col)
            specs["w_up"] = _spec_for_linear(layer["w_up"], col)
            specs["w_down"] = _spec_for_linear(layer["w_down"], not col)
        layers.append(specs)
    return {
        "embed": P(),
        "out_norm": P(),
        "lm_head": _spec_for_linear(params["lm_head"], col),
        "layers": layers,
    }


def shard_params(params, mesh: Mesh):
    """Place a params tree onto the mesh with the TP layout above."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))


def make_sharded_train_step(cfg, mesh: Mesh, lr: float = 1e-2):
    """jit-compiled dp+tp training step: tokens sharded on dp, params on
    tp, gradients reduced by XLA's propagation."""
    from how_to_optimize_gemm_tpu.models import llama

    from how_to_optimize_gemm_tpu.parallel.training import split_trainable

    def step(params, tokens):
        # differentiate only the float leaves: int leaves (quantized
        # weights) would make value_and_grad raise outright, and
        # dtype.kind checks are a trap (bf16 kind is 'V')
        all_leaves = jax.tree.leaves(params)
        floats, rebuild = split_trainable(params)

        def loss_of(floats):
            return llama.loss_fn(rebuild(floats, all_leaves), cfg,
                                 tokens, False)

        loss, grads = jax.value_and_grad(loss_of)(floats)
        floats = [(p - lr * g.astype(p.dtype)).astype(p.dtype)
                  for p, g in zip(floats, grads)]
        return rebuild(floats, all_leaves), loss

    token_sharding = NamedSharding(mesh, P("dp", None))
    return jax.jit(step, in_shardings=(None, token_sharding)), \
        token_sharding
