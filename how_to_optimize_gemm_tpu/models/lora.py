"""Multi-LoRA serving: per-request low-rank adapters in one batch.

The serving-side counterpart of the QLoRA training story (frozen
quantized bases + trainable low-rank deltas, parallel/training.py): a
stack of N adapters lives on device as (N, d_in, r) / (N, r, d_out)
pairs per target linear, each REQUEST selects an adapter id, and the
decode step applies ``y += scale * (x @ A[id]) @ B[id]`` with the ids
gathered per batch row — the batched-gather matmul (BGMV) pattern, as
einsums over the gathered stacks (r is small; the MXU cost is two
rank-r passes per target). id -1 means "base model": the gather is
clamped and the delta masked, so mixed batches (some rows base, some
adapted) run in the same dispatch.

Adapter trees are pure pytrees like everything else (sharding-
annotatable per leaf); `merge_lora` folds one adapter into dense
weights for parity testing and for serving a single adapter at zero
overhead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("wq", "wv")


def init_lora(key, cfg, n_adapters: int, rank: int,
              targets=DEFAULT_TARGETS, alpha: float | None = None,
              dtype=jnp.bfloat16):
    """Adapter stacks for every layer x target: A ~ N(0, 1/d_in) and
    B = 0 (the standard LoRA init — identity at t=0); scale =
    alpha / rank (alpha defaults to rank, scale 1)."""
    dims = _target_dims(cfg)
    layers = []
    for _ in range(cfg.n_layers):
        entry = {}
        for t in targets:
            d_in, d_out = dims[t]
            key, ka = jax.random.split(key)
            a = jax.random.normal(ka, (n_adapters, d_in, rank),
                                  jnp.float32) * (d_in ** -0.5)
            entry[t] = (a.astype(dtype),
                        jnp.zeros((n_adapters, rank, d_out), dtype))
        layers.append(entry)
    return {"layers": layers,
            "scale": float((alpha if alpha is not None else rank)
                           / rank)}


def _target_dims(cfg):
    d, h, kvh, dh = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.d_head
    return {
        "wq": (d, h * dh), "wk": (d, kvh * dh), "wv": (d, kvh * dh),
        "wo": (h * dh, d), "w_gate": (d, cfg.d_ff),
        "w_up": (d, cfg.d_ff), "w_down": (cfg.d_ff, d),
    }


def lora_delta(entry, x, idx, scale):
    """BGMV: x (B, S, d_in), entry = (A, B) stacks, idx (B,) int32
    adapter per row (-1 = none) -> (B, S, d_out) delta. The gather is
    clamped and dead rows masked, so -1 rows cost the same FLOPs but
    contribute exactly zero (mixed batches stay one dispatch)."""
    a, b = entry
    safe = jnp.clip(idx, 0, a.shape[0] - 1)
    al = a[safe]                                   # (B, d_in, r)
    bl = b[safe]                                   # (B, r, d_out)
    live = (idx >= 0).astype(jnp.float32)[:, None, None]
    mid = jnp.einsum("bsd,bdr->bsr", x.astype(al.dtype), al,
                     preferred_element_type=jnp.float32)
    delta = jnp.einsum("bsr,bro->bso", mid.astype(bl.dtype), bl,
                       preferred_element_type=jnp.float32)
    return scale * live * delta


def make_lora_train_step(cfg, optimizer, adapter: int = 0,
                         remat: bool = False):
    """LoRA finetuning: returns step(params, lora, opt_state, tokens)
    -> (lora, opt_state, loss), jit-compiled.

    Only ``lora["layers"]`` is differentiated — the base params never
    appear in the grad tree, so they are frozen by construction (and
    may be QUANTIZED: int8/int4 bases work unchanged, because the
    delta is additive AFTER apply_linear — QLoRA on the dense model,
    the serving-side counterpart of the MoE ragged-path QLoRA in
    parallel/training). Gradients reach only adapter ``adapter``'s
    slices: the BGMV gather's VJP is a scatter-add onto the selected
    slot, so co-resident adapters are untouched (tested).
    ``scale`` (alpha/rank) is a fixed hyperparameter, not trained."""
    import optax

    from how_to_optimize_gemm_tpu.models import llama

    def step(params, lora, opt_state, tokens):
        idx = jnp.full((tokens.shape[0],), adapter, jnp.int32)

        def loss_of(layers):
            tree = {"layers": layers, "scale": lora["scale"]}
            logits = llama.forward(params, cfg, tokens[:, :-1],
                                   use_pallas=False, remat=remat,
                                   lora=tree, lora_idx=idx)
            return llama.token_nll(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_of)(lora["layers"])
        updates, opt_state = optimizer.update(grads, opt_state,
                                              lora["layers"])
        layers = optax.apply_updates(lora["layers"], updates)
        return ({"layers": layers, "scale": lora["scale"]}, opt_state,
                loss)

    return jax.jit(step)


def set_adapter(lora, i: int, layers_ab):
    """Write adapter slot i from a per-layer list of {target: (A, B)}
    (single-adapter shapes (d_in, r)/(r, d_out)) — the loading path for
    externally trained adapters."""
    out_layers = []
    for entry, new in zip(lora["layers"], layers_ab):
        e = {}
        for t, (a, b) in entry.items():
            if t in new:
                na, nb = new[t]
                a = a.at[i].set(na.astype(a.dtype))
                b = b.at[i].set(nb.astype(b.dtype))
            e[t] = (a, b)
        out_layers.append(e)
    return {"layers": out_layers, "scale": lora["scale"]}


def merge_lora(params, cfg, lora, i: int):
    """Fold adapter i into dense fp32 weights: W <- W + scale * A@B.
    Parity oracle for the batched path and the zero-overhead way to
    serve ONE adapter. Requires fp32 linears (merge then requantize
    for quantized serving)."""
    from how_to_optimize_gemm_tpu.models.linear import linear_kind

    out = {k: v for k, v in params.items()}
    layers = []
    for layer, entry in zip(params["layers"], lora["layers"]):
        nl = {k: v for k, v in layer.items()}
        for t, (a, b) in entry.items():
            lin = nl[t]
            assert linear_kind(lin) == "fp32", \
                "merge_lora needs fp32 linears (requantize after)"
            delta = (a[i].astype(jnp.float32)
                     @ b[i].astype(jnp.float32)) * lora["scale"]
            nl[t] = {"fp32_w": lin["fp32_w"] + delta}
        layers.append(nl)
    out["layers"] = layers
    return out
