"""MoE silicon benchmarks — the measured numbers for the grouped-GEMM
(ragged) path vs the block-dispatch path.

Round 2 shipped the whole EP/ragged/QLoRA stack validated on the
virtual mesh + interpret-mode Pallas but never ran it on the chip (the
relay outage, RESULTS.md gap 5). This module is the committed
experiment: every claim about the ragged path's FLOP advantage gets a
chained, oracle-gated measurement, the same discipline as the GEMM
ladder (the reference commits its experiment logs the same way,
``cuda/MMult_cuda_11.cu:83-91``).

What it measures (CLI: ``python -m …parallel.moe_bench``):

- ``kernel``: raw ``grouped_matmul`` throughput (bf16 / int8-scaled /
  int4-packed stacks) at a uniform 8-expert layout — the Mosaic
  compile-and-run proof plus the kernel's own GFLOPS.
- ``prefill``: ``moe_ffn_ragged`` vs ``moe_ffn_local`` (block-dispatch)
  vs dense at T=4096 — the (E/k)x overcompute claim, measured.
- ``decode``: the same A/B at decode widths (T=batch) where both paths
  are weight-stream-bound and the ragged layout's advantage should
  vanish — an honest negative is a result.
- ``train``: one QLoRA-style train step (value_and_grad through the
  ragged path, int8 frozen stack + trainable scales) — compile + time.

Timing: ``utils.timing.build_chained`` with the MoE output fed back as
the next input (y normalized to unit max so thousands of chained calls
can't overflow) — the anti-hoisting discipline of the sweep driver.
Correctness: each timed path is cross-checked against moe_ffn_dense on
device before timing (gate 2e-2 for quantized stacks, 2e-3 dense).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from how_to_optimize_gemm_tpu.parallel import moe
from how_to_optimize_gemm_tpu.utils.timing import (build_chained,
                                                   measure)


def _normalized(fn):
    """Wrap a (params, x) -> y MoE call so y feeds the next chained
    call without overflow: rescale to unit max (one cheap reduction
    against three expert GEMMs)."""
    def run(params, x):
        y = fn(params, x)
        y32 = y.astype(jnp.float32)
        return (y32 / jnp.maximum(jnp.max(jnp.abs(y32)), 1.0)
                ).astype(x.dtype)
    return run


def _time_call(fn, params, x, label: str, flops: float | None = None,
               repeats: int = 3) -> float:
    thunk, iters = build_chained(fn, (params,), x, chain="acc")
    best = measure(thunk, repeats=repeats) / iters
    rate = f"  {flops / best / 1e12:8.2f} TFLOP/s" if flops else ""
    print(f"  {label:<34} {best * 1e3:9.3f} ms/call{rate}", flush=True)
    return best


def _gate(y, ref, label: str, tol: float):
    num = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    den = float(jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
    rel = num / den
    assert rel < tol, f"{label}: rel {rel:.3e} > {tol:g}"
    return rel


def _params(key, d, f, e, kind: str):
    p = moe.init_moe_params(key, d, f, e, swiglu=True)
    if kind == "int8":
        return moe.quantize_moe(p, bits=8)
    if kind == "int4":
        return moe.quantize_moe(p, bits=4)
    return p


def bench_kernel(d: int = 2048, e: int = 8, tp: int = 8192):
    """Raw grouped_matmul throughput: uniform tp/e-row segments per
    expert, square d=f stacks so the chained output feeds the next
    call's input directly (the acc-chain anti-hoisting discipline)."""
    from how_to_optimize_gemm_tpu.ops import quant
    from how_to_optimize_gemm_tpu.ops.pallas_grouped_gemm import (
        grouped_matmul)
    f = d
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (tp, d), jnp.bfloat16)
    w = jax.random.normal(key, (e, d, f), jnp.bfloat16)
    bt = 128
    block_expert = jnp.repeat(jnp.arange(e, dtype=jnp.int32),
                              tp // bt // e)
    flops = 2.0 * tp * d * f
    print(f"grouped_matmul kernel (Tp={tp}, d=f={d}, E={e}):",
          flush=True)

    def norm(fn):
        def run(w_, x_):
            y = fn(w_, x_).astype(jnp.float32)
            return (y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
                    ).astype(jnp.bfloat16)
        return run

    for kind in ("bf16", "int8", "int4"):
        if kind == "bf16":
            run0 = lambda w_, x_: grouped_matmul(x_, w_, block_expert)
            operand = w
        elif kind == "int8":
            q, s = quant.quantize_symmetric(
                w.astype(jnp.float32).reshape(e * d, f), axis=0)
            operand = q.reshape(e, d, f)
            s8 = jnp.full((e, 1, f), 1 / 127.0, jnp.float32)
            run0 = lambda w_, x_: grouped_matmul(
                x_, w_, block_expert, s8)
        else:
            q8, _ = quant.quantize_symmetric(
                w.astype(jnp.float32).reshape(e * d, f), axis=0)
            q4 = quant.pack_int4(
                jnp.clip(q8 // 16, -8, 7).astype(jnp.int8),
                block_k=d)    # (e*d//2, f)
            operand = q4.reshape(e, d // 2, f)
            s4 = jnp.full((e, 1, f), 1 / 7.0, jnp.float32)
            run0 = lambda w_, x_: grouped_matmul(
                x_, w_, block_expert, s4, packed4=True)
        y = run0(operand, x)
        if kind == "bf16":
            # on-device oracle: segment 0 == plain dot of its rows
            seg = tp // e
            ref = jnp.dot(x[:seg], w[0],
                          preferred_element_type=jnp.float32)
            _gate(y[:seg], ref.astype(y.dtype), "grouped bf16 seg0",
                  2e-2)
        thunk, iters = build_chained(norm(run0), (operand,), x,
                                     chain="acc")
        best = measure(thunk) / iters
        print(f"  {kind:<6} {best * 1e3:9.3f} ms  "
              f"{flops / best / 1e12:8.2f} TFLOP/s", flush=True)


def bench_prefill(t: int = 4096, d: int = 2048, f: int = 1408,
                  e: int = 8, k: int = 2, kind: str = "bf16"):
    """Ragged vs dispatch vs dense at prefill scale. Useful FLOPs =
    3 GEMMs x k routed copies; the dispatch path computes
    capacity*E/k/chunk-fraction more."""
    key = jax.random.PRNGKey(1)
    params = _params(key, d, f, e, kind)
    x = jax.random.normal(key, (t, d), jnp.bfloat16)
    # a sanity oracle, not the precision suite (tests/test_moe.py gates
    # fp32 exactness): bf16 activations through 3 GEMMs + softmax
    # routing legitimately carry ~1e-2 relative noise
    tol = 2e-2
    ref = moe.moe_ffn_dense(moe.dequantize_moe(params)
                            if kind != "bf16" else params, x, k=k)
    flops = 2.0 * 3 * k * t * d * f
    print(f"prefill MoE (T={t}, d={d}, d_ff={f}, E={e}, k={k}, "
          f"{kind}): useful {flops / 1e9:.1f} GFLOP/call", flush=True)

    paths = {
        "ragged (grouped GEMM)":
            lambda p, xx: moe.moe_ffn_ragged(p, xx, k=k),
        "dispatch (dropless cf=E/k)":
            lambda p, xx: moe.moe_ffn_local(p, xx, k=k,
                                            capacity_factor=e / k),
        "dispatch (cf=2)":
            lambda p, xx: moe.moe_ffn_local(p, xx, k=k,
                                            capacity_factor=2.0),
    }
    for label, fn in paths.items():
        if "cf=2" not in label:   # cf=2 may drop tokens: no oracle
            _gate(fn(params, x), ref, label, tol)
        _time_call(_normalized(fn), params, x, label, flops)


def bench_decode(batch: int = 8, d: int = 2048, f: int = 1408,
                 e: int = 8, k: int = 2, kind: str = "int8"):
    """Decode widths: both paths stream every expert's weights once per
    step, so weight HBM bounds both — the A/B that decides the llama
    family's decode routing."""
    key = jax.random.PRNGKey(2)
    params = _params(key, d, f, e, kind)
    x = jax.random.normal(key, (batch, d), jnp.bfloat16)
    wbytes = {"bf16": 2, "int8": 1, "int4": 0.5}[kind]
    stream = 3 * e * d * f * wbytes
    print(f"decode MoE (batch={batch}, d={d}, d_ff={f}, E={e}, k={k}, "
          f"{kind}): weight stream {stream / 1e6:.1f} MB/step",
          flush=True)
    for label, fn in {
        "ragged (grouped GEMM)": _normalized(
            lambda p, xx: moe.moe_ffn_ragged(p, xx, k=k)),
        "dispatch (dropless)": _normalized(
            lambda p, xx: moe.moe_ffn_local(p, xx, k=k,
                                            capacity_factor=e / k)),
    }.items():
        best = _time_call(fn, params, x, label)
        print(f"    -> {batch / best:.0f} tok/s/layer-MLP, "
              f"{stream / best / 1e9:.0f} GB/s weight stream",
              flush=True)


def bench_train(t: int = 2048, d: int = 2048, f: int = 1408,
                e: int = 8, k: int = 2, kind: str = "int8"):
    """QLoRA-style ragged train step: int8/int4 stack frozen, scales +
    router train through the custom VJPs."""
    key = jax.random.PRNGKey(3)
    params = _params(key, d, f, e, kind)
    x = jax.random.normal(key, (t, d), jnp.bfloat16)

    def loss_fn(p, xx):
        y, aux = moe.moe_ffn_ragged(p, xx, k=k, return_aux=True)
        return jnp.mean(y.astype(jnp.float32) ** 2) + 0.01 * aux

    # allow_int: the quantized stack leaves are int8/int4 with float0
    # cotangents (frozen, QLoRA-style) — same contract as
    # parallel/training.py
    grad_fn = jax.value_and_grad(loss_fn, allow_int=True)

    def step(p, xx):
        # chain through x: nudge the input by its own gradient so the
        # next chained call depends on this one end-to-end
        (_, dx) = jax.value_and_grad(lambda xx_: loss_fn(p, xx_))(xx)
        return (xx + dx.astype(xx.dtype)).astype(xx.dtype)

    loss, grads = jax.jit(grad_fn)(params, x)
    trainable = [kk for kk, v in grads.items()
                 if v.dtype != jax.dtypes.float0]
    print(f"train step (T={t}, {kind} stack): loss {float(loss):.4f}, "
          f"trainable leaves {sorted(trainable)}", flush=True)
    _time_call(step, params, x, f"ragged {kind} fwd+bwd(x)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("parts", nargs="*",
                    default=["kernel", "prefill", "decode", "train"],
                    choices=["kernel", "prefill", "decode", "train"])
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--f", type=int, default=1408)
    ap.add_argument("--e", type=int, default=8)
    ap.add_argument("--kind", default=None,
                    help="override stack kind for prefill/decode/train")
    args = ap.parse_args(argv)
    if "kernel" in args.parts:
        bench_kernel(d=args.d, e=args.e)
    if "prefill" in args.parts:
        bench_prefill(t=args.t, d=args.d, f=args.f, e=args.e,
                      kind=args.kind or "bf16")
        if args.kind is None:
            bench_prefill(t=args.t, d=args.d, f=args.f, e=args.e,
                          kind="int8")
    if "decode" in args.parts:
        bench_decode(d=args.d, f=args.f, e=args.e,
                     kind=args.kind or "int8")
    if "train" in args.parts:
        bench_train(d=args.d, f=args.f, e=args.e,
                    kind=args.kind or "int8")


if __name__ == "__main__":
    main()
