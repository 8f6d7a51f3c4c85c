"""Controlled probe of the relay's host-dispatch cost model.

Round-3/4 established that batch-1 7B decode is HOST-DISPATCH-bound
(~14 ms of device-idle gaps per W=8 window, RESULTS.md "Speculative
decoding economics") and killed three hypotheses by measurement:

- per argument LEAF:   flat 1 -> 512 leaves (round 3)
- fixed per DISPATCH:  W=8 -> 64 windows barely moved tok/s (round 3)
- per op INSTANCE:     -28% instances (fuse_projections) got WORSE (r4)

This module is the round-5 controlled experiment the verdict asked
for: synthetic jitted programs where exactly ONE quantity varies,
wall-clocked on the real chip. Probes:

1. ``probe_op_chain(kind, ns)`` — ONE jit whose body is a Python-
   unrolled chain of N data-dependent ops (each a distinct HLO op
   instance, like the ~590 ops of a 7B decode step). Slope of wall
   vs N = the marginal per-op charge, separated by op kind:
   ``dot`` (one MXU fusion each), ``custom`` (one Pallas custom call
   each), ``eltwise`` (control: XLA fuses the chain to ~1 fusion, so
   a flat line proves the charge follows EXECUTED ops, not traced
   ones).
2. ``probe_output_bytes(sizes)`` — fixed 64-dot chain returning an
   extra device output of S bytes (never fetched; then fetched) —
   does the relay charge per output byte held / per byte pulled?
3. ``probe_async_depth(depths)`` — K back-to-back dispatches of one
   ~10 ms program, blocking after each vs blocking once at the end.
   If async enqueue pipelines (per-call wall ~ device time), the
   serving engine can hide the round trip by running a window ahead;
   if not, the round trip is a hard per-dispatch tax.

Reference slot: the mperf-TMA "measure, don't guess" discipline
(``aarch64/test_MMult.cpp:64-124``) and the Vulkan control-shader
subtraction (``vulkan/benchmark/gflops_fmla.cpp:45-50``).

Run: ``python -m how_to_optimize_gemm_tpu.ops.dispatch_probe``
(add ``--fast`` for a reduced sweep).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.utils.env import default_interpret
from how_to_optimize_gemm_tpu.utils.timing import dclock, flush


# ------------------------------------------------------------- op kinds

def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.float32(1.0).astype(x_ref.dtype)


def _custom_op(x, interpret):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _make_chain(kind: str, n: int, interpret: bool):
    """One jitted thunk: x -> n chained ops of `kind` -> scalar."""
    d = 256
    x0 = jnp.ones((8, d), jnp.bfloat16)
    w = (jnp.eye(d, dtype=jnp.bfloat16) * 0.5 +
         jnp.full((d, d), 1e-3, jnp.bfloat16))

    if kind == "dot":
        def body(x):
            for _ in range(n):
                x = jnp.dot(x, w)  # serial dep; one dot-fusion per op
            return jnp.sum(x)
        args = (x0,)

        def fn(x):
            return body(x)
    elif kind == "custom":
        def fn(x):
            for _ in range(n):
                x = _custom_op(x, interpret)
            return jnp.sum(x)
        args = (x0,)
    elif kind == "eltwise":
        def fn(x):
            for _ in range(n):
                x = x * jnp.bfloat16(1.0009765625) + jnp.bfloat16(1e-3)
            return jnp.sum(x)
        args = (x0,)
    else:
        raise ValueError(kind)

    jfn = jax.jit(fn)
    return jfn, args


def _wall_best(jfn, args, repeats: int = 5, warmup: int = 2) -> float:
    for _ in range(warmup):
        flush(jfn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = dclock()
        flush(jfn(*args))
        best = min(best, dclock() - t0)
    return best


def probe_op_chain(kind: str, ns=(32, 128, 512, 1024),
                   interpret: bool | None = None,
                   repeats: int = 5):
    """Wall per launch vs N chained ops; returns (rows, slope_us, icept_ms).

    rows: list of (n, wall_s). slope_us = marginal per-op charge in
    microseconds (least squares); icept_ms = fixed per-dispatch part.
    """
    interpret = default_interpret(interpret)
    rows = []
    for n in ns:
        jfn, args = _make_chain(kind, n, interpret)
        rows.append((n, _wall_best(jfn, args, repeats=repeats)))
    xs = np.array([r[0] for r in rows], np.float64)
    ys = np.array([r[1] for r in rows], np.float64)
    slope, icept = np.polyfit(xs, ys, 1)
    return rows, slope * 1e6, icept * 1e3


# -------------------------------------------------------- output bytes

def probe_output_bytes(sizes=(1 << 12, 1 << 18, 1 << 22, 1 << 24),
                       repeats: int = 5):
    """Fixed 64-op chain + one extra S-byte output.

    Returns rows (bytes, wall_held_s, wall_fetched_s): `held` blocks on
    the output without pulling it (charge for producing/holding S bytes
    on device), `fetched` adds jax.device_get (wire transfer)."""
    d = 256
    x0 = jnp.ones((8, d), jnp.bfloat16)
    w = (jnp.eye(d, dtype=jnp.bfloat16) * 0.5 +
         jnp.full((d, d), 1e-3, jnp.bfloat16))
    rows = []
    for size in sizes:
        n_el = size // 4

        @jax.jit
        def fn(x, n_el=n_el):
            for _ in range(64):
                x = jnp.dot(x, w)
            big = jnp.full((n_el,), 1.0, jnp.float32) * x[0, 0].astype(
                jnp.float32)
            return jnp.sum(x), big

        for _ in range(2):
            jax.block_until_ready(fn(x0))
        held = float("inf")
        fetched = float("inf")
        for _ in range(repeats):
            t0 = dclock()
            jax.block_until_ready(fn(x0))
            held = min(held, dclock() - t0)
        for _ in range(repeats):
            t0 = dclock()
            _, big = fn(x0)
            np.asarray(jax.device_get(big))
            fetched = min(fetched, dclock() - t0)
        rows.append((size, held, fetched))
    return rows


# --------------------------------------------------------- async depth

def probe_async_depth(depths=(1, 2, 4, 8), device_ms: float = 10.0,
                      repeats: int = 3):
    """K back-to-back dispatches of a ~device_ms program.

    Returns rows (k, per_call_blocking_s, per_call_async_s). If the
    async column approaches the program's device time while blocking
    stays at device + round trip, the round trip is PIPELINEABLE —
    the engine can run a window ahead of the token fetch."""
    d = 512
    x0 = jnp.ones((8, d), jnp.bfloat16)
    w = (jnp.eye(d, dtype=jnp.bfloat16) * 0.5 +
         jnp.full((d, d), 1e-3, jnp.bfloat16))

    # Calibrate a fori_loop dot chain to ~device_ms.
    def make(iters):
        @jax.jit
        def fn(x):
            def body(_, xx):
                return jnp.dot(xx, w)
            return jax.lax.fori_loop(0, iters, body, x)
        return fn

    iters = 256
    fn = make(iters)
    flush(fn(x0))
    t0 = dclock()
    flush(fn(x0))
    per = (dclock() - t0) / iters
    iters = max(int(device_ms * 1e-3 / max(per, 1e-9)), 8)
    fn = make(iters)
    jax.block_until_ready(fn(x0))

    rows = []
    for k in depths:
        blocking = float("inf")
        asynch = float("inf")
        for _ in range(repeats):
            x = x0
            t0 = dclock()
            for _ in range(k):
                x = fn(x)
                jax.block_until_ready(x)
            blocking = min(blocking, (dclock() - t0) / k)
        for _ in range(repeats):
            x = x0
            t0 = dclock()
            for _ in range(k):
                x = fn(x)          # enqueue only
            jax.block_until_ready(x)
            asynch = min(asynch, (dclock() - t0) / k)
        rows.append((k, blocking, asynch))
    return rows


# --------------------------------------------------------------- report

def main(fast: bool = False):
    dev = jax.devices()[0]
    print(f"# dispatch probe on {dev.platform} ({dev.device_kind})")
    # Null round trip (the known ~23 ms figure, re-measured for context).
    x = jnp.zeros((8, 128), jnp.float32)
    null = jax.jit(lambda x: jnp.sum(x) + 1.0)
    flush(null(x))
    best = float("inf")
    for _ in range(10):
        t0 = dclock()
        flush(null(x))
        best = min(best, dclock() - t0)
    print(f"# null dispatch+readback round trip: {best*1e3:.2f} ms")

    ns = (32, 128, 512) if fast else (32, 128, 512, 1024, 2048)
    for kind in ("eltwise", "dot", "custom"):
        rows, slope_us, icept_ms = probe_op_chain(kind, ns=ns)
        tab = "  ".join(f"N={n}:{w*1e3:.1f}ms" for n, w in rows)
        print(f"# chain[{kind:8s}] {tab}")
        print(f"#   -> marginal {slope_us:8.2f} us/op, "
              f"fixed {icept_ms:6.2f} ms/dispatch")

    sizes = ((1 << 16, 1 << 22) if fast
             else (1 << 12, 1 << 18, 1 << 22, 1 << 24, 1 << 26))
    rows = probe_output_bytes(sizes=sizes)
    for size, held, fetched in rows:
        print(f"# outbytes {size/2**20:8.2f} MB  held {held*1e3:7.2f} ms"
              f"  fetched {fetched*1e3:7.2f} ms"
              f"  (wire {(size/max(fetched-held,1e-9))/2**30:6.2f} GB/s)")

    rows = probe_async_depth(depths=(1, 2, 4) if fast else (1, 2, 4, 8))
    for k, blocking, asynch in rows:
        print(f"# async depth {k}: blocking {blocking*1e3:7.2f} "
              f"ms/call, async {asynch*1e3:7.2f} ms/call")
    hidden = rows[-1][1] - rows[-1][2]
    print(f"# -> pipelining hides {hidden*1e3:.2f} ms/call at depth "
          f"{rows[-1][0]}")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true")
    a = p.parse_args()
    main(fast=a.fast)
