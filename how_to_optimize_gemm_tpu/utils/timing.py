"""Timing — equivalent of the reference's dclock (aarch64/dclock.cpp:8-22).

Honest benchmarking on TPU (the hard part named in SURVEY.md §7) needs
three ingredients on top of a monotonic clock:

1. **Forced completion.** Dispatch is async and, behind a remote-relay
   PJRT platform, even ``block_until_ready`` can return before the chip
   finishes. Every timed region therefore ends by fetching a scalar
   *reduction of the output* to the host — dataflow forces the full
   computation.
2. **Back-to-back chaining.** A single launch is swamped by host->device
   round-trip latency, so we time ``inner_iters`` GEMMs serially chained
   through the C accumulator inside ONE jit — the policy of the
   reference's CUDA harness (NREPEATS launches between two cudaEvents,
   ``cuda/test_MMult.cpp:98-118``), with the chaining making overlap or
   elision impossible.
3. **Null-cost subtraction.** The fixed dispatch+readback round trip is
   measured with a trivial kernel and subtracted — the same
   control-measurement trick as the reference's Vulkan FMA probe, which
   subtracts a read/write-only shader (``vulkan/benchmark/
   gflops_fmla.cpp:45-50``).

Best-of-``outer_repeats`` on the outside, like the CPU harness
(``aarch64/test_MMult.cpp:105-117``).

When the native C++ helper library is built (csrc/), ``dclock`` uses its
CLOCK_MONOTONIC_RAW reader; otherwise time.perf_counter.
"""
from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def dclock() -> float:
    """Seconds from a monotonic clock (native if available)."""
    try:
        from how_to_optimize_gemm_tpu.utils.native import native_dclock
        return native_dclock()
    except Exception:
        return time.perf_counter()


def flush(x) -> float:
    """Force completion: pull a scalar reduction of x to the host.

    The reduction is dispatched on device so only 4 bytes cross the wire;
    its data dependency on every element of x forces the computation."""
    return float(np.asarray(jnp.sum(x)))


@functools.cache
def dispatch_overhead_s() -> float:
    """Measured null round trip: dispatch a trivial jitted op + scalar
    readback. Subtracted from every timed region (control measurement)."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x) + 1.0)
    flush(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = dclock()
        flush(f(x))
        best = min(best, dclock() - t0)
    return best


def measure(fn: Callable[[], jax.Array], repeats: int = 3,
            warmup: int = 1, subtract_overhead: bool = True) -> float:
    """Best-of wall seconds for fn (a jitted thunk returning an array whose
    scalar reduction we fetch), null round trip subtracted."""
    overhead = dispatch_overhead_s() if subtract_overhead else 0.0
    for _ in range(warmup):
        flush(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = dclock()
        flush(fn())
        best = min(best, dclock() - t0)
    return max(best - overhead, 1e-9)


def build_chained(run: Callable[..., jax.Array], prepared: tuple,
                  c: jax.Array, *, chain: str = "acc",
                  inner_iters: int = 8, target_s: float = 0.5,
                  max_iters: int = 65536):
    """Compile-and-warm a chained launch for ``run(*prepared, c)``.

    Returns ``(thunk, iters)``: ``thunk()`` dispatches ONE chained
    launch of ``iters`` serial calls (see time_chained's chain policies)
    and returns the output array for flushing. The chain length is
    auto-scaled so one launch covers ~``target_s`` of device time —
    the same policy as time_chained, factored out so the A/B protocol
    (harness/ab.py) can interleave launches of two pre-built rungs
    inside one session without re-entering the builder."""
    overhead = dispatch_overhead_s()
    chain_via_b = chain == "via_b"

    if chain_via_b:
        # Contractive rescale of A (timing-only copy, same shape/dtype/
        # layout) so the via-B chain can't blow up to inf over thousands
        # of iterations.
        a0 = prepared[0]
        a_scaled = (a0.astype(jnp.float32) * (2.0 / a0.shape[1])
                    ).astype(a0.dtype)
        operands = (a_scaled,)
    else:
        operands = tuple(prepared)

    # Operands/C are jit ARGUMENTS, never closure captures: a captured
    # device array is serialized as an inline constant into the lowered
    # module (observed: a 100 MB MLIR blob at 4096^2 that crashed the
    # compile helper).
    def make(iters):
        @jax.jit
        def chained(ops, cin, c0):
            if chain == "barrier":
                def body(_, carry):
                    ops_, cc = carry
                    out = run(*ops_, cc)
                    # Re-barrier the operands each iteration: they stay
                    # loop-carried, so licm can't hoist the matmul.
                    return (jax.lax.optimization_barrier(ops_), out)
                _, out = jax.lax.fori_loop(0, iters, body, (ops, c0))
            else:
                if chain_via_b:
                    def body(_, cc):
                        return run(ops[0], cc, cin)
                else:
                    def body(_, cc):
                        return run(*ops, cc)
                out = jax.lax.fori_loop(0, iters, body, c0)
            # Scalar reduction: the flush fetch depends on every element.
            return jnp.sum(out)
        return chained

    iters = max(inner_iters, 1)
    fn = make(iters)
    flush(fn(operands, c, c))  # compile + warm
    t0 = dclock()
    flush(fn(operands, c, c))
    t_total = dclock() - t0
    # est floor 1e-7: small problems can measure under the round-trip
    # jitter; a too-high floor capped the chain length and let p<=1024
    # rows report garbage (clamped-at-1e-9 "2^37 GFLOPS" artifacts).
    est_call = max((t_total - overhead) / iters, 1e-7)
    want = int(min(max(target_s / est_call, iters), max_iters))
    if want > 2 * iters:
        iters = want
        fn = make(iters)
        flush(fn(operands, c, c))  # compile + warm
    return (lambda: fn(operands, c, c)), iters


def time_chained(run: Callable[..., jax.Array], prepared: tuple,
                 c: jax.Array, inner_iters: int = 8,
                 outer_repeats: int = 3, warmup: int = 1,
                 target_s: float = 0.5, max_iters: int = 65536,
                 chain_via_b: bool = False,
                 chain: str | None = None) -> float:
    """Per-call seconds for ``run(*prepared, c)`` (see module docstring).

    The chain length auto-scales until the chained work dominates the
    dispatch round trip (target_s of device time), otherwise the
    overhead subtraction is noise at small problem sizes.

    chain policies (``chain``, or legacy ``chain_via_b=True`` = "via_b"):

    - "acc" (default): carry through the C accumulator. Honest for Pallas
      rungs (custom calls, never hoisted); NOT for plain-XLA rungs, where
      ``A @ B`` is loop-invariant and XLA hoists the entire matmul out of
      the while loop, leaving only the ``+ C`` add in the timed region
      (observed: a "2.7 PFLOPS" bf16 dot).
    - "via_b": carry through the B OPERAND (``C_{i+1} = A @ C_i + C``,
      square fp32/bf16 shapes only) — defeats hoisting structurally.
    - "barrier": keep ALL operands in the loop carry behind
      ``jax.lax.optimization_barrier`` each iteration, so the simplifier
      cannot prove any operand loop-invariant. Works for any operand
      structure (quantized/packed rungs included); used by the plain-XLA
      int8 vendor-bar rung where via-B chaining is shape-impossible.
    """
    if chain is None:
        chain = "via_b" if chain_via_b else "acc"
    thunk, iters = build_chained(run, prepared, c, chain=chain,
                                 inner_iters=inner_iters,
                                 target_s=target_s, max_iters=max_iters)
    best = measure(thunk, repeats=outer_repeats, warmup=warmup)
    if best < 1e-6 and iters < max_iters:
        # Underflow: the whole chain measured faster than the round-trip
        # jitter (the clamped-at-1e-9 artifact). Re-run with a much
        # longer chain rather than report a fantasy number.
        thunk, iters = build_chained(
            run, prepared, c, chain=chain,
            inner_iters=min(iters * 16, max_iters),
            target_s=target_s, max_iters=max_iters)
        best = measure(thunk, repeats=outer_repeats, warmup=warmup)
    return best / iters


def time_best_of(fn: Callable[[], jax.Array], nrepeats: int = 10,
                 warmup: int = 1) -> float:
    """Single-launch best-of timing (includes one dispatch round trip;
    prefer time_chained for kernels)."""
    return measure(fn, repeats=nrepeats, warmup=warmup)
