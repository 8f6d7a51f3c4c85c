"""Rung 00 — the naive baseline: K outer-product steps on the VPU only.

Reference analogue: ``aarch64/MMult0.cpp:3-19`` (i-j-p triple loop). A
literal scalar triple loop is not expressible efficiently under XLA tracing,
and the *point* of the naive rung is "all FLOPs, none of the matrix unit":
so the TPU-native naive rung performs C += outer(A[:, p], B[p, :]) for each
p with a ``lax.fori_loop`` — every FLOP runs as an 8x128 VPU element-wise
FMA, the MXU stays idle, and HBM traffic is maximal. This sets the floor
the ladder climbs from, exactly like MMult0's 1.54 GFLOPS vs the 30.85
GFLOPS top rung (BASELINE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def mmult(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """C = A @ B + C via K rank-1 updates (VPU-only, deliberately naive)."""
    k = a.shape[1]

    def body(p, acc):
        return acc + a[:, p][:, None] * b[p, :][None, :]

    return jax.lax.fori_loop(0, k, body, c.astype(jnp.float32))
