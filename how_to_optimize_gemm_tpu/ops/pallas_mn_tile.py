"""Rung 02 — first Pallas kernel: one (bm, bn) C tile per grid program.

Reference analogue: ``cuda/MMult_cuda_3.cu:10-43`` (one shared-memory tile
per thread block) and ``aarch64/MMult_4x4_8.cpp`` (a 4x4 block of C per
call). The TPU translation: the grid is (M/bm, N/bn); for each program the
Mosaic pipeliner DMAs a (bm, K) strip of A and a (K, bn) strip of B from
HBM into VMEM and one ``jnp.dot`` feeds the MXU. No K blocking yet — the
whole K strip must fit VMEM, which caps the problem size exactly like
cuda_3's "whole row of tiles through smem" shape caps occupancy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds
from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _kernel(a_ref, b_ref, c_ref, o_ref):
    # HIGHEST: true-fp32 result via multi-pass bf16 on the MXU. The MXU has
    # no native fp32 datapath — this is the "fp32 is expensive" fact the
    # bf16 rung (05) then exploits, mirroring the reference's fp32->int8
    # step (README.md:71-85).
    o_ref[:] = (
        jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + c_ref[:]
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def mmult(a, b, c, *, bm: int = 128, bn: int = 128,
          interpret: bool | None = None):
    """C = A @ B + C, grid over (M/bm, N/bn), full-K strips in VMEM.

    Default 128x128 tiles (one MXU pass) keep the double-buffered full-K
    strips within VMEM up to K ~ 8192 — bigger tiles hit the VMEM wall at
    large K, which is precisely the limitation rung 03 removes.
    """
    m, n = c.shape
    a, b, c = bounds.pad_gemm_operands(a, b, c, bm, bn, 8)
    mp, kp = a.shape
    _, np_ = b.shape
    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=default_interpret(interpret),
    )(a, b, c)
    return bounds.crop(out, m, n)
