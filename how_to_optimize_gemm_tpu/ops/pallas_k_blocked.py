"""Rung 03 — K blocking with an fp32 VMEM scratch accumulator.

Reference analogue: ``aarch64/MMult_4x4_10.cpp:7-9`` (kc x mc cache
blocking calling InnerKernel) and ``cuda/MMult_cuda_9.cu:30-113``
(128x128x8 block, register accumulator tile). TPU translation: the grid
grows a third, *sequential* K dimension; each program multiplies a
(bm, bk) x (bk, bn) pair and accumulates into a VMEM scratch tile that
lives across the K iterations of one (i, j) tile. The accumulator is
initialized from C on the first K step and flushed to the output on the
last — the same init/flush structure as the register tile in cuda_9.

The VMEM packing story of MMult_4x4_11/12 (PackMatrixB/PackMatrixA into
contiguous panels) has no hand-written equivalent here *by design*: the
BlockSpec index maps ARE the packing declaration, and the Mosaic pipeliner
performs the HBM->VMEM panel copies (tiled, contiguous in VMEM) that the
reference wrote by hand.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds
from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _kernel(a_ref, b_ref, c_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = c_ref[:]

    # HIGHEST = true fp32 (multi-pass bf16 on the MXU); see rung 02.
    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def mmult(a, b, c, *, bm: int = 256, bn: int = 256, bk: int = 256,
          interpret: bool | None = None):
    """C = A @ B + C with a (M/bm, N/bn, K/bk) grid, K innermost."""
    m, n = c.shape
    a, b, c = bounds.pad_gemm_operands(a, b, c, bm, bn, bk)
    mp, kp = a.shape
    _, np_ = b.shape
    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(a, b, c)
    return bounds.crop(out, m, n)
