"""Rung 04 — capacity-derived block shapes + pipeline hints.

Reference analogue: ``aarch64/MMult_4x4_13/14`` — the GotoBLAS loop
structure with GEMM_M/N/K derived from cache capacities (the derivation
comments at ``MMult_4x4_14.cpp:24-55`` pick kc from L1d and mc from L2).
The TPU translation of that derivation targets VMEM (~16 MiB/core) and the
MXU (128x128 systolic):

    per-(i,j)-tile working set, double buffered by the Mosaic pipeliner:
        2*(bm*bk + bk*bn) * in_bytes     (A, B streaming blocks)
      +   bm*bn * 4                      (fp32 scratch accumulator)
      + 2*bm*bn * (4 + in_bytes)         (C in, O out blocks)
    must fit a VMEM budget of ~12 MiB (leave headroom for Mosaic).

    bm, bn multiples of the MXU edge (128); bk large to amortize the
    accumulator init/flush and keep arithmetic intensity ~ O(bk).

The double-buffered HBM->VMEM DMA that the reference hand-rolled as smem
ping-pong (``cuda/MMult_cuda_8/11/12``) and software pipelining
(``aarch64/MMult_4x4_17/21``) is exactly what the Mosaic pipeliner emits
for a 3D grid with revisiting index maps — this rung turns the knobs that
govern it (block shapes, dimension semantics, cost estimate) instead of
re-deriving the machinery by hand.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds
from how_to_optimize_gemm_tpu.utils.env import default_interpret

# Model budget is deliberately below the ~14 MiB Mosaic scoped-vmem limit:
# Mosaic's own stack/padding overhead showed up as ~2 MiB on v5e when the
# model was allowed to fill the physical budget.
VMEM_BUDGET = 9 * 1024 * 1024
VMEM_LIMIT = 14 * 1024 * 1024
MXU = 128


def choose_blocks(m: int, n: int, k: int, in_bytes: int = 4):
    """Pick (bm, bn, bk) from the VMEM capacity model above."""
    def fits(bm, bn, bk):
        working = (2 * (bm * bk + bk * bn) * in_bytes
                   + bm * bn * 4
                   + 2 * bm * bn * (4 + in_bytes))
        return working <= VMEM_BUDGET

    bm = min(bounds.round_up(m, MXU), 512)
    bn = min(bounds.round_up(n, MXU), 512)
    bk_cap = min(bounds.round_up(k, MXU), 2048)
    while not fits(bm, bn, bk_cap) and bk_cap > MXU:
        bk_cap //= 2
    while not fits(bm, bn, bk_cap) and max(bm, bn) > MXU:
        if bm >= bn:
            bm //= 2
        else:
            bn //= 2
    # within the capacity cap, pick the K block that minimizes padding
    # (a raw cap padded e.g. k=2560 up to 4096 — +60% work, visible as
    # the bf16 sweep's dips at non-power-of-two sizes)
    bk = bounds._least_waste(bounds.round_up(k, MXU), bk_cap, MXU)
    return bm, bn, bk


def _make_kernel(precision):
    def _kernel(a_ref, b_ref, c_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            acc_ref[:] = c_ref[:]

        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                              preferred_element_type=jnp.float32,
                              precision=precision)

        @pl.when(kk == pl.num_programs(2) - 1)
        def _flush():
            o_ref[:] = acc_ref[:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def mmult(a, b, c, *, blocks: tuple[int, int, int] | None = None,
          interpret: bool | None = None):
    """C = A @ B + C with capacity-derived blocks (true fp32: HIGHEST =
    multi-pass bf16 on the MXU, which has no native fp32 datapath)."""
    return _mmult_impl(a, b, c, blocks, interpret, jnp.float32,
                       jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("blocks", "interpret"))
def mmult_bf16(a, b, c, *, blocks: tuple[int, int, int] | None = None,
               interpret: bool | None = None):
    """Rung 05 — same schedule, bf16 operands, fp32 accumulation.

    bf16 is the MXU's native input width: halves HBM traffic per FLOP and
    doubles MXU issue rate vs fp32 — the TPU counterpart of the reference's
    int8 "more FLOPS from the same silicon" step (README.md:71-85), kept as
    its own rung because the quantized rungs build on it.
    """
    return _mmult_impl(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), c,
                       blocks, interpret, jnp.bfloat16,
                       jax.lax.Precision.DEFAULT)


def _mmult_impl(a, b, c, blocks, interpret, in_dtype, precision):
    m, n = c.shape
    k = a.shape[1]
    in_bytes = jnp.dtype(in_dtype).itemsize
    if blocks is None:
        blocks = choose_blocks(m, n, k, in_bytes)
    bm, bn, bk = blocks
    a, b, c = bounds.pad_gemm_operands(a, b, c, bm, bn, bk)
    mp, kp = a.shape
    _, np_ = b.shape
    out = pl.pallas_call(
        _make_kernel(precision),
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
            # no explicit vmem_limit_bytes: Mosaic's 16 MiB default is the
            # physical bound; a tighter cap only rejects valid configs
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_) * in_bytes + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(a, b, c)
    return bounds.crop(out, m, n)
