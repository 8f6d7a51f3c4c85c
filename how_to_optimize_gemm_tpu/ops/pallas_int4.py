"""Rung 07 — int4 weight-only dequant+matmul (cuda-int4 capability slot).

Reference analogue: the ``cuda-int4`` directory (WIP in the reference,
README.md:118-120) — this framework completes the slot. Scheme (W4A16 in
LLM-serving terms): weights symmetric int4 in [-7, 7] with a per-output-
channel fp32 scale, two weights packed per int8 byte (layout documented in
``ops/quant.py``); activations bf16; MXU matmul in bf16 with fp32
accumulation; the per-column scale commutes with the K-contraction so it is
applied once in the flush epilogue — the "fused scale epilogue" named in
the north star.

In-kernel unpack cost: two VPU shifts + one sublane concatenate per
(bk/2, bn) block — intentionally the cheapest possible decode so HBM
bandwidth (halved again vs int8) sets the roofline, which is the entire
point of weight-only quantization for decode-bound serving.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds, quant
from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _kernel(a_ref, w_ref, s_ref, c_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Nibble math in int32: Mosaic has no int8 vector sub/shift lowering.
    w = w_ref[:].astype(jnp.int32)                 # (bk//2, bn)
    lo = ((w & 0xF) ^ 8) - 8                       # sign-extend low nibble
    hi = w >> 4                                    # arithmetic shift: high
    wq = jnp.concatenate([lo, hi], axis=0)         # (bk, bn) in [-7,7]
    acc_ref[:] += jnp.dot(a_ref[:], wq.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:] * s_ref[:] + c_ref[:]


def _kernel_noc(a_ref, w_ref, s_ref, o_ref, acc_ref):
    """C-less serving variant: y = A @ dequant(W4) (see pallas_int8
    counterpart for the traffic rationale)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.int32)
    lo = ((w & 0xF) ^ 8) - 8
    hi = w >> 4
    wq = jnp.concatenate([lo, hi], axis=0)
    acc_ref[:] += jnp.dot(a_ref[:], wq.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:] * s_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q_noc(a, packed, sw, *, bm: int = 256, bn: int = 256,
                bk: int = 512, interpret: bool | None = None):
    """y = A_bf16 @ dequant(W4), no C accumulate (serving fast path)."""
    m = a.shape[0]
    n = packed.shape[1]
    kp = packed.shape[0] * 2
    a = bounds.pad_dim(bounds.pad_dim(a, 0, bm), 1, kp)
    packed = bounds.pad_dim(packed, 1, bn)
    sw = bounds.pad_dim(sw, 1, bn)
    mp = a.shape[0]
    np_ = packed.shape[1]
    assert kp % bk == 0
    out = pl.pallas_call(
        _kernel_noc,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ // 2 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(a, packed, sw)
    return bounds.crop(out, m, n)


def prepare(a: jnp.ndarray, b: jnp.ndarray, bk: int = 512):
    """Quantize weights B to packed int4 + per-column scales; A to bf16."""
    kdim = b.shape[0]
    b = bounds.pad_dim(b, 0, bk)
    qw, sw = quant.quantize_symmetric(b, axis=0, bits=4)  # (K,N), (1,N)
    packed = quant.pack_int4(qw, bk)                      # (K//2, N)
    return a.astype(jnp.bfloat16), packed, sw, kdim


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q(a, packed, sw, c, *, bm: int = 256, bn: int = 256,
            bk: int = 512, interpret: bool | None = None):
    """C = (A_bf16 @ dequant(W4)) + C on pre-packed weights.

    ``packed`` has shape (Kp//2, N) where Kp = round_up(K, bk) matches the
    ``bk`` used at pack time; A is padded with zero columns to Kp.
    """
    m, n = c.shape
    kp = packed.shape[0] * 2
    a = bounds.pad_dim(bounds.pad_dim(a, 0, bm), 1, kp)
    packed = bounds.pad_dim(packed, 1, bn)
    sw = bounds.pad_dim(sw, 1, bn)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    mp = a.shape[0]
    np_ = packed.shape[1]
    assert kp % bk == 0
    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
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
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ // 2 + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(a, packed, sw, c)
    return bounds.crop(out, m, n)


def mmult(a, b, c, *, interpret: bool | None = None):
    """Full path (quantize+pack+GEMM) on fp32 inputs — harness convenience."""
    a16, packed, sw, _ = prepare(a, b)
    return mmult_q(a16, packed, sw, c, interpret=interpret)
