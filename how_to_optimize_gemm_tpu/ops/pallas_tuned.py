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

    def half(x):
        # halve but stay on the MXU grid (640 // 2 = 320 is not a
        # 128-multiple; the small-size sweep caught Mosaic rejecting it)
        return max(x // 2 // MXU * MXU, MXU)

    bm = min(bounds.round_up(m, MXU), 512)
    bn = min(bounds.round_up(n, MXU), 512)
    bk_cap = min(bounds.round_up(k, MXU), 2048)
    while not fits(bm, bn, bk_cap) and bk_cap > MXU:
        bk_cap = half(bk_cap)
    while not fits(bm, bn, bk_cap) and max(bm, bn) > MXU:
        if bm >= bn:
            bm = half(bm)
        else:
            bn = half(bn)
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


# ------------------------------------------------- rung 15 (bf16 summit)

def _make_kernel_bt(precision):
    def kernel(a_ref, bt_ref, c_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[:], bt_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

        @pl.when(kk == pl.num_programs(2) - 1)
        def _flush():
            o_ref[:] = acc_ref[:] + c_ref[:]
    return kernel


def _kernel_bf16_bt(a_ref, bt_ref, c_ref, o_ref, acc_ref):
    """Rung 15 — the bf16 family summit: rung 14's recipe (aliased C +
    offline-transposed B) applied to the bf16 ladder.

    Measured v5e: 182/185/184.5 TFLOPS at p=2048/3584/4096 vs the bf16
    vendor dot's 174/184/167 — beating XLA's own bf16 emitter at every
    sweep size (rung 05 read 135/154/164). Same two mechanisms as rung
    14 (``pallas_int8._kernel_bt``): one in-place buffered C stream
    instead of separate C-in/out (the 5-stream overlap-starvation fix)
    and B^T blocks on the fast full-width DMA geometry."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], bt_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:] + c_ref[:]


def prepare_bf16_bt(a, b):
    """Offline pack: A to bf16, B TRANSPOSED (N, K) bf16."""
    return (a.astype(jnp.bfloat16),
            jnp.swapaxes(b, 0, 1).astype(jnp.bfloat16))


def choose_blocks_bf16_bt(m: int, n: int, k: int,
                          elt: int = 2) -> tuple[int, int, int]:
    """Same footprint-budget derivation as rung 14's chooser,
    parameterized by operand byte width (bf16 measured: bm=1024@2048,
    896@3584, 512@4096 optimal; the 28 MB budget reproduces exactly
    those picks; fp32 halves the K-strip cap)."""
    bn = min(bounds.round_up(n, 128), 512)
    k512 = bounds.round_up(k, 512)
    bk_cap = 4096 * 2 // elt
    bk = min(bounds._least_waste(k512, bk_cap, 512), k512)
    # Mosaic's scoped-VMEM accounting runs ~2x this model at elt=4
    # (measured: a 25 MB-modeled fp32 config compiled to 52.5 MB of
    # stack and OOM'd the 48 MB limit), so fp32 gets a tighter budget.
    budget = (28 if elt <= 2 else 20) * 1024 * 1024
    cap_rows = (budget - 2 * bn * bk * elt) // (2 * bk * elt + 12 * bn)
    cap_rows = min(max((cap_rows // 128) * 128, 512), 1792)
    bm = bounds._least_waste(bounds.round_up(m, 128), cap_rows, 128)
    return bm, bn, bk


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk",
                                             "interpret"))
def mmult_bf16_bt(a16, bt16, c, *, bm: int | None = None,
                  bn: int | None = None, bk: int | None = None,
                  interpret: bool | None = None):
    """C = A @ BT^T + C on pre-packed bf16 operands (rung 15)."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_bf16_bt(m, n, a16.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    a16 = bounds.pad_dim(bounds.pad_dim(a16, 0, bm), 1, bk)
    bt16 = bounds.pad_dim(bounds.pad_dim(bt16, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    mp, kp = a16.shape
    np_ = bt16.shape[0]
    out = pl.pallas_call(
        _kernel_bf16_bt,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_) * 2 + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(a16, bt16, c)
    return bounds.crop(out, m, n)


def prepare_fp32_bt(a, b):
    """Offline pack for rung 16: B transposed (N, K), both fp32."""
    return (a, jnp.swapaxes(b, 0, 1))


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk",
                                             "interpret"))
def mmult_fp32_bt(a, bt, c, *, bm: int | None = None,
                  bn: int | None = None, bk: int | None = None,
                  interpret: bool | None = None):
    """Rung 16 — the fp32 summit: the rung-14 recipe at HIGHEST
    precision (6-pass bf16, the MXU's only true-fp32 path). Measured
    v5e 31.9/32.1 TFLOPS at p=2048/4096 vs the fp32 vendor dot's
    29.4/29.9 — the third and last vendor bar of the ladder beaten
    with the same two mechanisms (aliased C + B^T pack)."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_bf16_bt(m, n, a.shape[1], elt=4)
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    a = bounds.pad_dim(bounds.pad_dim(a, 0, bm), 1, bk)
    bt = bounds.pad_dim(bounds.pad_dim(bt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    mp, kp = a.shape
    np_ = bt.shape[0]
    out = pl.pallas_call(
        _make_kernel_bt(jax.lax.Precision.HIGHEST),
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_) * 4 + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(a, bt, c)
    return bounds.crop(out, m, n)
