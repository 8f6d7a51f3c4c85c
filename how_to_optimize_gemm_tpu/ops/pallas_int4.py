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


# K rows per pack block (fixed at quantize/pack time, ops/quant.py): rows
# [g*512, g*512+256) of W live in the low nibbles and [g*512+256, g*512+512)
# in the high nibbles of packed rows [g*256, (g+1)*256).
PACK_BLOCK = 512


def _decode_w4(w_ref):
    """(bk//2, bn) packed block -> (bk, bn) int32 in [-7, 7], honoring the
    PACK_BLOCK-row nibble layout for any bk that is a multiple of it.

    Nibble math in int32: Mosaic has no int8 vector sub/shift lowering.
    Static per-pack-block slices + one concatenate, so the decode stays
    two VPU ops per element regardless of bk."""
    w = w_ref[:].astype(jnp.int32)                 # (bk//2, bn)
    lo = (w & 0xF) - 8                             # offset-binary low nibble
    hi = w >> 4                                    # arithmetic shift: high
    half = PACK_BLOCK // 2
    n_blocks = w_ref.shape[0] // half
    parts = []
    for g in range(n_blocks):
        parts.append(lo[g * half:(g + 1) * half])
        parts.append(hi[g * half:(g + 1) * half])
    return jnp.concatenate(parts, axis=0)          # (bk, bn)


def _kernel(a_ref, w_ref, s_ref, c_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = _decode_w4(w_ref)
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

    wq = _decode_w4(w_ref)
    acc_ref[:] += jnp.dot(a_ref[:], wq.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:] * s_ref[:]


def _kernel_noc_gemv(a_ref, w_ref, s_ref, o_ref, acc_ref):
    """Decode-free W4A16 GEMV: the nibble split moves onto the MXU.

    The round-1 GEMV ran at 62% of its weight-streaming floor because
    the VPU nibble decode (~10 data passes per block: mask, sign-fix,
    shift, concatenate, cast) outweighed the DMA itself
    (RESULTS.md round 1; VERDICT task 3). Pack algebra removes it: a
    packed byte is P = 16*hi + u with u = P & 15 (u = lo + 8 in offset
    binary), so with A split into the column halves the nibbles came
    from,

        A_hi @ hi + A_lo @ lo
          = (D1 - D3)/16 + D2 - 8 * rowsum(A_lo),
        D1 = A_hi @ P,  D2 = A_lo @ u,  D3 = A_hi @ u.

    One VPU mask per block (u) replaces the whole decode; the MXU does
    the splitting inside three half-K matmuls (1.5x MXU work — free at
    GEMV widths, where the MXU idles 30x below its roofline). /16 and
    *8 are exact in fp32; integer values <= 256 are exact in bf16, so
    the result matches the decode path bit-for-bit up to fp32 add
    order."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    half = PACK_BLOCK // 2
    n_blocks = w_ref.shape[0] // half
    for g in range(n_blocks):
        a_lo = a_ref[:, g * PACK_BLOCK:g * PACK_BLOCK + half]
        a_hi = a_ref[:, g * PACK_BLOCK + half:(g + 1) * PACK_BLOCK]
        p_i32 = w_ref[g * half:(g + 1) * half, :].astype(jnp.int32)
        p = p_i32.astype(jnp.bfloat16)
        u = (p_i32 & 15).astype(jnp.bfloat16)
        d1 = jnp.dot(a_hi, p, preferred_element_type=jnp.float32)
        d2 = jnp.dot(a_lo, u, preferred_element_type=jnp.float32)
        d3 = jnp.dot(a_hi, u, preferred_element_type=jnp.float32)
        rs = jnp.sum(a_lo.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += (d1 - d3) * (1.0 / 16.0) + d2 - 8.0 * rs

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:] * s_ref[:]


def _kernel_w4a8_noc_gemv(a_ref, w_ref, sa_ref, sw_ref, o_ref, acc_ref):
    """Decode-free W4A8 GEMV (see _kernel_noc_gemv): all-integer form.

    D1 - D3 = 16 * (A_hi @ hi) exactly, so the /16 is an exact
    arithmetic right-shift on int32 — no rounding anywhere."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    half = PACK_BLOCK // 2
    n_blocks = w_ref.shape[0] // half
    for g in range(n_blocks):
        a_lo = a_ref[:, g * PACK_BLOCK:g * PACK_BLOCK + half]
        a_hi = a_ref[:, g * PACK_BLOCK + half:(g + 1) * PACK_BLOCK]
        p = w_ref[g * half:(g + 1) * half, :]
        u = (p.astype(jnp.int32) & 15).astype(jnp.int8)
        d1 = jnp.dot(a_hi, p, preferred_element_type=jnp.int32)
        d2 = jnp.dot(a_lo, u, preferred_element_type=jnp.int32)
        d3 = jnp.dot(a_hi, u, preferred_element_type=jnp.int32)
        rs = jnp.sum(a_lo.astype(jnp.int32), axis=1, keepdims=True)
        acc_ref[:] += ((d1 - d3) >> 4) + d2 - 8 * rs

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sa_ref[:] * sw_ref[:])


def choose_blocks_w4(m: int, n: int, kp: int,
                     ea: int = 1) -> tuple[int, int, int]:
    """512x512 C tile + the largest 512-multiple K strip (<= 4096) that
    divides the packed K — same reload-minimizing derivation as
    ``pallas_int8.mmult_q``'s chooser, validated on v5e: p=2048 full-K
    171 TFLOPS vs 95 at (256,256,512); p=4096 bk=4096 164 TFLOPS.
    87% of the bf16 MXU rate with weight traffic halved again vs int8.

    Decode shapes (m <= 64, the serving GEMV) get their own point:
    bm=32 (minimum int-tile rows after padding) with a FULL-N strip and
    bk=512 measured 11.3 us for a (8, 2048) x (2048, 5632) linear vs
    18.5 at the square-tile choice — 62% of the weight-streaming floor,
    and the reason apply_linear keeps int4 decode on Pallas."""
    if m <= 64:
        bm = bounds.round_up(max(m, 1), 32)
        bn = bounds._least_waste(bounds.round_up(n, 128), 8192, 128)
        return bm, bn, min(512, kp)
    bn = min(bounds.round_up(n, 128), 512)
    # largest 512-multiple DIVISOR of the packed K, capped at 4096 (the
    # packed layout can't be re-padded here, so bk must divide kp; a
    # power-of-two-only candidate list dropped K=3584 all the way to
    # bk=512 — 330 vs 236 TOPS of difference for w4a8 at p=3584-class
    # shapes)
    bk = 512
    for cand in range(min(bounds.round_up(kp, 512), 4096), 0, -512):
        if kp % cand == 0:
            bk = cand
            break
    bk = min(bk, kp)
    # TALL least-waste A strips (round 3): the banked autotune campaign
    # found bm=1792 at p=3584 worth +4.0% over the old 512 cap (360.5
    # vs 346.7 GFLOPS for the 07b rung — fewer B re-reads, the rung-14
    # lesson), and the tall shapes hold at every tuned size (p=2048:
    # (1024,512) 335.1 vs the old cap's ~322-330; the re-sweep's lone
    # 294 reading at 2048 was an outlier the repeated tune rows
    # contradict). The cap is budget-derived so the double-buffered A
    # strip stays inside the noc kernels' 24 MB scoped-VMEM ceiling
    # for bf16 activations too (ea = activation bytes/elt: 1 for w4a8,
    # 2 for W4A16); swept shapes take their banked blocks via --tuned.
    budget = 14 * 1024 * 1024
    cap_rows = max((budget // (2 * bk * ea)) // 128 * 128, 512)
    bm = bounds._least_waste(bounds.round_up(m, 128),
                             min(cap_rows, 1792), 128)
    return bm, bn, bk


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret", "fast"))
def mmult_q_noc(a, packed, sw, *, bm: int | None = None,
                bn: int | None = None, bk: int | None = None,
                fast: bool = True,
                interpret: bool | None = None):
    """y = A_bf16 @ dequant(W4), no C accumulate (serving fast path).

    GEMV-class shapes (m <= 64) route to the decode-free pack-algebra
    kernel (``_kernel_noc_gemv``); fast=False keeps the VPU-decode
    kernel for A/B measurement."""
    m = a.shape[0]
    n = packed.shape[1]
    kp = packed.shape[0] * 2
    abm, abn, abk = choose_blocks_w4(m, n, kp, ea=2)
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    a = bounds.pad_dim(bounds.pad_dim(a, 0, bm), 1, kp)
    packed = bounds.pad_dim(packed, 1, bn)
    sw = bounds.pad_dim(sw, 1, bn)
    mp = a.shape[0]
    np_ = packed.shape[1]
    assert kp % bk == 0
    use_gemv = fast and bm <= 64 and bk % PACK_BLOCK == 0
    out = pl.pallas_call(
        _kernel_noc_gemv if use_gemv else _kernel_noc,
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
            # The multi-pack-block nibble decode holds a few extra slices
            # on the Mosaic stack; the default ~14 MB scoped limit is a
            # default, not the hardware (v5e has ~128 MB physical VMEM).
            vmem_limit_bytes=24 * 1024 * 1024,
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
def mmult_q(a, packed, sw, c, *, bm: int | None = None,
            bn: int | None = None, bk: int | None = None,
            interpret: bool | None = None):
    """C = (A_bf16 @ dequant(W4)) + C on pre-packed weights.

    ``packed`` has shape (Kp//2, N) where Kp = round_up(K, 512) matches the
    pack-time padding; A is padded with zero columns to Kp.
    """
    m, n = c.shape
    kp = packed.shape[0] * 2
    abm, abn, abk = choose_blocks_w4(m, n, kp, ea=2)
    bm, bn, bk = bm or abm, bn or abn, bk or abk
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
        input_output_aliases={3: 0},
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
            # The multi-pack-block nibble decode holds a few extra slices
            # on the Mosaic stack; the default ~14 MB scoped limit is a
            # default, not the hardware (v5e has ~128 MB physical VMEM).
            # 48 MB with the aliased C stream (round 2): the C-in/out
            # overlap-starvation fix from rung 14 applied here measured
            # +13/+64 TOPS at p=3584/4096 for W4A8
            vmem_limit_bytes=48 * 1024 * 1024,
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


# ------------------------------------------------------------- W4A8 rung

def _kernel_w4a8(a_ref, w_ref, sa_ref, sw_ref, c_ref, o_ref, acc_ref):
    """int8 activations x int4 weights: the nibble decode feeds the MXU's
    int8 path (2x the bf16 issue rate the W4A16 rung uses) with int32
    accumulation; per-row x per-column scales fold into one rank-1
    epilogue. The W4A8 recipe from the LLM-serving literature (e.g.
    LiquidGEMM, arXiv:2509.01229 — PAPERS.md), built TPU-style."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = _decode_w4(w_ref)                          # int32 in [-7, 7]
    acc_ref[:] += jnp.dot(a_ref[:], wq.astype(jnp.int8),
                          preferred_element_type=jnp.int32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sa_ref[:] * sw_ref[:] + c_ref[:])


def _kernel_w4a8_noc(a_ref, w_ref, sa_ref, sw_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = _decode_w4(w_ref)
    acc_ref[:] += jnp.dot(a_ref[:], wq.astype(jnp.int8),
                          preferred_element_type=jnp.int32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * sa_ref[:] * sw_ref[:]


def _kernel_w4a8_noc_gemv_fq(x_ref, w_ref, sw_ref, o_ref, acc_ref,
                             qa_sc, sa_sc):
    """Fused-activation-quant W4A8 GEMV: x arrives as float rows and is
    quantized IN KERNEL (row absmax -> scale -> round/clip, exactly
    quant.quantize_symmetric's ops) into VMEM scratch once per row
    block, then the decode-free pack-algebra dots run as in
    ``_kernel_w4a8_noc_gemv``.

    Why: the per-linear activation quantization showed up as tiny XLA
    VPU ops (abs/max/round/divide at 224 calls/step) plus their
    host-dispatch gaps in the traced 7B batch-1 decode step; fusing it
    here removes those ops from the graph. MEASURED: +6% end-to-end in
    a same-session interleaved A/B (38.6 vs 36.5 tok/s, 7B w4a8
    batch 1 W=8) — reproducible across repeats; bit-identical outputs.
    x streams at 4 B/elt instead of the int8 path's 1 B/elt, noise
    next to the weight stream at GEMV widths."""
    kk = pl.program_id(2)
    j = pl.program_id(1)

    @pl.when((kk == 0) & (j == 0))
    def _quant():
        x = x_ref[:].astype(jnp.float32)               # (bm, kp)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        qa_sc[:] = jnp.clip(jnp.round(x / scale), -127,
                            127).astype(jnp.int8)
        sa_sc[:] = scale

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk = w_ref.shape[0] * 2
    half = PACK_BLOCK // 2
    n_blocks = bk // PACK_BLOCK
    base = kk * bk
    for g in range(n_blocks):
        a_lo = qa_sc[:, pl.ds(base + g * PACK_BLOCK, half)]
        a_hi = qa_sc[:, pl.ds(base + g * PACK_BLOCK + half, half)]
        p = w_ref[g * half:(g + 1) * half, :]
        u = (p.astype(jnp.int32) & 15).astype(jnp.int8)
        d1 = jnp.dot(a_hi, p, preferred_element_type=jnp.int32)
        d2 = jnp.dot(a_lo, u, preferred_element_type=jnp.int32)
        d3 = jnp.dot(a_hi, u, preferred_element_type=jnp.int32)
        rs = jnp.sum(a_lo.astype(jnp.int32), axis=1, keepdims=True)
        acc_ref[:] += ((d1 - d3) >> 4) + d2 - 8 * rs

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sa_sc[:] * sw_ref[:])


@functools.partial(jax.jit, static_argnames=("bn", "bk", "interpret"))
def mmult_w4a8_fused_noc(x, packed, sw, *, bn: int | None = None,
                         bk: int | None = None,
                         interpret: bool | None = None):
    """y = quantize(x) @ dequant(W4) with the activation quantization
    fused into the kernel — the serving decode path for w4a8 linears
    (GEMV widths, m <= 64). x: (m, k) float; output fp32, numerically
    identical to quantize_symmetric + mmult_q_w4a8_noc (same ops, same
    order; tested)."""
    m, k = x.shape
    n = packed.shape[1]
    kp = packed.shape[0] * 2
    assert m <= 64, "fused-quant path is the GEMV (decode) form"
    if bn is None and bk is None:
        # banked autotuning (harness/autotune_kernels) — trace-time
        # lookup; absent entries keep choose_blocks_w4's pick
        from how_to_optimize_gemm_tpu.harness.autotune_kernels import (
            gemv_key, knobs_for)
        tuned = knobs_for("gemv_w4a8", gemv_key(m, k, n))
        bn, bk = tuned.get("bn"), tuned.get("bk")
    abm, abn, abk = choose_blocks_w4(m, n, kp)
    bm = abm
    bn = bn or abn
    bk = bk or abk
    assert bk % PACK_BLOCK == 0 and kp % bk == 0
    x = bounds.pad_dim(bounds.pad_dim(x, 0, bm), 1, kp)
    packed = bounds.pad_dim(packed, 1, bn)
    sw = bounds.pad_dim(sw, 1, bn)
    mp = x.shape[0]
    np_ = packed.shape[1]
    out = pl.pallas_call(
        _kernel_w4a8_noc_gemv_fq,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            # FULL activation rows, constant over (j, kk): the in-kernel
            # quantizer needs the whole row's absmax before any dot
            pl.BlockSpec((bm, kp), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32),
                        pltpu.VMEM((bm, kp), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 4 + kp * np_ // 2 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(x.astype(jnp.float32), packed, sw)
    return bounds.crop(out, m, n)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret", "fast"))
def mmult_q_w4a8_noc(qa, sa, packed, sw, *, bm: int | None = None,
                     bn: int | None = None, bk: int | None = None,
                     fast: bool = True,
                     interpret: bool | None = None):
    """y = QA_int8 @ dequant(W4), no C (the W4A8 serving fast path).

    GEMV-class shapes (m <= 64) route to the decode-free pack-algebra
    kernel (``_kernel_w4a8_noc_gemv``); fast=False keeps the VPU-decode
    kernel for A/B measurement."""
    m = qa.shape[0]
    n = packed.shape[1]
    kp = packed.shape[0] * 2
    abm, abn, abk = choose_blocks_w4(m, n, kp)
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, kp)
    packed = bounds.pad_dim(packed, 1, bn)
    sw = bounds.pad_dim(sw, 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    mp = qa.shape[0]
    np_ = packed.shape[1]
    assert kp % bk == 0
    use_gemv = fast and bm <= 64 and bk % PACK_BLOCK == 0
    out = pl.pallas_call(
        _kernel_w4a8_noc_gemv if use_gemv else _kernel_w4a8_noc,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=24 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ // 2 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, packed, sa, sw)
    return bounds.crop(out, m, n)


def prepare_w4a8(a: jnp.ndarray, b: jnp.ndarray):
    """A -> int8 per-row symmetric; B -> packed int4 per-column."""
    qa, sa = quant.quantize_symmetric(a, axis=1)          # (M,K) int8
    kdim = b.shape[0]
    bp = bounds.pad_dim(b, 0, PACK_BLOCK)
    qw, sw = quant.quantize_symmetric(bp, axis=0, bits=4)
    packed = quant.pack_int4(qw, PACK_BLOCK)
    return qa, sa, packed, sw, kdim


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q_w4a8(qa, sa, packed, sw, c, *, bm: int | None = None,
                 bn: int | None = None, bk: int | None = None,
                 interpret: bool | None = None):
    """C = (QA_int8 @ dequant(W4)) + C — int8 MXU path, int4 weight
    traffic."""
    m, n = c.shape
    kp = packed.shape[0] * 2
    abm, abn, abk = choose_blocks_w4(m, n, kp)
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, kp)
    packed = bounds.pad_dim(packed, 1, bn)
    sw = bounds.pad_dim(sw, 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    mp = qa.shape[0]
    np_ = packed.shape[1]
    assert kp % bk == 0
    out = pl.pallas_call(
        _kernel_w4a8,
        grid=(mp // bm, np_ // bn, kp // bk),
        input_output_aliases={4: 0},
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ // 2 + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, packed, sa, sw, c)
    return bounds.crop(out, m, n)
