"""The ladder registry — runtime equivalent of the makefile OLD/NEW knob.

The reference selects which rung links into the driver by editing
``NEW :=`` in the makefile (``aarch64/makefile:1-2``, README.md:34-44).
Here every rung registers under a stable name and the harness/CLI selects
by name at runtime.

Each rung carries the timed entrypoint plus the (untimed) operand
preparation and the "effective operands" view used by the oracle: the
correctness gate checks the *kernel* against an fp64 matmul of exactly what
the kernel consumed (dequantized int8/int4, bf16-cast, ...), so quantization
error never masks an indexing bug — and quantization error itself is
reported separately (SURVEY.md §4 implication).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from how_to_optimize_gemm_tpu.ops import (
    naive_vpu,
    pallas_emit_pipeline,
    pallas_int4,
    pallas_int8,
    pallas_k_blocked,
    pallas_manual_dma,
    pallas_mn_tile,
    pallas_tuned,
    quant,
    xla_dot,
)


@dataclasses.dataclass(frozen=True)
class Rung:
    name: str
    dtype: str                       # operand dtype family
    run: Callable[..., jnp.ndarray]  # (*prepared, c) -> fp32 C  (timed)
    prepare: Callable[[jnp.ndarray, jnp.ndarray], tuple]  # untimed
    effective: Callable[[tuple], tuple]  # prepared -> (a_eff, b_eff) fp32
    gate_rel: float                  # max |C-Cref| / max|Cref| allowed
    doc: str
    regression: bool = False         # honest negative result, kept on ladder
    bytes_per_input_elt: float = 4.0  # for roofline/bandwidth accounting
    # Per-operand byte widths for mixed-precision rungs (A and B read
    # different dtypes). When set, roofline computes
    # in_bytes = m*k*bytes_a + k*n*bytes_b — exact for rectangular shapes
    # (the decode GEMV shapes) where a uniform average misreports.
    bytes_a: float | None = None
    bytes_b: float | None = None
    # MXU path the kernel actually computes in (for roofline ceilings);
    # None = same family as `dtype` (int4 means "bf16 after dequant").
    compute_dtype: str | None = None
    # Benchmark chaining policy (utils/timing.time_chained): "acc" carries
    # the C accumulator (honest for Pallas custom calls only), "via_b"
    # feeds C back as the B operand (plain-XLA fp32/bf16 rungs — defeats
    # loop-invariant hoisting), "barrier" keeps operands loop-carried
    # behind an optimization_barrier (plain-XLA quantized rungs).
    chain: str = "acc"


def _identity_prepare(a, b):
    return (a, b)


def _identity_effective(ops):
    return ops[0].astype(jnp.float32), ops[1].astype(jnp.float32)


def _bf16_prepare(a, b):
    return (a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))


def _int8_effective(ops):
    qa, sa, qb, sb = ops
    return quant.dequantize(qa, sa), quant.dequantize(qb, sb)


def _int8_run(qa, sa, qb, sb, c, **kw):
    return pallas_int8.mmult_q(qa, sa, qb, sb, c, **kw)


def _int4_prepare(a, b):
    a16, packed, sw, kdim = pallas_int4.prepare(a, b)
    return (a16, packed, sw, kdim)


def _int4_effective(ops):
    a16, packed, sw, kdim = ops
    wq = quant.unpack_int4(packed, block_k=512)[:kdim]
    return a16.astype(jnp.float32), quant.dequantize(wq, sw)


def _int4_run(a16, packed, sw, kdim, c, **kw):
    return pallas_int4.mmult_q(a16, packed, sw, c, **kw)


LADDER: dict[str, Rung] = {}


def _register(rung: Rung):
    LADDER[rung.name] = rung
    return rung


_register(Rung(
    name="00_naive_vpu", dtype="fp32",
    run=lambda a, b, c, **kw: naive_vpu.mmult(a, b, c),
    prepare=_identity_prepare, effective=_identity_effective,
    gate_rel=1e-4,
    doc="naive rank-1 loop, VPU only (MMult0 analogue)", chain="via_b"))

_register(Rung(
    name="01_xla_fp32", dtype="fp32",
    run=lambda a, b, c, **kw: xla_dot.mmult(a, b, c),
    prepare=_identity_prepare, effective=_identity_effective,
    gate_rel=1e-4,
    doc="XLA native dot fp32 (cuBLAS_1 vendor bar)", chain="via_b"))

_register(Rung(
    name="01b_xla_bf16", dtype="bf16",
    run=lambda a, b, c, **kw: xla_dot.mmult_bf16(a, b, c),
    prepare=_bf16_prepare, effective=_identity_effective,
    gate_rel=1e-3, bytes_per_input_elt=2.0,
    doc="XLA native dot bf16 (cuBLAS_2 GemmEx analogue)", chain="via_b"))

_register(Rung(
    name="02_pallas_mn_tile", dtype="fp32",
    run=pallas_mn_tile.mmult,
    prepare=_identity_prepare, effective=_identity_effective,
    gate_rel=1e-4,
    doc="Pallas, one (bm,bn) C tile per program, full-K strips (cuda_3)", chain="via_b"))

_register(Rung(
    name="03_pallas_k_blocked", dtype="fp32",
    run=pallas_k_blocked.mmult,
    prepare=_identity_prepare, effective=_identity_effective,
    gate_rel=1e-4,
    doc="Pallas, 3D grid + fp32 VMEM accumulator (4x4_10-12 / cuda_9)", chain="via_b"))

_register(Rung(
    name="03b_pallas_small_blocks", dtype="fp32",
    run=lambda a, b, c, **kw: pallas_k_blocked.mmult(
        a, b, c, bm=128, bn=128, bk=128, **kw),
    prepare=_identity_prepare, effective=_identity_effective,
    gate_rel=1e-4, regression=True, chain="via_b",
    doc="REGRESSION (kept honestly, like cuda_6/4x4_15/vk_3): 128^3 "
        "blocks maximize grid parallelism but cut arithmetic intensity "
        "per VMEM byte 4x and multiply pipeline ramp overhead — slower "
        "than rung 03 despite 'more parallelism'"))

_register(Rung(
    name="04_pallas_tuned_fp32", dtype="fp32",
    run=pallas_tuned.mmult,
    prepare=_identity_prepare, effective=_identity_effective,
    gate_rel=1e-4,
    doc="Pallas, VMEM-capacity-derived blocks + pipeline hints (4x4_13/14)", chain="via_b"))

_register(Rung(
    name="05_pallas_bf16", dtype="bf16",
    run=pallas_tuned.mmult_bf16,
    prepare=_bf16_prepare, effective=_identity_effective,
    gate_rel=1e-3, bytes_per_input_elt=2.0,
    doc="Pallas bf16 operands, fp32 accumulate (MXU-native width)", chain="via_b"))

_register(Rung(
    name="06v_xla_int8", dtype="int8",
    run=lambda qa, sa, qb, sb, c, **kw: xla_dot.mmult_int8(qa, sa, qb,
                                                           sb, c),
    prepare=pallas_int8.prepare, effective=_int8_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0, chain="barrier",
    doc="int8 vendor bar: XLA's own int8 dot + dequant (the cuBLAS line "
        "rung 06 must beat)"))

_register(Rung(
    name="06_pallas_int8", dtype="int8",
    run=_int8_run,
    prepare=pallas_int8.prepare, effective=_int8_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="int8 symmetric [-127,127], int32 acc, fused dequant (chgemm)"))

def _w4a8_prepare(a, b):
    return pallas_int4.prepare_w4a8(a, b)


def _w4a8_effective(ops):
    qa, sa, packed, sw, kdim = ops
    wq = quant.unpack_int4(packed, block_k=512)[:kdim]
    return quant.dequantize(qa, sa), quant.dequantize(wq, sw)


_register(Rung(
    name="07b_pallas_w4a8", dtype="int4",
    run=lambda qa, sa, packed, sw, kdim, c, **kw:
        pallas_int4.mmult_q_w4a8(qa, sa, packed, sw, c, **kw),
    prepare=_w4a8_prepare, effective=_w4a8_effective,
    gate_rel=1e-4, bytes_per_input_elt=0.75,
    bytes_a=1.0, bytes_b=0.5,
    compute_dtype="int8",
    doc="W4A8: int8 activations x int4 weights on the int8 MXU path "
        "(2x the W4A16 rung's bf16 rate, half int8's weight traffic) — "
        "the serving-GEMM recipe from the W4A8 literature (PAPERS.md)"))

_register(Rung(
    name="08_manual_dma_int8", dtype="int8",
    run=lambda qa, sa, qb, sb, c, **kw: pallas_manual_dma.mmult_q(
        qa, sa, qb, sb, c, **kw),
    prepare=pallas_int8.prepare, effective=_int8_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="hand-rolled HBM->VMEM DMA ping-pong, K loop in-kernel "
        "(cuda_8/11/12 + 4x4_17/21 analogue; rung 06 semantics)"))

_register(Rung(
    name="09_fat_tile_int8", dtype="int8",
    run=lambda qa, sa, qb, sb, c, **kw: pallas_manual_dma.mmult_q_fat(
        qa, sa, qb, sb, c, **kw),
    prepare=pallas_int8.prepare, effective=_int8_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="1024x1024 C tiles via hand-managed buffers (single-buffered C "
        "fetch + cross-program writeback overlap) — halves A/B reloads "
        "vs rung 06; the shape the auto-pipeliner cannot fit"))

def _packed_effective(ops):
    qa, sa, qbt, sb = ops
    return quant.dequantize(qa, sa), quant.dequantize(qbt.T, sb)


_register(Rung(
    name="10_packed_fat_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw: pallas_manual_dma.mmult_q_packed(
        qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="rung 09 + offline-transposed B (PackMatrixB analogue): both "
        "operands DMA as the measured-fastest chunk geometry"))

_register(Rung(
    name="11_strip_resident_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw: pallas_manual_dma.mmult_q_strip(
        qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="rung 10 + row-resident A strips (packA-reuse analogue, "
        "MMult_4x4_12.cpp:52-82): A fetched once per tile row"))

_register(Rung(
    name="12_resident_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw: pallas_manual_dma.mmult_q_resident(
        qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0, regression=True,
    doc="REGRESSION (kept honestly, like cuda_6): operand-resident VMEM "
        "single program reaches the HBM-traffic floor but measures "
        "190/218 TOPS (p=2048/4096) — MXU operands sliced out of big "
        "resident buffers cost staging copies that outweigh the saved "
        "traffic. Falls back to rung 11 when operands don't fit"))

_register(Rung(
    name="13_tiled_resident_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw:
        pallas_manual_dma.mmult_q_tiled_resident(qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="REGRESSION (kept honestly): rung 12 with operands resident "
        "PRE-TILED (contiguous per-chunk blocks, static indices) fixes "
        "the staging copies but still measures 228 TOPS at p=4096 — "
        "the discovery is that VMEM footprints above ~16 MB slow the "
        "MXU itself (every >16 MB config regresses; the fast window "
        "matches Mosaic's default scoped limit)"))

_register(Rung(
    name="14_packed_alias_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw: pallas_int8.mmult_q_bt(
        qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0,
    doc="THE SUMMIT RUNG (cuda_12 slot, 'beats the vendor'): rung 06 + "
        "C aliased into the output (one in-place buffered stream; the "
        "separate C-in stream cost ~110 us/launch at p=4096) + "
        "offline-transposed B on the fast DMA geometry + 32 MB scoped "
        "VMEM. 334/358/362 TOPS at p=2048/3584/4096 vs the XLA vendor "
        "dot's 270-349/366/347-362 — wins at 4096 where rungs 08-13 "
        "all failed, parity elsewhere (see _kernel_bt)"))

_register(Rung(
    name="17_hand_pipeline_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw:
        pallas_emit_pipeline.mmult_q_bt_hand(qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0, regression=True,
    doc="REGRESSION (kept): rung 14's arithmetic under a HAND "
        "emit_pipeline schedule — the ladder's last deferred lever, "
        "built and measured. Every buffer-depth/lookahead config loses "
        "~1% to the auto pipeliner at p=4096 (351.4-353.6k vs 356.8k "
        "same-session), and the knobs order INVERTED: the config "
        "closest to auto behavior is the fastest, so the auto "
        "pipeliner was already hiding what this rung attacks. See "
        "pallas_emit_pipeline docstring + RESULTS.md 4096-contest "
        "closure"))

_register(Rung(
    name="18_ragged_m_int8", dtype="int8",
    run=lambda qa, sa, qbt, sb, c, **kw: pallas_int8.mmult_q_bt_ragged(
        qa, sa, qbt, sb, c, **kw),
    prepare=pallas_manual_dma.prepare_packed, effective=_packed_effective,
    gate_rel=1e-4, bytes_per_input_elt=1.0, regression=True,
    doc="REGRESSION (kept): rung 14's schedule with a RAGGED-M strip "
        "plan (round-5 stretch) — zero-padding tall-head + short-tail "
        "strips as two aliased pallas_calls, cutting the p=4096 plan "
        "from four 1024-row strips to three (1536+1536+1024), one "
        "fewer full B^T re-read (the freedom the vendor's 3x1368 "
        "backend_config schedule uses). MEASURED 0-0-7 against rung "
        "14 at p=4096 (median 340.0k vs 356.5k, interleaved ab): the "
        "~1% of saved B traffic is swamped by the tall strips' worse "
        "i-direction pipelining (the bm=2048 lesson recurring) and "
        "the tail call's pipeline restart. The vendor's ragged-strip "
        "freedom stays unprofitable in this programming model — the "
        "last Pallas-expressible idea from the round-4 ceiling "
        "record, now measured. See pallas_int8.mmult_q_bt_ragged"))


def _bf16_bt_effective(ops):
    a16, bt16 = ops
    return a16.astype(jnp.float32), jnp.swapaxes(bt16, 0, 1).astype(
        jnp.float32)


_register(Rung(
    name="15_packed_alias_bf16", dtype="bf16",
    run=lambda a16, bt16, c, **kw: pallas_tuned.mmult_bf16_bt(
        a16, bt16, c, **kw),
    prepare=pallas_tuned.prepare_bf16_bt, effective=_bf16_bt_effective,
    gate_rel=1e-3, bytes_per_input_elt=2.0,
    doc="THE bf16 SUMMIT (round 2): rung 14's recipe (aliased C + "
        "offline-transposed B) on the bf16 family — 182/185/184.5 "
        "TFLOPS at p=2048/3584/4096 vs the bf16 vendor dot's "
        "174/184/167 (rung 05: 135/154/164). XLA's own bf16 emitter "
        "beaten at every sweep size"))


def _fp32_bt_effective(ops):
    a, bt = ops
    return a, jnp.swapaxes(bt, 0, 1)


_register(Rung(
    name="16_packed_alias_fp32", dtype="fp32",
    run=lambda a, bt, c, **kw: pallas_tuned.mmult_fp32_bt(a, bt, c,
                                                          **kw),
    prepare=pallas_tuned.prepare_fp32_bt, effective=_fp32_bt_effective,
    gate_rel=1e-4,
    doc="THE fp32 SUMMIT (round 2): the rung-14 recipe at HIGHEST "
        "precision — 31.9/32.1 TFLOPS at p=2048/4096 vs the fp32 "
        "vendor dot's 29.4/29.9. With rungs 14 and 15, all three "
        "vendor bars of the ladder are beaten by hand kernels"))


_register(Rung(
    name="07_pallas_int4", dtype="int4",
    run=_int4_run,
    prepare=_int4_prepare, effective=_int4_effective,
    gate_rel=1e-3, bytes_per_input_elt=1.25,
    bytes_a=2.0, bytes_b=0.5,
    doc="int4 weight-only dequant+matmul, fused scale epilogue (cuda-int4)"))


def get(name: str) -> Rung:
    if name not in LADDER:
        raise KeyError(
            f"unknown rung {name!r}; available: {sorted(LADDER)}")
    return LADDER[name]


def names() -> list[str]:
    return sorted(LADDER)
