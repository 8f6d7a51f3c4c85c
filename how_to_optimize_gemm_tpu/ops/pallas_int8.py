"""Rung 06 — int8 symmetric GEMM (chgemm capability slot).

Reference analogue: the chgemm submodule (README.md:71-85): int8 symmetric
quantization with values in [-127, 127], boundary handling for non-multiple
shapes, beating the fp32 theoretical peak on the same silicon. On TPU the
int8 path feeds the MXU at 2x the bf16 issue rate (v5e: ~394 TOPS int8 vs
~197 TFLOPS bf16), with int32 accumulation — the systolic-array counterpart
of chgemm's SMLAL/SADALP pipelines.

Schedule: identical 3D grid to rung 04 (that is the point of the ladder —
one new optimization per rung); the deltas here are (a) int8 operands +
int32 VMEM accumulator, (b) the fused dequant epilogue: per-row scale of A
x per-column scale of B applied as a rank-1 rescale at flush time, so the
MXU never stalls on VPU dequant work mid-loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds, quant
from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _kernel(a_ref, b_ref, sa_ref, sb_ref, c_ref, o_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        # Fused dequant epilogue: rank-1 (sa_i * sb_j) rescale + C.
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sa_ref[:] * sb_ref[:] + c_ref[:])


def _kernel_noc(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref):
    """C-less variant (serving path): y = dequant(QA @ QB). Skipping the
    C accumulate removes 2*M*N*4 bytes of HBM traffic — at 4096 that is
    128 MB against 32 MB of int8 operands, i.e. most of the memory-bound
    ceiling."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * sa_ref[:] * sb_ref[:]


def prepare(a: jnp.ndarray, b: jnp.ndarray):
    """Quantize fp32 operands: A per-row, B per-column (chgemm-style)."""
    qa, sa = quant.quantize_symmetric(a, axis=1)   # (M,K) int8, (M,1) f32
    qb, sb = quant.quantize_symmetric(b, axis=0)   # (K,N) int8, (1,N) f32
    return qa, sa, qb, sb


# Empirically validated working-set ceiling on v5e for this schedule:
# 512x512 C tile + full-K int8 strips up to bk=4096 compiles and runs
# (≈12 MB model working set); bk=8192 does not. Sweep data (p=4096):
# (256,256,512) 129 TOPS -> (512,512,2048) 244 -> (512,512,4096) 275;
# p=2048 full-K (512,512,2048) 296 TOPS = 75% of v5e's 394 nominal.
# Bigger C tiles lose (768/640 variants all regressed): the win is
# minimizing operand RELOADS (each of A/B is re-read gridj/gridi times),
# and 512x512 already amortizes the fp32 C/out traffic.
BK_CAP = 4096


def choose_blocks_q(m: int, n: int, k: int) -> tuple[int, int, int]:
    """(bm, bn, bk) for the int8 schedule: 512x512 C tile, full-K strips
    capped at BK_CAP (the reference derives GEMM_M/N/K from cache capacity
    the same way, ``aarch64/MMult_4x4_14.cpp:24-55``).

    Decode shapes (m <= 64) get 32-row tiles with a full-N strip — ties
    XLA's fused dequant+dot per linear (18.3 vs 18.8 us measured at
    (8,2048)x(2048,5632)); apply_linear still routes int8 decode to XLA
    since there is no win to bank."""
    if m <= 64:
        bm = bounds.round_up(max(m, 1), 32)
        bn = bounds._least_waste(bounds.round_up(n, 128), 8192, 128)
        return bm, bn, min(bounds.round_up(k, 512), 512)
    bm = min(bounds.round_up(m, 128), 512)
    bn = min(bounds.round_up(n, 128), 512)
    # bk: largest 512-multiple <= BK_CAP that wastes the least K padding
    # (a naive min(round_up(k,512), CAP) pads e.g. k=4224 up to 8192 —
    # doubling the work; measured as a 2.5x slowdown before this fix).
    k512 = bounds.round_up(k, 512)
    return bm, bn, min(bounds._least_waste(k512, BK_CAP, 512), k512)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret",
                                             "vmem_limit_mb"))
def mmult_q(qa, sa, qb, sb, c, *, bm: int | None = None,
            bn: int | None = None, bk: int | None = None,
            vmem_limit_mb: int | None = None,
            interpret: bool | None = None):
    """C = dequant(QA @ QB) + C on pre-quantized int8 operands.

    vmem_limit_mb raises Mosaic's scoped-VMEM ceiling for this call (the
    default ~14.3 MB): near the limit the pipeliner stops holding the
    revisited A block across j-steps, doubling operand traffic (the
    p=4096 regression rung 14 closes)."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_q(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qb = bounds.pad_dim(bounds.pad_dim(qb, 0, bk), 1, bn)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    _, np_ = qb.shape
    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
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
            **({"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
               if vmem_limit_mb else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qb, sa, sb, c)
    return bounds.crop(out, m, n)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q_noc(qa, sa, qb, sb, *, bm: int | None = None,
                bn: int | None = None, bk: int | None = None,
                interpret: bool | None = None):
    """y = dequant(QA @ QB), no C accumulate (serving fast path)."""
    m = qa.shape[0]
    n = qb.shape[1]
    abm, abn, abk = choose_blocks_q(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qb = bounds.pad_dim(bounds.pad_dim(qb, 0, bk), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    _, np_ = qb.shape
    out = pl.pallas_call(
        _kernel_noc,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
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
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qb, sa, sb)
    return bounds.crop(out, m, n)


def mmult(a, b, c, *, interpret: bool | None = None):
    """Full path (quantize + GEMM) on fp32 inputs — harness convenience."""
    qa, sa, qb, sb = prepare(a, b)
    return mmult_q(qa, sa, qb, sb, c, interpret=interpret)


def _kernel_bt(a_ref, bt_ref, sa_ref, sb_ref, c_ref, o_ref, acc_ref):
    """Rung 14 — the summit rung: aliased C + transposed-B streaming.

    Two optimizations over rung 06, each found by measurement (the
    round-2 ablation campaign, RESULTS.md):

    1. **Aliased C accumulate** (``input_output_aliases``): the stream
       ablation showed rung 06 pays ~110 us at p=4096 for the separate
       C-in stream — with C and out as distinct buffered streams the
       auto-pipeliner barely overlaps them with compute (pinning BOTH
       operand streams still ran at only 289 TOPS). Aliasing C into the
       output gives one in-place buffered block per tile: 275 -> 338
       TOPS at p=4096 from this change alone, bit-exact.
    2. **Transposed-B blocks** out of an offline-packed (N, K) array
       (``prepare_packed``): B^T (bn, bk) blocks stream at the
       full-width-row DMA geometry (~820 GB/s measured) instead of the
       tall-narrow (bk, 512) geometry (~520-670); the MXU contracts
       over the lane dim of each operand (dot_general rhs-transposed
       form). The pack is paid once offline, like PackMatrixB
       (``aarch64/MMult_4x4_11.cpp:39-63``) — and unlike manual rungs
       08-11, the auto-pipeliner keeps doing the DMA scheduling, so no
       per-tile issue overhead comes back.

    Together with a raised Mosaic VMEM ceiling (32 MB scoped; the
    working set stays ~13 MB): 334/358/362 TOPS at p=2048/3584/4096 vs
    rung 06's 294/337/275 — taking the vendor bar (06v: 270-349/366/
    347-362) at p=4096, the size the whole manual ladder (08-13) could
    not crack. The in-kernel dot itself measures 384 TOPS for these
    exact shapes when VMEM-resident, so the schedule is within ~6% of
    its own compute ceiling."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], bt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sa_ref[:] * sb_ref[:] + c_ref[:])


def _kernel_bt_1k(a_ref, bt_ref, sa_ref, sb_ref, c_ref, o_ref):
    """Single-k-step variant of ``_kernel_bt`` with NO accumulator
    scratch.

    Every square sweep size runs rung 14 with full-K strips, i.e.
    grid_k == 1 — the init/+=/flush protocol then round-trips each
    (bm, bn) int32 tile through VMEM scratch for nothing; here the dot
    feeds the dequant epilogue directly. Output identical bit-for-bit
    (same op sequence, no reassociation).

    MEASURED (round 3, interleaved 5-round A/B at p=3584/4096): a TIE
    within 0.01% — fused 364.37/357.64 vs scratch 364.40/357.65 median
    TOPS. The hypothesized 1-2% scratch round-trip cost (3*bm*bn*4
    bytes at ~24 TB/s per tile) is already fully hidden by the
    auto-pipeliner; the vendor's remaining ~1% edge at 3584 is NOT
    scratch traffic. Kept anyway: one less VMEM buffer (bm*bn*4 bytes
    of scoped scratch freed) at identical speed and exactness."""
    acc = jax.lax.dot_general(
        a_ref[:], bt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32)
                * sa_ref[:] * sb_ref[:] + c_ref[:])


def choose_blocks_bt(m: int, n: int, k: int) -> tuple[int, int, int]:
    """(bm, bn, bk) for rung 14: bn=512, full-K strips, and the TALLEST
    least-waste A strip whose double-buffered footprint stays under
    ~28 MB. Measured at p=3584: bm=512 -> 358 TOPS, bm=1792 (27.5 MB
    footprint) -> 364; at p=4096 bm=2048 (33.6 MB) regresses to 336 —
    the budget below encodes that boundary. Taller strips cut B
    re-reads (B is refetched once per A strip row)."""
    bn = min(bounds.round_up(n, 128), 512)
    k512 = bounds.round_up(k, 512)
    bk = min(bounds._least_waste(k512, BK_CAP, 512), k512)
    budget = 28 * 1024 * 1024
    # footprint(bm) = 2*bm*bk (A dbl-buf) + 2*bn*bk (B^T dbl-buf)
    #               + 3*bm*bn*4 (aliased-C dbl-buf + int32 acc)
    cap_rows = (budget - 2 * bn * bk) // (2 * bk + 12 * bn)
    # 1792 is the largest measured-good strip (bm=2048 at p=2048 reads
    # 308 TOPS where bm=1024 reads 340 — whole-M single-strip grids
    # lose the i-direction pipelining).
    cap_rows = min(max((cap_rows // 128) * 128, 512), 1792)
    bm = bounds._least_waste(bounds.round_up(m, 128), cap_rows, 128)
    return bm, bn, bk


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret",
                                             "vmem_limit_mb",
                                             "fused_flush"))
def mmult_q_bt(qa, sa, qbt, sb, c, *, bm: int | None = None,
               bn: int | None = None, bk: int | None = None,
               vmem_limit_mb: int | None = 48,
               fused_flush: bool | None = None,
               interpret: bool | None = None):
    """C = dequant(QA @ QBT^T) + C; QBT is B packed transposed (N, K).

    The rung-14 entrypoint (see ``_kernel_bt``). C is aliased into the
    output: inside this jit XLA inserts a copy only if the caller's c
    has other uses; the harness chain (out feeds next c) runs
    copy-free.

    fused_flush: when the chosen schedule has a single k step, route to
    ``_kernel_bt_1k`` (no accumulator scratch — the dot feeds the
    epilogue directly). None = auto (on whenever grid_k == 1); pass
    False to force the scratch protocol for A/B measurement."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_bt(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    one_k = kp // bk == 1
    use_1k = one_k if fused_flush is None else (fused_flush and one_k)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        input_output_aliases={4: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )
    vmem_kw = ({"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
               if vmem_limit_mb else {})
    if use_1k:
        out = pl.pallas_call(
            _kernel_bt_1k,
            grid=(mp // bm, np_ // bn),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, bk), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                **vmem_kw,
            ),
            **common,
        )(qa, qbt, sa, sb, c)
    else:
        out = pl.pallas_call(
            _kernel_bt,
            grid=(mp // bm, np_ // bn, kp // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
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
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel",
                                     "arbitrary"),
                **vmem_kw,
            ),
            **common,
        )(qa, qbt, sa, sb, c)
    return bounds.crop(out, m, n)


# -------------------------------------------------- rung 18 (ragged M)

def ragged_m_plan(mp: int, cap: int) -> list[tuple[int, int, int]]:
    """Strip plan [(bm, grid_m, off_blocks)] covering ``mp`` rows with
    ZERO padding and the fewest strips (each strip = one full B^T
    re-read, so strip count is the B-traffic knob the vendor's 3-strip
    p=4096 schedule wins ~1% with — RESULTS.md 4096 contest).

    The uniform chooser must sometimes choose between padding waste and
    an extra strip (p=4096, cap 1664: 3x1408 pads 128 rows; 4x1024 pads
    none — it picks 4 strips). A RAGGED plan gets both: a tall uniform
    head plus one shorter tail strip, expressible as TWO aliased
    pallas_calls when the tail offset is a multiple of the tail's own
    block height (BlockSpec index maps address in whole blocks). Plans:
    mp=4096 -> [(1536, 2, 0), (1024, 1, 3)] = 3 strips, no padding."""
    assert mp % 128 == 0, mp
    best: list[tuple[int, int, int]] | None = None

    def strips_of(plan):
        return sum(g for _, g, _ in plan)

    for bm1 in range(min(cap, mp), 127, -128):
        a, r = divmod(mp, bm1)
        if r == 0:
            plan = [(bm1, a, 0)]
        else:
            # tail block: largest 128-multiple dividing BOTH the tail
            # and the head extent (its blocks must start on their own
            # block grid)
            head = a * bm1
            bm2 = 0
            for c2 in range(min(cap, r), 127, -128):
                if r % c2 == 0 and head % c2 == 0:
                    bm2 = c2
                    break
            if not bm2:
                continue
            plan = [(bm1, a, 0), (bm2, r // bm2, head // bm2)]
        if best is None or strips_of(plan) < strips_of(best) or (
                strips_of(plan) == strips_of(best)
                and len(plan) < len(best)):
            best = plan
    assert best is not None
    return best


@functools.partial(jax.jit, static_argnames=("bn", "bk", "cap",
                                             "vmem_limit_mb",
                                             "interpret"))
def mmult_q_bt_ragged(qa, sa, qbt, sb, c, *, bn: int | None = None,
                      bk: int | None = None, cap: int | None = None,
                      vmem_limit_mb: int | None = 48,
                      interpret: bool | None = None):
    """Rung 18: rung 14's schedule with a RAGGED-M strip plan.

    The round-4 schedule read (RESULTS.md "int8@4096 contest") showed
    the vendor walks THREE ragged ~1368-row M strips at p=4096 where
    rung 14's zero-waste uniform chooser needs FOUR 1024-row strips —
    one extra full B^T re-read (~16.8 MB against ~100 MB of total
    traffic ~= the residual 1%). A padded 3x1408 attempt measured
    213.7k (the padding, not the strip count, was the killer). This
    rung removes the padding instead: a tall uniform head call plus one
    short tail call over the SAME buffers, the tail offset addressed in
    its own block units, chained through ``input_output_aliases`` so
    uncovered row blocks pass through in place (the kv_update partial-
    write idiom) — no slicing copies, no concat, no padding.

    Sizes whose best uniform plan is already pad-free at equal strip
    count (2048, 3072, 3584) delegate to rung 14 unchanged; the rung
    only diverges where raggedness buys a strip (4096: 3 vs 4).

    Reference slot: the vendor-beating schedule hunt of
    ``cuda/MMult_cuda_12.cu:77-82`` / ``README.md:96-102``."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_bt(m, n, qa.shape[1])
    bn, bk = bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, 128), 1, bk)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, 128), 1, bn)
    sa = bounds.pad_dim(sa, 0, 128)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    if cap is None:
        # same VMEM budget model as choose_blocks_bt, tail-capped
        budget = 28 * 1024 * 1024
        cap = (budget - 2 * bn * bk) // (2 * bk + 12 * bn)
        cap = min(max((cap // 128) * 128, 512), 1792)
    plan = ragged_m_plan(mp, cap)

    vmem_kw = ({"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
               if vmem_limit_mb else {})
    out = c
    for bm_s, gm, off in plan:
        out = pl.pallas_call(
            _kernel_bt,
            grid=(gm, np_ // bn, kp // bk),
            in_specs=[
                pl.BlockSpec((bm_s, bk), lambda i, j, kk, o=off:
                             (i + o, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm_s, 1), lambda i, j, kk, o=off:
                             (i + o, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm_s, bn), lambda i, j, kk, o=off:
                             (i + o, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm_s, bn), lambda i, j, kk, o=off:
                                   (i + o, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm_s, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel",
                                     "arbitrary"),
                **vmem_kw,
            ),
            out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
            input_output_aliases={4: 0},
            cost_estimate=pl.CostEstimate(
                flops=2 * gm * bm_s * np_ * kp,
                bytes_accessed=gm * bm_s * kp + kp * np_
                + 2 * gm * bm_s * np_ * 4,
                transcendentals=0,
            ),
            interpret=default_interpret(interpret),
        )(qa, qbt, sa, sb, out)
    return bounds.crop(out, m, n)
