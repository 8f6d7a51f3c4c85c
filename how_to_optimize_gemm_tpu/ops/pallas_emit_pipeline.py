"""Rung 17 — hand-scheduled stream pipeline (emit_pipeline) for int8.

The ladder's last deferred lever (RESULTS.md round-3 gap 1; VERDICT
round-3 task 1). Rung 14 — same blocks, same dot, same epilogue — runs
under the AUTO-pipeliner, which double-buffers every stream uniformly
and supports neither deeper buffering nor cross-block lookahead (the
XLA pipeline-emitter lowering rejects ``buffer_count > 2`` and
``use_lookahead``). The measured consequences at p=4096 (RESULTS.md
round-2/3 trace campaigns): rung 14 sits at 357.6-358.5 TOPS, ~7%
under its own VMEM-resident dot ceiling (384), and the residue is
exactly what uniform double buffering cannot hide — the start-of-launch
ramp (first A strip + B^T block + C tile ≈ 10 MB of DMA before the
first dot can issue) and the strip-boundary refills (a new bm x K A
strip every nj-th step).

This rung keeps rung 14's arithmetic bit-for-bit (one dot_general per
(i, j) tile over the full-K strip, rank-1 dequant epilogue, aliased C)
and changes ONE thing: the pipeline is emitted BY HAND with
``pltpu.emit_pipeline``, which supports per-stream buffer counts and
lookahead:

- **A strip**: 2 buffers + ``use_lookahead=True``. A's block index
  only changes every nj steps; with lookahead the free slot starts
  fetching strip i+1 as soon as strip i is resident, so the strip
  boundary costs nothing instead of a serialized bm x K fetch-wait.
- **B^T blocks**: 3 buffers. The per-step B^T fetch (bn x K, ~2 MB at
  p=4096) is the one stream that must land every step; a third slot
  rides out HBM jitter that a double buffer converts into MXU stalls.
- **C in / out**: 2 buffers each (output buffering is capped at 2 by
  the pipeline emitter), aliased at the outer pallas_call exactly like
  rung 14 — C tile (i, j) is read ~2 steps before its own write, and
  distinct tiles touch disjoint HBM, so the alias is hazard-free.
- **Scales**: whole-array VMEM residents at the outer call (sa + sb is
  ~32 KB — streaming them through the pipeline would cost two tiny
  DMAs per step for nothing).

Reference analogue: the hand software-pipelining act of the ladder —
``aarch64/MMult_4x4_17.cpp:234-257`` (load/compute interleave by hand
once the auto-scheduler's uniform schedule leaves measured overhead)
and the cuda double-buffer rungs (``cuda/MMult_cuda_11.cu``,
``cuda/MMult_cuda_12.cu:77-82``): when the vendor schedule is the last
thing standing, schedule the streams yourself.

MEASURED VERDICT (round 4, v5e, chained protocol): an honest
REGRESSION, kept on the ladder like 03b/12/13. At p=4096 every knob
configuration loses to rung 14's auto-pipelined schedule:

    b_buffers=3 lookahead=True   352.0k GFLOPS
    b_buffers=2 lookahead=True   352.6k
    b_buffers=3 lookahead=False  352.6k
    b_buffers=2 lookahead=False  353.6k   (best — i.e. the config
                                           CLOSEST to the auto
                                           pipeliner's behavior)
    b_buffers=4 lookahead=True   351.4k
    rung 14 same session         356.8k

The ordering is the finding: deeper buffering and lookahead — the two
things only the hand pipeline can express — make it SLOWER, so the
auto-pipeliner was already hiding the ramp and strip-boundary stalls
this rung was built to attack, and emit_pipeline's software scheduling
machinery (per-step semaphore/bookkeeping in kernel code, vs the
window-param pipelining Mosaic compiles for pallas_call grids) costs a
flat ~1.2%. The companion campaign that reads the VENDOR fusion's own
compiled schedule and transplants its geometry is in RESULTS.md ("the
4096 contest, closed at schedule level"); the vendor's residual ~1%
lives in schedule freedoms neither pallas_call nor emit_pipeline
exposes (non-dividing windows, whole-operand cross-program prefetch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds
from how_to_optimize_gemm_tpu.ops.pallas_int8 import choose_blocks_bt
from how_to_optimize_gemm_tpu.utils import env
from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _scaled_body(sa_ref, sb_ref, bm, bn):
    """Inner pipeline body: rung 14's exact tile op sequence
    (rhs-transposed full-K dot_general -> rank-1 dequant -> + C); the
    scales come from the outer VMEM residents, sliced per tile with the
    pipeline's grid indices (emit_pipeline's grid_env makes
    pl.program_id return the INNER pipeline step's indices)."""
    def body(a_ref, bt_ref, c_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        sa = sa_ref[pl.ds(i * bm, bm), :]              # (bm, 1)
        sb = sb_ref[:, pl.ds(j * bn, bn)]              # (1, bn)
        acc = jax.lax.dot_general(
            a_ref[:], bt_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = (acc.astype(jnp.float32) * sa * sb + c_ref[:])
    return body


@functools.partial(jax.jit, static_argnames=(
    "bm", "bn", "interpret", "b_buffers", "a_lookahead",
    "vmem_limit_mb"))
def mmult_q_bt_hand(qa, sa, qbt, sb, c, *, bm: int | None = None,
                    bn: int | None = None,
                    b_buffers: int = 3, a_lookahead: bool = True,
                    vmem_limit_mb: int = 64,
                    interpret: bool | None = None):
    """C = dequant(QA @ QBT^T) + C under a hand emit_pipeline schedule.

    Same operands and blocks as rung 14 (``pallas_int8.mmult_q_bt``,
    full-K strips only — every square sweep size runs full-K), with the
    stream schedule emitted by hand; see the module docstring for the
    per-stream buffering rationale. ``b_buffers``/``a_lookahead`` are
    exposed for the autotune/A-B campaign."""
    m, n = c.shape
    k = qa.shape[1]
    abm, abn, abk = choose_blocks_bt(m, n, k)
    bm, bn = bm or abm, bn or abn
    del abk  # hand schedule streams full-K strips only
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, 512)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, 512)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    ni, nj = mp // bm, np_ // bn

    interp = default_interpret(interpret)
    if interp:
        env.ensure_interpret_tpu_info()

    def kernel(sa_ref, sb_ref, a_hbm, bt_hbm, c_hbm, o_hbm):
        pipe = pltpu.emit_pipeline(
            _scaled_body(sa_ref, sb_ref, bm, bn),
            grid=(ni, nj),
            in_specs=[
                pl.BlockSpec(
                    (bm, kp), lambda i, j: (i, 0),
                    pipeline_mode=pl.Buffered(
                        buffer_count=2, use_lookahead=a_lookahead)),
                pl.BlockSpec(
                    (bn, kp), lambda i, j: (j, 0),
                    pipeline_mode=pl.Buffered(buffer_count=b_buffers)),
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            ],
            out_specs=[
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            ],
        )
        pipe(a_hbm, bt_hbm, c_hbm, o_hbm)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sa resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sb resident
            pl.BlockSpec(memory_space=pl.ANY),    # A (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # B^T (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # C (HBM, aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interp,
    )(sa, sb, qa, qbt, c)
    return bounds.crop(out, m, n)
