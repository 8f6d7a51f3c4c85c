"""Rung 08 — hand-rolled double-buffered DMA pipeline (int8 GEMM).

Reference analogue: the hand-pipelining climax of both ladders — smem
ping-pong in ``cuda/MMult_cuda_8.cu:23-60`` and the register/smem dual
ping-pong of ``cuda/MMult_cuda_12.cu:151-208``, plus the manually
interleaved load/FMA scheduling of ``aarch64/MMult_4x4_17/21``. The
reference's lesson there is "issue the NEXT tile's loads before computing
the CURRENT tile"; the TPU translation is explicit HBM->VMEM ``async_copy``
ping-pong driven from inside the kernel, instead of the Mosaic
auto-pipeliner that rungs 03-07 rely on (their BlockSpec grids are what
``emit_pipeline`` automates).

Schedule: 2D grid over (M/bm, N/bn) C tiles; the K loop lives inside the
kernel. A and B stay in HBM (``memory_space=ANY``); two VMEM slots per
operand; iteration t starts the slot-(t+1)%2 DMAs for chunk t+1, waits on
slot t%2, and feeds the MXU from it. Same int8 x int8 -> int32 + fused
rank-1 dequant semantics as rung 06, so old-vs-new compares the two
pipelining strategies in isolation.

Honest results (v5e, p=4096, chained-timer best-of; kept in the spirit of
the reference's negative rungs, ``cuda/MMult_cuda_10.cu:62-67``):

    rung 06  auto-pipeline, 512x512xK-full            275 TOPS
    rung 08  manual ping-pong, 1024^2, dyn slots      264
    rung 09  + static slots / no temp / x2 unroll     269
    rung 10  + transposed-B pack + acc ping-pong      275
    rung 11  + row-resident A strips                  275
    rung 12  operand-resident, strided slices         218 (regression)
    rung 13  operand-resident, pre-tiled blocks       228 (regression)
    XLA int8 dot (the vendor bar, rung 06v)           360
    VMEM-resident acc+=dot probe (same shapes)        389

Rung 12/13's round-1 reading was a ">16 MB VMEM law": every >16 MB
config regressed, every <=16 MB config landed 260-294, and the gap to
the XLA emitter (275 vs 360 at p=4096) was attributed to scheduling
inside that window. ROUND 2 REVISED THIS: rung 14
(``pallas_int8._kernel_bt``) runs 27.5 MB streaming footprints fast —
what actually regressed 12/13 was resident-operand slicing, and what
capped p=4096 was the auto-pipeliner failing to overlap the C-in/out
streams once a kernel has five buffered streams (measured by stream
ablation; ``input_output_aliases`` alone took 275 -> 338 TOPS). The
open problem this docstring used to end on is closed: rung 14 beats
the vendor dot at p=2560-4096. These manual rungs stay on the ladder
as the honest record of the campaign that motivated the
instrumentation.

Lessons the ladder records: (a) a conditional set-vs-add in the K loop
makes Mosaic materialize a (bm, bn) int32 temp (+4 MB, one copy pass per
chunk, 239->269); (b) a traced buffer index on the MXU operand forces a
staging copy — unroll to static slots; (c) chunk DMA bandwidth depends
strongly on chunk geometry (527-827 GB/s, measured in
``probes.py``-style sweeps) — packing B transposed puts both operands on
the fast shape; (d) after all of that the manual pipeline only MATCHES
the auto-pipeliner: ~8 us/tile of DMA/step overhead separates both from
the XLA emitter's schedule, which reaches 93% of the VMEM-resident dot
rate. Closing that last gap is tracked as the next rung.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds, quant
from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _make_kernel(bm: int, bn: int, bk: int, nk: int):
    def kernel(qa_hbm, qb_hbm, sa_ref, sb_ref, c_ref, o_ref,
               a_buf, b_buf, acc_ref, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def dma_a(slot, t):
            return pltpu.make_async_copy(
                qa_hbm.at[pl.ds(i * bm, bm), pl.ds(t * bk, bk)],
                a_buf.at[slot], sems.at[slot, 0])

        def dma_b(slot, t):
            return pltpu.make_async_copy(
                qb_hbm.at[pl.ds(t * bk, bk), pl.ds(j * bn, bn)],
                b_buf.at[slot], sems.at[slot, 1])

        # Warm-up: fill slot 0 with chunk 0 (the cuda_12 "preload before
        # the main loop" step, MMult_cuda_12.cu:120-149).
        dma_a(0, 0).start()
        dma_b(0, 0).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = 1 - slot

            # Issue chunk t+1 into the other slot BEFORE blocking on
            # chunk t — the whole point of the ping-pong.
            @pl.when(t + 1 < nk)
            def _prefetch():
                dma_a(nxt, t + 1).start()
                dma_b(nxt, t + 1).start()

            dma_a(slot, t).wait()
            dma_b(slot, t).wait()
            acc_ref[:] += jnp.dot(a_buf[slot], b_buf[slot],
                                  preferred_element_type=jnp.int32)
            return 0

        jax.lax.fori_loop(0, nk, body, 0, unroll=False)
        o_ref[:] = (acc_ref[:].astype(jnp.float32)
                    * sa_ref[:] * sb_ref[:] + c_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q(qa, sa, qb, sb, c, *, bm: int = 512, bn: int = 512,
            bk: int = 1024, interpret: bool | None = None):
    """C = dequant(QA @ QB) + C, manual DMA ping-pong (rung 06 semantics)."""
    m, n = c.shape
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qb = bounds.pad_dim(bounds.pad_dim(qb, 0, bk), 1, bn)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    _, np_ = qb.shape
    nk = kp // bk
    out = pl.pallas_call(
        _make_kernel(bm, bn, bk, nk),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            # Operands stay in HBM; the kernel DMAs its own strips.
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bm, bk), jnp.int8),     # A ping-pong slots
            pltpu.VMEM((2, bk, bn), jnp.int8),     # B ping-pong slots
            pltpu.VMEM((bm, bn), jnp.int32),       # accumulator
            pltpu.SemaphoreType.DMA((2, 2)),       # per-slot A/B sems
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qb, sa, sb, c)
    return bounds.crop(out, m, n)


def _make_fat_kernel(bm: int, bn: int, bk: int, nk: int):
    """Fat-tile kernel: every buffer hand-managed (see mmult_q_fat)."""
    def kernel(qa_hbm, qb_hbm, sa_ref, sb_ref, c_hbm, o_hbm,
               a_buf, b_buf, c_buf, acc_ref, sems, c_sem, o_sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gj = pl.num_programs(1)
        first = jnp.logical_and(i == 0, j == 0)
        last = jnp.logical_and(i == pl.num_programs(0) - 1, j == gj - 1)
        # Row-major grid walk (last dim fastest): the tile after (i, j).
        lin_next = i * gj + j + 1
        ni = lin_next // gj
        nj = jax.lax.rem(lin_next, gj)

        def dma_a(slot, t, ii):
            return pltpu.make_async_copy(
                qa_hbm.at[pl.ds(ii * bm, bm), pl.ds(t * bk, bk)],
                a_buf.at[slot], sems.at[slot, 0])

        def dma_b(slot, t, jj):
            return pltpu.make_async_copy(
                qb_hbm.at[pl.ds(t * bk, bk), pl.ds(jj * bn, bn)],
                b_buf.at[slot], sems.at[slot, 1])

        def dma_c():
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                c_buf, c_sem)

        def dma_out():
            # acc holds the fp32 result BITCAST to int32 at flush time —
            # out is declared int32 so src/dst dtypes agree; the caller
            # bitcasts the array view back to fp32.
            return pltpu.make_async_copy(
                acc_ref,
                o_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)], o_sem)

        # Chunk-pair warm-up runs ONLY on the first tile; every later
        # tile's first pair was prefetched by its predecessor during the
        # predecessor's last pair (cross-tile software pipelining — the
        # grid-level analogue of cuda_12 prefetching the next gmem tile
        # inside the subk loop, MMult_cuda_12.cu:151-208). Measured: the
        # per-tile pipeline ramp this removes was ~10 us x 16 tiles at
        # p=4096 (264 -> ~360 TOPS).
        @pl.when(first)
        def _warmup():
            dma_a(0, 0, i).start()
            dma_b(0, 0, j).start()
            dma_a(1, 1, i).start()
            dma_b(1, 1, j).start()

        dma_c().start()

        # acc is also the writeback staging buffer: before touching it,
        # drain the PREVIOUS tile's out-DMA (same byte count, so this
        # descriptor's wait matches the previously started copy).
        @pl.when(jnp.logical_not(first))
        def _drain_prev():
            dma_out().wait()

        acc_ref[:] = jnp.zeros_like(acc_ref)

        # Static slot indices (the loop walks chunk PAIRS): a traced
        # ``a_buf[slot]`` read forces a staging copy of the whole slice
        # before the MXU can consume it; unrolling the ping-pong by two
        # keeps both reads static. Unconditional += so each dot
        # accumulates straight into acc — a conditional set-vs-add forced
        # Mosaic to materialize the product in a second (bm, bn) int32
        # temporary (+4 MB VMEM and a copy pass per chunk).
        def body(u, _):
            t0 = 2 * u
            t1 = t0 + 1

            dma_a(0, t0, i).wait()
            dma_b(0, t0, j).wait()
            acc_ref[:] += jnp.dot(a_buf[0], b_buf[0],
                                  preferred_element_type=jnp.int32)

            @pl.when(t0 + 2 < nk)
            def _refill0():
                dma_a(0, t0 + 2, i).start()
                dma_b(0, t0 + 2, j).start()

            @pl.when(jnp.logical_and(t0 + 2 >= nk,
                                     jnp.logical_not(last)))
            def _prefetch_next0():
                dma_a(0, 0, ni).start()
                dma_b(0, 0, nj).start()

            dma_a(1, t1, i).wait()
            dma_b(1, t1, j).wait()
            acc_ref[:] += jnp.dot(a_buf[1], b_buf[1],
                                  preferred_element_type=jnp.int32)

            @pl.when(t1 + 2 < nk)
            def _refill1():
                dma_a(1, t1 + 2, i).start()
                dma_b(1, t1 + 2, j).start()

            @pl.when(jnp.logical_and(t1 + 2 >= nk,
                                     jnp.logical_not(last)))
            def _prefetch_next1():
                dma_a(1, 1, ni).start()
                dma_b(1, 1, nj).start()
            return 0

        jax.lax.fori_loop(0, nk // 2, body, 0, unroll=False)

        dma_c().wait()
        val = (acc_ref[:].astype(jnp.float32) * sa_ref[:] * sb_ref[:]
               + c_buf[:])
        acc_ref[:] = jax.lax.bitcast_convert_type(val, jnp.int32)
        dma_out().start()

        @pl.when(last)
        def _drain_final():
            dma_out().wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q_fat(qa, sa, qb, sb, c, *, bm: int = 1024, bn: int = 1024,
                bk: int = 512, interpret: bool | None = None):
    """Rung 09 — fat-tile manual pipeline: C = dequant(QA @ QB) + C.

    Why it exists: operand HBM traffic scales as M*N*K*(1/bm + 1/bn), so
    doubling the C tile edge halves A/B reloads — but the Mosaic
    auto-pipeliner double-buffers EVERY block, and 1024x1024 tiles at that
    policy need >16 MB of VMEM (every such shape fails to compile under
    rung 06's schedule). Hand-managing the buffers fits them in ~10 MB:

      - A/B chunk slots, ping-pong:           2*(bm*bk + bk*bn)  int8
      - C tile, SINGLE buffer, fetched by a DMA issued at program start
        and waited only at flush — it overlaps the whole K loop:  bm*bn*4
      - accumulator that doubles as the writeback staging buffer: the
        fp32 result is bitcast into it and DMA'd out while the NEXT
        program's K loop runs (drained at the next program's start, the
        cross-grid-step analogue of cuda_12's epilogue overlap):  bm*bn*4

    The reference's counterpart of this buffer arithmetic is the 24 KB
    smem carve-up comment in ``cuda/MMult_cuda_9.cu:30-45`` and the XOR
    ping-pong addressing of ``cuda/MMult_cuda_11.cu:144-182``.
    """
    m, n = c.shape
    # K padded to chunk PAIRS: the kernel's ping-pong loop is unrolled x2.
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, 2 * bk)
    qb = bounds.pad_dim(bounds.pad_dim(qb, 0, 2 * bk), 1, bn)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    _, np_ = qb.shape
    nk = kp // bk
    out = pl.pallas_call(
        _make_fat_kernel(bm, bn, bk, nk),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, bm, bk), jnp.int8),
            pltpu.VMEM((2, bk, bn), jnp.int8),
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qb, sa, sb, c)
    out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return bounds.crop(out, m, n)


def _make_packed_kernel(bm: int, bn: int, bk: int, nk: int):
    """Rung 10 kernel: rung 09's pipeline, B stored TRANSPOSED (N, K),
    plus a PING-PONG ACCUMULATOR across grid steps.

    The acc ping-pong removes the last serialization rung 09 still had:
    with one accumulator, every tile must drain its own writeback DMA
    before the next tile may zero acc — an exposed ~5 us x tiles. With
    two, tile t writes acc[t%2] while tile t-1's result DMAs out of
    acc[(t-1)%2]; the drain only has to confirm tile t-2's DMA, which
    finished a whole K loop ago. One semaphore PER PARITY: a single
    counting semaphore would let tile t-1's completion satisfy the wait
    that must confirm tile t-2 (same-buffer) — a correctness bug, not a
    perf detail."""
    def kernel(qa_hbm, qbt_hbm, sa_ref, sb_ref, c_hbm, o_hbm,
               a_buf, bt_buf, c_buf, acc_ref, sems, c_sem, o_sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gj = pl.num_programs(1)
        lin = i * gj + j
        par = jax.lax.rem(lin, 2)
        first = lin == 0
        last = jnp.logical_and(i == pl.num_programs(0) - 1, j == gj - 1)
        lin_next = lin + 1
        ni = lin_next // gj
        nj = jax.lax.rem(lin_next, gj)

        def dma_a(slot, t, ii):
            return pltpu.make_async_copy(
                qa_hbm.at[pl.ds(ii * bm, bm), pl.ds(t * bk, bk)],
                a_buf.at[slot], sems.at[slot, 0])

        def dma_bt(slot, t, jj):
            # (bn, bk) chunk of the TRANSPOSED B — same row-geometry as
            # the A chunk, which is the whole point (DMA-friendly).
            return pltpu.make_async_copy(
                qbt_hbm.at[pl.ds(jj * bn, bn), pl.ds(t * bk, bk)],
                bt_buf.at[slot], sems.at[slot, 1])

        def dma_c():
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                c_buf, c_sem)

        def dma_out(p):
            return pltpu.make_async_copy(
                acc_ref.at[p],
                o_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                o_sems.at[p])

        @pl.when(first)
        def _warmup():
            dma_a(0, 0, i).start()
            dma_bt(0, 0, j).start()
            if nk > 1:
                dma_a(1, 1, i).start()
                dma_bt(1, 1, j).start()

        dma_c().start()

        # Confirm tile t-2's writeback left THIS parity's buffer (it was
        # issued two programs ago — virtually always already done).
        @pl.when(lin >= 2)
        def _drain_prev():
            dma_out(par).wait()

        acc_ref[par] = jnp.zeros_like(acc_ref[par])

        def contract(slot):
            # A (bm, bk) x B^T (bn, bk), contracting dim 1 of BOTH — the
            # MXU runs this at full rate (measured 389 TOPS, identical to
            # the untransposed dot).
            return jax.lax.dot_general(
                a_buf[slot], bt_buf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        # FULLY UNROLLED chunk walk (nk is static and small): a
        # lax.fori_loop here left ~9 us/tile of scheduling bubbles at the
        # loop back-edge — straight-line code lets Mosaic software-
        # pipeline DMA issue across the whole tile (measured 277 -> 341+
        # TOPS at p=2048). The reference learns the same lesson twice:
        # asm k-loop unrolling in MMult_4x4_17.cpp and #pragma unroll in
        # the cuda subk loops.
        for t in range(nk):
            slot = t % 2
            dma_a(slot, t, i).wait()
            dma_bt(slot, t, j).wait()
            acc_ref[par] += contract(slot)
            if t + 2 < nk:
                dma_a(slot, t + 2, i).start()
                dma_bt(slot, t + 2, j).start()
            else:
                # Last use of this slot: prefetch the NEXT tile's chunk
                # into it (chunk index = slot, since the next tile's walk
                # reuses the same slot assignment).
                @pl.when(jnp.logical_not(last))
                def _prefetch_next(slot=slot):
                    dma_a(slot, slot, ni).start()
                    dma_bt(slot, slot, nj).start()

        dma_c().wait()
        val = (acc_ref[par].astype(jnp.float32) * sa_ref[:] * sb_ref[:]
               + c_buf[:])
        acc_ref[par] = jax.lax.bitcast_convert_type(val, jnp.int32)
        dma_out(par).start()

        @pl.when(last)
        def _drain_final():
            dma_out(par).wait()

        @pl.when(jnp.logical_and(last, lin >= 1))
        def _drain_other():
            dma_out(1 - par).wait()

    return kernel


def prepare_packed(a: jnp.ndarray, b: jnp.ndarray):
    """Quantize + pack B TRANSPOSED (N, K) — the offline relayout step.

    Reference analogue: ``PackMatrixB`` / ``packB_4`` rearranging B panels
    into the order the micro-kernel streams (``aarch64/MMult_4x4_11.cpp:
    39-63``, ``MMult_4x4_13.cpp:338-360``). On TPU the "order the kernel
    streams" is the DMA-efficient chunk geometry: measured on v5e, a
    (1024, 2048) int8 chunk of a row-major array DMAs at 827 GB/s while
    the equivalent (2048, 1024) chunk of untransposed B gets 524 GB/s —
    the entire rung-09 -> rung-10 speedup is this relayout."""
    qa, sa = quant.quantize_symmetric(a, axis=1)
    qb, sb = quant.quantize_symmetric(b, axis=0)
    return qa, sa, qb.T.copy(), sb


def choose_blocks_fat(m: int, n: int, k: int) -> tuple[int, int, int]:
    # least-waste caps (CLAUDE.md rule): naive min(round_up, cap) pads
    # e.g. 2560 -> 3072/4096, up to 2.3x wasted work at sweep sizes
    bm = bounds._least_waste(bounds.round_up(m, 128), 1024, 128)
    bn = bounds._least_waste(bounds.round_up(n, 128), 1024, 128)
    bk = bounds._least_waste(bounds.round_up(k, 512), 2048, 512)
    return bm, bn, bk


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q_packed(qa, sa, qbt, sb, c, *, bm: int | None = None,
                   bn: int | None = None, bk: int | None = None,
                   interpret: bool | None = None):
    """Rung 10 — C = dequant(QA @ QB^T^T) + C on pre-packed operands.

    Rung 09's hand-managed pipeline with ONE new optimization (ladder
    discipline): B quantized AND transposed offline, so both operands DMA
    as (1024, 2048)-shaped chunks — the measured-fastest chunk geometry
    on v5e (827 GB/s vs 524-600 for rung 09's B chunks). The raised
    ``vmem_limit_bytes`` lets both ping-pong pairs + acc + C tile coexist
    (~16 MB; v5e has far more physical VMEM than Mosaic's default scoped
    limit admits)."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_fat(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    nk = kp // bk
    out = pl.pallas_call(
        _make_packed_kernel(bm, bn, bk, nk),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, bm, bk), jnp.int8),
            pltpu.VMEM((2, bn, bk), jnp.int8),
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((2, bm, bn), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qbt, sa, sb, c)
    out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return bounds.crop(out, m, n)


def _make_strip_kernel(bm: int, bn: int, bk: int, nk: int):
    """Rung 11 kernel: rung 10 + A-STRIP RESIDENCY.

    One new optimization (ladder discipline): the whole (bm, K) A strip
    is DMA'd into VMEM once per ROW of C tiles and reused across every
    tile in that row, instead of being re-fetched per tile. This is the
    GotoBLAS move the reference makes at ``aarch64/MMult_4x4_12.cpp:52-82``
    — pack A once (at j==0) and reuse the packed panel across the whole
    N loop. Strips are double-buffered by ROW parity: the first tile of
    row i starts the DMA for row i+1's strip, which lands sometime during
    the next ~gj K-loops. A/B/C/out HBM traffic at p=4096 drops from
    268 MB (rung 10) to 218 MB — under the compute time, so the kernel
    crosses from memory- to compute-bound."""
    def kernel(qa_hbm, qbt_hbm, sa_ref, sb_ref, c_hbm, o_hbm,
               a_strips, bt_buf, c_buf, acc_ref, a_sems, b_sems,
               c_sem, o_sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gi = pl.num_programs(0)
        gj = pl.num_programs(1)
        lin = i * gj + j
        par = jax.lax.rem(lin, 2)
        rpar = jax.lax.rem(i, 2)
        first = lin == 0
        last = jnp.logical_and(i == gi - 1, j == gj - 1)
        lin_next = lin + 1
        nj = jax.lax.rem(lin_next, gj)

        def dma_strip(p, ii):
            return pltpu.make_async_copy(
                qa_hbm.at[pl.ds(ii * bm, bm), :],
                a_strips.at[p], a_sems.at[p])

        def dma_bt(slot, t, jj):
            return pltpu.make_async_copy(
                qbt_hbm.at[pl.ds(jj * bn, bn), pl.ds(t * bk, bk)],
                bt_buf.at[slot], b_sems.at[slot])

        def dma_c():
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                c_buf, c_sem)

        def dma_out(p):
            return pltpu.make_async_copy(
                acc_ref.at[p],
                o_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                o_sems.at[p])

        @pl.when(first)
        def _warmup():
            dma_strip(0, i).start()
            dma_bt(0, 0, j).start()
            if nk > 1:
                dma_bt(1, 1, j).start()

        dma_c().start()

        # Row housekeeping at each row's first tile: drain this row's
        # strip DMA (started by the previous row, or by warmup), then
        # kick off the NEXT row's strip into the other parity buffer.
        @pl.when(j == 0)
        def _strip_ready():
            dma_strip(rpar, i).wait()

        @pl.when(jnp.logical_and(j == 0, i + 1 < gi))
        def _strip_next():
            dma_strip(1 - rpar, i + 1).start()

        @pl.when(lin >= 2)
        def _drain_prev():
            dma_out(par).wait()

        acc_ref[par] = jnp.zeros_like(acc_ref[par])

        def contract(slot, t):
            # Static K slice of the resident strip x B^T chunk.
            return jax.lax.dot_general(
                a_strips[rpar, :, t * bk:(t + 1) * bk], bt_buf[slot],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        for t in range(nk):
            slot = t % 2
            dma_bt(slot, t, j).wait()
            acc_ref[par] += contract(slot, t)
            if t + 2 < nk:
                dma_bt(slot, t + 2, j).start()
            else:
                @pl.when(jnp.logical_not(last))
                def _prefetch_next(slot=slot):
                    dma_bt(slot, slot, nj).start()

        dma_c().wait()
        val = (acc_ref[par].astype(jnp.float32) * sa_ref[:] * sb_ref[:]
               + c_buf[:])
        acc_ref[par] = jax.lax.bitcast_convert_type(val, jnp.int32)
        dma_out(par).start()

        @pl.when(last)
        def _drain_final():
            dma_out(par).wait()

        @pl.when(jnp.logical_and(last, lin >= 1))
        def _drain_other():
            dma_out(1 - par).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def mmult_q_strip(qa, sa, qbt, sb, c, *, bm: int | None = None,
                  bn: int | None = None, bk: int | None = None,
                  interpret: bool | None = None):
    """Rung 11 — C = dequant(QA @ QBt^T) + C with row-resident A strips."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_fat(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    nk = kp // bk
    out = pl.pallas_call(
        _make_strip_kernel(bm, bn, bk, nk),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, bm, kp), jnp.int8),     # row-parity A strips
            pltpu.VMEM((2, bn, bk), jnp.int8),     # B^T chunk ping-pong
            pltpu.VMEM((bm, bn), jnp.float32),     # C tile
            pltpu.VMEM((2, bm, bn), jnp.int32),    # acc ping-pong
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qbt, sa, sb, c)
    out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return bounds.crop(out, m, n)


def _make_resident_kernel(bm: int, bn: int, bk: int,
                          mp: int, np_: int, kp: int):
    """Rung 12 kernel: OPERAND-RESIDENT, fully static single program.

    v5e has ~128 MB of physical VMEM (the Mosaic default scoped limit of
    ~14 MB is just a default — measured by compiling 110 MB of scratch).
    While both int8 operands fit (p <= ~6k square), DMA each ONCE, keep
    them VMEM-resident, and emit the whole tile walk as straight-line
    code: grid=(1,), every loop Python-unrolled, every slice static.
    HBM traffic collapses to the information-theoretic floor
    (A + B + C + out = 168 MB at p=4096 vs 268-402 MB for rungs 06-11),
    and with it the kernel crosses decisively into compute-bound.

    This was the hypothesis for how XLA's own int8 dot reaches 360 TOPS
    at p=4096 where every streaming schedule stalls at ~275: not better
    overlap — less traffic. MEASURED RESULT: the hypothesis fails —
    190/218 TOPS (p=2048/4096), WORSE than the streaming rungs. Slicing
    MXU operands out of a large resident VMEM array is not free the way
    consuming a compact chunk buffer is: each (bm, bk) view costs a
    staging pass that outweighs the HBM traffic saved. Kept on the
    ladder as an honest negative result (the reference keeps cuda_6,
    4x4_15 and vk_3 for the same reason). Larger problems fall back to
    rung 11 (`mmult_q_strip`) in the wrapper, the reference's own
    pattern of shape-asserting its final rungs
    (``MMult_4x4_21.cpp:192``)."""
    gi, gj, nk = mp // bm, np_ // bn, kp // bk
    ntiles = gi * gj

    def kernel(qa_hbm, qbt_hbm, sa_ref, sb_ref, c_hbm, o_hbm,
               a_full, bt_full, c_buf, acc_ref, in_sems, c_sems, o_sems):
        def dma_in(idx, src, dst):
            return pltpu.make_async_copy(src, dst, in_sems.at[idx])

        def dma_c(i, j):
            par = (i * gj + j) % 2
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                c_buf.at[par], c_sems.at[par])

        def dma_out(i, j):
            par = (i * gj + j) % 2
            return pltpu.make_async_copy(
                acc_ref.at[par],
                o_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                o_sems.at[par])

        dma_in(0, qa_hbm, a_full).start()
        dma_in(1, qbt_hbm, bt_full).start()
        dma_c(0, 0).start()
        dma_in(0, qa_hbm, a_full).wait()
        dma_in(1, qbt_hbm, bt_full).wait()

        for i in range(gi):
            for j in range(gj):
                lin = i * gj + j
                par = lin % 2
                if lin + 1 < ntiles:
                    nxt = lin + 1
                    dma_c(nxt // gj, nxt % gj).start()
                if lin >= 2:
                    prev = lin - 2
                    dma_out(prev // gj, prev % gj).wait()
                acc_ref[par] = jnp.zeros_like(acc_ref[par])
                for t in range(nk):
                    acc_ref[par] += jax.lax.dot_general(
                        a_full[i * bm:(i + 1) * bm, t * bk:(t + 1) * bk],
                        bt_full[j * bn:(j + 1) * bn, t * bk:(t + 1) * bk],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                dma_c(i, j).wait()
                val = (acc_ref[par].astype(jnp.float32)
                       * sa_ref[i * bm:(i + 1) * bm]
                       * sb_ref[:, j * bn:(j + 1) * bn]
                       + c_buf[par])
                acc_ref[par] = jax.lax.bitcast_convert_type(val, jnp.int32)
                dma_out(i, j).start()

        dma_out(gi - 1, gj - 1).wait()
        if ntiles >= 2:
            prev = ntiles - 2
            dma_out(prev // gj, prev % gj).wait()

    return kernel


# Residency budget for rung 12 (bytes of VMEM scratch we allow; v5e
# physical VMEM is ~128 MB — leave headroom for Mosaic).
RESIDENT_BUDGET = 96 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def _mmult_q_resident(qa, sa, qbt, sb, c, *, bm, bn, bk,
                      interpret: bool | None = None):
    m, n = c.shape
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    out = pl.pallas_call(
        _make_resident_kernel(bm, bn, bk, mp, np_, kp),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((mp, kp), jnp.int8),        # resident A
            pltpu.VMEM((np_, kp), jnp.int8),       # resident B^T
            pltpu.VMEM((2, bm, bn), jnp.float32),  # C tile ping-pong
            pltpu.VMEM((2, bm, bn), jnp.int32),    # acc ping-pong
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qbt, sa, sb, c)
    out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return bounds.crop(out, m, n)


def mmult_q_resident(qa, sa, qbt, sb, c, *, bm: int | None = None,
                     bn: int | None = None, bk: int | None = None,
                     interpret: bool | None = None):
    """Rung 12 — C = dequant(QA @ QBt^T) + C, operand-resident VMEM.

    Falls back to rung 11 (`mmult_q_strip`) when the padded operands +
    tile buffers exceed the residency budget."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_fat(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    mp = bounds.round_up(m, bm)
    np_ = bounds.round_up(n, bn)
    kp = bounds.round_up(qa.shape[1], bk)
    need = (mp * kp + np_ * kp + 2 * bm * bn * 8)
    if need > RESIDENT_BUDGET:
        return mmult_q_strip(qa, sa, qbt, sb, c, bm=bm, bn=bn, bk=bk,
                             interpret=interpret)
    return _mmult_q_resident(qa, sa, qbt, sb, c, bm=bm, bn=bn, bk=bk,
                             interpret=interpret)


def _make_tiled_resident_kernel(bm: int, bn: int, bk: int,
                                gi: int, gj: int, nk: int):
    """Rung 13 kernel: rung 12's residency, PRE-TILED.

    Rung 12 proved residency alone loses: slicing MXU operands out of a
    big (mp, kp) VMEM array costs a staging pass per chunk. Here the
    resident buffers are 4D — a_res[i, t] and b_res[j, t] are CONTIGUOUS
    (bm, bk)/(bn, bk) blocks filled directly by the one-time DMAs, and
    every dot consumes a whole statically-indexed block, exactly like the
    streaming rungs' compact chunk buffers. The reference's packA/packB
    make the same move for the same reason: the panel is REPACKED into
    the exact layout the micro-kernel consumes, not merely cached
    (``aarch64/MMult_4x4_13.cpp:235-258``)."""
    ntiles = gi * gj

    def kernel(qa_hbm, qbt_hbm, sa_ref, sb_ref, c_hbm, o_hbm,
               a_res, b_res, c_buf, acc_ref, a_sems, b_sems,
               c_sems, o_sems):
        def dma_a(i, t):
            return pltpu.make_async_copy(
                qa_hbm.at[pl.ds(i * bm, bm), pl.ds(t * bk, bk)],
                a_res.at[i, t], a_sems.at[i, t])

        def dma_b(j, t):
            return pltpu.make_async_copy(
                qbt_hbm.at[pl.ds(j * bn, bn), pl.ds(t * bk, bk)],
                b_res.at[j, t], b_sems.at[j, t])

        def dma_c(i, j):
            par = (i * gj + j) % 2
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                c_buf.at[par], c_sems.at[par])

        def dma_out(i, j):
            par = (i * gj + j) % 2
            return pltpu.make_async_copy(
                acc_ref.at[par],
                o_hbm.at[pl.ds(i * bm, bm), pl.ds(j * bn, bn)],
                o_sems.at[par])

        # One-time tiled loads: every chunk of both operands, issued
        # up front; waits happen lazily at each chunk's FIRST use, so the
        # first tile's compute starts as soon as its own chunks land.
        for i in range(gi):
            for t in range(nk):
                dma_a(i, t).start()
        for j in range(gj):
            for t in range(nk):
                dma_b(j, t).start()
        dma_c(0, 0).start()

        for i in range(gi):
            for j in range(gj):
                lin = i * gj + j
                par = lin % 2
                if lin + 1 < ntiles:
                    nxt = lin + 1
                    dma_c(nxt // gj, nxt % gj).start()
                if lin >= 2:
                    prev = lin - 2
                    dma_out(prev // gj, prev % gj).wait()
                acc_ref[par] = jnp.zeros_like(acc_ref[par])
                for t in range(nk):
                    if j == 0:
                        dma_a(i, t).wait()
                    if i == 0:
                        dma_b(j, t).wait()
                    acc_ref[par] += jax.lax.dot_general(
                        a_res[i, t], b_res[j, t],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                dma_c(i, j).wait()
                val = (acc_ref[par].astype(jnp.float32)
                       * sa_ref[i * bm:(i + 1) * bm]
                       * sb_ref[:, j * bn:(j + 1) * bn]
                       + c_buf[par])
                acc_ref[par] = jax.lax.bitcast_convert_type(val, jnp.int32)
                dma_out(i, j).start()

        dma_out(gi - 1, gj - 1).wait()
        if ntiles >= 2:
            prev = ntiles - 2
            dma_out(prev // gj, prev % gj).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def _mmult_q_tiled_resident(qa, sa, qbt, sb, c, *, bm, bn, bk,
                            interpret: bool | None = None):
    m, n = c.shape
    qa = bounds.pad_dim(bounds.pad_dim(qa, 0, bm), 1, bk)
    qbt = bounds.pad_dim(bounds.pad_dim(qbt, 0, bn), 1, bk)
    c = bounds.pad_dim(bounds.pad_dim(c, 0, bm), 1, bn)
    sa = bounds.pad_dim(sa, 0, bm)
    sb = bounds.pad_dim(sb, 1, bn)
    mp, kp = qa.shape
    np_ = qbt.shape[0]
    gi, gj, nk = mp // bm, np_ // bn, kp // bk
    out = pl.pallas_call(
        _make_tiled_resident_kernel(bm, bn, bk, gi, gj, nk),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((gi, nk, bm, bk), jnp.int8),   # tiled-resident A
            pltpu.VMEM((gj, nk, bn, bk), jnp.int8),   # tiled-resident B^T
            pltpu.VMEM((2, bm, bn), jnp.float32),     # C tile ping-pong
            pltpu.VMEM((2, bm, bn), jnp.int32),       # acc ping-pong
            pltpu.SemaphoreType.DMA((gi, nk)),
            pltpu.SemaphoreType.DMA((gj, nk)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=default_interpret(interpret),
    )(qa, qbt, sa, sb, c)
    out = jax.lax.bitcast_convert_type(out, jnp.float32)
    return bounds.crop(out, m, n)


def mmult_q_tiled_resident(qa, sa, qbt, sb, c, *, bm: int | None = None,
                           bn: int | None = None, bk: int | None = None,
                           interpret: bool | None = None):
    """Rung 13 — C = dequant(QA @ QBt^T) + C, TILED-resident VMEM.

    Falls back to rung 11 (`mmult_q_strip`) when the tiled operands +
    tile buffers exceed the residency budget."""
    m, n = c.shape
    abm, abn, abk = choose_blocks_fat(m, n, qa.shape[1])
    bm, bn, bk = bm or abm, bn or abn, bk or abk
    mp = bounds.round_up(m, bm)
    np_ = bounds.round_up(n, bn)
    kp = bounds.round_up(qa.shape[1], bk)
    need = (mp * kp + np_ * kp + 4 * bm * bn * 8)
    if need > RESIDENT_BUDGET:
        return mmult_q_strip(qa, sa, qbt, sb, c, bm=bm, bn=bn, bk=bk,
                             interpret=interpret)
    return _mmult_q_tiled_resident(qa, sa, qbt, sb, c, bm=bm, bn=bn,
                                   bk=bk, interpret=interpret)


def mmult(a, b, c, *, interpret: bool | None = None):
    """Full path (quantize + GEMM) on fp32 inputs — harness convenience."""
    qa, sa = quant.quantize_symmetric(a, axis=1)
    qb, sb = quant.quantize_symmetric(b, axis=0)
    return mmult_q(qa, sa, qb, sb, c, interpret=interpret)
