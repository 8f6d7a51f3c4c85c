"""Hardware peak probes — L0 of the reference.

Analogue of ``aarch64/gflops_benchmark`` (1e9 chained fmla iterations
measuring raw FPU peak; ``func1.S`` has cross-register dependencies,
``func2.S`` is dependency-free — both kept here) and the
``vulkan/benchmark`` suite (gflops_fmla, gmem_bandwidth). On TPU:

- mxu_peak_gflops(dtype): Pallas kernel chaining matmuls on VMEM-resident
  tiles; all FLOPs hit the MXU with zero HBM traffic after the first
  fetch. The serial dependency through the accumulator prevents elision.
- hbm_bandwidth_gbps(): streaming copy, chained at the jit level so the
  traffic dwarfs the dispatch round trip (gmem_bandwidth.comp analogue).
- vpu_peak_gflops(dependent=True/False): chained element-wise FMA —
  dependent = func1.S (latency-bound), independent 4-way = func2.S
  (throughput).

These measured ceilings are the roofline lines the plot layer draws,
replacing armv7/proc_parameters.m's ``nflops_per_cycle * nprocessors *
GHz`` model (armv7/PlotAll.m:14-16) with live measurements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.utils.env import default_interpret
from how_to_optimize_gemm_tpu.utils.timing import measure


def _mxu_kernel(n_iters: int, acc_dtype, precision):
    def kernel(x_ref, y_ref, o_ref):
        def body(_, acc):
            # acc feeds back into the product chain -> serial MXU deps,
            # nothing can be hoisted or elided (cf. func1.S chained fmla).
            return jnp.dot(x_ref[:], acc.astype(x_ref.dtype),
                           preferred_element_type=acc_dtype,
                           precision=precision)
        acc0 = y_ref[:].astype(acc_dtype)
        o_ref[:] = jax.lax.fori_loop(0, n_iters, body, acc0)
    return kernel


@functools.partial(jax.jit, static_argnames=("size", "n_iters", "dtype_name",
                                             "interpret"))
def _mxu_probe(x, y, *, size, n_iters, dtype_name, interpret):
    acc_dtype = jnp.int32 if dtype_name == "int8" else jnp.float32
    # fp32 "true precision" runs as multi-pass bf16 on the MXU (HIGHEST);
    # bf16/int8 run single-pass.
    precision = (jax.lax.Precision.HIGHEST if dtype_name == "float32"
                 else jax.lax.Precision.DEFAULT)
    return pl.pallas_call(
        _mxu_kernel(n_iters, acc_dtype, precision),
        out_shape=jax.ShapeDtypeStruct((size, size), acc_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=default_interpret(interpret),
    )(x, y)


def mxu_peak_gflops(dtype=jnp.bfloat16, size: int = 512,
                    n_iters: int = 20000, repeats: int = 5,
                    interpret: bool | None = None) -> float:
    """Measured MXU peak for square ``size`` tiles of ``dtype``."""
    dtype_name = jnp.dtype(dtype).name
    if dtype_name == "int8":
        x = jnp.ones((size, size), jnp.int8)
        y = jnp.ones((size, size), jnp.int8)
    else:
        key = jax.random.PRNGKey(0)
        # Near-unit spectral scaling keeps the chained products finite.
        x = (jax.random.uniform(key, (size, size)) * (2.0 / size)).astype(dtype)
        y = jnp.ones((size, size), dtype)
    run = lambda: _mxu_probe(x, y, size=size, n_iters=n_iters,
                             dtype_name=dtype_name, interpret=interpret)
    best = measure(run, repeats=repeats, warmup=1)
    return 2.0 * size * size * size * n_iters / best / 1e9


def _mxu_throughput_kernel(n_iters: int, acc_dtype, vary=None):
    """acc += vary(x, t) @ y on resident tiles — the throughput pattern
    GEMM kernels actually run: independent MXU passes, unlike the
    latency-bound serial chain of mxu_peak_gflops (func1 vs func2,
    gflops_benchmark). vary keeps x loop-variant so nothing hoists;
    default is xor-with-t (integer dtypes). Shared by the int8
    throughput probe and the bf16 depth sweep so the two numbers that
    get compared come from provably identical methodology."""
    def kernel(x_ref, y_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(t, _):
            xv = (x_ref[:] ^ t.astype(x_ref.dtype)) if vary is None \
                else vary(x_ref[:], t)
            acc_ref[:] += jax.lax.dot_general(
                xv, y_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            return 0

        jax.lax.fori_loop(0, n_iters, body, 0)
        o_ref[:] = acc_ref[:]
    return kernel


def mxu_throughput_gflops(size: int = 1024, n_iters: int = 90000,
                          repeats: int = 2,
                          interpret: bool | None = None) -> float:
    """MXU int8 THROUGHPUT ceiling: independent accumulating matmuls on
    VMEM-resident tiles (measured 385-390 TOPS on v5e vs ~394 nominal;
    the serial-chain probe reads ~235 because each matmul waits for the
    previous). This is the roofline the GEMM ladder is judged against.

    n_iters sized for ~2 s of device time: sub-0.5 s launches are noise
    behind the axon relay's ±ms round-trip jitter."""
    x = jnp.ones((size, size), jnp.int8)
    y = jnp.ones((size, size), jnp.int8)

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            _mxu_throughput_kernel(n_iters, jnp.int32),
            out_shape=jax.ShapeDtypeStruct((size, size), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((size, size), jnp.int32)],
            interpret=default_interpret(interpret),
        )(x, y)

    best = measure(lambda: run(x, y), repeats=repeats, warmup=1)
    return 2.0 * size ** 3 * n_iters / best / 1e9


def mxu_depth_gflops(depth: int = 64, size: int = 512,
                     n_iters: int | None = None, repeats: int = 2,
                     interpret: bool | None = None) -> float:
    """bf16 MXU rate vs CONTRACTION DEPTH: accumulating
    (size, depth) @ (depth, size) dots on VMEM-resident tiles.

    The measurement behind the flash-attention d=64 question (round-2
    gap list #2): the score matmul contracts over the head dim, so a
    d=64 model feeds the MXU half its native depth. If this probe
    reads ~half the depth-128 rate at depth 64, the kernel is MXU-
    depth-bound and no packing scheme recovers it — block-diagonal /
    zero-extension packings (the _kernel_v4 trick) insert exactly as
    many zero MACs as the idle depth wastes, so useful utilization is
    unchanged. The only true lever is head geometry (d=128 models)."""
    if n_iters is None:
        # ~1.5 s of device time at an assumed 160 TF bf16 ceiling
        n_iters = max(1, int(1.5 * 160e12 / (2 * size * size * depth)))
    x = jnp.ones((size, depth), jnp.bfloat16)
    y = jnp.ones((depth, size), jnp.bfloat16)

    # sign-flip keeps x loop-variant (bf16 has no xor; one VPU multiply
    # over (m, depth) is noise next to the dot)
    vary = lambda xv, t: xv * (1 - 2 * (t % 2)).astype(xv.dtype)

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            _mxu_throughput_kernel(n_iters, jnp.float32, vary),
            out_shape=jax.ShapeDtypeStruct((size, size), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((size, size), jnp.float32)],
            interpret=default_interpret(interpret),
        )(x, y)

    best = measure(lambda: run(x, y), repeats=repeats, warmup=1)
    return 2.0 * size * size * depth * n_iters / best / 1e9


def _vpu_exp_kernel(n_iters: int):
    def kernel(x_ref, o_ref):
        y = x_ref[:]

        def body(t, acc):
            # t-dependent scale keeps the exp loop-variant (no hoisting);
            # the mul+add around it are noise next to the transcendental
            return acc + jnp.exp(y * (1.0 + 1e-7 * t.astype(jnp.float32)))

        o_ref[:] = jax.lax.fori_loop(0, n_iters, body, jnp.zeros_like(y))
    return kernel


def vpu_exp_gelems(size: int = 512, n_iters: int | None = None,
                   repeats: int = 2,
                   interpret: bool | None = None) -> float:
    """fp32 exp throughput (Gelem/s) on a VMEM-resident tile — the
    transcendental companion to vpu_peak_gflops (gflops_fmla slot,
    vulkan/benchmark/gflops_fmla.cpp:45-50).

    Why it's in the suite: flash attention at d=64 does 4*d = 256 MXU
    FLOPs but ONE exp per score element, so once the score matmuls run
    near peak the kernel's ceiling is this number times 256 FLOPs/elem.
    It turns the observed ~34-53 TF d=64 attention rate into a roofline
    statement instead of a shrug (RESULTS.md flash section)."""
    if n_iters is None:
        # ~1 s of device time at an assumed 100 Gelem/s
        n_iters = max(1, int(1.0 * 100e9 / (size * size)))
    x = jnp.full((size, size), -0.5, jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _vpu_exp_kernel(n_iters),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=default_interpret(interpret),
        )(x)

    best = measure(lambda: run(x), repeats=repeats, warmup=1)
    return float(x.size) * n_iters / best / 1e9


def _copy_kernel(src_ref, dst_ref):
    dst_ref[:] = src_ref[:]


def _hbm_copy_once(x, interpret):
    bm = 512
    return pl.pallas_call(
        _copy_kernel,
        grid=(x.shape[0] // bm,),
        in_specs=[pl.BlockSpec((bm, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=default_interpret(interpret),
    )(x)


@functools.partial(jax.jit, static_argnames=("chain", "interpret"))
def _hbm_copy_chain(x, *, chain, interpret):
    # Chained copies (y = copy(y)): total traffic = chain * 2 * |x|,
    # amortizing the dispatch round trip out of the measurement.
    return jax.lax.fori_loop(
        0, chain, lambda _, y: _hbm_copy_once(y, interpret), x)


def hbm_bandwidth_gbps(mbytes: int = 512, chain: int = 32,
                       repeats: int = 5,
                       interpret: bool | None = None) -> float:
    """Streaming HBM read+write bandwidth via chained grid copy kernels.

    Measured note (v5e): the Mosaic auto-pipeliner does NOT overlap the
    input and output DMA streams of a pure copy (~316 GB/s r+w), while
    XLA's fusion-emitted loop reaches ~650 GB/s — compare
    xla_stream_bandwidth_gbps(). Closing that gap needs manual
    double-buffered DMA (pltpu.make_async_copy), tracked as a ladder
    follow-up.
    """
    rows = mbytes * 1024 * 1024 // (4 * 2048)
    rows = max((rows // 512) * 512, 512)
    x = jnp.ones((rows, 2048), jnp.float32)
    run = lambda: _hbm_copy_chain(x, chain=chain, interpret=interpret)
    best = measure(run, repeats=repeats, warmup=1)
    nbytes = 2 * x.size * 4 * chain  # read + write per chained copy
    return nbytes / best / 1e9


@functools.partial(jax.jit, static_argnames=("chain",))
def _xla_stream_chain(x, *, chain):
    return jax.lax.fori_loop(0, chain, lambda _, y: y * 1.000001, x)


def xla_stream_bandwidth_gbps(mbytes: int = 512, chain: int = 32,
                              repeats: int = 5) -> float:
    """HBM r+w bandwidth through XLA's own streaming loop (vendor bar for
    the copy probe, like cuBLAS is for the GEMM ladder)."""
    rows = max((mbytes * 1024 * 1024 // (4 * 2048) // 512) * 512, 512)
    x = jnp.ones((rows, 2048), jnp.float32)
    best = measure(lambda: _xla_stream_chain(x, chain=chain),
                   repeats=repeats, warmup=1)
    return 2 * x.size * 4 * chain / best / 1e9


def _vpu_kernel(n_iters: int, dependent: bool):
    def kernel(x_ref, o_ref):
        y = x_ref[:]
        if dependent:
            # func1.S analogue: one serial FMA chain (latency-bound).
            def body(_, acc):
                for _ in range(8):
                    acc = acc * 1.000001 + y
                return acc
            o_ref[:] = jax.lax.fori_loop(0, n_iters, body, y)
        else:
            # func2.S analogue: 4 independent chains (throughput-bound).
            def body(_, accs):
                return tuple(a * 1.000001 + y for a in accs)
            accs = jax.lax.fori_loop(0, n_iters, body, (y, y * 2, y * 3,
                                                        y * 4))
            o_ref[:] = accs[0] + accs[1] + accs[2] + accs[3]
    return kernel


def vpu_peak_gflops(size: int = 512, n_iters: int = 40000,
                    repeats: int = 5, dependent: bool = False,
                    interpret: bool | None = None) -> float:
    """Chained element-wise FMA peak (gflops_benchmark analogue)."""
    x = jnp.full((size, 512), 1e-6, jnp.float32)
    fma_per_iter = 8 if dependent else 4

    @jax.jit
    def run():
        return pl.pallas_call(
            _vpu_kernel(n_iters, dependent),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=default_interpret(interpret),
        )(x)

    best = measure(run, repeats=repeats, warmup=1)
    return 2.0 * fma_per_iter * x.size * n_iters / best / 1e9


def _chunk_kernel(rows: int, cols: int, nchunks: int, nj: int, reps: int):
    def kernel(x_hbm, o_ref, buf, sems):
        def dma(slot, t):
            ii = t // nj
            jj = jax.lax.rem(t, nj)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * rows, rows), pl.ds(jj * cols, cols)],
                buf.at[slot], sems.at[slot])

        def touch(slot):
            # Consume a sliver so the copies can't be elided (int8 scalar
            # extracts don't lower; reduce a tile instead).
            return jnp.sum(buf[slot, :8, :128].astype(jnp.int32))

        def outer(r, acc):
            dma(0, 0).start()

            @pl.when(nchunks > 1)
            def _():
                dma(1, 1).start()

            def body(u, av):
                t0 = 2 * u
                t1 = t0 + 1
                dma(0, t0).wait()
                av += touch(0)

                @pl.when(t0 + 2 < nchunks)
                def _():
                    dma(0, t0 + 2).start()

                dma(1, t1).wait()
                av += touch(1)

                @pl.when(t1 + 2 < nchunks)
                def _():
                    dma(1, t1 + 2).start()
                return av

            return jax.lax.fori_loop(0, nchunks // 2, body, acc)

        o_ref[0, 0] = jax.lax.fori_loop(0, reps, outer, jnp.int32(0))
    return kernel


def dma_chunk_bandwidth_gbps(rows: int, cols: int, parent: int = 4096,
                             reps: int = 256,
                             interpret: bool | None = None) -> float:
    """HBM->VMEM read bandwidth for (rows, cols) int8 chunks DMA'd out of
    a row-major (parent, parent) array with double-buffered manual copies.

    The probe behind rung 10's transposed-B packing: chunk GEOMETRY, not
    just chunk size, sets DMA throughput (v5e measured: (1024, 2048)
    chunks 827 GB/s; (2048, 1024) 524; (1024, 1024) 599) — the TPU
    counterpart of the reference measuring gmem burst behavior in
    ``vulkan/benchmark/gmem_bandwidth.cpp``."""
    ni, nj = parent // rows, parent // cols
    nchunks = ni * nj
    # The kernel walks chunks in double-buffered PAIRS (fori over
    # nchunks//2): an odd count would leave the last started DMA
    # unwaited (dangling starts accumulating on the semaphore) and a
    # single-chunk walk would measure zero actual traffic.
    if nchunks < 2 or nchunks % 2:
        raise ValueError(
            f"(rows={rows}, cols={cols}) gives {nchunks} chunks of the "
            f"{parent}x{parent} parent; the double-buffered walk needs "
            "an even count >= 2")
    x = jnp.ones((parent, parent), jnp.int8)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _chunk_kernel(rows, cols, nchunks, nj, reps),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((2, rows, cols), jnp.int8),
                            pltpu.SemaphoreType.DMA((2,))],
            interpret=default_interpret(interpret),
        )(x)

    best = measure(lambda: run(x), repeats=3, warmup=1)
    return parent * parent * reps / best / 1e9


def _vmem_copy_kernel(n_iters: int):
    def kernel(x_ref, o_ref, buf_ref):
        def body(t, _):
            # VMEM->VMEM traffic through the VPU, alternating direction
            # so neither copy is dead. xor-with-t defeats elision.
            buf_ref[:] = x_ref[:] ^ t.astype(jnp.int8)
            o_ref[:] = buf_ref[:]
            return 0
        jax.lax.fori_loop(0, n_iters, body, 0)
    return kernel


def vmem_bandwidth_gbps(mbytes: int = 4, n_iters: int = 40000,
                        repeats: int = 3,
                        interpret: bool | None = None) -> float:
    """VMEM read+write bandwidth through VPU copies — the analogue of the
    reference's shared-memory bandwidth probe
    (``vulkan/benchmark/smem_bandwidth.cpp``). Both buffers VMEM-resident;
    each iteration moves 4x the buffer (2 copies x r+w)."""
    rows = max(mbytes * 1024 * 1024 // 2048 // 2, 8)
    x = jnp.ones((rows, 2048), jnp.int8)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _vmem_copy_kernel(n_iters),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(x.shape, x.dtype)],
            interpret=default_interpret(interpret),
        )(x)

    best = measure(lambda: run(x), repeats=repeats, warmup=1)
    return 4.0 * x.size * n_iters / best / 1e9


def _dma_latency_kernel(n_iters: int, rows: int, cols: int,
                        do_dma: bool, nsrc: int):
    def kernel(x_hbm, o_ref, buf, sem):
        def body(t, acc):
            if do_dma:
                r = jax.lax.rem(t, nsrc) * rows
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(r, rows), :], buf, sem)
                cp.start()
                cp.wait()
            # Consume the landed tile so the chain is data-serial
            # (int8 scalar extracts don't lower; reduce instead).
            return acc + jnp.sum(buf[:, :].astype(jnp.int32))
        o_ref[0, 0] = jax.lax.fori_loop(0, n_iters, body, jnp.int32(0))
    return kernel


def dma_latency_ns(rows: int = 32, cols: int = 128,
                   n_iters: int = 400_000, repeats: int = 3,
                   interpret: bool | None = None) -> float:
    """HBM->VMEM DMA issue+completion latency, serially dependent.

    The analogue of the reference's gmem->smem latency probe
    (``vulkan/benchmark/smem_latency.cpp:32-37``, ~80 ns on Jetson Nano).
    Each iteration starts ONE minimal (rows, cols) int8 chunk copy and
    immediately waits on it, so iterations serialize on the full
    issue->transfer->signal->wake path; at 4 KB the wire time is ~5 ns,
    so the figure is dominated by latency, not bandwidth. The same loop
    without the DMA (sum only) is subtracted as the loop-overhead
    baseline. This is the per-step cost the manual-DMA rungs pay on
    every chunk — the number behind their measured ~us/tile overhead
    (``pallas_manual_dma.py``)."""
    nsrc = 8
    x = jnp.ones((rows * nsrc, cols), jnp.int8)

    def run(do_dma: bool, iters: int):
        @jax.jit
        def go(x):
            return pl.pallas_call(
                _dma_latency_kernel(iters, rows, cols, do_dma, nsrc),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.VMEM((rows, cols), jnp.int8),
                                pltpu.SemaphoreType.DMA(())],
                interpret=default_interpret(interpret),
            )(x)
        return measure(lambda: go(x), repeats=repeats, warmup=1)

    t_dma = run(True, n_iters)
    t_base = run(False, n_iters)
    return max(t_dma - t_base, 0.0) / n_iters * 1e9


def _manual_copy_kernel(rows: int, cols: int, nchunks: int, nslots: int,
                        reps: int):
    def kernel(src_hbm, dst_hbm, o_ref, buf, rsems, wsems):
        def read(slot, t):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(t * rows, rows), :],
                buf.at[slot], rsems.at[slot])

        def write(slot, t):
            return pltpu.make_async_copy(
                buf.at[slot], dst_hbm.at[pl.ds(t * rows, rows), :],
                wsems.at[slot])

        def outer(r, _):
            for s in range(nslots):
                read(s, s).start()

            def body(t, _):
                slot = jax.lax.rem(t, nslots)
                read(slot, t).wait()
                write(slot, t).start()

                @pl.when(t + nslots < nchunks)
                def _():
                    # The slot's next read may only launch after its
                    # write drained; with nslots in flight the other
                    # slots keep both directions busy meanwhile.
                    write(slot, t).wait()
                    read(slot, t + nslots).start()
                return 0

            jax.lax.fori_loop(0, nchunks, body, 0)
            # Drain the tail writes (chunk nchunks-nslots+s lives in
            # slot s because nchunks % nslots == 0).
            for s in range(nslots):
                write(s, nchunks - nslots + s).wait()
            return 0

        jax.lax.fori_loop(0, reps, outer, 0)
        o_ref[0, 0] = jnp.int32(nchunks)
    return kernel


def hbm_copy_manual_gbps(mbytes: int = 256, rows: int = 512,
                         cols: int = 2048, nslots: int = 4,
                         reps: int = 8, repeats: int = 3,
                         interpret: bool | None = None) -> float:
    """HBM r+w copy bandwidth via MANUAL multi-buffered DMA.

    The follow-up named in hbm_bandwidth_gbps's docstring: the Mosaic
    auto-pipeliner serializes a pure copy's in/out streams (~316 GB/s);
    here ``nslots`` chunks are kept in flight with reads and writes
    overlapping through per-slot semaphores, the pattern the reference
    builds in cuda's smem double-buffering (``MMult_cuda_8.cu:23-60``)
    applied to a bare copy."""
    total_rows = mbytes * 1024 * 1024 // (4 * cols)
    total_rows = max((total_rows // (rows * nslots)) * rows * nslots,
                     rows * nslots)
    nchunks = total_rows // rows
    assert nchunks % nslots == 0, (nchunks, nslots)
    x = jnp.ones((total_rows, cols), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _manual_copy_kernel(rows, cols, nchunks, nslots, reps),
            out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[pltpu.VMEM((nslots, rows, cols), jnp.float32),
                            pltpu.SemaphoreType.DMA((nslots,)),
                            pltpu.SemaphoreType.DMA((nslots,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=default_interpret(interpret),
        )(x)

    # flush via the small scalar output (cheap readback; same dispatch)
    best = measure(lambda: run(x)[1], repeats=repeats, warmup=1)
    return 2.0 * x.size * 4 * reps / best / 1e9


# Published single-chip ceilings for TPU v5e (plot fallback when probes
# can't run, e.g. in docs builds): bf16 197 TFLOPS, int8 394 TOPS,
# HBM ~819 GB/s.
V5E_PEAKS = {
    "bf16_gflops": 197_000.0,
    "int8_gflops": 394_000.0,
    "fp32_gflops": 197_000.0 / 6.0,   # HIGHEST = 6-pass bf16
    "hbm_gbps": 819.0,
}


def main():
    for name, fn in [
        ("MXU bf16 peak", lambda: mxu_peak_gflops(jnp.bfloat16)),
        ("MXU int8 peak", lambda: mxu_peak_gflops(jnp.int8)),
        ("MXU int8 throughput", mxu_throughput_gflops),
        ("MXU fp32 (HIGHEST, 6-pass)", lambda: mxu_peak_gflops(jnp.float32)),
        ("VPU fma dependent (func1)",
         lambda: vpu_peak_gflops(dependent=True)),
        ("VPU fma independent (func2)",
         lambda: vpu_peak_gflops(dependent=False)),
        ("VPU exp throughput", vpu_exp_gelems),
        ("HBM r+w bandwidth (pallas)", hbm_bandwidth_gbps),
        ("HBM r+w bandwidth (XLA)", xla_stream_bandwidth_gbps),
        ("HBM r+w bandwidth (manual DMA)", hbm_copy_manual_gbps),
        ("DMA chunk bandwidth 1024x2048",
         lambda: dma_chunk_bandwidth_gbps(1024, 2048)),
        ("DMA chunk bandwidth 2048x1024",
         lambda: dma_chunk_bandwidth_gbps(2048, 1024)),
        ("VMEM r+w bandwidth (VPU copy)", vmem_bandwidth_gbps),
        ("DMA issue+complete latency", dma_latency_ns),
        ("MXU bf16 @ depth 64", lambda: mxu_depth_gflops(64)),
        ("MXU bf16 @ depth 128", lambda: mxu_depth_gflops(128)),
        ("MXU bf16 @ depth 512", lambda: mxu_depth_gflops(512)),
    ]:
        unit = ("ns" if "latency" in name
                else "GB/s" if "bandwidth" in name
                else "Gelem/s" if "exp" in name else "GFLOPS")
        print(f"{name:32s} {fn():12.1f} {unit}")


if __name__ == "__main__":
    main()
