"""Hardware-probe kernels compile and produce sane values in interpret
mode (the no-TPU analogue; real ceilings only mean something on a chip).

Reference analogue of what is being tested: the gflops_benchmark and
vulkan/benchmark suites (SURVEY.md §2.1 #19, §2.4) — here we only check
the probes are well-formed, mirroring how the reference's probes at least
had to build and run on any board.
"""
import jax.numpy as jnp
import pytest

from how_to_optimize_gemm_tpu.ops import probes


def test_mxu_probe_interpret():
    g = probes.mxu_peak_gflops(jnp.bfloat16, size=128, n_iters=4,
                               repeats=1, interpret=True)
    assert g > 0


def test_mxu_depth_probe_interpret():
    g = probes.mxu_depth_gflops(depth=64, size=128, n_iters=4,
                                repeats=1, interpret=True)
    assert g > 0


def test_vpu_probe_interpret():
    g = probes.vpu_peak_gflops(size=128, n_iters=4, repeats=1,
                               dependent=True, interpret=True)
    assert g > 0


def test_vpu_exp_probe_interpret():
    g = probes.vpu_exp_gelems(size=128, n_iters=4, repeats=1,
                              interpret=True)
    assert g > 0


def test_hbm_probe_interpret():
    g = probes.hbm_bandwidth_gbps(mbytes=4, chain=2, repeats=1,
                                  interpret=True)
    assert g > 0


@pytest.mark.parametrize("rows,cols", [(256, 512), (512, 256)])
def test_dma_chunk_probe_interpret(rows, cols):
    g = probes.dma_chunk_bandwidth_gbps(rows, cols, parent=1024, reps=1,
                                        interpret=True)
    assert g > 0


def test_vmem_probe_interpret():
    g = probes.vmem_bandwidth_gbps(mbytes=1, n_iters=2, repeats=1,
                                   interpret=True)
    assert g > 0


def test_dma_chunk_probe_rejects_odd_walks():
    with pytest.raises(ValueError, match="even count"):
        probes.dma_chunk_bandwidth_gbps(1024, 1024, parent=1024,
                                        interpret=True)


def test_dma_latency_probe_interpret():
    ns = probes.dma_latency_ns(n_iters=64, repeats=1, interpret=True)
    assert ns >= 0.0


def test_manual_copy_probe_interpret_and_correct():
    """The multi-buffered copy must actually copy: run the kernel once
    and compare dst to src (a wrong slot/semaphore pairing would corrupt
    chunks silently while still posting a bandwidth number)."""
    import jax
    from how_to_optimize_gemm_tpu.ops.probes import _manual_copy_kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols, nslots = 8, 128, 4
    nchunks = 8
    x = (jnp.arange(rows * nchunks * cols, dtype=jnp.float32)
         .reshape(rows * nchunks, cols))
    out, _ = pl.pallas_call(
        _manual_copy_kernel(rows, cols, nchunks, nslots, reps=1),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((nslots, rows, cols), jnp.float32),
                        pltpu.SemaphoreType.DMA((nslots,)),
                        pltpu.SemaphoreType.DMA((nslots,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=True,
    )(x)
    assert jnp.array_equal(out, x)

    g = probes.hbm_copy_manual_gbps(mbytes=1, rows=32, cols=256, reps=1,
                                    repeats=1, interpret=True)
    assert g > 0
