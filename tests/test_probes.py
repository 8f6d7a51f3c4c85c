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


def test_vpu_probe_interpret():
    g = probes.vpu_peak_gflops(size=128, n_iters=4, repeats=1,
                               dependent=True, interpret=True)
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
