"""Roofline attribution (mperf-TMA analogue)."""
from how_to_optimize_gemm_tpu.harness.driver import SweepRow
from how_to_optimize_gemm_tpu.harness.profiling import (
    roofline, roofline_report)


def test_big_square_bf16_is_compute_bound():
    pt = roofline("05_pallas_bf16", 4096, 4096, 4096, 160_000.0)
    assert pt.bound == "compute"
    assert 0.5 < pt.fraction_of_ceiling < 1.1


def test_skinny_decode_gemm_is_memory_bound():
    # M=8 (decode batch), weights 4096x4096 int8: classic bandwidth-bound
    pt = roofline("06_pallas_int8", 8, 4096, 4096, 1000.0)
    assert pt.bound == "memory"
    assert pt.memory_ceiling_gflops < pt.compute_ceiling_gflops


def test_report_formats():
    rows = [SweepRow(p=1024, m=1024, n=1024, k=1024, gflops=50_000.0,
                     best_s=1e-3, kernel_rel=1e-7, quant_rel=1e-7)]
    text = roofline_report(rows, "05_pallas_bf16")
    assert "bound" in text and "1024" in text
