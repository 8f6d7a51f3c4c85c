"""Profiling + roofline accounting — the mperf/TMA capability slot.

The reference wires mperf's top-down microarchitecture analysis into its
harness behind ``-DMPERF_ENABLE`` (``aarch64/test_MMult.cpp:64-124``,
CMakeLists.txt:8-14): per-PMU-group re-runs that attribute cycles to
frontend/backend/retiring buckets. The TPU-native equivalents:

- ``trace(...)``: jax.profiler capture around a rung run — the xprof
  trace is the TPU's TMA (per-op MXU/VPU/DMA timing, HLO attribution).
  View with tensorboard or xprof.
- ``roofline_report(...)``: analytical top-down attribution from measured
  ceilings: for each sweep row, compute the compute-bound time
  (flops/MXU-peak) and memory-bound time (bytes/HBM-bw) and report which
  bound dominates and the fraction of that ceiling achieved — the
  "Backend_Bound.{Core,Memory}" split of TMA, at kernel granularity.
"""
from __future__ import annotations

import contextlib
import dataclasses
import pathlib

import jax

from how_to_optimize_gemm_tpu.ops import registry


@contextlib.contextmanager
def trace(logdir="profiles", label: str = "rung"):
    """jax.profiler capture; open the result with xprof/tensorboard."""
    path = pathlib.Path(logdir) / label
    path.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(path))
    try:
        yield str(path)
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class RooflinePoint:
    rung: str
    m: int
    n: int
    k: int
    achieved_gflops: float
    compute_ceiling_gflops: float
    memory_ceiling_gflops: float   # bw-limited GFLOPS for this shape
    bound: str                      # 'compute' | 'memory'
    fraction_of_ceiling: float


# Ceilings by COMPUTE dtype family: (MXU GFLOPS, effective HBM GB/s).
# Measured on v5e by ops/probes.py (mxu_throughput_gflops for int8; the
# in-GEMM bf16 rate; DMA chunk bandwidth); override via `peaks`.
DEFAULT_PEAKS = {
    "fp32": (31_500.0, 800.0),
    "bf16": (190_000.0, 800.0),
    "int8": (390_000.0, 800.0),
    "int4": (190_000.0, 800.0),   # W4A16 computes in bf16 after dequant
}


def roofline(rung_name: str, m: int, n: int, k: int,
             achieved_gflops: float, peaks=None) -> RooflinePoint:
    rung = registry.get(rung_name)
    peaks = peaks or DEFAULT_PEAKS
    mxu_gflops, hbm_gbps = peaks[rung.compute_dtype or rung.dtype]
    flops = 2.0 * m * n * k
    in_bytes = (m * k + k * n) * rung.bytes_per_input_elt
    io_bytes = in_bytes + 2 * m * n * 4          # C in + out, fp32
    t_compute = flops / (mxu_gflops * 1e9)
    t_memory = io_bytes / (hbm_gbps * 1e9)
    mem_ceiling = flops / t_memory / 1e9
    if t_compute >= t_memory:
        bound, ceiling = "compute", mxu_gflops
    else:
        bound, ceiling = "memory", mem_ceiling
    return RooflinePoint(
        rung=rung_name, m=m, n=n, k=k,
        achieved_gflops=achieved_gflops,
        compute_ceiling_gflops=mxu_gflops,
        memory_ceiling_gflops=mem_ceiling,
        bound=bound,
        fraction_of_ceiling=achieved_gflops / ceiling)


def roofline_report(rows, rung_name: str, peaks=None) -> str:
    """Format driver SweepRows as a top-down roofline table."""
    lines = [f"rung {rung_name}: top-down roofline "
             f"(ceilings: MXU peak / HBM-bandwidth-limited)",
             f"{'p':>6} {'achieved':>12} {'bound':>8} {'ceiling':>12} "
             f"{'% of ceiling':>12}"]
    for r in rows:
        pt = roofline(rung_name, r.m, r.n, r.k, r.gflops, peaks)
        ceiling = (pt.compute_ceiling_gflops if pt.bound == "compute"
                   else pt.memory_ceiling_gflops)
        lines.append(
            f"{r.p:>6} {r.gflops:>12.0f} {pt.bound:>8} {ceiling:>12.0f} "
            f"{100 * pt.fraction_of_ceiling:>11.1f}%")
    return "\n".join(lines)
