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
    """jax.profiler capture; open the result with xprof/tensorboard, or
    parse it into a per-op table with ``parse_trace``/``trace_report``."""
    path = pathlib.Path(logdir) / label
    path.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(path))
    try:
        yield str(path)
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class OpStat:
    """Aggregated measured stats for one device op across a capture."""
    name: str
    category: str
    count: int = 0
    device_us: float = 0.0        # summed device_duration_ps
    bytes_accessed: int = 0       # summed
    model_flops: int = 0          # summed (0 for custom calls)

    @property
    def gflops(self) -> float:
        return (self.model_flops / (self.device_us * 1e-6) / 1e9
                if self.device_us else 0.0)

    @property
    def gbps(self) -> float:
        return (self.bytes_accessed / (self.device_us * 1e-6) / 1e9
                if self.device_us else 0.0)


def _trace_files(logdir) -> list[pathlib.Path]:
    return sorted(pathlib.Path(logdir).glob(
        "**/plugins/profile/*/*.trace.json.gz"))


def parse_trace(logdir) -> list[OpStat]:
    """Parse the NEWEST jax.profiler capture under ``logdir`` into
    per-op aggregated device stats — the measured analogue of the
    reference's per-PMU-group mperf TMA run
    (``aarch64/test_MMult.cpp:64-124``). Events come from the trace's
    ``/device:TPU`` process ("XLA Ops" thread), each carrying
    device_duration_ps / bytes_accessed / model_flops."""
    import gzip
    import json

    files = _trace_files(logdir)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "device:" in e.get("args", {}).get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"}
    stats: dict[str, OpStat] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue   # skip module-level rollups; keep per-op rows
        args = e.get("args", {})
        name = e.get("name", "?")
        st = stats.setdefault(name, OpStat(
            name=name, category=args.get("hlo_category", "?")))
        st.count += 1
        st.device_us += float(args.get("device_duration_ps", 0)) * 1e-6
        st.bytes_accessed += int(args.get("bytes_accessed", 0) or 0)
        st.model_flops += int(args.get("model_flops", 0) or 0)
    return sorted(stats.values(), key=lambda s: -s.device_us)


def trace_table(ops: list[OpStat], peaks=None, compute_dtype="int8",
                total_note: str = "") -> str:
    """Render parsed ops as a measured top-down table: per-op device
    time, share of capture, achieved GFLOPS vs the MXU ceiling and
    achieved GB/s vs the HBM ceiling — which bound each op actually hit,
    from measurement rather than an analytic model."""
    peaks = peaks or DEFAULT_PEAKS
    mxu_gflops, hbm_gbps = peaks[compute_dtype]
    total_us = sum(o.device_us for o in ops) or 1.0
    lines = [f"measured per-op device profile{total_note} "
             f"(ceilings: {mxu_gflops:.0f} GFLOPS {compute_dtype} MXU, "
             f"{hbm_gbps:.0f} GB/s HBM)",
             f"{'op':<44} {'n':>4} {'dev ms':>8} {'%':>6} "
             f"{'GFLOPS':>9} {'%MXU':>6} {'GB/s':>7} {'%HBM':>6}"]
    for o in ops:
        lines.append(
            f"{o.name[:44]:<44} {o.count:>4} {o.device_us / 1e3:>8.3f} "
            f"{100 * o.device_us / total_us:>5.1f}% "
            f"{o.gflops:>9.0f} {100 * o.gflops / mxu_gflops:>5.1f}% "
            f"{o.gbps:>7.0f} {100 * o.gbps / hbm_gbps:>5.1f}%")
    return "\n".join(lines)


def trace_rung(rung_name: str, p: int, logdir="profiles",
               reps: int = 4) -> tuple[list[OpStat], str]:
    """Capture a measured per-op profile of one rung at size p: prepare
    operands, warm up (compile outside the capture), trace ``reps``
    launches, parse. Returns (ops, capture_path)."""
    from how_to_optimize_gemm_tpu.utils.matrices import make_abc

    rung = registry.get(rung_name)
    a, b, c = make_abc(jax.random.PRNGKey(0), p, p, p)
    prepared = jax.block_until_ready(rung.prepare(a, b))
    out = jax.block_until_ready(rung.run(*prepared, c))   # compile/warm
    with trace(logdir, label=f"{rung_name}_p{p}") as path:
        for _ in range(reps):
            out = rung.run(*prepared, c)
        jax.block_until_ready(out)
    return parse_trace(path), path


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
    ba = rung.bytes_a if rung.bytes_a is not None else rung.bytes_per_input_elt
    bb = rung.bytes_b if rung.bytes_b is not None else rung.bytes_per_input_elt
    in_bytes = m * k * ba + k * n * bb
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
