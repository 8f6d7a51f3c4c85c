"""Roofline attribution + measured trace parsing (mperf-TMA analogue)."""
import gzip
import json

from how_to_optimize_gemm_tpu.harness.driver import SweepRow
from how_to_optimize_gemm_tpu.harness.profiling import (
    parse_trace, roofline, roofline_report, trace, trace_table)


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


def test_trace_produces_readable_artifact(tmp_path):
    """trace() must emit a trace.json.gz that parse_trace can open —
    the capture path of the measured-TMA slot."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((64, 64), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    f(x).block_until_ready()
    with trace(tmp_path, label="t") as path:
        f(x).block_until_ready()
    ops = parse_trace(path)          # CPU captures have no TPU process;
    assert isinstance(ops, list)     # an empty op list is valid here
    text = trace_table(ops, compute_dtype="fp32")
    assert "ceilings" in text


def test_parse_trace_aggregates_device_ops(tmp_path):
    """Golden-trace fixture: aggregation over repeated ops, derived
    GFLOPS/GB/s, and the occupancy table rendering."""
    def op(name, dur_ps, bytes_, flops, cat):
        return {"ph": "X", "pid": 3, "tid": 3, "ts": 0.0,
                "dur": dur_ps / 1e6, "name": name,
                "args": {"device_duration_ps": str(dur_ps),
                         "bytes_accessed": str(bytes_),
                         "model_flops": str(flops),
                         "hlo_category": cat}}
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        # module rollup must be EXCLUDED (would double-count)
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0.0, "dur": 10.0,
         "name": "jit_module", "args": {"device_duration_ps": "10000000"}},
        op("fusion", 2_000_000, 1 << 20, 2 * 10 ** 9, "convolution fusion"),
        op("fusion", 2_000_000, 1 << 20, 2 * 10 ** 9, "convolution fusion"),
        op("copy-start", 500_000, 1 << 20, 0, "copy-start"),
        # host process events must be ignored
        {"ph": "X", "pid": 701, "tid": 1, "ts": 0.0, "dur": 5.0,
         "name": "host_thing", "args": {}},
    ]
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    ops = parse_trace(tmp_path)
    by_name = {o.name: o for o in ops}
    assert set(by_name) == {"fusion", "copy-start"}
    fu = by_name["fusion"]
    assert fu.count == 2 and fu.device_us == 4.0
    assert fu.model_flops == 4 * 10 ** 9
    # 4e9 flops in 4 us = 1e6 GFLOPS
    assert abs(fu.gflops - 1e6) < 1.0
    # 2 MiB in 4 us
    assert abs(fu.gbps - (2 << 20) / 4e-6 / 1e9) < 1.0
    text = trace_table(ops, compute_dtype="int8")
    assert "fusion" in text and "copy-start" in text and "%MXU" in text
