"""Block-config autotuner: candidates, cache, tuning loop, driver hook.

The reference tunes blocking by hand-editing parameters.h / GEMM_M/N/K
defines and re-running (aarch64/MMult_4x4_14.cpp:24-55 keeps the
derivation as comments); harness/autotune.py is that loop as a tool.
These tests cover the CPU-testable machinery — candidate alignment and
budgets, the JSON cache, the measure-and-pick loop (fake timer), and
the driver's --tuned hook; chip numbers come from running the CLI on
real hardware.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.harness import autotune
from how_to_optimize_gemm_tpu.harness.parameters import SweepConfig


def test_candidates_aligned_deduped_and_budgeted():
    name = "14_packed_alias_int8"
    spec = autotune._specs()[name]
    cands = autotune.candidates(name, 4096, 4096, 4096)
    default = tuple(spec.chooser(4096, 4096, 4096))
    assert cands[0] == default          # the chooser's pick leads
    assert len(cands) <= 12
    assert len(set(cands)) == len(cands)
    budget = spec.budget_mb * 1024 * 1024
    for bm, bn, bk in cands:
        assert bm % 128 == 0 and bn % 128 == 0 and bk % 512 == 0
        assert autotune.footprint_bytes(bm, bn, bk, spec.ea,
                                        spec.eb) <= budget


def test_candidates_every_tunable_rung_has_a_space():
    for name in autotune.tunable():
        cands = autotune.candidates(name, 2048, 2048, 2048)
        assert len(cands) >= 2, name


def test_candidates_w4a8_bk_divides_packed_k():
    """The nibble layout can't be re-padded in-kernel: candidate bks
    must divide the 512-aligned K (the K=3584 least-waste lesson)."""
    cands = autotune.candidates("07b_pallas_w4a8", 512, 5632, 3584)
    for _, _, bk in cands:
        assert 3584 % bk == 0, bk


def test_cache_roundtrip(tmp_path):
    path = tmp_path / "autotune.json"
    assert autotune.cached("06_pallas_int8", 1024, 1024, 1024,
                           path) is None
    autotune.save_cached("06_pallas_int8", 1024, 1024, 1024,
                         (256, 512, 1024), 123.4, path)
    assert autotune.cached("06_pallas_int8", 1024, 1024, 1024,
                           path) == (256, 512, 1024)
    # a different shape misses
    assert autotune.cached("06_pallas_int8", 2048, 1024, 1024,
                           path) is None
    # the backend is part of the key: committed chip tunings must never
    # leak into CPU-interpret runs
    [key] = json.loads(path.read_text())
    assert key.endswith(f"|{jax.default_backend()}")


def test_tune_times_gates_and_picks_best(tmp_path, monkeypatch):
    """The loop: every candidate is gated on device, timed with the
    chained policy, failures recorded (not raised), the fastest
    passing config cached."""
    path = tmp_path / "autotune.json"
    fake = {(32, 128, 512): 2e-3, (64, 128, 512): 1e-3}

    def fake_time(run, prepared, c, **kw):
        return fake[(run.keywords["bm"], run.keywords["bn"],
                     run.keywords["bk"])]

    monkeypatch.setattr(autotune, "time_chained", fake_time)
    rows = autotune.tune(
        "06_pallas_int8", 64, 128, 512,
        candidate_list=[(32, 128, 512), (64, 128, 512),
                        (48, 128, 512)],    # 48 % 32 != 0 -> fails
        verbose=False, cache_path=path)
    by_cfg = {(r.bm, r.bn, r.bk): r for r in rows}
    assert by_cfg[(32, 128, 512)].error is None
    assert by_cfg[(64, 128, 512)].error is None
    # the bad candidate is RECORDED, not raised (the reference commits
    # failing runs too)
    assert by_cfg[(48, 128, 512)].error is not None
    # both good candidates really ran the kernel and passed the gate
    assert all(r.kernel_rel < 1e-4 for r in rows if r.error is None)
    # fastest fake time wins the cache
    assert autotune.cached("06_pallas_int8", 64, 128, 512,
                           path) == (64, 128, 512)


def test_driver_tuned_sweep_uses_cache(monkeypatch):
    """--tuned passes cached blocks through to the kernel; the row
    still gates against the oracle (a tuned config can't skip
    correctness)."""
    from how_to_optimize_gemm_tpu.harness import driver

    calls = []
    real_cached = autotune.cached

    def spy_cached(name, m, n, k, path=None):
        calls.append((name, m, n, k))
        return (32, 128, 512)

    monkeypatch.setattr(autotune, "cached", spy_cached)
    cfg = SweepConfig(pfirst=128, plast=128, pinc=128, nrepeats=1,
                      warmup=0, k=512)
    rows = driver.run_sweep("06_pallas_int8", cfg, verbose=False,
                            tuned=True)
    assert calls == [("06_pallas_int8", 128, 128, 512)]
    assert rows[0].gflops > 0 and rows[0].kernel_rel < 1e-4
    # and with no cache entry the sweep is unchanged (default chooser)
    monkeypatch.setattr(autotune, "cached",
                        lambda *a, **k2: None)
    rows2 = driver.run_sweep("06_pallas_int8", cfg, verbose=False,
                             tuned=True)
    assert rows2[0].kernel_rel < 1e-4
    del real_cached
