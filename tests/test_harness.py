"""Harness layer: .m format roundtrip, comparator, sweep driver e2e."""
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.harness import mfile, oracle
from how_to_optimize_gemm_tpu.harness.driver import run_sweep
from how_to_optimize_gemm_tpu.harness.parameters import SweepConfig


def test_mfile_roundtrip(tmp_path):
    rows = [(48, 10.223972, 0.0), (96, 20.5, 1e-7)]
    path = tmp_path / "output_test.m"
    mfile.write_mfile(path, "MMult_test", rows)
    version, parsed = mfile.read_mfile(path)
    assert version == "MMult_test"
    assert parsed[0][0] == 48
    # %e prints 6 significant digits (the reference's format)
    np.testing.assert_allclose([r[1] for r in parsed],
                               [r[1] for r in rows], rtol=1e-5)


def test_mfile_format_is_octave_compatible(tmp_path):
    """Byte-level format parity with the reference's committed outputs:
    `version = '<name>';` header then `MY_MMult = [` rows `];`
    (aarch64/output_MMult_4x4_18.m)."""
    path = tmp_path / "o.m"
    mfile.write_mfile(path, "rung", [(48, 1.0, 0.0)])
    text = path.read_text()
    assert text.startswith("version = 'rung';\nMY_MMult = [\n")
    assert text.endswith("];\n")


def test_comparator_finds_first_offender():
    ref = np.zeros((4, 4))
    ref[0, 0] = 1.0  # denom
    out = ref.copy()
    out[1, 2] = 7.0
    res = oracle.compare_matrices(out, ref, rel_gate=0.5)
    assert res.first_bad == (1, 2)
    assert res.max_abs == 7.0


def test_comparator_passes_identical():
    ref = np.ones((4, 4))
    res = oracle.compare_matrices(ref.copy(), ref, rel_gate=1e-12)
    assert res.max_rel == 0.0 and res.first_bad is None


def test_run_sweep_end_to_end(tmp_path):
    cfg = SweepConfig(pfirst=128, plast=256, pinc=128, nrepeats=2, warmup=1)
    rows = run_sweep("01_xla_fp32", cfg, output_dir=tmp_path,
                     verbose=False)
    assert [r.p for r in rows] == [128, 256]
    assert all(r.gflops > 0 for r in rows)
    assert all(r.kernel_rel < 1e-4 for r in rows)
    version, parsed = mfile.read_mfile(tmp_path / "output_01_xla_fp32.m")
    assert version == "01_xla_fp32"
    assert len(parsed) == 2


def test_diff_gate_trips():
    """A broken rung must hard-fail, like the reference's exit(-1)."""
    from how_to_optimize_gemm_tpu.ops import registry
    bad = registry.Rung(
        name="bad", dtype="fp32",
        run=lambda a, b, c, **kw: a @ b,            # forgets + C
        prepare=lambda a, b: (a, b),
        effective=lambda ops: ops,
        gate_rel=1e-6, doc="deliberately wrong")
    registry.LADDER["zz_bad"] = bad
    try:
        cfg = SweepConfig(pfirst=128, plast=128, pinc=128, nrepeats=1)
        with pytest.raises(oracle.DiffGateError):
            run_sweep("zz_bad", cfg, verbose=False)
    finally:
        del registry.LADDER["zz_bad"]


def test_sweep_config_pinning():
    cfg = SweepConfig(pfirst=100, plast=300, pinc=100, k=64)
    assert cfg.sizes() == [(100, 100, 64), (200, 200, 64), (300, 300, 64)]


def test_run_sweep_verify_flag():
    """verify=False skips the oracle (bench.py's gate-once pattern)."""
    from how_to_optimize_gemm_tpu.harness.driver import run_sweep
    from how_to_optimize_gemm_tpu.harness.parameters import SweepConfig

    cfg = SweepConfig(pfirst=64, plast=64, pinc=1, nrepeats=2, warmup=0)
    rows = run_sweep("01_xla_fp32", cfg, verbose=False, verify=False)
    assert rows[0].kernel_rel == 0.0 and rows[0].gflops > 0


def test_run_sweep_device_verify():
    """verify='device' cross-checks on device (bench.py's timed-size
    gate): a correct rung passes, a broken one trips the gate."""
    from how_to_optimize_gemm_tpu.ops import registry

    cfg = SweepConfig(pfirst=128, plast=128, pinc=1, nrepeats=1,
                      warmup=0)
    rows = run_sweep("01_xla_fp32", cfg, verbose=False, verify="device")
    assert rows[0].kernel_rel < 1e-5

    bad = registry.Rung(
        name="zz_bad_dev", dtype="fp32",
        run=lambda a, b, c, **kw: a @ b,            # forgets + C
        prepare=lambda a, b: (a, b),
        effective=lambda ops: (ops[0].astype("float32"),
                               ops[1].astype("float32")),
        gate_rel=1e-6, doc="deliberately wrong")
    registry.LADDER["zz_bad_dev"] = bad
    try:
        with pytest.raises(oracle.DiffGateError):
            run_sweep("zz_bad_dev", cfg, verbose=False, verify="device")
    finally:
        del registry.LADDER["zz_bad_dev"]
