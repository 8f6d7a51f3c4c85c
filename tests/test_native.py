"""Native C++ utilities vs their numpy/python equivalents."""
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def test_native_dclock_monotonic():
    from how_to_optimize_gemm_tpu.utils.native import native_dclock
    t0 = native_dclock()
    t1 = native_dclock()
    assert t1 >= t0
    assert t0 > 0


def test_native_compare_matches_numpy():
    from how_to_optimize_gemm_tpu.utils.native import native_compare
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(37, 53))
    out = ref.astype(np.float32)
    out[5, 7] += 3.0
    denom = float(np.max(np.abs(ref)))
    max_abs, first = native_compare(out, ref, denom, rel_gate=0.1)
    assert first == (5, 7)
    assert abs(max_abs - 3.0) < 1e-4


def test_native_compare_clean():
    from how_to_optimize_gemm_tpu.utils.native import native_compare
    ref = np.ones((8, 8))
    max_abs, first = native_compare(ref.astype(np.float32), ref, 1.0, 1e-6)
    assert first is None and max_abs < 1e-7


def test_native_fill_uniform():
    from how_to_optimize_gemm_tpu.utils.native import native_fill
    x = native_fill(10000, seed=42)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert abs(float(x.mean())) < 0.05      # roughly centered
    assert float(x.std()) > 0.4             # actually random
    y = native_fill(10000, seed=42)
    np.testing.assert_array_equal(x, y)     # deterministic per seed
    z = native_fill(4, constant=1.0)
    np.testing.assert_array_equal(z, np.ones(4, np.float32))


def test_native_mfile_roundtrip(tmp_path):
    from how_to_optimize_gemm_tpu.utils.native import (
        native_read_mfile, native_write_mfile)
    rows = [(48, 10.22, 0.0), (96, 123.456, 1e-07)]
    p = tmp_path / "out.m"
    native_write_mfile(p, "rung_x", rows)
    text = p.read_text()
    assert text.startswith("version = 'rung_x';")  # reference L4 format
    assert text.rstrip().endswith("];")
    back = native_read_mfile(p)
    assert back == rows


def test_native_mfile_reads_python_written(tmp_path):
    # cross-compatibility: the native parser reads the Python writer's
    # files and vice versa (one on-disk format, two tiers)
    from how_to_optimize_gemm_tpu.harness import mfile
    from how_to_optimize_gemm_tpu.utils.native import native_read_mfile
    rows = [(128, 1.5, 2e-08)]
    p = tmp_path / "py.m"
    mfile.write_mfile(p, "rung_y", rows)
    assert native_read_mfile(p) == rows
    assert mfile.read_mfile(p)[1] == rows
