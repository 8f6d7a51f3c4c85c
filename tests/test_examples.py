"""The examples/ scripts run end-to-end on the hermetic CPU mesh."""
import subprocess
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(args):
    return subprocess.run(
        [sys.executable, *args], cwd=ROOT, capture_output=True, text=True,
        timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HTOG_NO_COMPILE_CACHE": "1",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "HOME": "/root"})


def test_quantize_example(tmp_path):
    r = _run(["examples/quantize.py", "--kind", "int8",
              "--out", str(tmp_path / "ck")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote" in r.stdout


def test_train_example():
    r = _run(["examples/train.py", "--dp", "2", "--tp", "2",
              "--steps", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "losses:" in r.stdout


def test_parallel_axes_example():
    r = _run(["examples/parallel_axes.py"])
    assert r.returncode == 0, r.stderr[-2000:]
    for marker in ("train loss:", "pp=8", "ep=8", "ring attention"):
        assert marker in r.stdout, (marker, r.stdout)


def test_moe_finetune_example():
    r = _run(["examples/moe_finetune.py", "--steps", "4", "--ragged"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frozen=True" in r.stdout and "router moved=True" in r.stdout
