"""Plot layer: renders without error and writes a png."""
from how_to_optimize_gemm_tpu.harness import mfile
from how_to_optimize_gemm_tpu.viz.plot import plot_mfiles


def test_plot_old_new(tmp_path):
    old = tmp_path / "output_old.m"
    new = tmp_path / "output_new.m"
    mfile.write_mfile(old, "old_rung", [(128, 100.0, 0), (256, 200.0, 0)])
    mfile.write_mfile(new, "new_rung", [(128, 150.0, 0), (256, 350.0, 0)])
    out = tmp_path / "fig.png"
    plot_mfiles([old, new], save=out, roofline="bf16")
    assert out.exists() and out.stat().st_size > 0
