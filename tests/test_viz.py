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


def test_transitions_generate(tmp_path):
    """One figure per consecutive ladder pair present in outputs/, plus
    the headline chart (the aarch64/figures compare_*.png analogue)."""
    from how_to_optimize_gemm_tpu.viz.transitions import (
        LADDER_ORDER, generate)

    outd = tmp_path / "outputs"
    outd.mkdir()
    # three consecutive rungs present -> two transition figures
    for name, _ in LADDER_ORDER[:3]:
        mfile.write_mfile(outd / f"output_{name}.m", name,
                          [(128, 10.0, 0), (256, 20.0, 0)])
    # one headline member present -> headline chart renders too
    mfile.write_mfile(outd / "output_06v_xla_int8.m", "06v_xla_int8",
                      [(128, 30.0, 0)])
    written = generate(outputs=outd, save_dir=tmp_path / "figs")
    names = [w.rsplit("/", 1)[-1] for w in written]
    assert names == [
        "compare_00_naive_vpu_01_xla_fp32.png",
        "compare_01_xla_fp32_01b_xla_bf16.png",
        "ladder_int8_family.png",
    ]
