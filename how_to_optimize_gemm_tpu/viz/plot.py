"""GFLOPS-vs-size plotting — L5 of the reference.

Equivalent of ``aarch64/plot.py:27-35`` (old-vs-new matplotlib lines) and
``armv7/PlotAll.m:14-16`` (horizontal peak-GFLOPS roofline from
proc_parameters.m). Reads the same Octave-style ``.m`` files the harness
writes; the roofline ceilings come from the measured probe kernels
(ops/probes.py) or the published v5e numbers.

CLI (matches the reference's two styles):

    python -m how_to_optimize_gemm_tpu.viz.plot outputs/output_old.m \
        outputs/output_new.m --save figures/compare.png
"""
from __future__ import annotations

import argparse
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from how_to_optimize_gemm_tpu.harness import mfile  # noqa: E402
from how_to_optimize_gemm_tpu.ops.probes import V5E_PEAKS  # noqa: E402


def plot_mfiles(paths, save=None, roofline: str | None = None,
                title: str | None = None):
    """Plot one GFLOPS curve per .m file; optional MXU-peak roofline.

    roofline: one of 'bf16', 'int8', 'fp32' (published v5e ceilings) or a
    float string (measured probe value).
    """
    fig, ax = plt.subplots(figsize=(9, 5.5))
    for path in paths:
        version, rows = mfile.read_mfile(path)
        if not rows:
            continue
        ax.plot([r[0] for r in rows], [r[1] for r in rows],
                marker="o", markersize=3.5, linewidth=1.6, label=version)
    if roofline:
        try:
            peak = float(roofline)
            label = f"peak {peak:.0f} GFLOPS"
        except ValueError:
            peak = V5E_PEAKS[f"{roofline}_gflops"]
            label = f"v5e {roofline} MXU peak"
        ax.axhline(peak, color="0.35", linestyle="--", linewidth=1.2)
        ax.annotate(label, xy=(0.99, peak), xycoords=("axes fraction",
                                                      "data"),
                    ha="right", va="bottom", fontsize=9, color="0.35")
    ax.set_xlabel("m = n = k")
    ax.set_ylabel("GFLOPS")
    if title:
        ax.set_title(title)
    ax.grid(True, linewidth=0.4, alpha=0.5)
    ax.legend(loc="best", fontsize=9)
    fig.tight_layout()
    if save:
        pathlib.Path(save).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save, dpi=140)
        print(f"wrote {save}")
    return fig, ax


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mfiles", nargs="+",
                    help=".m result files (e.g. output_old.m output_new.m)")
    ap.add_argument("--save", default="figures/compare.png")
    ap.add_argument("--roofline", default=None,
                    help="'bf16'|'int8'|'fp32' or a GFLOPS value")
    ap.add_argument("--title", default=None)
    args = ap.parse_args(argv)
    plot_mfiles(args.mfiles, save=args.save, roofline=args.roofline,
                title=args.title)


if __name__ == "__main__":
    main()
