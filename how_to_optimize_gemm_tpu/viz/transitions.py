"""Per-transition comparison figures — the reference's signature UX.

The reference commits one ``compare_<old>_<new>.png`` per ladder step
(11 of them in ``aarch64/figures/``, each produced by the makefile's
old/new snapshot + plot.py flow) plus headline charts in ``images/``.
This tool regenerates the full visual record from the committed ``.m``
artifacts in one pass: every consecutive ladder pair gets a figure, and
a headline chart overlays the whole quantized family against the vendor
bar (the ``cublas-vs-MMult_cuda_12.jpg`` analogue, README.md:96-102).

    python -m how_to_optimize_gemm_tpu.viz.transitions \
        --outputs outputs --save-dir figures
"""
from __future__ import annotations

import argparse
import pathlib

from how_to_optimize_gemm_tpu.viz.plot import plot_mfiles

# Tutorial order (the ladder's pedagogical sequence, ops/registry.py);
# each consecutive pair is one "optimization step" figure. Per-family
# rooflines pick the ceiling the transition is judged against.
LADDER_ORDER = [
    ("00_naive_vpu", "fp32"),
    ("01_xla_fp32", "fp32"),
    ("01b_xla_bf16", "bf16"),
    ("02_pallas_mn_tile", "fp32"),
    ("03_pallas_k_blocked", "fp32"),
    ("03b_pallas_small_blocks", "fp32"),
    ("04_pallas_tuned_fp32", "fp32"),
    ("05_pallas_bf16", "bf16"),
    ("06v_xla_int8", "int8"),
    ("06_pallas_int8", "int8"),
    ("07_pallas_int4", "bf16"),     # W4A16 computes on the bf16 path
    ("07b_pallas_w4a8", "int8"),
    ("08_manual_dma_int8", "int8"),
    ("09_fat_tile_int8", "int8"),
    ("10_packed_fat_int8", "int8"),
    ("11_strip_resident_int8", "int8"),
    ("12_resident_int8", "int8"),
    ("13_tiled_resident_int8", "int8"),
    ("14_packed_alias_int8", "int8"),
    ("17_hand_pipeline_int8", "int8"),   # round-4 regression (kept)
    ("18_ragged_m_int8", "int8"),        # round-5 regression (kept)
    ("15_packed_alias_bf16", "bf16"),
    ("16_packed_alias_fp32", "fp32"),
]

HEADLINE = ["06v_xla_int8", "06_pallas_int8", "07b_pallas_w4a8",
            "11_strip_resident_int8", "14_packed_alias_int8"]


def generate(outputs="outputs", save_dir="figures") -> list[str]:
    out = pathlib.Path(outputs)
    save = pathlib.Path(save_dir)
    written: list[str] = []

    def mfile_of(name):
        p = out / f"output_{name}.m"
        return p if p.exists() else None

    for (old, _), (new, family) in zip(LADDER_ORDER, LADDER_ORDER[1:]):
        po, pn = mfile_of(old), mfile_of(new)
        if po is None or pn is None:
            continue
        dst = save / f"compare_{old}_{new}.png"
        plot_mfiles([po, pn], save=str(dst), roofline=family,
                    title=f"{old} → {new}")
        written.append(str(dst))

    headline = [mfile_of(n) for n in HEADLINE]
    headline = [p for p in headline if p is not None]
    if headline:
        dst = save / "ladder_int8_family.png"
        plot_mfiles(headline, save=str(dst), roofline="int8",
                    title="int8 ladder vs the XLA vendor bar")
        written.append(str(dst))

    bf16 = [mfile_of(n) for n in ("01b_xla_bf16", "05_pallas_bf16",
                                  "15_packed_alias_bf16")]
    bf16 = [p for p in bf16 if p is not None]
    if len(bf16) >= 2:
        dst = save / "ladder_bf16_family.png"
        plot_mfiles(bf16, save=str(dst), roofline="bf16",
                    title="bf16 ladder vs the XLA vendor bar")
        written.append(str(dst))

    fp32 = [mfile_of(n) for n in ("01_xla_fp32", "04_pallas_tuned_fp32",
                                  "16_packed_alias_fp32")]
    fp32 = [p for p in fp32 if p is not None]
    if len(fp32) >= 2:
        dst = save / "ladder_fp32_family.png"
        plot_mfiles(fp32, save=str(dst), roofline="fp32",
                    title="fp32 ladder vs the XLA vendor bar")
        written.append(str(dst))
    return written


def generate_small(outputs="outputs/small",
                   save_dir="figures") -> list[str]:
    """The small-size regime chart (the reference sweeps its whole
    ladder at 40..800, ``aarch64/parameters.h:5-7`` — the left half of
    the curves is where grid overhead and pipeline ramp live). One
    figure per dtype family over every rung with a committed small
    sweep, plus the headline cross-family chart."""
    out = pathlib.Path(outputs)
    save = pathlib.Path(save_dir)
    written: list[str] = []
    fam_members: dict[str, list[pathlib.Path]] = {}
    for name, family in LADDER_ORDER:
        p = out / f"output_{name}.m"
        if p.exists():
            fam_members.setdefault(family, []).append(p)
    for family, paths in fam_members.items():
        if len(paths) < 2:
            continue
        dst = save / f"ladder_small_{family}.png"
        plot_mfiles(paths, save=str(dst), roofline=family,
                    title=f"{family} ladder, small sizes (128..896)")
        written.append(str(dst))
    headline = [out / f"output_{n}.m" for n in HEADLINE]
    headline = [p for p in headline if p.exists()]
    if len(headline) >= 2:
        dst = save / "ladder_small_sizes.png"
        plot_mfiles(headline, save=str(dst), roofline="int8",
                    title="small-size regime: grid overhead & ramp")
        written.append(str(dst))
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outputs", default="outputs")
    ap.add_argument("--save-dir", default="figures")
    ap.add_argument("--small", action="store_true",
                    help="generate the small-size regime charts from "
                         "--outputs (default outputs/small)")
    args = ap.parse_args(argv)
    if args.small:
        src = ("outputs/small" if args.outputs == "outputs"
               else args.outputs)
        written = generate_small(src, args.save_dir)
    else:
        written = generate(args.outputs, args.save_dir)
    print(f"{len(written)} figures")


if __name__ == "__main__":
    main()
