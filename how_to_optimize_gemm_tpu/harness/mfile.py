"""Octave-style ``.m`` result files — the reference's L4 data layer.

Format (``aarch64/makefile:41-44`` + committed ``output_*.m`` files):

    version = 'MMult_4x4_18';
    MY_MMult = [
    48 10.223972e+00 0.000000e+00
    ...
    ];

We keep the format byte-compatible (it is the repo's signature UX,
SURVEY.md §7) and also keep the old/new A-B snapshot convention: the
plotting layer compares ``output_old.m`` vs ``output_new.m``.
"""
from __future__ import annotations

import pathlib


def write_mfile(path, version: str,
                rows: list[tuple[int, float, float]]) -> None:
    """rows: (size p, gflops, diff). Uses the native (C++) writer when
    the csrc/ library is available — the L4 data layer's native tier —
    with a pure-Python fallback."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        from how_to_optimize_gemm_tpu.utils.native import native_write_mfile
        native_write_mfile(path, version, rows)
        return
    except Exception:
        pass
    lines = [f"version = '{version}';", "MY_MMult = ["]
    for p, gflops, diff in rows:
        lines.append(f"{p} {gflops:e} {diff:e}")
    lines.append("];")
    path.write_text("\n".join(lines) + "\n")


def read_mfile(path) -> tuple[str, list[tuple[int, float, float]]]:
    """Parse a ``.m`` file (same tolerance for junk rows as
    ``aarch64/plot.py:4-25``, which skips header lines and blank rows)."""
    version = pathlib.Path(path).stem
    rows: list[tuple[int, float, float]] = []
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith(("version", "MY_MMult", "];", "%")):
            if line.startswith("version"):
                try:
                    version = line.split("'")[1]
                except IndexError:
                    pass
            continue
        parts = line.split()
        if len(parts) >= 3:
            try:
                rows.append((int(parts[0]), float(parts[1]),
                             float(parts[2])))
            except ValueError:
                continue
    return version, rows
