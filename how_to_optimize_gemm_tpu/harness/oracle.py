"""Correctness oracle + comparator — L2 of the reference.

The reference gates every benchmarked size against a naive triple-loop (or
BLAS) reference and hard-exits on |diff| over the gate
(``aarch64/REF_MMult.cpp:18-28``, ``compare_matrices.cpp:5-31``). Here the
oracle is an fp64 numpy matmul (strictly stronger than the reference's fp32
naive loop — fp64 on host is this framework's "different vendor" oracle,
playing the role OpenBLAS plays for the cuda harness,
``cuda/REF_MMult.cpp:6-13``).

Two error figures per run (SURVEY.md §4 implication):
- kernel_rel: kernel output vs fp64 matmul of the *effective* (dequantized /
  downcast) operands — gates indexing/accumulation bugs tightly at every
  bit-width.
- quant_rel: kernel output vs fp64 matmul of the original fp32 operands —
  reported, not gated: it measures quantization loss, not kernel bugs.
"""
from __future__ import annotations

import dataclasses

import numpy as np


def ref_mmult(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """REF_MMult equivalent: fp64 C = A @ B + C on host."""
    return (np.asarray(a, np.float64) @ np.asarray(b, np.float64)
            + np.asarray(c, np.float64))


@dataclasses.dataclass(frozen=True)
class CompareResult:
    max_abs: float
    max_rel: float       # max_abs / max|ref|
    first_bad: tuple[int, int] | None  # first element over threshold


def compare_matrices(out: np.ndarray, ref: np.ndarray,
                     rel_gate: float) -> CompareResult:
    """Max-abs-diff comparator with first-offender reporting, equivalent of
    ``aarch64/compare_matrices.cpp:17-28`` (which prints the first element
    whose |diff| > 0.5). Uses the native C++ comparator (csrc/) when
    available, numpy otherwise."""
    ref = np.asarray(ref, np.float64)
    denom = max(float(np.max(np.abs(ref))), 1e-30)
    if np.isfinite(rel_gate):
        try:
            from how_to_optimize_gemm_tpu.utils.native import native_compare
            max_abs, first_bad = native_compare(
                np.asarray(out, np.float32), ref, denom, rel_gate)
            return CompareResult(max_abs=max_abs,
                                 max_rel=max_abs / denom,
                                 first_bad=first_bad)
        except Exception:
            pass
    out = np.asarray(out, np.float64)
    diff = np.abs(out - ref)
    max_abs = float(np.max(diff))
    max_rel = max_abs / denom
    first_bad = None
    if max_rel > rel_gate:
        bad = np.argwhere(diff / denom > rel_gate)
        if bad.size:
            first_bad = (int(bad[0][0]), int(bad[0][1]))
    return CompareResult(max_abs=max_abs, max_rel=max_rel,
                         first_bad=first_bad)


class DiffGateError(AssertionError):
    """Raised when a rung fails its correctness gate (the reference
    ``exit(-1)``s, aarch64/test_MMult.cpp:127-130)."""
