"""Sweep driver — L3 of the reference (``aarch64/test_MMult.cpp:24-144``).

For every sweep size: allocate (A, B, C), run the fp64 oracle once, run the
rung NREPEATS times keeping *best* time (the CPU harness's policy,
``test_MMult.cpp:105-117`` — deliberately not the CUDA harness's average),
gate max-abs-diff, and emit one ``p gflops diff`` row. Timed region covers
only the GEMM entrypoint; operand preparation (quantize/pack/cast) is the
offline step and excluded, mirroring how the reference passes pre-built
int8 operands to chgemm.

CLI replaces the makefile's ``OLD :=``/``NEW :=`` + ``make run`` flow:

    python -m how_to_optimize_gemm_tpu.harness.driver \
        --new 06_pallas_int8 --old 01_xla_fp32 --quick
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import shutil

import jax
import numpy as np

from how_to_optimize_gemm_tpu.harness import mfile, oracle
from how_to_optimize_gemm_tpu.harness.parameters import (
    CUDA_SWEEP, QUICK_SWEEP, SweepConfig)
from how_to_optimize_gemm_tpu.ops import registry
from how_to_optimize_gemm_tpu.utils.matrices import make_abc
from how_to_optimize_gemm_tpu.utils.timing import time_chained


@dataclasses.dataclass(frozen=True)
class SweepRow:
    p: int
    m: int
    n: int
    k: int
    gflops: float
    best_s: float
    kernel_rel: float   # vs fp64 oracle on effective operands (gated)
    quant_rel: float    # vs fp64 oracle on original operands (reported)


def run_sweep(rung_name: str, config: SweepConfig | None = None,
              output_dir=None, strict: bool = True,
              verbose: bool = True,
              quant_oracle: bool = True,
              verify: bool | str = True,
              tuned: bool = False) -> list[SweepRow]:
    """verify: True = full fp64 host oracle (the default, every row);
    "device" = on-device fp32-HIGHEST cross-check (jnp.dot of the
    effective operands — a different code path from any rung, ~ms per
    row even at p=4096; gates indexing/accumulation bugs but at fp32
    summation noise ~1e-6 rather than fp64 exactness); False = skip —
    ONLY for callers that gated the same rung at another size in the
    same run (the fp64 oracle at 4096 costs minutes of host time).

    tuned=True consults the autotune cache (harness/autotune.py) per
    row and passes any stored (bm, bn, bk) through to the kernel;
    rows/rungs with no committed tuning run exactly as before."""
    config = config or SweepConfig()
    rung = registry.get(rung_name)
    key = jax.random.PRNGKey(config.seed)
    rows: list[SweepRow] = []
    for m, n, k in config.sizes():
        key, sub = jax.random.split(key)
        a, b, c = make_abc(sub, m, n, k, ones=config.ones_fixture)
        prepared = jax.block_until_ready(rung.prepare(a, b))

        run_fn = rung.run
        if tuned:
            import functools

            from how_to_optimize_gemm_tpu.harness import autotune
            hit = autotune.cached(rung_name, m, n, k)
            if hit is not None:
                run_fn = functools.partial(rung.run, bm=hit[0],
                                           bn=hit[1], bk=hit[2])
                if verbose:
                    print(f"  [tuned blocks bm={hit[0]} bn={hit[1]} "
                          f"bk={hit[2]}]")

        if not verify:
            cmp_eff = oracle.CompareResult(0.0, 0.0, None)
            cmp_q = cmp_eff
        elif verify == "device":
            import jax.numpy as jnp
            out_dev = run_fn(*prepared, c)
            ae, be = rung.effective(prepared)
            ref_dev = (jnp.dot(jnp.asarray(ae), jnp.asarray(be),
                               precision=jax.lax.Precision.HIGHEST)
                       + c)
            denom = float(jnp.maximum(jnp.max(jnp.abs(ref_dev)), 1e-30))
            max_abs = float(jnp.max(jnp.abs(out_dev - ref_dev)))
            cmp_eff = oracle.CompareResult(max_abs, max_abs / denom, None)
            cmp_q = cmp_eff
        else:
            out = np.asarray(run_fn(*prepared, c))
            ae, be = rung.effective(prepared)
            ref_eff = oracle.ref_mmult(np.asarray(ae), np.asarray(be),
                                       np.asarray(c))
            cmp_eff = oracle.compare_matrices(out, ref_eff, rung.gate_rel)
        if verify is True and quant_oracle:
            # second fp64 matmul (vs ORIGINAL operands): reports
            # quantization error separately from kernel error. Skippable
            # (bench.py): it doubles the oracle cost and gates nothing.
            ref_fp32 = oracle.ref_mmult(np.asarray(a), np.asarray(b),
                                        np.asarray(c))
            cmp_q = oracle.compare_matrices(out, ref_fp32, float("inf"))
        else:
            cmp_q = cmp_eff

        if cmp_eff.max_rel > rung.gate_rel:
            msg = (f"{rung_name} p={m}x{n}x{k}: kernel rel diff "
                   f"{cmp_eff.max_rel:.3e} > gate {rung.gate_rel:.0e}, "
                   f"first bad element {cmp_eff.first_bad}")
            if strict:
                raise oracle.DiffGateError(msg)
            print("WARNING:", msg)

        # via-B chaining needs square shapes; barrier mode is the
        # hoisting-safe fallback for rectangular pinned sweeps.
        mode = rung.chain
        if mode == "via_b" and not (m == n == k):
            mode = "barrier"
        best = time_chained(run_fn, prepared, c,
                            inner_iters=config.nrepeats,
                            outer_repeats=3, warmup=config.warmup,
                            chain=mode)
        gflops = 2.0 * m * n * k / best / 1e9
        p = max(m, n, k)
        rows.append(SweepRow(p=p, m=m, n=n, k=k, gflops=gflops,
                             best_s=best, kernel_rel=cmp_eff.max_rel,
                             quant_rel=cmp_q.max_rel))
        if verbose:
            print(f"{p} {gflops:e} {cmp_eff.max_rel:e}")

    if output_dir is not None:
        out_path = pathlib.Path(output_dir) / f"output_{rung_name}.m"
        mfile.write_mfile(
            out_path, rung_name,
            [(r.p, r.gflops, r.kernel_rel) for r in rows])
        if verbose:
            print(f"wrote {out_path}")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--new", required=True, choices=registry.names(),
                    help="rung under test (makefile NEW)")
    ap.add_argument("--old", default=None, choices=registry.names(),
                    help="comparison rung (makefile OLD); also swept")
    ap.add_argument("--output-dir", default="outputs")
    ap.add_argument("--quick", action="store_true",
                    help="coarse sweep (1024..4096 step 1024)")
    ap.add_argument("--cuda-sweep", action="store_true",
                    help="reference cuda sweep bounds (1024..4096 step 128)")
    ap.add_argument("--pfirst", type=int, default=None)
    ap.add_argument("--plast", type=int, default=None)
    ap.add_argument("--pinc", type=int, default=None)
    ap.add_argument("--nrepeats", type=int, default=None)
    ap.add_argument("--no-strict", action="store_true")
    ap.add_argument("--tuned", action="store_true",
                    help="consult outputs/autotune.json per row and "
                         "pass any stored (bm, bn, bk) to the kernel "
                         "(harness/autotune.py; absent entries run the "
                         "built-in choosers)")
    ap.add_argument("--roofline", action="store_true",
                    help="print ANALYTIC top-down roofline attribution "
                         "per rung (harness/profiling.py)")
    ap.add_argument("--trace", action="store_true",
                    help="capture a MEASURED per-op device profile of "
                         "each rung at the largest sweep size "
                         "(jax.profiler; the mperf-TMA analogue) and "
                         "print the occupancy table")
    args = ap.parse_args(argv)

    config = QUICK_SWEEP if args.quick else (
        CUDA_SWEEP if args.cuda_sweep else SweepConfig())
    overrides = {f: getattr(args, f) for f in
                 ("pfirst", "plast", "pinc", "nrepeats")
                 if getattr(args, f) is not None}
    if overrides:
        config = dataclasses.replace(config, **overrides)

    out_dir = pathlib.Path(args.output_dir)
    for name, tag in ((args.old, "old"), (args.new, "new")):
        if name is None:
            continue
        print(f"== {tag}: {name} ==")
        rows = run_sweep(name, config, out_dir,
                         strict=not args.no_strict, tuned=args.tuned)
        # old/new A-B snapshot convention (aarch64/makefile:43-44)
        shutil.copy(out_dir / f"output_{name}.m",
                    out_dir / f"output_{tag}.m")
        if args.roofline:
            from how_to_optimize_gemm_tpu.harness.profiling import (
                roofline_report)
            print(roofline_report(rows, name))
        if args.trace:
            from how_to_optimize_gemm_tpu.harness import profiling
            rung = registry.get(name)
            p_max = max(r.p for r in rows)
            ops, path = profiling.trace_rung(name, p_max)
            print(profiling.trace_table(
                ops, compute_dtype=rung.compute_dtype or rung.dtype,
                total_note=f" [{name} p={p_max}, capture: {path}]"))


if __name__ == "__main__":
    main()
