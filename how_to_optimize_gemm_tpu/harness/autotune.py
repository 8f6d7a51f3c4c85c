"""Measured block-config autotuner — the reference's tuning loop as a
framework feature.

The reference tunes by hand: edit ``parameters.h`` / the in-kernel
``GEMM_M/N/K`` defines, rebuild, rerun, keep the best
(``aarch64/MMult_4x4_14.cpp:24-55`` documents one such derivation as
comments; the cuda rungs keep experiment logs the same way,
``MMult_cuda_11.cu:83-91``). The TPU ladder's kernels expose the same
knobs at runtime (``bm``/``bn``/``bk`` keyword overrides on every
summit-family rung), so the loop can be a tool: enumerate aligned
candidate schedules around the rung's own chooser, TIME each with the
harness's chained best-of policy (utils/timing.time_chained — the same
anti-hoisting discipline as the sweep driver), gate each candidate on
device against an fp32-HIGHEST cross-check, and persist the winner in
``outputs/autotune.json``.

The cache is a committed artifact, like the reference's tuned
``parameters.h`` constants: ``harness.driver --tuned`` consults it per
(rung, m, n, k, backend) row and passes the stored blocks through to
the kernel; absent entries fall back to the built-in choosers, so
default behavior never changes unless a tuning run was committed.

Cost note (axon relay): every candidate is one remote Mosaic compile
(~2 min each, serialized) + a >=0.5 s chained timing — budget
``n_candidates * 150 s`` for a cold tune of a new shape.
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import pathlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

from how_to_optimize_gemm_tpu.ops import bounds
from how_to_optimize_gemm_tpu.utils.matrices import make_abc
from how_to_optimize_gemm_tpu.utils.timing import time_chained

DEFAULT_CACHE = pathlib.Path(__file__).resolve().parents[2] / (
    "outputs/autotune.json")


@dataclasses.dataclass(frozen=True)
class TuneSpec:
    """Per-rung tuning space: the rung's own chooser (always candidate
    #0) plus streamed-operand byte widths and the VMEM footprint budget
    its schedule family obeys (28 MB for 1-2 B elements, 20 MB fp32 —
    Mosaic's scoped-VMEM accounting runs ~2x the naive model at
    elt=4; see pallas_tuned.choose_blocks_bf16_bt)."""
    chooser: Callable[[int, int, int], tuple[int, int, int]]
    ea: float              # A bytes/elt as streamed by the kernel
    eb: float              # B bytes/elt
    budget_mb: int
    # the packed-nibble layout can't be re-padded inside the kernel, so
    # its bk must DIVIDE the (512-aligned) K — candidate bks obey it
    bk_divides_k: bool = False


def _specs() -> dict[str, TuneSpec]:
    # late imports: ops modules import nothing from harness at module
    # scope, keeping this dependency one-directional at import time
    from how_to_optimize_gemm_tpu.ops import (pallas_int4, pallas_int8,
                                              pallas_tuned)
    return {
        "06_pallas_int8": TuneSpec(
            pallas_int8.choose_blocks_q, 1, 1, 28),
        "14_packed_alias_int8": TuneSpec(
            pallas_int8.choose_blocks_bt, 1, 1, 28),
        "15_packed_alias_bf16": TuneSpec(
            lambda m, n, k: pallas_tuned.choose_blocks_bf16_bt(
                m, n, k, elt=2), 2, 2, 28),
        "16_packed_alias_fp32": TuneSpec(
            lambda m, n, k: pallas_tuned.choose_blocks_bf16_bt(
                m, n, k, elt=4), 4, 4, 20),
        "07b_pallas_w4a8": TuneSpec(
            lambda m, n, k: pallas_int4.choose_blocks_w4(
                m, n, bounds.round_up(k, 512)), 1, 0.5, 28,
            bk_divides_k=True),
    }


def tunable() -> list[str]:
    return sorted(_specs())


def footprint_bytes(bm: int, bn: int, bk: int, ea: float,
                    eb: float) -> float:
    """Double-buffered streaming footprint of the summit-schedule
    family: A and B^T blocks x2 + aliased-C dbl-buf (fp32) + int32
    acc — the model choose_blocks_bt derives its row cap from."""
    return 2 * bm * bk * ea + 2 * bk * bn * eb + 12 * bm * bn


def candidates(rung_name: str, m: int, n: int, k: int,
               max_candidates: int = 12
               ) -> list[tuple[int, int, int]]:
    """Aligned candidate (bm, bn, bk) schedules: the rung's own chooser
    first, then a least-waste neighborhood (every dim picked by
    bounds._least_waste so no candidate re-introduces the padding-waste
    bugs the round-1/2 choosers were audited for), filtered by the
    spec's VMEM footprint budget."""
    spec = _specs()[rung_name]
    base = tuple(spec.chooser(m, n, k))
    m128 = bounds.round_up(m, 128)
    n128 = bounds.round_up(n, 128)
    k512 = bounds.round_up(k, 512)
    bms = {bounds._least_waste(m128, cap, 128)
           for cap in (256, 512, 1024, 1792) if cap <= m128 * 2}
    bns = {bounds._least_waste(n128, cap, 128)
           for cap in (256, 512, 1024) if cap <= n128 * 2}
    if spec.bk_divides_k:
        bks = {bk for bk in range(512, min(k512, 4096) + 1, 512)
               if k512 % bk == 0}
    else:
        bks = {min(bounds._least_waste(k512, cap, 512), k512)
               for cap in (512, 1024, 2048, 4096)}
    budget = spec.budget_mb * 1024 * 1024
    out = [base]
    for bm in sorted(bms):
        for bn in sorted(bns):
            for bk in sorted(bks):
                cfg = (bm, bn, bk)
                if cfg in out:
                    continue
                if footprint_bytes(bm, bn, bk, spec.ea,
                                   spec.eb) > budget:
                    continue
                out.append(cfg)
    # keep the chooser's pick plus the largest-footprint half of the
    # neighborhood (small tiles are grid-overhead-bound; the measured
    # optima all sit near the budget boundary)
    rest = sorted(out[1:], key=lambda c: -footprint_bytes(
        *c, spec.ea, spec.eb))
    return [base] + rest[:max_candidates - 1]


@dataclasses.dataclass(frozen=True)
class TuneRow:
    bm: int
    bn: int
    bk: int
    gflops: float          # 0.0 when the candidate failed
    kernel_rel: float
    error: str | None = None   # compile/gate failure, kept honestly


def tune(rung_name: str, m: int, n: int, k: int, *,
         nrepeats: int = 8,
         candidate_list: list[tuple[int, int, int]] | None = None,
         verbose: bool = True,
         noise_margin: float = 0.01,
         cache_path: pathlib.Path | str | None = DEFAULT_CACHE
         ) -> list[TuneRow]:
    """Time every candidate, gate each on device (fp32-HIGHEST
    cross-check of the effective operands — the driver's
    verify="device" policy), persist the winner, return all rows
    (failures included, like the reference's committed failing runs)."""
    from how_to_optimize_gemm_tpu.ops import registry
    rung = registry.get(rung_name)
    a, b, c = make_abc(jax.random.PRNGKey(0), m, n, k)
    prepared = jax.block_until_ready(rung.prepare(a, b))
    ae, be = rung.effective(prepared)
    ref = (jnp.dot(jnp.asarray(ae), jnp.asarray(be),
                   precision=jax.lax.Precision.HIGHEST) + c)
    denom = float(jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
    gate = max(rung.gate_rel, 1e-5)   # fp32 cross-check noise floor

    rows: list[TuneRow] = []
    for bm, bn, bk in (candidate_list
                       or candidates(rung_name, m, n, k)):
        run = functools.partial(rung.run, bm=bm, bn=bn, bk=bk)
        try:
            out = run(*prepared, c)
            rel = float(jnp.max(jnp.abs(out - ref))) / denom
            if rel > gate:
                rows.append(TuneRow(bm, bn, bk, 0.0, rel,
                                    f"gate {rel:.2e} > {gate:.0e}"))
            else:
                best = time_chained(run, prepared, c,
                                    inner_iters=nrepeats,
                                    outer_repeats=3,
                                    chain=rung.chain)
                rows.append(TuneRow(bm, bn, bk,
                                    2.0 * m * n * k / best / 1e9, rel))
        except Exception as e:                     # compile/VMEM OOM
            rows.append(TuneRow(bm, bn, bk, 0.0, float("inf"),
                                f"{type(e).__name__}: {e}"[:200]))
        if verbose:
            r = rows[-1]
            status = (f"{r.gflops:12.1f} GFLOPS"
                      if r.error is None else f"FAILED ({r.error})")
            print(f"  bm={r.bm:<5} bn={r.bn:<5} bk={r.bk:<5} {status}")

    ok = [r for r in rows if r.error is None]
    if ok and cache_path is not None:
        best = max(ok, key=lambda r: r.gflops)
        # Bank a non-default winner only when it beats the chooser by
        # a REAL margin: candidates within run-to-run noise are a
        # coin flip, and the round-3 protocol caught a "+0.3%" banked
        # config measuring WORSE than the default on a later session.
        # Candidate #0 is always the chooser's own pick.
        base = rows[0] if rows[0].error is None else None
        if (base is not None and best is not base
                and best.gflops < base.gflops * (1 + noise_margin)):
            best = base
        save_cached(rung_name, m, n, k,
                    (best.bm, best.bn, best.bk), best.gflops,
                    cache_path)
        if verbose:
            d = tuple(_specs()[rung_name].chooser(m, n, k))
            print(f"best: bm={best.bm} bn={best.bn} bk={best.bk} "
                  f"{best.gflops:.1f} GFLOPS (chooser default {d})")
    return rows


# --------------------------------------------------------------- cache

def _cache_key(rung_name: str, m: int, n: int, k: int) -> str:
    return f"{rung_name}|{m}x{n}x{k}|{jax.default_backend()}"


def _load(path) -> dict:
    p = pathlib.Path(path)
    if not p.exists():
        return {}
    try:
        return json.loads(p.read_text())
    except json.JSONDecodeError:
        return {}


def save_cached(rung_name: str, m: int, n: int, k: int,
                blocks: tuple[int, int, int], gflops: float,
                path=DEFAULT_CACHE) -> None:
    p = pathlib.Path(path)
    data = _load(p)
    data[_cache_key(rung_name, m, n, k)] = {
        "bm": blocks[0], "bn": blocks[1], "bk": blocks[2],
        "gflops": round(gflops, 1),
        "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
    }
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(data, indent=1, sort_keys=True) + "\n")


def cached(rung_name: str, m: int, n: int, k: int,
           path=DEFAULT_CACHE) -> tuple[int, int, int] | None:
    """Best-known (bm, bn, bk) for this rung/shape on this backend, or
    None (backend is part of the key: committed chip tunings never leak
    into CPU-interpret runs)."""
    hit = _load(path).get(_cache_key(rung_name, m, n, k))
    return (hit["bm"], hit["bn"], hit["bk"]) if hit else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rung", required=True, choices=tunable())
    ap.add_argument("--p", type=int, default=None,
                    help="square size (M=N=K=p)")
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--nrepeats", type=int, default=8)
    ap.add_argument("--max-candidates", type=int, default=12)
    ap.add_argument("--cache", default=str(DEFAULT_CACHE))
    args = ap.parse_args(argv)
    if args.p is None and None in (args.m, args.n, args.k):
        ap.error("pass --p or all of --m/--n/--k")
    m = args.m if args.p is None else args.p
    n = args.n if args.p is None else args.p
    k = args.k if args.p is None else args.p
    print(f"tuning {args.rung} at {m}x{n}x{k} "
          f"({args.max_candidates} candidates max; each is one remote "
          f"compile on the relay)")
    tune(args.rung, m, n, k, nrepeats=args.nrepeats,
         candidate_list=candidates(args.rung, m, n, k,
                                   args.max_candidates),
         cache_path=args.cache)


if __name__ == "__main__":
    main()
