"""Interleaved same-session A/B protocol — the decisive-headline tool.

The reference's crowning claim ("faster than cuBLAS",
``cuda/MMult_cuda_12.cu:77-82`` + ``README.md:96-102``) rests on one
sweep where its hand kernel and the vendor run in the SAME binary,
back to back. This module is that protocol made explicit for the
relay-attached TPU, where day-to-day drift (~±1-2%) is the same size
as the contest margin:

1. Both rungs are prepared, gated on device, and compiled ONCE
   (``utils/timing.build_chained`` — the identical chained anti-hoisting
   launch the sweep driver times with, >=0.5 s device time per launch).
2. Launches then strictly INTERLEAVE: round r times one launch of A
   then one of B (order flipping every round so slow thermal/relay
   drift cancels instead of biasing whichever rung went first).
3. The verdict is per-round: rung X "wins" round r if its per-call
   time beat the other's in THAT round. Wins/ties/losses over >= 5
   rounds plus median ± spread make "faster/slower/tied" a
   reproducible statement rather than two numbers from different
   sessions.
4. Every session appends to ``outputs/ab_<a>_vs_<b>.json`` — re-running
   on another day accumulates sessions in the same artifact, which is
   the multi-day record the claim cites.

Tie rule: a round is a tie when the two per-call times differ by less
than ``tie_rel`` (default 0.5%, well under the measured ±10% relay
variance but above clock jitter at 0.5 s launches).

PROTOCOL HYGIENE (learned the hard way, round 3): run sessions on an
otherwise IDLE host. A concurrent CPU-bound job (a pytest run) made
one rung read 371-388 TOPS — above its own in-kernel dot ceiling —
because host scheduling noise corrupts the wall-clock/overhead
accounting; that session was killed before it could contaminate the
committed artifact. Sanity rule: any reading above the rung's
measured resident-dot ceiling (384 TOPS int8) is a broken session,
not speed.

CLI::

    python -u -m how_to_optimize_gemm_tpu.harness.ab \
        --a 14_packed_alias_int8 --b 06v_xla_int8 --p 3584 4096
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import time

import jax
import jax.numpy as jnp

from how_to_optimize_gemm_tpu.ops import registry
from how_to_optimize_gemm_tpu.utils.matrices import make_abc
from how_to_optimize_gemm_tpu.utils.timing import (build_chained,
                                                   dispatch_overhead_s,
                                                   dclock, flush)

DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / "outputs"


@dataclasses.dataclass
class ABResult:
    p: int
    rounds: int
    a_gflops: list[float]        # per-round, interleaved
    b_gflops: list[float]
    wins_a: int
    wins_b: int
    ties: int
    a_median: float
    b_median: float


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _prep(rung_name: str, m: int, n: int, k: int, seed: int = 0,
          tuned: bool = False):
    """Prepare + device-gate + build the chained thunk for one rung.
    tuned consults the banked autotune cache like ``driver --tuned``."""
    rung = registry.get(rung_name)
    a, b, c = make_abc(jax.random.PRNGKey(seed), m, n, k)
    prepared = jax.block_until_ready(rung.prepare(a, b))
    run = rung.run
    if tuned:
        import functools

        from how_to_optimize_gemm_tpu.harness import autotune
        hit = autotune.cached(rung_name, m, n, k)
        if hit is not None:
            run = functools.partial(rung.run, bm=hit[0], bn=hit[1],
                                    bk=hit[2])
    out = run(*prepared, c)
    ae, be = rung.effective(prepared)
    ref = (jnp.dot(jnp.asarray(ae), jnp.asarray(be),
                   precision=jax.lax.Precision.HIGHEST) + c)
    denom = float(jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
    rel = float(jnp.max(jnp.abs(out - ref))) / denom
    if rel > max(rung.gate_rel, 1e-5):
        raise RuntimeError(f"{rung_name} gate trip at p={m}: {rel:.2e}")
    mode = rung.chain
    if mode == "via_b" and not (m == n == k):
        mode = "barrier"
    thunk, iters = build_chained(run, prepared, c, chain=mode)
    return thunk, iters


def ab_at_size(rung_a: str, rung_b: str, p: int, *, rounds: int = 7,
               tie_rel: float = 0.005, tuned: bool = False,
               verbose: bool = True) -> ABResult:
    thunk_a, iters_a = _prep(rung_a, p, p, p, tuned=tuned)
    thunk_b, iters_b = _prep(rung_b, p, p, p, tuned=tuned)
    overhead = dispatch_overhead_s()
    flops = 2.0 * p * p * p

    def once(thunk, iters) -> float:
        t0 = dclock()
        flush(thunk())
        return max(dclock() - t0 - overhead, 1e-9) / iters

    # one unrecorded interleaved warm round (both thunks were warmed by
    # build_chained already; this re-touches them adjacently)
    once(thunk_a, iters_a)
    once(thunk_b, iters_b)

    a_g, b_g, wins_a, wins_b, ties = [], [], 0, 0, 0
    for r in range(rounds):
        pair = ((thunk_a, iters_a), (thunk_b, iters_b))
        if r % 2:                      # flip order every round
            tb = once(*pair[1][:2])
            ta = once(*pair[0][:2])
        else:
            ta = once(*pair[0][:2])
            tb = once(*pair[1][:2])
        a_g.append(flops / ta / 1e9)
        b_g.append(flops / tb / 1e9)
        if abs(ta - tb) < tie_rel * min(ta, tb):
            ties += 1
            tag = "tie"
        elif ta < tb:
            wins_a += 1
            tag = rung_a
        else:
            wins_b += 1
            tag = rung_b
        if verbose:
            print(f"  p={p} round {r}: {rung_a} {a_g[-1]:.1f} | "
                  f"{rung_b} {b_g[-1]:.1f} GFLOPS -> {tag}",
                  flush=True)
    return ABResult(p, rounds, a_g, b_g, wins_a, wins_b, ties,
                    _median(a_g), _median(b_g))


def run_protocol(rung_a: str, rung_b: str, sizes: list[int], *,
                 rounds: int = 7, tie_rel: float = 0.005,
                 tuned: bool = False, artifact_dir=DEFAULT_DIR,
                 verbose: bool = True) -> list[ABResult]:
    results = [ab_at_size(rung_a, rung_b, p, rounds=rounds,
                          tie_rel=tie_rel, tuned=tuned, verbose=verbose)
               for p in sizes]
    path = pathlib.Path(artifact_dir) / f"ab_{rung_a}_vs_{rung_b}.json"
    data = json.loads(path.read_text()) if path.exists() else {
        "a": rung_a, "b": rung_b, "tie_rel": tie_rel, "sessions": []}
    data["sessions"].append({
        "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "rounds": rounds,
        "tuned": tuned,
        "sizes": [dataclasses.asdict(r) for r in results],
    })
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data, indent=1) + "\n")
    if verbose:
        for r in results:
            print(f"p={r.p}: {rung_a} median {r.a_median:.1f} vs "
                  f"{rung_b} {r.b_median:.1f} GFLOPS | "
                  f"{r.wins_a}-{r.ties}-{r.wins_b} (W-T-L for "
                  f"{rung_a})", flush=True)
        print(f"appended session to {path}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--a", required=True, choices=registry.names())
    ap.add_argument("--b", required=True, choices=registry.names())
    ap.add_argument("--p", type=int, nargs="+", default=[3584, 4096])
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--tie-rel", type=float, default=0.005)
    ap.add_argument("--tuned", action="store_true",
                    help="consult outputs/autotune.json per rung/size")
    args = ap.parse_args(argv)
    run_protocol(args.a, args.b, args.p, rounds=args.rounds,
                 tie_rel=args.tie_rel, tuned=args.tuned)


if __name__ == "__main__":
    main()
