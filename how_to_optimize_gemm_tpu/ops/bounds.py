"""Boundary handling: run tile-aligned kernels on arbitrary M, N, K.

The reference's tutorial rungs assert multiples-of-tile shapes
(``aarch64/MMult_4x4_13.cpp:160``) and delegate boundaries to the chgemm
submodule (``README.md:79-93``). Here boundary handling is a first-class
shared layer: operands are zero-padded up to tile multiples (zero rows/cols
contribute nothing to ``A@B + C``) and the result is sliced back. On TPU
this is the idiomatic scheme — masking inside the kernel would put dynamic
shapes in the Mosaic pipeline for no win at these sizes.
"""
from __future__ import annotations

import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_dim(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def pad_gemm_operands(a, b, c, bm: int, bn: int, bk: int):
    """Zero-pad (A, B, C) so M % bm == N % bn == K % bk == 0."""
    a = pad_dim(pad_dim(a, 0, bm), 1, bk)
    b = pad_dim(pad_dim(b, 0, bk), 1, bn)
    c = pad_dim(pad_dim(c, 0, bm), 1, bn)
    return a, b, c


def crop(out: jnp.ndarray, m: int, n: int) -> jnp.ndarray:
    if out.shape == (m, n):
        return out
    return out[:m, :n]


def _least_waste(n: int, cap: int, step: int) -> int:
    """Largest block <= cap (multiple of step) minimizing pad waste of n.

    A naive min(round_up(n, step), cap) pads e.g. N=11008 (Llama-2-7B's
    d_ff) up to 16384 when capped at 8192 — 49% wasted compute on every
    MLP linear. Ties break toward the larger block.

    cap is floored to a step multiple first: range(cap, 0, -step) from
    an UNALIGNED cap walks unaligned candidates (round 3: rung 04's
    capacity halving produced cap=320 at p=640, this returned 320, and
    Mosaic rejected the non-128-multiple block — caught by the
    small-size sweep)."""
    n = max(n, 1)
    cap = max(cap // step * step, step)
    best_waste, best = None, step
    for cand in range(cap, 0, -step):
        waste = -n % cand
        if best_waste is None or waste < best_waste:
            best_waste, best = waste, cand
        if waste == 0:
            break
    return best
