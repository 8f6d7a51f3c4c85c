"""Hand-rolled ring collectives + communication/compute overlap.

The reference has no distributed layer at all (SURVEY.md §2.6); this module
supplies the TPU-native idiom the north star names: "dequant+matmul
overlapped with ICI psum/all-gather". Two levels:

1. ``psum``/``all_gather`` one-liners inside shard_map (tp_gemm.py) — XLA
   picks the algorithm. Right default.
2. This module: explicit ring schedules built from ``lax.ppermute`` with
   the matmul CHUNKED so XLA's latency-hiding scheduler can overlap each
   hop's transfer with the next chunk's compute — the TPU analogue of the
   reference's load/compute software pipelining (``aarch64/MMult_4x4_17``,
   ``cuda/MMult_cuda_12``'s ldg/fma overlap), but across chips over ICI.

All functions run inside ``shard_map`` bodies (they use a named axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ring_perm(n: int, reverse: bool = False):
    if reverse:
        return [((j + 1) % n, j) for j in range(n)]
    return [(j, (j + 1) % n) for j in range(n)]


def ring_all_gather(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-gather via n-1 ppermute hops; returns concat over the axis
    group (device j's shard lands at block j). Equivalent of
    lax.all_gather(x, axis_name, tiled=True), written as an explicit ring
    so each hop is overlappable with consumer compute."""
    n = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    shard_rows = x.shape[0]
    out = jnp.zeros((n * shard_rows,) + x.shape[1:], x.dtype)
    out = lax.dynamic_update_slice_in_dim(out, x, me * shard_rows, 0)
    cur = x

    def body(i, carry):
        out, cur = carry
        cur = lax.ppermute(cur, axis_name, _ring_perm(n))
        src = (me - i - 1) % n
        out = lax.dynamic_update_slice_in_dim(out, cur, src * shard_rows,
                                              0)
        return out, cur

    out, _ = lax.fori_loop(0, n - 1, body, (out, cur))
    return out


def ring_reduce_scatter(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Reduce-scatter via a ring: x is (n*rows, ...) on every device;
    returns this device's (rows, ...) chunk of the element-wise sum.

    Schedule: start from the chunk our LEFT neighbor will need last;
    each hop adds the local contribution for the chunk in flight."""
    n = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    rows = x.shape[0] // n

    def chunk(j):
        return lax.dynamic_slice_in_dim(x, j * rows, rows, 0)

    # Chunk c originates at device c+1 and rides right, visiting every
    # device once and arriving home at device c after n-1 hops. So device
    # me originates chunk me-1, and after hop i+1 it holds (and adds its
    # contribution to) chunk me-i-2.
    acc = chunk((me - 1) % n)

    def body(i, acc):
        acc = lax.ppermute(acc, axis_name, _ring_perm(n))
        j = (me - i - 2) % n   # the chunk index acc now represents
        return acc + chunk(j)

    return lax.fori_loop(0, n - 1, body, acc)


def overlapped_matmul_reduce_scatter(x: jnp.ndarray, w: jnp.ndarray,
                                     axis_name: str) -> jnp.ndarray:
    """Row-parallel matmul with the reduction ring overlapped with chunked
    compute: x (M, K_shard), w (K_shard, N) -> out (M/n, N), sharded on M.

    Instead of matmul-everything-then-reduce_scatter, each ring step
    multiplies only the M-chunk that is about to ride the ring, so hop i's
    ICI transfer hides behind chunk i+1's MXU work (XLA's latency-hiding
    scheduler interleaves the async ppermute with the next dot). This is
    the inter-chip version of the reference's software pipelining.
    """
    n = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    mc = x.shape[0] // n

    def partial(j):
        xj = lax.dynamic_slice_in_dim(x, j * mc, mc, 0)
        return jnp.dot(xj, w, preferred_element_type=jnp.float32)

    acc = partial((me - 1) % n)   # same ring schedule as reduce-scatter

    def body(i, acc):
        acc = lax.ppermute(acc, axis_name, _ring_perm(n))
        j = (me - i - 2) % n
        return acc + partial(j)   # compute overlaps the next hop

    return lax.fori_loop(0, n - 1, body, acc)


def overlapped_all_gather_matmul(x: jnp.ndarray, w: jnp.ndarray,
                                 axis_name: str) -> jnp.ndarray:
    """Column-parallel matmul on M-sharded activations with the gather
    ring overlapped with compute: x (M_shard, K), w (K, N_shard) ->
    out (M, N_shard): each hop multiplies the chunk that just arrived
    while the next chunk is in flight."""
    n = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    rows = x.shape[0]
    out = jnp.zeros((n * rows, w.shape[1]), jnp.float32)

    def place(out, xj, j):
        yj = jnp.dot(xj, w, preferred_element_type=jnp.float32)
        return lax.dynamic_update_slice_in_dim(out, yj, j * rows, 0)

    out = place(out, x, me)
    cur = x

    def body(i, carry):
        out, cur = carry
        cur = lax.ppermute(cur, axis_name, _ring_perm(n))
        src = (me - i - 1) % n
        return place(out, cur, src), cur

    out, _ = lax.fori_loop(0, n - 1, body, (out, cur))
    return out
