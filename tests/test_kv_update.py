"""Parity tests for the in-place Pallas KV-cache update kernels
(ops/pallas_kv_update) against the XLA formulations they replace
(models/llama._update_cache / _update_paged_cache)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.ops import pallas_kv_update as kvu


def _mk(key, shape, dtype):
    x = jax.random.normal(key, shape, jnp.float32)
    if dtype == jnp.int8:
        return jnp.clip(jnp.round(x * 20), -127, 127).astype(jnp.int8)
    return x.astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32, jnp.int8])
@pytest.mark.parametrize("s", [1, 4])
def test_contig_matches_xla(dtype, s):
    b, t, kvh, d = 3, 64, 2, 128
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    cache = _mk(k0, (b, t, kvh, d), dtype)
    new = _mk(k1, (b, s, kvh, d), jnp.float32)
    pos = jnp.array([0, 17, t - s], jnp.int32)
    ref = llama._update_cache(cache, new, pos)
    got = kvu.kv_update(cache, new, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_contig_scalar_pos_and_mask():
    b, t, kvh, d = 4, 32, 2, 128
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    cache = _mk(k0, (b, t, kvh, d), jnp.bfloat16)
    new = _mk(k1, (b, 2, kvh, d), jnp.float32)
    mask = jnp.array([True, False, True, False])
    ref = llama._update_cache(cache, new, 5, write_mask=mask)
    got = kvu.kv_update(cache, new, 5, write_mask=mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_contig_out_of_range_is_dropped():
    """pos >= T (a finished slot scanning past max_seq) must leave the
    cache untouched — the scatter path's drop semantics."""
    b, t, kvh, d = 2, 16, 2, 128
    k0, k1 = jax.random.split(jax.random.PRNGKey(2))
    cache = _mk(k0, (b, t, kvh, d), jnp.bfloat16)
    new = _mk(k1, (b, 1, kvh, d), jnp.float32)
    pos = jnp.array([t, 3], jnp.int32)
    got = kvu.kv_update(cache, new, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(cache[0]))
    ref = llama._update_cache(cache, new, pos)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_contig_partial_overflow_drops_rows():
    """A multi-token write crossing T (a speculative window at max_seq)
    keeps its in-range rows and drops the rest — element-wise drop, the
    scatter semantic. (XLA's own S>1 formulation is a vmap'd
    dynamic_update_slice, which CLAMPS the start index and silently
    overwrites live history rows — the kernel must not copy that.)"""
    b, t, kvh, d = 2, 16, 2, 128
    k0, k1 = jax.random.split(jax.random.PRNGKey(6))
    cache = _mk(k0, (b, t, kvh, d), jnp.bfloat16)
    new = _mk(k1, (b, 4, kvh, d), jnp.float32)
    pos = jnp.array([t - 2, 5], jnp.int32)   # slot 0: rows 14,15 in, 2 out
    got = kvu.kv_update(cache, new, pos, interpret=True)
    exp = np.asarray(cache).copy()
    exp[0, t - 2:] = np.asarray(new.astype(cache.dtype))[0, :2]
    exp[1, 5:9] = np.asarray(new.astype(cache.dtype))[1]
    np.testing.assert_array_equal(exp, np.asarray(got))


def test_contig_scales_rank3():
    """KV8 scale tensors are (B, T, 128) — rank-3 caches go through the
    same kernel."""
    b, t = 3, 24
    k0, k1 = jax.random.split(jax.random.PRNGKey(3))
    cache = _mk(k0, (b, t, 128), jnp.float32)
    new = _mk(k1, (b, 1, 128), jnp.float32)
    pos = jnp.array([0, 9, 23], jnp.int32)
    ref = llama._update_cache(cache, new, pos)
    got = kvu.kv_update(cache, new, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8])
def test_paged_matches_xla(dtype):
    npages, ps, kvh, d = 6, 8, 2, 128
    b, s = 3, 1
    k0, k1 = jax.random.split(jax.random.PRNGKey(4))
    pool = _mk(k0, (npages, ps, kvh, d), dtype)
    new = _mk(k1, (b, s, kvh, d), jnp.float32)
    # slot tables: slot 0 -> pages [1,2], slot 1 -> [3], slot 2 -> [4,5]
    table = jnp.array([[1, 2], [3, 0], [4, 5]], jnp.int32)
    pos = jnp.array([9, 3, 15], jnp.int32)
    ref = llama._update_paged_cache(pool, new, pos, table)

    positions = pos[:, None] + jnp.arange(s)
    chunk = jnp.clip(positions // ps, 0, table.shape[1] - 1)
    pages = jnp.take_along_axis(table, chunk, axis=1)
    offs = positions % ps
    got = kvu.paged_kv_update(pool, new, pages, offs, interpret=True)
    # page 0 (trash) may differ: XLA writes it, the kernel skips it.
    np.testing.assert_array_equal(np.asarray(ref[1:]), np.asarray(got[1:]))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(pool[0]))


def test_paged_mask_and_multitoken():
    npages, ps, kvh, d = 5, 4, 2, 128
    b, s = 2, 3
    k0, k1 = jax.random.split(jax.random.PRNGKey(5))
    pool = _mk(k0, (npages, ps, kvh, d), jnp.bfloat16)
    new = _mk(k1, (b, s, kvh, d), jnp.float32)
    table = jnp.array([[1, 2, 0], [3, 4, 0]], jnp.int32)
    pos = jnp.array([3, 6], jnp.int32)   # slot 0 crosses a page boundary
    mask = jnp.array([True, False])
    ref = llama._update_paged_cache(pool, new, pos, table,
                                    write_mask=mask)
    positions = pos[:, None] + jnp.arange(s)
    chunk = jnp.clip(positions // ps, 0, table.shape[1] - 1)
    pages = jnp.take_along_axis(table, chunk, axis=1)
    offs = positions % ps
    got = kvu.paged_kv_update(pool, new, pages, offs, write_mask=mask,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[1:]), np.asarray(got[1:]))


def test_contig_dhead64_flattened_row():
    """d_head=64 caches (row (KVH, 64)) must work via the flattened-row
    layout — Mosaic rejects a trailing-64 slice unflattened
    (chip-caught round 4)."""
    b, t, kvh, d = 2, 32, 8, 64
    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    cache = _mk(k0, (b, t, kvh, d), jnp.bfloat16)
    new = _mk(k1, (b, 1, kvh, d), jnp.float32)
    pos = jnp.array([3, 31], jnp.int32)
    ref = llama._update_cache(cache, new, pos)
    got = kvu.kv_update(cache, new, pos, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
