"""Ring collectives vs lax references on the 8-device CPU mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from how_to_optimize_gemm_tpu.parallel import collectives
from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=8)


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def test_ring_all_gather(mesh):
    x = jnp.arange(8 * 4 * 16, dtype=jnp.float32).reshape(32, 16)
    fn = _shard_map(
        functools.partial(collectives.ring_all_gather, axis_name="tp"),
        mesh, (P("tp", None),), P(None, None))
    # every device reconstructs the full array -> replicated output == x
    np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(x))


def test_ring_reduce_scatter(mesh):
    key = jax.random.PRNGKey(0)
    # one (32, 16) operand per device, stacked on a leading axis
    xs = jax.random.normal(key, (8, 32, 16))
    fn = _shard_map(
        lambda x: collectives.ring_reduce_scatter(x[0], "tp"),
        mesh, (P("tp", None, None),), P("tp", None))
    out = np.asarray(fn(xs))            # (32, 16): chunk d = sum over devs
    ref = np.asarray(xs.sum(axis=0))    # (32, 16)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_overlapped_matmul_reduce_scatter(mesh):
    key = jax.random.PRNGKey(1)
    m, k, n = 32, 64, 48
    x = jax.random.normal(key, (m, k))
    w = jax.random.normal(jax.random.PRNGKey(2), (k, n))
    fn = _shard_map(
        lambda xs, ws: collectives.overlapped_matmul_reduce_scatter(
            xs, ws, "tp"),
        mesh, (P(None, "tp"), P("tp", None)), P("tp", None))
    out = np.asarray(fn(x, w))          # (m, n) sharded on m
    ref = np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_overlapped_all_gather_matmul(mesh):
    key = jax.random.PRNGKey(3)
    m, k, n = 64, 32, 64
    x = jax.random.normal(key, (m, k))
    w = jax.random.normal(jax.random.PRNGKey(4), (k, n))
    fn = _shard_map(
        lambda xs, ws: collectives.overlapped_all_gather_matmul(
            xs, ws, "tp"),
        mesh, (P("tp", None), P(None, "tp")), P(None, "tp"))
    out = np.asarray(fn(x, w))          # (m, n) sharded on n
    ref = np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
