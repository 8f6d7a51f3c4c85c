"""Ring (sequence-parallel) attention vs the single-device reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh
from how_to_optimize_gemm_tpu.parallel.ring_attention import ring_attention


def _ref(q, k, v, causal):
    b, h, s, d = q.shape
    rep = h // k.shape[1]
    kf = jnp.repeat(k, rep, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, rep, axis=1).astype(jnp.float32)
    sc = jnp.einsum("bhsd,bhtd->bhst", q.astype(jnp.float32), kf) \
        * d ** -0.5
    if causal:
        mask = jnp.arange(s)[None, :] <= jnp.arange(s)[:, None]
        sc = jnp.where(mask, sc, -1e30)
    return jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(sc, -1), vf)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [1, 2])
def test_ring_matches_single_device(devices8, causal, kvh):
    mesh = make_mesh(dp=1, tp=8, devices=devices8)
    b, h, s, d = 2, 4, 256, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, kvh, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, kvh, s, d), jnp.bfloat16)
    got = ring_attention(q, k, v, mesh, axis="tp", causal=causal)
    ref = _ref(q, k.astype(jnp.float32), v.astype(jnp.float32), causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_ring_memory_is_sharded(devices8):
    """The point of the ring: per-device arrays are S/n long (the
    sharding spec shards the sequence dim, so the context window scales
    with the ring size)."""
    mesh = make_mesh(dp=1, tp=8, devices=devices8)
    b, h, s, d = 1, 2, 512, 64
    q = jnp.ones((b, h, s, d), jnp.float32)
    k = jnp.ones((b, 1, s, d), jnp.bfloat16)
    v = jnp.ones((b, 1, s, d), jnp.bfloat16)
    out = ring_attention(q, k, v, mesh, axis="tp", causal=True)
    assert out.shape == (b, h, s, d)
    # uniform values: every softmax row averages identical V rows
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=0, atol=1e-2)


def test_ring_grads_match_reference(devices8):
    """SP composes with training: the flash ring's custom VJP must give
    the single-device autodiff gradients (dq, dk, dv through a scalar
    loss), including GQA shards rotating home."""
    mesh = make_mesh(dp=1, tp=8, devices=devices8)
    b, h, s, d = 1, 4, 256, 64
    kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, 2, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, 2, s, d), jnp.float32)
    w = jax.random.normal(kw, (b, h, s, d), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, axis="tp",
                                      causal=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, True) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=0, atol=5e-2, err_msg=name)


def test_ring_eager_fallback_small_head(devices8):
    """d=32 is outside the flash kernels' lane widths — the einsum
    fallback must still match the reference."""
    mesh = make_mesh(dp=1, tp=8, devices=devices8)
    b, h, s, d = 1, 2, 128, 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, 2, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, 2, s, d), jnp.float32)
    got = ring_attention(q, k, v, mesh, axis="tp", causal=True)
    ref = _ref(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)
