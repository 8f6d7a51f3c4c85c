"""Expert-parallel MoE vs the dense per-token reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.parallel.mesh import make_axis_mesh
from how_to_optimize_gemm_tpu.parallel.moe import (
    init_moe_params, moe_ffn, moe_ffn_dense)


def _setup(key=0, t=64, d=16, f=32, e=8):
    params = init_moe_params(jax.random.PRNGKey(key), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(key + 1), (t, d),
                          jnp.float32)
    return params, x


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("ep", [4, 8])
def test_moe_matches_dense_at_no_drop_capacity(devices8, k, ep):
    mesh = make_axis_mesh(devices=devices8[:ep], ep=ep)
    params, x = _setup()
    # cf >= E/k makes capacity >= T_local: nothing can drop
    got = moe_ffn(params, x, mesh, k=k, capacity_factor=8.0 / k)
    ref = moe_ffn_dense(params, x, k=k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_moe_drops_at_tiny_capacity(devices8):
    """Fixed-capacity semantics: overflow tokens lose that expert's
    contribution (finite output, strictly different from dense)."""
    mesh = make_axis_mesh(devices=devices8, ep=8)
    params, x = _setup(t=128)
    got = moe_ffn(params, x, mesh, k=2, capacity_factor=0.25)
    ref = moe_ffn_dense(params, x, k=2)
    assert bool(jnp.isfinite(got).all())
    assert not np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_moe_aux_loss_and_gradients(devices8):
    mesh = make_axis_mesh(devices=devices8, ep=8)
    params, x = _setup()

    def loss(params):
        y, aux = moe_ffn(params, x, mesh, k=2, capacity_factor=4.0,
                         return_aux=True)
        return jnp.mean(y ** 2) + 0.01 * aux, aux

    (val, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(val)) and float(aux) >= 1.0 - 1e-5
    for g in jax.tree.leaves(grads):
        assert bool(jnp.isfinite(g).all())
    # router must receive gradient through the gate weights
    assert float(jnp.abs(grads["router"]).max()) > 0


def test_route_first_choice_priority():
    """When capacity is scarce, a token's PRIMARY expert keeps it in
    preference to tokens that only chose that expert second: token 0
    second-prefers e1, token 1 first-prefers e1, capacity 1 — token 1
    must win the slot."""
    from how_to_optimize_gemm_tpu.parallel.moe import _route
    logits = jnp.array([[5.0, 4.0, 0.0],    # t0: choices (e0, e1)
                        [0.0, 5.0, 4.0]])   # t1: choices (e1, e2)
    disp, comb, _ = _route(logits, k=2, capacity=1)
    assert float(disp[1, 1, 0]) == 1.0      # t1 keeps its first choice
    assert float(disp[0, 1].sum()) == 0.0   # t0's SECOND choice dropped
    assert float(disp[0, 0, 0]) == 1.0      # t0 keeps ITS first choice
    assert float(disp[1, 2, 0]) == 1.0      # t1's second fits e2
    # gates follow dispatch: t0 lost its e1 gate weight
    assert float(comb[0, 1].sum()) == 0.0
    assert float(comb[1, 1, 0]) > 0.5


def test_moe_bf16_activations(devices8):
    """bf16 tokens stay bf16 across the all_to_alls (half the ICI
    bytes) and still track the fp32 dense oracle."""
    mesh = make_axis_mesh(devices=devices8, ep=8)
    params, x = _setup()
    xb = x.astype(jnp.bfloat16)
    got = moe_ffn(params, xb, mesh, k=2, capacity_factor=4.0)
    assert got.dtype == jnp.bfloat16
    ref = moe_ffn_dense(params, x, k=2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0, atol=0.15)


def test_moe_local_matches_ep_mesh_swiglu(devices8):
    """The single-device routed path (what models/llama uses) and the
    expert-parallel path compute the same function when nothing drops —
    with SwiGLU experts (the Mixtral shape)."""
    from how_to_optimize_gemm_tpu.parallel.moe import moe_ffn_local
    mesh = make_axis_mesh(devices=devices8, ep=8)
    params = init_moe_params(jax.random.PRNGKey(11), 16, 32, 8,
                             swiglu=True)
    x = jax.random.normal(jax.random.PRNGKey(12), (64, 16), jnp.float32)
    # no-drop capacity both sides: cf = E/k
    got_ep = moe_ffn(params, x, mesh, k=2, capacity_factor=4.0)
    got_local = moe_ffn_local(params, x, k=2, capacity_factor=4.0)
    ref = moe_ffn_dense(params, x, k=2)
    np.testing.assert_allclose(np.asarray(got_local), np.asarray(ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ep), np.asarray(got_local),
                               rtol=0, atol=1e-5)


def test_moe_local_chunked_matches_dense():
    """Chunked routing (memory linear in T, incl. a padded tail chunk)
    equals the dense oracle at no-drop capacity."""
    from how_to_optimize_gemm_tpu.parallel.moe import moe_ffn_local
    params = init_moe_params(jax.random.PRNGKey(21), 16, 32, 8,
                             swiglu=True)
    x = jax.random.normal(jax.random.PRNGKey(22), (600, 16), jnp.float32)
    got = moe_ffn_local(params, x, k=2, capacity_factor=4.0, chunk=256)
    ref = moe_ffn_dense(params, x, k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_moe_local_routing_independent_of_cobatch():
    """At no-drop capacity a token's output cannot depend on which
    other tokens share its dispatch (the serving determinism the llama
    family defaults to)."""
    from how_to_optimize_gemm_tpu.parallel.moe import moe_ffn_local
    params = init_moe_params(jax.random.PRNGKey(23), 16, 32, 8,
                             swiglu=True)
    mine = jax.random.normal(jax.random.PRNGKey(24), (8, 16), jnp.float32)
    other_a = jax.random.normal(jax.random.PRNGKey(25), (120, 16))
    other_b = jnp.zeros((120, 16), jnp.float32)
    cf = 4.0  # E/k: no drops possible
    ya = moe_ffn_local(params, jnp.concatenate([mine, other_a]), k=2,
                       capacity_factor=cf, chunk=128)[:8]
    yb = moe_ffn_local(params, jnp.concatenate([mine, other_b]), k=2,
                       capacity_factor=cf, chunk=128)[:8]
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=0, atol=1e-6)


def test_moe_ep_chunked_long_shard(devices8):
    """The EP path routes per chunk: a long token shard (multiple
    chunks + padded tail) still equals the dense oracle at no-drop
    capacity, with bounded dispatch buffers."""
    mesh = make_axis_mesh(devices=devices8, ep=8)
    params = init_moe_params(jax.random.PRNGKey(41), 16, 32, 8,
                             swiglu=True)
    # T_local = 72 with chunk=32 -> 3 chunks, last one padded
    x = jax.random.normal(jax.random.PRNGKey(42), (576, 16), jnp.float32)
    got = moe_ffn(params, x, mesh, k=2, capacity_factor=4.0, chunk=32)
    ref = moe_ffn_dense(params, x, k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_moe_ep_quantized_stacks(devices8):
    """EP sharding composes with quantized expert stacks (int8 and
    nibble-packed int4): equality vs the dense oracle on the
    dequantized weights."""
    from how_to_optimize_gemm_tpu.parallel.moe import (
        dequantize_moe, quantize_moe)
    mesh = make_axis_mesh(devices=devices8, ep=8)
    params = init_moe_params(jax.random.PRNGKey(61), 16, 32, 8,
                             swiglu=True)
    x = jax.random.normal(jax.random.PRNGKey(62), (64, 16), jnp.float32)
    for bits in (8, 4):
        q = quantize_moe(params, bits=bits)
        got = moe_ffn(q, x, mesh, k=2, capacity_factor=4.0)
        ref = moe_ffn_dense(dequantize_moe(q), x, k=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5, err_msg=str(bits))
