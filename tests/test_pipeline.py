"""Pipeline parallelism vs serial composition (forward AND gradients)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.parallel.mesh import make_axis_mesh
from how_to_optimize_gemm_tpu.parallel.pipeline import (
    llama_pp_forward, pipeline_apply, stack_stages)


def _mlp_stage(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make_stages(key, pp, d):
    stages = []
    for k in jax.random.split(key, pp):
        kw, kb = jax.random.split(k)
        stages.append({
            "w": jax.random.normal(kw, (d, d), jnp.float32) / d ** 0.5,
            "b": jax.random.normal(kb, (d,), jnp.float32) * 0.1,
        })
    return stages


def _serial(stages, x):
    for p in stages:
        x = _mlp_stage(p, x)
    return x


@pytest.mark.parametrize("pp,n_micro", [(4, 2), (4, 8), (8, 4)])
def test_pipeline_matches_serial(devices8, pp, n_micro):
    mesh = make_axis_mesh(devices=devices8[:pp], pp=pp)
    d, b = 16, 16
    stages = _make_stages(jax.random.PRNGKey(0), pp, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)
    got = pipeline_apply(_mlp_stage, stack_stages(stages), x, mesh,
                         n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_serial(stages, x)),
                               rtol=0, atol=1e-6)


def test_pipeline_gradients_match_serial(devices8):
    """The GPipe schedule is differentiable and exact: masked bubble
    writes carry zero cotangent."""
    pp, d, b, n_micro = 4, 8, 8, 4
    mesh = make_axis_mesh(devices=devices8[:pp], pp=pp)
    stages = _make_stages(jax.random.PRNGKey(2), pp, d)
    stacked = stack_stages(stages)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, d), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(4), (b, d), jnp.float32)

    def loss_pp(stacked, x):
        y = pipeline_apply(_mlp_stage, stacked, x, mesh,
                           n_micro=n_micro)
        return jnp.mean((y - tgt) ** 2)

    def loss_serial(stacked, x):
        y = _serial([jax.tree.map(lambda p: p[s], stacked)
                     for s in range(pp)], x)
        return jnp.mean((y - tgt) ** 2)

    (lp, gp), (ls, gs) = (jax.value_and_grad(f, argnums=(0, 1))(stacked, x)
                          for f in (loss_pp, loss_serial))
    # value_and_grad(argnums=(0,1)) returns (loss, (g_params, g_x))
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=0, atol=1e-6)


def test_llama_pp_forward_matches_dense(devices8):
    from how_to_optimize_gemm_tpu.models import llama
    pp = 4
    mesh = make_axis_mesh(devices=devices8[:pp], pp=pp)
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=8, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=16,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                cfg.vocab)
    got = llama_pp_forward(params, cfg, tokens, mesh, n_micro=2)
    ref = llama.forward(params, cfg, tokens, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_pipeline_rejects_bad_microbatching(devices8):
    mesh = make_axis_mesh(devices=devices8[:4], pp=4)
    stages = _make_stages(jax.random.PRNGKey(5), 4, 8)
    x = jnp.zeros((6, 8), jnp.float32)
    with pytest.raises(AssertionError):
        pipeline_apply(_mlp_stage, stack_stages(stages), x, mesh,
                       n_micro=4)


def test_llama_pp_forward_moe(devices8):
    """PP composes with the MoE family: stage stacking works on the
    routed-MLP layer dicts too."""
    from how_to_optimize_gemm_tpu.models import llama
    pp = 4
    mesh = make_axis_mesh(devices=devices8[:pp], pp=pp)
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=4, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=16,
                            weight_kind="fp32", n_experts=4)
    params = llama.init_params(jax.random.PRNGKey(6), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (4, 16), 0,
                                cfg.vocab)
    got = llama_pp_forward(params, cfg, tokens, mesh, n_micro=2)
    ref = llama.forward(params, cfg, tokens, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_pp_train_step_matches_single_device(devices8):
    """The library PP train step lands on the same loss and params as
    the single-device SGD step (exact GPipe gradients)."""
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.pipeline import (
        make_pp_train_step)
    pp = 4
    mesh = make_axis_mesh(devices=devices8[:pp], pp=pp)
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=4, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=16,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                cfg.vocab)
    step = make_pp_train_step(cfg, mesh, n_micro=2, lr=1e-2)
    new_pp, loss_pp = step(params, tokens)
    new_sd, loss_sd = llama.sgd_train_step(params, cfg, tokens, lr=1e-2)
    np.testing.assert_allclose(float(loss_pp), float(loss_sd), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_pp), jax.tree.leaves(new_sd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_pp_train_step_moe_includes_aux(devices8):
    """MoE configs train through PP WITH the load-balance aux: the PP
    loss/updates equal the microbatch-mean of single-device losses
    (loss_fn includes cfg.moe_aux_weight * aux; routing is per chunk,
    and each microbatch is one chunk here, so the equality is exact)."""
    import dataclasses
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.pipeline import (
        make_pp_train_step)
    from how_to_optimize_gemm_tpu.parallel.training import (
        sgd_update, split_trainable)
    pp, n_micro = 4, 2
    mesh = make_axis_mesh(devices=devices8[:pp], pp=pp)
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=4, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=16,
                            weight_kind="fp32", n_experts=4,
                            moe_aux_weight=0.05)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                cfg.vocab)
    step = make_pp_train_step(cfg, mesh, n_micro=n_micro, lr=1e-2)
    new_pp, loss_pp = step(params, tokens)

    mb = tokens.shape[0] // n_micro
    all_leaves = jax.tree.leaves(params)
    floats, rebuild = split_trainable(params)

    def ref_loss(floats):
        p = rebuild(floats, all_leaves)
        return jnp.mean(jnp.stack(
            [llama.loss_fn(p, cfg, tokens[i * mb:(i + 1) * mb])
             for i in range(n_micro)]))

    loss_ref, grads = jax.value_and_grad(ref_loss)(floats)
    new_ref = rebuild(sgd_update(floats, grads, 1e-2), all_leaves)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_pp), jax.tree.leaves(new_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)
    # the aux really is in the loss: zeroing its weight changes it
    cfg0 = dataclasses.replace(cfg, moe_aux_weight=0.0)
    _, loss0 = make_pp_train_step(cfg0, mesh, n_micro=n_micro,
                                  lr=1e-2)(params, tokens)
    assert float(loss_pp) > float(loss0)
