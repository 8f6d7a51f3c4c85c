"""Optax training loop: loss decreases, quantized leaves stay frozen,
dp+tp sharded step runs on the virtual mesh, checkpoints round-trip."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from how_to_optimize_gemm_tpu.models import checkpoint, llama
from how_to_optimize_gemm_tpu.parallel import training
from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh

CFG = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=64, max_seq=32,
                        weight_kind="fp32")


def _batches(key, batch, seq):
    # one FIXED batch, repeated: the loss-decreases assertion is an
    # overfitting check, not an SGD-on-noise coin flip
    tokens = jax.random.randint(key, (batch, seq), 0, CFG.vocab)
    return itertools.repeat(tokens)


def test_loss_decreases_and_resumes(tmp_path):
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    it = _batches(jax.random.PRNGKey(1), 4, 16)
    state, losses = training.train(
        CFG, params, it, n_steps=8, lr=1e-2,
        checkpoint_dir=str(tmp_path), checkpoint_every=4)
    assert losses[-1] < losses[0]
    # full-state resume from the step-4 snapshot must land bit-exactly
    # on the uninterrupted step-8 state (optimizer moments included)
    params2 = llama.init_params(jax.random.PRNGKey(0), CFG)
    it2 = _batches(jax.random.PRNGKey(1), 4, 16)
    state2, losses2 = training.train(
        CFG, params2, it2, n_steps=8, lr=1e-2,
        resume_from=str(tmp_path / "step_000004"))
    assert state2.step == 8 and len(losses2) == 4
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_leaves_frozen():
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=1, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=32,
                            weight_kind="int8")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    before = np.asarray(params["layers"][0]["wq"]["int8_qw"])
    opt = training.make_optimizer(1e-2)
    state = training.init_train_state(params, opt)
    step, _ = training.make_train_step(cfg, opt)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab)
    state, _ = step(state, tokens)
    after = np.asarray(state.params["layers"][0]["wq"]["int8_qw"])
    np.testing.assert_array_equal(before, after)
    # float leaves did move
    assert not np.array_equal(
        np.asarray(params["embed"]), np.asarray(state.params["embed"]))


def test_sharded_step_with_remat(devices8):
    mesh = make_mesh(dp=2, tp=4, devices=devices8)
    cfg = llama.LlamaConfig(vocab=64, d_model=16 * 4, n_layers=2,
                            n_heads=4, n_kv_heads=4, d_ff=32 * 4,
                            max_seq=32, weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    opt = training.make_optimizer(1e-2)
    state = training.init_train_state(params, opt, mesh)
    step, tok_sh = training.make_train_step(cfg, opt, mesh, remat=True)
    tokens = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab),
        tok_sh)
    state, loss = step(state, tokens)
    assert jnp.isfinite(loss)


def test_bf16_weights_actually_train():
    """Regression for the dtype.kind=='V' trap: bfloat16 leaves must be
    in the trainable set (a kind=='f' check silently froze them)."""
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=1, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=32,
                            weight_kind="bf16")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    before = np.asarray(params["layers"][0]["wq"]["bf16_w"],
                        dtype=np.float32)
    opt = training.make_optimizer(1e-2)
    state = training.init_train_state(params, opt)
    step, _ = training.make_train_step(cfg, opt)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab)
    state, _ = step(state, tokens)
    after = np.asarray(state.params["layers"][0]["wq"]["bf16_w"],
                       dtype=np.float32)
    assert not np.array_equal(before, after)


def test_sgd_and_sharded_step_handle_quantized_params(devices8):
    """value_and_grad over trees with int leaves is a hard TypeError —
    both train steps must differentiate the float subset only."""
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh
    from how_to_optimize_gemm_tpu.parallel.sharding import (
        make_sharded_train_step, shard_params)

    cfg = llama.LlamaConfig(vocab=64, d_model=16 * 4, n_layers=1,
                            n_heads=4, n_kv_heads=4, d_ff=32 * 4,
                            max_seq=32, weight_kind="int8")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab)
    _, loss = llama.sgd_train_step(params, cfg, tokens)
    assert jnp.isfinite(loss)

    mesh = make_mesh(dp=2, tp=4, devices=devices8)
    sp = shard_params(params, mesh)
    step, tok_sh = make_sharded_train_step(cfg, mesh)
    toks = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, cfg.vocab),
        tok_sh)
    _, loss = step(sp, toks)
    assert jnp.isfinite(loss)


def test_w4a8_params_shardable(devices8):
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh
    from how_to_optimize_gemm_tpu.parallel.sharding import shard_params

    cfg = llama.LlamaConfig(vocab=64, d_model=16 * 4, n_layers=1,
                            n_heads=4, n_kv_heads=4, d_ff=32 * 4,
                            max_seq=32, weight_kind="w4a8")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=2, tp=4, devices=devices8)
    shard_params(params, mesh)  # KeyError before the w4a8 spec entries


def test_requantize_crops_padded_k():
    """requantize must crop int4/w4a8 pack padding back to true d_in
    (K=11008-class dims round to 512 at pack time)."""
    cfg = llama.LlamaConfig(vocab=32, d_model=32, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=72,  # not a 512 multiple
                            max_seq=16, weight_kind="int4")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    back = llama.requantize(params, "bf16")
    # w_down: (d_ff, d_model) — d_in must be cropped back to 72
    assert back["layers"][0]["w_down"]["bf16_w"].shape[0] == 72
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0,
                                cfg.vocab)
    out = llama.forward(back, cfg, tokens, use_pallas=False)
    assert jnp.all(jnp.isfinite(out))
