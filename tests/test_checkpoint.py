"""Checkpoint roundtrip across weight formats."""
import jax
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import checkpoint, llama

CFG = llama.LlamaConfig(vocab=32, d_model=32, n_layers=1, n_heads=2,
                        n_kv_heads=1, d_ff=64, max_seq=16,
                        weight_kind="fp32")


@pytest.mark.parametrize("kind", ["fp32", "bf16", "int8", "int4"])
def test_roundtrip(tmp_path, kind):
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    params = llama.requantize(params, kind)
    path = tmp_path / f"ckpt_{kind}.npz"
    checkpoint.save_params(path, params)
    restored = checkpoint.load_params(path, params)
    flat_a = checkpoint._flatten(params)
    flat_b = checkpoint._flatten(restored)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_mismatch_raises(tmp_path):
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    path = tmp_path / "ckpt.npz"
    checkpoint.save_params(path, params)
    other = llama.init_params(
        jax.random.PRNGKey(0),
        llama.LlamaConfig(vocab=32, d_model=64, n_layers=1, n_heads=2,
                          n_kv_heads=1, d_ff=64, max_seq=16))
    with pytest.raises((ValueError, KeyError)):
        checkpoint.load_params(path, other)


def test_quantized_inference_after_restore(tmp_path):
    import jax.numpy as jnp
    params = llama.requantize(
        llama.init_params(jax.random.PRNGKey(1), CFG), "int8")
    path = tmp_path / "c.npz"
    checkpoint.save_params(path, params)
    restored = checkpoint.load_params(path, params)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 4), 0, CFG.vocab)
    a = llama.forward(params, CFG, tokens, use_pallas=False)
    b = llama.forward(restored, CFG, tokens, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_restore_preserves_placement(devices8, tmp_path):
    """A resumed dp/tp run must come back with the template's
    shardings, not defaulted to one device."""
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh
    from how_to_optimize_gemm_tpu.parallel.sharding import shard_params

    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=1, n_heads=4,
                            n_kv_heads=4, d_ff=64, max_seq=16,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=2, tp=4, devices=devices8)
    sharded = shard_params(params, mesh)
    path = tmp_path / "sharded"
    checkpoint.save_params(path, sharded)
    restored = checkpoint.load_params(path, sharded)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(sharded)):
        assert a.sharding == b.sharding, (a.sharding, b.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
