"""Quantization transforms: chgemm semantics and int4 pack/unpack."""
import jax
import jax.numpy as jnp
import numpy as np

from how_to_optimize_gemm_tpu.ops import quant


def test_int8_range_symmetric():
    """chgemm contract: values in [-127, 127], never -128
    (reference README.md:79-85)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 100
    q, scale = quant.quantize_symmetric(x, axis=None)
    assert int(q.min()) >= -127 and int(q.max()) <= 127
    # scale reconstructs the max magnitude
    rec = quant.dequantize(q, scale)
    assert float(jnp.max(jnp.abs(x - rec))) <= float(scale) * 0.5 + 1e-6


def test_int4_range():
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 32))
    q, _ = quant.quantize_symmetric(x, axis=0, bits=4)
    assert int(q.min()) >= -7 and int(q.max()) <= 7


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(2)
    q = jax.random.randint(key, (1024, 256), -7, 8, dtype=jnp.int8)
    for bk in (128, 512):
        packed = quant.pack_int4(q, bk)
        assert packed.shape == (512, 256)
        un = quant.unpack_int4(packed, bk)
        np.testing.assert_array_equal(np.asarray(un), np.asarray(q))


def test_per_axis_scales_shapes():
    x = jax.random.normal(jax.random.PRNGKey(3), (48, 96))
    _, s_row = quant.quantize_symmetric(x, axis=1)
    _, s_col = quant.quantize_symmetric(x, axis=0)
    assert s_row.shape == (48, 1)
    assert s_col.shape == (1, 96)
