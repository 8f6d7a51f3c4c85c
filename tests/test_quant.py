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


def test_packed_byte_value_identity():
    """The pack format contract the pack-algebra kernels rely on: the
    int8 byte VALUE is exactly 16*hi + (lo + 8)."""
    q = jax.random.randint(jax.random.PRNGKey(4), (512, 128), -7, 8,
                           dtype=jnp.int8)
    packed = np.asarray(quant.pack_int4(q, 512), np.int32)
    lo = np.asarray(q[:256], np.int32)
    hi = np.asarray(q[256:], np.int32)
    np.testing.assert_array_equal(packed, 16 * hi + (lo + 8))


def test_gemv_pack_algebra_matches_decode_path():
    """Decode-free GEMV kernels == VPU-decode kernels (W4A8 bit-exact;
    W4A16 to fp32 add-order noise)."""
    from how_to_optimize_gemm_tpu.ops import pallas_int4

    a = jax.random.normal(jax.random.PRNGKey(3), (8, 1024), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(9), (1024, 640), jnp.float32)
    a16, packed, sw, _ = pallas_int4.prepare(a, b)
    y_fast = pallas_int4.mmult_q_noc(a16, packed, sw, fast=True)
    y_slow = pallas_int4.mmult_q_noc(a16, packed, sw, fast=False)
    rel = float(jnp.max(jnp.abs(y_fast - y_slow))
                / jnp.max(jnp.abs(y_slow)))
    assert rel < 1e-6, rel

    qa, sa, packed8, sw8, _ = pallas_int4.prepare_w4a8(a, b)
    y_fast = pallas_int4.mmult_q_w4a8_noc(qa, sa, packed8, sw8, fast=True)
    y_slow = pallas_int4.mmult_q_w4a8_noc(qa, sa, packed8, sw8,
                                          fast=False)
    assert jnp.array_equal(y_fast, y_slow)


def test_w4a8_fused_quant_gemv_matches_separate():
    """The fused-activation-quant GEMV (in-kernel absmax/round/clip)
    is numerically identical to quantize_symmetric + the separate
    kernel — same ops, same order."""
    import jax
    import jax.numpy as jnp

    from how_to_optimize_gemm_tpu.ops import bounds, pallas_int4, quant
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1024), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (1024, 384),
                          jnp.float32)
    qa, sa = quant.quantize_symmetric(x, axis=1)
    wp = bounds.pad_dim(w, 0, 512)
    qw, sw = quant.quantize_symmetric(wp, axis=0, bits=4)
    packed = quant.pack_int4(qw, 512)
    ref = pallas_int4.mmult_q_w4a8_noc(qa, sa, packed, sw)
    got = pallas_int4.mmult_w4a8_fused_noc(x, packed, sw)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-5
