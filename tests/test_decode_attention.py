"""Length-aware decode attention vs the eager masked reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models.llama import _attention
from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
    decode_attention)


@pytest.mark.parametrize("lens", [[1, 7, 64, 33], [64, 64, 64, 64],
                                  [5, 1, 2, 3]])
def test_matches_eager_masked(lens):
    b, t, h, kvh, d = 4, 64, 8, 2, 64
    key = jax.random.PRNGKey(sum(lens))
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray(lens, jnp.int32)

    # eager reference: (B,1,H,D) query over the full time-major cache
    # with the per-slot validity mask the decode path uses (llama._block)
    valid = (jnp.arange(t)[None, None, :]
             < lengths[:, None, None])            # (B,1,T)
    ref = _attention(q[:, None], k_cache, v_cache, valid)[:, 0]

    got = decode_attention(q, k_cache, v_cache, lengths, bk=32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_block_size_invariance():
    b, t, h, kvh, d = 2, 128, 4, 2, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(key, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(jax.random.split(key)[0],
                                (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray([100, 17], jnp.int32)
    a = decode_attention(q, k_cache, v_cache, lengths, bk=128,
                         interpret=True)
    bb = decode_attention(q, k_cache, v_cache, lengths, bk=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=0,
                               atol=2e-2)


def test_kv8_kernel_matches_eager_kv8():
    from how_to_optimize_gemm_tpu.models.llama import (_attention_kv8,
                                                       quantize_kv)
    from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
        decode_attention_q8)

    b, t, h, kvh, d = 2, 64, 4, 2, 64
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (b, h, d), jnp.float32)
    k = jax.random.normal(jax.random.split(key)[0], (b, t, kvh, d))
    v = jax.random.normal(jax.random.split(key)[1], (b, t, kvh, d))
    qk, sk = quantize_kv(k)
    qv, sv = quantize_kv(v)
    pad = ((0, 0), (0, 0), (0, 128 - kvh))
    sk = jnp.pad(sk, pad)
    sv = jnp.pad(sv, pad)
    lengths = jnp.asarray([37, 9], jnp.int32)
    valid = (jnp.arange(t)[None, None, :] < lengths[:, None, None])
    ref = _attention_kv8(q[:, None], qk, sk, qv, sv, valid)[:, 0]
    got = decode_attention_q8(q, qk, sk, qv, sv, lengths, bk=32,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_dh64_pairing_matches_dh128_structure():
    """dh=64 with even kvh routes through the head-pairing cache view;
    the result must match the eager masked reference exactly like the
    dh=128 path (round 2 — removes the dh=64 eager fallback)."""
    from how_to_optimize_gemm_tpu.models.llama import _route_decode

    assert _route_decode(True, 4096, 128, 32)
    assert _route_decode(True, 4096, 64, 4)
    assert not _route_decode(True, 4096, 64, 3)   # odd kvh -> eager
    # cost threshold (measured): routing follows CACHE BYTES read per
    # step — small caches decode eagerly, big ones (wide MHA, long T,
    # large batch) route paged. KV8 eager reads HALF the bytes
    # (_attention_kv8 folds scales into int8 einsums), so its bytes
    # count at 1 B/elt against the same ~24 MB crossover.
    assert not _route_decode(True, 2048, 64, 4, batch=8)   # 16.8 MB
    assert _route_decode(True, 4096, 64, 4, batch=8)       # 33.5 MB
    assert _route_decode(True, 2048, 128, 32, batch=2)     # 7B: 67 MB
    assert not _route_decode(True, 2048, 64, 4, batch=8, kv8=True)  # 8.4
    assert _route_decode(True, 8192, 64, 4, batch=8, kv8=True)      # 33.5

    b, t, h, kvh, d = 2, 128, 8, 4, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray([37, 128], jnp.int32)
    valid = jnp.arange(t)[None, None, :] < lengths[:, None, None]
    ref = _attention(q[:, None], k_cache, v_cache, valid)[:, 0]
    got = decode_attention(q, k_cache, v_cache, lengths, bk=32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


@pytest.mark.parametrize("h,kvh", [(20, 20), (36, 18)])
def test_wide_dh64_head_pairing_matches_eager(h, kvh):
    """Wide dh=64 (kvh*dh > 1024) routes through the v3 head-pairing
    path (round 2: the last eager-only decode width removed): the
    cache's two adjacent 64-lane heads become one 128-lane row and
    each query is zero-extended into its half-lane band — both MHA
    (rep=1) and GQA (rep=2) groupings must match eager exactly."""
    b, t, d = 2, 128, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(h), 3)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray([77, 128], jnp.int32)
    valid = jnp.arange(t)[None, None, :] < lengths[:, None, None]
    ref = _attention(q[:, None], k_cache, v_cache, valid)[:, 0]
    got = decode_attention(q, k_cache, v_cache, lengths, bk=64,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_wide_dh64_head_pairing_kv8_matches_eager():
    """KV8 wide dh=64: the paired kernel must read each original
    head's scale lane (2g / 2g+1) per pair row-half — a single pair
    scale would silently blend adjacent heads' quantization scales."""
    from how_to_optimize_gemm_tpu.models.llama import (_attention_kv8,
                                                       quantize_kv)
    from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
        decode_attention_q8)

    b, t, h, kvh, d = 2, 128, 20, 20, 64
    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (b, h, d), jnp.float32)
    # distinct per-head magnitudes so blended scales would show up
    mags = (jnp.arange(kvh, dtype=jnp.float32) + 1.0)[None, None, :,
                                                      None]
    k = jax.random.normal(jax.random.split(key)[0],
                          (b, t, kvh, d)) * mags
    v = jax.random.normal(jax.random.split(key)[1],
                          (b, t, kvh, d)) * mags
    qk, sk = quantize_kv(k)
    qv, sv = quantize_kv(v)
    pad = ((0, 0), (0, 0), (0, 128 - kvh))
    sk = jnp.pad(sk, pad)
    sv = jnp.pad(sv, pad)
    lengths = jnp.asarray([54, 128], jnp.int32)
    valid = jnp.arange(t)[None, None, :] < lengths[:, None, None]
    ref = _attention_kv8(q[:, None], qk, sk, qv, sv, valid)[:, 0]
    got = decode_attention_q8(q, qk, sk, qv, sv, lengths, bk=64,
                              interpret=True)
    scale = np.max(np.abs(np.asarray(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale,
                               rtol=0, atol=3e-2)
