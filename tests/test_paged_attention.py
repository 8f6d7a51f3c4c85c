"""Paged (block-table) decode attention vs the contiguous kernels/eager."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models.llama import _attention
from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
    decode_attention)
from how_to_optimize_gemm_tpu.ops.pallas_paged_attention import (
    gather_paged, good_page_size, paged_decode_attention)


def _scatter_to_pool(key, k_cache, v_cache, n_pages, ps):
    """Place a contiguous (B, T, KVH, D) cache into a page pool through
    a RANDOM page assignment (the adversarial layout: physical order is
    unrelated to logical order). Returns pools + table."""
    b, t, kvh, d = k_cache.shape
    np_max = t // ps
    perm = np.asarray(jax.random.permutation(key, n_pages - 1)) + 1
    table = np.zeros((b, np_max), np.int32)
    k_pool = np.zeros((n_pages, ps, kvh, d), k_cache.dtype)
    v_pool = np.zeros((n_pages, ps, kvh, d), v_cache.dtype)
    i = 0
    for s in range(b):
        for c in range(np_max):
            page = int(perm[i]); i += 1
            table[s, c] = page
            k_pool[page] = np.asarray(k_cache[s, c * ps:(c + 1) * ps])
            v_pool[page] = np.asarray(v_cache[s, c * ps:(c + 1) * ps])
    return (jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(table))


@pytest.mark.parametrize("h,kvh,d,lens", [
    (8, 2, 64, [1, 7, 64, 33]),          # GQA fused-head v4 path
    (4, 4, 64, [64, 64, 64, 64]),        # MHA narrow
])
def test_paged_matches_contiguous(h, kvh, d, lens):
    b, t, ps = 4, 64, 16
    key = jax.random.PRNGKey(sum(lens) + h)
    kq, kk, kv, kp = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray(lens, jnp.int32)
    n_pages = b * (t // ps) + 3
    k_pool, v_pool, table = _scatter_to_pool(kp, k_cache, v_cache,
                                             n_pages, ps)

    ref = decode_attention(q, k_cache, v_cache, lengths, bk=ps,
                           interpret=True)
    got = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_paged_wide_mha_v3_path():
    # kvh*d > 1024 routes to the per-slot v3-paged kernel (7B shape
    # family, shrunk: kvh=16 x d=128 = 2048 lanes)
    b, t, ps, h, kvh, d = 2, 32, 8, 16, 16, 128
    key = jax.random.PRNGKey(9)
    kq, kk, kv, kp = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray([30, 9], jnp.int32)
    k_pool, v_pool, table = _scatter_to_pool(kp, k_cache, v_cache,
                                             b * (t // ps) + 2, ps)
    valid = (jnp.arange(t)[None, None, :] < lengths[:, None, None])
    ref = _attention(q[:, None], k_cache, v_cache, valid)[:, 0]
    got = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_paged_wide_dh64_pairing():
    # wide dh=64 MHA (kvh*d > 1024, d=64): head-pairing pool view
    b, t, ps, h, kvh, d = 2, 32, 8, 32, 32, 64
    key = jax.random.PRNGKey(11)
    kq, kk, kv, kp = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k_cache = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v_cache = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    lengths = jnp.asarray([25, 13], jnp.int32)
    k_pool, v_pool, table = _scatter_to_pool(kp, k_cache, v_cache,
                                             b * (t // ps) + 2, ps)
    valid = (jnp.arange(t)[None, None, :] < lengths[:, None, None])
    ref = _attention(q[:, None], k_cache, v_cache, valid)[:, 0]
    got = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_gather_paged_roundtrip():
    b, t, ps, kvh, d = 3, 24, 8, 2, 64
    key = jax.random.PRNGKey(2)
    k_cache = jax.random.normal(key, (b, t, kvh, d), jnp.bfloat16)
    k_pool, _, table = _scatter_to_pool(
        jax.random.split(key)[0], k_cache, k_cache, b * (t // ps) + 2,
        ps)
    got = gather_paged(k_pool, table)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(k_cache))


def test_paged_q8_matches_contiguous_q8():
    from how_to_optimize_gemm_tpu.models.llama import quantize_kv
    from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
        decode_attention_q8)
    from how_to_optimize_gemm_tpu.ops.pallas_paged_attention import (
        paged_decode_attention_q8)

    b, t, ps, h, kvh, d = 4, 64, 16, 8, 2, 64
    key = jax.random.PRNGKey(21)
    kq, kk, kv, kp = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, kvh, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, kvh, d), jnp.float32)
    qk, sk = quantize_kv(k)
    qv, sv = quantize_kv(v)
    sk = jnp.pad(sk, ((0, 0), (0, 0), (0, 128 - kvh)))
    sv = jnp.pad(sv, ((0, 0), (0, 0), (0, 128 - kvh)))
    lengths = jnp.asarray([1, 33, 64, 17], jnp.int32)
    ref = decode_attention_q8(q, qk, sk, qv, sv, lengths, bk=ps,
                              interpret=True)
    # scatter values AND scales into pools through one random table
    n_pages = b * (t // ps) + 2
    qk_pool, qv_pool, table = _scatter_to_pool(kp, qk, qv, n_pages, ps)
    sk_pool = np.zeros((n_pages, ps, 128), np.float32)
    sv_pool = np.zeros((n_pages, ps, 128), np.float32)
    tab = np.asarray(table)
    for s in range(b):
        for c in range(t // ps):
            sk_pool[tab[s, c]] = np.asarray(sk[s, c * ps:(c + 1) * ps])
            sv_pool[tab[s, c]] = np.asarray(sv[s, c * ps:(c + 1) * ps])
    got = paged_decode_attention_q8(
        q, qk_pool, jnp.asarray(sk_pool), qv_pool,
        jnp.asarray(sv_pool), table, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_good_page_size():
    assert good_page_size(2, 64) == 512          # small GQA: capped
    assert good_page_size(32, 128) == 128        # 7B wide-MHA: VMEM-bound
    assert good_page_size(32, 128, itemsize=1) == 384   # KV8: smaller elt
