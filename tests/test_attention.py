"""Flash attention vs the eager reference (interpret mode).

Oracle pattern of SURVEY.md §4: the streaming kernel is gated against the
trusted eager implementation (models/llama._attention) on every shape,
exactly as ladder rungs gate against the fp64 GEMM oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models.llama import _attention
from how_to_optimize_gemm_tpu.ops.pallas_attention import (
    flash_attention, mha_flash)


def _ref(q, k, v, causal):
    # model-layout eager reference: q (B,S,H,D), k/v (B,T,KVH,D)
    s, t = q.shape[1], k.shape[1]
    mask = None
    if causal:
        mask = jnp.arange(t)[None, :] <= jnp.arange(s)[:, None]
    return _attention(q.astype(jnp.float32), k, v, mask)


@pytest.mark.parametrize("shape", [
    (1, 64, 64, 4, 2, 64),     # B, S, T, H, KVH, D
    (2, 128, 128, 4, 4, 64),
    (1, 32, 32, 8, 2, 128),
])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_eager(shape, causal):
    b, s, t, h, kvh, d = shape
    key = jax.random.PRNGKey(hash((shape, causal)) % (2 ** 31))
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)

    ref = _ref(q, k, v, causal)
    got = mha_flash(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_flash_blocked_matches_single_block():
    # multi-block online softmax == single-block softmax
    b, h, s, d = 1, 2, 128, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.split(key)[0], (b, h, s, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.split(key)[1], (b, h, s, d),
                          jnp.bfloat16)
    one = flash_attention(q, k, v, causal=True, bq=128, bk=128,
                          interpret=True)
    multi = flash_attention(q, k, v, causal=True, bq=32, bk=32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(one, np.float32),
                               np.asarray(multi, np.float32),
                               rtol=0, atol=2e-2)


def _eager_for_grad(q, k, v):
    s, t = q.shape[2], k.shape[2]
    mask = jnp.arange(t)[None, :] <= jnp.arange(s)[:, None]
    # model-layout eager on transposed views
    qm = jnp.swapaxes(q, 1, 2)
    km = jnp.swapaxes(k, 1, 2)
    vm = jnp.swapaxes(v, 1, 2)
    out = _attention(qm.astype(jnp.float32), km, vm, mask)
    b, s2, h, d = qm.shape
    return jnp.swapaxes(out.reshape(b, s2, h, d), 1, 2)


def test_flash_train_grads_match_eager():
    from how_to_optimize_gemm_tpu.ops.pallas_attention import (
        flash_attention_train)

    b, h, kvh, s, d = 1, 4, 2, 128, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kw = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, kvh, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, kvh, s, d), jnp.float32)
    w = jax.random.normal(kw, (b, h, s, d), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention_train(q, k, v, True, 32, 32, True)
        return jnp.sum(out.astype(jnp.float32) * w)

    def loss_eager(q, k, v):
        return jnp.sum(_eager_for_grad(q, k, v) * w)

    lf, gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    le, ge = jax.value_and_grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-2)
    for a, bb, name in zip(gf, ge, "qkv"):
        scale = np.max(np.abs(np.asarray(bb))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(bb) / scale,
                                   rtol=0, atol=4e-2,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("s,causal", [(200, True), (200, False),
                                      (130, True), (640, True)])
def test_flash_train_odd_s_grads_match_eager(s, causal):
    """Round 2: odd-S TRAINING — mha_flash_train pads outside its
    custom VJP (autodiff delivers do == 0 for padded query rows) and
    masks padded key columns with t_real. Gradients must match eager
    autodiff exactly as in the block-divisible case. The non-causal
    case is the sharp one: without the t_real key mask, a padded
    zero-key scores 0 (not -inf) and corrupts every real row.
    s=640 exercises the least-waste chooser's NO-pad branch with a
    non-512 block (blk=128 divides 640 exactly)."""
    from how_to_optimize_gemm_tpu.ops.pallas_attention import (
        mha_flash_train)

    b, h, kvh, d = 1, 4, 2, 64
    key = jax.random.PRNGKey(s * 2 + causal)
    kq, kk, kv, kw = jax.random.split(key, 4)
    # model layout: (B, S, H, D)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, kvh, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, kvh, d), jnp.float32)
    w = jax.random.normal(kw, (b, s, h * d), jnp.float32)

    def eager(q, k, v):
        mask = (jnp.arange(s)[None, :] <= jnp.arange(s)[:, None]
                if causal else None)
        return _attention(q.astype(jnp.float32), k, v, mask)

    def loss_flash(q, k, v):
        return jnp.sum(mha_flash_train(q, k, v, causal=causal,
                                       interpret=True) * w)

    def loss_eager(q, k, v):
        return jnp.sum(eager(q, k, v) * w)

    lf, gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    le, ge = jax.value_and_grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-2)
    for a, bb, name in zip(gf, ge, "qkv"):
        scale = np.max(np.abs(np.asarray(bb))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(bb) / scale,
                                   rtol=0, atol=4e-2,
                                   err_msg=f"d{name} mismatch s={s}")


def test_flash_causal_with_history_prefix():
    """T > S: queries are the LAST S positions of a T-long context
    (chunked prefill against cached history) — the causal mask must
    offset query positions by T - S."""
    b, h, kvh, s, t, d = 1, 2, 2, 32, 64, 64
    key = jax.random.PRNGKey(9)
    q = jax.random.normal(key, (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.split(key)[0], (b, kvh, t, d),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.split(key)[1], (b, kvh, t, d),
                          jnp.bfloat16)
    # eager reference in model layout with the offset causal mask
    qm = jnp.swapaxes(q, 1, 2)
    km = jnp.swapaxes(k, 1, 2)
    vm = jnp.swapaxes(v, 1, 2)
    mask = (jnp.arange(t)[None, :]
            <= (t - s) + jnp.arange(s)[:, None])
    ref = _attention(qm.astype(jnp.float32), km, vm, mask)
    got_4d = flash_attention(q, k, v, causal=True, bq=16, bk=16,
                             interpret=True)
    got = jnp.swapaxes(got_4d, 1, 2).reshape(1, s, h * d)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0, atol=3e-2)


@pytest.mark.parametrize("shape", [
    (1, 100, 300, 2, 1, 64),    # S, T not block multiples
    (1, 200, 200, 2, 2, 128),
    (2, 65, 130, 4, 2, 64),
])
def test_flash_odd_shapes(shape):
    """Round 2: S/T need not be block multiples — the kernel pads and
    masks the tail (bounds.py discipline applied to attention). For
    S < T the kernel's contract places queries at the LAST S positions
    (chunked prefill against history), so the reference mask offsets
    query positions by T - S."""
    b, s, t, h, kvh, d = shape
    key = jax.random.PRNGKey(hash(shape) % (2 ** 31))
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, kvh, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, kvh, d), jnp.bfloat16)
    q_pos = (t - s) + jnp.arange(s)[:, None]
    mask = jnp.arange(t)[None, :] <= q_pos
    ref = _attention(q.astype(jnp.float32), k, v, mask)
    got = mha_flash(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


def test_flash_multi_strip_long_context():
    """T above the K/V strip cap exercises the multi-strip scratch-carry
    path (nts > 1) that makes T unbounded. Uses small blocks so the
    interpreter stays fast; grid layout matches the 65k on-chip case."""
    b, h, kvh, s, t, d = 1, 1, 1, 128, 9216, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, kvh, t, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, kvh, t, d), jnp.bfloat16)
    got = flash_attention(q, k, v, causal=True, interpret=True)

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    sc = jnp.einsum("bhsd,bhtd->bhst", q, kf) * d ** -0.5
    qpos = (t - s) + jnp.arange(s)[:, None]
    sc = jnp.where(jnp.arange(t)[None, :] <= qpos, sc, -1e30)
    ref = jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(sc, -1), vf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-2)


@pytest.mark.parametrize("h,kvh", [(8, 4), (4, 4), (8, 2)])
def test_flash_packed_matches_plain(h, kvh):
    """The d=64 head-packed view (two kv heads per 128-lane row, banded
    queries) must equal the plain kernel: the zero band annihilates
    every cross-head term and scale stays 64**-0.5."""
    from how_to_optimize_gemm_tpu.ops.pallas_attention import (
        flash_attention_packed)
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    b, s, t, d = 2, 256, 256, 64
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, kvh, t, d), jnp.float32)
    v = jax.random.normal(kv_, (b, kvh, t, d), jnp.float32)
    ref = flash_attention(q, k, v, causal=True, bq=128, bk=128)
    out = flash_attention_packed(q, k, v, causal=True, bq=128, bk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mha_flash_pack_heads_route():
    from how_to_optimize_gemm_tpu.ops.pallas_attention import mha_flash
    key = jax.random.PRNGKey(5)
    kq, kk, kv_ = jax.random.split(key, 3)
    b, s, h, kvh, d = 1, 130, 4, 2, 64   # odd S exercises the padding
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, kvh, d), jnp.float32)
    v = jax.random.normal(kv_, (b, s, kvh, d), jnp.float32)
    ref = mha_flash(q, k, v, causal=True)
    out = mha_flash(q, k, v, causal=True, pack_heads=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
