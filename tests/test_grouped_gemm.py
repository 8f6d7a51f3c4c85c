"""Grouped (ragged) GEMM kernel + the dropless overcompute-free MoE."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.ops.pallas_grouped_gemm import grouped_matmul
from how_to_optimize_gemm_tpu.parallel.moe import (
    init_moe_params, moe_ffn_dense, moe_ffn_ragged, quantize_moe)


def test_grouped_matmul_matches_segments():
    e, d, f, bt = 3, 32, 256, 8
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (e, d, f), jnp.float32) / d ** 0.5
    block_expert = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
    tp = len(block_expert) * bt
    x = jax.random.normal(jax.random.PRNGKey(1), (tp, d), jnp.float32)
    got = grouped_matmul(x, w, block_expert, bt=bt, bf=128)
    ref = jnp.concatenate([x[i * bt:(i + 1) * bt] @ w[int(be)]
                           for i, be in enumerate(block_expert)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_grouped_matmul_int8_scales():
    e, d, f, bt = 2, 16, 128, 8
    q = jax.random.randint(jax.random.PRNGKey(2), (e, d, f), -127, 128
                           ).astype(jnp.int8)
    s = jax.random.uniform(jax.random.PRNGKey(3), (e, 1, f),
                           jnp.float32, 0.01, 0.02)
    block_expert = jnp.asarray([1, 0], jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2 * bt, d), jnp.float32)
    got = grouped_matmul(x, q.astype(jnp.float32), block_expert, s,
                         bt=bt, bf=128)
    ref = jnp.concatenate([
        (x[:bt] @ q[1].astype(jnp.float32)) * s[1],
        (x[bt:] @ q[0].astype(jnp.float32)) * s[0]])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("quantized", [False, True])
def test_moe_ragged_matches_dense(quantized):
    """Dropless by construction: the ragged path equals the dense
    per-token oracle with NO capacity factor at all."""
    params = init_moe_params(jax.random.PRNGKey(5), 16, 128, 4,
                             swiglu=True)
    if quantized:
        params = quantize_moe(params)
    x = jax.random.normal(jax.random.PRNGKey(6), (100, 16), jnp.float32)
    got, aux = moe_ffn_ragged(params, x, k=2, bt=8, return_aux=True)
    ref = moe_ffn_dense(params, x, k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
    assert float(aux) >= 1.0 - 1e-5


def test_llama_moe_ragged_decode_matches_dispatch():
    """cfg.moe_ragged routes the MLP through the grouped GEMM; output
    equals the (dropless) dispatch path."""
    from how_to_optimize_gemm_tpu.models import llama
    base = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                             n_kv_heads=2, d_ff=128, max_seq=32,
                             weight_kind="fp32", n_experts=4)
    # min_tokens=0: force the grouped route at this tiny width (the
    # measured auto-threshold would cost-route decode to dispatch)
    ragged = dataclasses.replace(base, moe_ragged=True,
                                 moe_ragged_min_tokens=0)
    params = llama.init_params(jax.random.PRNGKey(0), base)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                base.vocab)
    fa = llama.forward(params, base, tokens, use_pallas=False)
    fb = llama.forward(params, ragged, tokens, use_pallas=False)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=0, atol=2e-5)


def test_grouped_matmul_custom_vjp():
    """dx/dW from the custom VJP equal autodiff of the segment-wise
    reference."""
    e, d, f, bt = 3, 16, 128, 8
    w = jax.random.normal(jax.random.PRNGKey(7), (e, d, f),
                          jnp.float32) / d ** 0.5
    block_expert = jnp.asarray([2, 0, 0, 1], jnp.int32)
    tp = len(block_expert) * bt
    x = jax.random.normal(jax.random.PRNGKey(8), (tp, d), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (tp, f), jnp.float32)

    def loss_kernel(x, w):
        y = grouped_matmul(x, w, block_expert, bt=bt, bf=128)
        return jnp.sum((y - tgt) ** 2)

    def loss_ref(x, w):
        y = jnp.concatenate([x[i * bt:(i + 1) * bt] @ w[int(b_)]
                             for i, b_ in enumerate(block_expert)])
        return jnp.sum((y - tgt) ** 2)

    (la, (dxa, dwa)) = jax.value_and_grad(loss_kernel, (0, 1))(x, w)
    (lb, (dxb, dwb)) = jax.value_and_grad(loss_ref, (0, 1))(x, w)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwa), np.asarray(dwb),
                               rtol=0, atol=1e-4)


def test_moe_ragged_gradients_match_dispatch():
    """The ragged path trains: gradients equal the dropless dispatch
    path's (identical math, different execution)."""
    from how_to_optimize_gemm_tpu.parallel.moe import moe_ffn_local
    params = init_moe_params(jax.random.PRNGKey(10), 16, 128, 4,
                             swiglu=True)
    x = jax.random.normal(jax.random.PRNGKey(11), (64, 16), jnp.float32)

    def loss_ragged(params):
        y, aux = moe_ffn_ragged(params, x, k=2, bt=8, return_aux=True)
        return jnp.mean(y ** 2) + 0.01 * aux

    def loss_dispatch(params):
        y, aux = moe_ffn_local(params, x, k=2, capacity_factor=2.0,
                               return_aux=True)
        return jnp.mean(y ** 2) + 0.01 * aux

    ga = jax.grad(loss_ragged)(params)
    gb = jax.grad(loss_dispatch)(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_grouped_matmul_non_multiple_f():
    """f that is not a multiple of the block cap (the llama-7B
    d_ff=11008 family of shapes) picks a 128-aligned DIVISOR instead of
    crashing — the ladder's least-waste rule."""
    params = init_moe_params(jax.random.PRNGKey(30), 16, 1280, 4,
                             swiglu=True)
    x = jax.random.normal(jax.random.PRNGKey(31), (40, 16), jnp.float32)
    got = moe_ffn_ragged(params, x, k=2, bt=8)
    ref = moe_ffn_dense(params, x, k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
    # and it still trains at these shapes
    g = jax.grad(lambda p: jnp.sum(moe_ffn_ragged(p, x, k=2, bt=8) ** 2)
                 )(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


def test_pick_block_divisors():
    from how_to_optimize_gemm_tpu.ops.pallas_grouped_gemm import (
        _pick_block)
    assert _pick_block(11008, 512) == 256      # 11008 = 256 * 43
    assert _pick_block(14336, 512) == 512
    assert _pick_block(256, 512) == 256
    assert _pick_block(1280, 512) == 256
    assert _pick_block(128 * 37, 512) == 128   # prime co-factor: 128
    assert _pick_block(192, 128) == 192        # no aligned divisor


def test_moe_int4_stacks_roundtrip_and_ragged():
    """4-bit expert stacks: pack/unpack round-trips, the ragged kernel
    decodes nibbles per block in VMEM and exactly matches the oracle on
    the dequantized weights; the dispatch path's unpack fallback agrees."""
    from how_to_optimize_gemm_tpu.parallel.moe import (
        dequantize_moe, moe_ffn_local)
    params = init_moe_params(jax.random.PRNGKey(50), 16, 128, 4,
                             swiglu=True)
    q4 = quantize_moe(params, bits=4)
    assert q4["w_in_q4"].shape == (4, 8, 128)   # d=16 -> 8 packed rows
    dense = dequantize_moe(q4)
    # values are int4 levels * scale: dequantize is exact w.r.t. q4
    x = jax.random.normal(jax.random.PRNGKey(51), (48, 16), jnp.float32)
    got = moe_ffn_ragged(q4, x, k=2, bt=8)
    ref = moe_ffn_dense(dense, x, k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
    disp = moe_ffn_local(q4, x, k=2, capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_llama_requantize_int4_moe():
    """requantize(int4/w4a8) nibble-packs the expert stacks; the
    ragged-routed model runs and tracks the dequantized-dense model."""
    import dataclasses
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.moe import dequantize_moe
    cfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=16,
                            weight_kind="fp32", n_experts=4,
                            moe_ragged=True, moe_ragged_min_tokens=0)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    q = llama.requantize(params, "w4a8")
    moe = q["layers"][0]["moe"]
    assert "w_in_q4" in moe and moe["w_in_q4"].dtype == jnp.int8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                                cfg.vocab)
    fq = llama.forward(q, cfg, tokens, use_pallas=False)
    # dense model with the SAME dequantized experts (attention linears
    # differ by their own quant error, so swap only the moe dicts)
    dense = llama.requantize(q, "fp32")
    fd = llama.forward(dense, cfg, tokens, use_pallas=False)
    assert np.isfinite(np.asarray(fq)).all()
    rel = float(jnp.max(jnp.abs(fq - fd)) /
                jnp.maximum(jnp.max(jnp.abs(fd)), 1e-6))
    assert rel < 0.2, rel


def test_grouped_matmul_q8_vjp():
    """QLoRA-style int8 grouped backward: dx and d(scales) match
    autodiff of the dequantized segment reference; the int8 stack gets
    no cotangent."""
    e, d, f, bt = 3, 16, 128, 8
    q = jax.random.randint(jax.random.PRNGKey(60), (e, d, f), -127, 128
                           ).astype(jnp.int8)
    s = jax.random.uniform(jax.random.PRNGKey(61), (e, 1, f),
                           jnp.float32, 0.01, 0.02)
    block_expert = jnp.asarray([1, 0, 2, 1], jnp.int32)
    tp = len(block_expert) * bt
    x = jax.random.normal(jax.random.PRNGKey(62), (tp, d), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(63), (tp, f), jnp.float32)

    def loss_kernel(x, s):
        y = grouped_matmul(x, q, block_expert, s, bt=bt, bf=128)
        return jnp.sum((y - tgt) ** 2)

    def loss_ref(x, s):
        y = jnp.concatenate([
            (x[i * bt:(i + 1) * bt] @ q[int(b_)].astype(jnp.float32))
            * s[int(b_)] for i, b_ in enumerate(block_expert)])
        return jnp.sum((y - tgt) ** 2)

    (la, (dxa, dsa)) = jax.value_and_grad(loss_kernel, (0, 1))(x, s)
    (lb, (dxb, dsb)) = jax.value_and_grad(loss_ref, (0, 1))(x, s)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb),
                               rtol=1e-5, atol=1e-3)
    # ds entries are O(1e4) sums (u carries the un-scaled int8 dot):
    # accumulation-order noise needs a relative tolerance
    np.testing.assert_allclose(np.asarray(dsa), np.asarray(dsb),
                               rtol=1e-5, atol=1e-3)


def test_moe_ragged_q8_trains_like_dispatch():
    """Quantized-expert (W8A16) MoE trains through the RAGGED path:
    gradients match the dispatch path's unpack-fallback gradients."""
    from how_to_optimize_gemm_tpu.parallel.moe import moe_ffn_local
    params = quantize_moe(init_moe_params(jax.random.PRNGKey(70), 16,
                                          128, 4, swiglu=True))
    x = jax.random.normal(jax.random.PRNGKey(71), (64, 16), jnp.float32)

    def split(p):
        floats = {k: v for k, v in p.items() if v.dtype != jnp.int8}
        ints = {k: v for k, v in p.items() if v.dtype == jnp.int8}
        return floats, ints

    floats, ints = split(params)

    def loss(fn):
        def inner(floats):
            y = fn({**floats, **ints}, x, k=2)
            return jnp.mean(y ** 2)
        return inner

    ga = jax.grad(loss(lambda p, x, k: moe_ffn_ragged(p, x, k=k, bt=8))
                  )(floats)
    gb = jax.grad(loss(lambda p, x, k: moe_ffn_local(
        p, x, k=k, capacity_factor=2.0)))(floats)
    assert set(ga) == set(gb)
    for key in ga:
        np.testing.assert_allclose(np.asarray(ga[key]),
                                   np.asarray(gb[key]),
                                   rtol=0, atol=1e-4, err_msg=key)


def test_grouped_matmul_q4_custom_vjp():
    """Packed-int4 stacks train QLoRA-style on the ragged path: dx and
    d(scales) match autodiff of the dequantized reference (the packed
    stack itself is frozen — float0). d/2 = 256 > bf = 128 forces the
    transposed kernel through BOTH nibble bands at nh = 2."""
    from how_to_optimize_gemm_tpu.ops.quant import pack_int4
    e, d, f, bt = 3, 512, 128, 8
    q = jax.random.randint(jax.random.PRNGKey(80), (e, d, f), -7, 8
                           ).astype(jnp.int8)
    packed = jax.vmap(lambda q2: pack_int4(q2, d))(q)
    assert packed.shape == (e, d // 2, f)
    s = jax.random.uniform(jax.random.PRNGKey(81), (e, 1, f),
                           jnp.float32, 0.01, 0.02)
    block_expert = jnp.asarray([1, 0, 2, 1], jnp.int32)
    tp = len(block_expert) * bt
    x = jax.random.normal(jax.random.PRNGKey(82), (tp, d), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(83), (tp, f), jnp.float32)

    def loss_kernel(x, s):
        y = grouped_matmul(x, packed, block_expert, s, bt=bt, bf=128,
                           packed4=True)
        return jnp.sum((y - tgt) ** 2)

    def loss_ref(x, s):
        y = jnp.concatenate([
            (x[i * bt:(i + 1) * bt] @ q[int(b_)].astype(jnp.float32))
            * s[int(b_)] for i, b_ in enumerate(block_expert)])
        return jnp.sum((y - tgt) ** 2)

    (la, (dxa, dsa)) = jax.value_and_grad(loss_kernel, (0, 1))(x, s)
    (lb, (dxb, dsb)) = jax.value_and_grad(loss_ref, (0, 1))(x, s)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dsa), np.asarray(dsb),
                               rtol=1e-5, atol=1e-3)


def test_moe_ragged_q4_trains_like_dispatch():
    """int4-packed expert MoE trains through the RAGGED path (the gap
    round 2 first shipped as inference-only): gradients match the
    dispatch path's unpack-fallback gradients."""
    from how_to_optimize_gemm_tpu.parallel.moe import moe_ffn_local
    params = quantize_moe(init_moe_params(jax.random.PRNGKey(90), 16,
                                          128, 4, swiglu=True), bits=4)
    assert "w_in_q4" in params
    x = jax.random.normal(jax.random.PRNGKey(91), (64, 16), jnp.float32)

    def split(p):
        floats = {k: v for k, v in p.items() if v.dtype != jnp.int8}
        ints = {k: v for k, v in p.items() if v.dtype == jnp.int8}
        return floats, ints

    floats, ints = split(params)

    def loss(fn):
        def inner(floats):
            y = fn({**floats, **ints}, x, k=2)
            return jnp.mean(y ** 2)
        return inner

    ga = jax.grad(loss(lambda p, x, k: moe_ffn_ragged(p, x, k=k, bt=8))
                  )(floats)
    gb = jax.grad(loss(lambda p, x, k: moe_ffn_local(
        p, x, k=k, capacity_factor=2.0)))(floats)
    assert set(ga) == set(gb)
    for key in ga:
        np.testing.assert_allclose(np.asarray(ga[key]),
                                   np.asarray(gb[key]),
                                   rtol=0, atol=1e-4, err_msg=key)


def test_quantize_moe_width_mismatch_raises():
    """Re-quantizing at a different width must not silently pass the
    old stacks through — dequantize first, explicitly."""
    from how_to_optimize_gemm_tpu.parallel.moe import dequantize_moe
    p8 = quantize_moe(init_moe_params(jax.random.PRNGKey(95), 16, 128,
                                      4, swiglu=True))
    with pytest.raises(ValueError, match="already quantized at 8-bit"):
        quantize_moe(p8, bits=4)
    # same-width pass-through (idempotence) still works
    again = quantize_moe(p8, bits=8)
    assert set(again) == set(p8)
    # and the documented route produces real 4-bit stacks
    p4 = quantize_moe(dequantize_moe(p8), bits=4)
    assert "w_in_q4" in p4 and "w_in_q" not in p4
