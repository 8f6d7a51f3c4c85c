"""Flagship model: decode/forward consistency, quantized paths, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama

CFG = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=128, max_seq=32,
                        weight_kind="fp32")


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_shape(params):
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, CFG.vocab)
    logits = llama.forward(params, CFG, tokens, use_pallas=False)
    assert logits.shape == (2, 8, CFG.vocab)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_decode_matches_forward(params):
    """Step-by-step decode with KV cache == full-sequence forward."""
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, CFG.vocab)
    full = llama.forward(params, CFG, tokens, use_pallas=False)
    cache = llama.init_kv_cache(CFG, batch=1, dtype=jnp.float32)
    outs = []
    for t in range(tokens.shape[1]):
        logits, cache = llama.decode_step(
            params, CFG, cache, tokens[:, t:t + 1], jnp.int32(t),
            use_pallas=False)
        outs.append(logits[:, 0])
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kind", ["bf16", "int8", "int4", "w4a8"])
def test_quantized_forward_close_to_fp32(params, kind):
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, CFG.vocab)
    ref = llama.forward(params, CFG, tokens, use_pallas=False)
    qparams = llama.requantize(params, kind)
    out = llama.forward(qparams, CFG, tokens, use_pallas=False)
    # quantization error, not kernel error: loose relative gate
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    budget = {"bf16": 0.05, "int8": 0.15, "int4": 0.5,
              "w4a8": 0.5}[kind]
    assert rel < budget, rel


def test_train_step_reduces_loss(params):
    tokens = jax.random.randint(jax.random.PRNGKey(4), (4, 16), 0,
                                CFG.vocab)
    p = params
    losses = []
    for _ in range(5):
        p, loss = llama.sgd_train_step(p, CFG, tokens, lr=0.5)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_requantize_roundtrip_kinds(params):
    q8 = llama.requantize(params, "int8")
    assert "int8_qw" in q8["layers"][0]["wq"]
    q4 = llama.requantize(q8, "int4")
    assert "int4_packed" in q4["layers"][0]["w_up"]


def test_remat_matches_plain():
    """jax.checkpoint recompute changes memory, not math."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from how_to_optimize_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=32,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, cfg.vocab)
    plain = llama.loss_fn(params, cfg, toks, remat=False)
    remat = llama.loss_fn(params, cfg, toks, remat=True)
    np.testing.assert_allclose(float(plain), float(remat), rtol=1e-6)
    g_plain = jax.grad(llama.loss_fn)(params, cfg, toks, remat=False)
    g_remat = jax.grad(llama.loss_fn)(params, cfg, toks, remat=True)
    a = g_plain["layers"][0]["attn_norm"]
    b = g_remat["layers"][0]["attn_norm"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_flash_train_loss_matches_eager():
    """flash_train routing changes the attention implementation, not the
    math: loss and grads match the eager path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from how_to_optimize_gemm_tpu.models import llama

    cfg = llama.LlamaConfig(vocab=64, d_model=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=128, max_seq=1024,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 513), 0,
                              cfg.vocab)  # forward sees S=512 (flash gate)
    le = llama.loss_fn(params, cfg, toks, False, False, False)
    lf = llama.loss_fn(params, cfg, toks, False, False, True)
    np.testing.assert_allclose(float(le), float(lf), rtol=2e-2)
    ge = jax.grad(llama.loss_fn)(params, cfg, toks, False, False, False)
    gf = jax.grad(llama.loss_fn)(params, cfg, toks, False, False, True)
    a = np.asarray(ge["layers"][0]["wq"]["fp32_w"])
    b = np.asarray(gf["layers"][0]["wq"]["fp32_w"])
    scale = np.max(np.abs(a)) + 1e-9
    np.testing.assert_allclose(b / scale, a / scale, rtol=0, atol=5e-2)


def test_kv8_cache_decode_close_to_bf16():
    """int8 (KV8) cache halves memory; decode logits stay close to the
    bf16-cache path and the quantizer round-trips within 1/127."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from how_to_optimize_gemm_tpu.models import llama

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 8))
    q, scale = llama.quantize_kv(x)
    back = q.astype(jnp.float32) * scale[..., None]
    assert float(jnp.max(jnp.abs(back - x))) <= float(
        jnp.max(jnp.abs(x))) / 127 + 1e-6

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=32,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 1), 0,
                                cfg.vocab)
    pos = jnp.asarray([5, 9], jnp.int32)

    def run(quantized):
        cache = llama.init_kv_cache(cfg, 2, quantized=quantized)
        # warm the cache with a few steps so attention reads history
        c = cache
        for t in range(5):
            logits, c = llama.decode_step(
                params, cfg, c, tokens + t, jnp.asarray([t, t], jnp.int32),
                use_pallas=False)
        return logits

    ref = np.asarray(run(False))
    got = np.asarray(run(True))
    rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 0.05, rel


def test_routing_edge_cases_fall_back_not_crash():
    """Routing edge cases: wide dh=64 MHA decode routes through the
    head-pairing v3 path when kvh is even (round 2 — odd kvh remains
    the only eager-only width); odd-S flash training routes to the
    PADDED flash kernels (mha_flash_train pads outside its VJP) and
    must match eager autodiff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    # wide dh=64 MHA routes EAGER since round 3: the chip A/B measured
    # the head-pairing v3 walk losing decisively (258.5 vs 395.2 tok/s
    # at T=4096 batch 4 — see _route_decode's docstring)
    from how_to_optimize_gemm_tpu.models.llama import _route_decode
    assert not _route_decode(True, 4096, 64, 32)   # wide dh=64: eager
    assert _route_decode(True, 4096, 64, 4)        # GQA width: v4
    assert _route_decode(True, 4096, 128, 32)      # wide MHA d=128: v3

    # odd-S flash_train: dh=64 so flash actually routes; S=520 pads to
    # 640 inside mha_flash_train (least-waste blk=128). Loss and grads
    # must match eager.
    cfg = llama.LlamaConfig(vocab=64, d_model=128, n_layers=1, n_heads=2,
                            n_kv_heads=2, d_ff=128, max_seq=520,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 520), 0,
                                cfg.vocab)
    le, ge = jax.value_and_grad(llama.loss_fn)(
        params, cfg, tokens, False, False, False)
    lf, gf = jax.value_and_grad(llama.loss_fn)(
        params, cfg, tokens, False, False, True)
    assert jnp.isfinite(lf)
    np.testing.assert_allclose(float(lf), float(le), rtol=2e-2)
    a = np.asarray(ge["layers"][0]["wq"]["fp32_w"])
    b = np.asarray(gf["layers"][0]["wq"]["fp32_w"])
    scale = np.max(np.abs(a)) + 1e-9
    np.testing.assert_allclose(b / scale, a / scale, rtol=0, atol=5e-2)


# ------------------------------------------------------------- MoE family

MOE_CFG = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=64, max_seq=32,
                            weight_kind="fp32", n_experts=4, moe_top_k=2)


def test_moe_decode_matches_forward():
    """The Mixtral-shaped family: routed-MoE MLP, prefill == stepped
    decode (both in the small-T no-drop capacity regime)."""
    params = llama.init_params(jax.random.PRNGKey(0), MOE_CFG)
    assert "moe" in params["layers"][0]
    assert "w_gate" not in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0,
                                MOE_CFG.vocab)
    full = llama.forward(params, MOE_CFG, tokens, use_pallas=False)
    cache = llama.init_kv_cache(MOE_CFG, batch=1, dtype=jnp.float32)
    outs = []
    for t in range(tokens.shape[1]):
        logits, cache = llama.decode_step(
            params, MOE_CFG, cache, tokens[:, t:t + 1], jnp.int32(t),
            use_pallas=False)
        outs.append(logits[:, 0])
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_moe_train_step_moves_router():
    params = llama.init_params(jax.random.PRNGKey(0), MOE_CFG)
    router0 = np.asarray(params["layers"][0]["moe"]["router"])
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 0,
                                MOE_CFG.vocab)
    state = params
    losses = []
    for _ in range(6):
        state, loss = llama.sgd_train_step(state, MOE_CFG, tokens,
                                           lr=1e-2)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # the router is trainable: gates pass gradient to it
    router1 = np.asarray(state["layers"][0]["moe"]["router"])
    assert not np.array_equal(router0, router1)


def test_moe_requantize_int8_experts():
    """requantize(int8) quantizes the expert stacks too (W8A16 experts,
    1 B/elt in HBM); other kinds keep them dense. The quantized model's
    stepped decode still equals its own prefill."""
    params = llama.init_params(jax.random.PRNGKey(0), MOE_CFG)
    q = llama.requantize(params, "int8")
    assert "int8_qw" in q["layers"][0]["wq"]
    moe = q["layers"][0]["moe"]
    assert moe["w_in_q"].dtype == jnp.int8
    assert set(moe) == {"router", "w_in_q", "w_in_s", "w_out_q",
                        "w_out_s", "w_gate_q", "w_gate_s"}
    # bf16 requantize keeps (here: restores) dense stacks
    dense = llama.requantize(q, "bf16")["layers"][0]["moe"]
    assert "w_in" in dense and dense["w_in"].dtype == jnp.float32
    # quantized forward close to the dense model, not equal
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0,
                                MOE_CFG.vocab)
    fq = llama.forward(q, MOE_CFG, tokens, use_pallas=False)
    fd = llama.forward(params, MOE_CFG, tokens, use_pallas=False)
    assert np.isfinite(np.asarray(fq)).all()
    err = float(jnp.max(jnp.abs(fq - fd)) / jnp.max(jnp.abs(fd)))
    assert err < 0.1, err
    # decode == prefill ON the quantized model
    cache = llama.init_kv_cache(MOE_CFG, batch=1, dtype=jnp.float32)
    outs = []
    for t in range(tokens.shape[1]):
        logits, cache = llama.decode_step(
            q, MOE_CFG, cache, tokens[:, t:t + 1], jnp.int32(t),
            use_pallas=False)
        outs.append(logits[:, 0])
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(fq), rtol=2e-4, atol=2e-4)


def test_moe_loss_includes_aux_and_tp_shards(devices8):
    """loss_fn adds the load-balance aux for MoE configs, and the
    expert stacks TP-shard (Megatron inside each expert) so the family
    is actually deployable."""
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh
    from how_to_optimize_gemm_tpu.parallel.sharding import (
        make_sharded_train_step, shard_params)

    params = llama.init_params(jax.random.PRNGKey(0), MOE_CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 16), 0,
                                MOE_CFG.vocab)
    loss = float(llama.loss_fn(params, MOE_CFG, tokens, False))
    _, aux = llama.forward(params, MOE_CFG, tokens[:, :-1], False,
                           return_moe_aux=True)
    assert float(aux) >= 1.0 - 1e-5  # >= 1 by Cauchy-Schwarz at balance
    # reconstruct the CE-only loss to check the aux add
    logits = llama.forward(params, MOE_CFG, tokens[:, :-1], False)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, tokens[:, 1:][..., None], -1)
    ce = float(jnp.mean(nll))
    np.testing.assert_allclose(
        loss, ce + MOE_CFG.moe_aux_weight * float(aux), rtol=1e-5)

    mesh = make_mesh(dp=2, tp=4, devices=devices8)
    sharded = shard_params(params, mesh)
    w_in = sharded["layers"][0]["moe"]["w_in"]
    assert "tp" in str(w_in.sharding.spec)  # d_ff column-sharded
    step, tok_sh = make_sharded_train_step(MOE_CFG, mesh, lr=0.1)
    toks = jax.device_put(tokens, tok_sh)
    new_params, loss2 = step(sharded, toks)
    assert np.isfinite(float(loss2))


def test_init_params_expert_stacks_follow_weight_kind():
    """init_params stores expert stacks at cfg.weight_kind's width, like
    every other linear — an int8 model must not silently carry (and
    bench as) bf16 experts."""
    import dataclasses
    cfg8 = dataclasses.replace(MOE_CFG, weight_kind="int8")
    p8 = llama.init_params(jax.random.PRNGKey(0), cfg8)
    moe8 = p8["layers"][0]["moe"]
    assert "w_in_q" in moe8 and moe8["w_in_q"].dtype == jnp.int8
    cfg4 = dataclasses.replace(MOE_CFG, weight_kind="w4a8")
    p4 = llama.init_params(jax.random.PRNGKey(0), cfg4)
    moe4 = p4["layers"][0]["moe"]
    assert "w_in_q4" in moe4 and "w_in_q" not in moe4
    # bf16/fp32 stay dense
    pd = llama.init_params(jax.random.PRNGKey(0), MOE_CFG)
    assert "w_in" in pd["layers"][0]["moe"]
    # the int8-expert model runs end to end
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0,
                                cfg8.vocab)
    out = llama.forward(p8, cfg8, tokens, use_pallas=False)
    assert np.isfinite(np.asarray(out)).all()


def test_stacked_decode_matches_unrolled():
    """decode_step_stacked (one lax.scan over stacked layers) equals
    decode_step exactly — logits and cache contents, scalar and
    per-slot pos, dense and quantized weights. (Measured on chip as an
    honest serving NEGATIVE — scan re-streams the weight slices — but
    the exactness contract stands; see llama.stack_layers.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    for kind in ("fp32", "w4a8"):
        cfg = llama.LlamaConfig(vocab=64, d_model=64, n_layers=3,
                                n_heads=4, n_kv_heads=2, d_ff=128,
                                max_seq=64, weight_kind=kind)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        cache = llama.init_kv_cache(cfg, batch=2)
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 4), 0, 64)
        for pos in (jnp.int32(3), jnp.asarray([3, 5], jnp.int32)):
            lg, nc = llama.decode_step(params, cfg, cache, toks, pos,
                                       use_pallas=False)
            st = llama.stack_layers(params)
            sc = llama.stack_kv_cache(cache)
            lg2, (kS, vS) = llama.decode_step_stacked(
                st, cfg, sc, toks, pos, use_pallas=False)
            np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg),
                                       atol=1e-5, rtol=1e-5)
            kref = jnp.stack([e[0] for e in nc])
            np.testing.assert_allclose(np.asarray(kS),
                                       np.asarray(kref), atol=1e-6)


@pytest.mark.parametrize("kind", ["fp32", "bf16", "int8", "int4", "w4a8"])
def test_fused_projections_bit_identical(params, kind):
    """fuse_projections (wqkv + w_gate_up) must be BIT-identical to the
    unfused forward: per-output-channel weight scales are unchanged by
    output-dim concat, and activation quantization is per-row of the
    shared input."""
    tokens = jax.random.randint(jax.random.PRNGKey(7), (2, 8), 0,
                                CFG.vocab)
    p = params if kind == "fp32" else llama.requantize(params, kind)
    ref = llama.forward(p, CFG, tokens, use_pallas=False)
    out = llama.forward(llama.fuse_projections(p), CFG, tokens,
                        use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_fused_projections_decode(params):
    """Fused decode steps (cache path) match unfused exactly."""
    fused = llama.fuse_projections(params)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (2, 5), 0,
                                CFG.vocab)
    cache_a = llama.init_kv_cache(CFG, batch=2, dtype=jnp.float32)
    cache_b = llama.init_kv_cache(CFG, batch=2, dtype=jnp.float32)
    for t in range(tokens.shape[1]):
        la, cache_a = llama.decode_step(params, CFG, cache_a,
                                        tokens[:, t:t + 1], jnp.int32(t),
                                        use_pallas=False)
        lb, cache_b = llama.decode_step(fused, CFG, cache_b,
                                        tokens[:, t:t + 1], jnp.int32(t),
                                        use_pallas=False)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
