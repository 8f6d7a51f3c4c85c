"""Multi-LoRA serving: per-request adapters in one batched dispatch.

Parity contract: the batched BGMV path (models/lora.lora_delta threaded
through decode_step) must equal serving the adapter FOLDED into dense
weights (models/lora.merge_lora), and rows with adapter=-1 must equal
the base model exactly — one mixed batch, one dispatch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.models.lora import (
    init_lora, lora_delta, merge_lora, set_adapter)
from how_to_optimize_gemm_tpu.parallel.serving import Request, ServingEngine

CFG = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=128, max_seq=32,
                        weight_kind="fp32")


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(7), CFG)


@pytest.fixture(scope="module")
def lora():
    """Two adapters with NONZERO B (init gives B=0 = identity; parity
    against a zero delta would be vacuous), fp32 so the folded oracle
    and the BGMV path share arithmetic."""
    tree = init_lora(jax.random.PRNGKey(3), CFG, n_adapters=2, rank=4,
                     targets=("wq", "wv", "w_up"), dtype=jnp.float32)
    key = jax.random.PRNGKey(11)
    layers = []
    for entry in tree["layers"]:
        e = {}
        for t, (a, b) in entry.items():
            key, kb = jax.random.split(key)
            e[t] = (a, jax.random.normal(kb, b.shape, jnp.float32)
                    * 0.05)
        layers.append(e)
    return {"layers": layers, "scale": tree["scale"]}


def test_zero_init_is_identity(params):
    """Fresh init (B=0) applied with any idx changes nothing — exact."""
    fresh = init_lora(jax.random.PRNGKey(0), CFG, n_adapters=2, rank=4,
                      dtype=jnp.float32)
    cache = llama.init_kv_cache(CFG, 2, jnp.bfloat16)
    tok = jnp.asarray([[5], [9]], jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)
    base, _ = llama.decode_step(params, CFG, cache, tok, pos,
                                use_pallas=False)
    adapted, _ = llama.decode_step(params, CFG, cache, tok, pos,
                                   use_pallas=False, lora=fresh,
                                   lora_idx=jnp.asarray([0, 1],
                                                        jnp.int32))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(adapted))


def test_bgmv_matches_merged(params, lora):
    """One mixed decode batch [adapter0, base, adapter1]: each row's
    logits match its own folded-weights oracle."""
    merged = [merge_lora(params, CFG, lora, i) for i in (0, 1)]
    tok = jnp.asarray([[5], [5], [5]], jnp.int32)
    pos = jnp.zeros((3,), jnp.int32)
    cache = llama.init_kv_cache(CFG, 3, jnp.bfloat16)
    idx = jnp.asarray([0, -1, 1], jnp.int32)
    got, _ = llama.decode_step(params, CFG, cache, tok, pos,
                               use_pallas=False, lora=lora,
                               lora_idx=idx)
    oracles = [merged[0], params, merged[1]]
    for row, oracle in enumerate(oracles):
        cache1 = llama.init_kv_cache(CFG, 1, jnp.bfloat16)
        want, _ = llama.decode_step(oracle, CFG, cache1, tok[row:row + 1],
                                    pos[row:row + 1], use_pallas=False)
        np.testing.assert_allclose(np.asarray(got[row]),
                                   np.asarray(want[0]),
                                   rtol=2e-4, atol=2e-4)


def test_engine_mixed_adapters(params, lora):
    """End-to-end: one engine, three requests on three adapters (0, base,
    1); each greedy stream equals a dedicated engine on its folded
    weights / the base."""
    prompts = [[3, 5, 7], [3, 5, 7], [3, 5, 7]]
    reqs = [Request(uid=i, prompt=p, max_new=5, adapter=a)
            for i, (p, a) in enumerate(zip(prompts, (0, -1, 1)))]
    eng = ServingEngine(CFG, params, batch_slots=3, use_pallas=False,
                        lora=lora)
    done = eng.run(reqs)

    for req, oracle_params in zip(
            done, (merge_lora(params, CFG, lora, 0), params,
                   merge_lora(params, CFG, lora, 1))):
        ref_eng = ServingEngine(CFG, oracle_params, batch_slots=1,
                                use_pallas=False)
        ref = ref_eng.run([Request(uid=0, prompt=req.prompt,
                                   max_new=5)])[0].out
        assert req.out == ref, (req.adapter, req.out, ref)


def test_engine_lora_with_paging(params, lora):
    """Adapters compose with the paged cache + prefix cache; the prefix
    key includes the adapter id, so the SAME prompt on two adapters must
    NOT share pages (different wk/wv ⇒ different K/V)."""
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        lora=lora, paged=True, page=8, prefix_cache=True)
    prompt = list(range(1, 18))      # 17 tokens = 2 full pages + tail
    r0 = eng.run([Request(uid=0, prompt=prompt, max_new=3,
                          adapter=0)])[0]
    assert eng.prefix_hit_tokens == 0
    r1 = eng.run([Request(uid=1, prompt=prompt, max_new=3,
                          adapter=1)])[0]
    assert eng.prefix_hit_tokens == 0      # no cross-adapter hits
    r2 = eng.run([Request(uid=2, prompt=prompt, max_new=3,
                          adapter=0)])[0]
    assert eng.prefix_hit_tokens == 16     # same adapter: 2 pages hit
    assert r2.out == r0.out
    oracle = ServingEngine(CFG, merge_lora(params, CFG, lora, 1),
                           batch_slots=1, use_pallas=False)
    ref = oracle.run([Request(uid=0, prompt=prompt, max_new=3)])[0].out
    assert r1.out == ref


def test_lora_training(params):
    """LoRA finetune on the fp32 base: loss decreases, the BASE params
    are bitwise untouched, and gradients land ONLY in the trained
    adapter's slices (the gather VJP's scatter locality) — adapter 1
    stays bitwise at init."""
    import optax

    from how_to_optimize_gemm_tpu.models.lora import make_lora_train_step

    tree = init_lora(jax.random.PRNGKey(0), CFG, n_adapters=2, rank=4,
                     dtype=jnp.float32)
    step = make_lora_train_step(CFG, optax.adam(1e-2), adapter=0)
    opt_state = optax.adam(1e-2).init(tree["layers"])
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                CFG.vocab)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    losses = []
    lora_t = tree
    for _ in range(12):
        lora_t, opt_state, loss = step(params, lora_t, opt_state,
                                       tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses
    for a, b in zip(jax.tree.leaves(base_before),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for e0, e1 in zip(lora_t["layers"], tree["layers"]):
        for t in e0:
            # slot 0 moved, slot 1 bitwise at init
            assert not np.array_equal(np.asarray(e0[t][0][0]),
                                      np.asarray(e1[t][0][0]))
            np.testing.assert_array_equal(np.asarray(e0[t][0][1]),
                                          np.asarray(e1[t][0][1]))
            np.testing.assert_array_equal(np.asarray(e0[t][1][1]),
                                          np.asarray(e1[t][1][1]))


def test_qlora_int8_base_trains_and_serves():
    """QLoRA on the dense model: the base is int8-quantized (frozen by
    construction — int leaves never enter the grad tree), adapters are
    fp32; training reduces loss and the trained adapter serves through
    the multi-LoRA engine."""
    import optax

    from how_to_optimize_gemm_tpu.models.lora import make_lora_train_step

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=32,
                            weight_kind="int8")
    qparams = llama.init_params(jax.random.PRNGKey(7), cfg)
    tree = init_lora(jax.random.PRNGKey(0), cfg, n_adapters=1, rank=4,
                     dtype=jnp.float32)
    step = make_lora_train_step(cfg, optax.adam(1e-2))
    opt_state = optax.adam(1e-2).init(tree["layers"])
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                cfg.vocab)
    first = last = None
    for _ in range(25):
        tree, opt_state, loss = step(qparams, tree, opt_state, tokens)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first - 0.05, (first, last)

    eng = ServingEngine(cfg, qparams, batch_slots=2, use_pallas=False,
                        lora=tree)
    done = eng.run([Request(uid=0, prompt=[3, 5], max_new=4, adapter=0),
                    Request(uid=1, prompt=[3, 5], max_new=4)])
    assert all(r.done and len(r.out) == 4 for r in done)


def test_set_adapter_roundtrip(params, lora):
    """set_adapter overwrites one slot; the other slot is untouched."""
    single = [{t: (ab[0][1], ab[1][1]) for t, ab in entry.items()}
              for entry in lora["layers"]]
    fresh = init_lora(jax.random.PRNGKey(0), CFG, n_adapters=2, rank=4,
                      targets=("wq", "wv", "w_up"), dtype=jnp.float32)
    loaded = set_adapter(fresh, 0, single)
    for le, ld in zip(loaded["layers"], lora["layers"]):
        for t in le:
            np.testing.assert_array_equal(np.asarray(le[t][0][0]),
                                          np.asarray(ld[t][0][1]))
            np.testing.assert_array_equal(np.asarray(le[t][1][0]),
                                          np.asarray(ld[t][1][1]))
