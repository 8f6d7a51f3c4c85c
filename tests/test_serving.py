"""Serving engine: continuous batching equals sequential greedy decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.parallel.serving import Request, ServingEngine

CFG = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=128, max_seq=32,
                        weight_kind="fp32")


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(7), CFG)


def _greedy_reference(params, prompt, max_new, cfg=CFG):
    """Sequential greedy decode via the raw decode_step API (batch 1)."""
    cache = llama.init_kv_cache(cfg, 1, jnp.bfloat16)
    tok = None
    for t, p in enumerate(prompt):
        logits, cache = llama.decode_step(
            params, cfg, cache, jnp.asarray([[p]], jnp.int32),
            jnp.asarray([t], jnp.int32), use_pallas=False)
        tok = int(jnp.argmax(logits[0, -1]))
    out = [tok]
    pos = len(prompt)
    while len(out) < max_new:
        logits, cache = llama.decode_step(
            params, cfg, cache, jnp.asarray([[out[-1]]], jnp.int32),
            jnp.asarray([pos], jnp.int32), use_pallas=False)
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1
    return out


def test_engine_matches_sequential(params):
    prompts = [[3, 5, 7], [11, 2], [40, 41, 42, 43]]
    reqs = [Request(uid=i, prompt=p, max_new=6)
            for i, p in enumerate(prompts)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    done = eng.run(reqs)
    for req in done:
        ref = _greedy_reference(params, req.prompt, req.max_new)
        assert req.out == ref, (req.uid, req.out, ref)
        assert req.done


def test_engine_more_requests_than_slots(params):
    reqs = [Request(uid=i, prompt=[i + 1, i + 2], max_new=3)
            for i in range(5)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    done = eng.run(reqs)
    assert all(r.done and len(r.out) == 3 for r in done)


def test_sampling_engine(params):
    """Temperature sampling produces valid tokens; greedy (T=0) sampler
    reproduces the default engine exactly."""
    from how_to_optimize_gemm_tpu.parallel.serving import make_sampler

    reqs = lambda: [Request(uid=0, prompt=[3, 5], max_new=5)]
    greedy = ServingEngine(CFG, params, batch_slots=1, use_pallas=False)
    out_g = greedy.run(reqs())[0].out
    greedy2 = ServingEngine(CFG, params, batch_slots=1, use_pallas=False,
                            sample=make_sampler(temperature=0.0))
    assert greedy2.run(reqs())[0].out == out_g

    hot = ServingEngine(CFG, params, batch_slots=1, use_pallas=False,
                        sample=make_sampler(temperature=1.5, top_k=8))
    out_h = hot.run(reqs())[0].out
    assert len(out_h) == 5
    assert all(0 <= t < CFG.vocab for t in out_h)


def test_sampler_top_p_and_min_p():
    """Nucleus keeps exactly the smallest prefix reaching p; min_p
    drops everything below the fraction of the max-prob token."""
    from how_to_optimize_gemm_tpu.parallel.serving import make_sampler

    # probs ~ [0.6, 0.25, 0.1, 0.05] after softmax of these logits
    logits = jnp.log(jnp.asarray([[0.6, 0.25, 0.1, 0.05]]))
    draws = set()
    for i in range(64):
        t = int(make_sampler(temperature=1.0, top_p=0.7)(
            logits, jax.random.PRNGKey(i))[0])
        draws.add(t)
    # 0.6 < 0.7 so token 1 is the crossing token; {0,1} kept, 2/3 cut
    assert draws <= {0, 1} and draws == {0, 1}

    draws = set()
    for i in range(64):
        t = int(make_sampler(temperature=1.0, min_p=0.3)(
            logits, jax.random.PRNGKey(i))[0])
        draws.add(t)
    # min_p=0.3: keep probs >= 0.18 -> tokens 0 and 1 only
    assert draws == {0, 1}


def test_repetition_penalty():
    from how_to_optimize_gemm_tpu.parallel.serving import (
        repetition_penalty)

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]])
    recent = jnp.asarray([[0, 1, -1, -1]], jnp.int32)   # -1 = pad
    out = np.asarray(repetition_penalty(logits, recent, 2.0))[0]
    assert out[0] == pytest.approx(1.0)     # positive: divided
    assert out[1] == pytest.approx(-2.0)    # negative: multiplied
    assert out[2] == pytest.approx(0.5)     # untouched
    assert out[3] == pytest.approx(3.0)     # untouched (pad ignored)


def test_engine_kv8_cache(params):
    """The int8 (KV8) cache engine serves correctly — outputs stay close
    to the bf16-cache engine (quantization noise can flip late greedy
    ties, so compare prefix + validity instead of exact equality)."""
    reqs = lambda: [Request(uid=0, prompt=[3, 5, 7], max_new=6),
                    Request(uid=1, prompt=[11, 2], max_new=6)]
    ref = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    out_ref = [r.out for r in ref.run(reqs())]
    q8 = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                       cache_kind="int8")
    out_q8 = [r.out for r in q8.run(reqs())]
    for a, b in zip(out_ref, out_q8):
        assert len(b) == len(a)
        assert a[0] == b[0]          # first token uses no cache history
        assert all(0 <= t < CFG.vocab for t in b)


def test_kv8_logits_distance(params):
    """Quantitative KV8 gate: bf16-cache vs int8-cache logits stay
    within a fixed relative bound at EVERY decode step of a fixed-seed
    prompt (measured ~1.6% max on this seed; 5% = 3x headroom). This
    bounds the quantization noise itself, where the engine test above
    can only compare greedy token streams (which late ties may flip)."""
    prompt = [3, 5, 7, 11, 2, 40, 41, 13]
    cache_ref = llama.init_kv_cache(CFG, 1, jnp.bfloat16)
    cache_q8 = llama.init_kv_cache(CFG, 1, jnp.bfloat16, quantized=True)
    for t, p in enumerate(prompt):
        tok = jnp.asarray([[p]], jnp.int32)
        pos = jnp.asarray([t], jnp.int32)
        lr, cache_ref = llama.decode_step(params, CFG, cache_ref, tok,
                                          pos, use_pallas=False)
        lq, cache_q8 = llama.decode_step(params, CFG, cache_q8, tok,
                                         pos, use_pallas=False)
        dist = float(jnp.max(jnp.abs(lr - lq)))
        scale = float(jnp.max(jnp.abs(lr)))
        assert dist <= 0.05 * scale, (t, dist, scale)


def test_engine_tp_sharded(devices8):
    """ServingEngine over a (1, tp=4) mesh: XLA shards the Megatron
    layout and inserts the ICI collectives; greedy output matches the
    unsharded engine exactly."""
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh

    cfg = llama.LlamaConfig(vocab=64, d_model=16 * 4, n_layers=2,
                            n_heads=4, n_kv_heads=4, d_ff=32 * 4,
                            max_seq=32, weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(5), cfg)
    reqs = lambda: [Request(uid=0, prompt=[3, 5, 7], max_new=5),
                    Request(uid=1, prompt=[9], max_new=5)]
    plain = ServingEngine(cfg, params, batch_slots=2, use_pallas=False)
    out_plain = [r.out for r in plain.run(reqs())]
    mesh = make_mesh(dp=1, tp=4, devices=devices8[:4])
    tp = ServingEngine(cfg, params, batch_slots=2, mesh=mesh,
                       use_pallas=False)
    out_tp = [r.out for r in tp.run(reqs())]
    assert out_tp == out_plain


def test_overlong_prompt_rejected(params):
    eng = ServingEngine(CFG, params, batch_slots=1, use_pallas=False)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_seq"):
        eng.run([Request(uid=0, prompt=list(range(CFG.max_seq + 2)),
                         max_new=1)])


def test_max_new_one_and_first_token_eos(params):
    """The admit-time token must count toward max_new and EOS."""
    eng = ServingEngine(CFG, params, batch_slots=1, use_pallas=False)
    done = eng.run([Request(uid=0, prompt=[3, 5], max_new=1)])
    assert len(done[0].out) == 1 and done[0].done
    # find the greedy first token, then use it as eos: 1 token only
    first = done[0].out[0]
    eng2 = ServingEngine(CFG, params, batch_slots=1, use_pallas=False)
    done2 = eng2.run([Request(uid=0, prompt=[3, 5], max_new=8)],
                     eos_id=first)
    assert done2[0].out == [first]


def test_engine_moe_model():
    """Continuous batching over the MoE (Mixtral-shaped) family matches
    sequential greedy decode — routing stays per-token deterministic in
    the no-drop capacity regime the engine's token counts sit in."""
    mcfg = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                             n_kv_heads=2, d_ff=64, max_seq=32,
                             weight_kind="fp32", n_experts=4)
    mparams = llama.init_params(jax.random.PRNGKey(9), mcfg)
    reqs = [Request(uid=i, prompt=p, max_new=4)
            for i, p in enumerate([[3, 5, 7], [11, 2]])]
    eng = ServingEngine(mcfg, mparams, batch_slots=2, use_pallas=False)
    done = eng.run(reqs)
    for req in done:
        ref = _greedy_reference(mparams, req.prompt, req.max_new,
                                cfg=mcfg)
        assert req.out == ref, (req.uid, req.out, ref)


def test_engine_tp_sharded_moe(devices8):
    """TP-sharded serving of the MoE family: expert stacks shard
    Megatron-style inside each expert; greedy output matches the
    unsharded engine exactly."""
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh

    cfg = llama.LlamaConfig(vocab=64, d_model=16 * 4, n_layers=2,
                            n_heads=4, n_kv_heads=4, d_ff=32 * 4,
                            max_seq=32, weight_kind="fp32",
                            n_experts=4)
    params = llama.init_params(jax.random.PRNGKey(6), cfg)
    reqs = lambda: [Request(uid=0, prompt=[3, 5, 7], max_new=5),
                    Request(uid=1, prompt=[9], max_new=5)]
    plain = ServingEngine(cfg, params, batch_slots=2, use_pallas=False)
    out_plain = [r.out for r in plain.run(reqs())]
    mesh = make_mesh(dp=1, tp=4, devices=devices8[:4])
    tp = ServingEngine(cfg, params, batch_slots=2, mesh=mesh,
                       use_pallas=False)
    out_tp = [r.out for r in tp.run(reqs())]
    assert out_tp == out_plain


def test_serving_cli_moe_smoke(capsys):
    from how_to_optimize_gemm_tpu.parallel import serving
    serving.main(["--d-model", "32", "--n-layers", "1", "--d-ff", "64",
                  "--n-heads", "4", "--n-kv-heads", "2", "--vocab",
                  "64", "--max-seq", "32", "--batch", "2", "--steps",
                  "2", "--weight-kind", "fp32", "--n-experts", "4",
                  "--eager"])
    out = capsys.readouterr().out
    assert "decode tokens/s" in out


def test_run_stream_equals_run():
    """The streaming generator yields every request's tokens in order
    and the combined result equals run()'s batch output."""
    import jax

    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.serving import (Request,
                                                           ServingEngine)
    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=64,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    prompts = [[3, 5, 7], [11, 2], [9, 9, 9, 9]]
    mk = lambda: [Request(uid=i, prompt=list(p), max_new=6)
                  for i, p in enumerate(prompts)]
    ref_eng = ServingEngine(cfg, params, batch_slots=2,
                            use_pallas=False)
    ref = {r.uid: r.out for r in ref_eng.run(mk())}
    eng = ServingEngine(cfg, params, batch_slots=2, use_pallas=False)
    streamed: dict[int, list[int]] = {}
    for uid, tok in eng.run_stream(mk(), window=4):
        streamed.setdefault(uid, []).append(tok)
    assert streamed == ref


def test_lookahead_matches_sync(params):
    """Pipelined-burst decode (run(lookahead=K)) emits bit-identical
    greedy streams to the sync loop, across window boundaries, slot
    counts, and requests outliving several bursts."""
    mk = lambda: [Request(uid=0, prompt=[3, 5, 7], max_new=17),
                  Request(uid=1, prompt=[11, 2], max_new=9),
                  Request(uid=2, prompt=[40, 41, 42, 43], max_new=13)]
    sync = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    ref = {r.uid: r.out for r in sync.run(mk(), window=4)}
    for la in (2, 4):
        eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
        done = eng.run(mk(), window=4, lookahead=la)
        for r in done:
            assert r.out == ref[r.uid], (la, r.uid, r.out, ref[r.uid])
            assert r.done


def test_lookahead_eos_mid_burst(params):
    """An EOS inside a burst terminates the request at the right token
    even though later windows were already in flight; the other slot's
    stream is unaffected (per-slot independence)."""
    sync = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    probe = sync.run([Request(uid=0, prompt=[3, 5, 7], max_new=20)],
                     window=2)[0].out
    # pick an eos_id that fires mid-stream (some emitted token)
    eos = probe[len(probe) // 2]
    mk = lambda: [Request(uid=0, prompt=[3, 5, 7], max_new=20),
                  Request(uid=1, prompt=[11, 2], max_new=20)]
    a = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    ra = {r.uid: r.out for r in a.run(mk(), eos_id=eos, window=2)}
    b = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    rb = {r.uid: r.out
          for r in b.run(mk(), eos_id=eos, window=2, lookahead=4)}
    assert ra == rb


def test_lookahead_paged_and_prefix(params):
    """Burst mode under the paged allocator (page growth covers the
    whole burst up front; releases deferred to the drain) and with the
    prefix cache on."""
    mk = lambda: [Request(uid=i, prompt=[5, 6, 7, 8, 9 + i], max_new=11)
                  for i in range(4)]
    sync = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                         paged=True, prefix_cache=True)
    ref = {r.uid: r.out for r in sync.run(mk(), window=4)}
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, prefix_cache=True)
    done = eng.run(mk(), window=4, lookahead=3)
    for r in done:
        assert r.out == ref[r.uid], (r.uid, r.out, ref[r.uid])
