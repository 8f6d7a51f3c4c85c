"""Speculative decoding UNDER continuous batching: engine equality.

Round-2 verdict (weak #4): speculative decoding was single-request and
could not compose with the serving engine. run_spec composes it: the
greedy token stream must equal run()'s for every batching/paging
configuration, with any draft."""
import dataclasses

import jax
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.parallel.serving import (Request,
                                                       ServingEngine)

CFG = llama.LlamaConfig(vocab=64, d_model=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=128, max_seq=128,
                        weight_kind="fp32")


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(7), CFG)


def _draft(params):
    cfg_d = dataclasses.replace(CFG, n_layers=1)
    params_d = dict(params)
    params_d["layers"] = params["layers"][:1]
    return cfg_d, params_d


PROMPTS = [[3, 5, 7], [11, 2], [40, 41, 42, 43], [9]]


def _reqs(max_new=12):
    return [Request(uid=i, prompt=list(p), max_new=max_new)
            for i, p in enumerate(PROMPTS)]


def _plain(params, **kw):
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        **kw)
    return [r.out for r in eng.run(_reqs())]


def test_spec_engine_equals_plain_contiguous(params):
    ref = _plain(params)
    cfg_d, params_d = _draft(params)
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    done = eng.run_spec(_reqs(), cfg_d, params_d, gamma=3, rounds=2)
    assert [r.out for r in done] == ref
    assert all(r.done for r in done)


def test_spec_engine_self_draft(params):
    """Target as its own draft: near-total acceptance, same stream."""
    ref = _plain(params)
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    done = eng.run_spec(_reqs(), CFG, params, gamma=2, rounds=3)
    assert [r.out for r in done] == ref


def test_spec_engine_paged_with_preemption(params):
    """Spec mode over the paged pool sized to force preemption: the
    recompute-resumed stream stays exact."""
    ref = _plain(params, paged=True, page=8)
    cfg_d, params_d = _draft(params)
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, page=8, cache_pages=8)
    done = eng.run_spec(_reqs(), cfg_d, params_d, gamma=2, rounds=1)
    assert [r.out for r in done] == ref
    assert len(eng._free) == eng.n_pages - 1


def test_spec_engine_tail_fallback(params):
    """max_new large enough to reach the max_seq guard: the plain
    windowed tail path must keep the stream identical to run()."""
    cfg = dataclasses.replace(CFG, max_seq=64)
    cfg_d = dataclasses.replace(cfg, n_layers=1)
    params_d = dict(params)
    params_d["layers"] = params["layers"][:1]
    mk = lambda: [Request(uid=0, prompt=[5, 6], max_new=56),
                  Request(uid=1, prompt=[9], max_new=40)]
    plain = ServingEngine(cfg, params, batch_slots=2, use_pallas=False)
    ref = [r.out for r in plain.run(mk())]
    eng = ServingEngine(cfg, params, batch_slots=2, use_pallas=False)
    done = eng.run_spec(mk(), cfg_d, params_d, gamma=4, rounds=4)
    assert [r.out for r in done] == ref


def test_spec_engine_eos_and_short_max_new(params):
    """EOS mid-round and max_new=1: completion bookkeeping must match
    run()'s exactly (slots free, streams truncated identically)."""
    cfg_d, params_d = _draft(params)
    for eos in (None, 7, 13):
        reqs = lambda: [Request(uid=0, prompt=[3, 5], max_new=1),
                        Request(uid=1, prompt=[11, 2], max_new=9),
                        Request(uid=2, prompt=[40, 41], max_new=5)]
        plain = ServingEngine(CFG, params, batch_slots=2,
                              use_pallas=False)
        ref = [r.out for r in plain.run(reqs(), eos_id=eos)]
        eng = ServingEngine(CFG, params, batch_slots=2,
                            use_pallas=False)
        done = eng.run_spec(reqs(), cfg_d, params_d, eos_id=eos,
                            gamma=2, rounds=2)
        assert [r.out for r in done] == ref, eos
        assert all(r.done for r in done)


def test_spec_engine_sampled_round_invariance(params):
    """Sampled spec serving: per-request positional key streams make
    the emitted stream independent of round grouping (and distributed
    as ancestral sampling — reject_round_device's theorem). Self-draft:
    near-total acceptance; rounds=1 and rounds=3 must emit identical
    streams."""
    import jax as _jax

    from how_to_optimize_gemm_tpu.parallel.serving import make_sampler
    outs = []
    for rounds in (1, 3):
        eng = ServingEngine(CFG, params, batch_slots=2,
                            use_pallas=False,
                            sample=make_sampler(0.8, top_k=8))
        done = eng.run_spec(_reqs(max_new=10), CFG, params,
                            gamma=2, rounds=rounds, temperature=0.8,
                            top_k=8, key=_jax.random.PRNGKey(42))
        outs.append([r.out for r in done])
        assert all(r.done for r in done)
        assert all(0 <= t < CFG.vocab for o in outs[-1] for t in o)
    assert outs[0] == outs[1]


def test_spec_engine_sampled_bad_draft_runs(params):
    """Mismatched draft under sampled spec serving: valid tokens,
    everything completes (distribution is the rejection theorem's)."""
    from how_to_optimize_gemm_tpu.parallel.serving import make_sampler
    cfg_d, params_d = _draft(params)
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        sample=make_sampler(1.0, top_k=12))
    done = eng.run_spec(_reqs(max_new=8), cfg_d, params_d, gamma=3,
                        rounds=2, temperature=1.0, top_k=12)
    assert all(r.done and len(r.out) == 8 for r in done)


def test_lookup_spec_engine_equals_plain_contiguous(params):
    """run_spec_lookup (weights-free prompt-lookup draft): stream
    identical to run() — a lookup miss is an accept-0 round."""
    ref = _plain(params)
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    done = eng.run_spec_lookup(_reqs(), gamma=3, ngram=2, rounds=2)
    assert [r.out for r in done] == ref
    assert all(r.done for r in done)


def test_lookup_spec_engine_paged(params):
    ref = _plain(params)
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True)
    done = eng.run_spec_lookup(_reqs(), gamma=3, ngram=3, rounds=2)
    assert [r.out for r in done] == ref


def test_lookup_spec_engine_repetitive_prompt_accepts(params):
    """A perfectly periodic prompt should yield nonzero acceptance on
    a random-init model too, whenever the model happens to continue a
    period — and regardless, the stream must equal run()'s. Also
    covers prompts shorter than the n-gram (draft degenerates to a
    pending-fill; exactness unaffected)."""
    def reqs():
        return [Request(uid=0, prompt=[5, 6, 5, 6, 5, 6, 5, 6],
                        max_new=10),
                Request(uid=1, prompt=[4], max_new=6)]

    plain = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    ref = [r.out for r in plain.run(reqs())]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    done = eng.run_spec_lookup(reqs(), gamma=4, ngram=3, rounds=2)
    assert [r.out for r in done] == ref
