"""Paged-cache serving engine: parity, allocator accounting, preemption."""
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


def _contiguous_outputs(params, prompts, max_new):
    reqs = [Request(uid=i, prompt=list(p), max_new=max_new)
            for i, p in enumerate(prompts)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False)
    return [r.out for r in eng.run(reqs)]


def test_paged_engine_matches_contiguous(params):
    prompts = [[3, 5, 7], [11, 2], [40, 41, 42, 43]]
    ref = _contiguous_outputs(params, prompts, 6)
    reqs = [Request(uid=i, prompt=list(p), max_new=6)
            for i, p in enumerate(prompts)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, page=8)
    done = eng.run(reqs)
    assert [r.out for r in done] == ref
    assert all(r.done for r in done)
    # all pages returned to the free list after completion
    assert len(eng._free) == eng.n_pages - 1
    assert not any(eng.slot_pages)
    assert (eng.table_np == 0).all()


def test_paged_memory_tracks_tokens(params):
    # pool sized for FAR less than slots x max_seq still serves short
    # requests: 2 slots x max_seq=32 / page=8 would need 8 pages
    # contiguous-equivalent; give 5 (+trash) and run 4 short requests
    reqs = [Request(uid=i, prompt=[i + 1, i + 2], max_new=4)
            for i in range(4)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, page=8, cache_pages=6)
    done = eng.run(reqs)
    assert all(r.done and len(r.out) == 4 for r in done)
    assert len(eng._free) == 5


def test_paged_preemption_keeps_greedy_stream(params):
    # pool too small for both slots to reach full length: preemption
    # must kick in, and the recompute-resumed greedy stream must equal
    # the unconstrained engine's outputs exactly
    prompts = [[3, 5, 7], [11, 2]]
    max_new = 16                       # 2 slots x (3+16) tokens > 3 pages
    ref = _contiguous_outputs(params, prompts, max_new)
    reqs = [Request(uid=i, prompt=list(p), max_new=max_new)
            for i, p in enumerate(prompts)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, page=8, cache_pages=4)
    done = eng.run(reqs, window=4)
    assert [r.out for r in done] == ref
    assert len(eng._free) == 3


def test_paged_pool_too_small_raises(params):
    # a single request needing more pages than the whole pool
    reqs = [Request(uid=0, prompt=list(range(1, 18)), max_new=8)]
    eng = ServingEngine(CFG, params, batch_slots=1, use_pallas=False,
                        paged=True, page=8, cache_pages=3)
    with pytest.raises(RuntimeError, match="pages"):
        eng.run(reqs)


def test_paged_window_invariance(params):
    prompts = [[9, 8, 7], [1, 2, 3, 4]]
    outs = []
    for window in (1, 4):
        reqs = [Request(uid=i, prompt=list(p), max_new=5)
                for i, p in enumerate(prompts)]
        eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                            paged=True, page=8)
        outs.append([r.out for r in eng.run(reqs, window=window)])
    assert outs[0] == outs[1]


def test_paged_kv8_engine_matches_contiguous_kv8(params):
    # paged + contiguous KV8 quantize identically at write time and the
    # CPU fallback reads are the same eager math over the same values —
    # the token streams must agree exactly
    prompts = [[3, 5, 7], [11, 2], [40, 41, 42, 43]]
    reqs_c = [Request(uid=i, prompt=list(p), max_new=6)
              for i, p in enumerate(prompts)]
    eng_c = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                          cache_kind="int8")
    ref = [r.out for r in eng_c.run(reqs_c)]
    reqs_p = [Request(uid=i, prompt=list(p), max_new=6)
              for i, p in enumerate(prompts)]
    eng_p = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                          cache_kind="int8", paged=True, page=8)
    done = eng_p.run(reqs_p)
    assert [r.out for r in done] == ref
    assert len(eng_p._free) == eng_p.n_pages - 1


def test_prefix_cache_reuses_pages(params):
    # same 16-token prefix (2 pages at page=8), different tails: the
    # second request must attach cached pages instead of prefilling
    shared = list(range(1, 17))
    prompts = [shared + [20], shared + [30]]
    ref = []
    for p in prompts:
        eng = ServingEngine(CFG, params, batch_slots=1, use_pallas=False)
        ref.append(eng.run([Request(uid=0, prompt=list(p),
                                    max_new=5)])[0].out)
    eng = ServingEngine(CFG, params, batch_slots=1, use_pallas=False,
                        paged=True, page=8, prefix_cache=True)
    outs = []
    for i, p in enumerate(prompts):
        outs.append(eng.run([Request(uid=i, prompt=list(p),
                                     max_new=5)])[0].out)
    assert outs == ref
    # 2 full pages of the second prompt's prefix were served from cache
    assert eng.prefix_hit_tokens == 16
    # accounting: no live slots -> every page is free or cached, and
    # refcounts are all zero
    assert not any(eng.slot_pages)
    assert (eng._refcount == 0).all()
    assert len(eng._free) + len(eng._cached) == eng.n_pages - 1


def test_prefix_cache_outputs_match_unshared(params):
    # a mixed batch (hit + fresh in one admission pass) through a
    # 2-slot engine equals the plain paged engine token for token
    shared = list(range(1, 17))
    prompts = [shared + [20], [40, 41, 42], shared + [30]]
    reqs = [Request(uid=i, prompt=list(p), max_new=4)
            for i, p in enumerate(prompts)]
    plain = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                          paged=True, page=8)
    ref = [r.out for r in plain.run(
        [Request(uid=i, prompt=list(p), max_new=4)
         for i, p in enumerate(prompts)])]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, page=8, prefix_cache=True)
    done = eng.run(reqs)
    assert [r.out for r in done] == ref
    assert eng.prefix_hit_tokens >= 16


def test_prefix_cache_lru_eviction(params):
    # tiny pool: cached prefixes must be evicted (not hoarded) when a
    # new request needs live pages; serving stays correct throughout
    prompts = [list(range(1, 10)) + [i] for i in range(20, 26)]
    eng = ServingEngine(CFG, params, batch_slots=1, use_pallas=False,
                        paged=True, page=8, cache_pages=4,
                        prefix_cache=True)
    for i, p in enumerate(prompts):
        ref_eng = ServingEngine(CFG, params, batch_slots=1,
                                use_pallas=False)
        ref = ref_eng.run([Request(uid=0, prompt=list(p),
                                   max_new=3)])[0].out
        out = eng.run([Request(uid=i, prompt=list(p),
                               max_new=3)])[0].out
        assert out == ref, (i, out, ref)
    assert (eng._refcount == 0).all()
    assert len(eng._free) + len(eng._cached) == eng.n_pages - 1


def test_paged_engine_tp_sharded(devices8):
    """Paged engine over a (1, tp=4) mesh: the page pools shard on the
    KV-head axis like the contiguous cache; greedy output matches the
    unsharded paged engine exactly."""
    from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh

    cfg = llama.LlamaConfig(vocab=64, d_model=16 * 4, n_layers=2,
                            n_heads=4, n_kv_heads=4, d_ff=32 * 4,
                            max_seq=32, weight_kind="fp32")
    tp_params = llama.init_params(jax.random.PRNGKey(5), cfg)
    reqs = lambda: [Request(uid=0, prompt=[3, 5, 7], max_new=5),
                    Request(uid=1, prompt=[9], max_new=5)]
    plain = ServingEngine(cfg, tp_params, batch_slots=2,
                          use_pallas=False, paged=True, page=8)
    out_plain = [r.out for r in plain.run(reqs())]
    mesh = make_mesh(dp=1, tp=4, devices=devices8[:4])
    tp = ServingEngine(cfg, tp_params, batch_slots=2, mesh=mesh,
                       use_pallas=False, paged=True, page=8,
                       prefix_cache=True)
    out_tp = [r.out for r in tp.run(reqs())]
    assert out_tp == out_plain


def test_paged_tokens_per_sec_runs(params):
    from how_to_optimize_gemm_tpu.parallel.serving import (
        decode_tokens_per_sec)
    tps = decode_tokens_per_sec(CFG, params, batch=2, steps=4,
                                use_pallas=False, paged=True)
    assert tps > 0


@pytest.mark.parametrize("chunk", [4, 8, 64])
def test_chunked_prefill_matches_whole_prompt(params, chunk):
    """prefill_chunk streams admission through fixed C-token chunks —
    the greedy stream must equal whole-prompt admission exactly, for
    chunks smaller, equal to, and larger than the prompts."""
    prompts = [[3, 5, 7, 9, 2, 4, 6, 1, 8], [11, 2], list(range(1, 14))]
    ref = _contiguous_outputs(params, prompts, 6)
    reqs = [Request(uid=i, prompt=list(p), max_new=6)
            for i, p in enumerate(prompts)]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        prefill_chunk=chunk)
    assert [r.out for r in eng.run(reqs)] == ref


def test_chunked_prefill_with_prefix_cache(params):
    """Chunked admission composes with prefix-cache suffix prefill and
    the paged pool (mixed hit+fresh admission batch)."""
    shared = list(range(1, 17))
    prompts = [shared + [20], [40, 41, 42], shared + [30]]
    plain = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                          paged=True, page=8)
    ref = [r.out for r in plain.run(
        [Request(uid=i, prompt=list(p), max_new=4)
         for i, p in enumerate(prompts)])]
    eng = ServingEngine(CFG, params, batch_slots=2, use_pallas=False,
                        paged=True, page=8, prefix_cache=True,
                        prefill_chunk=8)
    done = eng.run([Request(uid=i, prompt=list(p), max_new=4)
                    for i, p in enumerate(prompts)])
    assert [r.out for r in done] == ref
    assert eng.prefix_hit_tokens >= 16
