"""Speculative decoding: exact greedy equivalence + amortization."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.parallel import speculative
from how_to_optimize_gemm_tpu.parallel.speculative import (
    greedy_decode, speculative_decode)

CFG = llama.LlamaConfig(vocab=64, d_model=32, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=64, max_seq=128,
                        weight_kind="fp32")


@pytest.fixture(scope="module")
def target():
    return llama.init_params(jax.random.PRNGKey(0), CFG)


def test_spec_equals_greedy_with_a_bad_draft(target):
    """THE property: a mismatched draft (different seed AND different
    shape) costs speed, never correctness — the emitted stream equals
    target-only greedy token-for-token."""
    cfg_d = dataclasses.replace(CFG, n_layers=1, d_ff=32)
    draft = llama.init_params(jax.random.PRNGKey(7), cfg_d)
    prompt = np.arange(3, 11) % CFG.vocab
    out, stats = speculative_decode(CFG, target, cfg_d, draft, prompt,
                                    n_new=24, gamma=3)
    ref = greedy_decode(CFG, target, prompt, 24)
    assert out == ref
    assert stats.tokens == len(out) or stats.tokens >= 24
    # a random draft almost never matches: most rounds emit just the
    # bonus token, so target calls stay close to the token count
    assert stats.target_calls <= 24 + 1


def test_spec_self_draft_amortizes(target):
    """With the target as its own draft every guess is accepted:
    gamma+1 tokens per verify, so target calls collapse to
    ~n/(gamma+1) — the amortization the scheme exists for."""
    prompt = np.arange(1, 9) % CFG.vocab
    gamma = 3
    out, stats = speculative_decode(CFG, target, CFG, target, prompt,
                                    n_new=24, gamma=gamma)
    ref = greedy_decode(CFG, target, prompt, 24)
    assert out == ref
    # acceptance is ~1.0 but not exactly: the (1, gamma+1) verify and
    # the (1, 1) draft step round fp32 differently (~1e-6 logit noise),
    # so a genuine near-tie can flip one argmax — correctness is
    # unaffected (equality above), only a verify is wasted
    assert stats.accept_rate > 0.9
    # ~1 prefill + ceil(24 / (gamma+1)) verifies (+1 slack for a tie)
    assert stats.target_calls <= 2 + -(-24 // (gamma + 1))
    assert stats.tokens_per_target_call >= gamma


def test_spec_respects_max_seq(target):
    """The loop stops before any verify chain would cross max_seq."""
    prompt = np.arange(0, CFG.max_seq - 6) % CFG.vocab
    out, _ = speculative_decode(CFG, target, CFG, target, prompt,
                                n_new=1000, gamma=3)
    assert len(prompt) + len(out) + 3 + 1 <= CFG.max_seq + 3 + 1
    assert len(out) < 1000


def test_reject_round_preserves_target_distribution():
    """The speculative-sampling theorem, tested on the pure host math:
    whatever the draft distribution q, the first emitted token of a
    verify round is distributed exactly as the target p. 20k keyed
    trials on a deliberately skewed (q, p) pair; total-variation
    distance < 2%."""
    from how_to_optimize_gemm_tpu.parallel.speculative import reject_round

    rng = np.random.default_rng(0)
    q = rng.dirichlet(np.ones(6) * 0.5)
    p = rng.dirichlet(np.ones(6) * 0.5)
    counts = np.zeros(6)
    trials = 8000
    for t in range(trials):
        key = jax.random.PRNGKey(t)
        # draft samples x ~ q with the SAME keying reject_round uses
        from how_to_optimize_gemm_tpu.parallel.speculative import (
            draw_token)
        x = draw_token(q, key, 100)
        emitted, _ = reject_round(np.asarray([q]), [x],
                                  np.asarray([p, p]), key, 100)
        counts[emitted[0]] += 1
    tv = 0.5 * np.abs(counts / trials - p).sum()
    assert tv < 0.03, (tv, counts / trials, p)


def test_spec_sample_self_draft_is_ancestral(target):
    """draft == target: every proposal accepted (p/q == 1), and the
    positional key discipline makes the emitted stream bit-identical
    to target-only ancestral sampling."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        ancestral_sample, speculative_sample)

    prompt = np.arange(1, 9) % CFG.vocab
    key = jax.random.PRNGKey(42)
    out, stats = speculative_sample(CFG, target, CFG, target, prompt,
                                    n_new=20, gamma=3, key=key,
                                    temperature=0.9)
    ref = ancestral_sample(CFG, target, prompt, 20, key=key,
                           temperature=0.9)
    assert out == ref
    assert stats.accept_rate > 0.9


def test_spec_sample_bad_draft_valid_and_filtered(target):
    """A mismatched draft still emits valid tokens, and with top_k the
    emitted tokens always lie inside the TARGET's top-k support at
    their position (the filters adjust both sides of the accept
    test)."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        speculative_sample)

    cfg_d = dataclasses.replace(CFG, n_layers=1, d_ff=32)
    draft = llama.init_params(jax.random.PRNGKey(7), cfg_d)
    prompt = np.arange(3, 11) % CFG.vocab
    out, stats = speculative_sample(CFG, target, cfg_d, draft, prompt,
                                    n_new=16, gamma=3,
                                    key=jax.random.PRNGKey(1),
                                    temperature=1.2, top_k=8)
    assert len(out) == 16
    assert all(0 <= t < CFG.vocab for t in out)
    assert 0.0 <= stats.accept_rate <= 1.0
    # verify top-k support: replay target-only with the emitted prefix
    from how_to_optimize_gemm_tpu.models import llama as _l
    cache = _l.init_kv_cache(CFG, 1, jax.numpy.float32)
    seq = list(prompt) + out
    logits, _ = _l.decode_step(
        target, CFG, cache, jax.numpy.asarray([seq], jax.numpy.int32),
        jax.numpy.int32(0), prefill_self=True, use_pallas=False)
    for i, tok in enumerate(out):
        row = np.asarray(logits[0, len(prompt) + i - 1])
        topk = set(np.argsort(row)[-8:].tolist())
        assert tok in topk, (i, tok)


def test_spec_gamma_one(target):
    """gamma=1 degenerates gracefully and still matches greedy."""
    cfg_d = dataclasses.replace(CFG, n_layers=1)
    draft = llama.init_params(jax.random.PRNGKey(3), cfg_d)
    prompt = np.asarray([5, 9, 2, 2])
    out, _ = speculative_decode(CFG, target, cfg_d, draft, prompt,
                                n_new=9, gamma=1)
    assert out == greedy_decode(CFG, target, prompt, 9)


def test_spec_device_equals_greedy_bad_draft(target):
    """The device-looped variant (rounds per dispatch, uniform catch-up
    feed, on-device accept logic) keeps the exact-greedy property with
    a mismatched draft."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        speculative_decode_device)
    cfg_d = dataclasses.replace(CFG, n_layers=1, d_ff=32)
    draft = llama.init_params(jax.random.PRNGKey(7), cfg_d)
    prompt = np.arange(3, 11) % CFG.vocab
    ref = greedy_decode(CFG, target, prompt, 24)
    for rounds in (1, 3):
        out, stats = speculative_decode_device(
            CFG, target, cfg_d, draft, prompt, n_new=24, gamma=3,
            rounds=rounds)
        assert out == ref, rounds
        assert stats.tokens >= 24


def test_spec_device_self_draft_amortizes(target):
    """Self-draft through the device loop: near-full acceptance and
    rounds*(gamma+1) tokens per dispatch."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        speculative_decode_device)
    prompt = np.arange(1, 9) % CFG.vocab
    out, stats = speculative_decode_device(CFG, target, CFG, target,
                                           prompt, n_new=24, gamma=3,
                                           rounds=2)
    assert out == greedy_decode(CFG, target, prompt, 24)
    assert stats.accept_rate > 0.9


def test_reject_round_device_matches_host():
    """The jnp rejection round mirrors the host math stream-for-stream:
    identical float32 inputs -> identical emitted tokens."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        reject_round, reject_round_device)
    rng = np.random.default_rng(0)
    v, gamma = 13, 3
    for case in range(150):
        q = rng.random((gamma, v), np.float32)
        q /= q.sum(-1, keepdims=True)
        p = rng.random((gamma + 1, v), np.float32)
        p /= p.sum(-1, keepdims=True)
        if case % 3 == 0:
            p[:gamma] = q          # residual-empty branch
        xs = rng.integers(0, v, gamma).astype(np.int32)
        key = jax.random.PRNGKey(case)
        base = int(rng.integers(0, 50))
        emitted, a = reject_round(q.astype(np.float64), list(xs),
                                  p.astype(np.float64), key, base)
        toks_d, a_d = reject_round_device(jnp.asarray(q),
                                          jnp.asarray(xs),
                                          jnp.asarray(p), key, base)
        assert int(a_d) == a, case
        assert np.asarray(toks_d)[:a + 1].tolist() == emitted, case


def test_spec_sample_device_self_draft_is_ancestral(target):
    """Self-draft through the device-looped sampled variant: every
    accept test passes and every draw shares ancestral_sample's
    positional key stream -> bit-identical output."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        ancestral_sample, speculative_sample_device)
    prompt = np.arange(1, 9) % CFG.vocab
    key = jax.random.PRNGKey(11)
    ref = ancestral_sample(CFG, target, prompt, 20, key=key,
                           temperature=0.9, top_k=8)
    out, stats = speculative_sample_device(
        CFG, target, CFG, target, prompt, 20, gamma=3, rounds=2,
        key=key, temperature=0.9, top_k=8)
    assert out == ref
    assert stats.accept_rate > 0.9


def test_spec_sample_device_bad_draft_valid(target):
    """A mismatched draft: output stays inside the filtered support and
    the machinery runs (distributional exactness is reject_round's
    theorem, unit-tested above and in the host variant's tests)."""
    import dataclasses as dc

    from how_to_optimize_gemm_tpu.parallel.speculative import (
        speculative_sample_device)
    cfg_d = dc.replace(CFG, n_layers=1)
    draft = llama.init_params(jax.random.PRNGKey(3), cfg_d)
    out, stats = speculative_sample_device(
        CFG, target, cfg_d, draft, np.arange(3, 11) % CFG.vocab, 16,
        gamma=2, rounds=2, key=jax.random.PRNGKey(5), temperature=1.0,
        top_k=12)
    assert len(out) == 16
    assert all(0 <= t < CFG.vocab for t in out)
    assert stats.tokens >= 16


def test_windowed_decode_matches_greedy(target):
    """The plain-decode A/B baseline must itself be exact: windowed
    blocks emit the same stream as step-by-step greedy decoding."""
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        windowed_greedy_decode)
    prompt = np.arange(5, 13) % CFG.vocab
    ref = greedy_decode(CFG, target, prompt, 20)
    for window in (1, 8):
        assert windowed_greedy_decode(CFG, target, prompt, 20,
                                      window=window) == ref, window


def test_truncated_draft_shares_weights(target):
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        truncated_draft)
    cfg_d, params_d = truncated_draft(CFG, target, 1)
    assert cfg_d.n_layers == 1
    assert params_d["layers"][0] is target["layers"][0]
    assert params_d["embed"] is target["embed"]
    # it runs and proposes (exactness with ANY draft is the other tests)
    from how_to_optimize_gemm_tpu.parallel.speculative import (
        speculative_decode_device)
    out, _ = speculative_decode_device(CFG, target, cfg_d, params_d,
                                       np.arange(1, 7), 8, gamma=2,
                                       rounds=1)
    assert len(out) == 8


@pytest.mark.parametrize("gamma,ngram", [(4, 3), (8, 2)])
def test_prompt_lookup_exact(gamma, ngram):
    """Prompt-lookup (weights-free) speculative decoding emits EXACTLY
    the target-only greedy stream, whatever the lookup's accept rate."""
    cfg = llama.LlamaConfig(vocab=48, d_model=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, d_ff=128, max_seq=256,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = (np.arange(12) % 5 + 3).astype(np.int32)  # repetitive
    ref = speculative.greedy_decode(cfg, params, prompt, 40,
                                    use_pallas=False)
    out, stats = speculative.prompt_lookup_decode_device(
        cfg, params, prompt, 40, gamma=gamma, ngram=ngram, rounds=4,
        use_pallas=False)
    assert out == ref[:len(out)] and len(out) == 40
    assert stats.target_calls < 40   # rounds batch the verifies


def test_prompt_lookup_accepts_on_repetition():
    """On a stream that actually repeats, the lookup draft must accept:
    random-init greedy decode falls into a cycle, and once one period
    of the cycle is in history, lookup proposes it."""
    cfg = llama.LlamaConfig(vocab=16, d_model=32, n_layers=1, n_heads=2,
                            n_kv_heads=1, d_ff=64, max_seq=512,
                            weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    out, stats = speculative.prompt_lookup_decode_device(
        cfg, params, (np.arange(8) % 3 + 2).astype(np.int32), 120,
        gamma=8, ngram=3, rounds=4, use_pallas=False)
    ref = speculative.greedy_decode(cfg, params,
                                    (np.arange(8) % 3 + 2).astype(
                                        np.int32), 120,
                                    use_pallas=False)
    assert out == ref[:len(out)]
    # tiny-vocab greedy streams cycle; the lookup must exploit it
    # (measured here: ~2.5 tokens per verify at gamma=8)
    assert stats.tokens_per_target_call > 1.5, stats


def test_sampled_rejection_distribution_check():
    """The dist-check harness itself (round-5): spec-vs-plain empirical
    token distributions agree within the same-distribution control's
    noise, and the broken-path reference (draft-only distribution) is
    far — i.e. the check has discriminating power. Deterministic seeds,
    so this asserts the real statistical outcome, not just plumbing."""
    from how_to_optimize_gemm_tpu.parallel.speculative import dist_check
    res = dist_check(n_seeds=48, n_new=3, verbose=False)
    assert res["pass"], res
    # power: a broken always-accept path would sit near l1_power, which
    # must be well above the accept threshold for the check to matter
    assert res["l1_power"] > 1.5 * res["l1_control"] + 0.15, res
