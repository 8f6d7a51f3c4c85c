"""Speculative decoding: exact greedy equivalence + amortization."""
import dataclasses

import jax
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.models import llama
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


def test_spec_gamma_one(target):
    """gamma=1 degenerates gracefully and still matches greedy."""
    cfg_d = dataclasses.replace(CFG, n_layers=1)
    draft = llama.init_params(jax.random.PRNGKey(3), cfg_d)
    prompt = np.asarray([5, 9, 2, 2])
    out, _ = speculative_decode(CFG, target, cfg_d, draft, prompt,
                                n_new=9, gamma=1)
    assert out == greedy_decode(CFG, target, prompt, 9)
