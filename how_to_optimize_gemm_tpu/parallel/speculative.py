"""Speculative decoding — draft/verify serving on the same KV machinery.

Decode is weight-streaming-bound (RESULTS.md: every 7B decode number
sits on the weight roofline), so a small draft model can run gamma
cheap steps and the big target can check all of them in ONE forward:
the target's per-token cost is amortized over up to gamma+1 emitted
tokens. Two variants share the machinery:

- GREEDY (speculative_decode): the emitted stream equals target-only
  greedy decoding EXACTLY regardless of draft quality (a bad draft
  only costs speed, never correctness).
- SAMPLED (speculative_sample): Leviathan-style rejection sampling —
  accept draft token x with prob min(1, p(x)/q(x)), resample the first
  rejection from norm(max(p-q, 0)), bonus-draw on full acceptance. The
  emitted stream is distributed exactly as target-only ancestral
  sampling at the same (temperature, top_k, top_p); the round math is
  pure host numpy (reject_round) and is unit-tested distributionally.

Both are asserted in tests/test_speculative.py.

TPU-first shape discipline: the whole loop compiles to THREE jitted
step shapes — the target verify is always (1, gamma+1), the draft
catch-up is (1, 1) when the last round rejected (the draft cache is
ahead, holding to-be-overwritten guesses — the engine's own
overwrite-before-exposure invariant, parallel/serving._admit) and
(1, 2) when all gamma drafts were accepted (the draft never saw its
own last guess). No data-dependent shapes anywhere; acceptance only
picks which PRECOMPILED step runs next.

Cache bookkeeping invariant: a position's K/V may be garbage only
while every committed token is younger than it; rejected guesses are
rewritten (target: next verify starts at the first wrong position;
draft: the catch-up feed) before any query attends to them.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from how_to_optimize_gemm_tpu.models import llama


@dataclasses.dataclass
class SpecStats:
    tokens: int = 0
    target_calls: int = 0
    draft_calls: int = 0
    accepted: int = 0            # accepted draft tokens (excl. bonus)

    @property
    def tokens_per_target_call(self) -> float:
        return self.tokens / max(1, self.target_calls)

    @property
    def accept_rate(self) -> float:
        return self.accepted / max(1, self.draft_calls)


def _prefill(cfg, params, prompt: np.ndarray, use_pallas):
    cache = llama.init_kv_cache(cfg, batch=1, dtype=jnp.float32)
    logits, cache = llama.decode_step(
        params, cfg, cache, jnp.asarray(prompt[None, :]), jnp.int32(0),
        use_pallas=use_pallas, prefill_self=True)
    return logits[:, -1], cache


def greedy_decode(cfg, params, prompt, n_new: int,
                  use_pallas: bool | None = None) -> list[int]:
    """Target-only greedy decoding — the oracle speculative_decode must
    reproduce token-for-token."""
    prompt = np.asarray(prompt, np.int32)
    logits, cache = _prefill(cfg, params, prompt, use_pallas)
    out = []
    pos = len(prompt)
    for _ in range(n_new):
        nxt = int(jnp.argmax(logits[0]))
        out.append(nxt)
        step, cache = llama.decode_step(
            params, cfg, cache, jnp.asarray([[nxt]]), jnp.int32(pos),
            use_pallas=use_pallas)
        logits = step[:, -1]
        pos += 1
    return out


def speculative_decode(cfg_t, params_t, cfg_d, params_d, prompt,
                       n_new: int, gamma: int = 4,
                       use_pallas: bool | None = None
                       ) -> tuple[list[int], SpecStats]:
    """Greedy speculative decoding: returns (tokens, stats) with
    ``tokens == greedy_decode(target)`` exactly.

    Per round: the draft runs ``gamma`` single-token steps; the target
    verifies the chain in one (1, gamma+1) forward whose logits yield
    its own greedy choices g_0..g_gamma; the longest prefix of drafts
    matching g is emitted plus the bonus token g_a — between 1 and
    gamma+1 tokens per target call."""
    assert cfg_t.vocab == cfg_d.vocab, "draft must share the vocab"
    prompt = np.asarray(prompt, np.int32)
    stats = SpecStats()

    t_logits, t_cache = _prefill(cfg_t, params_t, prompt, use_pallas)
    _, d_cache = _prefill(cfg_d, params_d, prompt, use_pallas)
    stats.target_calls += 1
    stats.draft_calls += 1

    pending = int(jnp.argmax(t_logits[0]))      # seq[n], not yet cached
    out: list[int] = [pending]                  # the prefill's token
    stats.tokens += 1
    n = len(prompt)                             # both caches hold seq[:n]
    d_feed = [pending]                          # draft catch-up + pending
    while len(out) < n_new and n + gamma + 1 < cfg_t.max_seq:
        # -- draft: catch up (1 or 2 tokens), then gamma - 1 more steps
        drafts = []
        feed = jnp.asarray([d_feed], jnp.int32)
        logits, d_cache = llama.decode_step(
            params_d, cfg_d, d_cache, feed,
            jnp.int32(n + 1 - len(d_feed)), use_pallas=use_pallas)
        stats.draft_calls += 1
        drafts.append(int(jnp.argmax(logits[0, -1])))
        for j in range(1, gamma):
            logits, d_cache = llama.decode_step(
                params_d, cfg_d, d_cache,
                jnp.asarray([[drafts[-1]]]), jnp.int32(n + j),
                use_pallas=use_pallas)
            stats.draft_calls += 1
            drafts.append(int(jnp.argmax(logits[0, -1])))

        # -- target: verify the whole chain in one forward
        chain = jnp.asarray([[pending] + drafts], jnp.int32)
        v_logits, t_cache = llama.decode_step(
            params_t, cfg_t, t_cache, chain, jnp.int32(n),
            use_pallas=use_pallas)
        stats.target_calls += 1
        greedy = np.asarray(jnp.argmax(v_logits[0], axis=-1))

        # -- accept the longest matching prefix + the bonus token
        a = 0
        while a < gamma and drafts[a] == int(greedy[a]):
            a += 1
        emitted = drafts[:a] + [int(greedy[a])]
        stats.accepted += a
        out.extend(emitted)
        stats.tokens += len(emitted)
        # target cache: correct through pos n + a (fed pending+drafts);
        # garbage beyond is overwritten by the next verify. Draft cache:
        # holds guesses through n + gamma - 1 — ahead (overwritten) when
        # a < gamma, one behind when all gamma were accepted.
        n += a + 1
        pending = int(greedy[a])
        d_feed = ([drafts[-1], pending] if a == gamma else [pending])
    return out[:n_new], stats


def _round_probs(logits, temperature, top_k, top_p):
    """Filtered softmax rows on device -> host float64 (…, V)."""
    from how_to_optimize_gemm_tpu.parallel.serving import filter_logits
    f = filter_logits(logits, temperature, top_k, top_p)
    return np.asarray(jax.nn.softmax(f, axis=-1), np.float64)


def draw_token(prob_row, key, pos: int) -> int:
    """Position-keyed categorical draw from a host probability row.

    The key discipline is the sampled-speculative correctness contract:
    a token at absolute sequence position ``pos`` is ALWAYS drawn with
    fold_in(key, pos), whoever draws it — so when draft == target every
    proposal is accepted (p/q == 1) and the emitted stream is
    bit-identical to target-only ancestral sampling (tested)."""
    k = jax.random.fold_in(key, pos)
    logp = jnp.log(jnp.asarray(prob_row, jnp.float32) + 1e-38)
    return int(jax.random.categorical(k, logp))


def _accept_u(key, pos: int) -> float:
    """The accept-test uniform for position pos — a distinct stream
    from the token draws (fold_in twice)."""
    return float(jax.random.uniform(
        jax.random.fold_in(jax.random.fold_in(key, pos), 1)))


def reject_round(q_rows, xs, p_rows, key, base_pos: int):
    """One verify round of Leviathan-style rejection sampling, pure
    host math (unit-tested distributionally without a model).

    q_rows (gamma, V): draft probs for positions base_pos..+gamma-1;
    xs: the draft's sampled tokens; p_rows (gamma+1, V): target probs
    for positions base_pos..+gamma. Accept x_i while
    u_i < p_i(x_i)/q_i(x_i); at the first rejection emit a residual
    draw from norm(max(p_i - q_i, 0)); if all accepted emit a bonus
    draw from p_gamma. Emitted tokens are distributed EXACTLY as
    target-only ancestral sampling (the speculative-sampling theorem).
    Returns (emitted, accepted_count)."""
    gamma = len(xs)
    for i in range(gamma):
        pos = base_pos + i
        px, qx = p_rows[i][xs[i]], q_rows[i][xs[i]]
        if _accept_u(key, pos) < min(1.0, px / max(qx, 1e-38)):
            continue
        resid = np.maximum(p_rows[i] - q_rows[i], 0.0)
        tot = resid.sum()
        if tot <= 0.0:       # p == q: residual empty, accept the draft
            continue
        # the residual draw MUST be independent of the draft's draw at
        # this position (same-key categorical draws are correlated,
        # which biases the emitted marginal — measured 8.7 sigma on the
        # unit test): fold a distinct stream id before the position key
        return list(xs[:i]) + [draw_token(
            resid / tot, jax.random.fold_in(key, 2), pos)], i
    bonus = draw_token(p_rows[gamma], key, base_pos + gamma)
    return list(xs) + [bonus], gamma


def ancestral_sample(cfg, params, prompt, n_new: int, key=None,
                     temperature: float = 1.0, top_k: int = 0,
                     top_p: float = 0.0,
                     use_pallas: bool | None = None) -> list[int]:
    """Target-only positional-keyed sampling — the distributional
    oracle for speculative_sample (and bit-exact when draft == target,
    see draw_token)."""
    key = jax.random.PRNGKey(0) if key is None else key
    prompt = np.asarray(prompt, np.int32)
    logits, cache = _prefill(cfg, params, prompt, use_pallas)
    out = []
    pos = len(prompt)
    for _ in range(n_new):
        p = _round_probs(logits[0], temperature, top_k, top_p)
        nxt = draw_token(p, key, pos)
        out.append(nxt)
        step, cache = llama.decode_step(
            params, cfg, cache, jnp.asarray([[nxt]]), jnp.int32(pos),
            use_pallas=use_pallas)
        logits = step[:, -1]
        pos += 1
    return out


def speculative_sample(cfg_t, params_t, cfg_d, params_d, prompt,
                       n_new: int, gamma: int = 4, key=None,
                       temperature: float = 1.0, top_k: int = 0,
                       top_p: float = 0.0,
                       use_pallas: bool | None = None
                       ) -> tuple[list[int], SpecStats]:
    """SAMPLED speculative decoding (rejection sampling): the emitted
    stream is distributed exactly as target-only ancestral sampling at
    the same (temperature, top_k, top_p) — draft quality changes speed
    (accept rate), never the distribution. Same three static step
    shapes and cache bookkeeping as the greedy variant; both sides'
    logits go through the SAME filter_logits adjustment before the
    accept test (serving.filter_logits)."""
    assert cfg_t.vocab == cfg_d.vocab, "draft must share the vocab"
    key = jax.random.PRNGKey(0) if key is None else key
    prompt = np.asarray(prompt, np.int32)
    stats = SpecStats()

    t_logits, t_cache = _prefill(cfg_t, params_t, prompt, use_pallas)
    _, d_cache = _prefill(cfg_d, params_d, prompt, use_pallas)
    stats.target_calls += 1
    stats.draft_calls += 1

    n = len(prompt)
    p0 = _round_probs(t_logits[0], temperature, top_k, top_p)
    pending = draw_token(p0, key, n)            # seq[n], not yet cached
    out: list[int] = [pending]
    stats.tokens += 1
    d_feed = [pending]
    while len(out) < n_new and n + gamma + 1 < cfg_t.max_seq:
        # -- draft: catch up, then gamma - 1 more sampled steps
        drafts, q_rows = [], []
        feed = jnp.asarray([d_feed], jnp.int32)
        logits, d_cache = llama.decode_step(
            params_d, cfg_d, d_cache, feed,
            jnp.int32(n + 1 - len(d_feed)), use_pallas=use_pallas)
        stats.draft_calls += 1
        q = _round_probs(logits[0, -1], temperature, top_k, top_p)
        q_rows.append(q)
        drafts.append(draw_token(q, key, n + 1))
        for j in range(1, gamma):
            logits, d_cache = llama.decode_step(
                params_d, cfg_d, d_cache,
                jnp.asarray([[drafts[-1]]]), jnp.int32(n + j),
                use_pallas=use_pallas)
            stats.draft_calls += 1
            q = _round_probs(logits[0, -1], temperature, top_k, top_p)
            q_rows.append(q)
            drafts.append(draw_token(q, key, n + 1 + j))

        # -- target: verify the whole chain in one forward
        chain = jnp.asarray([[pending] + drafts], jnp.int32)
        v_logits, t_cache = llama.decode_step(
            params_t, cfg_t, t_cache, chain, jnp.int32(n),
            use_pallas=use_pallas)
        stats.target_calls += 1
        p_rows = _round_probs(v_logits[0], temperature, top_k, top_p)

        emitted, a = reject_round(q_rows, drafts, p_rows, key, n + 1)
        stats.accepted += a
        out.extend(emitted)
        stats.tokens += len(emitted)
        n += a + 1
        pending = emitted[-1]
        d_feed = ([drafts[-1], pending] if a == gamma else [pending])
    return out[:n_new], stats


def main(argv=None):
    """Tiny CLI A/B: speculative vs plain greedy on random-init models
    (tokens/target-call is the architecture-level win; real-checkpoint
    accept rates need a trained draft)."""
    import argparse
    import dataclasses as dc
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--n-new", type=int, default=64)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--n-layers", type=int, default=22)
    ap.add_argument("--draft-layers", type=int, default=4)
    ap.add_argument("--weight-kind", default="int8")
    args = ap.parse_args(argv)
    cfg_t = llama.LlamaConfig(
        vocab=32000, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=32, n_kv_heads=4, d_ff=args.d_model * 11 // 4,
        max_seq=2048, weight_kind=args.weight_kind)
    cfg_d = dc.replace(cfg_t, n_layers=args.draft_layers,
                       d_model=args.d_model // 4, n_heads=8,
                       d_ff=args.d_model * 11 // 16)
    kt, kd = jax.random.split(jax.random.PRNGKey(0))
    params_t = llama.init_params(kt, cfg_t)
    params_d = llama.init_params(kd, cfg_d)
    prompt = np.arange(1, 17) % cfg_t.vocab
    toks, stats = speculative_decode(cfg_t, params_t, cfg_d, params_d,
                                     prompt, args.n_new,
                                     gamma=args.gamma)
    ref = greedy_decode(cfg_t, params_t, prompt, args.n_new)
    print(f"spec == greedy: {toks == ref}; tokens/target-call "
          f"{stats.tokens_per_target_call:.2f} "
          f"(target calls {stats.target_calls}, accept rate "
          f"{stats.accept_rate:.2f})")


if __name__ == "__main__":
    main()
