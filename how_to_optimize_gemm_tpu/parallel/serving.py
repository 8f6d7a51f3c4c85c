"""Serving slice: prefill + decode engine with continuous batching.

The north-star capability (BASELINE.json configs[4]): quantized decode
with a slot-based continuous batcher. Device-side work is two jitted
functions (prefill, decode_step) over static shapes; the batcher is host
code that swaps finished slots for queued prompts between steps — the same
split a production engine uses (static compiled step, dynamic scheduling
outside).

Tensor parallelism: pass a mesh and the params are placed with the
Megatron layout from parallel/sharding.py; XLA inserts the ICI collectives
inside the jitted step. Data parallelism for serving = independent engine
replicas (no gradient exchange), so dp here means "more slots".
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from how_to_optimize_gemm_tpu.models import llama


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]
    max_new: int
    out: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    adapter: int = -1       # LoRA adapter id (-1 = base model)
    # latency bookkeeping (host wall clock, filled by the engine):
    t_submit: float = 0.0   # run() saw the request
    t_first: float = 0.0    # first token produced (TTFT = t_first-t_submit)
    t_done: float = 0.0


def filter_logits(logits, temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 0.0, min_p: float = 0.0):
    """Temperature + composable support filters on (…, V) fp32 logits.

    top_k > 0 restricts to the k largest logits; top_p in (0, 1)
    applies nucleus filtering (smallest set of tokens whose probability
    mass reaches p); min_p in (0, 1) drops tokens whose probability is
    below min_p x the top token's. Filters compose (k, then p, then
    min_p) — all static-shape sorts/scans, jit-friendly. Shared by the
    engine sampler and speculative sampling (both sides of the
    draft/target accept test must see the SAME adjusted
    distributions)."""
    scaled = logits.astype(jnp.float32) / temperature
    if top_k:
        vals = jax.lax.top_k(scaled, top_k)[0]
        scaled = jnp.where(scaled >= vals[..., -1:], scaled, -1e30)
    if 0.0 < top_p < 1.0:
        # nucleus: sort descending, keep the prefix whose cumulative
        # softmax mass is < p PLUS the first token crossing p
        srt = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p        # mass BEFORE this token
        # threshold = smallest kept logit
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        scaled = jnp.where(scaled >= thresh, scaled, -1e30)
    if 0.0 < min_p < 1.0:
        probs = jax.nn.softmax(scaled, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        scaled = jnp.where(probs >= min_p * pmax, scaled, -1e30)
    return scaled


def make_sampler(temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 0.0, min_p: float = 0.0):
    """Device-side sampler: logits (B, V) + key -> (B,) int32 tokens.
    temperature <= 0 means greedy; see filter_logits for the filter
    semantics."""
    def sample(logits, key):
        logits = logits.astype(jnp.float32)
        if temperature <= 0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = filter_logits(logits, temperature, top_k, top_p, min_p)
        return jax.random.categorical(key, scaled, axis=-1).astype(
            jnp.int32)
    return sample


def repetition_penalty(logits, recent_tokens, penalty: float):
    """CTRL-style repetition penalty: logits (B, V), recent_tokens
    (B, N) int32 (pad with -1); penalized tokens' logits divide by
    ``penalty`` when positive and multiply when negative."""
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    # pad entries clip onto token 0, so mark with .max (a pad's False
    # must not overwrite a real token-0 mark; .set keeps the LAST
    # duplicate write, which would)
    ids = jnp.clip(recent_tokens, 0, v - 1)
    seen = jnp.zeros((b, v), jnp.int32).at[
        jnp.arange(b)[:, None], ids].max(
        (recent_tokens >= 0).astype(jnp.int32)).astype(bool)
    penalized = jnp.where(logits > 0, logits / penalty,
                          logits * penalty)
    return jnp.where(seen, penalized, logits)


class ServingEngine:
    """Slot-based continuous batching over jitted prefill/decode steps."""

    def __init__(self, cfg: llama.LlamaConfig, params: dict[str, Any],
                 batch_slots: int = 4, mesh=None,
                 use_pallas: bool | None = None,
                 sample: Callable | None = None,
                 cache_kind: str = "bf16",
                 paged: bool = False, page: int | None = None,
                 cache_pages: int | None = None,
                 prefix_cache: bool = False,
                 lora: dict | None = None,
                 alloc_backend: str = "py",
                 prefill_chunk: int | None = None):
        """paged=True swaps the contiguous per-slot cache for a shared
        page pool + block table (ops/pallas_paged_attention): cache HBM
        tracks tokens that exist, not slots x max_seq. page = tokens per
        page (default: good_page_size for the model's KV width);
        cache_pages = pool size INCLUDING the trash page (default:
        contiguous-equivalent capacity; pass less to oversubscribe — the
        engine preempts-and-requeues when the pool runs dry).

        prefix_cache=True (needs paged) adds automatic prefix caching:
        full pages of a prompt's K/V are content-addressed (chain hash
        over the token prefix) and shared across requests by refcount —
        a request whose prompt prefix was seen before attaches the
        cached pages and prefills only its suffix (through the generic
        cached-attention path). Completed requests' registered pages
        stay resident as an LRU pool the allocator evicts last, so a
        repeated system prompt costs its prefill once.

        lora: a models/lora adapter tree — every request picks an
        adapter by Request.adapter (-1 = base); the engine keeps a
        per-slot id vector and one dispatch serves a MIXED batch of
        adapters (BGMV, models/lora.lora_delta).

        alloc_backend: "py" (default) or "native" — which paged-KV
        allocator backend manages the page pool / prefix index
        (parallel/kv_alloc.py; "native" is the C++ tier,
        csrc/paged_alloc.cpp, parity-tested against "py").

        prefill_chunk: CHUNKED PREFILL — admit prompts in fixed
        C-token chunks through the cached-attention path (the suffix
        machinery prefix caching already uses) instead of one
        power-of-2-bucketed dispatch per admission. ONE compiled
        prefill shape serves every prompt length, and eager-path score
        memory is bounded at (B, C, max_seq) instead of
        (B, P, max_seq). None (default) keeps whole-prompt admission;
        the token stream is identical either way (tested)."""
        self.cfg = cfg
        self.batch = batch_slots
        self.prefill_chunk = prefill_chunk
        if mesh is not None:
            from how_to_optimize_gemm_tpu.parallel.sharding import (
                shard_params)
            params = shard_params(params, mesh)
        self.params = params
        self.mesh = mesh
        self.use_pallas = use_pallas
        # greedy by default (exactly reproducible; the tests' contract)
        sampler = sample or make_sampler(temperature=0.0)
        self._key = jax.random.PRNGKey(0)
        self.lora = lora
        self.slot_adapter = np.full(batch_slots, -1, np.int32)

        cache_dtype = jnp.bfloat16

        self.paged = paged
        self.prefix_cache = prefix_cache
        if prefix_cache:
            assert paged, "prefix_cache requires paged=True"
        if paged:
            from how_to_optimize_gemm_tpu.ops.pallas_paged_attention \
                import good_page_size
            from how_to_optimize_gemm_tpu.parallel.kv_alloc import (
                make_allocator)
            ps = page or good_page_size(cfg.n_kv_heads, cfg.d_head,
                                        1 if cache_kind == "int8" else 2)
            self.page = ps
            self.np_max = -(-cfg.max_seq // ps)          # ceil
            n_pages = cache_pages or (batch_slots * self.np_max + 1)
            self.n_pages = n_pages
            # host-side allocator: page pool + block table + prefix
            # index (parallel/kv_alloc.py; page 0 is the reserved trash
            # page, never handed out)
            self.alloc = make_allocator(alloc_backend, n_pages, ps,
                                        batch_slots, self.np_max,
                                        prefix_cache)
            # admission order per slot — the preemption victim policy
            # (newest admitted goes first, vLLM-style)
            self.slot_seq = np.zeros(batch_slots, np.int64)
            self._seq = 0

        @functools.partial(jax.jit, static_argnames=("window",))
        def _decode(params, cache, tokens, pos, key, table=None,
                    window=1, lora=None, lora_idx=None):
            # window > 1: W decode steps in ONE dispatch (lax.scan) — on
            # a remote-relay platform each dispatch costs ~24 ms of round
            # trip, so per-step dispatch caps e2e serving at ~40 steps/s
            # regardless of model speed. Slots that finish mid-window
            # produce extra tokens the host discards; their cache entries
            # past EOS are harmless (overwritten before the causal mask
            # ever exposes them, same argument as prefill padding).
            def step(carry, _):
                cache, tok, pos, key = carry
                key, sub = jax.random.split(key)
                logits, cache = llama.decode_step(params, cfg, cache,
                                                  tok, pos, use_pallas,
                                                  table=table, lora=lora,
                                                  lora_idx=lora_idx)
                nxt = sampler(logits[:, -1, :], sub)
                return (cache, nxt[:, None], pos + 1, key), nxt
            (cache, _, _, _), toks = jax.lax.scan(
                step, (cache, tokens, pos, key), None, length=window)
            return toks, cache  # toks: (window, B)

        @functools.partial(jax.jit, static_argnames=("window",))
        def _decode_burst(params, cache, tokens, pos, key, table=None,
                          window=1, lora=None, lora_idx=None):
            # Pipelined-burst form of _decode: ONE dispatch carries the
            # whole chain state (next input token, advanced pos, split
            # key) so window j+1 can be ENQUEUED without any host-side
            # slicing/arithmetic dispatches between windows (each tiny
            # dispatch costs ~0.6-1 ms on the relay — dispatch_probe).
            key, sub = jax.random.split(key)

            def step(carry, _):
                cache, tok, pos, k = carry
                k, s = jax.random.split(k)
                logits, cache = llama.decode_step(params, cfg, cache,
                                                  tok, pos, use_pallas,
                                                  table=table, lora=lora,
                                                  lora_idx=lora_idx)
                nxt = sampler(logits[:, -1, :], s)
                return (cache, nxt[:, None], pos + 1, k), nxt
            (cache, ntok, npos, _), toks = jax.lax.scan(
                step, (cache, tokens, pos, sub), None, length=window)
            return toks, cache, ntok, npos, key

        @functools.partial(jax.jit, static_argnames=())
        def _prefill(params, cache, tokens, pos, write_mask, table=None,
                     lora=None, lora_idx=None, logit_idx=None):
            # prefill_self: the admitted slot is at pos 0, so attention
            # is causal self-attention over the prompt (flash-routable) —
            # the eager cached path would cost (B, P, max_seq) scores.
            # logit_idx: unembed only the sampled position per slot —
            # full (B, P, vocab) admission logits OOM at long P.
            logits, cache = llama.decode_step(params, cfg, cache, tokens,
                                              pos, use_pallas,
                                              write_mask=write_mask,
                                              prefill_self=True,
                                              table=table, lora=lora,
                                              lora_idx=lora_idx,
                                              logit_idx=logit_idx)
            return logits, cache

        @functools.partial(jax.jit, static_argnames=())
        def _prefill_at(params, cache, tokens, pos, write_mask,
                        table=None, lora=None, lora_idx=None,
                        logit_idx=None):
            # SUFFIX prefill (prefix-cache hits): the slot already holds
            # cached K/V for positions < pos, so attention goes through
            # the generic cached path — each suffix query attends the
            # shared prefix plus its own causal block.
            logits, cache = llama.decode_step(params, cfg, cache, tokens,
                                              pos, use_pallas,
                                              write_mask=write_mask,
                                              prefill_self=False,
                                              table=table, lora=lora,
                                              lora_idx=lora_idx,
                                              logit_idx=logit_idx)
            return logits, cache

        @jax.jit
        def _sample_one(logits, s, idx, key):
            return sampler(logits[s, idx][None], key)[0]

        self._decode = _decode
        self._decode_burst = _decode_burst
        self._prefill = _prefill
        self._prefill_at = _prefill_at
        self._sample_one = lambda logits, s, idx, key: int(
            _sample_one(logits, s, idx, key))
        if paged:
            self.cache = llama.init_paged_kv_cache(
                cfg, self.n_pages, self.page, cache_dtype,
                quantized=cache_kind == "int8")
        else:
            self.cache = llama.init_kv_cache(
                cfg, batch_slots, cache_dtype,
                quantized=cache_kind == "int8")
        self.slot_req: list[Request | None] = [None] * batch_slots
        self.slot_pos = np.zeros(batch_slots, np.int32)
        self.slot_tok = np.zeros(batch_slots, np.int32)
        self._eos_id: int | None = None

    # ------------------------------------------------- paged-cache admin
    # The pool/table/prefix-index state machine lives in
    # parallel/kv_alloc.py (two backends, parity-tested); the engine
    # keeps thin views for its own code and the tests' assertions.
    def _pages_for(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page)

    def _lora_idx(self):
        """Per-slot adapter id vector for the next dispatch (None when
        the engine has no adapters loaded — keeps the no-LoRA jit
        signature unchanged)."""
        return (None if self.lora is None
                else jnp.asarray(self.slot_adapter))

    @property
    def table_np(self) -> np.ndarray:
        return self.alloc.table

    @property
    def slot_pages(self) -> list[list[int]]:
        return self.alloc.slot_pages

    @property
    def _free(self):
        return (self.alloc._free if hasattr(self.alloc, "_free")
                else range(self.alloc.free_pages))

    @property
    def _cached(self):
        return (self.alloc._cached if hasattr(self.alloc, "_cached")
                else range(self.alloc.cached_pages))

    @property
    def _refcount(self):
        return self.alloc._refcount

    @property
    def prefix_hit_tokens(self) -> int:
        """Stat: prefill tokens skipped via prefix-cache hits."""
        return self.alloc.hit_tokens if self.paged else 0

    def _release_pages(self, s: int) -> None:
        if self.paged:
            self.alloc.release(s)

    def _preempt_newest(self, protect: int, queue: list) -> bool:
        """Recompute preemption (the vLLM policy): evict the NEWEST
        admitted slot (except ``protect``), requeue its request at the
        queue front with its tokens-so-far as the resume prompt — greedy
        decoding continues bit-identically after re-admission (_admit
        prefills prompt+out). Returns False if no victim exists."""
        victims = [s for s in range(self.batch)
                   if s != protect and self.slot_req[s] is not None]
        if not victims:
            return False
        v = max(victims, key=lambda s: self.slot_seq[s])
        req = self.slot_req[v]
        self._release_pages(v)
        self.slot_req[v] = None
        self.slot_pos[v] = 0
        self.slot_tok[v] = 0
        self.slot_adapter[v] = -1
        queue.insert(0, req)
        return True

    # ------------------------------------------------------------- admin
    def _dispatch_prefill(self, group, table):
        """Prefill one admission group -> {slot: (logits, sample_idx)}.

        group: [(slot, req, start)] — start 0 for fresh prompts, the
        attached-prefix length for prefix-cache hits. Whole-prompt by
        default (one power-of-2-bucketed dispatch, exactly the round-2
        behavior); with ``prefill_chunk=C`` every prompt streams
        through in fixed C-token chunks (chunk 0 of all-fresh groups
        keeps the flash self-attention path; later chunks ride the
        cached path that prefix-cache suffixes already use), so ONE
        compiled shape serves every prompt length."""
        lens = [(s, req, start,
                 len(req.prompt) + len(req.out) - start)
                for s, req, start in group]
        longest = max(n for _, _, _, n in lens)
        c = min(self.prefill_chunk
                or self._bucket(longest), self.cfg.max_seq)
        logits_of: dict[int, tuple] = {}
        for j in range(-(-longest // c)):
            tokens = np.zeros((self.batch, c), np.int32)
            pos = self.slot_pos.copy()
            mask = np.zeros(self.batch, bool)
            lidx = np.zeros(self.batch, np.int32)
            self_attn = True
            for s, req, start, n in lens:
                if n <= j * c:
                    continue
                seg = (req.prompt + req.out)[start + j * c:
                                             start + (j + 1) * c]
                tokens[s, :len(seg)] = seg
                pos[s] = start + j * c
                mask[s] = True
                if (n - 1) // c == j:
                    lidx[s] = (n - 1) % c
                if start + j * c > 0:
                    self_attn = False
            fn = self._prefill if self_attn else self._prefill_at
            # logit_idx: the chunk unembeds ONE position per slot (the
            # slot's sampled position when its prompt ends in this
            # chunk, else row 0 as a don't-care) — full (B, C, vocab)
            # logits were the dominant admission allocation
            logits, self.cache = fn(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(pos), jnp.asarray(mask), table,
                lora=self.lora, lora_idx=self._lora_idx(),
                logit_idx=jnp.asarray(lidx))
            for s, req, start, n in lens:
                if (n - 1) // c == j:
                    logits_of[s] = (logits, 0)
        return logits_of

    @staticmethod
    def _bucket(n: int) -> int:
        """Pad prompt lengths to powers of two: one compiled prefill per
        bucket instead of one per distinct length."""
        p = 1
        while p < n:
            p *= 2
        return p

    def _admit(self, queue: list[Request]) -> None:
        """Fill ALL empty slots from the queue in ONE masked-prefill
        dispatch: prompts go through decode_step as a (B, P) batch with
        a multi-hot write_mask selecting the admitted slots (all start
        at pos 0, so their attention is causal self-attention over their
        own rows and rows never interact). Live slots' caches are
        untouched; pad positions write bogus K/V beyond each prompt,
        which is safe because decode overwrites a position before the
        causal mask ever exposes it."""
        # Validate every candidate BEFORE touching slot state: raising
        # mid-admission would leave slots claimed with no prefill run.
        # The effective prompt is prompt + out: a PREEMPTED request
        # resumes by re-prefilling everything it has produced so far
        # (recompute preemption — greedy continuation is bit-identical).
        n_empty = sum(1 for s in range(self.batch)
                      if self.slot_req[s] is None)
        for req in queue[:n_empty]:
            if len(req.prompt) + len(req.out) >= self.cfg.max_seq:
                raise ValueError(
                    f"request {req.uid}: prompt length "
                    f"{len(req.prompt) + len(req.out)} >= max_seq "
                    f"{self.cfg.max_seq} (no room to generate); raise "
                    "cfg.max_seq or truncate the prompt")
        admitted: list[tuple[int, Request, int]] = []  # (slot, req, prefix)
        for s in range(self.batch):
            if self.slot_req[s] is None and queue:
                full = queue[0].prompt + queue[0].out
                prefix = 0
                if self.paged and self.prefix_cache:
                    # attach every cached full page of this prompt's
                    # prefix (chain-keyed, so content AND position
                    # match); the allocator caps so at least one suffix
                    # token remains to prefill — the model must emit
                    # logits to sample
                    prefix = self.alloc.attach(s, full, queue[0].adapter)
                if self.paged:
                    # admission is page-gated (no preemption here — that
                    # would thrash); a request that can't fit STAYS
                    # queued until completions free pages. A PARTIAL
                    # grow must be rolled back — pages assigned to an
                    # unoccupied slot would leak
                    if not self.alloc.grow(s, len(full)):
                        self._release_pages(s)
                        break
                req = queue.pop(0)
                self.slot_req[s] = req
                self.slot_adapter[s] = req.adapter
                if self.paged:
                    self._seq += 1
                    self.slot_seq[s] = self._seq
                admitted.append((s, req, prefix))
        if not admitted:
            if (self.paged and queue
                    and all(r is None for r in self.slot_req)):
                # nothing live holds pages, so this failure is permanent
                # (prefix-cached pages are evictable and were offered)
                need = self._pages_for(len(queue[0].prompt)
                                       + len(queue[0].out))
                raise RuntimeError(
                    f"request {queue[0].uid} needs {need} pages but the "
                    f"pool has {self.n_pages - 1}; raise cache_pages")
            return
        table = jnp.asarray(self.table_np) if self.paged else None
        logits_of: dict[int, tuple] = {}   # slot -> (logits, sample idx)
        fresh = [(s, r, 0) for s, r, pfx in admitted if pfx == 0]
        hits = [(s, r, pfx) for s, r, pfx in admitted if pfx > 0]
        if fresh:
            logits_of.update(self._dispatch_prefill(fresh, table))
        if hits:
            # suffix prefill from the first uncached position (generic
            # cached-attention path)
            logits_of.update(self._dispatch_prefill(hits, table))
        if self.paged and self.prefix_cache:
            # register this batch's fully-prompt-covered pages (decode
            # never writes them: it starts past the last full page) —
            # BEFORE sampling, which may complete-and-release a slot
            for s, req, _ in admitted:
                self.alloc.register(s, req.prompt + req.out,
                                    req.adapter)
        import time as _time
        for s, req, _ in admitted:
            plen = len(req.prompt) + len(req.out)
            self.slot_pos[s] = plen
            self._key, sub = jax.random.split(self._key)
            lg, idx = logits_of[s]
            tok = self._sample_one(lg, s, idx, sub)
            # timestamp AFTER the blocking sample (dispatch is async —
            # stamping at dispatch return under-reported TTFT by nearly
            # the whole prefill latency); a RESUMED request keeps its
            # original TTFT
            if not req.t_first:
                req.t_first = _time.perf_counter()
            self.slot_tok[s] = tok
            req.out.append(tok)
            # the admit-time token counts: honor max_new=1 / EOS here
            if (len(req.out) >= req.max_new
                    or (self._eos_id is not None
                        and tok == self._eos_id)):
                req.done = True
                req.t_done = _time.perf_counter()
                self._release_pages(s)
                self.slot_req[s] = None
                self.slot_pos[s] = 0
                self.slot_tok[s] = 0
                self.slot_adapter[s] = -1

    # ------------------------------------------------- speculative mode
    def _spec_block(self, cfg_d, gamma: int, rounds: int):
        """Compile the batched draft+verify block: ``rounds`` whole
        speculative rounds for ALL slots in ONE dispatch (the
        continuous-batching composition of
        parallel/speculative.speculative_decode_device — same uniform
        [prev, pending] catch-up feed and on-device accept logic,
        vectorized over slots with per-slot positions)."""
        cfg = self.cfg
        use_pallas = self.use_pallas

        @jax.jit
        def block(params_t, params_d, t_cache, d_cache, prev, pending,
                  pos, table=None):
            b = prev.shape[0]

            def round_fn(carry, _):
                t_cache, d_cache, prev, pending, pos = carry
                feed = jnp.stack([prev, pending], axis=1)   # (B, 2)
                lg, d_cache = llama.decode_step(
                    params_d, cfg_d, d_cache, feed, pos - 1,
                    use_pallas=use_pallas)
                first = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)

                def dstep(c, _):
                    cache, tok, p = c
                    lg, cache = llama.decode_step(
                        params_d, cfg_d, cache, tok[:, None], p,
                        use_pallas=use_pallas)
                    nxt = jnp.argmax(lg[:, -1], axis=-1).astype(
                        jnp.int32)
                    return (cache, nxt, p + 1), nxt

                (d_cache, _, _), rest = jax.lax.scan(
                    dstep, (d_cache, first, pos + 1), None,
                    length=gamma - 1)                     # (gamma-1, B)
                drafts = jnp.concatenate(
                    [first[None], rest]).T                # (B, gamma)

                chain = jnp.concatenate([pending[:, None], drafts],
                                        axis=1)           # (B, gamma+1)
                v_logits, t_cache = llama.decode_step(
                    params_t, cfg, t_cache, chain, pos,
                    use_pallas=use_pallas, table=table)
                greedy = jnp.argmax(v_logits, axis=-1).astype(
                    jnp.int32)                            # (B, gamma+1)

                match = drafts == greedy[:, :gamma]
                a = jnp.argmin(jnp.concatenate(
                    [match, jnp.zeros((b, 1), bool)], axis=1),
                    axis=1).astype(jnp.int32)             # (B,)
                rows = jnp.arange(b)
                prev_n = jnp.where(a > 0,
                                   greedy[rows, jnp.maximum(a - 1, 0)],
                                   pending)
                return ((t_cache, d_cache, prev_n, greedy[rows, a],
                         pos + a + 1), (greedy, a))

            (t_cache, d_cache, prev, pending, pos), (toks, accepts) = \
                jax.lax.scan(round_fn,
                             (t_cache, d_cache, prev, pending, pos),
                             None, length=rounds)
            return (t_cache, d_cache, prev, pending, pos,
                    toks, accepts)   # toks (rounds, B, gamma+1)

        return block

    def _spec_block_lookup(self, gamma: int, ngram: int, rounds: int):
        """Batched prompt-lookup draft+verify block: the weights-free
        draft (speculative._lookup_device_block's n-gram propose,
        vmapped over slots) under the engine's greedy accept machinery.
        No draft model, no draft cache, no draft FLOPs — an accept-0
        round IS a plain decode step that verified gamma proposals for
        free. hist rows hold prompt + emitted + pending per slot; the
        write pointer is always pos + 1 (hist[pos] = pending), so no
        separate pointer state is carried."""
        cfg = self.cfg
        use_pallas = self.use_pallas
        t = cfg.max_seq

        def propose(hist, n_tok, pending):
            suffix = jax.lax.dynamic_slice(hist, (n_tok - ngram,),
                                           (ngram,))
            win = jnp.stack([jnp.roll(hist, -j) for j in range(ngram)],
                            1)
            idx = jnp.arange(t)
            s0 = n_tok - ngram
            match = jnp.all(win == suffix[None, :], axis=1) & (idx < s0)
            start = jnp.max(jnp.where(match, idx, -1))
            cont = jax.lax.dynamic_slice(hist, (start + ngram,),
                                         (gamma,))
            return jnp.where(start >= 0, cont,
                             jnp.full((gamma,), pending, jnp.int32))

        propose_b = jax.vmap(propose)

        def write_row(hist, row, n_tok):
            return jax.lax.dynamic_update_slice(hist, row, (n_tok,))

        write_b = jax.vmap(write_row)

        @jax.jit
        def block(params, t_cache, hist, prev, pending, pos,
                  table=None):
            b = prev.shape[0]

            def round_fn(carry, _):
                t_cache, hist, prev, pending, pos = carry
                n_tok = pos + 1                       # hist[pos]=pending
                drafts = propose_b(hist, n_tok, pending)  # (B, gamma)
                chain = jnp.concatenate([pending[:, None], drafts],
                                        axis=1)       # (B, gamma+1)
                v_logits, t_cache = llama.decode_step(
                    params, cfg, t_cache, chain, pos,
                    use_pallas=use_pallas, table=table)
                greedy = jnp.argmax(v_logits, axis=-1).astype(
                    jnp.int32)                        # (B, gamma+1)
                match = drafts == greedy[:, :gamma]
                a = jnp.argmin(jnp.concatenate(
                    [match, jnp.zeros((b, 1), bool)], axis=1),
                    axis=1).astype(jnp.int32)         # (B,)
                rows = jnp.arange(b)
                hist = write_b(hist, greedy, n_tok)
                prev_n = jnp.where(a > 0,
                                   greedy[rows, jnp.maximum(a - 1, 0)],
                                   pending)
                return ((t_cache, hist, prev_n, greedy[rows, a],
                         pos + a + 1), (greedy, a))

            (t_cache, hist, prev, pending, pos), (toks, accepts) = \
                jax.lax.scan(round_fn,
                             (t_cache, hist, prev, pending, pos),
                             None, length=rounds)
            return t_cache, hist, prev, pending, pos, toks, accepts

        return block

    def run_spec_lookup(self, requests: list[Request],
                        eos_id: int | None = None, gamma: int = 4,
                        ngram: int = 3,
                        rounds: int = 4) -> list[Request]:
        """Serve with PROMPT-LOOKUP speculative decoding under
        continuous batching — the weights-free winning configuration
        (RESULTS.md round 4: 1.13-1.30x over plain windowed decode on
        repetition-heavy prompts at 7B w4a8) composed with the engine:
        paged pools, preemption, prefix cache and admission all work
        unchanged, because the draft has NO model and NO cache — only
        per-slot history rows rebuilt at admission. Greedy only; the
        emitted stream is IDENTICAL to ``run()``'s (a lookup miss is an
        accept-0 round), asserted in tests."""
        import time as _time
        assert self.lora is None, "spec mode does not compose with LoRA"
        if not hasattr(self, "_spec_blocks"):
            self._spec_blocks = {}
        cache_key = ("lookup", gamma, ngram, rounds)
        if cache_key not in self._spec_blocks:
            self._spec_blocks[cache_key] = self._spec_block_lookup(
                gamma, ngram, rounds)
        block = self._spec_blocks[cache_key]

        # hist lives ON DEVICE for the whole serve: the relay charges
        # ~24 ms per transfer, so round-tripping it (or fetching carry
        # scalars one by one) would dominate the block itself — the
        # first chip run of this path measured 146 vs plain 977 tok/s
        # from exactly that, fixed by device-resident hist + one
        # batched device_get per block dispatch.
        hist = jnp.zeros((self.batch, self.cfg.max_seq), jnp.int32)
        prev_tok = np.zeros(self.batch, np.int32)

        def admit(queue):
            nonlocal hist
            before = [self.slot_req[s] for s in range(self.batch)]
            self._admit(queue)
            for s in range(self.batch):
                req = self.slot_req[s]
                if req is None or req is before[s]:
                    continue
                full = req.prompt + req.out     # incl. pending last
                row = np.zeros(self.cfg.max_seq, np.int32)
                row[:len(full)] = full
                hist = hist.at[s].set(jnp.asarray(row))
                prev_tok[s] = full[-2] if len(full) > 1 else 0

        queue = list(requests)
        now = _time.perf_counter()
        for r in queue:
            r.t_submit = now
        self._eos_id = eos_id
        admit(queue)
        # per-request lookup economics: uid -> [accepted draft
        # tokens, rounds consumed] (the CLI's per-slot accept report)
        self.lookup_stats = {r.uid: [0, 0] for r in requests}
        max_adv = rounds * (gamma + 1) + gamma + 1
        while any(r is not None for r in self.slot_req):
            active = [s for s in range(self.batch)
                      if self.slot_req[s] is not None]
            room = self.cfg.max_seq - 1 - max(int(self.slot_pos[s])
                                              for s in active)
            if room < max_adv:
                w = 1 << (max(1, min(8, room)).bit_length() - 1)
                self._plain_window(queue, w)
                admit(queue)
                continue
            if self.paged:
                for s in active:
                    while not self.alloc.grow(
                            s, int(self.slot_pos[s]) + max_adv):
                        if not self._preempt_newest(s, queue):
                            raise RuntimeError(
                                "spec block needs pages with no slot "
                                "to preempt; raise cache_pages")
                if all(r is None for r in self.slot_req):
                    admit(queue)
                    continue
            table = (jnp.asarray(self.table_np) if self.paged
                     else None)
            (self.cache, hist, prev_j, pend_j, pos_j, toks,
             accepts) = block(self.params, self.cache, hist,
                              jnp.asarray(prev_tok),
                              jnp.asarray(self.slot_tok),
                              jnp.asarray(self.slot_pos), table)
            # ONE transfer for everything the host loop needs
            toks, accepts, prev_np, pend_np, pos_np = jax.device_get(
                (toks, accepts, prev_j, pend_j, pos_j))
            for s in list(active):
                req = self.slot_req[s]
                done = False
                for r in range(rounds):
                    a = int(accepts[r, s])
                    st = self.lookup_stats[req.uid]
                    st[0] += a
                    st[1] += 1
                    for tok in toks[r, s, :a + 1].tolist():
                        self.slot_pos[s] += 1
                        req.out.append(tok)
                        hit_eos = eos_id is not None and tok == eos_id
                        full = self.slot_pos[s] + 1 >= self.cfg.max_seq
                        if (len(req.out) >= req.max_new or hit_eos
                                or full):
                            done = True
                            break
                        self.slot_tok[s] = tok
                    if done:
                        break
                if done:
                    req.done = True
                    req.t_done = _time.perf_counter()
                    self._release_pages(s)
                    self.slot_req[s] = None
                    self.slot_pos[s] = 0
                    self.slot_tok[s] = 0
                    self.slot_adapter[s] = -1
                else:
                    self.slot_pos[s] = int(pos_np[s])
                    self.slot_tok[s] = int(pend_np[s])
                    prev_tok[s] = int(prev_np[s])
            admit(queue)
        return requests

    def _spec_block_sampled(self, cfg_d, gamma: int, rounds: int,
                            temperature: float, top_k: int,
                            top_p: float):
        """Sampled counterpart of _spec_block: rejection sampling
        (speculative.reject_round_device, vmapped over slots) with
        PER-REQUEST positional key streams — token i of request uid is
        always drawn with fold_in(fold_in(base, uid), i), so the
        emitted stream is independent of batching, window grouping, AND
        preemption/resume (the recompute invariant extends to sampled
        serving)."""
        from how_to_optimize_gemm_tpu.parallel.speculative import (
            reject_round_device)
        cfg = self.cfg
        use_pallas = self.use_pallas

        def probs(logits):
            return jax.nn.softmax(
                filter_logits(logits, temperature, top_k, top_p),
                axis=-1)

        def draw(keys, pos, q):
            # (B,) tokens: per-slot positional categorical
            return jax.vmap(lambda k, p, qq: jax.random.categorical(
                jax.random.fold_in(k, p),
                jnp.log(qq + 1e-38)))(keys, pos, q).astype(jnp.int32)

        @jax.jit
        def block(params_t, params_d, t_cache, d_cache, prev, pending,
                  pos, uids, base_key, table=None):
            b = prev.shape[0]
            keys = jax.vmap(lambda u: jax.random.fold_in(base_key, u))(
                uids)

            def round_fn(carry, _):
                t_cache, d_cache, prev, pending, pos = carry
                feed = jnp.stack([prev, pending], axis=1)
                lg, d_cache = llama.decode_step(
                    params_d, cfg_d, d_cache, feed, pos - 1,
                    use_pallas=use_pallas)
                q0 = probs(lg[:, -1])
                x0 = draw(keys, pos + 1, q0)

                def dstep(c, _):
                    cache, tok, p = c
                    lg, cache = llama.decode_step(
                        params_d, cfg_d, cache, tok[:, None], p,
                        use_pallas=use_pallas)
                    q = probs(lg[:, -1])
                    nxt = draw(keys, p + 1, q)
                    return (cache, nxt, p + 1), (q, nxt)

                (d_cache, _, _), (q_rest, x_rest) = jax.lax.scan(
                    dstep, (d_cache, x0, pos + 1), None,
                    length=gamma - 1)
                q_rows = jnp.moveaxis(
                    jnp.concatenate([q0[None], q_rest]), 0, 1)
                xs = jnp.concatenate([x0[None], x_rest]).T  # (B, gamma)

                chain = jnp.concatenate([pending[:, None], xs], axis=1)
                v_logits, t_cache = llama.decode_step(
                    params_t, cfg, t_cache, chain, pos,
                    use_pallas=use_pallas, table=table)
                p_rows = probs(v_logits)            # (B, gamma+1, V)

                toks, a = jax.vmap(reject_round_device)(
                    q_rows, xs, p_rows, keys, pos + 1)
                rows = jnp.arange(b)
                prev_n = jnp.where(a > 0,
                                   toks[rows, jnp.maximum(a - 1, 0)],
                                   pending)
                return ((t_cache, d_cache, prev_n, toks[rows, a],
                         pos + a + 1), (toks, a))

            (t_cache, d_cache, prev, pending, pos), (toks, accepts) = \
                jax.lax.scan(round_fn,
                             (t_cache, d_cache, prev, pending, pos),
                             None, length=rounds)
            return (t_cache, d_cache, prev, pending, pos,
                    toks, accepts)

        return block

    def run_spec(self, requests: list[Request], cfg_d, params_d,
                 eos_id: int | None = None, gamma: int = 4,
                 rounds: int = 4, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 0.0,
                 key=None) -> list[Request]:
        """Serve with SPECULATIVE decoding under continuous batching:
        a draft model proposes gamma tokens per round, the target
        verifies whole chains, and ``rounds`` rounds for all slots run
        per dispatch.

        temperature <= 0 (default): GREEDY — the token stream is
        IDENTICAL to ``run()``'s (asserted in tests); draft quality
        changes speed, never output. temperature > 0: SAMPLED —
        Leviathan rejection sampling on device
        (speculative.reject_round_device) with PER-REQUEST positional
        key streams (fold_in(fold_in(key, uid), position)), so each
        request's stream is distributed as target-only ancestral
        sampling at (temperature, top_k, top_p) and is REPRODUCIBLE
        across batching, round grouping, and preemption/resume. The
        admission-time first token still comes from the engine's own
        sampler — configure it to matching settings. LoRA not composed
        with spec mode.

        The draft keeps its own contiguous bf16 cache and re-prefills
        each admitted prompt in full (prefix-cache hits apply to the
        TARGET cache only; the draft is priced as negligible). Near
        max_seq the engine falls back to plain windowed decode for the
        tail, so spec mode never writes past the window run() would."""
        import time as _time
        assert self.lora is None, "spec mode does not compose with LoRA"
        assert cfg_d.vocab == self.cfg.vocab, "draft must share vocab"
        d_cache = llama.init_kv_cache(cfg_d, self.batch,
                                      dtype=jnp.float32)
        sampled = temperature > 0
        base_key = jax.random.PRNGKey(0) if key is None else key
        # blocks are cached per engine instance: a fresh jitted closure
        # per run_spec call would re-TRACE the whole scan every batch
        # (~5 s of host work at 7B — the round-3 retrace lesson,
        # speculative._spec_device_block)
        cache_key = (("sampled", cfg_d, gamma, rounds, temperature,
                      top_k, top_p) if sampled
                     else ("greedy", cfg_d, gamma, rounds))
        if not hasattr(self, "_spec_blocks"):
            self._spec_blocks = {}
        if cache_key not in self._spec_blocks:
            self._spec_blocks[cache_key] = (
                self._spec_block_sampled(cfg_d, gamma, rounds,
                                         temperature, top_k, top_p)
                if sampled else self._spec_block(cfg_d, gamma, rounds))
        block = self._spec_blocks[cache_key]

        @jax.jit
        def draft_prefill(params_d, d_cache, tokens, pos, write_mask):
            _, d_cache = llama.decode_step(
                params_d, cfg_d, d_cache, tokens, pos,
                use_pallas=self.use_pallas, write_mask=write_mask,
                prefill_self=True)
            return d_cache

        # prev token per slot: the committed token at slot_pos - 1
        # (the prompt's last token right after admission)
        prev_tok = np.zeros(self.batch, np.int32)

        def admit(queue):
            before = [self.slot_req[s] for s in range(self.batch)]
            self._admit(queue)
            fresh = [s for s in range(self.batch)
                     if self.slot_req[s] is not None
                     and self.slot_req[s] is not before[s]]
            if not fresh:
                return
            # draft prefill for newly admitted slots (full prompt +
            # resume tokens; the engine's own _admit sampled ONE token
            # already, so the draft must hold everything before it)
            plens = [int(self.slot_pos[s]) for s in fresh]
            bucket = min(self._bucket(max(plens)), cfg_d.max_seq)
            tokens = np.zeros((self.batch, bucket), np.int32)
            pos = np.zeros(self.batch, np.int32)
            mask = np.zeros(self.batch, bool)
            for s in fresh:
                req = self.slot_req[s]
                full = (req.prompt + req.out)[:-1]   # pending excluded
                tokens[s, :len(full)] = full
                mask[s] = True
                prev_tok[s] = full[-1]
            nonlocal d_cache
            d_cache = draft_prefill(params_d, d_cache,
                                    jnp.asarray(tokens),
                                    jnp.asarray(pos), jnp.asarray(mask))

        queue = list(requests)
        now = _time.perf_counter()
        for r in queue:
            r.t_submit = now
        self._eos_id = eos_id
        admit(queue)
        max_adv = rounds * (gamma + 1) + gamma + 1
        while any(r is not None for r in self.slot_req):
            active = [s for s in range(self.batch)
                      if self.slot_req[s] is not None]
            room = self.cfg.max_seq - 1 - max(int(self.slot_pos[s])
                                              for s in active)
            if room < max_adv:
                # tail: plain windowed decode (run()'s machinery) —
                # identical greedy semantics, no spec speedup needed
                # for the last few tokens
                w = 1 << (max(1, min(8, room)).bit_length() - 1)
                self._plain_window(queue, w)
                admit(queue)
                continue
            if self.paged:
                for s in active:
                    while not self.alloc.grow(
                            s, int(self.slot_pos[s]) + max_adv):
                        if not self._preempt_newest(s, queue):
                            raise RuntimeError(
                                "spec block needs pages with no slot "
                                "to preempt; raise cache_pages")
                if all(r is None for r in self.slot_req):
                    admit(queue)
                    continue
            table = (jnp.asarray(self.table_np) if self.paged
                     else None)
            args = (self.params, params_d, self.cache, d_cache,
                    jnp.asarray(prev_tok), jnp.asarray(self.slot_tok),
                    jnp.asarray(self.slot_pos))
            if sampled:
                uids = np.asarray(
                    [self.slot_req[s].uid if self.slot_req[s] else 0
                     for s in range(self.batch)], np.int32)
                args = args + (jnp.asarray(uids), base_key)
            (self.cache, d_cache, prev_j, pend_j, pos_j, toks,
             accepts) = block(*args, table)
            # one batched transfer (the relay charges per fetch):
            # toks (rounds, B, gamma+1), accepts (rounds, B)
            toks, accepts, prev_np, pend_np, pos_np = jax.device_get(
                (toks, accepts, prev_j, pend_j, pos_j))
            for s in list(active):
                req = self.slot_req[s]
                done = False
                for r in range(rounds):
                    a = int(accepts[r, s])
                    for tok in toks[r, s, :a + 1].tolist():
                        self.slot_pos[s] += 1
                        req.out.append(tok)
                        hit_eos = eos_id is not None and tok == eos_id
                        full = self.slot_pos[s] + 1 >= self.cfg.max_seq
                        if (len(req.out) >= req.max_new or hit_eos
                                or full):
                            done = True
                            break
                        self.slot_tok[s] = tok
                    if done:
                        break
                if done:
                    req.done = True
                    req.t_done = _time.perf_counter()
                    self._release_pages(s)
                    self.slot_req[s] = None
                    self.slot_pos[s] = 0
                    self.slot_tok[s] = 0
                    self.slot_adapter[s] = -1
                else:
                    # the block's own bookkeeping is exact when the
                    # slot consumed every round
                    self.slot_pos[s] = int(pos_np[s])
                    self.slot_tok[s] = int(pend_np[s])
                    prev_tok[s] = int(prev_np[s])
            admit(queue)
        return requests

    def _plain_window(self, queue, w: int) -> None:
        """One plain windowed-decode dispatch (run()'s inner step),
        shared by the spec-mode tail path."""
        import time as _time
        tokens = jnp.asarray(self.slot_tok.reshape(-1, 1))
        pos = jnp.asarray(self.slot_pos)
        self._key, sub = jax.random.split(self._key)
        toks, self.cache = self._decode(
            self.params, self.cache, tokens, pos, sub,
            jnp.asarray(self.table_np) if self.paged else None,
            window=w, lora=self.lora, lora_idx=self._lora_idx())
        toks = np.asarray(toks)
        for s in range(self.batch):
            req = self.slot_req[s]
            if req is None:
                continue
            for i in range(w):
                self.slot_pos[s] += 1
                tok = int(toks[i, s])
                req.out.append(tok)
                hit_eos = (self._eos_id is not None
                           and tok == self._eos_id)
                full = self.slot_pos[s] + 1 >= self.cfg.max_seq
                if len(req.out) >= req.max_new or hit_eos or full:
                    req.done = True
                    req.t_done = _time.perf_counter()
                    self._release_pages(s)
                    self.slot_req[s] = None
                    self.slot_pos[s] = 0
                    self.slot_tok[s] = 0
                    self.slot_adapter[s] = -1
                    break
                self.slot_tok[s] = tok

    # -------------------------------------------------------------- run
    def run(self, requests: list[Request], eos_id: int | None = None,
            window: int = 8, lookahead: int = 1) -> list[Request]:
        """Serve all requests to completion; returns them with .out.

        window: decode steps per device dispatch (scan inside jit).
        The greedy token stream is IDENTICAL for any window (sampled
        streams stay correct but draw keys in a different order); only
        the host round-trip count changes.

        lookahead > 1: enqueue up to that many windows back-to-back
        BEFORE fetching the first one's tokens (async dispatch
        pipelining). The round-5 dispatch probe
        (ops/dispatch_probe.py) measured the relay's cost model: ops
        are free, each BLOCKING dispatch costs a fixed ~26 ms round
        trip, and async enqueue pipelines it away (3.8 ms/call at
        depth 8) — so fetching window i's tokens while windows
        i+1..i+K run on device hides the round trip entirely. Token
        streams are unchanged (per-slot streams are batch- and
        window-independent; the chained input token of window i+1 is
        the device-resident last token of window i — the same value
        the host would have sent)."""
        for _ in self._run_steps(requests, eos_id, window, lookahead):
            pass
        return requests

    def run_stream(self, requests: list[Request],
                   eos_id: int | None = None, window: int = 8,
                   lookahead: int = 1):
        """Streaming form of run(): a generator yielding (uid, token)
        as tokens are produced — the serving front-end's SSE loop.
        Tokens arrive in per-request order, batched at dispatch
        granularity (one window's worth per engine step); the combined
        stream equals run()'s .out exactly (tested)."""
        seen = {r.uid: 0 for r in requests}
        for _ in self._run_steps(requests, eos_id, window, lookahead):
            for r in requests:
                while seen[r.uid] < len(r.out):
                    yield r.uid, r.out[seen[r.uid]]
                    seen[r.uid] += 1

    def _plan_burst(self, window: int, lookahead: int) -> list[int]:
        """Window sizes for one pipelined burst (see run(lookahead=)).

        Mirrors the sync loop's per-window w clamp, simulating slot
        positions forward. The plan CUTS at the first window where any
        slot reaches max_new or max_seq — after that window the sync
        loop's bookkeeping (slot release, admission) must intervene,
        so it is a mandatory resync point. EOS cannot be predicted;
        an EOS mid-burst just wastes the dead slot's remaining windows
        (other slots' tokens stay valid — per-slot streams are batch-
        independent, and releases are deferred to the drain)."""
        plan: list[int] = []
        sim_pos = self.slot_pos.astype(np.int64).copy()
        rem = {s: self.slot_req[s].max_new - len(self.slot_req[s].out)
               for s in range(self.batch) if self.slot_req[s] is not None}
        for _ in range(lookahead):
            act = [s for s in rem if rem[s] > 0]
            if not act:
                break
            w = max(1, min(window, self.cfg.max_seq - 1
                           - max(int(sim_pos[s]) for s in act)))
            w = 1 << (w.bit_length() - 1)
            plan.append(w)
            resync = False
            for s in act:
                sim_pos[s] += w
                rem[s] -= w
                if rem[s] <= 0 or int(sim_pos[s]) + 1 >= self.cfg.max_seq:
                    rem[s] = 0
                    resync = True
            if resync:
                break
        return plan

    def _run_steps(self, requests: list[Request],
                   eos_id: int | None = None, window: int = 8,
                   lookahead: int = 1):
        """run()'s engine loop as a generator: yields after admission
        and after every decode dispatch (the streaming hook)."""
        import time as _time
        queue = list(requests)
        now = _time.perf_counter()
        for r in queue:
            r.t_submit = now
        self._eos_id = eos_id
        self._admit(queue)
        yield
        while any(r is not None for r in self.slot_req):
            if lookahead > 1:
                plan = self._plan_burst(window, lookahead)
                if self.paged and plan:
                    # every slot needs page coverage for the WHOLE burst
                    # before the first dispatch; cut the plan where the
                    # pool runs dry (plan[:0] falls through to the sync
                    # body below, which owns the preemption policy)
                    covered = 0
                    need = self.slot_pos.astype(np.int64).copy()
                    for w in plan:
                        ok = True
                        for s in range(self.batch):
                            if self.slot_req[s] is None:
                                continue
                            if not self.alloc.grow(s, int(need[s]) + w):
                                ok = False
                                break
                        if not ok:
                            break
                        for s in range(self.batch):
                            if self.slot_req[s] is not None:
                                need[s] += w
                        covered += 1
                    plan = plan[:covered]
                if len(plan) > 1:
                    # ---- pipelined burst: enqueue all windows, then
                    # drain. The input token of window j+1 is window j's
                    # device-resident last token; pos advances on host
                    # arithmetic (exact — no data dependence).
                    tok_dev = jnp.asarray(self.slot_tok.reshape(-1, 1))
                    pos_dev = jnp.asarray(self.slot_pos)
                    key_dev = self._key
                    table = (jnp.asarray(self.table_np) if self.paged
                             else None)
                    lidx = self._lora_idx()
                    inflight = []
                    for w in plan:
                        toks, self.cache, tok_dev, pos_dev, key_dev = \
                            self._decode_burst(
                                self.params, self.cache, tok_dev,
                                pos_dev, key_dev, table, window=w,
                                lora=self.lora, lora_idx=lidx)
                        inflight.append((w, toks))
                    self._key = key_dev
                    finished: list[int] = []
                    for w, toks in inflight:
                        toks = np.asarray(toks)          # (w, B) fetch
                        for s in range(self.batch):
                            req = self.slot_req[s]
                            if req is None or req.done:
                                continue
                            for i in range(w):
                                self.slot_pos[s] += 1
                                tok = int(toks[i, s])
                                req.out.append(tok)
                                hit_eos = (eos_id is not None
                                           and tok == eos_id)
                                full = (self.slot_pos[s] + 1
                                        >= self.cfg.max_seq)
                                if (len(req.out) >= req.max_new
                                        or hit_eos or full):
                                    req.done = True
                                    req.t_done = _time.perf_counter()
                                    # release/reset DEFERRED to drain:
                                    # later in-flight windows still
                                    # write this slot's cache range
                                    finished.append(s)
                                    break
                                self.slot_tok[s] = tok
                        yield
                    for s in finished:
                        self._release_pages(s)
                        self.slot_req[s] = None
                        self.slot_pos[s] = 0
                        self.slot_tok[s] = 0
                        self.slot_adapter[s] = -1
                    self._admit(queue)
                    yield
                    continue
            active_pos = [int(self.slot_pos[s]) for s in range(self.batch)
                          if self.slot_req[s] is not None]
            w = max(1, min(window,
                           self.cfg.max_seq - 1 - max(active_pos)))
            # round down to a power of two: w is a STATIC arg of the
            # scanned decode step, and letting it count down 7,6,5,...
            # near max_seq would recompile the whole scan per value
            w = 1 << (w.bit_length() - 1)
            if self.paged:
                # the window writes positions pos..pos+w-1: every active
                # slot needs page coverage for pos+w tokens BEFORE the
                # dispatch; a dry pool preempts the newest slot (its
                # request requeues and resumes by recompute)
                for s in range(self.batch):
                    if self.slot_req[s] is None:
                        continue
                    while not self.alloc.grow(
                            s, int(self.slot_pos[s]) + w):
                        if not self._preempt_newest(s, queue):
                            raise RuntimeError(
                                f"slot {s} needs pages for "
                                f"{int(self.slot_pos[s]) + w} tokens "
                                "with no other slot to preempt; raise "
                                "cache_pages")
                if all(r is None for r in self.slot_req):
                    # every active slot was preempted away (pathological
                    # tiny pool); re-admit and retry
                    self._admit(queue)
                    continue
            tokens = jnp.asarray(self.slot_tok.reshape(-1, 1))
            pos = jnp.asarray(self.slot_pos)
            self._key, sub = jax.random.split(self._key)
            toks, self.cache = self._decode(
                self.params, self.cache, tokens, pos, sub,
                jnp.asarray(self.table_np) if self.paged else None,
                window=w, lora=self.lora, lora_idx=self._lora_idx())
            toks = np.asarray(toks)                    # (w, B)
            for s in range(self.batch):
                req = self.slot_req[s]
                if req is None:
                    continue
                for i in range(w):
                    self.slot_pos[s] += 1
                    tok = int(toks[i, s])
                    req.out.append(tok)
                    hit_eos = eos_id is not None and tok == eos_id
                    full = self.slot_pos[s] + 1 >= self.cfg.max_seq
                    if len(req.out) >= req.max_new or hit_eos or full:
                        req.done = True
                        req.t_done = _time.perf_counter()
                        self._release_pages(s)
                        self.slot_req[s] = None
                        self.slot_pos[s] = 0
                        self.slot_tok[s] = 0
                        self.slot_adapter[s] = -1
                        break
                    self.slot_tok[s] = tok
            self._admit(queue)
            yield


def decode_tokens_per_sec(cfg, params, batch: int = 8, steps: int = 32,
                          use_pallas: bool | None = None,
                          mesh=None, cache_kind: str = "bf16",
                          paged: bool = False) -> float:
    """Steady-state decode throughput (tokens/s) at a fixed batch.
    paged=True runs the block-table cache with a fully-allocated
    sequential table — the paged-vs-contiguous kernel A/B at identical
    logical state."""
    from how_to_optimize_gemm_tpu.utils.timing import measure

    if mesh is not None:
        from how_to_optimize_gemm_tpu.parallel.sharding import shard_params
        params = shard_params(params, mesh)
    table = None
    if paged:
        from how_to_optimize_gemm_tpu.ops.pallas_paged_attention import (
            good_page_size)
        ps = good_page_size(cfg.n_kv_heads, cfg.d_head,
                            1 if cache_kind == "int8" else 2)
        np_max = -(-cfg.max_seq // ps)
        cache = llama.init_paged_kv_cache(cfg, batch * np_max + 1, ps,
                                          quantized=cache_kind == "int8")
        table = jnp.arange(1, batch * np_max + 1,
                           dtype=jnp.int32).reshape(batch, np_max)
    else:
        cache = llama.init_kv_cache(cfg, batch,
                                    quantized=cache_kind == "int8")
    tokens = jnp.ones((batch, 1), jnp.int32)
    pos = jnp.zeros((batch,), jnp.int32)

    # params is a jit argument (closure capture would inline the whole
    # model as module constants — see utils/timing.py).
    @jax.jit
    def chain(params, cache, tokens, pos):
        def body(i, carry):
            cache, tokens, pos = carry
            logits, cache = llama.decode_step(params, cfg, cache, tokens,
                                              pos, use_pallas,
                                              table=table)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1, keepdims=True)
            return cache, nxt.astype(jnp.int32), pos + 1
        cache, tokens, pos = jax.lax.fori_loop(
            0, steps, body, (cache, tokens, pos))
        return tokens.sum()

    best = measure(lambda: chain(params, cache, tokens, pos), repeats=3,
                   warmup=1)
    return batch * steps / best


def main(argv=None):
    """Measure steady-state decode tokens/s on the current backend.

    The serving-throughput slot of BASELINE.json's north star: quantized
    decode at fixed batch. Weight streaming bounds decode, so tokens/s ~
    batch * HBM_BW / weight_bytes — the measurement to compare against
    that roofline."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--weight-kind", default="int8",
                    choices=["fp32", "bf16", "int8", "int4", "w4a8"])
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--n-layers", type=int, default=22)
    ap.add_argument("--d-ff", type=int, default=5632)
    ap.add_argument("--n-heads", type=int, default=32)
    ap.add_argument("--n-kv-heads", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--use-pallas", action="store_true", default=None)
    ap.add_argument("--eager", action="store_true",
                    help="force use_pallas=False (the A/B baseline for "
                         "kernel-routing measurements)")
    ap.add_argument("--cache-kind", default="bf16",
                    choices=["bf16", "int8"],
                    help="int8 = KV8 quantized cache (half cache HBM)")
    ap.add_argument("--paged", action="store_true",
                    help="block-table paged KV cache (fully-allocated "
                         "table; the paged-vs-contiguous kernel A/B)")
    ap.add_argument("--n-experts", type=int, default=0,
                    help="MoE family: top-2 routed MLP with this many "
                         "SwiGLU experts (0 = dense)")
    ap.add_argument("--moe-ragged", action="store_true",
                    help="route MoE MLPs through the grouped-GEMM "
                         "(ragged, dropless) kernel")
    args = ap.parse_args(argv)

    cfg = llama.LlamaConfig(
        vocab=args.vocab, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=args.n_heads, n_kv_heads=args.n_kv_heads, d_ff=args.d_ff,
        max_seq=args.max_seq, weight_kind=args.weight_kind,
        n_experts=args.n_experts, moe_ragged=args.moe_ragged)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    if args.eager and args.use_pallas:
        ap.error("--eager and --use-pallas are mutually exclusive")
    use_pallas = False if args.eager else args.use_pallas
    tps = decode_tokens_per_sec(cfg, params, batch=args.batch,
                                steps=args.steps,
                                use_pallas=use_pallas,
                                cache_kind=args.cache_kind,
                                paged=args.paged)
    wbytes = {"fp32": 4, "bf16": 2, "int8": 1, "int4": 0.5,
              "w4a8": 0.5}[
        args.weight_kind]
    n_mlp_mats = 3 * max(cfg.n_experts, 1)
    nparam = (cfg.vocab * cfg.d_model * 2
              + cfg.n_layers * (cfg.d_model * (cfg.n_heads
                                               + 2 * cfg.n_kv_heads)
                                * cfg.d_head
                                + cfg.n_heads * cfg.d_head * cfg.d_model
                                + n_mlp_mats * cfg.d_model * cfg.d_ff))
    print(f"decode tokens/s: {tps:.1f} "
          f"(batch={args.batch}, {args.weight_kind}, "
          f"~{nparam * wbytes / 1e9:.2f} GB weights)")


if __name__ == "__main__":
    main()
