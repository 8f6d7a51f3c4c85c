"""Serve a quantized model with continuous batching.

    python examples/serve.py --weight-kind w4a8 --cache-kind int8

Builds a random-weight model (swap in real weights via
models/checkpoint.load_params), submits a few prompts, prints the
generated ids and the measured throughput.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import time

import jax
import numpy as np

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.parallel.serving import (Request,
                                                       ServingEngine,
                                                       make_sampler)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weight-kind", default="int8",
                    choices=["fp32", "bf16", "int8", "int4", "w4a8"])
    ap.add_argument("--cache-kind", default="bf16",
                    choices=["bf16", "int8"])
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--n-layers", type=int, default=8)
    ap.add_argument("--n-heads", type=int, default=16)
    ap.add_argument("--n-kv-heads", type=int, default=4)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--paged", action="store_true",
                    help="block-table paged KV pool (the engine-level "
                         "paged-vs-contiguous A/B)")
    ap.add_argument("--lm-head-kind", default=None,
                    choices=["fp32", "bf16", "int8", "int4", "w4a8"],
                    help="re-encode the LM head (init keeps it fp32 "
                         "for trainability — but a 7B fp32 unembed "
                         "streams 524 MB per decoded token, 12%% of "
                         "the batch-1 step; round-5 trace)")
    ap.add_argument("--page", type=int, default=None,
                    help="tokens per page (default good_page_size; "
                         "long caches amortize the kernel's per-page "
                         "walk with bigger pages)")
    ap.add_argument("--cache-pages", type=int, default=None,
                    help="paged pool size incl. trash page; less than "
                         "slots*max_seq/page oversubscribes — the "
                         "engine preempts-and-requeues when it runs dry")
    ap.add_argument("--prefix-cache", action="store_true")
    ap.add_argument("--alloc-backend", default="py",
                    choices=["py", "native"],
                    help="paged-KV allocator tier (parallel/kv_alloc)")
    ap.add_argument("--spec-gamma", type=int, default=0,
                    help="> 0: speculative decoding under continuous "
                         "batching (ServingEngine.run_spec) with this "
                         "many draft tokens per round; greedy only")
    ap.add_argument("--spec-rounds", type=int, default=4)
    ap.add_argument("--spec-draft-layers", type=int, default=4,
                    help="draft = the target's first K layers "
                         "(early-exit; shares embed/head)")
    ap.add_argument("--spec-lookup", type=int, default=0, metavar="N",
                    help="> 0: weights-free prompt-lookup speculative "
                         "decoding (run_spec_lookup) with N-gram "
                         "matching; uses --spec-gamma/--spec-rounds, "
                         "no draft model")
    ap.add_argument("--prompt-style", default="random",
                    choices=["random", "loop", "mixed"],
                    help="loop: periodic prompts (the repetition-heavy "
                         "regime where prompt lookup pays); mixed: "
                         "alternate loop/random per request")
    ap.add_argument("--window", type=int, default=16,
                    help="decode steps per device dispatch")
    ap.add_argument("--lookahead", type=int, default=1,
                    help="windows enqueued before the first token "
                         "fetch (async dispatch pipelining — hides "
                         "the relay's ~26 ms round trip; see "
                         "ops/dispatch_probe.py)")
    ap.add_argument("--prefill-chunk", type=int, default=None,
                    help="chunked prefill: admit prompts in fixed "
                         "C-token chunks (one compiled prefill shape "
                         "for all lengths)")
    ap.add_argument("--n-experts", type=int, default=0,
                    help="Mixtral-shape routed MLP: top-k of N SwiGLU "
                         "experts (expert stacks follow --weight-kind)")
    ap.add_argument("--moe-top-k", type=int, default=2)
    ap.add_argument("--moe-ragged", action="store_true",
                    help="route prefill-scale MoE through the ragged "
                         "grouped GEMM (cost-based fallback at decode)")
    ap.add_argument("--d-ff", type=int, default=None,
                    help="MLP width (default d_model*11/4; for a "
                         "dense-FLOP-equivalent MoE use "
                         "d_ff = dense_d_ff / top_k)")
    args = ap.parse_args()
    if (args.spec_gamma or args.spec_lookup) and args.temperature > 0:
        ap.error("speculative modes require greedy (--temperature 0)")

    cfg = llama.LlamaConfig(
        vocab=32000, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=args.n_heads, n_kv_heads=args.n_kv_heads,
        d_ff=args.d_ff or args.d_model * 11 // 4,
        max_seq=args.max_seq, weight_kind=args.weight_kind,
        n_experts=args.n_experts, moe_top_k=args.moe_top_k,
        moe_ragged=args.moe_ragged)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    if args.lm_head_kind:
        from how_to_optimize_gemm_tpu.models.linear import make_linear
        params["lm_head"] = make_linear(params["lm_head"]["fp32_w"],
                                        args.lm_head_kind)

    eng = ServingEngine(cfg, params, batch_slots=args.slots,
                        cache_kind=args.cache_kind,
                        sample=make_sampler(args.temperature, top_k=40),
                        paged=args.paged, page=args.page,
                        cache_pages=args.cache_pages,
                        prefix_cache=args.prefix_cache,
                        alloc_backend=args.alloc_backend,
                        prefill_chunk=args.prefill_chunk)
    rng = np.random.default_rng(0)

    def prompt_of(i):
        if args.prompt_style == "loop" or (args.prompt_style == "mixed"
                                           and i % 2 == 0):
            # period-P repeating tokens (the parallel/speculative CLI's
            # loop:P workload), staggered per request; "mixed"
            # alternates loop/random per uid — the round-5 task-3
            # workload (spec-lookup must win on the repetitive half
            # without sinking the random half)
            return list(np.arange(args.prompt_len) % (4 + i % 3) + 7)
        return list(rng.integers(1, 30000, args.prompt_len))

    mk = lambda: [Request(uid=i, prompt=prompt_of(i),
                          max_new=args.max_new)
                  for i in range(args.requests)]
    if args.spec_lookup:
        run = lambda: eng.run_spec_lookup(mk(), gamma=args.spec_gamma
                                          or 4, ngram=args.spec_lookup,
                                          rounds=args.spec_rounds)
    elif args.spec_gamma:
        from how_to_optimize_gemm_tpu.parallel.speculative import (
            truncated_draft)
        cfg_d, params_d = truncated_draft(cfg, params,
                                          args.spec_draft_layers)
        run = lambda: eng.run_spec(mk(), cfg_d, params_d,
                                   gamma=args.spec_gamma,
                                   rounds=args.spec_rounds)
    else:
        run = lambda: eng.run(mk(), window=args.window,
                              lookahead=args.lookahead)
    run()                          # warm every compile path
    t0 = time.perf_counter()
    done = run()
    dt = time.perf_counter() - t0
    ntok = sum(len(r.out) for r in done)
    for r in done[:2]:
        print(f"request {r.uid}: {r.out[:8]}...")
    ttfts = [r.t_first - r.t_submit for r in done if r.t_first]
    extra = ""
    if args.paged:
        used = eng.n_pages - 1
        extra = (f"; paged pool {used} pages x {eng.page} tok"
                 + (f", prefix hits {eng.prefix_hit_tokens} tok"
                    if args.prefix_cache else ""))
    # decode-only steady rate: long prompts put seconds of prefill
    # inside the wall clock (a 32k TTFT is ~3.5 s), so tokens/wall
    # under-reports decode by 2x+ at long context
    t0s = [r.t_first for r in done if r.t_first]
    t1s = [r.t_done for r in done if r.t_done]
    dec_tok = sum(max(len(r.out) - 1, 0) for r in done)
    dec_dt = max(t1s) - min(t0s) if t0s and t1s else 0.0
    steady = f"; decode-only {dec_tok / dec_dt:.0f} tok/s" \
        if dec_dt > 0 and dec_tok else ""
    print(f"{ntok} tokens in {dt:.2f}s = {ntok / dt:.0f} tok/s; "
          f"TTFT p50={sorted(ttfts)[len(ttfts) // 2] * 1e3:.0f} ms "
          f"max={max(ttfts) * 1e3:.0f} ms{steady}{extra}")
    if args.spec_lookup and getattr(eng, "lookup_stats", None):
        rows = []
        for uid, (acc, rnds) in sorted(eng.lookup_stats.items()):
            kind = ("loop" if args.prompt_style == "loop"
                    or (args.prompt_style == "mixed" and uid % 2 == 0)
                    else "rand")
            rows.append(f"uid {uid} ({kind}): "
                        f"{acc / max(rnds, 1):.2f} acc/round")
        print("per-slot accept: " + "; ".join(rows))


if __name__ == "__main__":
    main()
