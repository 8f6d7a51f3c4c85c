"""Flagship model: Llama-2-architecture decoder on the quantized ladder.

Capabilities (north star, BASELINE.json): decode with int8/int4 weights
routed through the ladder kernels, KV cache, greedy generation, plus a
training step (for the multi-chip dry run). Architecture: pre-RMSNorm,
rotary position embeddings, grouped-query attention, SwiGLU MLP — the
Llama-2 recipe, sized by ``LlamaConfig`` (defaults are a tiny test model;
``llama2_7b()`` gives the real proportions).

Pure-pytree params (no flax) so shardings can be annotated per-leaf with
``jax.sharding.NamedSharding`` in parallel/sharding.py.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from how_to_optimize_gemm_tpu.models.linear import apply_linear, make_linear


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab: int = 256
    d_model: int = 128
    n_layers: int = 2
    n_heads: int = 4
    n_kv_heads: int = 2
    d_ff: int = 256
    max_seq: int = 128
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    weight_kind: str = "bf16"  # linear: fp32|bf16|int8|int4|w4a8
    # n_experts > 0 makes the MLP a top-k routed MoE (Mixtral shape):
    # SwiGLU experts via parallel/moe, dense-routed on one device,
    # expert-parallel over an ep mesh axis with moe_ffn. Expert stacks
    # follow weight_kind (int8 -> W8A16 stacks, int4/w4a8 -> packed
    # nibbles), both at init_params and through requantize(); quantized
    # stacks are frozen under training (QLoRA-style — scales and all
    # float leaves still train).
    # moe_dropless=True (default) forces per-chunk no-drop capacity
    # (cf = E/k): every token's routing is independent of its co-batch,
    # so serving output is deterministic per request — at the price of
    # E/k x the useful expert FLOPs (static shapes cannot size buffers
    # to the realized routing). moe_dropless=False uses moe_capacity
    # (GShard semantics: overflow tokens drop, output depends on the
    # co-batch — acceptable in training, surprising in serving).
    # moe_ragged=True routes the MLP through the Pallas grouped GEMM
    # (ops/pallas_grouped_gemm): dropless AND overcompute-free (each
    # expert multiplies exactly its own token segment). Differentiable
    # at every stack width (dense: full grads; int8/int4: QLoRA-style
    # frozen stacks). Needs d_ff % 128 == 0 on real TPUs.
    n_experts: int = 0
    moe_top_k: int = 2
    moe_capacity: float = 2.0
    moe_dropless: bool = True
    moe_aux_weight: float = 0.01
    moe_ragged: bool = False
    # ragged routing is COST-BASED (measured, round 3): below this many
    # routed copies the dropless dispatch path runs instead (decode
    # widths: dispatch hits the weight-stream roofline, the ragged
    # layout's padding is pure overhead). None = auto (2 blocks per
    # expert, 2*E*128); 0 forces ragged at every width (tests).
    moe_ragged_min_tokens: int | None = None

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads


def llama2_7b(weight_kind: str = "int8") -> LlamaConfig:
    """Llama-2-7B proportions (vocab 32000, 32 layers, d_model 4096)."""
    return LlamaConfig(vocab=32000, d_model=4096, n_layers=32, n_heads=32,
                       n_kv_heads=32, d_ff=11008, max_seq=4096,
                       weight_kind=weight_kind)


def mixtral_8x7b(weight_kind: str = "bf16") -> LlamaConfig:
    """Mixtral-8x7B proportions: GQA 32/8, 8 SwiGLU experts, top-2
    routing. Attention/embeddings follow weight_kind; expert stacks stay
    dense bf16 (see LlamaConfig.n_experts)."""
    return LlamaConfig(vocab=32000, d_model=4096, n_layers=32, n_heads=32,
                       n_kv_heads=8, d_ff=14336, max_seq=4096,
                       weight_kind=weight_kind, n_experts=8, moe_top_k=2)


# ---------------------------------------------------------------- params

def init_params(key: jax.Array, cfg: LlamaConfig) -> dict[str, Any]:
    """Random init; linears stored in cfg.weight_kind format."""
    k_embed, k_out, *k_layers = jax.random.split(key, 2 + cfg.n_layers)

    def dense(k, d_in, d_out, kind):
        w = jax.random.normal(k, (d_in, d_out), jnp.float32)
        w = w * (d_in ** -0.5)
        return make_linear(w, kind)

    d, h, kvh, dh = cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.d_head
    layers = []
    for kl in k_layers:
        ks = jax.random.split(kl, 7)
        layer = {
            "attn_norm": jnp.ones((d,), jnp.float32),
            "wq": dense(ks[0], d, h * dh, cfg.weight_kind),
            "wk": dense(ks[1], d, kvh * dh, cfg.weight_kind),
            "wv": dense(ks[2], d, kvh * dh, cfg.weight_kind),
            "wo": dense(ks[3], h * dh, d, cfg.weight_kind),
            "mlp_norm": jnp.ones((d,), jnp.float32),
        }
        if cfg.n_experts > 0:
            from how_to_optimize_gemm_tpu.parallel.moe import (
                init_moe_params, quantize_moe)
            edtype = (jnp.float32 if cfg.weight_kind == "fp32"
                      else jnp.bfloat16)
            moe_p = init_moe_params(ks[4], d, cfg.d_ff,
                                    cfg.n_experts, dtype=edtype,
                                    swiglu=True)
            # expert stacks follow weight_kind like every other linear
            # (a bf16 stack under weight_kind=int8 would silently run —
            # and count HBM — at 2 B/elt)
            if cfg.weight_kind == "int8":
                moe_p = quantize_moe(moe_p, bits=8)
            elif cfg.weight_kind in ("int4", "w4a8"):
                moe_p = quantize_moe(moe_p, bits=4)
            layer["moe"] = moe_p
        else:
            layer["w_gate"] = dense(ks[4], d, cfg.d_ff, cfg.weight_kind)
            layer["w_up"] = dense(ks[5], d, cfg.d_ff, cfg.weight_kind)
            layer["w_down"] = dense(ks[6], cfg.d_ff, d, cfg.weight_kind)
        layers.append(layer)
    return {
        "embed": jax.random.normal(k_embed, (cfg.vocab, d),
                                   jnp.float32) * 0.02,
        "out_norm": jnp.ones((d,), jnp.float32),
        # lm head kept fp32 for trainability; quantize via requantize()
        "lm_head": dense(k_out, d, cfg.vocab, "fp32"),
        "layers": layers,
    }


def requantize(params: dict, kind: str) -> dict:
    """Re-encode every linear of a params tree into ``kind`` (offline
    weight quantization for serving)."""
    from how_to_optimize_gemm_tpu.models.linear import linear_kind
    from how_to_optimize_gemm_tpu.ops import quant

    def to_dense(lin):
        k = linear_kind(lin)
        if k == "fp32":
            return lin["fp32_w"]
        if k == "bf16":
            return lin["bf16_w"].astype(jnp.float32)
        if k == "int8":
            return quant.dequantize(lin["int8_qw"], lin["int8_sw"])
        if k == "int4":
            # crop the pack-time K padding back to the stored true d_in
            # (K=11008-class dims round up to 512 multiples when packed)
            wq = quant.unpack_int4(lin["int4_packed"],
                                   512)[:int(lin["int4_kdim"])]
            return quant.dequantize(wq, lin["int4_sw"])
        if k == "w4a8":
            wq = quant.unpack_int4(lin["w4a8_packed"],
                                   512)[:int(lin["w4a8_kdim"])]
            return quant.dequantize(wq, lin["w4a8_sw"])
        raise ValueError(k)

    def walk(node):
        if isinstance(node, dict):
            keys = list(node)
            if "router" in keys and any(
                    k in keys for k in ("w_in", "w_in_q", "w_in_q4")):
                # MoE expert stacks follow the bit width: int8 -> W8A16
                # stacks; int4/w4a8 -> nibble-packed stacks (decoded in
                # VMEM by the ragged grouped GEMM); fp32/bf16 restore
                # dense stacks
                from how_to_optimize_gemm_tpu.parallel.moe import (
                    dequantize_moe, quantize_moe)
                dense = dequantize_moe(node)
                if kind == "int8":
                    return quantize_moe(dense, bits=8)
                if kind in ("int4", "w4a8"):
                    return quantize_moe(dense, bits=4)
                return dense
            if keys and all("_" in k for k in keys) and any(
                    k.split("_")[0] in ("fp32", "bf16", "int8", "int4",
                                        "w4a8")
                    for k in keys):
                return make_linear(to_dense(node), kind)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def _fuse_linears(lins):
    """Concat same-kind (d_in, N_i) linears along the output dim. Every
    format's leaves are (K', N) arrays or (1, N) scales, so fusion is
    leaf-wise concatenation; per-OUTPUT-channel quantization scales make
    it bit-exact (each output column keeps its own scale), and the
    activation quantization is per-row of the SHARED input, so the fused
    product is bit-identical to the unfused ones."""
    from how_to_optimize_gemm_tpu.models.linear import linear_kind
    kinds = {linear_kind(l) for l in lins}
    assert len(kinds) == 1, f"cannot fuse mixed kinds {kinds}"
    return {key: (lins[0][key] if key.endswith("_kdim")
                  else jnp.concatenate([l[key] for l in lins], axis=-1))
            for key in lins[0]}


def fuse_projections(params: dict) -> dict:
    """Serving-time transform: per layer, fuse wq/wk/wv into one "wqkv"
    linear and (dense-MLP layers) w_gate/w_up into "w_gate_up". One GEMV
    + one activation quantization where there were three (QKV) or two
    (gate/up) — at decode widths that is 5 of every 7 projection
    launches and their dispatch gaps gone (RESULTS.md round-3 anatomy:
    ~14 ms/window of host-dispatch gaps across ~4,700 ops; the
    reference's analogue is interleaving loads into compute,
    aarch64 MMult_4x4_17). _block/_mlp split the fused outputs;
    generation is bit-identical (tested, every weight kind). Do not use
    under LoRA serving (adapters key on the unfused names — _lin would
    silently skip their deltas) or training (params stay canonical)."""
    layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        layer["wqkv"] = _fuse_linears(
            [layer.pop("wq"), layer.pop("wk"), layer.pop("wv")])
        if "w_gate" in layer:
            layer["w_gate_up"] = _fuse_linears(
                [layer.pop("w_gate"), layer.pop("w_up")])
        layers.append(layer)
    return {**params, "layers": layers}


# --------------------------------------------------------------- modules

def rmsnorm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * g


def _rope_freqs(cfg: LlamaConfig, positions: jnp.ndarray):
    """positions: (..., seq) int32 -> cos/sin (..., seq, d_head/2)."""
    inv = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, cfg.d_head, 2, dtype=jnp.float32) / cfg.d_head))
    ang = positions[..., None].astype(jnp.float32) * inv
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (..., seq, heads, d_head); cos/sin: (..., seq, d_head/2)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1)


def _attention(q, k, v, mask):
    """q: (B,S,H,D); k,v: (B,T,KVH,D); mask: (S,T), (B,S,T) or None.

    GQA without materialization: q folds its heads into (kv_head, rep)
    groups and contracts against the UNEXPANDED cache. The obvious
    ``jnp.repeat(k, rep)`` + cache ``astype(float32)`` formulation costs
    ~0.96 ms/LAYER at (B=8, T=2048) on v5e — ~370 MB of materialized
    fp32 per layer vs the 16.8 MB the cache actually occupies; this form
    measures ~50x less attention traffic (the MXU consumes bf16
    natively, fp32 comes out of preferred_element_type)."""
    b, s, h, d = q.shape
    kvh = k.shape[2]
    rep = h // kvh
    qg = q.reshape(b, s, kvh, rep, d).astype(k.dtype)
    logits = jnp.einsum("bsgrd,btgd->bgrst", qg, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (d ** -0.5)
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None]
        # mask (B,S,T) -> broadcast over (g, r)
        logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bgrst,btgd->bsgrd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h * d)


def _route_flash(use_pallas, s: int, dh: int) -> bool:
    """Prefill attention routing: the flash kernel wants a long-enough
    causal self-attention and a lane-friendly head dim. S need not be
    block-divisible (round 2): the kernel pads + masks the tail."""
    from how_to_optimize_gemm_tpu.utils.env import on_tpu
    enabled = use_pallas if use_pallas is not None else on_tpu()
    return bool(enabled) and s >= 512 and dh in (64, 128)


def _route_decode(use_pallas, t: int, dh: int, kvh: int,
                  batch: int = 8, kv8: bool = False) -> bool:
    """Decode-attention routing. GQA widths (kvh*dh <= 1024, 128-lane
    multiple) ride the fused-head v4 kernel; wide-MHA (kvh*dh > 1024)
    rides the per-head v3 kernel — dh == 128 directly, dh == 64 via
    the head-pairing cache view (even kvh; round 2 — the last eager-
    only width removed). Odd-kvh dh=64 widths still decode eagerly —
    see pallas_decode_attention._kernel_v4/_kernel_v3/_pair_heads.

    Cost-based threshold (measured, round 2): eager's cost is one
    full-cache read per step, so the deciding quantity is CACHE BYTES.
    d2048/22L/batch8 int8 weights: 16.8 MB/layer (T=2048) -> eager
    wins (2374 vs 2101 tok/s); 33.5 MB (T=4096) -> paged wins (1828
    vs 1515), lead growing with T (round 1: 2559 vs 1094 at T=8192).
    The crossover sits at ~24 MB/layer of cache traffic. KV8 caches
    read HALF the bytes eagerly (_attention_kv8 folds the scales into
    int8 einsums — no dequantized copy), so their bytes are counted at
    1 B/elt against the same crossover. Wide-MHA dh=128 models (e.g.
    7B: 67 MB/layer at batch 2) stay paged at every practical length.

    Wide-MHA dh=64 (the head-pairing cache view) routes EAGER — the
    queued round-2 A/B finally ran in round 3 and the paired route
    LOST decisively: 258.5 vs eager's 395.2 tok/s (d2048/22L, kvh=32,
    T=4096, batch 4, decode-from-empty — the protocol that FAVORS the
    length-aware kernel). The per-pair-program overhead of the v3
    walk at 16 pairs dominates everything its smaller reads save; an
    honest negative kept with the view (_pair_heads) still available
    explicitly."""
    w = kvh * dh
    kernel_ok = (w % 128 == 0 and w <= 1024) or (w > 1024
                                                 and dh == 128)
    cache_bytes = batch * t * w * (1 if kv8 else 2) * 2   # K + V
    worth_it = cache_bytes >= 24 * 1024 * 1024
    return _route_flash(use_pallas, t, dh) and kernel_ok and worth_it


def _route_kv_write(use_pallas, s: int, supported: bool = True) -> bool:
    """Decode-width cache writes ride the in-place Pallas DMA kernel
    (ops/pallas_kv_update): the write becomes S tiny row DMAs into the
    ALIASED cache buffer instead of a scatter XLA wraps in full-cache
    copy-on-write (+ a convert round trip at 7B widths) — the measured
    ~3.3 ms/step decode tax of the round-3 anatomy (RESULTS.md). Chip
    microbench, one 16 MB 7B layer cache: 0.31 vs 3.06 us/update.
    Routed at decode/spec widths only (small S): prefill writes are
    one-shot full-width updates where the copy IS the write.
    ``supported``: the layout gate (pallas_kv_update.kernel_supported —
    Mosaic tiling constraints, chip-caught on a d_head=64 model)."""
    from how_to_optimize_gemm_tpu.utils.env import on_tpu
    enabled = use_pallas if use_pallas is not None else on_tpu()
    return bool(enabled) and s <= 8 and supported


def _update_cache(cache, new, pos, write_mask=None, use_pallas=None):
    """cache (B,T,KVH,D) <- new (B,S,KVH,D) at position pos (scalar or
    (B,)).

    Cache layout is TIME-MAJOR (B,T,KVH,D) — XLA's scatter prefers it
    physically (verified in HLO: a head-major cache made the scatter and
    the decode-attention custom call disagree on layout, inserting a
    full-cache copy per layer per step), and the decode kernel slices
    whole (bk, KVH, D) chunks along the untiled T dim, which is
    DMA-alignment-legal.

    write_mask (B,) bool: slots with False keep their cache untouched —
    the mechanism behind single-call batched prefill (one slot writes its
    whole prompt; live slots are unaffected)."""
    new = new.astype(cache.dtype)
    from how_to_optimize_gemm_tpu.ops.pallas_kv_update import (
        kernel_supported, kv_update)
    if _route_kv_write(use_pallas, new.shape[1],
                       kernel_supported(cache.shape, cache.dtype)):
        return kv_update(cache, new, pos, write_mask)
    if write_mask is not None:
        updated = _update_cache(cache, new, pos)
        bc = write_mask.reshape((-1,) + (1,) * (cache.ndim - 1))
        return jnp.where(bc, updated, cache)
    if jnp.ndim(pos) == 0:
        return jax.lax.dynamic_update_slice_in_dim(cache, new, pos, axis=1)
    if new.shape[1] == 1:
        # Per-slot single-token write (continuous-batching decode): a
        # scatter updates in place inside the step; the vmap'd
        # dynamic_update_slice formulation copied the whole cache
        # (measured 17.1 vs 3.7 us per update at (8,2048,4,64) on v5e —
        # ~0.6 ms/step across 22 layers x k,v).
        b = cache.shape[0]
        return cache.at[jnp.arange(b), pos].set(new[:, 0])
    return jax.vmap(
        lambda c, n, p: jax.lax.dynamic_update_slice_in_dim(c, n, p,
                                                            axis=0)
    )(cache, new, pos)


def _update_paged_cache(pool, new, pos, table, write_mask=None,
                        use_pallas=None):
    """Paged-cache write: pool (NP, PS, KVH, D) <- new (B, S, KVH, D) at
    positions pos..pos+S-1, routed through the block table (B, max_pages).

    One flat row scatter: per-token physical (page, offset) indices come
    from the table; masked slots (write_mask False) and positions whose
    chunk is unallocated (table entry 0) land on the TRASH page 0, which
    no live table row ever references — the paged analogue of the
    contiguous path's "bogus writes beyond the prompt are harmless"
    argument (_update_cache), made harmless by construction."""
    new = new.astype(pool.dtype)
    b, s = new.shape[:2]
    ps = pool.shape[1]
    posv = pos if jnp.ndim(pos) else jnp.full((b,), pos, jnp.int32)
    positions = posv[:, None] + jnp.arange(s)            # (B, S)
    chunk = jnp.clip(positions // ps, 0, table.shape[1] - 1)
    pages = jnp.take_along_axis(table, chunk, axis=1)    # (B, S)
    offs = positions % ps
    if write_mask is not None:
        pages = jnp.where(write_mask[:, None], pages, 0)
    from how_to_optimize_gemm_tpu.ops.pallas_kv_update import (
        kernel_supported, paged_kv_update)
    if _route_kv_write(use_pallas, s,
                       kernel_supported(pool.shape, pool.dtype)):
        # Kernel skips page-0 rows outright (masked slots above, plus
        # unallocated chunks) — "write trash" and "don't write" are
        # observably identical, minus the DMA.
        return paged_kv_update(pool, new, pages, offs)
    return pool.at[pages.reshape(-1), offs.reshape(-1)].set(
        new.reshape((b * s,) + new.shape[2:]))


def init_paged_kv_cache(cfg: LlamaConfig, n_pages: int, page: int,
                        dtype=jnp.bfloat16, quantized: bool = False):
    """Page-pool cache: per layer (k_pool, v_pool) of shape
    (n_pages, page, KVH, D). Page 0 is the reserved trash page (see
    _update_paged_cache); the block table lives with the ENGINE (one
    table shared by all layers — same slot->page geometry), not here.

    quantized=True (KV8): per layer (qk, sk, qv, sv) pools — int8
    values + lane-padded (n_pages, page, 128) fp32 scales, the paged
    form of init_kv_cache's quantized layout."""
    shape = (n_pages, page, cfg.n_kv_heads, cfg.d_head)
    if quantized:
        assert cfg.n_kv_heads <= 128
        sshape = (n_pages, page, 128)
        mk = lambda: (jnp.zeros(shape, jnp.int8),
                      jnp.zeros(sshape, jnp.float32))
        return [mk() + mk() for _ in range(cfg.n_layers)]
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.n_layers)]


def _lin(layer, name, x, use_pallas, lora=None):
    """apply_linear plus the per-slot LoRA delta when a multi-adapter
    tuple (layer_entry, idx, scale) is threaded in (models/lora)."""
    y = apply_linear(layer[name], x, use_pallas)
    if lora is not None and name in lora[0]:
        from how_to_optimize_gemm_tpu.models.lora import lora_delta
        y = y + lora_delta(lora[0][name], x, lora[1],
                           lora[2]).astype(y.dtype)
    return y


def _mlp(layer, cfg: LlamaConfig, y, use_pallas, lora=None):
    """SwiGLU MLP, dense or routed: cfg.n_experts > 0 stores a "moe"
    dict instead of w_gate/w_up/w_down and routes every token to its
    top-k SwiGLU experts (parallel/moe.moe_ffn_local — same math as the
    expert-parallel moe_ffn, minus the all_to_alls). Returns (out, aux)
    — aux is the GShard load-balance loss (0 for the dense MLP)."""
    if "moe" in layer:
        from how_to_optimize_gemm_tpu.parallel.moe import (
            moe_ffn_local, moe_ffn_ragged)
        b, s, d = y.shape
        # Cost-based ragged routing (measured, round 3, v5e): the
        # grouped GEMM wins at prefill scale (int8 T=4096: 2.43 vs the
        # dispatch path's 4.17 ms) but loses at decode widths, where
        # both paths stream every expert's weights once and the ragged
        # layout's E*bt padded rows + grid steps are pure overhead
        # (batch 8 decode: dispatch 0.107 ms at 650 GB/s — the HBM
        # roofline — vs ragged 0.196). Route ragged only when the
        # routed copies fill >= 2 blocks per expert on average;
        # the dispatch fallback keeps droplessness (cf = E/k).
        min_tokens = (2 * cfg.n_experts * 128
                      if cfg.moe_ragged_min_tokens is None
                      else cfg.moe_ragged_min_tokens)
        ragged_worth_it = b * s * cfg.moe_top_k >= min_tokens
        if cfg.moe_ragged and ragged_worth_it:
            out, aux = moe_ffn_ragged(layer["moe"], y.reshape(b * s, d),
                                      k=cfg.moe_top_k, return_aux=True)
            return out.reshape(b, s, d), aux
        cf = cfg.moe_capacity
        if cfg.moe_dropless or cfg.moe_ragged:
            # per-chunk no-drop: routing independent of the co-batch
            # (serving determinism — see LlamaConfig). The ragged
            # path's decode-width fallback keeps its droplessness.
            cf = max(cf, cfg.n_experts / cfg.moe_top_k)
        out, aux = moe_ffn_local(layer["moe"], y.reshape(b * s, d),
                                 k=cfg.moe_top_k, capacity_factor=cf,
                                 return_aux=True)
        return out.reshape(b, s, d), aux
    if "w_gate_up" in layer:
        gu = _lin(layer, "w_gate_up", y, use_pallas, lora)
        gate, up = gu[..., :cfg.d_ff], gu[..., cfg.d_ff:]
    else:
        gate = _lin(layer, "w_gate", y, use_pallas, lora)
        up = _lin(layer, "w_up", y, use_pallas, lora)
    return _lin(layer, "w_down", jax.nn.silu(gate) * up, use_pallas,
                lora), jnp.float32(0.0)


def _block(layer, cfg: LlamaConfig, x, cos, sin, kv=None, mask=None,
           use_pallas=None, write_mask=None, prefill_self=False,
           flash_train=False, lora=None):
    """One transformer block. kv None = full-sequence (training/prefill
    without cache); kv = (k_cache, v_cache, pos) for decode, pos scalar or
    per-slot (B,) vector (continuous batching). lora = (layer_adapters,
    idx, scale) threads per-row multi-LoRA deltas through every target
    linear (models/lora)."""
    b, s, d = x.shape
    h, kvh, dh = cfg.n_heads, cfg.n_kv_heads, cfg.d_head

    y = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
    if "wqkv" in layer:
        qkv = _lin(layer, "wqkv", y, use_pallas, lora)
        q = qkv[..., :h * dh].reshape(b, s, h, dh)
        k = qkv[..., h * dh:(h + kvh) * dh].reshape(b, s, kvh, dh)
        v = qkv[..., (h + kvh) * dh:].reshape(b, s, kvh, dh)
    else:
        q = _lin(layer, "wq", y, use_pallas, lora).reshape(b, s, h, dh)
        k = _lin(layer, "wk", y, use_pallas, lora).reshape(b, s, kvh, dh)
        v = _lin(layer, "wv", y, use_pallas, lora).reshape(b, s, kvh, dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_kv = None
    if kv is not None and len(kv) == 6:
        # KV8 paged cache: (qk_pool, sk_pool, qv_pool, sv_pool, table,
        # pos) — quantized page pools through the same block table.
        from how_to_optimize_gemm_tpu.ops.pallas_paged_attention import (
            gather_paged, paged_decode_attention_q8)
        qkp, skp, qvp, svp, table, pos = kv
        ps = qkp.shape[1]
        t_virt = table.shape[1] * ps
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        pad_g = skp.shape[-1] - ks.shape[-1]
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad_g)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad_g)))
        qkp = _update_paged_cache(qkp, kq, pos, table, write_mask,
                                  use_pallas)
        skp = _update_paged_cache(skp, ks, pos, table, write_mask,
                                  use_pallas)
        qvp = _update_paged_cache(qvp, vq, pos, table, write_mask,
                                  use_pallas)
        svp = _update_paged_cache(svp, vs, pos, table, write_mask,
                                  use_pallas)
        if prefill_self:
            if _route_flash(use_pallas, s, dh):
                from how_to_optimize_gemm_tpu.ops.pallas_attention import (
                    mha_flash)
                attn = mha_flash(q, k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), causal=True)
            else:
                causal = jnp.tril(jnp.ones((s, s), bool))
                attn = _attention(q, k, v, causal)
        elif s == 1 and _route_decode(use_pallas, t_virt, dh, kvh,
                                      batch=b, kv8=True):
            lengths = (pos if jnp.ndim(pos) else jnp.full(
                (b,), pos, jnp.int32)) + 1
            attn = paged_decode_attention_q8(
                q[:, 0], qkp, skp, qvp, svp, table, lengths)[:, None]
        else:
            q_pos = (pos[..., None] if jnp.ndim(pos) else pos) \
                + jnp.arange(s)
            valid = jnp.arange(t_virt) <= q_pos[..., None]
            attn = _attention_kv8(q, gather_paged(qkp, table),
                                  gather_paged(skp, table),
                                  gather_paged(qvp, table),
                                  gather_paged(svp, table), valid)
        x = x + _lin(layer, "wo", attn, use_pallas, lora)
        y = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
        mlp_out, aux = _mlp(layer, cfg, y, use_pallas, lora)
        return x + mlp_out, (qkp, skp, qvp, svp), aux
    if kv is not None and len(kv) == 4:
        # Paged (block-table) cache: (k_pool, v_pool, table, pos) — see
        # ops/pallas_paged_attention. Routing mirrors the contiguous
        # branch with t = the table's virtual extent.
        from how_to_optimize_gemm_tpu.ops.pallas_paged_attention import (
            gather_paged, paged_decode_attention as _pda)
        k_pool, v_pool, table, pos = kv
        ps = k_pool.shape[1]
        t_virt = table.shape[1] * ps
        k_pool = _update_paged_cache(k_pool, k, pos, table, write_mask,
                                     use_pallas)
        v_pool = _update_paged_cache(v_pool, v, pos, table, write_mask,
                                     use_pallas)
        if prefill_self:
            if _route_flash(use_pallas, s, dh):
                from how_to_optimize_gemm_tpu.ops.pallas_attention import (
                    mha_flash)
                attn = mha_flash(q, k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), causal=True)
            else:
                causal = jnp.tril(jnp.ones((s, s), bool))
                attn = _attention(q, k, v, causal)
        elif s == 1 and _route_decode(use_pallas, t_virt, dh, kvh,
                                      batch=b):
            lengths = (pos if jnp.ndim(pos) else jnp.full(
                (b,), pos, jnp.int32)) + 1
            attn = _pda(q[:, 0], k_pool, v_pool, table, lengths)[:, None]
        else:
            # eager fallback (CPU / short caches): gather the pool into
            # a slot-contiguous view — the same full-cache read the
            # contiguous eager path pays
            kc = gather_paged(k_pool, table)
            vc = gather_paged(v_pool, table)
            q_pos = (pos[..., None] if jnp.ndim(pos) else pos) \
                + jnp.arange(s)
            valid = jnp.arange(t_virt) <= q_pos[..., None]
            attn = _attention(q, kc, vc, valid)
        x = x + _lin(layer, "wo", attn, use_pallas, lora)
        y = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
        mlp_out, aux = _mlp(layer, cfg, y, use_pallas, lora)
        return x + mlp_out, (k_pool, v_pool), aux
    if kv is not None and len(kv) == 5:
        # KV8 quantized cache: (qk, sk, qv, sv, pos)
        qk, sk, qv, sv, pos = kv
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        pad_g = sk.shape[-1] - ks.shape[-1]
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad_g)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad_g)))
        qk = _update_cache(qk, kq, pos, write_mask, use_pallas)
        sk = _update_cache(sk, ks, pos, write_mask, use_pallas)
        qv = _update_cache(qv, vq, pos, write_mask, use_pallas)
        sv = _update_cache(sv, vs, pos, write_mask, use_pallas)
        t = qk.shape[1]
        if prefill_self:
            if _route_flash(use_pallas, s, dh):
                from how_to_optimize_gemm_tpu.ops.pallas_attention import (
                    mha_flash)
                attn = mha_flash(q, k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), causal=True)
            else:
                causal = jnp.tril(jnp.ones((s, s), bool))
                attn = _attention(q, k, v, causal)
        elif s == 1 and _route_decode(use_pallas, t, dh, qk.shape[2],
                                      batch=qk.shape[0], kv8=True):
            from how_to_optimize_gemm_tpu.ops.pallas_decode_attention \
                import decode_attention_q8
            lengths = (pos if jnp.ndim(pos) else jnp.full(
                (x.shape[0],), pos, jnp.int32)) + 1
            attn = decode_attention_q8(q[:, 0], qk, sk, qv, sv,
                                       lengths)[:, None]
        else:
            q_pos = (pos[..., None] if jnp.ndim(pos) else pos) \
                + jnp.arange(s)
            valid = jnp.arange(t) <= q_pos[..., None]
            attn = _attention_kv8(q, qk, sk, qv, sv, valid)
        x = x + _lin(layer, "wo", attn, use_pallas, lora)
        y = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
        mlp_out, aux = _mlp(layer, cfg, y, use_pallas, lora)
        return x + mlp_out, (qk, sk, qv, sv), aux
    if kv is None:
        if flash_train and _route_flash(True, s, dh):
            # differentiable flash path (training long-context); any S
            # (round 2): mha_flash_train pads outside its custom VJP
            # and masks padded keys with t_real, so odd S no longer
            # falls back to eager autodiff
            from how_to_optimize_gemm_tpu.ops.pallas_attention import (
                mha_flash_train)
            attn = mha_flash_train(q, k, v, causal=True)
        elif _route_flash(use_pallas, s, dh):
            # Long-context prefill: the Pallas flash kernel streams K/V
            # blocks with an online softmax — never materializes (S, T)
            # scores (eager OOMs at S=4096: a 16 GB fp32 score tensor).
            # Inference-only routing: pallas_call has no autodiff, so
            # training paths must pass use_pallas=False (they do).
            from how_to_optimize_gemm_tpu.ops.pallas_attention import (
                mha_flash)
            attn = mha_flash(q, k.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16), causal=True)
        else:
            attn = _attention(q, k, v, mask)
    else:
        k_cache, v_cache, pos = kv
        k_cache = _update_cache(k_cache, k, pos, write_mask, use_pallas)
        v_cache = _update_cache(v_cache, v, pos, write_mask, use_pallas)
        t = k_cache.shape[1]
        # valid[t'] = t' <= pos + offset for each query offset
        if prefill_self:
            # Admission prefill: the slot starts at pos 0, so attention
            # over the cache == causal self-attention over the prompt
            # itself — no cache read at all, and the flash kernel applies
            # (the eager cached path would build (B, S, max_seq) scores:
            # admission of a 2k prompt at max_seq=8k is a 17 GB tensor).
            if _route_flash(use_pallas, s, dh):
                from how_to_optimize_gemm_tpu.ops.pallas_attention import (
                    mha_flash)
                attn = mha_flash(q, k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), causal=True)
            else:
                causal = jnp.tril(jnp.ones((s, s), bool))
                attn = _attention(q, k, v, causal)
        elif s == 1 and _route_decode(use_pallas, t, dh,
                                      k_cache.shape[2],
                                      batch=k_cache.shape[0]):
            # dh == 128: the kernel's manual cache DMA needs a full-128
            # lane dim; dh == 64 rides the head-pairing cache view
            # (round 2 — two kv heads per 128-lane row, even kvh only).
            # Length-aware decode kernel: reads ceil(len/bk) cache chunks
            # per slot instead of the whole max_seq cache (eager pays
            # max_seq traffic regardless of how full a slot is).
            from how_to_optimize_gemm_tpu.ops.pallas_decode_attention \
                import decode_attention
            lengths = (pos if jnp.ndim(pos) else jnp.full(
                (b,), pos, jnp.int32)) + 1
            attn = decode_attention(q[:, 0], k_cache, v_cache,
                                    lengths)[:, None]
        else:
            q_pos = (pos[..., None] if jnp.ndim(pos) else pos) \
                + jnp.arange(s)
            valid = jnp.arange(t) <= q_pos[..., None]  # (S,T) or (B,S,T)
            # Cache stays in its storage dtype (bf16): upcasting it here
            # was ~100 MB/layer of materialized fp32 (see _attention
            # docstring).
            attn = _attention(q, k_cache, v_cache, valid)
        new_kv = (k_cache, v_cache)
    x = x + _lin(layer, "wo", attn, use_pallas, lora)

    y = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
    mlp_out, aux = _mlp(layer, cfg, y, use_pallas, lora)
    return x + mlp_out, new_kv, aux


# -------------------------------------------------------------- forward

def forward(params, cfg: LlamaConfig, tokens: jnp.ndarray,
            use_pallas: bool | None = None,
            remat: bool = False, flash_train: bool = False,
            return_moe_aux: bool = False,
            lora=None, lora_idx: jnp.ndarray | None = None):
    """Full-sequence forward (training / prefill): (B, S) -> (B, S, vocab).

    remat=True wraps each block in ``jax.checkpoint``: activations are
    recomputed in the backward pass instead of stored, trading ~1/3 more
    FLOPs for O(sqrt) activation memory — the standard TPU move for
    HBM-bound training (the "rematerialisation" capability slot).
    return_moe_aux=True additionally returns the mean per-layer GShard
    load-balance loss (0 for dense-MLP configs) — loss_fn adds it with
    cfg.moe_aux_weight so MoE routers train against collapse.
    lora + lora_idx (B,): per-row low-rank deltas on every adapted
    linear (models/lora) — the LoRA TRAINING path (gradients flow into
    the gathered adapter slices; the base can be frozen/quantized)."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    pos = jnp.arange(s)
    cos, sin = _rope_freqs(cfg, pos)
    mask = jnp.tril(jnp.ones((s, s), bool))
    if lora is not None and lora_idx is None:
        lora_idx = jnp.zeros((b,), jnp.int32)

    def block(layer, blk_lora, x):
        out, _, aux = _block(layer, cfg, x, cos, sin, mask=mask,
                             use_pallas=use_pallas,
                             flash_train=flash_train, lora=blk_lora)
        return out, aux

    if remat:
        block = jax.checkpoint(block)
    aux_total = jnp.float32(0.0)
    for li, layer in enumerate(params["layers"]):
        blk_lora = None if lora is None else (
            lora["layers"][li], lora_idx, lora["scale"])
        x, aux = block(layer, blk_lora, x)
        aux_total = aux_total + aux
    x = rmsnorm(x, params["out_norm"], cfg.norm_eps)
    logits = apply_linear(params["lm_head"], x, use_pallas)
    if return_moe_aux:
        return logits, aux_total / max(1, len(params["layers"]))
    return logits


def init_kv_cache(cfg: LlamaConfig, batch: int, dtype=jnp.bfloat16,
                  quantized: bool = False):
    """Time-major (B, T, KVH, D) — see _update_cache for why.

    quantized=True stores the cache as int8 with per-(token, head)
    symmetric scales (KV8): each layer entry becomes a 4-tuple
    (qk, sk, qv, sv) and halves cache HBM — double the batch or context
    at the same memory. Attention folds the scales into the softmax
    contractions (rank-1 per t, so they commute)."""
    shape = (batch, cfg.max_seq, cfg.n_kv_heads, cfg.d_head)
    if quantized:
        # scales are (B, T, 128) with the KVH heads in the first lanes:
        # the decode kernel DMA-slices (bk, 128) chunks and Mosaic
        # requires the lane dim be a full 128 tile (a bare KVH- or
        # 1-wide lane dim does not compile). ~6% memory overhead vs the
        # int8 values at d_head=128.
        assert cfg.n_kv_heads <= 128
        sshape = (batch, cfg.max_seq, 128)
        mk = lambda: (jnp.zeros(shape, jnp.int8),
                      jnp.zeros(sshape, jnp.float32))
        return [mk() + mk() for _ in range(cfg.n_layers)]
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.n_layers)]


def quantize_kv(x):
    """(B, S, G, D) -> int8 values + per-(b, s, g) scales (B, S, G)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.float32)


def _attention_kv8(q, qk, sk, qv, sv, mask):
    # scales arrive lane-padded to 128; crop to the real head count
    kvh_real = qk.shape[2]
    sk = sk[..., :kvh_real]
    sv = sv[..., :kvh_real]
    """Eager attention over the int8 cache: scales are rank-1 in t, so
    they fold into the contractions — the cache is never dequantized to
    a materialized fp32/bf16 copy (the lesson of _attention applies).

    On TPU the einsums consume int8 directly (halved cache traffic); on
    CPU they upcast first (XLA:CPU's dot thunk is picky, emulation
    path only)."""
    from how_to_optimize_gemm_tpu.utils.env import on_tpu
    b, s, h, d = q.shape
    kvh = qk.shape[2]
    rep = h // kvh
    tpu = on_tpu()
    qg = q.reshape(b, s, kvh, rep, d).astype(
        jnp.bfloat16 if tpu else jnp.float32)
    kq = qk if tpu else qk.astype(jnp.float32)
    vqv = qv if tpu else qv.astype(jnp.float32)
    logits = jnp.einsum("bsgrd,btgd->bgrst", qg, kq,
                        preferred_element_type=jnp.float32)
    sk_t = jnp.transpose(sk, (0, 2, 1))              # (B, G, T)
    logits = logits * sk_t[:, :, None, None, :]
    logits = logits * (d ** -0.5)
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None]
        logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    sv_t = jnp.transpose(sv, (0, 2, 1))
    probs = probs * sv_t[:, :, None, None, :]
    out = jnp.einsum("bgrst,btgd->bsgrd",
                     probs.astype(jnp.bfloat16 if tpu else jnp.float32),
                     vqv, preferred_element_type=jnp.float32)
    return out.reshape(b, s, h * d)


def decode_step(params, cfg: LlamaConfig, cache, tokens: jnp.ndarray,
                pos: jnp.ndarray, use_pallas: bool | None = None,
                write_mask: jnp.ndarray | None = None,
                prefill_self: bool = False,
                table: jnp.ndarray | None = None,
                lora=None, lora_idx: jnp.ndarray | None = None,
                logit_idx: jnp.ndarray | None = None):
    """One decode step: tokens (B, S) at position pos (scalar or per-slot
    (B,) vector) -> (logits, cache). write_mask (B,) bool restricts which
    slots' caches are written (used by batched prefill). prefill_self:
    the masked slot starts at pos 0, so attention is computed as causal
    self-attention over the new tokens only (flash-routable; no cache
    read). table (B, max_pages): the cache is PAGED — entries are
    (k_pool, v_pool) page pools read/written through this block table
    (see init_paged_kv_cache / ops/pallas_paged_attention).
    lora + lora_idx (B,) int32 (-1 = base): per-row multi-LoRA deltas
    on every adapted linear (models/lora — the BGMV serving path).
    logit_idx (B,) int32: unembed ONLY position logit_idx[b] of each
    row -> logits (B, 1, vocab). Admission prefill needs exactly one
    sampled position per slot, and full (B, P, vocab) prefill logits
    are the dominant admission allocation at long P (a 16k 7B
    prompt's fp32 logits alone are 2.1 GB — measured OOM, round 5);
    the selected row is bit-identical."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    positions = (pos[..., None] if jnp.ndim(pos) else pos) + jnp.arange(s)
    cos, sin = _rope_freqs(cfg, positions)
    new_cache = []
    for li, (layer, entry) in enumerate(zip(params["layers"], cache)):
        kv = (*entry, table, pos) if table is not None else (*entry, pos)
        blk_lora = None if lora is None else (
            lora["layers"][li], lora_idx, lora["scale"])
        x, kv, _ = _block(layer, cfg, x, cos, sin, kv=kv,
                       use_pallas=use_pallas, write_mask=write_mask,
                       prefill_self=prefill_self, lora=blk_lora)
        new_cache.append(kv)
    if logit_idx is not None:
        x = x[jnp.arange(b), logit_idx][:, None]
    x = rmsnorm(x, params["out_norm"], cfg.norm_eps)
    logits = apply_linear(params["lm_head"], x, use_pallas)
    return logits, new_cache


# ----------------------------------------------- stacked-layers decode

def stack_layers(params):
    """Stacked-layers view of a params tree: the per-layer dicts merge
    into ONE tree whose array leaves gain a leading L axis (all layers
    share a structure for dense configs; asserted by jax.tree.map).

    Motivation: an UNROLLED 32-layer decode step is ~4,700 HLO ops
    whose host-side dispatch keeps the chip largely idle behind the
    relay (~14 ms/step of inter-op gaps at 7B batch 1); the scanned
    form (decode_step_stacked) has 32x fewer unique ops and ~30x fewer
    parameter leaves.

    MEASURED VERDICT (round 3, v5e, 7B w4a8 batch 1, W=8): an honest
    NEGATIVE on this machine — 24.4 tok/s stacked vs 38.2 unrolled,
    tokens identical. lax.scan materializes each iteration's slice of
    the stacked weight arrays, so the weights stream TWICE per step
    (slice copy + kernel read, ~+5 ms) and the loop adds per-iteration
    runtime overhead that outweighs the dispatch-gap savings; compile
    time barely moved (22 vs 28 s first call). Kept, tested and exact,
    for systems where host dispatch dominates harder than weight
    bandwidth (multi-host controllers); the unrolled form stays the
    default everywhere."""
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *params["layers"])
    return out


def stack_kv_cache(cache):
    """Contiguous per-layer [(K, V), ...] -> stacked (K_L, V_L) with a
    leading L axis — decode_step_stacked's cache form."""
    return (jnp.stack([e[0] for e in cache]),
            jnp.stack([e[1] for e in cache]))


def decode_step_stacked(stacked, cfg: LlamaConfig, cache,
                        tokens: jnp.ndarray, pos: jnp.ndarray,
                        use_pallas: bool | None = None):
    """decode_step over a stacked-layers tree via ONE lax.scan.

    cache = (K, V) stacked (L, B, T, KVH, D) contiguous bf16 (see
    stack_kv_cache); logits and cache contents are identical to
    decode_step's (tested — same per-layer math, same kernels, just
    loop-rolled). The fast single-stream serving path: no paging, KV8,
    LoRA, or write_mask — those stay on decode_step."""
    b, s = tokens.shape
    x = stacked["embed"][tokens]
    positions = (pos[..., None] if jnp.ndim(pos) else pos) + jnp.arange(s)
    cos, sin = _rope_freqs(cfg, positions)
    kS, vS = cache

    def body(x, inputs):
        layer, kc, vc = inputs
        x, (kc, vc), _ = _block(layer, cfg, x, cos, sin,
                                kv=(kc, vc, pos),
                                use_pallas=use_pallas)
        return x, (kc, vc)

    x, (kS, vS) = jax.lax.scan(body, x, (stacked["layers"], kS, vS))
    x = rmsnorm(x, stacked["out_norm"], cfg.norm_eps)
    logits = apply_linear(stacked["lm_head"], x, use_pallas)
    return logits, (kS, vS)


# ------------------------------------------------------------- training

def token_nll(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean next-token negative log-likelihood: logits (B, S, V) vs
    targets (B, S). The one NLL definition every train step shares
    (loss_fn here, pipeline.make_pp_train_step over PP stages)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[..., None],
                                         axis=-1))


def loss_fn(params, cfg: LlamaConfig, tokens: jnp.ndarray,
            use_pallas: bool | None = False,
            remat: bool = False, flash_train: bool = False) -> jnp.ndarray:
    """Next-token cross entropy over (B, S) token batches. flash_train
    routes attention to the differentiable flash kernel (custom VJP) —
    the long-context training path. MoE configs add the GShard
    load-balance aux (cfg.moe_aux_weight) so routing trains against
    expert collapse, not just through the gate gradients."""
    logits, aux = forward(params, cfg, tokens[:, :-1], use_pallas,
                          remat=remat, flash_train=flash_train,
                          return_moe_aux=True)
    loss = token_nll(logits, tokens[:, 1:])
    if cfg.n_experts > 0:
        loss = loss + cfg.moe_aux_weight * aux
    return loss


@functools.partial(jax.jit, static_argnames=("cfg", "lr"))
def sgd_train_step(params, cfg: LlamaConfig, tokens, lr: float = 1e-2):
    """One SGD step (the dry-run trainer; optax wiring lives in
    parallel/training.py). Quantized linears are frozen by construction:
    autodiff only ever sees the float leaf subset (differentiating a
    tree with int leaves is a hard TypeError in JAX, not a no-op)."""
    from how_to_optimize_gemm_tpu.parallel.training import (
        sgd_update, split_trainable)

    all_leaves = jax.tree.leaves(params)
    floats, rebuild = split_trainable(params)

    def loss_of(floats):
        return loss_fn(rebuild(floats, all_leaves), cfg, tokens)

    loss, grads = jax.value_and_grad(loss_of)(floats)
    return rebuild(sgd_update(floats, grads, lr), all_leaves), loss
