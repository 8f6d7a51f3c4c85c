"""Flash attention (Pallas, TPU) — the long-context capability slot.

The reference never scales a *sequence* (SURVEY.md §5: it scales M=N=K),
but its capability pattern — a hand kernel that restructures a memory-
bound computation into a streaming one, validated against a trusted
implementation — maps directly onto attention for long-context prefill:
naive attention materializes the (S, T) score matrix per head
(O(S*T) HBM), flash attention streams K/V blocks through VMEM with an
online softmax and never materializes scores.

Vendor bar: ``jax.experimental.pallas.ops.tpu.flash_attention`` plays the
cuBLAS role for this kernel — the ladder's own kernel is measured against
it in the benchmark suite (same relationship as rung 06 vs 06v).

Layout contract: q (B, H, S, D); k, v (B, KVH, T, D); GQA folds the query
head h onto kv head h // (H // KVH) in the index maps, so the cache is
never expanded (the same no-materialization rule models/llama.py's
eager-attention path learned, measured at ~50x traffic there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.ops import bounds
from how_to_optimize_gemm_tpu.utils.env import default_interpret

NEG_INF = -1e30


def _stream_kernel(bq: int, bk: int, ts_len: int, scale: float,
                   causal: bool, t_real: int, s_real: int, nts: int):
    """Forward kernel: K/V streamed in SUPER-BLOCK strips of ``ts_len``
    tokens through a 4th grid dim, with the in-kernel fori walking bk
    sub-blocks inside each strip.

    Round 1 held full-T K/V strips in VMEM (index map constant in qi) —
    minimal traffic, but T was VMEM-bounded (~8k at d=128). A first
    round-2 attempt streamed bk-sized blocks directly through the grid
    and sank in grid-step overhead (4096 steps of 0.35 us compute at
    ~1.5 us/step = 10x slower). The super-block form keeps round 1's
    compute density (one grid step per ~4k tokens, dynamic fori with
    the causal early exit inside) while the online-softmax state
    (acc, m, l) persists in VMEM scratch across the sequential ts steps
    — nothing scales with T, so S=T=65536 prefill runs on one chip.

    Tail masking: t_real/s_real are the REAL lengths before padding;
    key positions >= t_real get NEG_INF so zero-padded K rows never
    leak into the softmax (zero-padded V rows then contribute p*0)."""
    off = t_real - s_real   # queries are the LAST s_real positions
    nsub = ts_len // bk

    def kernel(q_ref, k_ref, v_ref, o_ref, *scratch):
        # nts == 1 (the common serving/prefill case, T <= the strip
        # cap): NO scratch — the (o, m, l) carry must be rooted in
        # constants, because initializing the fori carry from VMEM
        # scratch reads makes Mosaic keep the whole accumulation in
        # VMEM instead of vregs (measured 1.65x slower at every S; the
        # round-2 bisection v1-v4). Multi-strip (long context) pays the
        # scratch carry to persist state across ts grid steps.
        qi = pl.program_id(2)
        tsi = pl.program_id(3)
        if nts > 1:
            acc, m_sc, l_sc = scratch

            @pl.when(tsi == 0)
            def _init():
                acc[:] = jnp.zeros_like(acc)
                m_sc[:] = jnp.full_like(m_sc, NEG_INF)
                l_sc[:] = jnp.zeros_like(l_sc)

        q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, D)
        d = q.shape[-1]
        q_pos = off + qi * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, 1), 0)
        base = tsi * ts_len

        def body(tt, carry):
            o, m, l = carry
            k_blk = k_ref[0, 0, pl.ds(tt * bk, bk)]          # (bk, D)
            v_blk = v_ref[0, 0, pl.ds(tt * bk, bk)]
            s = jax.lax.dot_general(
                q, k_blk.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (bq, bk)
            k_pos = base + tt * bk + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk), 1)
            mask = (k_pos <= q_pos) if causal else (k_pos >= 0)
            mask = jnp.logical_and(mask, k_pos < t_real)
            s = jnp.where(mask, s, NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)       # (bq, 1)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)                           # (bq, bk)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            o_new = o * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return o_new, m_new, l_new

        # dynamic sub-block range inside this strip: the causal early
        # exit (skip sub-blocks past this q block's last position) and
        # the real-T bound, both relative to the strip base.
        if causal:
            hi_global = jnp.minimum(off + qi * bq + bq - 1, t_real - 1)
        else:
            hi_global = t_real - 1
        hi = jnp.clip((hi_global - base) // bk + 1, 0, nsub)
        if nts > 1:
            carry = (acc[:], m_sc[:, :1], l_sc[:, :1])
        else:
            carry = (jnp.zeros((bq, d), jnp.float32),
                     jnp.full((bq, 1), NEG_INF, jnp.float32),
                     jnp.zeros((bq, 1), jnp.float32))
        o, m, l = jax.lax.fori_loop(0, hi, body, carry)
        if nts > 1:
            acc[:] = o
            m_sc[:] = jnp.broadcast_to(m, m_sc.shape)
            l_sc[:] = jnp.broadcast_to(l, l_sc.shape)

            @pl.when(tsi == nts - 1)
            def _flush():
                ll = jnp.maximum(l_sc[:, :1], 1e-30)
                o_ref[0, 0] = (acc[:] / ll).astype(o_ref.dtype)
        else:
            ll = jnp.maximum(l, 1e-30)
            o_ref[0, 0] = (o / ll).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("causal", "bq", "bk",
                                             "interpret", "scale"))
def flash_attention(q, k, v, *, causal: bool = True,
                    bq: int | None = None, bk: int | None = None,
                    scale: float | None = None,
                    interpret: bool | None = None):
    """Streaming causal attention. q: (B, H, S, D); k, v: (B, KVH, T, D);
    returns (B, H, S, D) in q's dtype. fp32 online-softmax state; scores
    never touch HBM. Any S and T (operands are zero-padded to block
    multiples and the tail is masked — the ladder's bounds.py discipline
    applied to attention); K/V streams block-by-block, so T is not
    VMEM-bounded (S=T=65536 runs on one chip). scale defaults to
    D**-0.5; the head-packed d=64 view passes the TRUE head dim's scale
    (its lane width is 2*D — see flash_attention_packed)."""
    b, h, s, d = q.shape
    _, kvh, t, _ = k.shape
    rep = h // kvh
    if bq is None or bk is None:
        # banked autotuning (harness/autotune_kernels) — trace-time
        # lookup; absent entries keep the measured 512x512 default
        from how_to_optimize_gemm_tpu.harness.autotune_kernels import (
            flash_key, knobs_for)
        tuned = knobs_for("flash", flash_key(s, t, h, kvh, d, causal))
        bq = bq or tuned.get("bq") or 512
        bk = bk or tuned.get("bk") or 512
    bq = min(bq, bounds.round_up(s, 128))
    bk = min(bk, bounds.round_up(t, 128))
    # K/V super-block strip: big enough to amortize grid steps (the
    # lesson of rung 03b applied to attention) and to keep the common
    # serving/prefill range on the scratchless single-strip path; two
    # buffered strips stay in fast VMEM (8192*128*2B*2kv*2buf = 8 MB).
    # Must be a bk MULTIPLE: the in-kernel walk covers nsub = ts/bk
    # sub-blocks, so a non-multiple would silently drop tail keys.
    ts_len = min((8192 // bk) * bk, bounds.round_up(t, bk))
    q = bounds.pad_dim(q, 2, bq)
    k = bounds.pad_dim(k, 2, ts_len)
    v = bounds.pad_dim(v, 2, ts_len)
    sp, tp = q.shape[2], k.shape[2]
    scale = d ** -0.5 if scale is None else scale
    nts = tp // ts_len
    grid = (b, h, sp // bq, nts)
    # Dead-strip clamp: a strip wholly past this q block's causal window
    # re-points at the LAST live strip, which Mosaic's revisit cache
    # then skips re-fetching (the early-exit analogue at strip level).
    if causal:
        off = t - s

        def kv_index(bi, hi, qi, tsi, rep=rep):
            # clamp to nts-1 too: PADDED query rows of the last q block
            # can push last_live past the final strip (e.g. s=4000,
            # t=4096 pads queries to 4096 with off=96)
            last_live = jnp.minimum((off + qi * bq + bq - 1) // ts_len,
                                    nts - 1)
            return (bi, hi // rep, jnp.minimum(tsi, last_live), 0)
    else:
        def kv_index(bi, hi, qi, tsi, rep=rep):
            return (bi, hi // rep, tsi, 0)
    out = pl.pallas_call(
        _stream_kernel(bq, bk, ts_len, scale, causal, t, s, nts),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda bi, hi, qi, tsi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts_len, d), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts_len, d), kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bi, hi, qi, tsi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype),
        scratch_shapes=([
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 8), jnp.float32),
            pltpu.VMEM((bq, 8), jnp.float32),
        ] if nts > 1 else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * b * h * s * t * d) // (2 if causal else 1),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * h * s * t,
        ),
        interpret=default_interpret(interpret),
    )(q, k, v)
    return out[:, :, :s]


def flash_attention_packed(q, k, v, *, causal: bool = True,
                           bq: int = 512, bk: int = 512,
                           interpret: bool | None = None):
    """d=64 head-packed flash attention: two adjacent KV heads ride one
    128-lane row so the score contraction runs at the MXU's native
    depth.

    The d=64 question (round-2 gap #2): the QK^T contraction is over D,
    so a d=64 model feeds the MXU half its depth. Packing pairs of KV
    heads into 128 lanes (k/v: a lane-concat of adjacent heads; q: each
    head zero-extended into its pair band, so the zero band annihilates
    the cross-head terms — the same algebra as the decode kernel's
    _pair_heads view, ops/pallas_decode_attention.py) restores full
    contraction depth at exactly 2x the MACs. Useful throughput wins
    iff the MXU's depth-64 rate is BELOW HALF its depth-128 rate
    (probes.mxu_depth_gflops measures exactly this) — otherwise the
    zero MACs cost what the idle depth did and this view is neutral.

    MEASURED VERDICT (round 3, v5e): an honest NEGATIVE, kept like
    rungs 03b/12/13. The depth probe reads 74.8 TF at depth 64 vs
    147.5 at depth 128 — EXACTLY half (50.8%), so the MXU already pads
    short contractions to native depth and the packing is provably
    neutral in pure dot terms; the view's own overheads (band
    construction, double-width K/V strips, 2x PV MACs) then make it a
    straight loss in the chained A/B (B=8 H=32 KVH=4 d=64, causal:
    27.1 vs 37.8 useful TF at S=2048, 38.1 vs 47.7 at S=4096, 47.2 vs
    54.1 at S=8192; outputs bit-identical). The probe docstring's
    prediction stands: the only true depth lever is head geometry
    (d=128 models). mha_flash therefore never auto-routes here.

    Implementation is a pure VIEW over the unmodified streaming kernel:
    with KVH even, q (B, H, S, 64) -> (B, H, S, 128) banded, k/v
    (B, KVH, T, 64) -> (B, KVH/2, T, 128), and GQA's own head->group
    fold handles the pair mapping (rep doubles). The PV matmul's output
    also fills all 128 lanes ([P@V_g1 | P@V_g2]); each head keeps its
    own band. scale stays 64**-0.5 (the TRUE head dim)."""
    b, h, s, d = q.shape
    _, kvh, t, _ = k.shape
    assert kvh % 2 == 0, "head packing pairs adjacent kv heads"
    rep = h // kvh
    band = ((jnp.arange(h) // rep) % 2)[None, :, None, None]   # 0 | 1
    z = jnp.zeros_like(q)
    q2 = jnp.concatenate([jnp.where(band == 0, q, z),
                          jnp.where(band == 0, z, q)], axis=-1)
    # lane-concat of adjacent kv heads: contiguous in the (…, KVH, T, D)
    # layout only via the (…, T, KVH, D) model layout — callers reshape
    # there (mha_flash); here it is an explicit concat
    k2 = jnp.concatenate([k[:, 0::2], k[:, 1::2]], axis=-1)
    v2 = jnp.concatenate([v[:, 0::2], v[:, 1::2]], axis=-1)
    out = flash_attention(q2, k2, v2, causal=causal, bq=bq, bk=bk,
                          scale=d ** -0.5, interpret=interpret)
    return jnp.where(band == 0, out[..., :d], out[..., d:])


def mha_flash(q, k, v, *, causal: bool = True,
              pack_heads: bool | None = None,
              interpret: bool | None = None):
    """Model-layout wrapper: q (B, S, H, D), k/v (B, T, KVH, D) ->
    (B, S, H*D), matching models/llama._attention's contract.

    pack_heads routes d=64 even-kvh models through the head-packed
    view (flash_attention_packed). None = auto: MEASURED OFF — the
    round-3 chained A/B lost at every S (the MXU's depth-64 rate is
    exactly half its depth-128 rate, so the 2x-MAC packing is neutral
    before its own overheads; see flash_attention_packed)."""
    b, s, h, d = q.shape
    packable = d == 64 and k.shape[2] % 2 == 0
    if pack_heads is None:
        pack_heads = False      # measured: packing loses at every S
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    fn = (flash_attention_packed if pack_heads and packable
          else flash_attention)
    out = fn(qt.astype(kt.dtype), kt, vt, causal=causal,
             interpret=interpret)
    return jnp.swapaxes(out, 1, 2).reshape(b, s, h * d).astype(jnp.float32)


# ---------------------------------------------------------- training VJP

def _fwd_kernel_lse(bq: int, bk: int, ts_len: int, scale: float,
                    causal: bool, t_total: int, nts: int,
                    t_real: int | None = None):
    """Forward kernel that also emits the logsumexp rows the backward
    pass recomputes attention against. Self-attention only (S == T);
    the VJP wrapper asserts it. K/V super-block streaming + the
    scratchless single-strip path, exactly like ``_stream_kernel``
    (round 2) — trainable S no longer VMEM-bounded by this pass.

    t_real < t_total means the operands were zero-padded to block
    multiples (odd-S training, round 2): key positions >= t_real are
    masked to NEG_INF so padded zero-keys never enter the softmax.
    Padded QUERY rows need no kernel handling — padding happens
    outside the custom VJP, so autodiff delivers do == 0 for them and
    their gradient contributions vanish (see mha_flash_train)."""
    nsub = ts_len // bk
    t_real = t_total if t_real is None else t_real
    pad_keys = t_real < t_total

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch):
        qi = pl.program_id(2)
        tsi = pl.program_id(3)
        if nts > 1:
            acc, m_sc, l_sc = scratch

            @pl.when(tsi == 0)
            def _init():
                acc[:] = jnp.zeros_like(acc)
                m_sc[:] = jnp.full_like(m_sc, NEG_INF)
                l_sc[:] = jnp.zeros_like(l_sc)

        q = q_ref[0, 0].astype(jnp.float32) * scale
        d = q.shape[-1]
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        base = tsi * ts_len

        def body(tt, carry):
            o, m, l = carry
            k_blk = k_ref[0, 0, pl.ds(tt * bk, bk)]
            v_blk = v_ref[0, 0, pl.ds(tt * bk, bk)]
            s = jax.lax.dot_general(
                q, k_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if causal or pad_keys:
                k_pos = base + tt * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (1, bk), 1)
                mask = (k_pos <= q_pos) if causal else (k_pos >= 0)
                if pad_keys:
                    mask = jnp.logical_and(mask, k_pos < t_real)
                s = jnp.where(mask, s, NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            o_new = o * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return o_new, m_new, l_new

        if causal:
            hi_global = qi * bq + bq - 1
        else:
            hi_global = t_real - 1
        hi = jnp.clip((hi_global - base) // bk + 1, 0, nsub)
        if nts > 1:
            carry = (acc[:], m_sc[:, :1], l_sc[:, :1])
        else:
            carry = (jnp.zeros((bq, d), jnp.float32),
                     jnp.full((bq, 1), NEG_INF, jnp.float32),
                     jnp.zeros((bq, 1), jnp.float32))
        o, m, l = jax.lax.fori_loop(0, hi, body, carry)

        def flush(o, m, l):
            l = jnp.maximum(l, 1e-30)
            o_ref[0, 0] = (o / l).astype(o_ref.dtype)
            # lse stored with an 8-lane replicated trailing dim: a bare
            # (bq,) row can't satisfy Mosaic's (8, 128)-or-full tiling
            lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))

        if nts > 1:
            acc[:] = o
            m_sc[:] = jnp.broadcast_to(m, m_sc.shape)
            l_sc[:] = jnp.broadcast_to(l, l_sc.shape)

            @pl.when(tsi == nts - 1)
            def _flush():
                flush(acc[:], m_sc[:, :1], l_sc[:, :1])
        else:
            flush(o, m, l)

    return kernel


def _bwd_dq_kernel(bq: int, bk: int, ts_len: int, scale: float,
                   causal: bool, t_total: int, nts: int,
                   t_real: int | None = None):
    """dq pass with super-block-streamed K/V (round 2): dq accumulates
    in VMEM scratch across the sequential tsi steps, so this pass no
    longer bounds trainable S by VMEM (it used to hold full-T K/V
    strips). Single-strip path stays scratchless (the Mosaic
    scratch-carry penalty — see _stream_kernel).

    t_real masks padded key columns (odd-S training): without it a
    padded zero-key scores s = 0, giving p = exp(-lse) != 0 and a
    spurious dq contribution for every REAL query row in the
    non-causal case."""
    nsub = ts_len // bk
    t_real = t_total if t_real is None else t_real
    pad_keys = t_real < t_total

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *scratch):
        qi = pl.program_id(2)
        tsi = pl.program_id(3)
        if nts > 1:
            dq_acc, = scratch

            @pl.when(tsi == 0)
            def _init():
                dq_acc[:] = jnp.zeros_like(dq_acc)

        q = q_ref[0, 0].astype(jnp.float32) * scale
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]
        d = q.shape[-1]
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        base = tsi * ts_len

        def body(tt, dq):
            k_blk = k_ref[0, 0, pl.ds(tt * bk, bk)].astype(jnp.float32)
            v_blk = v_ref[0, 0, pl.ds(tt * bk, bk)].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if causal or pad_keys:
                k_pos = base + tt * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (1, bk), 1)
                mask = (k_pos <= q_pos) if causal else (k_pos >= 0)
                if pad_keys:
                    mask = jnp.logical_and(mask, k_pos < t_real)
                s = jnp.where(mask, s, NEG_INF)
            p = jnp.exp(s - lse)                         # (bq, bk)
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            return dq + jax.lax.dot_general(
                ds, k_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if causal:
            hi_global = qi * bq + bq - 1
        else:
            hi_global = t_real - 1
        hi = jnp.clip((hi_global - base) // bk + 1, 0, nsub)
        dq0 = dq_acc[:] if nts > 1 else jnp.zeros((bq, d), jnp.float32)
        dq = jax.lax.fori_loop(0, hi, body, dq0)
        if nts > 1:
            dq_acc[:] = dq

            @pl.when(tsi == nts - 1)
            def _flush():
                dq_ref[0, 0] = (dq_acc[:] * scale).astype(dq_ref.dtype)
        else:
            dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)

    return kernel


def _bwd_dkv_kernel(bq: int, bk: int, rep: int, scale: float,
                    causal: bool, s_total: int,
                    t_real: int | None = None):
    nq = s_total // bq
    t_real = s_total if t_real is None else t_real
    pad_keys = t_real < s_total

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dk_ref, dv_ref, dk_acc, dv_acc):
        ki = pl.program_id(2)
        qi = pl.program_id(3)
        k_blk = k_ref[0, 0].astype(jnp.float32)      # (bk, d)
        v_blk = v_ref[0, 0].astype(jnp.float32)
        k_pos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)

        @pl.when(qi == 0)
        def _init():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

        # causal: q blocks strictly before this kv block contribute
        # nothing (their rows never attend here) — skip the compute
        # (their blocks still stream; grid cells can't be skipped).
        live = (qi * bq + bq > ki * bk) if causal else True

        @pl.when(live if causal else qi >= 0)
        def _accumulate():
            dk = dk_acc[:]
            dv = dv_acc[:]
            for r in range(rep):
                q = q_ref[0, 0, r].astype(jnp.float32) * scale  # (bq, d)
                do = do_ref[0, 0, r].astype(jnp.float32)
                lse = lse_ref[r][:, :1]
                delta = delta_ref[r][:, :1]
                s_ = jax.lax.dot_general(
                    q, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (bq, bk)
                if causal or pad_keys:
                    q_pos = qi * bq + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, 1), 0)
                    mask = (k_pos <= q_pos) if causal else (k_pos >= 0)
                    if pad_keys:
                        # padded key columns: p would be exp(-lse) != 0
                        # (zero-key score is 0, not -inf) — masked so
                        # padded dk/dv rows stay exactly zero
                        mask = jnp.logical_and(mask, k_pos < t_real)
                    s_ = jnp.where(mask, s_, NEG_INF)
                pmat = jnp.exp(s_ - lse)
                dv = dv + jax.lax.dot_general(
                    pmat, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (bk, d)
                dp = jax.lax.dot_general(
                    do, v_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (bq, bk)
                ds = pmat * (dp - delta)
                dk = dk + jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (bk, d)
            dk_acc[:] = dk
            dv_acc[:] = dv

        @pl.when(qi == nq - 1)
        def _flush():
            dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)

    return kernel


def _flash_fwd_lse(q, k, v, causal, bq, bk, interpret, t_real=None):
    b, h, s, d = q.shape
    _, kvh, t, _ = k.shape
    rep = h // kvh
    scale = d ** -0.5
    assert t % bk == 0 and s % bq == 0, (s, t, bq, bk)
    # largest bk-MULTIPLE <= 8192 that divides t (t % bk == 0 is
    # asserted, so ts_len = bk always qualifies as the floor)
    ts_len = next(ts for ts in range((8192 // bk) * bk, 0, -bk)
                  if t % ts == 0)
    nts = t // ts_len
    if causal:
        def kv_index(bi, hi, qi, tsi, rep=rep):
            last_live = jnp.minimum((qi * bq + bq - 1) // ts_len,
                                    nts - 1)
            return (bi, hi // rep, jnp.minimum(tsi, last_live), 0)
    else:
        def kv_index(bi, hi, qi, tsi, rep=rep):
            return (bi, hi // rep, tsi, 0)
    out, lse = pl.pallas_call(
        _fwd_kernel_lse(bq, bk, ts_len, scale, causal, t, nts, t_real),
        grid=(b, h, s // bq, nts),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda bi, hi, qi, tsi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts_len, d), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts_len, d), kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda bi, hi, qi, tsi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 8),
                         lambda bi, hi, qi, tsi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, 8), jnp.float32),
        ],
        scratch_shapes=([
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 8), jnp.float32),
            pltpu.VMEM((bq, 8), jnp.float32),
        ] if nts > 1 else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(q, k, v)
    return out, lse


def _flash_bwd(q, k, v, o, lse, do, causal, bq, bk, interpret,
               t_real=None):
    b, h, s, d = q.shape
    _, kvh, t, _ = k.shape
    rep = h // kvh
    scale = d ** -0.5
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                                  # (b, h, s)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))

    # largest bk-MULTIPLE <= 8192 that divides t (t % bk == 0 is
    # asserted, so ts_len = bk always qualifies as the floor)
    ts_len = next(ts for ts in range((8192 // bk) * bk, 0, -bk)
                  if t % ts == 0)
    nts = t // ts_len
    if causal:
        def kv_index(bi, hi, qi, tsi, rep=rep):
            last_live = jnp.minimum((qi * bq + bq - 1) // ts_len,
                                    nts - 1)
            return (bi, hi // rep, jnp.minimum(tsi, last_live), 0)
    else:
        def kv_index(bi, hi, qi, tsi, rep=rep):
            return (bi, hi // rep, tsi, 0)

    def q_index(bi, hi, qi, tsi):
        return (bi, hi, qi, 0)

    dq = pl.pallas_call(
        _bwd_dq_kernel(bq, bk, ts_len, scale, causal, t, nts, t_real),
        grid=(b, h, s // bq, nts),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts_len, d), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ts_len, d), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), q_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 8), q_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 8), q_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), q_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.float32),
        scratch_shapes=([pltpu.VMEM((bq, d), jnp.float32)]
                        if nts > 1 else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(q, k, v, do, lse, delta)

    # group-major views for the dk/dv pass: (b, kvh, rep, s, ...) — pure
    # reshapes of the contiguous (b, h, ...) layout (h = g*rep + r).
    q5 = q.reshape(b, kvh, rep, s, d).astype(jnp.bfloat16)
    do5 = do.reshape(b, kvh, rep, s, d).astype(jnp.bfloat16)
    lse5 = lse.reshape(b, kvh, rep, s, 8)
    delta5 = delta.reshape(b, kvh, rep, s, 8)

    # 4D grid, qi innermost: dk/dv OUT blocks are revisited across qi and
    # accumulated in VMEM scratch — no full-S strips, so trainable S is
    # unbounded (the previous design held (rep, S, d) q/do strips in VMEM
    # and capped S at ~4k).
    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel(bq, bk, rep, scale, causal, s, t_real),
        grid=(b, kvh, t // bk, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, rep, bq, d),
                         lambda bi, gi, ki, qi: (bi, gi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d),
                         lambda bi, gi, ki, qi: (bi, gi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d),
                         lambda bi, gi, ki, qi: (bi, gi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, bq, d),
                         lambda bi, gi, ki, qi: (bi, gi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, rep, bq, 8),
                         lambda bi, gi, ki, qi: (bi, gi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, rep, bq, 8),
                         lambda bi, gi, ki, qi: (bi, gi, 0, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, d),
                         lambda bi, gi, ki, qi: (bi, gi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d),
                         lambda bi, gi, ki, qi: (bi, gi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, kvh, t, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(q5, k, v, do5, lse5, delta5)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention_train(q, k, v, causal: bool = True, bq: int = 512,
                          bk: int = 512, interpret: bool | None = None,
                          t_real: int | None = None):
    """Differentiable flash attention (training path).

    Same contract as ``flash_attention`` plus a custom VJP: the backward
    pass recomputes per-block attention against the saved logsumexp rows
    (the standard flash backward) in two Pallas kernels — a dq pass
    gridded like the forward and a dk/dv pass on a (b, g, ki, qi) grid
    whose dk/dv output blocks are revisited across qi and accumulated in
    VMEM scratch: blocks stream, nothing scales with S, trainable
    sequence length is unbounded.

    Shapes must be block multiples; t_real < S declares the tail as
    zero padding (key positions >= t_real are masked in all three
    kernels). Callers with odd S should pad OUTSIDE this function so
    autodiff zero-pads the incoming cotangent — mha_flash_train does
    exactly that (round 2: odd-S training no longer falls back to
    eager autodiff)."""
    bq = min(bq, q.shape[2])
    bk = min(bk, k.shape[2])
    out, _ = _flash_fwd_lse(q, k, v, causal, bq, bk, interpret, t_real)
    return out


def _train_fwd(q, k, v, causal, bq, bk, interpret, t_real=None):
    assert q.shape[2] == k.shape[2], \
        "flash_attention_train is self-attention only (S == T)"
    bq = min(bq, q.shape[2])
    bk = min(bk, k.shape[2])
    out, lse = _flash_fwd_lse(q, k, v, causal, bq, bk, interpret, t_real)
    return out, (q, k, v, out, lse)


def _train_bwd(causal, bq, bk, interpret, t_real, res, do):
    q, k, v, out, lse = res
    bq = min(bq, q.shape[2])
    bk = min(bk, k.shape[2])
    dq, dk, dv = _flash_bwd(q, k, v, out, lse, do, causal, bq, bk,
                            interpret, t_real)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_train.defvjp(_train_fwd, _train_bwd)


def mha_flash_train(q, k, v, *, causal: bool = True,
                    interpret: bool | None = None):
    """Differentiable model-layout wrapper (see mha_flash).

    Any S (round 2): odd lengths are zero-padded to a block multiple
    HERE, outside the custom VJP — jnp.pad's own VJP then delivers
    do == 0 for padded query rows (their gradient contributions vanish
    identically) and the slice below crops dq back. t_real masks the
    padded key columns inside the kernels."""
    b, s, h, d = q.shape
    # least-waste block choice (the ladder's chooser discipline): a
    # naive 512 cap pads e.g. s=640 to 1024 — 2.56x score FLOPs; ties
    # break toward the larger block (fewer grid steps)
    blk = min((512, 256, 128),
              key=lambda bb: (bounds.round_up(s, bb), -bb))
    sp = bounds.round_up(s, blk)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
    vt = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)
    if sp != s:
        qt = bounds.pad_dim(qt, 2, blk)
        kt = bounds.pad_dim(kt, 2, blk)
        vt = bounds.pad_dim(vt, 2, blk)
        out = flash_attention_train(qt, kt, vt, causal, blk, blk,
                                    interpret, s)[:, :, :s]
    else:
        # s may be an exact blk multiple without being a 512 multiple
        # (e.g. s=640, blk=128) — the chosen block must flow through
        out = flash_attention_train(qt, kt, vt, causal, blk, blk,
                                    interpret)
    return jnp.swapaxes(out, 1, 2).reshape(b, s, h * d).astype(jnp.float32)
