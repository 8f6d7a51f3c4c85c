"""Length-aware decode attention (Pallas, scalar prefetch).

The serving counterpart of flash attention: at decode, each slot of the
continuous batcher sits at a different position, but the eager path reads
the FULL (B, max_seq) KV cache every step — a slot 100 tokens into a
2048-slot cache pays 20x its real traffic. This kernel takes the per-slot
lengths as a SCALAR-PREFETCH argument (``pltpu.PrefetchScalarGridSpec`` —
the TPU analogue of the reference's ``prfm pldl1keep`` prefetch rungs,
``aarch64/MMult_4x4_18.cpp:227-228``, as mapped in SURVEY.md §7), keeps
the caches in HBM (``ANY``), and manually DMA-ping-pongs only
``ceil(len/bk)`` chunks per slot: HBM traffic scales with the tokens that
exist, not with max_seq.

Grid design (v4, round 2): ONE program serves every batch slot with
fused-head (bk, KVH*D) chunks — see ``_kernel_v4``. The design record
(each ancestor measured and replaced): v1's (B, KVH) grid with per-head
DMAs lost to eager outright (~14 us of launch+DMA overhead x 32 tiny
programs per layer); v2's head-major cache layout made XLA's scatter
(which physically prefers time-major — verified in HLO) disagree with
the custom call's layout constraint, inserting a full-cache copy per
layer per step; v3 (one program per slot, per-head dot loop, dynamic
fori chunk walk) served round 1 but crawled at 25-83 GB/s of cache
read — ~20 us fixed cost per program plus ~20 us per chunk of tiny-op
issue overhead. v4 reads the same cache at 113-279 GB/s (3.4-4.5x).

Numerically identical contract to the eager masked path: online softmax
in fp32, entries at positions >= len masked to -inf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.utils.env import default_interpret

NEG_INF = -1e30


def _divisor_block(t: int, cap: int) -> int:
    """Largest 128-multiple <= cap that divides t (the chunk walk needs
    t % bk == 0; a raw VMEM cap like 384 need not divide e.g. 2048)."""
    for bk in range(cap // 128 * 128, 0, -128):
        if t % bk == 0:
            return bk
    return t


def _pair_heads(qg, d):
    """Head-pairing for wide dh=64 models (round 2): the cache's two
    adjacent 64-lane heads live in one 128-lane row (a FREE contiguous
    reshape); each query row is zero-extended into its half-lane band,
    so the per-pair dot computes both heads' scores exactly (the zero
    band annihilates the cross terms — the _kernel_v4 block-structure
    trick at pair granularity). qg (b, kvh, rep, d) ->
    (b, kvh//2, 2*rep, 2*d); rows [0, rep) are head 2p (band 0),
    rows [rep, 2*rep) head 2p+1 (band d..2d)."""
    b, kvh, rep, _ = qg.shape
    q2 = qg.reshape(b, kvh // 2, 2, rep, d)
    z = jnp.zeros_like(q2[:, :, 0])
    top = jnp.concatenate([q2[:, :, 0], z], axis=-1)
    bot = jnp.concatenate([z, q2[:, :, 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=2)


def _unpair_bands(out, rep, d):
    """Inverse of _pair_heads on the kernel's PV output: keep each
    row-group's own lane band ((b, kvh2, 2*rep, 2*d) ->
    (b, kvh2 * 2 * rep * d) in original head order)."""
    b, kvh2, rep2, _ = out.shape
    o = out.reshape(b, kvh2, 2, rep, 2 * d)
    res = jnp.stack([o[:, :, 0, :, :d], o[:, :, 1, :, d:]], axis=2)
    return res.reshape(b, kvh2 * 2 * rep * d)


def _decode_attention_v3(qg, k_cache, v_cache, lengths, *, scale, bk,
                         interpret):
    """v3 wrapper (wide-MHA path, d == 128): one program per slot,
    per-head dots, dynamic fori chunk walk. qg is GROUPED
    (b, kvh, rep, d) — the caller reshapes (and band-extracts, for the
    dh=64 paired view, whose TRUE head dim sets scale, not the paired
    lane width); returns (b, kvh, rep, d)."""
    b, kvh, rep, d = qg.shape
    t = k_cache.shape[1]
    elt = jnp.dtype(k_cache.dtype).itemsize
    budget = 6 * 1024 * 1024
    bk_cap = max(budget // (4 * kvh * d * elt) // 128 * 128, 128)
    bk = _divisor_block(t, min(bk, bk_cap, t))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, rep, d), lambda bi, lens: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, rep, d),
                               lambda bi, lens: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk, kvh, d), k_cache.dtype),
            pltpu.VMEM((2, bk, kvh, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _kernel_v3(bk, kvh, rep, d, t, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), qg, k_cache, v_cache)


def _kernel_v3(bk: int, kvh: int, rep: int, d: int, t_total: int,
               scale: float):
    """Wide-MHA kernel (kvh*d > 1024, d == 128): one program per slot,
    per-head dots, dynamic fori chunk walk. Kept because those models
    decode weight-stream-bound — v4's fused width would be 97% zeros
    there and explode compile time."""
    nk_max = t_total // bk

    def kernel(len_ref, q_ref, k_hbm, v_hbm, o_ref, bufk, bufv, sems):
        b = pl.program_id(0)
        length = len_ref[b]
        nk = jnp.minimum((length + bk - 1) // bk, nk_max)

        def dma_k(slot, t):
            # clamp: guarded (pl.when) starts still TRACE the slice, so
            # an unclamped t*bk would be out of bounds at trace time.
            start = jnp.minimum(t, nk_max - 1) * bk
            return pltpu.make_async_copy(
                k_hbm.at[b, pl.ds(start, bk)], bufk.at[slot],
                sems.at[slot, 0])

        def dma_v(slot, t):
            start = jnp.minimum(t, nk_max - 1) * bk
            return pltpu.make_async_copy(
                v_hbm.at[b, pl.ds(start, bk)], bufv.at[slot],
                sems.at[slot, 1])

        dma_k(0, 0).start()
        dma_v(0, 0).start()

        if nk_max > 1:
            @pl.when(nk > 1)
            def _():
                dma_k(1, 1).start()
                dma_v(1, 1).start()

        q = q_ref[0].astype(jnp.float32) * scale     # (kvh, rep, d)

        def body(t, carry):
            o, m, l = carry
            slot = jax.lax.rem(t, 2)

            dma_k(slot, t).wait()
            dma_v(slot, t).wait()
            # Per-head static loop: Mosaic rejects batched matmuls whose
            # rhs batch dim isn't leading, so slice each head out of the
            # time-major chunk (kvh is small and static).
            k_heads = [bufk[slot, :, g].astype(jnp.float32)
                       for g in range(kvh)]          # each (bk, d)
            v_heads = [bufv[slot, :, g] for g in range(kvh)]
            s = jnp.stack([
                jax.lax.dot_general(q[g], k_heads[g],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for g in range(kvh)], axis=0)        # (kvh, rep, bk)
            k_pos = t * bk + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, bk), 2)
            s = jnp.where(k_pos < length, s, NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            o_new = o * alpha + jnp.stack([
                jax.lax.dot_general(p[g].astype(v_heads[g].dtype),
                                    v_heads[g],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for g in range(kvh)], axis=0)        # (kvh, rep, d)

            # Refill this slot only AFTER its chunk was consumed.
            @pl.when(t + 2 < nk)
            def _():
                dma_k(slot, t + 2).start()
                dma_v(slot, t + 2).start()
            return o_new, m_new, l_new

        o0 = jnp.zeros((kvh, rep, d), jnp.float32)
        m0 = jnp.full((kvh, rep, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((kvh, rep, 1), jnp.float32)
        o, m, l = jax.lax.fori_loop(0, nk, body, (o0, m0, l0))
        # The slot writes its token before attending, so length >= 1 and
        # l > 0 always; the max() only guards padded batch rows.
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


def _kernel_v4(bk: int, kvh: int, rep: int, d: int, t_total: int,
               b_total: int, scale: float):
    """v4 (round 2): ONE program serves ALL batch slots with FUSED-HEAD
    chunks.

    The v3 design (one program per slot, per-head dot loop) measured
    ~20 us of fixed cost per program PLUS ~20 us per chunk — launch,
    DMA prologue stalls, and ~30 tiny VPU/MXU ops per chunk on
    (kvh, rep, bk) slivers; a full-cache read at d2048/T=2048 crawled
    at 25-83 GB/s and LOST to eager XLA (1195 vs 2393 tok/s on the
    dh=64 config). Three structural fixes, each killing one overhead:

    1. Cache chunks are consumed as 2D (bk, kvh*d) views — one DMA per
       chunk per cache, no per-head slicing (full-lane rule satisfied
       for ANY d with kvh*d % 128 == 0, so dh=64 needs no special
       pairing path).
    2. All heads' scores come from ONE dot: Q is assembled
       block-structured — row g*rep+r holds slot query (g, r) zero-
       extended into lane band [g*d, (g+1)*d) — so contraction over
       the full kvh*d lanes yields exactly head g's score per row
       (zeros annihilate other heads). The PV product likewise is one
       (h, bk) @ (bk, kvh*d) dot; each row-group's own band is sliced
       from the small (h, kvh*d) result afterwards.
    3. The slot loop is INSIDE the kernel (grid=(1,)): one launch, one
       prologue, and the chunk DMA pipeline crosses slot boundaries —
       the next slot's first chunk prefetches while the current slot
       computes. Chunk walks are fully static-unrolled (fori back-
       edges cost ~9 us) with per-chunk predication on the prefetched
       lengths; dead chunks issue no DMAs and skip their compute via
       lax.cond (an unconditional where()-ed body still paid ~5 us of
       op issue per dead chunk).
    """
    nk_max = t_total // bk
    w = kvh * d
    h = kvh * rep

    def kernel(len_ref, q_ref, k_hbm, v_hbm, o_ref, bufk, bufv, sems):
        # flattened static chunk schedule: (slot b, chunk t)
        sched = [(b, t) for b in range(b_total) for t in range(nk_max)]

        def nk_of(b):
            return jnp.minimum((len_ref[b] + bk - 1) // bk, nk_max)

        def pred(i):
            b, t = sched[i]
            return t < nk_of(b)

        def dma_k(slot, i):
            b, t = sched[i]
            start = jnp.minimum(t, nk_max - 1) * bk
            return pltpu.make_async_copy(
                k_hbm.at[b, pl.ds(start, bk)], bufk.at[slot],
                sems.at[slot, 0])

        def dma_v(slot, i):
            b, t = sched[i]
            start = jnp.minimum(t, nk_max - 1) * bk
            return pltpu.make_async_copy(
                v_hbm.at[b, pl.ds(start, bk)], bufv.at[slot],
                sems.at[slot, 1])

        def start_pair(i):
            @pl.when(pred(i))
            def _():
                dma_k(i % 2, i).start()
                dma_v(i % 2, i).start()

        start_pair(0)
        if len(sched) > 1:
            start_pair(1)

        nsched = len(sched)
        for b in range(b_total):
            # block-structured zero-extended Q for this slot:
            # (h, w) with head g's (rep, d) in rows g*rep.., lanes g*d..
            q = q_ref[b].astype(jnp.float32) * scale   # (kvh, rep, d)
            q_ext = jnp.concatenate(
                [jnp.pad(q[g], ((0, 0), (g * d, w - (g + 1) * d)))
                 for g in range(kvh)], axis=0)          # (h, w)
            length = len_ref[b]
            nk = nk_of(b)
            # o accumulates the FULL (h, w) PV product: slicing each
            # row-group's band in-kernel trips Mosaic ("offset mismatch
            # on non-concat dimension"); the wrapper takes the diagonal
            # bands afterwards in XLA-land (a 256 KB op)
            o = jnp.zeros((h, w), jnp.float32)
            m = jnp.full((h, 1), NEG_INF, jnp.float32)
            l = jnp.zeros((h, 1), jnp.float32)
            for t in range(nk_max):
                i = b * nk_max + t
                slot = i % 2

                @pl.when(pred(i))
                def _wait():
                    dma_k(slot, i).wait()
                    dma_v(slot, i).wait()

                def live_body(carry):
                    # the whole update under lax.cond: a dead chunk's
                    # where()-ed-out compute still costs ~5 us of op
                    # issue, and at decode lengths << max_seq MOST
                    # static chunks are dead (measured: the
                    # unconditional version lost ~30% of tokens/s)
                    o, m, l = carry
                    k_blk = bufk[slot].astype(jnp.float32)  # (bk, w)
                    s = jax.lax.dot_general(
                        q_ext, k_blk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, bk)
                    k_pos = t * bk + jax.lax.broadcasted_iota(
                        jnp.int32, (1, bk), 1)
                    s = jnp.where(k_pos < length, s, NEG_INF)
                    m_blk = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m, m_blk)
                    alpha = jnp.exp(m - m_new)
                    p = jnp.exp(s - m_new)
                    l_new = l * alpha + jnp.sum(p, axis=-1,
                                                keepdims=True)
                    pv = jax.lax.dot_general(
                        p.astype(bufv.dtype), bufv[slot],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, w)
                    return o * alpha + pv, m_new, l_new

                o, m, l = jax.lax.cond(t < nk, live_body,
                                       lambda c: c, (o, m, l))
                if i + 2 < nsched:
                    start_pair(i + 2)
            o_ref[b] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def decode_attention(q, k_cache, v_cache, lengths, *,
                     bk: int | None = None,
                     interpret: bool | None = None):
    """q: (B, H, D) one query per slot; k/v_cache: (B, T, KVH, D)
    time-major; lengths: (B,) int32 — valid cache entries per slot (the
    current token's K/V must already be written). Returns (B, H*D)
    fp32. bk None = banked autotuning (harness/autotune_kernels) or
    the measured 512 default."""
    b, h, d = q.shape
    _, t, kvh, _ = k_cache.shape
    if bk is None:
        from how_to_optimize_gemm_tpu.harness.autotune_kernels import (
            decode_key, knobs_for)
        bk = knobs_for("decode", decode_key(t, kvh, d)).get("bk") or 512
    rep = h // kvh
    w = kvh * d
    assert w % 128 == 0, \
        f"decode_attention needs kvh*dh % 128 == 0, got {kvh}x{d}" \
        " (llama routing falls back to eager otherwise)"
    if w > 1024:
        # wide-MHA models (e.g. Llama-2-7B, kvh=32 d=128): the fused-
        # head kernel's (bk, w) chunks and block-diagonal Q explode in
        # width (97% zeros at kvh=32) and compile time; the per-slot
        # per-head v3 kernel serves these — their decode is weight-
        # stream-bound, so v3's per-chunk overhead is immaterial.
        if d == 64:
            # wide dh=64 MHA (e.g. OPT-1.3B class, 32 heads x 64):
            # head-pairing view — the last eager fallback removed
            # (round 2). scale uses the TRUE head dim (64).
            assert kvh % 2 == 0, (kvh, d)
            k2 = k_cache.reshape(b, t, kvh // 2, 128)
            v2 = v_cache.reshape(b, t, kvh // 2, 128)
            q_ext = _pair_heads(q.reshape(b, kvh, rep, d), d)
            out = _decode_attention_v3(q_ext, k2, v2, lengths,
                                       scale=d ** -0.5, bk=bk,
                                       interpret=interpret)
            return _unpair_bands(out, rep, d)
        assert d == 128, (kvh, d)
        out = _decode_attention_v3(q.reshape(b, kvh, rep, d), k_cache,
                                   v_cache, lengths, scale=d ** -0.5,
                                   bk=bk, interpret=interpret)
        return out.reshape(b, h * d)
    # fused-head 2D cache view (free contiguous reshape; see _kernel_v4)
    k2 = k_cache.reshape(b, t, w)
    v2 = v_cache.reshape(b, t, w)
    # VMEM clamp: 2 ping-pong slots x (k, v) chunks of (bk, w) must
    # stay well inside the fast-VMEM window (MHA models like Llama-2-7B
    # have kvh=32 — a naive bk=512 would allocate 16 MB of chunk buffers)
    elt = jnp.dtype(k_cache.dtype).itemsize
    budget = 6 * 1024 * 1024
    bk_cap = max(budget // (4 * w * elt) // 128 * 128, 128)
    bk = _divisor_block(t, min(bk, bk_cap, t))
    qg = q.reshape(b, kvh, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kvh, rep, d), lambda i, lens: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, kvh * rep, w),
                               lambda i, lens: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk, w), k_cache.dtype),
            pltpu.VMEM((2, bk, w), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _kernel_v4(bk, kvh, rep, d, t, b, d ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh * rep, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), qg, k2, v2)
    # diagonal band extraction (row-group g keeps lane band g)
    out = out.reshape(b, kvh, rep, kvh, d)
    out = jnp.take_along_axis(
        out, jnp.arange(kvh)[None, :, None, None, None], axis=3)[:, :, :,
                                                                 0]
    return out.reshape(b, h * d)


# ------------------------------------------------------- KV8 cache variant

def _decode_attention_q8_v3(qg, qk, sk, qv, sv, lengths, *, scale, bk,
                            interpret, paired=False):
    """v3 KV8 wrapper (wide-MHA path, d == 128). qg GROUPED
    (b, kvh, rep, d); paired = dh=64 head-pairing view (see
    _kernel_q8_v3); returns (b, kvh, rep, d)."""
    b, kvh, rep, d = qg.shape
    t = qk.shape[1]
    budget = 6 * 1024 * 1024
    bk_cap = max(budget // (4 * kvh * d) // 128 * 128, 128)
    bk = _divisor_block(t, min(bk, bk_cap, t))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, rep, d), lambda bi, lens: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, rep, d),
                               lambda bi, lens: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk, kvh, d), jnp.int8),
            pltpu.VMEM((2, bk, 128), jnp.float32),
            pltpu.VMEM((2, bk, kvh, d), jnp.int8),
            pltpu.VMEM((2, bk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        _kernel_q8_v3(bk, kvh, rep, d, t, scale, paired),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), qg, qk, sk, qv, sv)


def _kernel_q8_v3(bk: int, kvh: int, rep: int, d: int, t_total: int,
                  scale: float, paired: bool = False):
    """paired (dh=64 head-pairing view): 'head' g is a PAIR — its top
    rep//2 rows belong to original head 2g (scale lane 2g), the bottom
    rows to head 2g+1 (lane 2g+1) — so the scale row becomes a per-row
    (rep, bk) matrix instead of a broadcast (1, bk) vector."""
    nk_max = t_total // bk

    def kernel(len_ref, q_ref, qk_hbm, sk_hbm, qv_hbm, sv_hbm, o_ref,
               bufk, bufsk, bufv, bufsv, sems):
        b = pl.program_id(0)
        length = len_ref[b]
        nk = jnp.minimum((length + bk - 1) // bk, nk_max)

        def dmas(slot, t):
            start = jnp.minimum(t, nk_max - 1) * bk
            return [
                pltpu.make_async_copy(qk_hbm.at[b, pl.ds(start, bk)],
                                      bufk.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(sk_hbm.at[b, pl.ds(start, bk)],
                                      bufsk.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(qv_hbm.at[b, pl.ds(start, bk)],
                                      bufv.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(sv_hbm.at[b, pl.ds(start, bk)],
                                      bufsv.at[slot], sems.at[slot, 3]),
            ]

        for dma in dmas(0, 0):
            dma.start()
        if nk_max > 1:
            @pl.when(nk > 1)
            def _():
                for dma in dmas(1, 1):
                    dma.start()

        q = q_ref[0].astype(jnp.float32) * scale     # (kvh, rep, d)

        def body(t, carry):
            o, m, l = carry
            slot = jax.lax.rem(t, 2)
            for dma in dmas(slot, t):
                dma.wait()
            # scales folded as (1, bk) row vectors per head — the int8
            # values are cast, never re-multiplied elementwise over D
            k_heads = [bufk[slot, :, g].astype(jnp.float32)
                       for g in range(kvh)]
            v_heads = [bufv[slot, :, g] for g in range(kvh)]
            if paired:
                half = rep // 2

                def _rows(buf, g):
                    top = buf[slot, :, 2 * g][None, :]
                    bot = buf[slot, :, 2 * g + 1][None, :]
                    return jnp.concatenate(
                        [jnp.broadcast_to(top, (half, bk)),
                         jnp.broadcast_to(bot, (half, bk))], axis=0)

                sk_rows = [_rows(bufsk, g) for g in range(kvh)]
                sv_rows = [_rows(bufsv, g) for g in range(kvh)]
            else:
                sk_rows = [bufsk[slot, :, g][None, :]
                           for g in range(kvh)]
                sv_rows = [bufsv[slot, :, g][None, :]
                           for g in range(kvh)]
            s = jnp.stack([
                jax.lax.dot_general(q[g], k_heads[g],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                * sk_rows[g]
                for g in range(kvh)], axis=0)        # (kvh, rep, bk)
            k_pos = t * bk + jax.lax.broadcasted_iota(jnp.int32,
                                                      (1, 1, bk), 2)
            s = jnp.where(k_pos < length, s, NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_blk)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            o_new = o * alpha + jnp.stack([
                jax.lax.dot_general(
                    (p[g] * sv_rows[g]).astype(jnp.bfloat16),
                    v_heads[g].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for g in range(kvh)], axis=0)        # (kvh, rep, d)

            @pl.when(t + 2 < nk)
            def _():
                for dma in dmas(slot, t + 2):
                    dma.start()
            return o_new, m_new, l_new

        o0 = jnp.zeros((kvh, rep, d), jnp.float32)
        m0 = jnp.full((kvh, rep, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((kvh, rep, 1), jnp.float32)
        o, m, l = jax.lax.fori_loop(0, nk, body, (o0, m0, l0))
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


def _kernel_q8_v4(bk: int, kvh: int, rep: int, d: int, t_total: int,
                  b_total: int, scale: float):
    """KV8 version of _kernel_v4. The per-(token, head) scales land as
    (bk, 128) chunks; their per-row-group broadcast onto the (h, bk)
    score/prob matrices is ONE MXU dot against a constant one-hot
    selector G (G[r, j] = 1 iff j == head(r)): M = G @ sk_blk^T — the
    MXU does the transpose-and-gather that would otherwise be a
    relayout + per-head VPU loop."""
    nk_max = t_total // bk
    w = kvh * d
    h = kvh * rep

    def kernel(len_ref, q_ref, qk_hbm, sk_hbm, qv_hbm, sv_hbm, o_ref,
               bufk, bufsk, bufv, bufsv, sems):
        sched = [(b, t) for b in range(b_total) for t in range(nk_max)]

        def nk_of(b):
            return jnp.minimum((len_ref[b] + bk - 1) // bk, nk_max)

        def pred(i):
            b, t = sched[i]
            return t < nk_of(b)

        def dmas(slot, i):
            b, t = sched[i]
            start = jnp.minimum(t, nk_max - 1) * bk
            return [
                pltpu.make_async_copy(qk_hbm.at[b, pl.ds(start, bk)],
                                      bufk.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(sk_hbm.at[b, pl.ds(start, bk)],
                                      bufsk.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(qv_hbm.at[b, pl.ds(start, bk)],
                                      bufv.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(sv_hbm.at[b, pl.ds(start, bk)],
                                      bufsv.at[slot], sems.at[slot, 3]),
            ]

        def start_all(i):
            @pl.when(pred(i))
            def _():
                for dma in dmas(i % 2, i):
                    dma.start()

        start_all(0)
        if len(sched) > 1:
            start_all(1)

        # constant one-hot head selector (h, 128)
        row_head = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 0) // rep
        lane = jax.lax.broadcasted_iota(jnp.int32, (h, 128), 1)
        g_sel = (lane == row_head).astype(jnp.float32)

        nsched = len(sched)
        for b in range(b_total):
            q = q_ref[b].astype(jnp.float32) * scale
            q_ext = jnp.concatenate(
                [jnp.pad(q[g], ((0, 0), (g * d, w - (g + 1) * d)))
                 for g in range(kvh)], axis=0)          # (h, w)
            length = len_ref[b]
            nk = nk_of(b)
            o = jnp.zeros((h, w), jnp.float32)
            m = jnp.full((h, 1), NEG_INF, jnp.float32)
            l = jnp.zeros((h, 1), jnp.float32)
            for t in range(nk_max):
                i = b * nk_max + t
                slot = i % 2

                @pl.when(pred(i))
                def _wait():
                    for dma in dmas(slot, i):
                        dma.wait()

                def live_body(carry):
                    o, m, l = carry
                    mk = jax.lax.dot_general(
                        g_sel, bufsk[slot], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, bk)
                    s = jax.lax.dot_general(
                        q_ext, bufk[slot].astype(jnp.float32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * mk
                    k_pos = t * bk + jax.lax.broadcasted_iota(
                        jnp.int32, (1, bk), 1)
                    s = jnp.where(k_pos < length, s, NEG_INF)
                    m_blk = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m, m_blk)
                    alpha = jnp.exp(m - m_new)
                    p = jnp.exp(s - m_new)
                    l_new = l * alpha + jnp.sum(p, axis=-1,
                                                keepdims=True)
                    mv = jax.lax.dot_general(
                        g_sel, bufsv[slot], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, bk)
                    pv = jax.lax.dot_general(
                        (p * mv).astype(jnp.bfloat16),
                        bufv[slot].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, w)
                    return o * alpha + pv, m_new, l_new

                o, m, l = jax.lax.cond(t < nk, live_body,
                                       lambda c: c, (o, m, l))
                if i + 2 < nsched:
                    start_all(i + 2)
            o_ref[b] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def decode_attention_q8(q, qk, sk, qv, sv, lengths, *,
                        bk: int | None = None,
                        interpret: bool | None = None):
    """KV8-cache variant: qk/qv (B, T, KVH, D) int8, sk/sv
    (B, T, 128) fp32 per-(token, head) scales (lane-padded to a full
    128 tile; heads occupy the first KVH lanes). Same online-softmax
    contract as decode_attention with the scales folded into the score
    and probability rows (rank-1 in t, so they commute); cache traffic
    is HALF the bf16 path's on top of the length-aware chunking."""
    b, h, d = q.shape
    _, t, kvh, _ = qk.shape
    rep = h // kvh
    w = kvh * d
    if bk is None:
        from how_to_optimize_gemm_tpu.harness.autotune_kernels import (
            decode_key, knobs_for)
        bk = knobs_for("decode",
                       decode_key(t, kvh, d, kv8=True)).get("bk") or 512
    assert sk.shape[-1] == 128 and sv.shape[-1] == 128, \
        "scales must be lane-padded to 128 (pad at WRITE time, not here)"
    assert w % 128 == 0 and kvh <= 128, (kvh, d)
    if w > 1024:
        if d == 64:
            # wide dh=64 head-pairing view (see decode_attention); the
            # per-(token, head) scales stay in their original lanes —
            # the paired kernel reads lanes 2g/2g+1 per pair row-half
            assert kvh % 2 == 0, (kvh, d)
            k2 = qk.reshape(b, t, kvh // 2, 128)
            v2 = qv.reshape(b, t, kvh // 2, 128)
            q_ext = _pair_heads(q.reshape(b, kvh, rep, d), d)
            out = _decode_attention_q8_v3(q_ext, k2, sk, v2, sv,
                                          lengths, scale=d ** -0.5,
                                          bk=bk, interpret=interpret,
                                          paired=True)
            return _unpair_bands(out, rep, d)
        assert d == 128, (kvh, d)   # wide-MHA: v3 path (see above)
        out = _decode_attention_q8_v3(q.reshape(b, kvh, rep, d), qk, sk,
                                      qv, sv, lengths, scale=d ** -0.5,
                                      bk=bk, interpret=interpret)
        return out.reshape(b, h * d)
    k2 = qk.reshape(b, t, w)
    v2 = qv.reshape(b, t, w)
    elt = 1  # int8 chunks dominate
    budget = 6 * 1024 * 1024
    bk_cap = max(budget // (4 * w * elt) // 128 * 128, 128)
    bk = _divisor_block(t, min(bk, bk_cap, t))
    qg = q.reshape(b, kvh, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kvh, rep, d), lambda i, lens: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, kvh * rep, w),
                               lambda i, lens: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk, w), jnp.int8),
            pltpu.VMEM((2, bk, 128), jnp.float32),
            pltpu.VMEM((2, bk, w), jnp.int8),
            pltpu.VMEM((2, bk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        _kernel_q8_v4(bk, kvh, rep, d, t, b, d ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh * rep, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), qg, k2, sk, v2, sv)
    out = out.reshape(b, kvh, rep, kvh, d)
    out = jnp.take_along_axis(
        out, jnp.arange(kvh)[None, :, None, None, None], axis=3)[:, :, :,
                                                                 0]
    return out.reshape(b, h * d)
