"""Paged (block-table) decode attention: vLLM-style KV paging on TPU.

The contiguous cache (ops/pallas_decode_attention.py) reserves
``max_seq`` tokens of HBM per slot whether or not a request ever grows
that long — the classic serving memory waste that block-table paging
removes (the capability slot the reference's serving north star implies;
cache-read discipline cited from SURVEY.md §2.6). Here the cache is a
POOL of fixed-size pages ``(n_pages, page, KVH, D)`` shared by every
slot; a per-slot block table maps chunk index -> physical page, and the
engine (parallel/serving.PagedServingEngine) allocates pages on demand
as positions cross page boundaries, so total cache memory tracks the
TOKENS THAT EXIST, not slots x max_seq.

Kernel design: the length-aware decode kernels already walk the cache
in bk-sized DMA chunks at traced offsets; paging IS that walk with one
indirection — the chunk's DMA source index comes from the block table,
prefetched as a second scalar operand (``PrefetchScalarGridSpec``
num_scalar_prefetch=2). A page equals a DMA chunk (bk == page), so the
paged kernels are the v3/v4 kernels with ``k_hbm.at[table[b, t]]``
replacing ``k_hbm.at[b, pl.ds(t * bk, bk)]`` — identical pipeline,
identical predication, zero extra traffic.

Conventions:
- page id 0 is the TRASH page: never allocated to a slot, the target of
  masked/bogus writes (write_mask=False slots, positions beyond a
  prompt). Dead-chunk table entries are 0; their pages are never read
  live (length masking covers them), but ids stay in-bounds by
  construction.
- unallocated table entries are 0; reads are predicated off by length
  exactly as dead chunks are in the contiguous kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.utils.env import default_interpret
from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
    NEG_INF, _pair_heads, _unpair_bands)


def good_page_size(kvh: int, d: int, itemsize: int = 2,
                   cap_tokens: int = 512) -> int:
    """Largest 128-multiple page (tokens) whose 2x(K,V) ping-pong chunk
    buffers stay inside the ~6 MB fast-VMEM window the contiguous
    kernels budget for (4 buffers of (page, kvh*d) x itemsize). Wide-MHA
    models (7B: kvh*d=4096) land at 128; small GQA models at 512."""
    budget = 6 * 1024 * 1024
    cap = budget // (4 * kvh * d * itemsize) // 128 * 128
    return max(min(cap, cap_tokens), 128)


# ----------------------------------------------------------- v4 (fused)

def _kernel_v4_paged(ps: int, kvh: int, rep: int, d: int, np_max: int,
                     n_pages: int, b_total: int, scale: float):
    """Fused-head paged kernel (w = kvh*d <= 1024): _kernel_v4 with the
    chunk DMA source indirected through the prefetched block table."""
    w = kvh * d
    h = kvh * rep

    def kernel(len_ref, tab_ref, q_ref, k_hbm, v_hbm, o_ref, bufk, bufv,
               sems):
        sched = [(b, t) for b in range(b_total) for t in range(np_max)]

        def nk_of(b):
            return jnp.minimum((len_ref[b] + ps - 1) // ps, np_max)

        def pred(i):
            b, t = sched[i]
            return t < nk_of(b)

        def page_of(i):
            b, t = sched[i]
            # clamp: guarded starts still trace the index expression,
            # and unallocated entries are 0 (in-bounds) by convention —
            # the min is pure safety against a corrupted table.
            return jnp.minimum(tab_ref[b, t], n_pages - 1)

        def dma_k(slot, i):
            return pltpu.make_async_copy(
                k_hbm.at[page_of(i)], bufk.at[slot], sems.at[slot, 0])

        def dma_v(slot, i):
            return pltpu.make_async_copy(
                v_hbm.at[page_of(i)], bufv.at[slot], sems.at[slot, 1])

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
            q = q_ref[b].astype(jnp.float32) * scale   # (kvh, rep, d)
            q_ext = jnp.concatenate(
                [jnp.pad(q[g], ((0, 0), (g * d, w - (g + 1) * d)))
                 for g in range(kvh)], axis=0)          # (h, w)
            length = len_ref[b]
            nk = nk_of(b)
            o = jnp.zeros((h, w), jnp.float32)
            m = jnp.full((h, 1), NEG_INF, jnp.float32)
            l = jnp.zeros((h, 1), jnp.float32)
            for t in range(np_max):
                i = b * np_max + t
                slot = i % 2

                @pl.when(pred(i))
                def _wait():
                    dma_k(slot, i).wait()
                    dma_v(slot, i).wait()

                def live_body(carry):
                    o, m, l = carry
                    k_blk = bufk[slot].astype(jnp.float32)  # (ps, w)
                    s = jax.lax.dot_general(
                        q_ext, k_blk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, ps)
                    k_pos = t * ps + jax.lax.broadcasted_iota(
                        jnp.int32, (1, ps), 1)
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


# --------------------------------------------------------- v3 (per-slot)

def _kernel_v3_paged(ps: int, kvh: int, rep: int, d: int, np_max: int,
                     n_pages: int, scale: float):
    """Per-slot paged kernel (wide-MHA, kvh*d > 1024): _kernel_v3 with
    the table indirection; the chunk walk stays a dynamic fori (np_max
    pages of a 7B cache at T=4096/ps=128 is 32 back-edges — immaterial
    under the weight-stream bound, see _kernel_v3's docstring)."""

    def kernel(len_ref, tab_ref, q_ref, k_hbm, v_hbm, o_ref, bufk, bufv,
               sems):
        b = pl.program_id(0)
        length = len_ref[b]
        nk = jnp.minimum((length + ps - 1) // ps, np_max)

        def page_of(t):
            return jnp.minimum(tab_ref[b, jnp.minimum(t, np_max - 1)],
                               n_pages - 1)

        def dma_k(slot, t):
            return pltpu.make_async_copy(
                k_hbm.at[page_of(t)], bufk.at[slot], sems.at[slot, 0])

        def dma_v(slot, t):
            return pltpu.make_async_copy(
                v_hbm.at[page_of(t)], bufv.at[slot], sems.at[slot, 1])

        dma_k(0, 0).start()
        dma_v(0, 0).start()
        if np_max > 1:
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
            k_heads = [bufk[slot, :, g].astype(jnp.float32)
                       for g in range(kvh)]
            v_heads = [bufv[slot, :, g] for g in range(kvh)]
            s = jnp.stack([
                jax.lax.dot_general(q[g], k_heads[g],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for g in range(kvh)], axis=0)        # (kvh, rep, ps)
            k_pos = t * ps + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, ps), 2)
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

            @pl.when(t + 2 < nk)
            def _():
                dma_k(slot, t + 2).start()
                dma_v(slot, t + 2).start()
            return o_new, m_new, l_new

        o0 = jnp.zeros((kvh, rep, d), jnp.float32)
        m0 = jnp.full((kvh, rep, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((kvh, rep, 1), jnp.float32)
        o, m, l = jax.lax.fori_loop(0, nk, body, (o0, m0, l0))
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


def _paged_v3(qg, k_pool, v_pool, table, lengths, *, scale, interpret):
    """v3-paged wrapper. qg GROUPED (b, kvh, rep, d); pools
    (n_pages, ps, kvh, d); table (b, np_max)."""
    b, kvh, rep, d = qg.shape
    n_pages, ps = k_pool.shape[:2]
    np_max = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, rep, d),
                         lambda bi, lens, tab: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, rep, d),
                               lambda bi, lens, tab: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, kvh, d), k_pool.dtype),
            pltpu.VMEM((2, ps, kvh, d), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _kernel_v3_paged(ps, kvh, rep, d, np_max, n_pages, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), table.astype(jnp.int32), qg, k_pool,
      v_pool)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(q, k_pool, v_pool, table, lengths, *,
                           interpret: bool | None = None):
    """q: (B, H, D) one query per slot; k/v_pool: (n_pages, PS, KVH, D)
    shared page pools (page 0 = trash); table: (B, max_pages) int32
    physical page per slot chunk (unallocated entries 0); lengths: (B,).
    Returns (B, H*D) fp32. Same online-softmax contract as
    decode_attention; HBM traffic = ceil(len/PS) pages per slot."""
    b, h, d = q.shape
    n_pages, ps, kvh, _ = k_pool.shape
    rep = h // kvh
    w = kvh * d
    np_max = table.shape[1]
    assert w % 128 == 0, (kvh, d)
    # compiled Mosaic needs lane/sublane-aligned page DMAs; the
    # interpreter (CPU tests) runs tiny pages fine
    assert ps % 128 == 0 or default_interpret(interpret), ps
    qg = q.reshape(b, kvh, rep, d)
    if w > 1024:
        if d == 64:
            # wide dh=64: head-pairing POOL view (two 64-lane heads per
            # 128-lane row — free contiguous reshape, as the contiguous
            # path does on the cache)
            assert kvh % 2 == 0, (kvh, d)
            k2 = k_pool.reshape(n_pages, ps, kvh // 2, 128)
            v2 = v_pool.reshape(n_pages, ps, kvh // 2, 128)
            out = _paged_v3(_pair_heads(qg, d), k2, v2, table, lengths,
                            scale=d ** -0.5, interpret=interpret)
            return _unpair_bands(out, rep, d)
        assert d == 128, (kvh, d)
        out = _paged_v3(qg, k_pool, v_pool, table, lengths,
                        scale=d ** -0.5, interpret=interpret)
        return out.reshape(b, h * d)
    # fused-head 2D page view
    k2 = k_pool.reshape(n_pages, ps, w)
    v2 = v_pool.reshape(n_pages, ps, w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kvh, rep, d),
                         lambda i, lens, tab: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, kvh * rep, w),
                               lambda i, lens, tab: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, w), k_pool.dtype),
            pltpu.VMEM((2, ps, w), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _kernel_v4_paged(ps, kvh, rep, d, np_max, n_pages, b,
                         d ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh * rep, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), table.astype(jnp.int32), qg, k2, v2)
    out = out.reshape(b, kvh, rep, kvh, d)
    out = jnp.take_along_axis(
        out, jnp.arange(kvh)[None, :, None, None, None], axis=3)[:, :, :,
                                                                 0]
    return out.reshape(b, h * d)


def gather_paged(pool, table):
    """Materialize a slot-contiguous (B, max_pages*PS, ...) view of a
    page pool — the eager/CPU fallback read and the kernels' test
    oracle. Unallocated chunks surface the trash page; callers mask by
    length exactly as with a contiguous cache. Works for KV8 scale
    pools too (any trailing shape)."""
    n_pages, ps = pool.shape[:2]
    b, np_max = table.shape
    return pool[table].reshape((b, np_max * ps) + pool.shape[2:])


# ------------------------------------------------------- KV8 paged pools

def _kernel_q8_v4_paged(ps: int, kvh: int, rep: int, d: int,
                        np_max: int, n_pages: int, b_total: int,
                        scale: float):
    """KV8 fused-head paged kernel: _kernel_q8_v4 (scales gathered onto
    score rows by one MXU dot against a one-hot head selector) with the
    page-table DMA indirection."""
    w = kvh * d
    h = kvh * rep

    def kernel(len_ref, tab_ref, q_ref, qk_hbm, sk_hbm, qv_hbm, sv_hbm,
               o_ref, bufk, bufsk, bufv, bufsv, sems):
        sched = [(b, t) for b in range(b_total) for t in range(np_max)]

        def nk_of(b):
            return jnp.minimum((len_ref[b] + ps - 1) // ps, np_max)

        def pred(i):
            b, t = sched[i]
            return t < nk_of(b)

        def dmas(slot, i):
            b, t = sched[i]
            pg = jnp.minimum(tab_ref[b, t], n_pages - 1)
            return [
                pltpu.make_async_copy(qk_hbm.at[pg], bufk.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(sk_hbm.at[pg], bufsk.at[slot],
                                      sems.at[slot, 1]),
                pltpu.make_async_copy(qv_hbm.at[pg], bufv.at[slot],
                                      sems.at[slot, 2]),
                pltpu.make_async_copy(sv_hbm.at[pg], bufsv.at[slot],
                                      sems.at[slot, 3]),
            ]

        def start_all(i):
            @pl.when(pred(i))
            def _():
                for dma in dmas(i % 2, i):
                    dma.start()

        start_all(0)
        if len(sched) > 1:
            start_all(1)

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
            for t in range(np_max):
                i = b * np_max + t
                slot = i % 2

                @pl.when(pred(i))
                def _wait():
                    for dma in dmas(slot, i):
                        dma.wait()

                def live_body(carry):
                    o, m, l = carry
                    mk = jax.lax.dot_general(
                        g_sel, bufsk[slot], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, ps)
                    s = jax.lax.dot_general(
                        q_ext, bufk[slot].astype(jnp.float32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * mk
                    k_pos = t * ps + jax.lax.broadcasted_iota(
                        jnp.int32, (1, ps), 1)
                    s = jnp.where(k_pos < length, s, NEG_INF)
                    m_blk = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m, m_blk)
                    alpha = jnp.exp(m - m_new)
                    p = jnp.exp(s - m_new)
                    l_new = l * alpha + jnp.sum(p, axis=-1,
                                                keepdims=True)
                    mv = jax.lax.dot_general(
                        g_sel, bufsv[slot], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (h, ps)
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


def _kernel_q8_v3_paged(ps: int, kvh: int, rep: int, d: int,
                        np_max: int, n_pages: int, scale: float,
                        paired: bool = False):
    """KV8 per-slot paged kernel (wide-MHA widths): _kernel_q8_v3 with
    the table indirection. paired = dh=64 head-pairing view (per-pair
    scale rows, see pallas_decode_attention._kernel_q8_v3)."""

    def kernel(len_ref, tab_ref, q_ref, qk_hbm, sk_hbm, qv_hbm, sv_hbm,
               o_ref, bufk, bufsk, bufv, bufsv, sems):
        b = pl.program_id(0)
        length = len_ref[b]
        nk = jnp.minimum((length + ps - 1) // ps, np_max)

        def dmas(slot, t):
            pg = jnp.minimum(tab_ref[b, jnp.minimum(t, np_max - 1)],
                             n_pages - 1)
            return [
                pltpu.make_async_copy(qk_hbm.at[pg], bufk.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(sk_hbm.at[pg], bufsk.at[slot],
                                      sems.at[slot, 1]),
                pltpu.make_async_copy(qv_hbm.at[pg], bufv.at[slot],
                                      sems.at[slot, 2]),
                pltpu.make_async_copy(sv_hbm.at[pg], bufsv.at[slot],
                                      sems.at[slot, 3]),
            ]

        for dma in dmas(0, 0):
            dma.start()
        if np_max > 1:
            @pl.when(nk > 1)
            def _():
                for dma in dmas(1, 1):
                    dma.start()

        q = q_ref[0].astype(jnp.float32) * scale     # (kvh, rep, d)
        rep_rows = q.shape[1]

        def body(t, carry):
            o, m, l = carry
            slot = jax.lax.rem(t, 2)
            for dma in dmas(slot, t):
                dma.wait()
            k_heads = [bufk[slot, :, g].astype(jnp.float32)
                       for g in range(kvh)]
            v_heads = [bufv[slot, :, g] for g in range(kvh)]
            if paired:
                half = rep_rows // 2

                def _rows(buf, g):
                    top = buf[slot, :, 2 * g][None, :]
                    bot = buf[slot, :, 2 * g + 1][None, :]
                    return jnp.concatenate(
                        [jnp.broadcast_to(top, (half, ps)),
                         jnp.broadcast_to(bot, (half, ps))], axis=0)

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
                for g in range(kvh)], axis=0)        # (kvh, rep, ps)
            k_pos = t * ps + jax.lax.broadcasted_iota(jnp.int32,
                                                      (1, 1, ps), 2)
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

        o0 = jnp.zeros(q.shape, jnp.float32)
        m0 = jnp.full(q.shape[:2] + (1,), NEG_INF, jnp.float32)
        l0 = jnp.zeros(q.shape[:2] + (1,), jnp.float32)
        o, m, l = jax.lax.fori_loop(0, nk, body, (o0, m0, l0))
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


def _paged_q8_v3(qg, qk_pool, sk_pool, qv_pool, sv_pool, table, lengths,
                 *, scale, interpret, paired=False):
    b, kvh, rep, d = qg.shape
    n_pages, ps = qk_pool.shape[:2]
    np_max = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, rep, d),
                         lambda bi, lens, tab: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, rep, d),
                               lambda bi, lens, tab: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, kvh, d), jnp.int8),
            pltpu.VMEM((2, ps, 128), jnp.float32),
            pltpu.VMEM((2, ps, kvh, d), jnp.int8),
            pltpu.VMEM((2, ps, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    return pl.pallas_call(
        _kernel_q8_v3_paged(ps, kvh, rep, d, np_max, n_pages, scale,
                            paired),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), table.astype(jnp.int32), qg, qk_pool,
      sk_pool, qv_pool, sv_pool)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_q8(q, qk_pool, sk_pool, qv_pool, sv_pool,
                              table, lengths, *,
                              interpret: bool | None = None):
    """KV8 paged variant: qk/qv_pool (n_pages, PS, KVH, D) int8,
    sk/sv_pool (n_pages, PS, 128) fp32 lane-padded per-(token, head)
    scales; table/lengths as paged_decode_attention. Scales fold into
    the score/prob rows exactly as decode_attention_q8."""
    b, h, d = q.shape
    n_pages, ps, kvh, _ = qk_pool.shape
    rep = h // kvh
    w = kvh * d
    assert w % 128 == 0, (kvh, d)
    assert sk_pool.shape[-1] == 128 and sv_pool.shape[-1] == 128, \
        "scales must be lane-padded to 128 (pad at WRITE time, not here)"
    assert ps % 128 == 0 or default_interpret(interpret), ps
    qg = q.reshape(b, kvh, rep, d)
    if w > 1024:
        if d == 64:
            assert kvh % 2 == 0, (kvh, d)
            k2 = qk_pool.reshape(n_pages, ps, kvh // 2, 128)
            v2 = qv_pool.reshape(n_pages, ps, kvh // 2, 128)
            out = _paged_q8_v3(_pair_heads(qg, d), k2, sk_pool, v2,
                               sv_pool, table, lengths, scale=d ** -0.5,
                               interpret=interpret, paired=True)
            return _unpair_bands(out, rep, d)
        assert d == 128, (kvh, d)
        out = _paged_q8_v3(qg, qk_pool, sk_pool, qv_pool, sv_pool,
                           table, lengths, scale=d ** -0.5,
                           interpret=interpret)
        return out.reshape(b, h * d)
    k2 = qk_pool.reshape(n_pages, ps, w)
    v2 = qv_pool.reshape(n_pages, ps, w)
    np_max = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kvh, rep, d),
                         lambda i, lens, tab: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((b, kvh * rep, w),
                               lambda i, lens, tab: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, w), jnp.int8),
            pltpu.VMEM((2, ps, 128), jnp.float32),
            pltpu.VMEM((2, ps, w), jnp.int8),
            pltpu.VMEM((2, ps, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        _kernel_q8_v4_paged(ps, kvh, rep, d, np_max, n_pages, b,
                            d ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh * rep, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), table.astype(jnp.int32), qg, k2,
      sk_pool, v2, sv_pool)
    out = out.reshape(b, kvh, rep, kvh, d)
    out = jnp.take_along_axis(
        out, jnp.arange(kvh)[None, :, None, None, None], axis=3)[:, :, :,
                                                                 0]
    return out.reshape(b, h * d)
