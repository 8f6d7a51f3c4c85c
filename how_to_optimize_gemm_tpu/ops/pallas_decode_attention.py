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

Grid design (v3): ONE program per batch slot; each chunk DMA slices
(bk, KVH, D) along the cache's UNTILED leading T dim of the time-major
(B, T, KVH, D) layout, and the per-head attention runs as one g-batched
dot_general. Two failed designs are part of the record: v1's (B, KVH)
grid with per-head DMAs lost to eager outright (~14 us of launch+DMA
overhead x 32 tiny programs per layer), and v2's head-major cache layout
made XLA's scatter (which physically prefers time-major — verified in
HLO) disagree with the custom call's layout constraint, inserting a
full-cache copy per layer per step.

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


def _kernel(bk: int, kvh: int, rep: int, d: int, t_total: int,
            scale: float, pack2: bool = False):
    """pack2: dh=64 mode — the caches are VIEWED as (B, T, KVH//2, 128)
    (a free contiguous reshape pairing adjacent heads per 128-lane row),
    because Mosaic DMA slices need a full-128 lane dim; each head's
    (bk, 64) block is a static lane slice of the landed chunk."""
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
            if pack2:
                k_heads = [bufk[slot, :, g // 2,
                                (g % 2) * d:(g % 2 + 1) * d]
                           .astype(jnp.float32) for g in range(kvh)]
                v_heads = [bufv[slot, :, g // 2,
                                (g % 2) * d:(g % 2 + 1) * d]
                           for g in range(kvh)]
            else:
                k_heads = [bufk[slot, :, g].astype(jnp.float32)
                           for g in range(kvh)]      # each (bk, d)
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


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def decode_attention(q, k_cache, v_cache, lengths, *, bk: int = 512,
                     interpret: bool | None = None):
    """q: (B, H, D) one query per slot; k/v_cache: (B, T, KVH, D)
    time-major; lengths: (B,) int32 — valid cache entries per slot (the
    current token's K/V must already be written). Returns (B, H*D)
    fp32."""
    b, h, d = q.shape
    _, t, kvh, _ = k_cache.shape
    rep = h // kvh
    # dh=64 head-pairing (see _kernel): view the cache with two adjacent
    # kv heads per 128-lane row — a free reshape of the contiguous
    # time-major layout. dh=64 with odd kvh stays on the caller's eager
    # fallback (models/llama routing).
    pack2 = d == 64 and kvh % 2 == 0
    if pack2:
        k_cache = k_cache.reshape(b, t, kvh // 2, 128)
        v_cache = v_cache.reshape(b, t, kvh // 2, 128)
    # VMEM clamp: 2 ping-pong slots x (k, v) chunks of (bk, kvh, d) must
    # stay well inside the fast-VMEM window (MHA models like Llama-2-7B
    # have kvh=32 — a naive bk=512 would allocate 16 MB of chunk buffers)
    elt = jnp.dtype(k_cache.dtype).itemsize
    budget = 6 * 1024 * 1024
    bk_cap = max(budget // (4 * kvh * d * elt) // 128 * 128, 128)
    bk = _divisor_block(t, min(bk, bk_cap, t))
    qg = q.reshape(b, kvh, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, rep, d), lambda bi, lens: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, rep, d),
                               lambda bi, lens: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk) + k_cache.shape[2:], k_cache.dtype),
            pltpu.VMEM((2, bk) + v_cache.shape[2:], v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _kernel(bk, kvh, rep, d, t, d ** -0.5, pack2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(b, h * d)


# ------------------------------------------------------- KV8 cache variant

def _kernel_q8(bk: int, kvh: int, rep: int, d: int, t_total: int,
               scale: float, pack2: bool = False):
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
            if pack2:
                k_heads = [bufk[slot, :, g // 2,
                                (g % 2) * d:(g % 2 + 1) * d]
                           .astype(jnp.float32) for g in range(kvh)]
                v_heads = [bufv[slot, :, g // 2,
                                (g % 2) * d:(g % 2 + 1) * d]
                           for g in range(kvh)]
            else:
                k_heads = [bufk[slot, :, g].astype(jnp.float32)
                           for g in range(kvh)]
                v_heads = [bufv[slot, :, g] for g in range(kvh)]
            sk_rows = [bufsk[slot, :, g][None, :] for g in range(kvh)]
            sv_rows = [bufsv[slot, :, g][None, :] for g in range(kvh)]
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


@functools.partial(jax.jit, static_argnames=("bk", "interpret"))
def decode_attention_q8(q, qk, sk, qv, sv, lengths, *, bk: int = 512,
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
    assert sk.shape[-1] == 128 and sv.shape[-1] == 128, \
        "scales must be lane-padded to 128 (pad at WRITE time, not here)"
    # dh=64 head-pairing (see _kernel): per-head scales are (B, T, 128)
    # rows and unaffected by the value-cache reshape.
    pack2 = d == 64 and kvh % 2 == 0
    if pack2:
        qk = qk.reshape(b, t, kvh // 2, 128)
        qv = qv.reshape(b, t, kvh // 2, 128)
    elt = 1  # int8 chunks dominate
    budget = 6 * 1024 * 1024
    bk_cap = max(budget // (4 * kvh * d * elt) // 128 * 128, 128)
    bk = _divisor_block(t, min(bk, bk_cap, t))
    qg = q.reshape(b, kvh, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh, rep, d), lambda bi, lens: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh, rep, d),
                               lambda bi, lens: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bk) + qk.shape[2:], jnp.int8),
            pltpu.VMEM((2, bk, 128), jnp.float32),
            pltpu.VMEM((2, bk) + qv.shape[2:], jnp.int8),
            pltpu.VMEM((2, bk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        _kernel_q8(bk, kvh, rep, d, t, d ** -0.5, pack2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, rep, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=default_interpret(interpret),
    )(lengths.astype(jnp.int32), qg, qk, sk, qv, sv)
    return out.reshape(b, h * d)
