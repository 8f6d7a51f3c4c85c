"""Ring attention — the sequence/context-parallel capability slot.

SURVEY.md §5 names the idiom: "if sequence scaling is exercised, a
ring/collective-permute pattern over ICI is the idiomatic analogue" of
the reference's software pipelining, applied across chips. This module
supplies it: the SEQUENCE dimension is sharded over a mesh axis — each
device holds an S/n query shard and an S/n K/V shard — and K/V shards
rotate around the ring via ``lax.ppermute`` while every device folds
each visiting block into a running online softmax (o, m, l). Peak
per-device attention memory is O((S/n)^2) score blocks and O(S/n) K/V —
a context window n times longer than one device could hold, with the
per-hop transfer overlappable with the block compute by XLA's
latency-hiding scheduler (the cross-chip version of the ladder's
DMA/compute overlap rungs).

Causal masking uses GLOBAL positions: device i's queries live at
offset i*(S/n); at ring step t it holds the K/V shard of device
(i - t) mod n. Blocks wholly in a query's future contribute nothing
(their scores mask to -inf and the running max guards the exp).

The per-visit block attention is einsum-based blockwise attention
((S/n)^2 scores — the standard ring-attention building block); on-chip
long-context single-device prefill should use ops/pallas_attention
directly, which streams without materializing scores at all. This
module is about CROSSING DEVICES, and is validated on the 8-device
virtual mesh exactly like the TP layer (tests/test_ring_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_perm(n: int):
    return [(j, (j + 1) % n) for j in range(n)]


def ring_attention_local(q, k, v, axis_name: str, causal: bool = True):
    """shard_map body: q (B, H, Sl, D); k, v (B, KVH, Sl, D) — the
    LOCAL sequence shards. Returns (B, H, Sl, D) fp32."""
    n = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    b, h, sl, d = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    scale = d ** -0.5
    qf = q.astype(jnp.float32) * scale
    q_pos = me * sl + jnp.arange(sl)[:, None]            # (Sl, 1)

    def block_update(carry, kc, vc, src):
        o, m, l = carry
        kcf = jnp.repeat(kc, rep, axis=1).astype(jnp.float32)
        vcf = jnp.repeat(vc, rep, axis=1).astype(jnp.float32)
        s = jnp.einsum("bhsd,bhtd->bhst", qf, kcf)
        if causal:
            k_pos = src * sl + jnp.arange(sl)[None, :]   # (1, Sl)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # guard: a fully-masked block keeps m at -inf; exp(-inf - -inf)
        # must not produce NaN
        m_safe = jnp.maximum(m_new, NEG_INF / 2)
        alpha = jnp.exp(m - m_safe)
        p = jnp.exp(s - m_safe)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * alpha + jnp.einsum("bhst,bhtd->bhsd", p, vcf)
        return o_new, m_new, l_new

    # init carries derived from the (device-varying) shard so shard_map
    # types them as varying over the ring axis — a plain jnp.zeros init
    # is unvarying and fori_loop rejects the carry-type mismatch
    o0 = qf * 0.0
    m0 = qf[..., :1] * 0.0 + NEG_INF
    l0 = qf[..., :1] * 0.0

    def body(t, carry):
        o, m, l, kc, vc = carry
        src = (me - t) % n
        o, m, l = block_update((o, m, l), kc, vc, src)
        # rotate AFTER consuming: shard moves to the next device so at
        # step t every device holds shard (me - t) mod n
        kc = lax.ppermute(kc, axis_name, _ring_perm(n))
        vc = lax.ppermute(vc, axis_name, _ring_perm(n))
        return o, m, l, kc, vc

    o, m, l, _, _ = lax.fori_loop(0, n, body, (o0, m0, l0, k, v))
    return o / jnp.maximum(l, 1e-30)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "causal"))
def _ring_jit(q, k, v, mesh, axis, causal):
    spec_q = P(None, None, axis, None)
    fn = jax.shard_map(
        lambda q, k, v: ring_attention_local(q, k, v, axis,
                                             causal=causal),
        mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q),
        out_specs=spec_q)
    return fn(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = "tp",
                   causal: bool = True):
    """Sequence-parallel attention over ``mesh[axis]``.

    q (B, H, S, D); k, v (B, KVH, S, D) with S divisible by the axis
    size; returns (B, H, S, D) fp32. The arrays are sharded along S —
    per-device memory is O(S/n), so the context window scales with the
    ring size."""
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0, (q.shape, n)
    return _ring_jit(q, k, v, mesh, axis, causal)
