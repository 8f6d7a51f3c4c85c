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

from how_to_optimize_gemm_tpu.utils.env import default_interpret

NEG_INF = -1e30


def _kernel(bq: int, bk: int, scale: float, causal: bool, t_total: int):
    nkv = t_total // bk

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qi = pl.program_id(2)
        q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, D)
        d = q.shape[-1]

        # (bq, 1) global query positions (2D iota: Mosaic has no 1D)
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

        def body(t, carry):
            o, m, l = carry
            k_blk = k_ref[0, 0, pl.ds(t * bk, bk)]           # (bk, D)
            v_blk = v_ref[0, 0, pl.ds(t * bk, bk)]
            s = jax.lax.dot_general(
                q, k_blk.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (bq, bk)
            if causal:
                k_pos = t * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (1, bk), 1)
                s = jnp.where(k_pos <= q_pos, s, NEG_INF)
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

        o0 = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        if causal:
            # dynamic trip count: skip K/V blocks entirely in the future
            # of this q block (the flash-attention causal early exit).
            t_hi = (qi * bq + bq + bk - 1) // bk
            t_hi = jnp.minimum(t_hi, nkv)
        else:
            t_hi = nkv
        o, m, l = jax.lax.fori_loop(0, t_hi, body, (o0, m0, l0))
        o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("causal", "bq", "bk",
                                             "interpret"))
def flash_attention(q, k, v, *, causal: bool = True, bq: int = 512,
                    bk: int = 512, interpret: bool | None = None):
    """Streaming causal attention. q: (B, H, S, D); k, v: (B, KVH, T, D);
    returns (B, H, S, D) in q's dtype. fp32 online-softmax state; scores
    never touch HBM."""
    b, h, s, d = q.shape
    _, kvh, t, _ = k.shape
    rep = h // kvh
    bq = min(bq, s)
    bk = min(bk, t)
    assert s % bq == 0 and t % bk == 0, (s, bq, t, bk)
    scale = d ** -0.5
    grid = (b, h, s // bq)
    out = pl.pallas_call(
        _kernel(bq, bk, scale, causal, t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            # full-T K/V strips for this (batch, kv-head); the index map
            # is constant in qi so Mosaic fetches each strip once per
            # (b, h) and revisits it across q blocks.
            pl.BlockSpec((1, 1, t, d),
                         lambda bi, hi, qi, rep=rep: (bi, hi // rep, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, d),
                         lambda bi, hi, qi, rep=rep: (bi, hi // rep, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * b * h * s * t * d) // (2 if causal else 1),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * h * s * t,
        ),
        interpret=default_interpret(interpret),
    )(q, k, v)
    return out


def mha_flash(q, k, v, *, causal: bool = True,
              interpret: bool | None = None):
    """Model-layout wrapper: q (B, S, H, D), k/v (B, T, KVH, D) ->
    (B, S, H*D), matching models/llama._attention's contract."""
    b, s, h, d = q.shape
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = flash_attention(qt.astype(kt.dtype), kt, vt, causal=causal,
                          interpret=interpret)
    return jnp.swapaxes(out, 1, 2).reshape(b, s, h * d).astype(jnp.float32)
