"""Tensor-parallel quantized GEMM over a device mesh.

The serving slice's building block: the ladder's int8/int4 kernels wrapped
in ``shard_map`` so each device multiplies its weight shard and XLA
collectives stitch the result over ICI. Two classic layouts (the
column/row-parallel pair every TP transformer uses):

- column-parallel: W sharded on N. No collective on the forward —
  activations are replicated, outputs stay sharded (feeds a row-parallel
  layer).
- row-parallel: W sharded on K, activations sharded on K; a ``psum``
  over the tp axis reduces the partial products (rides ICI).

The kernels run *per shard*, so all the single-chip ladder work carries
over unchanged — this module adds only layout + collectives, which is the
entire TPU-native content of "distributed GEMM" (SURVEY.md §2.6).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from how_to_optimize_gemm_tpu.ops import pallas_int8, pallas_int4, quant


def _local_int8_mmult(qa, sa, qb, sb, interpret):
    return pallas_int8.mmult_q_noc(qa, sa, qb, sb, interpret=interpret)


def column_parallel_int8(x, qw, sw, mesh: Mesh, axis: str = "tp",
                         interpret: bool | None = None):
    """y = x @ dequant(W), W int8 sharded on its output (N) axis.

    x: (M, K) fp32 replicated; qw: (K, N) int8; sw: (1, N) f32.
    Returns y sharded on N over ``axis``. Activations are quantized
    per-row locally (dynamic activation quant, chgemm-style).
    """
    def shard_fn(x, qw, sw):
        qa, sa = quant.quantize_symmetric(x, axis=1)
        return _local_int8_mmult(qa, sa, qw, sw, interpret)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(x, qw, sw)


def row_parallel_int8(x, qw, sw, mesh: Mesh, axis: str = "tp",
                      interpret: bool | None = None):
    """y = x @ dequant(W), W int8 sharded on its input (K) axis; the
    partial products are psum-reduced over ICI.

    x: (M, K) sharded on K; qw: (K, N) int8 sharded on K; sw: (1, N).
    Returns y replicated.
    """
    def shard_fn(x, qw, sw):
        qa, sa = quant.quantize_symmetric(x, axis=1)
        y = _local_int8_mmult(qa, sa, qw, sw, interpret)
        return jax.lax.psum(y, axis)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )(x, qw, sw)


def column_parallel_int4(x, packed, sw, mesh: Mesh, axis: str = "tp",
                         interpret: bool | None = None):
    """y = x @ dequant(W4): int4 weight-only, W sharded on N.

    x: (M, K) fp32/bf16 replicated; packed: (K//2, N) int8 (pack_int4
    layout, ops/quant.py); sw: (1, N) f32.
    """
    def shard_fn(x, packed, sw):
        return pallas_int4.mmult_q_noc(x.astype(jnp.bfloat16), packed, sw,
                                       interpret=interpret)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(x, packed, sw)


