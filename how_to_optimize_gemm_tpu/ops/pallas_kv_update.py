"""In-place KV-cache writes — removing the decode step's convert/copy tax.

The round-3 batch-1 decode trace (RESULTS.md, spec-economics section)
measured ~3.3 ms/step of FULL-cache traffic from the XLA cache-update
lowering: at decode shapes the update is a scatter / dynamic-update-slice
on a (B, T, KVH, D) operand, and XLA's lowering materializes whole-cache
copies around it (copy-on-write of the non-donated operand plus, at 7B
widths, a convert round trip visible in HLO) — 64 of them per step at
32 layers. The reference's discipline applies: overhead that is measured
gets scheduled away (the load/compute interleave work of its hand rungs;
SURVEY.md §2 pipelining slot).

These kernels make the write WHAT IT PHYSICALLY IS: a handful of tiny
DMAs into an HBM-resident buffer the kernel owns in place
(``input_output_aliases``), never streaming or copying the cache itself.

- ``kv_update``: contiguous (B, T, ...) caches — one program per slot,
  one async row copy per new token at that slot's position. Rows that
  land out of range (pos + i outside [0, T)) are skipped PER ROW —
  exactly the scatter path's element-wise drop semantics (a slot whose
  speculative window crosses max_seq keeps its in-range rows and drops
  the rest; a finished slot scanning past max_seq writes nothing).
- ``paged_kv_update``: page-pool caches — per-token row DMAs routed by
  precomputed (page, offset) pairs; page 0 (the trash page, see
  ops/pallas_paged_attention) is skipped instead of written.

Both take a write mask (the batched-prefill mechanism) as a prefetched
scalar and skip masked slots — the aliased output then simply keeps the
old bytes, replacing the jnp.where full-cache select the XLA path needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _kernel_contig(s: int, t: int, pos_ref, msk_ref, new_ref, cache_any,
                   out_any, sem):
    b = pl.program_id(0)
    p = pos_ref[b]
    for i in range(s):
        @pl.when((msk_ref[b] != 0) & (p + i >= 0) & (p + i < t))
        def _():
            cp = pltpu.make_async_copy(new_ref.at[0, i],
                                       out_any.at[b, p + i], sem)
            cp.start()
            cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kv_update_call(cache, new, pos, mask, interpret=False):
    b, t = cache.shape[:2]
    s = new.shape[1]
    rest = cache.shape[2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s) + rest,
                         lambda i, *_: (i,) + (0,) * (1 + len(rest)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_kernel_contig, s, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # inputs: [pos, mask, new, cache] — cache aliases the output
        input_output_aliases={3: 0},
        interpret=interpret,
    )(pos, mask, new.astype(cache.dtype), cache)


def row_width(shape) -> int:
    """Flattened per-token row width of a (B, T, *rest) cache."""
    w = 1
    for d in shape[2:]:
        w *= d
    return w


def kernel_supported(shape, dtype) -> bool:
    """Can the compiled kernel serve this cache layout? The per-token
    row is reshaped to (row//128, 128) — the tiled (sublane, lane)
    pair the DMA copies whole — so the row must be a 128-multiple AND
    its sublane count a multiple of the dtype's packing (bf16 packs 2
    sublanes per word, int8 4; chip-caught: a logical sublane dim not
    aligned to the packing cannot be sliced). Every served width
    passes (7B bf16: row 4096 -> 32 sublanes; d_head-64 GQA: 512 -> 4;
    KV8 f32 scales: 128 -> 1 at packing 1)."""
    row = row_width(shape)
    if row % 128:
        return False
    packing = max(1, 4 // jnp.dtype(dtype).itemsize)
    return (row // 128) % packing == 0


def kv_update(cache, new, pos, write_mask=None, interpret=None):
    """cache (B, T, *rest) <- new (B, S, *rest) at per-slot position
    ``pos`` ((B,) int32 or scalar), IN PLACE (aliased output; the input
    buffer must be dead after this call — true inside decode steps,
    where the old cache value has no other reader).

    The trailing dims are reshaped to (row//128, 128) before the kernel
    (free: the cache is dense row-major) — the tiled (sublane, lane)
    pair Mosaic requires the DMA slice keep whole AND aligned
    (chip-caught twice: a (8, 64) head-dim-64 row misaligns the lane
    dim; a (1, row) bf16 row misaligns the 2-sublane packing). Callers
    gate on ``kernel_supported``; per-token slicing then only touches
    untiled leading dims.

    Semantics match models.llama._update_cache exactly: rows landing
    outside [0, T) are dropped per row, like the scatter path."""
    b, t = cache.shape[:2]
    posv = (jnp.full((b,), pos, jnp.int32) if jnp.ndim(pos) == 0
            else pos.astype(jnp.int32))
    mask = (jnp.ones((b,), jnp.int32) if write_mask is None
            else write_mask.astype(jnp.int32))
    if interpret is None:
        interpret = default_interpret()
    sub = row_width(cache.shape) // 128
    flat = _kv_update_call(cache.reshape(b, t, sub, 128),
                           new.reshape(b, new.shape[1], sub, 128),
                           posv, mask, interpret=interpret)
    return flat.reshape(cache.shape)


def _kernel_paged(s: int, tab_ref, msk_ref, new_ref, pool_any, out_any,
                  sem):
    b = pl.program_id(0)
    for i in range(s):
        page = tab_ref[b, i, 0]
        off = tab_ref[b, i, 1]

        @pl.when((msk_ref[b] != 0) & (page > 0))
        def _():
            cp = pltpu.make_async_copy(new_ref.at[0, i],
                                       out_any.at[page, off], sem)
            cp.start()
            cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _paged_kv_update_call(pool, new, tab, mask, interpret=False):
    b, s = new.shape[:2]
    rest = pool.shape[2:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s) + rest,
                         lambda i, *_: (i,) + (0,) * (1 + len(rest)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_kernel_paged, s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(tab, mask, new.astype(pool.dtype), pool)


def paged_kv_update(pool, new, pages, offs, write_mask=None,
                    interpret=None):
    """pool (NP, PS, *rest) <- new (B, S, *rest) row-by-row at physical
    (pages, offs) (each (B, S) int32), IN PLACE. Rows whose page id is 0
    (the trash page — masked slots, unallocated chunks) are SKIPPED
    rather than written: page 0 is never read live, so "write trash"
    and "don't write" are observably identical, and skipping saves the
    DMA. Decode/spec widths only (S small: one row DMA per token)."""
    mask = (jnp.ones((new.shape[0],), jnp.int32) if write_mask is None
            else write_mask.astype(jnp.int32))
    tab = jnp.stack([pages.astype(jnp.int32), offs.astype(jnp.int32)],
                    axis=-1)  # (B, S, 2)
    if interpret is None:
        interpret = default_interpret()
    npages, ps = pool.shape[:2]
    b, s = new.shape[:2]
    sub = row_width(pool.shape) // 128
    flat = _paged_kv_update_call(pool.reshape(npages, ps, sub, 128),
                                 new.reshape(b, s, sub, 128), tab, mask,
                                 interpret=interpret)
    return flat.reshape(pool.shape)
