"""Grouped (ragged) GEMM — the MoE expert-compute kernel.

The block-dispatch MoE (parallel/moe) pays a static-shape tax: dropless
routing needs capacity = chunk, so the expert matmuls process E/k x more
rows than were actually routed (for Mixtral: 4x). The production answer
is a GROUPED matmul over expert-sorted tokens — each expert multiplies
exactly its own contiguous row segment — which needs ragged segment
boundaries inside one traced program. That is precisely what Pallas
scalar prefetch provides (same mechanism as the length-aware decode
kernel, ops/pallas_decode_attention.py): the caller pads each expert's
segment to a block multiple and hands the kernel a per-block expert map;
the weight BlockSpec's index_map reads it, so block i streams expert
``block_expert[i]``'s weights from HBM while computing only real rows
(plus at most one partially-padded block per expert).

Cost model: tokens*k/bt + E output-row blocks instead of the dispatch
path's tokens*E/k-row expert batch — a (E/k)^2/k-class FLOP win at
prefill scale, identical weight traffic at decode scale (both stream
every expert's weights once).

The combine/sort glue lives in parallel/moe.moe_ffn_ragged (XLA argsort
+ scatter — host-free, jit-static shapes with the padded upper bound
Tp = k*T + E*bt).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from how_to_optimize_gemm_tpu.utils.env import default_interpret


def _pick_block(dim: int, cap: int) -> int:
    """Largest 128-multiple divisor of ``dim`` that is <= cap; the whole
    dim when it already fits or when no aligned divisor exists (the
    ladder's least-waste rule — a non-divisor block would force
    padding; bounds._least_waste is the same discipline)."""
    if dim <= cap:
        return dim
    b = (cap // 128) * 128
    while b >= 128:
        if dim % b == 0:
            return b
        b -= 128
    return dim


def _auto_bf(rows: int, f: int, elt: int,
             budget_mb: float = 14.0) -> int:
    """VMEM-aware weight-block width: the LARGEST 128-multiple divisor
    of f whose double-buffered (rows, bf) weight block fits the budget
    (Mosaic's fast-VMEM comfort zone, the ladder's <=14 MB law).

    Measured motivation (round 3, chip): a fixed 512 cap at d_ff=1408
    picks bf=128 (the only small 128-multiple divisor), splintering a
    T=4096 prefill into ~800 grid steps — grid-step overhead then
    dominates (the rung-03b lesson recurring) and the ragged path LOST
    to dispatch (4.92 vs 4.43 ms). Whole-f blocks (5.8 MB at d=2048)
    restore one coarse step per token block."""
    budget = budget_mb * 1024 * 1024
    for bf in range(f, 127, -128):
        if f % bf == 0 and 2 * rows * bf * elt <= budget:
            return bf
    return _pick_block(f, 512)


def _kernel(be_ref, x_ref, w_ref, s_ref, o_ref):
    del be_ref  # consumed by the index_maps
    # int8 expert stacks convert per-BLOCK in VMEM (the stack streams
    # from HBM at 1 B/elt; converting outside the pallas_call would
    # materialize a full dense copy in HBM)
    w = w_ref[0].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if s_ref is not None:
        acc = acc * s_ref[0]
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_noscale(be_ref, x_ref, w_ref, o_ref):
    _kernel(be_ref, x_ref, w_ref, None, o_ref)


def _kernel_q4(be_ref, x_ref, w_ref, s_ref, o_ref):
    """int4 expert block: packed bytes decode in VMEM — low nibble
    offset-binary, high nibble two's-complement (quant.pack_int4 with
    block_k = d, so low nibbles are rows [0, d/2) and high nibbles rows
    [d/2, d)). All shifts in int32 (int8/int16 shifts don't lower in
    Mosaic)."""
    del be_ref
    p = w_ref[0].astype(jnp.int32)                 # (d/2, bf)
    lo = ((p & 15) - 8).astype(x_ref.dtype)        # u - 8
    hi = (p >> 4).astype(x_ref.dtype)              # floor(P/16)
    w = jnp.concatenate([lo, hi], axis=0)          # (d, bf)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    if s_ref is not None:
        acc = acc * s_ref[0]
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_q4_noscale(be_ref, x_ref, w_ref, o_ref):
    _kernel_q4(be_ref, x_ref, w_ref, None, o_ref)


def _gmm_call(x, w, block_expert, scales, bt: int, bf: int,
              interpret: bool | None, packed4: bool = False):
    """Raw pallas_call wrapper (no VJP) — see grouped_matmul."""
    tp, d = x.shape
    e, dw, f = w.shape
    assert dw == (d // 2 if packed4 else d), (x.shape, w.shape, packed4)
    assert tp % bt == 0, (tp, bt)
    bf = (_auto_bf(dw, f, w.dtype.itemsize) if bf is None
          else _pick_block(f, bf))
    nb = tp // bt
    assert block_expert.shape == (nb,), (block_expert.shape, nb)

    in_specs = [
        pl.BlockSpec((bt, d), lambda i, j, be: (i, 0)),
        pl.BlockSpec((1, dw, bf), lambda i, j, be: (be[i], 0, j)),
    ]
    operands = [x, w]
    kernel = _kernel_noscale
    if scales is not None:
        assert scales.shape == (e, 1, f), scales.shape
        in_specs.append(
            pl.BlockSpec((1, 1, bf), lambda i, j, be: (be[i], 0, j)))
        operands.append(scales)
        kernel = _kernel_q4 if packed4 else _kernel
    elif packed4:
        kernel = _kernel_q4_noscale  # unscaled decode-dot (bwd remat)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, f // bf),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, bf), lambda i, j, be: (i, j)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, f), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(block_expert.astype(jnp.int32), *operands)


def _kernel_t(be_ref, x_ref, w_ref, o_ref):
    """dx block: contract over w's LAST dim (f) without a transposed
    copy of the stack — dx_i = dy_i @ w[be[i]]^T expressed as a
    dot_general with swapped contracting dims."""
    del be_ref
    w = w_ref[0].astype(x_ref.dtype)                  # (bo, f)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _gmm_call_t(x, w, block_expert, bt: int, bo_cap: int,
                interpret: bool | None):
    """Ragged y[i*bt:(i+1)*bt] = x[i*bt:(i+1)*bt] @ w[be[i]]^T.

    x (Tp, f); w (E, dout, f); returns (Tp, dout). The weight block is
    (bo, f) — full contraction dim resident; bo chosen as a divisor of
    dout under the cap."""
    tp, f = x.shape
    e, dout, fw = w.shape
    assert fw == f and tp % bt == 0, (x.shape, w.shape, bt)
    # block is (bo, f): full contraction resident, so the budget is
    # over bo rows of f columns
    bo = (_auto_bf(f, dout, w.dtype.itemsize) if bo_cap is None
          else _pick_block(dout, bo_cap))
    nb = tp // bt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, dout // bo),
        in_specs=[
            pl.BlockSpec((bt, f), lambda i, j, be: (i, 0)),
            pl.BlockSpec((1, bo, f), lambda i, j, be: (be[i], j, 0)),
        ],
        out_specs=pl.BlockSpec((bt, bo), lambda i, j, be: (i, j)),
    )
    return pl.pallas_call(
        _kernel_t,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(block_expert.astype(jnp.int32), x, w)


def _kernel_t4(nh: int, be_ref, x_ref, w_ref, o_ref):
    """dx block on a PACKED int4 stack. pack_int4 with block_k = dout
    puts W rows [0, dout/2) in low nibbles and [dout/2, dout) in high
    nibbles of the same packed rows, so output block j (W rows
    [j*bo, (j+1)*bo), bo | dout/2) lives entirely in ONE nibble of
    packed row band j % nh — a single streamed block and a single
    write, no interleaving (this is the kernel the round-2 docstring
    said would need 'two disjoint writes'; choosing bo to divide dout/2
    removes that)."""
    del be_ref
    j = pl.program_id(1)
    p = w_ref[0].astype(jnp.int32)                    # (bo, f) packed
    lo = (p & 15) - 8
    hi = p >> 4
    w = jnp.where(j < nh, lo, hi).astype(x_ref.dtype)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _gmm_call_t4(x, w, block_expert, dout: int, bt: int, bo_cap: int,
                 interpret: bool | None):
    """Ragged dx_i = dy_i @ unpack(w[be[i]])^T with the stack read in
    its PACKED form (0.5 B/elt — no dense decode in HBM).

    x (Tp, f); w (E, dout//2, f) packed nibbles; returns (Tp, dout).
    Grid is (token blocks, 2*nh output blocks): blocks [0, nh) decode
    low nibbles, [nh, 2nh) high nibbles of the same packed bands."""
    tp, f = x.shape
    e, dh, fw = w.shape
    assert fw == f and dh * 2 == dout and tp % bt == 0, (
        x.shape, w.shape, dout, bt)
    bo = (_auto_bf(f, dout // 2, w.dtype.itemsize) if bo_cap is None
          else _pick_block(dout // 2, bo_cap))
    nh = (dout // 2) // bo
    nb = tp // bt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, 2 * nh),
        in_specs=[
            pl.BlockSpec((bt, f), lambda i, j, be: (i, 0)),
            pl.BlockSpec((1, bo, f),
                         lambda i, j, be: (be[i], j % nh, 0)),
        ],
        out_specs=pl.BlockSpec((bt, bo), lambda i, j, be: (i, j)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_t4, nh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(block_expert.astype(jnp.int32), x, w)


def _dw_kernel(be_ref, x_ref, dy_ref, o_ref):
    """dW[be[i]] += x_i^T @ dy_i, accumulated across the consecutive
    same-expert blocks the sorted layout guarantees. Grid is
    (f-blocks, token-blocks) with the token dim INNERMOST so each
    output tile's revisits are consecutive (Mosaic's accumulation
    contract)."""
    i = pl.program_id(1)
    prev = be_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (be_ref[i] != prev)
    contrib = jax.lax.dot_general(
        x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (d, bf)

    @pl.when(first)
    def _init():
        o_ref[0] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        o_ref[0] += contrib


def _grouped_dw(x, dy, block_expert, e: int, bt: int, bf: int,
                interpret: bool | None):
    """(E, d, f) fp32 = segment-sum of per-block outer products.
    Requires every expert to own >= 1 block (the layout guarantees it)
    so no output tile is left unwritten."""
    tp, d = x.shape
    f = dy.shape[1]
    # the dW out block is (1, d, bf) fp32 and revisited — budget it
    bf = (_auto_bf(d, f, 4) if bf is None else _pick_block(f, bf))
    nb = tp // bt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f // bf, nb),
        in_specs=[
            pl.BlockSpec((bt, d), lambda j, i, be: (i, 0)),
            pl.BlockSpec((bt, bf), lambda j, i, be: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, d, bf),
                               lambda j, i, be: (be[i], 0, j)),
    )
    return pl.pallas_call(
        _dw_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, d, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=default_interpret(interpret),
    )(block_expert.astype(jnp.int32), x, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gmm_dense(x, w, block_expert, bt, bf, interpret):
    return _gmm_call(x, w, block_expert, None, bt, bf, interpret)


def _gmm_dense_fwd(x, w, block_expert, bt, bf, interpret):
    y = _gmm_call(x, w, block_expert, None, bt, bf, interpret)
    return y, (x, w, block_expert)


def _gmm_dense_bwd(bt, bf, interpret, res, dy):
    import numpy as np
    x, w, block_expert = res
    # dx_i = dy_i @ w[be[i]]^T — transposed-contraction kernel reading
    # the stack in place (a w.transpose() here would materialize an
    # (E, f, d) copy in HBM every backward step)
    dx = _gmm_call_t(dy, w, block_expert, bt, bf, interpret)
    dw = _grouped_dw(x.astype(dy.dtype), dy, block_expert, w.shape[0],
                     bt, bf, interpret)
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            np.zeros(block_expert.shape, jax.dtypes.float0))


_gmm_dense.defvjp(_gmm_dense_fwd, _gmm_dense_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gmm_q8(x, w, scales, block_expert, bt, bf, interpret):
    return _gmm_call(x, w, block_expert, scales, bt, bf, interpret)


def _gmm_q8_fwd(x, w, scales, block_expert, bt, bf, interpret):
    y = _gmm_call(x, w, block_expert, scales, bt, bf, interpret)
    return y, (x, w, scales, block_expert)


def _gmm_q8_bwd(bt, bf, interpret, res, dy):
    """QLoRA-style backward for y = (x @ Wq[be]) * s[be]: the int8
    stack is frozen (float0 cotangent); x and the scales train.

    dx folds the scales into dy rows, then runs the transposed-
    contraction kernel on the int8 stack in place; ds is a segment
    reduction of dy ⊙ u over each expert's rows, with u = x @ Wq
    recomputed (remat-style: cheaper than holding a (Tp, f) residual
    across the whole backward)."""
    import numpy as np
    x, w, scales, block_expert = res
    row_expert = jnp.repeat(block_expert, x.shape[0]
                            // block_expert.shape[0])          # (Tp,)
    s_rows = scales[row_expert, 0, :]                          # (Tp, f)
    dys = (dy.astype(jnp.float32) * s_rows).astype(dy.dtype)
    dx = _gmm_call_t(dys, w, block_expert, bt, bf, interpret)
    u = _gmm_call(x, w, block_expert, None, bt, bf, interpret)
    ds = jax.ops.segment_sum(
        dy.astype(jnp.float32) * u.astype(jnp.float32),
        row_expert, num_segments=scales.shape[0])              # (E, f)
    return (dx.astype(x.dtype),
            np.zeros(w.shape, jax.dtypes.float0),
            ds[:, None, :].astype(scales.dtype),
            np.zeros(block_expert.shape, jax.dtypes.float0))


_gmm_q8.defvjp(_gmm_q8_fwd, _gmm_q8_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gmm_q4(x, w, scales, block_expert, bt, bf, interpret):
    return _gmm_call(x, w, block_expert, scales, bt, bf, interpret,
                     packed4=True)


def _gmm_q4_fwd(x, w, scales, block_expert, bt, bf, interpret):
    y = _gmm_call(x, w, block_expert, scales, bt, bf, interpret,
                  packed4=True)
    return y, (x, w, scales, block_expert)


def _gmm_q4_bwd(bt, bf, interpret, res, dy):
    """QLoRA-style backward for the PACKED int4 stack (mirrors
    _gmm_q8_bwd): the nibble stack is frozen (float0), x and the scales
    train. dx folds the scales into dy rows then contracts the packed
    stack in place (_gmm_call_t4 — one nibble band per output block);
    ds recomputes u = x @ unpack(W) through the unscaled packed kernel
    and segment-reduces dy ⊙ u per expert."""
    import numpy as np
    x, w, scales, block_expert = res
    dout = w.shape[1] * 2
    row_expert = jnp.repeat(block_expert, x.shape[0]
                            // block_expert.shape[0])          # (Tp,)
    s_rows = scales[row_expert, 0, :]                          # (Tp, f)
    dys = (dy.astype(jnp.float32) * s_rows).astype(dy.dtype)
    dx = _gmm_call_t4(dys, w, block_expert, dout, bt, bf, interpret)
    u = _gmm_call(x, w, block_expert, None, bt, bf, interpret,
                  packed4=True)
    ds = jax.ops.segment_sum(
        dy.astype(jnp.float32) * u.astype(jnp.float32),
        row_expert, num_segments=scales.shape[0])              # (E, f)
    return (dx.astype(x.dtype),
            np.zeros(w.shape, jax.dtypes.float0),
            ds[:, None, :].astype(scales.dtype),
            np.zeros(block_expert.shape, jax.dtypes.float0))


_gmm_q4.defvjp(_gmm_q4_fwd, _gmm_q4_bwd)


@functools.partial(jax.jit, static_argnames=("bt", "bf", "interpret",
                                             "packed4"))
def grouped_matmul(x, w, block_expert, scales=None, *, bt: int = 128,
                   bf: int | None = None, packed4: bool = False,
                   interpret: bool | None = None):
    """Ragged y[i*bt:(i+1)*bt] = x[i*bt:(i+1)*bt] @ w[block_expert[i]].

    x (Tp, d) expert-sorted tokens (segments bt-aligned, zero-padded);
    w (E, d, f) expert stacks; block_expert (Tp//bt,) int32 scalar-
    prefetch map; optional ``scales`` (E, 1, f) applied per output
    column (the int8 expert-stack epilogue). d and f must be lane/
    sublane friendly (f % 128 == 0, d % 8 == 0); bf caps the streamed
    weight block (d*bf*elt bytes of VMEM per step) — None (default)
    picks the VMEM-aware width (_auto_bf: whole f when the double-
    buffered block fits ~14 MB, else the largest fitting divisor).

    Every form is DIFFERENTIABLE. Dense (scales=None): custom VJP — dx
    is the transposed grouped matmul, dW a revisited-output segment-sum
    kernel over the sorted blocks. Scaled int8 and packed int4:
    QLoRA-style — the quantized stack is frozen (float0 cotangent), x
    and the scales get gradients; dx streams the stack in its stored
    form (int8 via the transposed-contraction kernel, packed nibbles
    via _gmm_call_t4 with output blocks dividing dout/2 so each block
    reads exactly one nibble band). ``packed4=True`` takes w as
    (E, d//2, f) packed nibbles (quant.pack_int4 with block_k = d) and
    decodes per block in VMEM — 0.5 B/elt of weight HBM traffic."""
    if packed4:
        assert scales is not None, "packed4 requires scales (E, 1, f)"
        return _gmm_q4(x, w, scales, block_expert, bt, bf, interpret)
    if scales is None:
        return _gmm_dense(x, w, block_expert, bt, bf, interpret)
    return _gmm_q8(x, w, scales, block_expert, bt, bf, interpret)
