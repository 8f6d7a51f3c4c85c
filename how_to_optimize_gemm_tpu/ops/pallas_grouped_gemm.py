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


def _kernel(be_ref, x_ref, w_ref, s_ref, o_ref):
    del be_ref  # consumed by the index_maps
    acc = jnp.dot(x_ref[:], w_ref[0],
                  preferred_element_type=jnp.float32)
    if s_ref is not None:
        acc = acc * s_ref[0]
    o_ref[:] = acc.astype(o_ref.dtype)


def _kernel_noscale(be_ref, x_ref, w_ref, o_ref):
    _kernel(be_ref, x_ref, w_ref, None, o_ref)


@functools.partial(jax.jit, static_argnames=("bt", "bf", "interpret"))
def grouped_matmul(x, w, block_expert, scales=None, *, bt: int = 128,
                   bf: int = 512, interpret: bool | None = None):
    """Ragged y[i*bt:(i+1)*bt] = x[i*bt:(i+1)*bt] @ w[block_expert[i]].

    x (Tp, d) expert-sorted tokens (segments bt-aligned, zero-padded);
    w (E, d, f) expert stacks; block_expert (Tp//bt,) int32 scalar-
    prefetch map; optional ``scales`` (E, 1, f) applied per output
    column (the int8 expert-stack epilogue). d and f must be lane/
    sublane friendly (f % 128 == 0, d % 8 == 0); bf caps the streamed
    weight block (d*bf*elt bytes of VMEM per step)."""
    tp, d = x.shape
    e, dw, f = w.shape
    assert dw == d and tp % bt == 0, (x.shape, w.shape, bt)
    bf = min(bf, f)
    assert f % bf == 0, (f, bf)
    nb = tp // bt
    assert block_expert.shape == (nb,), (block_expert.shape, nb)

    in_specs = [
        pl.BlockSpec((bt, d), lambda i, j, be: (i, 0)),
        pl.BlockSpec((1, d, bf), lambda i, j, be: (be[i], 0, j)),
    ]
    operands = [x, w]
    kernel = _kernel_noscale
    if scales is not None:
        assert scales.shape == (e, 1, f), scales.shape
        in_specs.append(
            pl.BlockSpec((1, 1, bf), lambda i, j, be: (be[i], 0, j)))
        operands.append(scales)
        kernel = _kernel

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
