"""Pipeline parallelism (GPipe over a mesh axis) — the PP capability slot.

SURVEY.md §2.6 records that the reference has NO inter-device
parallelism of any kind; the TP/DP slots were filled in round 1
(sharding.py) and the sequence/context slot by ring_attention.py. This
module fills the remaining classic axis: PIPELINE parallelism, which on
TPU is the cross-chip edition of the ladder's software-pipelining rungs
(cuda_8/11/12, 4x4_17/21 — overlap the next tile's transfer with the
current tile's compute): consecutive layer groups live on consecutive
devices, microbatch activations hop stage→stage over ICI via
``lax.ppermute``, and while microbatch i computes on stage s, microbatch
i+1 computes on stage s-1.

Shape of the schedule (GPipe, fill-and-drain): with ``pp`` stages and
``M`` microbatches the loop runs ``M + pp - 1`` ticks; every stage runs
the SAME traced computation every tick (XLA requirement: one program,
no data-dependent control flow) and bubble ticks are masked out by
``jnp.where`` on the stage/tick predicate. Useful-work fraction is
M/(M+pp-1) — the standard GPipe bubble; callers pick M >> pp.

Everything is differentiable: ``ppermute``'s transpose is the reverse
permutation, masked writes carry zero cotangent in bubble ticks, so
``jax.grad`` through ``pipeline_apply`` yields exactly the serial
gradients (tests/test_pipeline.py asserts this to 1e-6).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(stage_params: Sequence[Any]):
    """Stack per-stage parameter pytrees into leading-axis-``pp`` leaves.

    Every stage must have the same tree structure and leaf shapes (the
    uniform-stage requirement of a masked one-program pipeline)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_params)


def shard_stacked(stacked, mesh: Mesh, axis: str = "pp"):
    """Place stacked stage params so each device holds its own stage."""
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P(axis))),
        stacked)


def _pp_local(params, x, *, stage_fn, axis: str, n_micro: int,
              with_aux: bool = False):
    """shard_map body: x is the REPLICATED (B, ...) global batch; params
    leaves are this device's (1, ...) stage slice.

    with_aux=True: stage_fn returns (y, aux_scalar); each microbatch's
    aux accumulates ALONGSIDE its activation as it hops stage to stage
    (reset to 0 where stage 0 ingests, summed at retirement), so drain
    recomputations never leak into the total — exactly the ticks whose
    activations retire contribute aux."""
    pp = lax.axis_size(axis)
    me = lax.axis_index(axis)
    params = jax.tree.map(lambda p: p[0], params)
    b = x.shape[0]
    mb = b // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])

    # Initial carries must be typed as varying over the pipeline axis
    # (they become varying after the first ppermute/where); derive them
    # from axis_index as ring_attention.py does for its online-softmax
    # carries.
    vary = (me * 0 + 1).astype(x.dtype)
    state = jnp.zeros_like(xm[0]) * vary        # activation in flight
    aux_state = jnp.float32(me * 0)             # aux riding with it
    aux_total = jnp.float32(me * 0)
    outbuf = jnp.zeros_like(xm) * vary
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def body(carry, t):
        state, aux_state, outbuf, aux_total = carry
        # stage 0 ingests microbatch t (clipped during drain: those
        # extra computations never reach outbuf, so their cotangent is
        # zero and gradients stay exact)
        inp = xm[jnp.minimum(t, n_micro - 1)]
        cur = jnp.where(me == 0, inp, state)
        aux_cur = jnp.where(me == 0, 0.0, aux_state)
        if with_aux:
            y, aux_s = stage_fn(params, cur)
            aux_y = aux_cur + aux_s.astype(jnp.float32)
        else:
            y = stage_fn(params, cur)
            aux_y = aux_cur
        # the LAST stage retires microbatch t-(pp-1) at tick t
        oidx = jnp.clip(t - (pp - 1), 0, n_micro - 1)
        valid = (me == pp - 1) & (t >= pp - 1)
        upd = lax.dynamic_update_index_in_dim(
            outbuf, y.astype(outbuf.dtype), oidx, 0)
        outbuf = jnp.where(valid, upd, outbuf)
        aux_total = aux_total + jnp.where(valid, aux_y, 0.0)
        # hop the activation (and its aux) to the next stage (ICI
        # neighbor on a real slice — the tp-innermost device order of
        # make_axis_mesh)
        state = lax.ppermute(y, axis, perm)
        aux_state = lax.ppermute(aux_y, axis, perm)
        return (state, aux_state, outbuf, aux_total), None

    ticks = jnp.arange(n_micro + pp - 1)
    (_, _, outbuf, aux_total), _ = lax.scan(
        body, (state, aux_state, outbuf, aux_total), ticks)
    # only the last stage holds real outputs; psum replicates them
    # (every other stage contributes zeros)
    outbuf = jnp.where(me == pp - 1, outbuf, jnp.zeros_like(outbuf))
    outbuf = lax.psum(outbuf, axis)
    out = outbuf.reshape(b, *outbuf.shape[2:])
    if not with_aux:
        return out
    aux_total = lax.psum(
        jnp.where(me == pp - 1, aux_total, 0.0), axis)
    return out, aux_total / n_micro             # mean over microbatches


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params, x: jnp.ndarray, mesh: Mesh,
                   axis: str = "pp", n_micro: int = 8,
                   with_aux: bool = False):
    """Apply ``stage_{pp-1} ∘ … ∘ stage_0`` to ``x``, pipelined over
    ``mesh[axis]``.

    ``stage_fn(stage_params, x) -> y`` must preserve x's shape/dtype
    (uniform stages); ``stacked_params`` leaves carry a leading ``pp``
    axis (see stack_stages). ``x`` is (B, ...) with B divisible by
    ``n_micro``. Differentiable in both arguments.

    with_aux=True: ``stage_fn`` returns ``(y, aux_scalar)`` instead and
    pipeline_apply returns ``(out, aux)`` where aux is the
    microbatch-mean of each microbatch's stage-summed aux (the MoE
    load-balance channel — per-microbatch scalars ride the pipeline
    alongside the activations)."""
    pp = mesh.shape[axis]
    assert x.shape[0] % n_micro == 0, (x.shape, n_micro)
    bad = [l.shape for l in jax.tree.leaves(stacked_params)
           if l.shape[:1] != (pp,)]
    assert not bad, f"every leaf needs leading pp={pp} axis, got {bad}"
    fn = jax.shard_map(
        functools.partial(_pp_local, stage_fn=stage_fn, axis=axis,
                          n_micro=n_micro, with_aux=with_aux),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()) if with_aux else P())
    return fn(stacked_params, x)


# ---------------------------------------------------------------------------
# Flagship-model integration: llama layers grouped into pipeline stages.

def llama_stack_layers(params, pp: int):
    """Group ``params['layers']`` into ``pp`` equal stages and stack.

    Returns a LIST (one entry per layer-position within a stage) of
    layer-dict pytrees whose leaves have a leading ``pp`` axis: entry j,
    stage s holds original layer ``s*per + j``."""
    layers = params["layers"]
    assert len(layers) % pp == 0, (len(layers), pp)
    per = len(layers) // pp
    return [stack_stages([layers[s * per + j] for s in range(pp)])
            for j in range(per)]


def llama_pp_forward(params, cfg, tokens: jnp.ndarray, mesh: Mesh,
                     axis: str = "pp", n_micro: int = 4,
                     use_pallas: bool | None = False,
                     remat: bool = False,
                     return_moe_aux: bool = False):
    """Pipeline-parallel full-sequence forward: (B, S) -> (B, S, vocab).

    Embedding, final norm and lm_head are replicated (they are a few
    percent of 7B-class FLOPs); the transformer stack runs through
    ``pipeline_apply`` with ``n_layers/pp`` layers per stage. Matches
    ``llama.forward`` to 2e-5 in fp32 (tests/test_pipeline.py — the
    microbatched/masked schedule may reassociate fp32 adds, so exact
    bitwise equality is not guaranteed). ``use_pallas``/``remat`` plumb
    through to the per-layer blocks exactly as in ``llama.forward``
    (use_pallas=None auto-routes to the Pallas kernels on chip;
    the CPU-mesh tests pass False)."""
    from how_to_optimize_gemm_tpu.models import llama

    pp = mesh.shape[axis]
    b, s = tokens.shape
    x = params["embed"][tokens]
    cos, sin = llama._rope_freqs(cfg, jnp.arange(s))
    mask = jnp.tril(jnp.ones((s, s), bool))
    stacked = llama_stack_layers(params, pp)

    def one_block(layer, x):
        out, _, aux = llama._block(layer, cfg, x, cos, sin, mask=mask,
                                   use_pallas=use_pallas)
        return out, aux

    if remat:
        one_block = jax.checkpoint(one_block)

    def stage_fn(stage_layers, x):
        aux = jnp.float32(0.0)
        for layer in stage_layers:
            x, a = one_block(layer, x)
            aux = aux + a
        return x, aux

    # stack_stages returned a list of stacked layer dicts; bundle it as
    # one pytree so pipeline_apply sees a single params argument
    x, aux = pipeline_apply(stage_fn, stacked, x, mesh, axis=axis,
                            n_micro=n_micro, with_aux=True)
    x = llama.rmsnorm(x, params["out_norm"], cfg.norm_eps)
    logits = llama.apply_linear(params["lm_head"], x, use_pallas)
    if return_moe_aux:
        # mean per layer, matching llama.forward(return_moe_aux=True);
        # NOTE the microbatch mean: moe chunking sees mb*s tokens per
        # call, so MoE aux equals mean-of-per-microbatch losses (the
        # single-device full-batch aux differs by chunk partitioning)
        return logits, aux / max(1, len(params["layers"]))
    return logits


def make_pp_train_step(cfg, mesh: Mesh, axis: str = "pp",
                       n_micro: int = 4, lr: float = 1e-2,
                       use_pallas: bool | None = False,
                       remat: bool = False):
    """jit-compiled pipeline-parallel SGD step on the flagship model.

    Gradients through the GPipe schedule are exact (pipeline_apply), so
    this step's loss/updates match the single-device step on the same
    tokens — asserted in tests/test_pipeline.py. MoE configs include
    the load-balance aux (cfg.moe_aux_weight), computed per microbatch
    and averaged — equal to the mean of per-microbatch single-device
    losses (the full-batch aux differs slightly by chunk partitioning).
    Returns ``step(params, tokens) -> (params, loss)``; params stay in
    the plain llama layout (stacking happens inside the traced
    function, so checkpoints and the other parallel layers see the
    standard tree)."""
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.training import (
        sgd_update, split_trainable)

    def loss_of_params(params, tokens):
        logits, aux = llama_pp_forward(params, cfg, tokens[:, :-1],
                                       mesh, axis=axis, n_micro=n_micro,
                                       use_pallas=use_pallas,
                                       remat=remat, return_moe_aux=True)
        loss = llama.token_nll(logits, tokens[:, 1:])
        if cfg.n_experts > 0:
            loss = loss + cfg.moe_aux_weight * aux
        return loss

    @jax.jit
    def step(params, tokens):
        all_leaves = jax.tree.leaves(params)
        floats, rebuild = split_trainable(params)

        def loss_of(floats):
            return loss_of_params(rebuild(floats, all_leaves), tokens)

        loss, grads = jax.value_and_grad(loss_of)(floats)
        return rebuild(sgd_update(floats, grads, lr), all_leaves), loss

    return step
