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


def _pp_local(params, x, *, stage_fn, axis: str, n_micro: int):
    """shard_map body: x is the REPLICATED (B, ...) global batch; params
    leaves are this device's (1, ...) stage slice."""
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
    outbuf = jnp.zeros_like(xm) * vary
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def body(carry, t):
        state, outbuf = carry
        # stage 0 ingests microbatch t (clipped during drain: those
        # extra computations never reach outbuf, so their cotangent is
        # zero and gradients stay exact)
        inp = xm[jnp.minimum(t, n_micro - 1)]
        cur = jnp.where(me == 0, inp, state)
        y = stage_fn(params, cur)
        # the LAST stage retires microbatch t-(pp-1) at tick t
        oidx = jnp.clip(t - (pp - 1), 0, n_micro - 1)
        valid = (me == pp - 1) & (t >= pp - 1)
        upd = lax.dynamic_update_index_in_dim(
            outbuf, y.astype(outbuf.dtype), oidx, 0)
        outbuf = jnp.where(valid, upd, outbuf)
        # hop the activation to the next stage (ICI neighbor on a real
        # slice — the tp-innermost device order of make_axis_mesh)
        state = lax.ppermute(y, axis, perm)
        return (state, outbuf), None

    ticks = jnp.arange(n_micro + pp - 1)
    (_, outbuf), _ = lax.scan(body, (state, outbuf), ticks)
    # only the last stage holds real outputs; psum replicates them
    # (every other stage contributes zeros)
    outbuf = jnp.where(me == pp - 1, outbuf, jnp.zeros_like(outbuf))
    outbuf = lax.psum(outbuf, axis)
    return outbuf.reshape(b, *outbuf.shape[2:])


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params, x: jnp.ndarray, mesh: Mesh,
                   axis: str = "pp", n_micro: int = 8) -> jnp.ndarray:
    """Apply ``stage_{pp-1} ∘ … ∘ stage_0`` to ``x``, pipelined over
    ``mesh[axis]``.

    ``stage_fn(stage_params, x) -> y`` must preserve x's shape/dtype
    (uniform stages); ``stacked_params`` leaves carry a leading ``pp``
    axis (see stack_stages). ``x`` is (B, ...) with B divisible by
    ``n_micro``. Differentiable in both arguments."""
    pp = mesh.shape[axis]
    assert x.shape[0] % n_micro == 0, (x.shape, n_micro)
    bad = [l.shape for l in jax.tree.leaves(stacked_params)
           if l.shape[:1] != (pp,)]
    assert not bad, f"every leaf needs leading pp={pp} axis, got {bad}"
    fn = jax.shard_map(
        functools.partial(_pp_local, stage_fn=stage_fn, axis=axis,
                          n_micro=n_micro),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P())
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
                     remat: bool = False) -> jnp.ndarray:
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
        return llama._block(layer, cfg, x, cos, sin, mask=mask,
                            use_pallas=use_pallas)[0]

    if remat:
        one_block = jax.checkpoint(one_block)

    def stage_fn(stage_layers, x):
        for layer in stage_layers:
            x = one_block(layer, x)
        return x

    # stack_stages returned a list of stacked layer dicts; bundle it as
    # one pytree so pipeline_apply sees a single params argument
    x = pipeline_apply(stage_fn, stacked, x, mesh, axis=axis,
                       n_micro=n_micro)
    x = llama.rmsnorm(x, params["out_norm"], cfg.norm_eps)
    return llama.apply_linear(params["lm_head"], x, use_pallas)


def make_pp_train_step(cfg, mesh: Mesh, axis: str = "pp",
                       n_micro: int = 4, lr: float = 1e-2,
                       use_pallas: bool | None = False,
                       remat: bool = False):
    """jit-compiled pipeline-parallel SGD step on the flagship model.

    Gradients through the GPipe schedule are exact (pipeline_apply), so
    this step's loss/updates match the single-device step on the same
    tokens — asserted in tests/test_pipeline.py. Returns
    ``step(params, tokens) -> (params, loss)``; params stay in the
    plain llama layout (stacking happens inside the traced function, so
    checkpoints and the other parallel layers see the standard tree)."""
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.training import split_trainable

    def loss_of_params(params, tokens):
        logits = llama_pp_forward(params, cfg, tokens[:, :-1], mesh,
                                  axis=axis, n_micro=n_micro,
                                  use_pallas=use_pallas, remat=remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, tokens[:, 1:][..., None], -1)
        return jnp.mean(nll)

    @jax.jit
    def step(params, tokens):
        all_leaves = jax.tree.leaves(params)
        floats, rebuild = split_trainable(params)

        def loss_of(floats):
            return loss_of_params(rebuild(floats, all_leaves), tokens)

        loss, grads = jax.value_and_grad(loss_of)(floats)
        floats = [(p - lr * g.astype(p.dtype)).astype(p.dtype)
                  for p, g in zip(floats, grads)]
        return rebuild(floats, all_leaves), loss

    return step
