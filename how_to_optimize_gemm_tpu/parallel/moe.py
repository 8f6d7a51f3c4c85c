"""Expert parallelism (top-k routed MoE over a mesh axis) — the EP slot.

SURVEY.md §2.6's accounting: the reference has no inter-device
parallelism; DP/TP (sharding.py), SP/CP (ring_attention.py) and PP
(pipeline.py) fill the other slots. This module supplies EP, the one
whose signature collective is ``all_to_all``: experts live sharded over
the ``ep`` mesh axis, tokens are routed to their top-k experts through
fixed-capacity dispatch buffers, and two tiled all_to_alls (one out, one
back) ride ICI — the cross-chip traffic pattern every production MoE
(GShard/Switch/Mixtral-style) is built on.

TPU-first constraints shape the design exactly like the GEMM ladder's
kernels shaped theirs:

- **Static shapes**: routing is data-dependent, but XLA needs one traced
  program — so dispatch is a dense (tokens, experts, capacity) one-hot
  (GShard's trick), built from cumsum positions, and tokens past an
  expert's capacity are DROPPED (their gate weight contributes nothing;
  callers size ``capacity_factor`` so drops are rare). No gather/scatter
  with data-dependent sizes anywhere.
- **MXU-friendly compute**: dispatch/combine are einsums and each local
  expert's FFN is one batched (E_local, n*C, d) matmul pair — large,
  dense, bf16-able.
- **First-choice priority**: the k routing choices are processed
  first-choices-first when queueing for capacity, so a token's primary
  expert is the last to drop it.

``moe_ffn`` is differentiable end to end (all_to_all's transpose is the
reverse all_to_all); tests/test_moe.py asserts exact equality with a
dense per-token reference at no-drop capacity, gradient flow, and the
drop semantics at capacity 1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def init_moe_params(key: jax.Array, d_model: int, d_ff: int,
                    n_experts: int, dtype=jnp.float32,
                    swiglu: bool = False) -> dict:
    """Router + stacked expert FFN weights.

    Default experts are relu MLPs (d -> f -> d); ``swiglu=True`` makes
    them llama-family SwiGLU experts (gate/up/down — the Mixtral
    shape), selected at apply time by the presence of ``w_gate``."""
    kr, ki, ko = jax.random.split(key, 3)
    # folded (not a 4-way split) so pre-existing relu-MoE seeds keep
    # producing the exact same router/w_in/w_out streams
    kg = jax.random.fold_in(key, 3)
    s_in = d_model ** -0.5
    s_out = d_ff ** -0.5
    params = {
        "router": (jax.random.normal(kr, (d_model, n_experts)) * s_in
                   ).astype(dtype),
        "w_in": (jax.random.normal(ki, (n_experts, d_model, d_ff))
                 * s_in).astype(dtype),
        "w_out": (jax.random.normal(ko, (n_experts, d_ff, d_model))
                  * s_out).astype(dtype),
    }
    if swiglu:
        params["w_gate"] = (jax.random.normal(
            kg, (n_experts, d_model, d_ff)) * s_in).astype(dtype)
    return params


def _route(logits: jnp.ndarray, k: int, capacity: int, valid=None):
    """Top-k routing with fixed-capacity queueing.

    logits (T, E) -> dispatch (T, E, C) one-hot, combine (T, E, C)
    gate-weighted, aux load-balance loss (GShard §2.2: E * mean_e
    fraction_e * prob_e; 1.0 at perfect balance). ``valid`` (T,) bool
    masks padding tokens: they neither consume capacity nor count in
    the aux statistics."""
    t, e = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate_vals, choice = lax.top_k(probs, k)                  # (T, k)
    # renormalize the kept gates so each token's weights sum to 1
    gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)

    # queue for capacity first-choices-first: flatten (k, T) so all
    # primary choices precede all secondary ones in the cumsum order
    flat_choice = choice.T.reshape(-1)                       # (k*T,)
    onehot = jax.nn.one_hot(flat_choice, e, dtype=jnp.int32)  # (kT, E)
    if valid is not None:
        onehot = onehot * jnp.tile(valid, k).astype(jnp.int32)[:, None]
    pos = jnp.cumsum(onehot, axis=0) - 1                     # queue slot
    pos = jnp.where(onehot > 0, pos, -1)
    pos = jnp.max(pos, axis=-1)                              # (kT,)
    kept = (pos >= 0) & (pos < capacity)

    # scatter back to (T, E, C): entry j of the flat order is token
    # j % T making its (j // T)-th choice
    tok = jnp.tile(jnp.arange(t), k)
    disp = jnp.zeros((t, e, capacity), jnp.float32)
    disp = disp.at[tok, flat_choice,
                   jnp.clip(pos, 0, capacity - 1)].add(
        kept.astype(jnp.float32))
    gates_flat = gate_vals.T.reshape(-1)                     # (kT,)
    comb = disp * 0.0
    comb = comb.at[tok, flat_choice,
                   jnp.clip(pos, 0, capacity - 1)].add(
        jnp.where(kept, gates_flat, 0.0))

    # load-balance aux: fraction of (valid) tokens whose FIRST choice
    # is e, times mean router prob of e
    w = (valid.astype(jnp.float32) if valid is not None
         else jnp.ones((t,), jnp.float32))
    nv = jnp.maximum(jnp.sum(w), 1.0)
    first = jax.nn.one_hot(choice[:, 0], e, dtype=jnp.float32)
    frac = jnp.sum(first * w[:, None], axis=0) / nv
    mean_p = jnp.sum(probs * w[:, None], axis=0) / nv
    aux = e * jnp.sum(frac * mean_p)
    return disp, comb, aux


def _n_experts(params) -> int:
    for key in ("w_in", "w_in_q", "w_in_q4"):
        if key in params:
            return params[key].shape[0]
    raise KeyError(list(params))


def quantize_moe(params: dict, bits: int = 8) -> dict:
    """Quantized expert stacks: symmetric per-(expert, out-column)
    scales, chgemm conventions (ops/quant). The router stays fp32 — it
    is tiny and routing-precision-critical.

    bits=8 (W8A16): int8 stacks, 1 B/elt in HBM, converted per block in
    VMEM by the kernels. bits=4: nibble-packed stacks
    (quant.pack_int4 with block_k = the contraction dim), 0.5 B/elt,
    decoded in VMEM by the ragged grouped-GEMM kernel (_kernel_q4)."""
    from how_to_optimize_gemm_tpu.ops.quant import (pack_int4,
                                                    quantize_symmetric)
    assert bits in (4, 8), bits
    out = {"router": params["router"]}
    for name in ("w_in", "w_out", "w_gate"):
        if name in params:
            q, s = quantize_symmetric(params[name], axis=1, bits=bits)
            if bits == 8:
                out[name + "_q"] = q
            else:
                kdim = q.shape[1]
                out[name + "_q4"] = jax.vmap(
                    lambda q2: pack_int4(q2, kdim))(q)
            out[name + "_s"] = s.astype(jnp.float32)
        else:                            # already quantized: pass through
            have = (8 if name + "_q" in params
                    else 4 if name + "_q4" in params else None)
            if have is not None and have != bits:
                raise ValueError(
                    f"{name}: stacks already quantized at {have}-bit; "
                    f"dequantize_moe() first to re-encode at {bits}-bit"
                    " (silent pass-through would keep the old width)")
            for suffix in ("_q", "_q4", "_s"):
                if name + suffix in params:
                    out[name + suffix] = params[name + suffix]
    return out


def dequantize_moe(params: dict) -> dict:
    """Inverse of quantize_moe (up to quantization error), fp32."""
    from how_to_optimize_gemm_tpu.ops.quant import unpack_int4
    out = {"router": params["router"]}
    for name in ("w_in", "w_out", "w_gate"):
        if name in params:
            out[name] = params[name]
        elif name + "_q" in params:
            out[name] = (params[name + "_q"].astype(jnp.float32)
                         * params[name + "_s"])
        elif name + "_q4" in params:
            packed = params[name + "_q4"]
            kdim = packed.shape[1] * 2
            q = jax.vmap(lambda p: unpack_int4(p, kdim))(packed)
            out[name] = q.astype(jnp.float32) * params[name + "_s"]
    return out


def _experts(params, x, ctype):
    """Batched per-expert FFN: x (E, S, d) -> (E, S, d). SwiGLU when
    the params carry a gate stack, relu MLP otherwise; dense, int8, or
    int4-packed stacks (quantize_moe) per weight. On the dispatch path
    int4 stacks unpack to ctype first (a dense transient — the ragged
    path decodes per block in VMEM instead; prefer it for 4-bit)."""
    from how_to_optimize_gemm_tpu.ops.quant import unpack_int4

    def mm(name, inp, eq):
        if name in params:
            return jnp.einsum(eq, inp, params[name].astype(ctype))
        if name + "_q4" in params:
            packed = params[name + "_q4"]
            w = jax.vmap(lambda p: unpack_int4(p, packed.shape[1] * 2)
                         )(packed).astype(ctype)
        else:
            w = params[name + "_q"].astype(ctype)
        return jnp.einsum(eq, inp, w) * params[name + "_s"].astype(ctype)

    gated = any(k in params for k in ("w_gate", "w_gate_q", "w_gate_q4"))
    if gated:
        g = jax.nn.silu(mm("w_gate", x, "esd,edf->esf"))
        h = g * mm("w_in", x, "esd,edf->esf")
    else:
        h = jax.nn.relu(mm("w_in", x, "esd,edf->esf"))
    return mm("w_out", h, "esf,efd->esd")


def _moe_local(params, x, *, axis: str, k: int, capacity: int,
               chunk: int):
    """shard_map body: x (T_local, d) token shard; params replicated
    except the expert stacks, sharded (E_local, ...) on ``axis``.

    Tokens route in CHUNKS (capacity is per chunk) exactly like
    moe_ffn_local, so dispatch memory and per-hop all_to_all buffers
    stay linear in T_local; the chunk loop is a lax.map whose body
    carries the two all_to_alls (collectives inside scan are one
    program per chunk — same ICI bytes, bounded buffers)."""
    # router math in fp32 (softmax/top-k precision); everything that
    # crosses ICI or hits the MXU stays in the ACTIVATION dtype — with
    # bf16 models the all_to_all buffers are half the bytes of an fp32
    # implementation, on the bandwidth-critical collective
    ctype = x.dtype
    tl, d = x.shape
    c = min(chunk, tl)
    nch = -(-tl // c)
    pad = nch * c - tl
    xc = jnp.pad(x, ((0, pad), (0, 0))).reshape(nch, c, d)
    valid = (jnp.arange(nch * c) < tl).reshape(nch, c)

    def one_chunk(args):
        xi, vi = args
        logits = xi.astype(jnp.float32) @ params["router"].astype(
            jnp.float32)
        disp, comb, aux = _route(logits, k, capacity, valid=vi)
        # local dispatch buffers for ALL experts: (E, C, d)
        buf = jnp.einsum("tec,td->ecd", disp.astype(ctype), xi)
        # all_to_all out: every device keeps its own experts' slots
        # from every peer -> (E_local, n*C, d)
        buf = lax.all_to_all(buf, axis, split_axis=0, concat_axis=1,
                             tiled=True)
        out = _experts(params, buf, ctype)
        # all_to_all back: slots return to the dispatching device
        out = lax.all_to_all(out, axis, split_axis=1, concat_axis=0,
                             tiled=True)                      # (E, C, d)
        # combine in fp32: the gate weights live there and the buffer
        # is local (no ICI cost)
        y = jnp.einsum("tec,ecd->td", comb, out.astype(jnp.float32))
        return y.astype(ctype), aux

    ys, auxs = lax.map(one_chunk, (xc, valid))
    y = ys.reshape(nch * c, d)[:tl]
    nv = jnp.sum(valid, axis=1).astype(jnp.float32)
    aux = jnp.sum(auxs * nv) / jnp.maximum(jnp.sum(nv), 1.0)
    return y, lax.pmean(aux, axis)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "k", "capacity",
                                    "chunk"))
def _moe_jit(params, x, mesh, axis, k, capacity, chunk):
    # router replicated; every expert stack (w_in/w_out/w_gate) sharded
    # on its leading E axis
    pspecs = {k: (P() if k == "router" else P(axis)) for k in params}
    fn = jax.shard_map(
        functools.partial(_moe_local, axis=axis, k=k,
                          capacity=capacity, chunk=chunk),
        mesh=mesh,
        in_specs=(pspecs, P(axis)),
        out_specs=(P(axis), P()))
    return fn(params, x)


def moe_ffn(params, x: jnp.ndarray, mesh: Mesh, axis: str = "ep",
            k: int = 2, capacity_factor: float = 2.0,
            chunk: int = 256, return_aux: bool = False):
    """Expert-parallel routed FFN: x (T, d) -> (T, d).

    Tokens are sharded over ``mesh[axis]`` (T divisible by the axis
    size), experts sharded the same way (E divisible too). Routing is
    per CHUNK of each device's shard: expert capacity
    C = ceil(k * min(chunk, T_local) * capacity_factor / E), so memory
    stays linear in T_local; tokens beyond an expert's per-chunk
    capacity are dropped from that expert (standard fixed-capacity MoE
    semantics — ``capacity_factor >= E/k`` guarantees none drop)."""
    n = mesh.shape[axis]
    t, _ = x.shape
    e = _n_experts(params)
    assert t % n == 0, (t, n)
    assert e % n == 0, (e, n)
    c = min(chunk, t // n)
    capacity = max(1, int(-(-k * c * capacity_factor // e)))
    y, aux = _moe_jit(params, x, mesh, axis, k, capacity, chunk)
    return (y, aux) if return_aux else y


def moe_ffn_local(params, x: jnp.ndarray, k: int = 2,
                  capacity_factor: float = 2.0, chunk: int = 256,
                  return_aux: bool = False):
    """Single-device routed MoE: the SAME dispatch/capacity/combine math
    as moe_ffn, minus the all_to_alls — the one-chip serving/training
    path (models/llama uses it when cfg.n_experts > 0).

    Tokens route in CHUNKS of ``chunk``: capacity is per chunk
    (C = ceil(k*chunk*cf/E)), so the dispatch one-hots are
    (n_chunks, chunk, E, C) — memory LINEAR in T, where a whole-batch
    capacity would be O(T^2) and OOM long-context prefill. Capacity
    contention (which token drops) is confined to a chunk; with
    ``capacity_factor >= E/k`` nothing can drop and every token's
    routing is independent of its co-batch entirely (the determinism
    the llama family defaults to — see LlamaConfig.moe_dropless).
    Equal to moe_ffn on a mesh whenever nothing drops."""
    t, d = x.shape
    e = _n_experts(params)
    c = min(chunk, t)
    n = -(-t // c)
    pad = n * c - t
    capacity = max(1, int(-(-k * c * capacity_factor // e)))
    ctype = x.dtype
    xc = jnp.pad(x, ((0, pad), (0, 0))).reshape(n, c, d)
    valid = (jnp.arange(n * c) < t).reshape(n, c)
    logits = xc.astype(jnp.float32) @ params["router"].astype(jnp.float32)
    disp, comb, aux = jax.vmap(
        lambda lg, v: _route(lg, k, capacity, valid=v))(logits, valid)
    buf = jnp.einsum("ntec,ntd->necd", disp.astype(ctype), xc)
    out = _experts(params,
                   buf.transpose(1, 0, 2, 3).reshape(e, n * capacity, d),
                   ctype)
    out = out.reshape(e, n, capacity, d).transpose(1, 0, 2, 3)
    y = jnp.einsum("ntec,necd->ntd", comb, out.astype(jnp.float32))
    y = y.reshape(n * c, d)[:t].astype(ctype)
    # padded chunks carry zero weight in the aux mean
    nv = jnp.sum(valid, axis=1).astype(jnp.float32)
    aux = jnp.sum(aux * nv) / jnp.maximum(jnp.sum(nv), 1.0)
    return (y, aux) if return_aux else y


def moe_ffn_dense(params, x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Per-token dense reference (no capacity, no sharding): the oracle
    for moe_ffn at no-drop capacity."""
    logits = x.astype(jnp.float32) @ params["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, choice = lax.top_k(probs, k)
    gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)
    # every expert computes every token; combine picks the chosen ones
    outs = _experts(params,
                    jnp.broadcast_to(x.astype(jnp.float32),
                                     (_n_experts(params), *x.shape)),
                    jnp.float32)                              # (E, T, d)
    y = jnp.zeros_like(x, jnp.float32)
    for j in range(k):
        y = y + gate_vals[:, j:j + 1] * jnp.take_along_axis(
            outs, choice[:, j][None, :, None], axis=0)[0]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Ragged (dropless, overcompute-free) path: Pallas grouped GEMM.

def _ragged_layout(flat_exp: jnp.ndarray, t: int, e: int, k: int,
                   bt: int):
    """Expert-sorted, bt-aligned destination layout for grouped_matmul.

    flat_exp (k*T,) expert ids in first-choices-first order. Returns
    (stok, sgate_order, dest, block_expert, tp): sorted token ids, the
    sort permutation (to reorder gates), each routed copy's destination
    row, the per-block expert map, and the padded row count (a STATIC
    upper bound — ceil(kT/bt)*bt + E*bt — so shapes stay jit-friendly
    while the true per-expert padding is data-dependent)."""
    kt = flat_exp.shape[0]
    order = jnp.argsort(flat_exp, stable=True)
    sexp = flat_exp[order]
    counts = jnp.zeros((e,), jnp.int32).at[flat_exp].add(1)
    # every expert owns >= 1 block (a zero-token expert gets one block
    # of zero rows): the dW backward kernel writes each expert's tile
    # at least once, and the forward cost is one trivial block
    padded = jnp.maximum(((counts + bt - 1) // bt) * bt, bt)
    cum_pad = jnp.cumsum(padded)
    offs = cum_pad - padded                       # segment starts
    cum_cnt = jnp.cumsum(counts)
    seg_start = cum_cnt - counts
    pos = jnp.arange(kt) - seg_start[sexp]
    dest = offs[sexp] + pos
    tp = (-(-kt // bt)) * bt + e * bt
    block_expert = jnp.searchsorted(cum_pad,
                                    jnp.arange(tp // bt) * bt,
                                    side="right")
    block_expert = jnp.clip(block_expert, 0, e - 1)
    tok = jnp.tile(jnp.arange(t), k)
    return tok[order], order, dest, block_expert, tp


def moe_ffn_ragged(params, x: jnp.ndarray, k: int = 2,
                   bt: int | None = None,
                   bf: int | None = None,
                   interpret: bool | None = None,
                   return_aux: bool = False):
    """Dropless routed MoE with NO static-shape overcompute: tokens are
    expert-sorted and each expert multiplies exactly its own (bt-padded)
    row segment through the Pallas grouped GEMM
    (ops/pallas_grouped_gemm — scalar-prefetched block->expert map).

    vs the dispatch path: block-dispatch droplessness costs E/k x the
    useful expert FLOPs; this path costs ~1x + at most one padded block
    per expert. Works on dense, int8, or packed-int4 expert stacks (the
    stack streams at its stored width; int8 converts and int4 decodes
    per-block in VMEM, scales in the kernel epilogue). TRAINS at every
    width: dense stacks get full gradients (custom VJP: transposed-
    contraction dx kernel + revisited-output dW kernel; gradient
    equality vs the dispatch path in tests/test_grouped_gemm.py);
    int8/int4 stacks train QLoRA-style (stack frozen, x and scales get
    gradients — see pallas_grouped_gemm._gmm_q8_bwd/_gmm_q4_bwd).
    f (d_ff) must be 128-aligned on real TPUs."""
    from how_to_optimize_gemm_tpu.ops.pallas_grouped_gemm import (
        grouped_matmul)

    t, d = x.shape
    e = _n_experts(params)
    ctype = x.dtype
    if bt is None or bf is None:
        # banked (bt, bf) from the serving-kernel autotuner; absent
        # entries keep the measured defaults (bt=128, bf=_auto_bf)
        from how_to_optimize_gemm_tpu.harness.autotune_kernels import (
            grouped_key, knobs_for)
        kind = ("int8" if "w_in_q" in params
                else "int4" if "w_in_q4" in params else "dense")
        stack = next(params[n] for n in ("w_in", "w_in_q", "w_in_q4")
                     if n in params)
        tuned = knobs_for("grouped",
                          grouped_key(e, d, stack.shape[2], kind))
        bt = bt or tuned.get("bt") or 128
        bf = bf if bf is not None else tuned.get("bf")
    logits = x.astype(jnp.float32) @ params["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, choice = lax.top_k(probs, k)
    gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)
    flat_exp = choice.T.reshape(-1)
    stok, order, dest, block_expert, tp = _ragged_layout(
        flat_exp, t, e, k, bt)
    xs = jnp.zeros((tp, d), ctype).at[dest].set(x[stok])

    def gm(name, inp):
        # stacks stream AT THEIR STORED WIDTH (int8 = 1 B/elt, int4 =
        # 0.5 B/elt of HBM traffic) and convert/decode per-block inside
        # the kernel — an astype/unpack here would materialize a dense
        # copy in HBM
        if name in params:
            return grouped_matmul(inp, params[name], block_expert,
                                  bt=bt, bf=bf, interpret=interpret)
        if name + "_q4" in params:
            return grouped_matmul(inp, params[name + "_q4"],
                                  block_expert, params[name + "_s"],
                                  bt=bt, bf=bf, packed4=True,
                                  interpret=interpret)
        return grouped_matmul(inp, params[name + "_q"],
                              block_expert, params[name + "_s"],
                              bt=bt, bf=bf, interpret=interpret)

    if any(k in params for k in ("w_gate", "w_gate_q", "w_gate_q4")):
        h = jax.nn.silu(gm("w_gate", xs)) * gm("w_in", xs)
    else:
        h = jax.nn.relu(gm("w_in", xs))
    ys = gm("w_out", h)

    sgate = gate_vals.T.reshape(-1)[order]
    out = jnp.zeros((t, d), jnp.float32).at[stok].add(
        ys[dest].astype(jnp.float32) * sgate[:, None])
    out = out.astype(ctype)
    if not return_aux:
        return out
    frac = jnp.mean(jax.nn.one_hot(choice[:, 0], e, dtype=jnp.float32),
                    axis=0)
    aux = e * jnp.sum(frac * jnp.mean(probs, axis=0))
    return out, aux
