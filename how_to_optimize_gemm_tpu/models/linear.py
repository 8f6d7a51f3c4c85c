"""Quantizable linear layers — the bridge from the ladder to the models.

A linear's weights live in one of four formats; ``apply`` routes to the
matching ladder kernel on TPU, or to an XLA dequant+dot emulation (exact
same arithmetic semantics, minus kernel scheduling) on CPU/interpret —
the policy mirrors ``utils.env.default_interpret``.

Weight layout convention: W is (d_in, d_out) and y = x @ W, so the int8
per-column / int4 per-output-channel scales line up with the ladder
kernels' epilogues.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from how_to_optimize_gemm_tpu.ops import pallas_int4, pallas_int8, quant
from how_to_optimize_gemm_tpu.utils.env import on_tpu

INT4_BLOCK_K = 512


@dataclasses.dataclass(frozen=True)
class LinearFormat:
    kind: str  # 'fp32' | 'bf16' | 'int8' | 'int4'


def make_linear(w: jnp.ndarray, kind: str = "bf16") -> dict[str, Any]:
    """Convert a dense (d_in, d_out) fp32 weight to the requested format.

    Returns a pytree dict (jit-friendly) with a static 'kind' marker kept
    OUT of the pytree leaves (encoded in key names).
    """
    if kind == "fp32":
        return {"fp32_w": w.astype(jnp.float32)}
    if kind == "bf16":
        return {"bf16_w": w.astype(jnp.bfloat16)}
    if kind == "int8":
        qw, sw = quant.quantize_symmetric(w, axis=0)
        return {"int8_qw": qw, "int8_sw": sw}
    if kind == "int4":
        from how_to_optimize_gemm_tpu.ops import bounds
        kdim = w.shape[0]
        wp = bounds.pad_dim(w, 0, INT4_BLOCK_K)
        qw, sw = quant.quantize_symmetric(wp, axis=0, bits=4)
        packed = quant.pack_int4(qw, INT4_BLOCK_K)
        return {"int4_packed": packed, "int4_sw": sw,
                "int4_kdim": jnp.int32(kdim)}
    if kind == "w4a8":
        # int4 weights + int8 activations: same packed weight layout as
        # int4, distinct keys so apply_linear quantizes x to int8 and
        # takes the int8 MXU path (2x the W4A16 rate).
        from how_to_optimize_gemm_tpu.ops import bounds
        kdim = w.shape[0]
        wp = bounds.pad_dim(w, 0, INT4_BLOCK_K)
        qw, sw = quant.quantize_symmetric(wp, axis=0, bits=4)
        packed = quant.pack_int4(qw, INT4_BLOCK_K)
        return {"w4a8_packed": packed, "w4a8_sw": sw,
                "w4a8_kdim": jnp.int32(kdim)}
    raise ValueError(f"unknown linear kind {kind!r}")


def linear_kind(lin: dict[str, Any]) -> str:
    for k in lin:
        return k.split("_")[0]
    raise ValueError("empty linear")


def apply_linear(lin: dict[str, Any], x: jnp.ndarray,
                 use_pallas: bool | None = None) -> jnp.ndarray:
    """y = x @ dequant(W). x: (..., d_in) any float dtype; y fp32.

    use_pallas None = auto (pallas kernels on TPU, XLA emulation off-TPU,
    where "emulation" is bit-compatible dequant + dot — NOT interpret-mode
    pallas, which is far too slow inside full models).

    The auto policy is also M-aware for int8: at decode shapes (a handful
    of rows) the ladder kernels pad M to the 128-row MXU tile and pay a
    launch per linear, while XLA fuses its dequant+dot into the
    surrounding graph — measured 2399 vs 1771 tok/s at batch 8 on v5e.
    int4 stays on Pallas at every M: its in-kernel nibble decode beats
    XLA's materialized dequant (2603 vs 1577 tok/s).
    """
    kind = linear_kind(lin)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if use_pallas is None:
        m_large = x2.shape[0] >= 256
        use_pallas = on_tpu() and (kind in ("int4", "w4a8") or m_large)

    if kind == "fp32":
        y = jnp.dot(x2, lin["fp32_w"], preferred_element_type=jnp.float32)
    elif kind == "bf16":
        y = jnp.dot(x2.astype(jnp.bfloat16), lin["bf16_w"],
                    preferred_element_type=jnp.float32)
    elif kind == "int8":
        qa, sa = quant.quantize_symmetric(x2.astype(jnp.float32), axis=1)
        if use_pallas:
            y = pallas_int8.mmult_q_noc(qa, sa, lin["int8_qw"],
                                        lin["int8_sw"])
        else:
            acc = jnp.dot(qa.astype(jnp.int32), lin["int8_qw"].astype(
                jnp.int32), preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sa * lin["int8_sw"]
    elif kind == "int4":
        if use_pallas:
            y = pallas_int4.mmult_q_noc(x2.astype(jnp.bfloat16),
                                        lin["int4_packed"], lin["int4_sw"])
        else:
            wq = quant.unpack_int4(lin["int4_packed"], INT4_BLOCK_K)
            w = (wq.astype(jnp.float32) * lin["int4_sw"]).astype(
                jnp.bfloat16)
            kdim = x2.shape[-1]
            y = jnp.dot(x2.astype(jnp.bfloat16), w[:kdim],
                        preferred_element_type=jnp.float32)
    elif kind == "w4a8":
        if use_pallas and x2.shape[0] <= 64:
            # decode widths: activation quantization FUSED into the
            # GEMV kernel — removes the per-linear abs/max/round XLA op
            # soup the 7B decode trace surfaced; measured +6% e2e in a
            # same-session interleaved A/B (38.6 vs 36.5 tok/s, 7B
            # batch 1 W=8), bit-identical to the separate form (tested)
            return pallas_int4.mmult_w4a8_fused_noc(
                x2.astype(jnp.float32), lin["w4a8_packed"],
                lin["w4a8_sw"]).reshape(*lead, -1)
        qa, sa = quant.quantize_symmetric(x2.astype(jnp.float32), axis=1)
        if use_pallas:
            y = pallas_int4.mmult_q_w4a8_noc(qa, sa, lin["w4a8_packed"],
                                             lin["w4a8_sw"])
        else:
            wq = quant.unpack_int4(lin["w4a8_packed"], INT4_BLOCK_K)
            kdim = x2.shape[-1]
            acc = jnp.dot(qa.astype(jnp.int32),
                          wq[:kdim].astype(jnp.int32),
                          preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sa * lin["w4a8_sw"]
    else:
        raise ValueError(kind)
    return y.reshape(*lead, y.shape[-1])
