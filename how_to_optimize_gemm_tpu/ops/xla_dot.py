"""Rung 01 — the vendor bar: XLA's own dot.

Reference analogue: ``cuda/MMult_cuBLAS_1.cpp:17-18`` (cublasSgemm as the
performance bar the hand ladder must approach/beat). On TPU the "vendor
library" is XLA's dot emitter: one ``jnp.dot`` lowered straight to the MXU
with XLA's stock pipelining. Everything above this rung is hand-scheduled
Pallas; beating or matching this line is the headline claim, mirroring
"faster than cuBLAS" (``README.md:96-102``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def mmult(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """C = A @ B + C via XLA's native dot (true fp32: HIGHEST = multi-pass
    bf16 on the MXU, since the MXU has no native fp32 datapath)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) + c


@jax.jit
def mmult_bf16(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """bf16-input variant of the vendor bar (cuBLAS_2 GemmEx analogue,
    ``cuda/MMult_cuBLAS_2.cpp:16-25`` — same op, explicit compute type)."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + c


@jax.jit
def mmult_int8(qa, sa, qb, sb, c):
    """int8 vendor bar: XLA's own int8 x int8 -> int32 dot + dequant.

    The performance bar the hand-written int8 Pallas rung (06) must beat —
    the exact relationship of ``MMult_cuda_12`` to ``cublasSgemm``
    (``cuda/MMult_cuBLAS_1.cpp:17-18``, README.md:96-102), restated for
    the quantized ladder. Same pre-quantized operands and fused rank-1
    dequant semantics as rung 06."""
    acc = jax.lax.dot_general(qa, qb, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sa * sb + c
