"""Pack / quantize layout transforms — the chgemm & cuda-int4 capability slot.

chgemm semantics (reference README.md:79-85): *symmetric* quantization with
values in [-127, +127] — the int8 value -128 is forbidden so that |q| always
fits 7 bits and a*b never overflows int16 headroom assumptions. We keep the
same contract: ``quantize_symmetric`` clamps to ±(2^(bits-1) - 1).

int4 weight packing (the cuda-int4 WIP slot, reference README.md:118-120):
two 4-bit weights per int8 byte. The nibble layout is chosen for cheap
in-kernel unpack on the VPU: within each K-block of size ``bk``, rows
[0, bk/2) live in the LOW nibble and rows [bk/2, bk) in the HIGH nibble of
packed row block. Unpacking is then two shifts + one concatenate along the
sublane axis — no interleave/transpose (which would cost cross-lane
shuffles on TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axis: int | None, bits: int = 8):
    """Symmetric (zero-point-free) quantization.

    Returns (q, scale) with q = round(x / scale) clamped to
    [-(2^(bits-1)-1), +(2^(bits-1)-1)] (chgemm: -128 forbidden) and
    scale shaped for broadcast along ``axis`` (None = per-tensor).
    """
    qmax = float(2 ** (bits - 1) - 1)
    if axis is None:
        amax = jnp.max(jnp.abs(x))
    else:
        amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8).astype(jnp.float32) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def dequantize(q: jnp.ndarray, scale: jnp.ndarray,
               dtype=jnp.float32) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def pack_int4(q: jnp.ndarray, block_k: int) -> jnp.ndarray:
    """Pack int4 values (stored in int8, range [-7, 7]) two per byte.

    q: (K, N) int8; K must be a multiple of block_k (pad first), block_k
    even. Output: (K // 2, N) int8. Within each K block of ``block_k``
    rows, the first half goes to low nibbles, second half to high nibbles
    of the same (block_k // 2, N) packed rows — see module docstring.
    """
    k, n = q.shape
    assert k % block_k == 0 and block_k % 2 == 0, (k, block_k)
    qb = q.reshape(k // block_k, block_k, n)
    # Low nibble in OFFSET BINARY (u = lo + 8, range [1, 15]); high
    # nibble two's-complement. The packed byte value is then exactly
    # P = 16*hi + u, which lets kernels split the nibbles via MXU
    # algebra instead of VPU decode (pallas_int4._kernel_noc_gemv):
    #   A_hi @ hi + A_lo @ lo
    #     = (A_hi @ P - A_hi @ u) / 16 + A_lo @ u - 8 * rowsum(A_lo)
    # with u = P & 15 the ONLY decode op. (Two's-complement low nibbles
    # would make lo(u) non-affine: lo = u - 16*(u >= 8).)
    lo = (qb[:, : block_k // 2] + 8).astype(jnp.uint8)
    hi = qb[:, block_k // 2:].astype(jnp.uint8) & 0xF
    packed = lo | (hi << 4)
    return jax.lax.bitcast_convert_type(packed, jnp.int8).reshape(k // 2, n)


def unpack_int4(packed: jnp.ndarray, block_k: int) -> jnp.ndarray:
    """Host-side inverse of pack_int4 (for tests/oracles)."""
    k2, n = packed.shape
    k = k2 * 2
    pb = packed.reshape(k // block_k, block_k // 2, n)
    lo = (pb & 0xF) - 8   # offset-binary low nibble
    hi = pb >> 4  # arithmetic shift on int8 sign-extends the high nibble
    return jnp.concatenate([lo, hi], axis=1).reshape(k, n)
