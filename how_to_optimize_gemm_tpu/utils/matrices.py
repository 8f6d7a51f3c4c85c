"""Matrix fixtures — equivalent of the reference's L2 utilities.

The reference's ``random_matrix`` deliberately fills constant 1.0f
(``aarch64/random_matrix.cpp:11-16``, drand48 commented out) so that
``C = A*B`` equals ``k`` everywhere — an easy mental check but weak against
indexing bugs that preserve sums (SURVEY.md §4.2). We keep that fixture as
``ones_matrix`` for parity/debugging and default to real uniform random,
which the diff gate needs to catch layout/transpose mistakes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_matrix(key: jax.Array, m: int, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform(-1, 1) matrix. TPU-native stand-in for drand48 fills."""
    return jax.random.uniform(key, (m, n), minval=-1.0, maxval=1.0).astype(dtype)


def ones_matrix(m: int, n: int, dtype=jnp.float32) -> jax.Array:
    """Constant 1.0 fill — parity fixture with aarch64/random_matrix.cpp:16."""
    return jnp.ones((m, n), dtype=dtype)


def make_abc(key: jax.Array, m: int, n: int, k: int, dtype=jnp.float32,
             ones: bool = False):
    """Allocate the (A, B, C) triple for one sweep point.

    C is randomized too: the ladder ABI is accumulate-into-C
    (``C = A@B + C``), exactly like the reference's ``MY_MMult``.
    """
    if ones:
        return (ones_matrix(m, k, dtype), ones_matrix(k, n, dtype),
                jnp.zeros((m, n), jnp.float32))
    ka, kb, kc = jax.random.split(key, 3)
    a = random_matrix(ka, m, k, dtype)
    b = random_matrix(kb, k, n, dtype)
    c = random_matrix(kc, m, n, jnp.float32)
    return a, b, c


def print_matrix(x, name: str = "", max_rows: int = 8,
                 max_cols: int = 8) -> None:
    """Debug dump — parity with the reference's ``print_matrix.cpp`` and
    the ``DEBUG_PRINT_DATA`` blocks inside ladder rungs
    (``aarch64/MMult_4x4_13.cpp:13-16``): prints a top-left window with
    coordinates so packing/layout mistakes are visible at a glance."""
    import numpy as np
    arr = np.asarray(x)
    r, c = arr.shape[:2]
    print(f"{name or 'matrix'} {arr.shape} {arr.dtype} "
          f"[:{min(r, max_rows)}, :{min(c, max_cols)}] =")
    with np.printoptions(precision=4, suppress=True):
        print(arr[:max_rows, :max_cols])


def copy_matrix(x) -> "jax.Array":
    """Fresh device copy (``copy_matrix.cpp`` parity): use when a timed
    kernel mutates/donates its input and the harness needs the original
    back for the oracle."""
    return jnp.array(x, copy=True)
