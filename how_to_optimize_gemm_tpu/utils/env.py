"""Platform detection and interpret-mode policy.

The reference selects its backend at build time (``aarch64/makefile:1-2``).
Here the equivalent knob is runtime: Pallas kernels compile to Mosaic on a
real TPU and fall back to interpreter mode everywhere else (the "no real
TPU" analogue called out in SURVEY.md §4).
"""
from __future__ import annotations

import functools

import jax


@functools.cache
def on_tpu() -> bool:
    """True when the default JAX backend is a TPU."""
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def default_interpret(interpret: bool | None = None) -> bool:
    """Resolve the interpret flag for a pallas_call.

    None means "auto": compiled on TPU, interpreted elsewhere (CPU tests run
    on an 8-device virtual mesh, see tests/conftest.py).
    """
    if interpret is None:
        return not on_tpu()
    return interpret
