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


@functools.cache
def ensure_interpret_tpu_info() -> None:
    """Register a v5e-shaped TpuInfo for non-TPU device kinds.

    ``pltpu.emit_pipeline`` queries the chip generation at TRACE time
    (DMA tiling geometry), which raises on the CPU backend even in
    interpret mode. JAX ships a public escape hatch — the
    ``tpu_info.registry`` dict consulted for unknown device kinds —
    so interpret-mode runs (tests, the armv7-analogue CPU ladder)
    model the same v5e the compiled path targets."""
    from jax._src.pallas.mosaic import tpu_info

    def _v5e_like():
        return tpu_info.TpuInfo(
            chip_version=tpu_info.ChipVersion.TPU_V5E,
            generation=5, num_cores=1, num_lanes=128, num_sublanes=8,
            mxu_column_size=128,
            vmem_capacity_bytes=128 * 1024 * 1024,
            cmem_capacity_bytes=0, smem_capacity_bytes=1024 * 1024,
            hbm_capacity_bytes=17_200_000_000,
            mem_bw_bytes_per_second=int(8.20e11),
            bf16_ops_per_second=int(1.97e14),
            int8_ops_per_second=int(3.94e14),
            fp8_ops_per_second=0,
            int4_ops_per_second=int(7.88e14))

    for kind in ("cpu", "gpu", "interpreter"):
        tpu_info.registry.setdefault(kind, _v5e_like)


def default_interpret(interpret: bool | None = None) -> bool:
    """Resolve the interpret flag for a pallas_call.

    None means "auto": compiled on TPU, interpreted elsewhere (CPU tests run
    on an 8-device virtual mesh, see tests/conftest.py).
    """
    if interpret is None:
        return not on_tpu()
    return interpret
