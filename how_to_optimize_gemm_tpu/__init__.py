"""how_to_optimize_gemm_tpu — a TPU-native progressive GEMM-optimization framework.

A from-scratch re-design (NOT a port) of the capabilities of
tpoisonooo/how-to-optimize-gemm for TPU hardware:

- ``ops``      — the kernel ladder (L1): numbered rungs from a naive VPU
  outer-product loop up through MXU-tiled, K-blocked, pipelined Pallas
  kernels, then bf16 / int8 symmetric (chgemm-style) / int4 weight-only
  dequant GEMM. Each rung exports the shared ``mmult(a, b, c) -> a@b + c``
  ABI (TPU-native equivalent of the reference's
  ``MY_MMult(m, n, k, a, lda, b, ldb, c, ldc)``, aarch64/MMult0.cpp:3).
- ``harness``  — L2/L3: sweep driver, fp32 oracle, max-abs-diff gate,
  Octave-style ``.m`` writers (equivalent of aarch64/test_MMult.cpp:24-144).
- ``parallel`` — mesh / shard_map tensor-parallel dequant-GEMM and the
  multi-host serving slice (new capability per BASELINE.json north star).
- ``models``   — flagship decode model (Llama-style) that consumes the
  quantized GEMM ladder.
- ``viz``      — plot.py equivalent: GFLOPS-vs-size curves + MXU roofline.
- ``utils``    — timing, matrices, native (C++) harness utilities.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: kernel compiles go through a remote AOT
# helper on this platform (~20-40 s each); caching makes repeat sweeps and
# CI usable. Opt out with HTOG_NO_COMPILE_CACHE=1.
if not _os.environ.get("HTOG_NO_COMPILE_CACHE"):
    # One cache dir per platform selection: mixing CPU and TPU-AOT entries
    # in one dir makes the CPU loader warn about machine-feature stamps.
    _plat = (_os.environ.get("JAX_PLATFORMS") or "default").replace(",", "_")
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser(f"~/.cache/jax_htog_{_plat}"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from how_to_optimize_gemm_tpu.ops import registry as ladder  # noqa: F401
