"""Model family — consumers of the quantized GEMM ladder.

The reference is a GEMM tutorial, not a model zoo; this package exists for
the BASELINE.json north-star serving slice ("int8/int4 Llama-2-7B decode:
sharded dequant-GEMM across hosts, continuous batching"). ``llama`` is the
flagship: a Llama-2-architecture decoder (RMSNorm, RoPE, GQA, SwiGLU)
whose linear layers route through the ladder's int8/int4 kernels.
"""
from how_to_optimize_gemm_tpu.models import llama  # noqa: F401
