"""Parallel layer — the capability the reference does NOT have.

The reference is strictly single-thread/single-device (SURVEY.md §2.6:
``OMP_NUM_THREADS=1``, no NCCL/MPI). This layer exists because the
BASELINE.json north star demands a multi-host serving slice: the winning
quantized kernels scaled over a TPU pod slice via ``jax.sharding.Mesh`` +
``shard_map``, with XLA collectives over ICI.
"""
from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh
from how_to_optimize_gemm_tpu.parallel import tp_gemm

__all__ = ["make_mesh", "tp_gemm"]
