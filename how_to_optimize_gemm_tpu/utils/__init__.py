from how_to_optimize_gemm_tpu.utils.env import on_tpu, default_interpret
from how_to_optimize_gemm_tpu.utils.matrices import random_matrix, ones_matrix
from how_to_optimize_gemm_tpu.utils.timing import dclock, time_best_of

__all__ = [
    "on_tpu",
    "default_interpret",
    "random_matrix",
    "ones_matrix",
    "dclock",
    "time_best_of",
]
