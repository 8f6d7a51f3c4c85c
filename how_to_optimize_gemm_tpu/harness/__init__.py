from how_to_optimize_gemm_tpu.harness.parameters import SweepConfig
from how_to_optimize_gemm_tpu.harness.driver import run_sweep, SweepRow
from how_to_optimize_gemm_tpu.harness import mfile

__all__ = ["SweepConfig", "run_sweep", "SweepRow", "mfile"]
