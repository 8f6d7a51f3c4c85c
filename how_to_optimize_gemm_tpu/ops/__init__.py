"""The kernel ladder (L1) — the product of this framework.

Numbered rungs, each adding exactly one TPU-relevant optimization, mirroring
the reference's `MMult_*` progression (SURVEY.md §2) but designed MXU-first:

====  =======================  ==========================================
rung  module                   reference analogue
====  =======================  ==========================================
00    naive_vpu                aarch64/MMult0.cpp (naive triple loop)
01    xla_dot                  cuda/MMult_cuBLAS_1.cpp (vendor library bar)
02    pallas_mn_tile           cuda/MMult_cuda_3.cu (one tile per program)
03    pallas_k_blocked         aarch64/MMult_4x4_10-12 (K blocking + scratch
                               accumulator ≈ packed panels in VMEM)
04    pallas_tuned             aarch64/MMult_4x4_13-14 (cache-derived block
                               params) + cuda_8/11/12 (double-buffered
                               pipeline, done by the Mosaic pipeliner)
05    pallas_bf16              (new) MXU-native bf16 inputs, fp32 accumulate
06    pallas_int8              chgemm submodule (symmetric int8, [-127,127])
07    pallas_int4              cuda-int4 WIP slot (weight-only dequant GEMM)
====  =======================  ==========================================

Shared ABI: ``run(*operands, c) -> a @ b + c`` (fp32 result), the TPU
equivalent of ``MY_MMult(m, n, k, a, lda, b, ldb, c, ldc)``.
"""
