"""Offline weight quantization: fp32 checkpoint -> int8/int4/w4a8.

    python examples/quantize.py --kind w4a8 --out /tmp/ckpt_w4a8

The deployment flow the chgemm slot implies: quantize once, serve the
packed weights (examples/serve.py + checkpoint.load_params).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse

import jax

from how_to_optimize_gemm_tpu.models import checkpoint, llama


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", default="int8",
                    choices=["bf16", "int8", "int4", "w4a8"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--n-layers", type=int, default=2)
    args = ap.parse_args()

    cfg = llama.LlamaConfig(vocab=1024, d_model=args.d_model,
                            n_layers=args.n_layers, n_heads=8,
                            n_kv_heads=4, d_ff=args.d_model * 3,
                            max_seq=128, weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = llama.requantize(params, args.kind)
    checkpoint.save_params(args.out, qparams)
    n = sum(x.size * x.dtype.itemsize
            for x in jax.tree.leaves(qparams)) / 1e6
    print(f"wrote {args.out}.npz ({args.kind}, {n:.1f} MB)")


if __name__ == "__main__":
    main()
