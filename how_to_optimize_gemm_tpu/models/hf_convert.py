"""HuggingFace Llama checkpoint -> framework params.

The reference is a GEMM tutorial with no model IO; the serving north
star needs one: this module maps a ``transformers`` Llama checkpoint
(LlamaForCausalLM or its state_dict) onto the ``models/llama`` tree so
real weights can run through the quantized ladders
(``llama.requantize`` afterwards for int8/int4/w4a8 serving).

Convention notes (verified by the logits-parity test,
tests/test_hf_convert.py, against transformers' own forward):

- RoPE: both sides use the rotate-half (non-interleaved) convention —
  dim i pairs with i + d/2 — so NO head-dim permutation is needed
  (the Meta->HF conversion's permute is already baked into HF
  checkpoints).
- torch ``nn.Linear`` stores (out, in); this framework applies
  ``x @ w`` with (in, out) — every projection transposes.
- Head layout: both project to (heads, d_head) contiguous; GQA via
  ``num_key_value_heads`` maps directly onto ``n_kv_heads``.
- ``tie_word_embeddings=True`` checkpoints reuse the embedding as the
  LM head (transposed).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from how_to_optimize_gemm_tpu.models.linear import make_linear
from how_to_optimize_gemm_tpu.models.llama import LlamaConfig


def _np(t) -> np.ndarray:
    """torch tensor (any dtype/device) -> fp32 numpy, no torch import
    needed here (works via the tensor's own methods)."""
    return np.asarray(t.detach().float().cpu().numpy(), np.float32)


def config_from_hf(hf_config, max_seq: int | None = None,
                   weight_kind: str = "fp32") -> LlamaConfig:
    return LlamaConfig(
        vocab=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        d_ff=hf_config.intermediate_size,
        max_seq=max_seq or min(hf_config.max_position_embeddings, 4096),
        rope_theta=float(getattr(hf_config, "rope_theta", 10000.0)),
        norm_eps=float(hf_config.rms_norm_eps),
        weight_kind=weight_kind,
    )


def from_hf_llama(model, weight_kind: str = "fp32",
                  max_seq: int | None = None
                  ) -> tuple[LlamaConfig, dict[str, Any]]:
    """transformers.LlamaForCausalLM -> (LlamaConfig, params).

    ``weight_kind`` encodes every projection at conversion time
    (fp32/bf16/int8/int4/w4a8 — the same offline-quantization step the
    serving CLI does via ``llama.requantize``); the LM head stays fp32
    like ``llama.init_params`` (trainability + logits precision)."""
    hf_cfg = model.config
    cfg = config_from_hf(hf_cfg, max_seq, weight_kind)
    sd = model.state_dict()

    def lin(name: str, kind: str = None):
        w = _np(sd[name]).T                      # (out,in) -> (in,out)
        return make_linear(jnp.asarray(w), kind or weight_kind)

    layers = []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        layers.append({
            "attn_norm": jnp.asarray(
                _np(sd[pre + "input_layernorm.weight"])),
            "wq": lin(pre + "self_attn.q_proj.weight"),
            "wk": lin(pre + "self_attn.k_proj.weight"),
            "wv": lin(pre + "self_attn.v_proj.weight"),
            "wo": lin(pre + "self_attn.o_proj.weight"),
            "mlp_norm": jnp.asarray(
                _np(sd[pre + "post_attention_layernorm.weight"])),
            "w_gate": lin(pre + "mlp.gate_proj.weight"),
            "w_up": lin(pre + "mlp.up_proj.weight"),
            "w_down": lin(pre + "mlp.down_proj.weight"),
        })

    embed = jnp.asarray(_np(sd["model.embed_tokens.weight"]))
    if getattr(hf_cfg, "tie_word_embeddings", False):
        lm_head = make_linear(embed.T, "fp32")
    else:
        lm_head = lin("lm_head.weight", "fp32")
    return cfg, {
        "embed": embed,
        "out_norm": jnp.asarray(_np(sd["model.norm.weight"])),
        "lm_head": lm_head,
        "layers": layers,
    }
