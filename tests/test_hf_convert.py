"""Cross-framework parity: HF Llama -> framework conversion.

The strongest convention check in the suite: transformers' own forward
is the oracle, so RoPE pairing, GQA head layout, RMSNorm placement and
the SwiGLU order are validated against a production implementation
instead of against ourselves.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from how_to_optimize_gemm_tpu.models import llama
from how_to_optimize_gemm_tpu.models.hf_convert import from_hf_llama


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attention_dropout=0.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(hf_cfg).eval().float()


def test_hf_logits_parity(hf_model):
    cfg, params = from_hf_llama(hf_model)
    assert cfg.n_kv_heads == 2 and cfg.d_head == 16
    tokens = np.random.RandomState(0).randint(0, cfg.vocab, (2, 12))
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    got = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens),
                                   use_pallas=False))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale,
                               rtol=0, atol=2e-5)


def test_hf_greedy_decode_parity(hf_model):
    """Greedy continuation matches transformers.generate — the
    convention check that exercises the KV cache path too."""
    cfg, params = from_hf_llama(hf_model)
    prompt = np.random.RandomState(1).randint(0, cfg.vocab, (1, 6))
    with torch.no_grad():
        ref = hf_model.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0).numpy()[0, 6:]
    cache = llama.init_kv_cache(cfg, batch=1, dtype=jnp.float32)
    # prefill token-by-token (decode_step), then greedy-extend
    tok = jnp.asarray(prompt)
    logits = None
    for t in range(prompt.shape[1]):
        logits, cache = llama.decode_step(
            params, cfg, cache, tok[:, t:t + 1], jnp.int32(t),
            use_pallas=False)
    out = []
    pos = prompt.shape[1]
    for _ in range(8):
        nxt = int(jnp.argmax(logits[0, 0]))
        out.append(nxt)
        logits, cache = llama.decode_step(
            params, cfg, cache, jnp.asarray([[nxt]]), jnp.int32(pos),
            use_pallas=False)
        pos += 1
    assert out == list(ref), (out, list(ref))


def test_hf_convert_quantized_close(hf_model):
    """int8 conversion stays close to the fp32 model (the offline
    serving quantization path on real-checkpoint weights)."""
    cfg32, p32 = from_hf_llama(hf_model)
    cfg8, p8 = from_hf_llama(hf_model, weight_kind="int8")
    assert "int8_qw" in p8["layers"][0]["wq"]
    tokens = np.random.RandomState(2).randint(0, cfg32.vocab, (1, 8))
    a = np.asarray(llama.forward(p32, cfg32, jnp.asarray(tokens),
                                 use_pallas=False))
    b = np.asarray(llama.forward(p8, cfg8, jnp.asarray(tokens),
                                 use_pallas=False))
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.05, rel


def test_hf_tied_embeddings():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, max_position_embeddings=32,
        tie_word_embeddings=True, attention_dropout=0.0,
        attn_implementation="eager")
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    cfg, params = from_hf_llama(hf)
    tokens = np.asarray([[1, 2, 3, 4]])
    with torch.no_grad():
        ref = hf(torch.tensor(tokens)).logits.float().numpy()
    got = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens),
                                   use_pallas=False))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale,
                               rtol=0, atol=2e-5)
