"""Serving-kernel autotuner: tune/bank/consume round trip (CPU)."""
import json

import pytest

from how_to_optimize_gemm_tpu.harness import autotune_kernels as ak


def test_workload_registry():
    wls = ak.workloads()
    assert {"flash_7b_2k", "decode_7b", "decode_7b_q8", "decode_gqa",
            "gemv_w4a8_qkv", "gemv_w4a8_up", "gemv_w4a8_down",
            "grouped_moe_8k"} <= set(wls)
    for name, wl in wls.items():
        assert wl.space, name
        # candidate #0 is always the kernel's own default
        assert isinstance(wl.space[0], dict), name


def test_keys_are_shape_stable():
    assert ak.flash_key(2048, 2048, 32, 32, 128, True) == \
        "S2048_T2048_H32_KV32_D128_c1"
    assert ak.decode_key(2048, 32, 128) == "T2048_KV32_D128"
    assert ak.decode_key(2048, 32, 128, kv8=True) == "T2048_KV32_D128_q8"
    assert ak.gemv_key(4, 4096, 11008) == "m4_k4096_n11008"
    assert ak.grouped_key(8, 2048, 1408, "int8") == "E8_d2048_f1408_int8"


def test_tune_bank_consume_roundtrip(tmp_path):
    """A tiny decode workload tunes end to end on CPU interpret, banks
    its winner, and the wrapper-facing knobs_for reads it back."""
    cache = tmp_path / "autotune.json"
    wl = ak._decode_workload(2, 256, 4, 2, 64)
    rows = ak.tune(wl, verbose=False, cache_path=cache)
    ok = [r for r in rows if r.error is None]
    assert ok, rows
    data = json.loads(cache.read_text())
    [key] = data
    assert key.startswith("kernel:decode|T256_KV2_D64|")
    knobs = ak.knobs_for("decode", "T256_KV2_D64", path=cache)
    assert set(knobs) == {"bk"}
    # absent workloads keep the built-in choosers
    assert ak.knobs_for("decode", "T9999_KV2_D64", path=cache) == {}


def test_banked_knobs_reach_the_kernel(tmp_path, monkeypatch):
    """decode_attention(bk=None) resolves through the bank: a banked
    bk must produce the same output as passing it explicitly."""
    import jax
    import jax.numpy as jnp
    from how_to_optimize_gemm_tpu.ops.pallas_decode_attention import (
        decode_attention)

    cache = tmp_path / "autotune.json"
    ak.bank("decode", ak.decode_key(256, 2, 64), {"bk": 256}, 1.0,
            "GB/s", path=cache)
    monkeypatch.setattr(ak, "DEFAULT_CACHE", cache)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64),
                          jnp.bfloat16)
    kc = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 2, 64),
                           jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 2, 64),
                           jnp.bfloat16)
    lengths = jnp.asarray([100, 250], jnp.int32)
    out_banked = decode_attention(q, kc, vc, lengths)
    out_explicit = decode_attention(q, kc, vc, lengths, bk=256)
    assert jnp.allclose(out_banked, out_explicit)
