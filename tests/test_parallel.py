"""Parallel layer on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.ops import pallas_int4, quant
from how_to_optimize_gemm_tpu.parallel import tp_gemm
from how_to_optimize_gemm_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=2, tp=4)


def _ref_int8(x, qw, sw):
    qa, sa = quant.quantize_symmetric(x, axis=1)
    a_eff = np.asarray(quant.dequantize(qa, sa), np.float64)
    b_eff = np.asarray(quant.dequantize(qw, sw), np.float64)
    return a_eff @ b_eff


def test_mesh_shape(mesh):
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_column_parallel_int8(mesh):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (64, 256), minval=-1, maxval=1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (256, 512),
                           minval=-1, maxval=1)
    qw, sw = quant.quantize_symmetric(w, axis=0)
    y = tp_gemm.column_parallel_int8(x, qw, sw, mesh, interpret=True)
    ref = _ref_int8(x, qw, sw)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_row_parallel_int8(mesh):
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (64, 512), minval=-1, maxval=1)
    w = jax.random.uniform(jax.random.PRNGKey(3), (512, 256),
                           minval=-1, maxval=1)
    qw, sw = quant.quantize_symmetric(w, axis=0)
    y = tp_gemm.row_parallel_int8(x, qw, sw, mesh, interpret=True)
    # row-parallel quantizes activations per K-shard: the oracle must
    # quantize shard-wise the same way, so compare against a loose fp
    # reference instead (quant error only, no kernel error).
    ref = np.asarray(x, np.float64) @ np.asarray(w, np.float64)
    rel = np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref))
    assert rel < 0.05, rel


def test_column_parallel_int4(mesh):
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (64, 256), minval=-1, maxval=1)
    w = jax.random.uniform(jax.random.PRNGKey(5), (256, 512),
                           minval=-1, maxval=1)
    a16, packed, sw, kdim = pallas_int4.prepare(x, w)
    y = tp_gemm.column_parallel_int4(x, packed, sw, mesh, interpret=True)
    wq = quant.unpack_int4(packed, block_k=512)[:kdim]
    ref = (np.asarray(a16, np.float64)
           @ np.asarray(quant.dequantize(wq, sw), np.float64))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)


def test_scaling_report_machinery(devices8):
    """The scaling harness runs over mesh ladders and computes
    efficiencies (virtual CPU mesh: validates machinery, not silicon)."""
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.scaling import scaling_report

    cfg = llama.LlamaConfig(vocab=64, d_model=64, n_layers=1, n_heads=4,
                            n_kv_heads=4, d_ff=128, max_seq=32,
                            weight_kind="fp32")
    pts = scaling_report(cfg, [(1, 1), (1, 2), (2, 2)], batch_per_dp=2,
                         steps=4, use_pallas=False)
    assert [p.n_devices for p in pts] == [1, 2, 4]
    assert pts[0].efficiency == 1.0
    assert all(p.tokens_per_s > 0 for p in pts)
