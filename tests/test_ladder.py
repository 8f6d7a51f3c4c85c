"""Ladder correctness — every rung vs the fp64 oracle, every run.

Mirrors the reference's always-on oracle gate (SURVEY.md §4.1): each rung
is checked at multiple shapes, including non-tile-multiple boundary shapes
(the chgemm differentiator) and rectangular M != N != K.
"""
import jax
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.harness import oracle
from how_to_optimize_gemm_tpu.ops import registry
from how_to_optimize_gemm_tpu.utils.matrices import make_abc

SHAPES = [
    (256, 256, 256),
    (128, 384, 256),     # rectangular
    (200, 136, 72),      # nothing aligned: boundary handling
    (512, 512, 1024),    # k > m, multiple K blocks
]


@pytest.mark.parametrize("name", registry.names())
@pytest.mark.parametrize("shape", SHAPES)
def test_rung_matches_oracle(name, shape):
    m, n, k = shape
    rung = registry.get(name)
    if name == "00_naive_vpu" and k > 512:
        pytest.skip("naive rung too slow in interpreter at large k")
    key = jax.random.PRNGKey(hash((name, shape)) % (2 ** 31))
    a, b, c = make_abc(key, m, n, k)
    prepared = rung.prepare(a, b)
    out = np.asarray(rung.run(*prepared, c))
    assert out.shape == (m, n)
    ae, be = rung.effective(prepared)
    ref = oracle.ref_mmult(np.asarray(ae), np.asarray(be), np.asarray(c))
    res = oracle.compare_matrices(out, ref, rung.gate_rel)
    assert res.max_rel < rung.gate_rel, (
        f"{name} @ {shape}: rel {res.max_rel:.3e} > {rung.gate_rel:.0e}, "
        f"first bad {res.first_bad}")


def test_accumulate_semantics():
    """C = A@B + C (the reference ABI accumulates into C)."""
    rung = registry.get("04_pallas_tuned_fp32")
    key = jax.random.PRNGKey(0)
    a, b, c = make_abc(key, 128, 128, 128)
    out_with_c = np.asarray(rung.run(a, b, c))
    out_zero_c = np.asarray(rung.run(a, b, c * 0))
    np.testing.assert_allclose(out_with_c - np.asarray(c), out_zero_c,
                               rtol=1e-4, atol=1e-4)


def test_ones_fixture_parity():
    """With the reference's constant-1.0 fixture, C == k everywhere
    (aarch64/random_matrix.cpp:16 semantics)."""
    rung = registry.get("03_pallas_k_blocked")
    m = n = k = 256
    a, b, c = make_abc(jax.random.PRNGKey(0), m, n, k, ones=True)
    out = np.asarray(rung.run(a, b, c))
    np.testing.assert_allclose(out, np.full((m, n), float(k)), rtol=1e-5)


def test_rung14_chooser_invariants():
    """choose_blocks_bt: blocks must tile the padded operands, stay
    within the measured-good strip cap, and keep the double-buffered
    footprint under the 28 MB budget for every sweep-like shape."""
    from how_to_optimize_gemm_tpu.ops.pallas_int8 import choose_blocks_bt

    for p in (128, 512, 1024, 1536, 2048, 2560, 3072, 3584, 4096, 11008,
              100, 640, 5632):
        bm, bn, bk = choose_blocks_bt(p, p, p)
        assert bm % 128 == 0 and bn % 128 == 0 and bk % 512 == 0
        assert bm <= 1792
        footprint = 2 * bm * bk + 2 * bn * bk + 3 * bm * bn * 4
        assert footprint <= 28 * 1024 * 1024, (p, footprint)


def test_rung14_odd_shapes_interpret():
    """Boundary handling: rung 14 pads/crops like every other rung."""
    import jax
    import numpy as np
    from how_to_optimize_gemm_tpu.ops import pallas_int8, pallas_manual_dma
    from how_to_optimize_gemm_tpu.utils.matrices import make_abc

    a, b, c = make_abc(jax.random.PRNGKey(0), 200, 320, 130)
    qa, sa, qbt, sb = pallas_manual_dma.prepare_packed(a, b)
    out = np.asarray(pallas_int8.mmult_q_bt(qa, sa, qbt, sb, c,
                                            interpret=True))
    from how_to_optimize_gemm_tpu.ops import quant
    ref = (np.asarray(quant.dequantize(qa, sa), np.float64)
           @ np.asarray(quant.dequantize(qbt.T, sb), np.float64)
           + np.asarray(c, np.float64))
    rel = float(np.max(np.abs(out - ref)) / np.max(np.abs(ref)))
    assert rel < 1e-4, rel


def test_ragged_m_plan_invariants():
    """Strip plans cover mp exactly: aligned offsets, no gaps, and the
    two-call form only when it saves a strip over the uniform plan."""
    from how_to_optimize_gemm_tpu.ops.pallas_int8 import ragged_m_plan
    for mp in (128, 256, 1152, 1280, 2048, 3584, 4096, 8192):
        for cap in (512, 1024, 1664, 1792):
            plan = ragged_m_plan(mp, cap)
            rows = 0
            for bm, gm, off in plan:
                assert bm % 128 == 0 and bm <= max(cap, 128)
                assert off * bm == rows, (mp, cap, plan)
                rows += bm * gm
            assert rows == mp, (mp, cap, plan)
    assert ragged_m_plan(4096, 1664) == [(1536, 2, 0), (1024, 1, 3)]
