"""Rung 17 (hand emit_pipeline schedule) — parity with rung 14.

The rung's claim is schedule-only: identical operands, blocks, dot and
epilogue op sequence as rung 14, so outputs must be BIT-identical (int32
accumulation is associative/exact; the fp32 epilogue op order is the
same). Buffer-depth knobs change the DMA schedule, never the numerics.
"""
import jax
import numpy as np
import pytest

from how_to_optimize_gemm_tpu.ops import pallas_emit_pipeline, pallas_int8
from how_to_optimize_gemm_tpu.ops.pallas_manual_dma import prepare_packed
from how_to_optimize_gemm_tpu.utils.matrices import make_abc

SHAPES = [
    (256, 256, 256),
    (384, 384, 384),      # non-block-multiple: padding + crop
    (200, 136, 72),       # nothing aligned
    (512, 256, 1024),     # rectangular, k > m
]


def _prepared(shape):
    m, n, k = shape
    key = jax.random.PRNGKey(hash(("r17", shape)) % (2 ** 31))
    a, b, c = make_abc(key, m, n, k)
    return prepare_packed(a, b), c


@pytest.mark.parametrize("shape", SHAPES)
def test_bit_identical_to_rung14(shape):
    ops, c = _prepared(shape)
    want = np.asarray(pallas_int8.mmult_q_bt(*ops, c))
    got = np.asarray(pallas_emit_pipeline.mmult_q_bt_hand(*ops, c))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("b_buffers", [2, 4])
@pytest.mark.parametrize("a_lookahead", [False, True])
def test_buffer_knobs_are_schedule_only(b_buffers, a_lookahead):
    ops, c = _prepared((384, 384, 384))
    want = np.asarray(pallas_emit_pipeline.mmult_q_bt_hand(*ops, c))
    got = np.asarray(pallas_emit_pipeline.mmult_q_bt_hand(
        *ops, c, b_buffers=b_buffers, a_lookahead=a_lookahead))
    np.testing.assert_array_equal(got, want)


def test_registered_on_ladder():
    from how_to_optimize_gemm_tpu.ops import registry
    rung = registry.get("17_hand_pipeline_int8")
    # kept as an HONEST REGRESSION (03b/12/13 tradition): every
    # buffer/lookahead config measured ~1% under rung 14 on the chip
    assert rung.dtype == "int8" and rung.regression
