"""Device mesh construction.

Axis convention used across the framework:
- ``dp``: data/batch parallel (maps to DCN across hosts, or ICI)
- ``tp``: tensor parallel (must ride ICI — weight shards exchange
  activations every layer)
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    tp=None uses all remaining devices. The tp axis is innermost so that
    adjacent devices (ICI neighbors on a real slice) hold the
    tensor-parallel group.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        assert n % dp == 0, (n, dp)
        tp = n // dp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
