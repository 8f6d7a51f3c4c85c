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


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` with the
    standard TPU-pod env autodetection (on Cloud TPU the arguments are
    discovered from the metadata server; pass them explicitly elsewhere).
    Returns the local process index. After this, ``jax.devices()`` spans
    the whole slice and ``make_mesh`` shards across hosts: dp over DCN,
    tp within each host's ICI domain. No-op if already initialized or
    single-process (the sandbox case — this entrypoint is exercised for
    real on multi-host slices)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        if coordinator is not None or num_processes is not None:
            # the caller asked for a SPECIFIC topology: a failure there
            # is a real bring-up error, not "already initialized" —
            # swallowing it would silently run on a fraction of the pod
            raise
        pass  # autodetect path: single-process or already initialized
    return jax.process_index()


def make_mesh(dp: int = 1, tp: int | None = None,
              devices=None, allow_subset: bool = False) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    tp=None uses all remaining devices. The tp axis is innermost so that
    adjacent devices (ICI neighbors on a real slice) hold the
    tensor-parallel group.

    By default dp*tp must cover ALL given devices — a mistyped smaller
    topology silently running on a fraction of the slice is exactly the
    bug an exact-match assert catches. Pass allow_subset=True to
    intentionally use a prefix (e.g. scaling studies over sub-meshes).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        assert n % dp == 0, (n, dp)
        tp = n // dp
    if allow_subset:
        assert dp * tp <= n, f"dp*tp={dp * tp} > {n} devices"
    else:
        assert dp * tp == n, (
            f"dp*tp={dp * tp} != {n} devices; pass allow_subset=True to "
            "deliberately run on a device prefix")
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_axis_mesh(devices=None, **axes: int) -> Mesh:
    """Mesh with arbitrary named axes, e.g. ``make_axis_mesh(pp=4, ep=2)``.

    Axis order is the kwarg order, innermost last — put the
    bandwidth-hungry axis (tp/ep all_to_all traffic, pp neighbor hops)
    innermost so its groups are ICI neighbors on a real slice. The axis
    product must cover ALL given devices (same rationale as make_mesh)."""
    assert axes, "need at least one axis"
    devices = list(devices if devices is not None else jax.devices())
    n = 1
    for v in axes.values():
        n *= v
    assert n == len(devices), (
        f"product of {axes} = {n} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(arr, axis_names=tuple(axes))
