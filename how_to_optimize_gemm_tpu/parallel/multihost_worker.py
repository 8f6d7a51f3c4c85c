"""Multi-host (multi-process) bring-up worker.

SURVEY.md §2.6 names the DCN/multi-host slot: the reference is
explicitly single-process single-thread (``aarch64/makefile:39-40``
pins OMP_NUM_THREADS=1); this framework's inversion of that pin is
``jax.distributed.initialize`` + SPMD collectives across process
boundaries. ``mesh.init_distributed`` wires the call, and this worker
is the code path that EXECUTES it: N processes, each owning
``--local-devices`` virtual CPU devices, form one global mesh and run

1. a psum across every device (the cross-process collective smoke),
2. the dp+tp-sharded training step (dp spans the process boundary —
   the DCN analogue; tp stays inside a process — the ICI analogue),
3. a tp-sharded decode step over ALL devices (tensor-parallel serving
   where every layer's psum crosses the process boundary).

Every process runs the same SPMD program; process 0 prints one
``MULTIHOST OK`` line with the checked numbers. Launched by
``tests/test_multihost.py`` as a real 2-process cluster on
127.0.0.1 — the same entrypoint works unchanged on a real multi-host
TPU slice (coordinator = host 0's address).

Run (one process of N):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m how_to_optimize_gemm_tpu.parallel.multihost_worker \
        --coordinator 127.0.0.1:9911 --num-processes 2 --process-id 0
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    args = p.parse_args(argv)

    # init_distributed must run before the first backend touch; the
    # conftest-style platform pin is the caller's job (env vars).
    from how_to_optimize_gemm_tpu.parallel.mesh import (
        init_distributed, make_mesh)
    pid = init_distributed(coordinator=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_global = args.num_processes * args.local_devices
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == args.local_devices

    # ---- 1. global psum: every device contributes its global index.
    devices = jax.devices()  # global, deterministic order
    mesh = make_mesh(dp=args.num_processes,
                     tp=args.local_devices, devices=devices)
    sh = NamedSharding(mesh, P("dp", "tp"))

    def shard_value(idx):
        # value = global device linear index, one scalar per device
        return np.arange(n_global, dtype=np.float32).reshape(
            args.num_processes, args.local_devices)[idx]

    x = jax.make_array_from_callback(
        (args.num_processes, args.local_devices), sh, shard_value)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    want = n_global * (n_global - 1) / 2
    got = float(np.asarray(jax.device_get(total)))
    assert got == want, (got, want)

    # ---- 2. dp+tp train step (dp = the cross-process axis).
    from how_to_optimize_gemm_tpu.models import llama
    from how_to_optimize_gemm_tpu.parallel.sharding import (
        make_sharded_train_step, shard_params)

    dp, tp = args.num_processes, args.local_devices
    cfg = llama.LlamaConfig(vocab=128, d_model=16 * tp, n_layers=2,
                            n_heads=tp, n_kv_heads=tp, d_ff=32 * tp,
                            max_seq=32, weight_kind="fp32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    # host-replicated numpy first: device_put of a committed single-
    # device jax.Array onto a sharding spanning OTHER processes'
    # devices is not defined; identical host data on every process is.
    params = jax.tree.map(np.asarray, params)
    params = shard_params(params, mesh)
    step, token_sharding = make_sharded_train_step(cfg, mesh, lr=0.1)
    tok_host = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (2 * dp, 16), 0,
                           cfg.vocab), np.int32)
    tokens = jax.make_array_from_callback(
        tok_host.shape, token_sharding, lambda idx: tok_host[idx])
    params, loss = step(params, tokens)
    jax.block_until_ready(params)
    loss = float(np.asarray(jax.device_get(loss)))
    assert np.isfinite(loss), loss

    # ---- 3. tp=ALL decode step: per-layer psum crosses the boundary.
    smesh = make_mesh(dp=1, tp=n_global, devices=devices)
    scfg = llama.LlamaConfig(vocab=128, d_model=16 * n_global,
                             n_layers=2, n_heads=n_global,
                             n_kv_heads=n_global, d_ff=32 * n_global,
                             max_seq=32, weight_kind="fp32")
    sparams = llama.init_params(jax.random.PRNGKey(2), scfg)
    sparams = shard_params(jax.tree.map(np.asarray, sparams), smesh)
    cache = llama.init_kv_cache(scfg, batch=2)
    rep = NamedSharding(smesh, P())
    cache = jax.device_put(jax.tree.map(np.asarray, cache), rep)
    toks = jax.device_put(np.array([[3], [5]], np.int32), rep)
    pos = jax.device_put(np.zeros((2,), np.int32), rep)

    @jax.jit
    def step(params, cache, toks, pos):
        logits, cache = llama.decode_step(params, scfg, cache,
                                          toks, pos, use_pallas=False)
        return jnp.argmax(logits[:, -1], -1), cache

    emitted = []
    for _ in range(3):
        nxt, cache = step(sparams, cache, toks, pos)
        nxt = np.asarray(jax.device_get(nxt))
        emitted.append(nxt.tolist())
        toks = jax.device_put(jnp.asarray(nxt)[:, None], rep)
        pos = pos + 1

    if pid == 0:
        print(f"MULTIHOST OK processes={jax.process_count()} "
              f"devices={n_global} psum={got:.0f} loss={loss:.4f} "
              f"decode={emitted}", flush=True)


if __name__ == "__main__":
    main()
