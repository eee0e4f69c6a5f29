"""True multi-PROCESS validation of the sharded training step (DCN story).

The virtual 8-device CPU mesh used by the test suite validates sharding
semantics inside ONE process.  This module goes one step further and runs
the flagship training step across REAL process boundaries with
``jax.distributed``: N processes x M local CPU devices form one global
``(replica=N, data=M)`` mesh whose replica axis lies exactly on the process
boundary — the same topology statement as multi-host TPU slices, where the
process boundary is the DCN boundary (parallel/mesh.py docstring).  Each
process contributes only its LOCAL batch shard
(``jax.make_array_from_process_local_data``); the jitted step then executes
collectively, XLA inserting the hierarchical gradient reduction, and every
process checks the (replicated) updated parameters against an independent
local unsharded reference step — sharded == unsharded across processes, to f32
reduction-order tolerance.

Run it directly (spawns the workers itself):

    python -m multimodal_fusion_tpu.parallel.multihost --processes 2

or as one worker of an externally-launched gang (real multi-host pattern):

    python -m multimodal_fusion_tpu.parallel.multihost \
        --process_id 0 --processes 2 --coordinator 10.0.0.1:9999
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys
from typing import Optional

import numpy as np

LOCAL_DEVICES = 4


def _build_step_and_window(n_total: int, input_dim=32, wsi=16, tma=4):
    """Tiny flagship model + one training window of 2 cases/device, exactly
    the dryrun_multichip workload (__graft_entry__.py) in package form."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from multimodal_fusion_tpu.config import ModelConfig
    from multimodal_fusion_tpu.models.factory import ModelFactory
    from multimodal_fusion_tpu.train.optim import make_optimizer

    cfg = ModelConfig(
        model_type="svd_gate_random_clam",
        n_classes=2,
        input_dim=input_dim,
        model_size="32*16",
        dropout=0.25,
        output_dim=input_dim,
        channels_used_in_model=["wsi=features", "tma=cd3=features"],
    )
    model = ModelFactory.create_model(cfg, seed=0)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = make_optimizer("adam", 1e-5)
    opt_state = tx.init(params)

    G = 2 * n_total
    rng = np.random.default_rng(0)
    window = {
        "channels": {
            "wsi=features": rng.standard_normal((G, wsi, input_dim)).astype(np.float32),
            "tma=cd3=features": rng.standard_normal((G, tma, input_dim)).astype(np.float32),
        },
        "masks": {
            "wsi=features": np.broadcast_to(np.arange(wsi) < wsi - 2, (G, wsi)),
            "tma=cd3=features": np.ones((G, tma), bool),
        },
        "label": np.tile([0, 1], G // 2).astype(np.int32),
    }
    # raw uint32 key data (typed PRNG keys cannot cross the
    # make_array_from_process_local_data numpy boundary)
    keys = np.asarray(jax.random.key_data(jax.random.split(jax.random.key(0), G)))

    def train_step(params, rest, opt_state, window, key_data):
        keys = jax.vmap(jax.random.wrap_key_data)(key_data)
        def loss_fn(params):
            def one(channels, masks, label, key):
                m = nnx.merge(graphdef, params, rest)
                res = m(
                    {"channels": channels, "masks": masks}, label, key=key, train=True
                )
                return m.loss_fn(res["logits"], label[None], res), res

            losses, results = jax.vmap(one)(
                window["channels"], window["masks"], window["label"], keys
            )
            m = nnx.merge(graphdef, params, rest)
            gr = dict(results)
            gr["label"] = window["label"]
            return (jnp.sum(losses) + m.group_loss_fn(gr)) / window["label"].shape[0]

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -1e-4 * u, updates)
        )
        return params, opt_state

    return train_step, params, rest, opt_state, window, keys


def worker_main(
    process_id: int,
    num_processes: int,
    coordinator: str,
    local_devices: int = LOCAL_DEVICES,
    rtol: float = 2e-4,
) -> None:
    import os

    # the worker OWNS its device count: replace any inherited
    # xla_force_host_platform_device_count (e.g. the test suite's 8)
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp  # noqa: F401  (after backend init)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_total = num_processes * local_devices
    assert jax.device_count() == n_total, (jax.device_count(), n_total)

    # Process boundary on the replica (slow/DCN) axis: jax.devices() orders
    # all of process 0's devices before process 1's, so a plain reshape puts
    # each process's local devices contiguous along the data (fast) axis.
    mesh = Mesh(
        np.array(jax.devices()).reshape(num_processes, local_devices),
        ("replica", "data"),
    )
    data_sh = NamedSharding(mesh, P(("replica", "data")))
    rep_sh = NamedSharding(mesh, P())

    step, params, rest, opt_state, window, keys = _build_step_and_window(n_total)

    # Each process contributes ONLY its local slice of the global batch —
    # the host never holds remote shards, as on a real pod.
    G = window["label"].shape[0]
    rows = G // num_processes
    lo, hi = process_id * rows, (process_id + 1) * rows

    def to_global(x):
        return jax.make_array_from_process_local_data(data_sh, np.asarray(x[lo:hi]))

    g_window = jax.tree.map(to_global, window)
    g_keys = jax.make_array_from_process_local_data(
        data_sh, np.asarray(keys[lo:hi])
    )

    def rep(tree):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(rep_sh, np.asarray(x)),
            tree,
        )

    g_params, g_rest, g_opt = rep(params), rep(rest), rep(opt_state)

    with mesh:
        new_params, _ = jax.jit(step)(g_params, g_rest, g_opt, g_window, g_keys)
        jax.block_until_ready(new_params)

    # Independent local reference: the same step, unsharded, on the FULL
    # batch (deterministic from the shared seed).  Replicated outputs are
    # locally addressable, so each process verifies the collective result.
    ref_params, _ = jax.jit(step)(
        params, rest, opt_state, jax.tree.map(jnp.asarray, window), keys
    )
    max_rel = 0.0
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_params)):
        a = np.asarray(a.addressable_data(0))
        b = np.asarray(b)
        denom = np.maximum(np.abs(b), 1e-6)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    if max_rel > rtol:
        raise AssertionError(
            f"proc {process_id}: sharded != unsharded (max rel {max_rel:.2e})"
        )

    # Cross-process intra-slide hypergraph build: ONE slide's patch axis
    # sharded over the whole gang (hypergraph/build.py:_place_for_mesh
    # semantics), statistics checked against a local unsharded build.
    from multimodal_fusion_tpu.hypergraph.build import _fused_build

    rng = np.random.default_rng(1)
    n_patches = n_total * 16
    feats = rng.standard_normal((n_patches, 32)).astype(np.float32)
    pos = rng.standard_normal((n_patches, 2)).astype(np.float32)
    tma = rng.standard_normal((4, 32)).astype(np.float32)
    rows_p = n_patches // num_processes
    f_g = jax.make_array_from_process_local_data(
        data_sh, feats[process_id * rows_p:(process_id + 1) * rows_p]
    )
    p_g = jax.make_array_from_process_local_data(
        data_sh, pos[process_id * rows_p:(process_id + 1) * rows_p]
    )
    t_g = jax.make_array_from_process_local_data(rep_sh, tma)
    kd = np.asarray(jax.random.key_data(jax.random.key(0)))
    k_g = jax.make_array_from_process_local_data(rep_sh, kd)

    def build(key_data, f, p, t):
        return _fused_build(
            jax.random.wrap_key_data(key_data), f, p, t,
            jnp.int32(n_patches), 1.0, 1.0, 4, 2, 2, 3,
            full_stats=True, ship_cache=False,
        )
    with mesh:
        out = jax.jit(build)(k_g, f_g, p_g, t_g)
        jax.block_until_ready(out)
    ref_out = jax.jit(build)(
        jnp.asarray(kd), jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(tma)
    )
    stats = np.asarray(out["K_stats"].addressable_data(0))
    ref_stats = np.asarray(ref_out["K_stats"])
    if not np.allclose(stats, ref_stats, rtol=1e-4, atol=1e-6):
        raise AssertionError(
            f"proc {process_id}: sharded build stats {stats} != {ref_stats}"
        )

    print(
        f"multihost OK proc {process_id}/{num_processes}: mesh "
        f"(replica={num_processes}, data={local_devices}), "
        f"sharded==unsharded max rel {max_rel:.2e}; "
        f"cross-process slide build stats match",
        flush=True,
    )


def launch(num_processes: int = 2, local_devices: int = LOCAL_DEVICES,
           timeout: int = 600) -> str:
    """Spawn a local gang of workers (one subprocess per 'host') and verify
    they all report success; returns the combined output."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "multimodal_fusion_tpu.parallel.multihost",
                "--process_id", str(i), "--processes", str(num_processes),
                "--coordinator", coordinator,
                "--local_devices", str(local_devices),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(num_processes)
    ]
    outs = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
            if p.returncode != 0:
                raise RuntimeError(f"worker {i} failed:\n{out[-3000:]}")
            if f"multihost OK proc {i}/" not in out:
                raise RuntimeError(f"worker {i} produced no OK line:\n{out[-3000:]}")
    finally:
        # a failed/hung worker must not leak its siblings (they block in
        # jax.distributed.initialize on the dead coordinator)
        for q in procs:
            if q.poll() is None:
                q.kill()
    return "\n".join(outs)


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--process_id", type=int, default=None,
                   help="run as ONE worker of an externally launched gang")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--local_devices", type=int, default=LOCAL_DEVICES)
    args = p.parse_args(argv)
    if args.process_id is not None:
        worker_main(
            args.process_id, args.processes,
            args.coordinator or "127.0.0.1:12321", args.local_devices,
        )
    else:
        print(launch(args.processes, args.local_devices))


if __name__ == "__main__":
    main()
