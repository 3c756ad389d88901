"""Worker for the 2-process CPU-cluster test (tests/test_multihost.py) and
the cross-process phase of `__graft_entry__.dryrun_multichip`.

Each process: joins the jax.distributed cluster, contributes
`--local_devices` virtual CPU devices, builds the IDENTICAL tiny shooting
problem, jits the full sharded train step over the GLOBAL mesh (dp spans
processes), runs `--steps` steps, and prints the (replicated) loss — the
parent asserts every process prints the same finite trajectory.

Usage: python tests/_multihost_worker.py --coordinator 127.0.0.1:PORT
       --num_processes 2 --process_id K [--local_devices 2] [--steps 2]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    a = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={a.local_devices}")
    import jax
    # env-var pins are ignored in this image (axon sitecustomize); this is
    # the reliable platform pin, and it must precede distributed init
    jax.config.update("jax_platforms", "cpu")

    from gpode_tpu.parallel import multihost
    multihost.initialize(a.coordinator, a.num_processes, a.process_id,
                         local_device_count=a.local_devices)

    import numpy as np

    from gpode_tpu.parallel.mesh import make_mesh, replicated, batch_sharding
    from gpode_tpu.parallel.train import make_sharded_shooting_step
    from gpode_tpu.train.builders import ModelArgs, build_shooting
    from gpode_tpu.train.trainer import default_optimizer

    n_global = a.num_processes * a.local_devices
    assert len(jax.devices()) == n_global, (
        f"global device count {len(jax.devices())} != {n_global}")
    assert jax.process_count() == a.num_processes

    # dp spans PROCESSES (the DCN axis); mc uses the within-process devices
    mesh = make_mesh({"dp": a.num_processes, "mc": a.local_devices})

    args = ModelArgs(num_inducing=8, num_features=16, solver="rk4",
                     ts_dense_scale=2, max_steps=8,
                     num_samples=2 * a.local_devices)
    rng = np.random.default_rng(0)
    n, t, d = 2 * a.num_processes, 6, 2
    ys_host = rng.normal(size=(n, t, d)).astype(np.float32)
    ts_host = (0.1 * np.arange(t)).astype(np.float32)
    params_host = build_shooting(jax.random.PRNGKey(0), args, ys_host)

    opt = default_optimizer(1e-2)
    step = make_sharded_shooting_step(mesh, args, opt)

    rep = replicated(mesh)
    params = multihost.global_put(params_host, rep)
    opt_state_host = jax.tree_util.tree_map(np.asarray,
                                            opt.init(params_host))
    opt_state = multihost.global_put(opt_state_host, rep)
    ys = multihost.global_put(ys_host, batch_sharding(mesh, "dp"))
    ts = multihost.global_put(ts_host, rep)
    key = multihost.global_put(np.asarray(jax.random.PRNGKey(7)), rep)

    for i in range(a.steps):
        params, opt_state, key, terms = step(params, opt_state, key, ys, ts)
        loss = float(multihost.fetch_replicated(terms.loss))
        print(f"MULTIHOST process={a.process_id} step={i} "
              f"loss={loss:.6f}", flush=True)
    print(f"MULTIHOST process={a.process_id} devices={n_global} "
          f"processes={jax.process_count()} OK", flush=True)


if __name__ == "__main__":
    main()
