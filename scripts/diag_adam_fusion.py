#!/usr/bin/env python
"""A/B: does fusing Adam's per-leaf update ops into one flat-vector update
(optax.flatten) or donating the step's carry buffers move the official bench
step? The round-3 trace rollup attributes ~0.37 ms/step to <40 us ops (state
sampling, ELBO terms, RNG, Adam) at the official config; params are 14 leaves
/ 155 KB, so Adam is ~40 of those tiny ops.

    python scripts/diag_adam_fusion.py [--iters 200] [--scale]

Prints per-variant steps/s over median-of-3 full windows (bench.py method).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--scale", action="store_true")
    cli = ap.parse_args()

    import jax
    cache_dir = os.environ.get("GPODE_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/gpode_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gpode_tpu.models import gp
    from gpode_tpu.train.bench_setup import build_bench_problem
    from gpode_tpu.train.builders import shooting_loss_fn
    from gpode_tpu.train.trainer import make_step_bodies

    args, params0, ys, ts = build_bench_problem(scale=cli.scale)
    loss_fn = shooting_loss_fn(args)
    gp.set_pallas_rhs(True)

    def loss_at(p, sub, itr, *batch):
        return loss_fn(p, sub, *batch)

    def run(tag, opt, donate):
        step_body, _ = make_step_bodies(loss_at, opt)
        step = (jax.jit(step_body, donate_argnums=(0, 1))
                if donate else jax.jit(step_body))
        # fresh buffers per variant: donated ones are deleted by the step
        params = jax.tree_util.tree_map(jnp.copy, params0)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(1)
        # compile + warm
        for _ in range(3):
            params, opt_state, key, terms = step(params, opt_state, key,
                                                 ys, ts)
        float(terms.loss)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(cli.iters):
                params, opt_state, key, terms = step(params, opt_state, key,
                                                     ys, ts)
            final = float(terms.loss)
            windows.append(cli.iters / (time.perf_counter() - t0))
        sps = float(np.median(windows))
        print(json.dumps({"variant": tag, "steps_per_sec": round(sps, 2),
                          "ms_per_step": round(1e3 / sps, 3),
                          "windows": [round(w, 2) for w in windows],
                          "final_loss": round(final, 4)}))
        return sps

    base = run("adam", optax.adam(5e-3), donate=False)
    run("adam+donate", optax.adam(5e-3), donate=True)
    run("flatten(adam)", optax.flatten(optax.adam(5e-3)), donate=False)
    run("flatten(adam)+donate", optax.flatten(optax.adam(5e-3)), donate=True)
    gp.set_pallas_rhs(None)


if __name__ == "__main__":
    main()
