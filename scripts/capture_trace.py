#!/usr/bin/env python
"""Capture a jax.profiler trace of N bench-config train steps, nothing else.

Minimal sibling of profile_step.py for when only the device trace is wanted:
builds the bench.py default MoCap shooting step (dopri5, Pallas megakernels),
compiles + warms it OUTSIDE the trace window, then traces `--steps` warm
iterations. Analyze with scripts/analyze_trace.py.

    python scripts/capture_trace.py --out /tmp/trace_r3 [--steps 5] [--scale]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/trace_r3")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--scale", action="store_true")
    ap.add_argument("--pallas", type=str, default="true",
                    help="true/false/auto: force the fused Pallas rhs")
    cli = ap.parse_args()

    import jax
    cache_dir = os.environ.get("GPODE_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/gpode_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpode_tpu.models import gp
    from gpode_tpu.train.bench_setup import build_bench_problem
    from gpode_tpu.train.builders import shooting_loss_fn
    from gpode_tpu.train.trainer import default_optimizer, make_train_step

    args, params, ys, ts = build_bench_problem(scale=cli.scale)
    loss_fn = shooting_loss_fn(args)
    key = jax.random.PRNGKey(1)

    if cli.pallas != "auto":
        gp.set_pallas_rhs(cli.pallas == "true")
    opt = default_optimizer(5e-3)
    step = make_train_step(loss_fn, opt)
    opt_state = opt.init(params)

    for _ in range(5):  # compile + warm OUTSIDE the trace
        params, opt_state, key, terms = step(params, opt_state, key, ys, ts)
    float(terms.loss)

    with jax.profiler.trace(cli.out):
        for _ in range(cli.steps):
            params, opt_state, key, terms = step(params, opt_state, key,
                                                 ys, ts)
        float(terms.loss)
    gp.set_pallas_rhs(None)
    print(f"trace written to {cli.out} ({cli.steps} steps)", flush=True)


if __name__ == "__main__":
    main()
