#!/usr/bin/env python
"""Identify the named custom-calls in the compiled bench train step.

The device-trace rollup (scripts/analyze_trace.py) reports opaque names like
`custom-call.17`; this dumps each custom-call instruction in the compiled
step's HLO with its call target and shapes so the trace rows can be mapped
to framework ops (Cholesky, triangular solves, Pallas kernels).

    python scripts/diag_hlo_customcalls.py [--scale]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", action="store_true")
    cli = ap.parse_args()

    import jax
    cache_dir = os.environ.get("GPODE_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/gpode_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from gpode_tpu.models import gp
    from gpode_tpu.train.bench_setup import build_bench_problem
    from gpode_tpu.train.builders import shooting_loss_fn
    from gpode_tpu.train.trainer import make_train_step

    args, params, ys, ts = build_bench_problem(scale=cli.scale)
    loss_fn = shooting_loss_fn(args)
    key = jax.random.PRNGKey(1)

    gp.set_pallas_rhs(True)
    opt = optax.adam(5e-3)
    step = make_train_step(loss_fn, opt)   # already a jitted callable
    opt_state = opt.init(params)

    text = step.lower(params, opt_state, key, ys, ts).compile().as_text()
    gp.set_pallas_rhs(None)

    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.-]*custom-call[\w.]*)\s*=\s*([^\n]*?)"
        r"custom_call_target=\"([^\"]+)\"", re.M)
    for m in pat.finditer(text):
        name, head, target = m.groups()
        shape = head.split(" custom-call")[0].strip()
        print(f"{name:22s} target={target:32s} out={shape[:90]}")


if __name__ == "__main__":
    main()
