#!/usr/bin/env python
"""Compiled-memory comparison of the three backward strategies.

XLA's memory analysis of the jitted shooting ELBO+grad step at a chosen
config, for (a) plain taping, (b) remat=True (rematerialized rhs), and
(c) use_adjoint=True (O(1)-memory continuous adjoint): quantifies the
memory/FLOP trade the `--remat` and `--use_adjoint` flags buy — the evidence
RESULTS.md cites for the scale config. AOT lower+compile only; nothing runs.

    python scripts/diag_memory.py [--scale] [--platform cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", action="store_true",
                    help="256 inducing / 32 draws (BASELINE graded config 5)")
    ap.add_argument("--platform", default=None)
    a = ap.parse_args()

    import jax

    if a.platform:
        jax.config.update("jax_platforms", a.platform)

    import dataclasses

    from gpode_tpu.train.bench_setup import bench_model_args, build_bench_problem
    from gpode_tpu.train.builders import shooting_loss_fn

    # same graded configs as bench.py, but with the scale config's remat OFF:
    # the taped-vs-remat-vs-adjoint comparison below toggles it per variant.
    # AOT lower+compile only, so skip the device-side initialization.
    base = dataclasses.replace(bench_model_args(scale=a.scale), remat=False)
    base, params, ys, ts = build_bench_problem(args=base, initialize=False)
    key = jax.random.PRNGKey(1)

    variants = {
        "taped": base,
        "remat": dataclasses.replace(base, remat=True),
        "adjoint": dataclasses.replace(base, use_adjoint=True,
                                       first_step=None),
    }
    report = {}
    for name, margs in variants.items():
        loss_fn = shooting_loss_fn(margs)

        def value_and_grad(p, k, ys, ts):
            return jax.value_and_grad(loss_fn, has_aux=True)(p, k, ys, ts)

        try:
            compiled = (jax.jit(value_and_grad)
                        .lower(params, key, ys, ts).compile())
            mem = compiled.memory_analysis()
            report[name] = {
                "temp_MiB": round(mem.temp_size_in_bytes / 2**20, 1),
                "argument_MiB": round(mem.argument_size_in_bytes / 2**20, 1),
                "output_MiB": round(mem.output_size_in_bytes / 2**20, 1),
            }
        except Exception as e:  # e.g. OOM during compile on small hosts
            report[name] = {"error": str(e)[:200]}
        print(f"{name}: {json.dumps(report[name])}", flush=True)

    print(json.dumps({"config": "scale" if a.scale else "default",
                      "platform": jax.default_backend(), **report}))


if __name__ == "__main__":
    main()
