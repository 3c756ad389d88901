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

    import jax.numpy as jnp
    import numpy as np

    from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
    from gpode_tpu.train.builders import (ModelArgs, build_shooting,
                                          shooting_loss_fn)

    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data/mocap")
    data_pca = MocapDataset(data_path=data_dir, subject="09", pca_components=5,
                            data_normalize=False, pca_normalize=True,
                            seqlen=100)
    data_full = MocapDataset(data_path=data_dir, subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=100)
    projector = latent_to_data_projector(data_pca)

    m, s = (256, 32) if a.scale else (100, 5)
    base = ModelArgs(num_inducing=m, num_features=256, dimwise=True,
                     solver="dopri5", ts_dense_scale=2, max_steps=8,
                     first_step=-1.0, num_samples=s)
    params = build_shooting(jax.random.PRNGKey(0), base, data_pca.trn.ys,
                            projector=projector,
                            full_dim=data_full.trn.ys.shape[-1])
    ys = jnp.asarray(data_full.trn.ys)
    ts = jnp.asarray(data_pca.trn.ts)
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
