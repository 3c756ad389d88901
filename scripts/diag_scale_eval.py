#!/usr/bin/env python
"""Diagnose the scale-config val/test split: eval-budget sensitivity.

The 256-inducing scale run reports val LL ~-1.45 (32 draws) but test LL
~-2.7 (128 draws). Hypothesis: the batched 128-draw whole-trajectory solve
shares ONE step controller (max-RMS over the draw axis), so a single stiff
draw forces small steps for the whole batch and the eval budget exhausts ->
constant-state fallback for the tail (ops/ode.py budget semantics) ->
catastrophic MSE. This script loads a trained checkpoint and scores the test
split across (num_draws, max_steps), reporting the solver's covered-output
counter alongside LL/MSE.

    python scripts/diag_scale_eval.py --ckpt /tmp/r3_scale_ctl/checkpt.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--num_inducing", type=int, default=256)
    ap.add_argument("--num_samples", type=int, default=32)
    ap.add_argument("--draws", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--budgets", type=int, nargs="+", default=[512, 2048])
    a = ap.parse_args()

    import jax

    if a.platform:
        jax.config.update("jax_platforms", a.platform)

    import jax.numpy as jnp
    import numpy as np

    from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
    from gpode_tpu.models import gp, gpode
    from gpode_tpu.models.flow import flow_forward_batched
    from gpode_tpu.models.likelihoods import project
    from gpode_tpu.train.builders import ModelArgs
    from gpode_tpu.train.metrics import compute_summary
    from gpode_tpu.utils.checkpoint import load_checkpoint

    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data/mocap")
    data_pca = MocapDataset(data_path=data_dir, subject="09", pca_components=5,
                            data_normalize=False, pca_normalize=True,
                            seqlen=100)
    data_full = MocapDataset(data_path=data_dir, subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=100)
    projector = latent_to_data_projector(data_pca)

    ck = load_checkpoint(a.ckpt)
    params = ck["params"]
    x0_post = params.states.x0 if hasattr(params, "states") else params.x0
    vparams = gpode.GPODEParams(gp=params.gp, x0=x0_post,
                                likelihood=params.likelihood)
    nv = np.asarray(params.likelihood.variance)

    base = ModelArgs(num_inducing=a.num_inducing, num_features=256,
                     dimwise=True, solver="dopri5", ts_dense_scale=2,
                     max_steps=8, num_samples=a.num_samples)
    test_ts = jnp.asarray(data_pca.tst.ts)
    test_x0 = jnp.asarray(data_pca.tst.ys[:, 0])
    key = jax.random.PRNGKey(11)

    import dataclasses
    report = []
    for budget in a.budgets:
        cfg = dataclasses.replace(base.solver_config(), max_steps=budget,
                                  first_step=None)
        for s in a.draws:
            chol = gp.precompute_chol(vparams.gp)
            draw_keys = jax.random.split(key, s)
            draws = jax.vmap(lambda k: gp.draw_posterior(
                k, vparams.gp, 256, chol))(draw_keys)
            starts = jnp.broadcast_to(test_x0, (s,) + test_x0.shape)
            zs, stats = flow_forward_batched(vparams.gp, draws, starts,
                                             test_ts, cfg)
            ys = np.asarray(project(projector, zs))
            ll, mse = compute_summary(data_full.tst.ys, ys, nv)
            row = dict(budget=budget, draws=s, test_ll=round(ll, 3),
                       test_mse=round(mse, 2),
                       ncov=int(stats.num_covered), T=int(test_ts.shape[0]),
                       natt=int(stats.num_attempted))
            report.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"rows": report}))


if __name__ == "__main__":
    main()
