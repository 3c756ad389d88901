#!/usr/bin/env python
"""Cross-evaluate trained MoCap checkpoints under different eval solvers.

Separates trained-field quality from eval-integration effects: a checkpoint
trained with solver A is scored with both A and B eval configs. Usage:
    python scripts/diag_cross_eval.py /tmp/r2_mocap_dopri5 /tmp/r2_mocap_rk4
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
from gpode_tpu.models import gpode
from gpode_tpu.models.flow import SolverConfig
from gpode_tpu.models.likelihoods import project
from gpode_tpu.train.builders import ModelArgs, build_shooting
from gpode_tpu.train.metrics import compute_summary
from gpode_tpu.utils.checkpoint import load_checkpoint


def main():
    data_pca = MocapDataset(data_path="data/mocap", subject="09",
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, dt=0.01, seqlen=100)
    data_full = MocapDataset(data_path="data/mocap", subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, dt=0.01, seqlen=100)
    projector = latent_to_data_projector(data_pca)

    margs = ModelArgs(num_inducing=100, num_features=256, num_samples=5)
    template = build_shooting(jax.random.PRNGKey(0), margs, data_pca.trn.ys,
                              projector=projector,
                              full_dim=data_full.trn.ys.shape[-1])
    treedef = jax.tree_util.tree_structure(template)

    eval_cfgs = {
        "dopri5": SolverConfig(solver="dopri5", rtol=1e-6, atol=1e-6,
                               max_steps=512),
        "rk4_s1": SolverConfig(solver="rk4", ts_dense_scale=2),
        "rk4_s8": SolverConfig(solver="rk4", ts_dense_scale=9),
    }

    for ckpt_dir in sys.argv[1:]:
        state = load_checkpoint(os.path.join(ckpt_dir, "checkpt.npz"))
        params = jax.tree_util.tree_unflatten(
            treedef, jax.tree_util.tree_leaves(state["params"]))
        vparams = gpode.GPODEParams(gp=params.gp, x0=params.states.x0,
                                    likelihood=params.likelihood)
        noise_var = np.asarray(params.likelihood.variance)
        for name, cfg in eval_cfgs.items():
            k = jax.random.PRNGKey(42)
            zs = gpode.predict(k, vparams, jnp.asarray(data_pca.tst.ts), cfg,
                               margs.num_features, num_draws=128,
                               x0=jnp.asarray(data_pca.tst.ys[:, 0]))
            ys_pred = np.asarray(project(projector, zs))
            ll, mse = compute_summary(data_full.tst.ys, ys_pred, noise_var)
            print(f"{os.path.basename(ckpt_dir)} evaluated with {name}: "
                  f"TEST LL {ll:.3f} | MSE {mse:.3f}", flush=True)


if __name__ == "__main__":
    main()
