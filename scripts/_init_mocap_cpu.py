#!/usr/bin/env python
"""MoCap shooting-GPODE initialization pipeline, pinned to the CPU backend.

Subprocess worker for `bench_time_to_nll.py`: the data-driven init
(k-means inducing + ridge regression + backward state integration + 16-draw
noise-variance predict, `train/experiments.py run_mocap`) is tiny compute but
compiles three distinct solver programs — through the TPU tunnel that costs
200-400 s of compile wall; on the local CPU backend it is ~60 s TOTAL and
runs CONCURRENTLY with the main process's TPU AOT compiles (the tunnel
compiles are server-side, so the one local core is free). The measured
persistent-cache behavior makes this the only way to hide init: cache
lookups hit but executable deserialization through the tunnel costs as much
as compiling (round-5 probe, PROFILE.md).

Writes a checkpoint npz {params, resid_var} the parent loads and
`jax.device_put`s onto the TPU.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="official",
                    choices=["official", "fast", "scale", "m256", "m256_fast"])
    ap.add_argument("--subject", default="09")
    ap.add_argument("--seqlen", type=int, default=100)
    ap.add_argument("--seed", type=int, default=121)
    ap.add_argument("--num_samples", type=int, default=0,
                    help="override the preset's MC draw count (0 = keep)")
    ap.add_argument("--no_noisevar", action="store_true",
                    help="skip the 16-draw noise-variance predict (the "
                         "parent runs it as an AOT-compiled TPU program)")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    import jax
    # env-var platform pins are ignored in this image (the axon
    # sitecustomize re-registers the TPU plugin); this is the reliable pin
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
    from gpode_tpu.models import gpode
    from gpode_tpu.models.init import (initialize_inducing,
                                       initialize_kernel_parameters,
                                       initialize_noisevar,
                                       initialize_shooting_states_with_data)
    from gpode_tpu.models.likelihoods import project
    from gpode_tpu.train.bench_setup import preset_model_args
    from gpode_tpu.train.builders import build_shooting
    from gpode_tpu.utils.checkpoint import save_checkpoint

    t0 = time.perf_counter()
    margs = preset_model_args(a.preset)
    if a.num_samples:
        margs = dataclasses.replace(margs, num_samples=a.num_samples)
    cfg = margs.solver_config()
    eval_cfg = dataclasses.replace(cfg, max_steps=max(512, cfg.max_steps),
                                   first_step=None)

    data_dir = os.path.join(_REPO, "data/mocap")
    data_pca = MocapDataset(data_path=data_dir, subject=a.subject,
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, seqlen=a.seqlen)
    data_full = MocapDataset(data_path=data_dir, subject=a.subject,
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=a.seqlen)
    projector = latent_to_data_projector(data_pca)

    key = jax.random.PRNGKey(a.seed)
    k_build, k_init, k_noise, _, _ = jax.random.split(key, 5)
    rng = np.random.RandomState(a.seed)

    # the run_mocap initialization pipeline (train/experiments.py)
    params = build_shooting(k_build, margs, data_pca.trn.ys,
                            projector=projector,
                            full_dim=data_full.trn.ys.shape[-1])
    params = params._replace(gp=initialize_kernel_parameters(
        params.gp, lengthscale_value=1.25, variance_value=0.5))
    params = params._replace(gp=initialize_inducing(
        params.gp, data_pca.trn.ys, float(data_pca.trn.ts.max()), 1e0,
        rng=rng))
    params = initialize_shooting_states_with_data(
        k_init, params, data_pca.trn.ys, data_pca.trn.ts, eval_cfg,
        margs.num_features)
    resid_var = None
    if not a.no_noisevar:
        vparams = gpode.GPODEParams(gp=params.gp, x0=params.states.x0,
                                    likelihood=params.likelihood)
        init_zs = gpode.predict(k_noise, vparams,
                                jnp.asarray(data_pca.trn.ts), eval_cfg,
                                margs.num_features, num_draws=16)
        init_ys = np.asarray(project(projector, init_zs))
        resid_var = (data_full.trn.ys[None] - init_ys).var(
            axis=(0, 1, 2)) + 1e-4
        params = params._replace(likelihood=initialize_noisevar(
            params.likelihood, 1.5 * resid_var))

    save_checkpoint(a.out, {"params": params, "resid_var": resid_var})
    print(f"_init_mocap_cpu: wrote {a.out} in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
