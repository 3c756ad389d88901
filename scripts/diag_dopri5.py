#!/usr/bin/env python
"""Diagnose dopri5 training-gradient quality on MoCap shooting.

Round-1 finding (RESULTS.md): the rk4 fast path trains to test LL -1.46 while
dopri5 at the same 10k budget lands at ~-2.6. This driver measures, during
real training at the script defaults (max_steps=8, rtol=atol=1e-6):

  1. budget saturation: fraction of steps with num_attempted == max_steps;
  2. coverage failures: steps where num_covered < T (the constant fallback
     fired, cutting gradients through the dynamics);
  3. gradient fidelity: cosine similarity of the training gradient under the
     production solver config vs a ground-truth config (dopri5, budget 64),
     measured on identical keys at several points along the trajectory.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
from gpode_tpu.models import gpode
from gpode_tpu.models.init import (initialize_inducing,
                                   initialize_kernel_parameters,
                                   initialize_latents_with_data,
                                   initialize_noisevar,
                                   initialize_shooting_states_with_data)
from gpode_tpu.models.likelihoods import project
from gpode_tpu.models import shooting
from gpode_tpu.train.builders import (ModelArgs, build_shooting,
                                      default_frozen_predicate)
from gpode_tpu.train.trainer import build_frozen_mask


def build_mocap_shooting(margs, seed=121):
    key = jax.random.PRNGKey(seed)
    data_pca = MocapDataset(data_path="data/mocap", subject="09",
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, dt=0.01, seqlen=100)
    data_full = MocapDataset(data_path="data/mocap", subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, dt=0.01, seqlen=100)
    projector = latent_to_data_projector(data_pca)
    d_full = data_full.trn.ys.shape[-1]
    cfg = margs.solver_config()
    rng = np.random.RandomState(seed)
    k_build, k_init, k_noise, k_train, _ = jax.random.split(key, 5)
    params = build_shooting(k_build, margs, data_pca.trn.ys,
                            projector=projector, full_dim=d_full)
    params = params._replace(gp=initialize_kernel_parameters(
        params.gp, lengthscale_value=1.25, variance_value=0.5))
    params = params._replace(gp=initialize_inducing(
        params.gp, data_pca.trn.ys, float(data_pca.trn.ts.max()), 1e0, rng=rng))
    params = initialize_shooting_states_with_data(
        k_init, params, data_pca.trn.ys, data_pca.trn.ts, cfg,
        margs.num_features)
    vparams = gpode.GPODEParams(gp=params.gp, x0=params.states.x0,
                                likelihood=params.likelihood)
    init_zs = gpode.predict(k_noise, vparams, jnp.asarray(data_pca.trn.ts),
                            cfg, margs.num_features, num_draws=16)
    init_ys = np.asarray(project(projector, init_zs))
    resid_var = (data_full.trn.ys[None] - init_ys).var(axis=(0, 1, 2)) + 1e-4
    params = params._replace(likelihood=initialize_noisevar(
        params.likelihood, 1.5 * resid_var))
    ys = jnp.asarray(data_full.trn.ys)
    ts = jnp.asarray(data_pca.trn.ts)
    return params, ys, ts, k_train


def make_loss(margs, cfg):
    def loss_fn(params, key, ys, ts):
        return shooting.elbo_loss(key, params, ys, ts, cfg,
                                  margs.num_features,
                                  num_samples=margs.num_samples)
    return loss_fn


def flat(tree):
    return jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(tree)])


def cosine(a, b):
    return float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_iter", type=int, default=1000)
    ap.add_argument("--max_steps", type=int, default=8)
    ap.add_argument("--probe_every", type=int, default=100)
    ap.add_argument("--out", type=str, default="/tmp/diag_dopri5.json")
    a = ap.parse_args()

    margs = ModelArgs(num_inducing=100, num_features=256, solver="dopri5",
                      rtol=1e-6, atol=1e-6, max_steps=a.max_steps,
                      ts_dense_scale=2, num_samples=5)
    params, ys, ts, key = build_mocap_shooting(margs)
    cfg = margs.solver_config()
    loss_fn = make_loss(margs, cfg)

    # reference gradient configs, same ELBO / keys, different solver
    alt_cfgs = {
        "dopri5_b32": dataclasses.replace(cfg, max_steps=32, remat=True),
        "rk4_s1": dataclasses.replace(cfg, solver="rk4"),
        "rk4_s8": dataclasses.replace(cfg, solver="rk4", ts_dense_scale=9),
    }
    grad_fns = {name: jax.jit(jax.grad(make_loss(margs, c), has_aux=True))
                for name, c in alt_cfgs.items()}
    grad_fn_prod = jax.jit(jax.grad(loss_fn, has_aux=True))

    frozen = build_frozen_mask(params, default_frozen_predicate(margs))
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key, ys, ts):
        key, sub = jax.random.split(key)
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, sub, ys, ts)
        grads = jax.tree_util.tree_map(
            lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, terms, sub

    t_obs = int(ts[:2].shape[0])  # dense-output times per solve (=2)
    natts, ncovs, losses, probes = [], [], [], []
    pending = []
    for itr in range(1, a.num_iter + 1):
        if itr % a.probe_every == 1:
            # gradient fidelity probe at the CURRENT params with the NEXT key
            _, probe_key = jax.random.split(key)
            gp_prod, _ = grad_fn_prod(params, probe_key, ys, ts)
            fp = flat(gp_prod)
            row = {"iter": itr}
            for name, gfn in grad_fns.items():
                g_alt, _ = gfn(params, probe_key, ys, ts)
                row[f"cos_{name}"] = cosine(fp, flat(g_alt))
            probes.append(row)
            print(row, flush=True)
        params, opt_state, key, terms, _ = step(params, opt_state, key, ys, ts)
        pending.append(terms)
        if len(pending) >= 50:
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pending)
            host = jax.device_get(stacked)
            natts.extend(host.natt.tolist())
            ncovs.extend(host.ncov.tolist())
            losses.extend(host.loss.tolist())
            pending.clear()
    if pending:
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pending)
        host = jax.device_get(stacked)
        natts.extend(host.natt.tolist())
        ncovs.extend(host.ncov.tolist())
        losses.extend(host.loss.tolist())

    natts = np.asarray(natts); ncovs = np.asarray(ncovs)
    summary = {
        "max_steps": a.max_steps,
        "frac_budget_saturated": float(np.mean(natts == a.max_steps)),
        "frac_coverage_failed": float(np.mean(ncovs < t_obs)),
        "natt_mean": float(natts.mean()), "natt_max": int(natts.max()),
        "loss_first": losses[0], "loss_last": losses[-1],
        "probes": probes,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "probes"},
                     indent=2), flush=True)
    with open(a.out, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
