"""Fused device-side evaluation: predict -> project -> mixture metrics.

One jitted program per (data split, draw count): the 128-draw posterior
predictive (`gpode.predict`, the batched-draw solve), the latent->data
projection, and the mixture LL/MSE reduction all run on device and only TWO
scalars cross the tunnel. Replaces the host pipeline (fetch (S, N, T, D_full)
-> numpy logsumexp) for in-training tracking evals, where the fetch + host
reduction cost more than the solve (VERDICT r4 item 1; the reference's
equivalent is a 128-iteration serial Python loop, `src/gpode/model_builder
.py:60-78` + host scipy metrics `:99-120`).

The returned scorer is a plain `jax.jit` function, so callers can AOT-compile
it (`scorer.lower(...).compile()`) in a background thread while training
runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gpode_tpu.models import gpode
from gpode_tpu.models.flow import SolverConfig
from gpode_tpu.models.likelihoods import Projector, project
from gpode_tpu.train.metrics import mixture_summary_device


def make_projected_scorer(eval_cfg: SolverConfig, num_features: int,
                          projector: Optional[Projector],
                          ys_true, ts, x0, num_draws: int,
                          t0_shift: Optional[float] = None):
    """Build `scorer(vparams, key) -> (ll, mse)`, fully on device.

    vparams: `gpode.GPODEParams` (for shooting models pass
    `GPODEParams(gp=p.gp, x0=p.states.x0, likelihood=p.likelihood)`).
    ys_true: ground truth in OBSERVATION space — (N, T, D_full) when a
    projector is given, latent space otherwise. x0: (N, D) start states for
    `compute_test_predictions`-style scoring, or None to sample q(x0).
    """
    ys_true = jnp.asarray(ys_true)
    ts = jnp.asarray(ts)
    x0 = None if x0 is None else jnp.asarray(x0)

    @jax.jit
    def scorer(vparams: gpode.GPODEParams, key: jax.Array):
        zs = gpode.predict(key, vparams, ts, eval_cfg, num_features,
                           num_draws=num_draws, x0=x0, t0_shift=t0_shift)
        ys_pred = zs if projector is None else project(projector, zs)
        return mixture_summary_device(ys_true, ys_pred,
                                      vparams.likelihood.variance)

    return scorer
