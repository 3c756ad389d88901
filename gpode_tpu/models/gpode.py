"""Vanilla GPODE: whole-trajectory ELBO and posterior-predictive sampling.

Rebuilds the reference's `SequenceModel` + experiment-toolkit loss/prediction
functions (`src/gpode/models.py:6-75`, `src/gpode/model_builder.py:46-96`) as
pure functions over a parameter pytree. The entire loss — posterior draw,
Cholesky, whitened solves, ODE integration, likelihood, KLs — traces into one
XLA program; prediction over S posterior draws is one `vmap` instead of the
reference's serial Python loop (`model_builder.py:60-78`).

ELBO (matching `gpode/models.py:45-66` term-for-term):
    loss = -( mean loglik  -  KL(q(x0))/num_obs  -  KL(q(u))/num_obs )
with num_obs = ys.size (= N*T*D, or N*T*D_full for projected likelihoods,
`model_builder.py:39-43`, `mocap_model_builder.py:39-46`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from gpode_tpu.models import gp
from gpode_tpu.models.flow import (SolverConfig, flow_forward_batched,
                                   flow_forward_sampled)
from gpode_tpu.models.likelihoods import (GaussianLikelihood,
                                          ProjectedGaussianLikelihood,
                                          likelihood_log_prob)
from gpode_tpu.models.states import (InitialStatePosterior, initial_state_kl,
                                     sample_initial_state)
from gpode_tpu.utils.time_grids import insert_zero_t0

Likelihood = Union[GaussianLikelihood, ProjectedGaussianLikelihood]


class GPODEParams(NamedTuple):
    """Trainable state of the vanilla GPODE model."""

    gp: gp.SVGPParams
    x0: InitialStatePosterior
    likelihood: Likelihood


class ELBOTerms(NamedTuple):
    """Per-step scalars logged by the trainer (`train_vdp_gpode.py:131-141`)."""

    loss: jax.Array
    observ_nll: jax.Array
    x0_kl: jax.Array
    inducing_kl: jax.Array
    nfe: jax.Array
    # Adaptive-solver health (cf. ShootingELBOTerms): attempted steps and
    # observation-time coverage — ncov < T+1 means the budget-exhaustion
    # fallback fired and the uncovered tail froze at the final state.
    natt: jax.Array
    ncov: jax.Array


def elbo_loss(key: jax.Array, params: GPODEParams, ys: jax.Array,
              ts: jax.Array, cfg: SolverConfig, num_features: int,
              obs_mask: Optional[jax.Array] = None) -> tuple[jax.Array, ELBOTerms]:
    """Negative ELBO for one step; `(loss, terms)` for `value_and_grad(..., has_aux)`.

    ys: (N, T, D_obs); ts: (T,). One x0 sample and one GP function draw per
    step (`gpode/models.py:53-58`).

    obs_mask (optional, (N, T) of {0,1}): marks which time points are
    observed. Unobserved entries drop out of the likelihood and of the
    `num_observations` KL scaling — interpolation/missing-data training on a
    uniform solver grid (beyond the reference, which required dropping points
    from the grid itself).
    """
    k_draw, k_x0 = jax.random.split(key)
    ts_aug = insert_zero_t0(ts)

    x0 = sample_initial_state(k_x0, params.x0, 1)[0]            # (N, D)
    xs, stats = flow_forward_sampled(k_draw, params.gp, x0, ts_aug, cfg,
                                     num_features)
    xs = xs[:, 1:]                                              # drop the t=0 state

    lp = likelihood_log_prob(params.likelihood, xs, ys)
    if obs_mask is None:
        loglik = jnp.mean(lp)
        num_obs = ys.size
    else:
        m = obs_mask[:, :, None].astype(lp.dtype)
        loglik = jnp.sum(lp * m) / (jnp.sum(m) * lp.shape[-1])
        num_obs = jnp.sum(m) * lp.shape[-1]
    x0_kl = initial_state_kl(params.x0) / num_obs
    ind_kl = gp.kl(params.gp) / num_obs

    loss = -(loglik - x0_kl - ind_kl)
    return loss, ELBOTerms(loss=loss, observ_nll=-loglik, x0_kl=x0_kl,
                           inducing_kl=ind_kl, nfe=stats.num_rhs_evals,
                           natt=stats.num_attempted, ncov=stats.num_covered)


def predict(key: jax.Array, params: GPODEParams, ts: jax.Array,
            cfg: SolverConfig, num_features: int, num_draws: int = 128,
            x0: Optional[jax.Array] = None,
            t0_shift: Optional[float] = None) -> jax.Array:
    """Posterior-predictive latent trajectories: (S, N, T, D).

    With x0=None, each draw starts from a fresh q(x0) sample and ts is
    augmented with the t=0 point which is then dropped
    (`model_builder.py:60-78`); `t0_shift` optionally pins the augmentation
    shift to the TRAINING grid's first interval (required whenever ts is not
    the training grid and its own first interval differs — nonuniform test
    splits). With a given x0, ts is used as-is
    (`compute_test_predictions`, `model_builder.py:81-96`). All S draws run as
    ONE batched solve — each with its own function draw AND x0 sample,
    matching the reference's per-iteration `rebuild_cache=True` semantics
    statistically. The draws stack into the solver state instead of vmapping
    whole solves (see `flow_forward_batched`: under vmap every budget
    iteration pays full stage work; batched, the post-coverage budget tail is
    a real skipped branch — ~4x on 128-draw TPU evals).
    """
    chol = gp.precompute_chol(params.gp)
    keys = jax.random.split(key, num_draws)
    draw_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    x0_keys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
    draws = jax.vmap(
        lambda k: gp.draw_posterior(k, params.gp, num_features, chol))(
            draw_keys)

    if x0 is None:
        # `t0_shift`: the training grid's first interval. The ELBO trains
        # observation k to model time trn_ts[k] + dt_trn, so a grid with a
        # DIFFERENT first interval (nonuniform test split) must be augmented
        # with the training shift or every prediction is time-offset by
        # dt_trn - dt_ts (see insert_zero_t0).
        ts_aug = insert_zero_t0(ts, t0_shift)
        starts = jax.vmap(
            lambda k: sample_initial_state(k, params.x0, 1)[0])(x0_keys)
        xs, _ = flow_forward_batched(params.gp, draws, starts, ts_aug, cfg)
        return xs[:, :, 1:]

    starts = jnp.broadcast_to(x0, (num_draws,) + x0.shape)
    xs, _ = flow_forward_batched(params.gp, draws, starts, ts, cfg)
    return xs
