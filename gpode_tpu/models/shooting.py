"""Shooting GPODE: multiple-shooting ELBO with segment-parallel integration.

Rebuilds `src/gpode_shooting/models.py:14-146` + the loss assembly of
`src/gpode_shooting/model_builder.py:59-72`. The key trick is preserved and
is exactly what maps this model onto TPUs: all S·N·T shooting segments are
flattened into one batch and integrated simultaneously over a single uniform
interval `ts[:2]` (`models.py:119-125`) — O(1)-depth integration regardless
of sequence length. In this rebuild the flattened segment batch is also the
axis sharded across chips (see `gpode_tpu.parallel`).

Five ELBO terms (`models.py:108-146`, `model_builder.py:71`):
    loss = -( mean obs-loglik
              + sum_t mean_s constraint-loglik / num_obs
              + sum entropy(q(s)) / num_obs
              - KL(q(x0)) / num_obs
              - KL(q(u)) / num_obs )
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from gpode_tpu.models import gp
from gpode_tpu.models.constraints import (GaussianConstraint, LaplaceConstraint,
                                          constraint_log_prob)
from gpode_tpu.models.flow import SolverConfig, flow_forward
from gpode_tpu.models.likelihoods import (GaussianLikelihood,
                                          ProjectedGaussianLikelihood,
                                          likelihood_log_prob)
from gpode_tpu.models.states import (ShootingStatePosterior, initial_state_kl,
                                     sample_shooting_states, shooting_entropy)

Likelihood = Union[GaussianLikelihood, ProjectedGaussianLikelihood]
Constraint = Union[GaussianConstraint, LaplaceConstraint]


class ShootingParams(NamedTuple):
    """Trainable state of the shooting GPODE model."""

    gp: gp.SVGPParams
    states: ShootingStatePosterior
    likelihood: Likelihood
    constraint: Constraint


class ShootingELBOTerms(NamedTuple):
    """Per-step scalars (`train_vdp_gpode_shooting.py:146-158`)."""

    loss: jax.Array
    observ_nll: jax.Array
    state_kl: jax.Array  # -(constraint loglik + entropy), the reference's "XS KL"
    x0_kl: jax.Array
    inducing_kl: jax.Array
    nfe: jax.Array
    # Adaptive-solver health: attempted steps vs budget and observation-time
    # coverage (num_covered < T means the budget-exhaustion fallback fired,
    # cutting gradients through the dynamics — watch these when tuning
    # max_steps; fixed-step solvers always report full coverage).
    natt: jax.Array
    ncov: jax.Array


def stack_segments(x: jax.Array) -> jax.Array:
    """(..., D) -> (prod(...), D) (`models.py:6-7`)."""
    return x.reshape(-1, x.shape[-1])


def unstack_segments(x: jax.Array, shape) -> jax.Array:
    """Inverse of :func:`stack_segments` (`models.py:10-11`)."""
    return x.reshape(shape)


def integrate_segments(gp_params: gp.SVGPParams, draw: gp.PosteriorDraw,
                       ss: jax.Array, ts_pair: jax.Array, cfg: SolverConfig):
    """Advance every shooting state one interval: (S, N, T, D) -> endpoints
    (S, N, T, D). One flow call over the flattened segment batch
    (`models.py:119-125`)."""
    shape = ss.shape
    xs, stats = flow_forward(gp_params, draw, stack_segments(ss), ts_pair, cfg)
    return unstack_segments(xs[:, -1], shape), stats


def shard_mapped_integrate(mesh, cfg: SolverConfig):
    """Wrap :func:`integrate_segments` in a `shard_map` region over the mesh:
    (S, N, T, D) shooting states shard S over `mc` and N over `dp` (whichever
    axes the mesh carries), every device integrates only its local segment
    block, and — unlike plain GSPMD annotations, to which a `pallas_call` is
    an opaque unpartitionable op — the fused Pallas megakernels stay engaged
    PER SHARD inside the jitted program (VERDICT r2 item 3). Solver stats
    reduce to replicated worst-shard diagnostics. Gradients flow through the
    region: cotangents of the replicated (gp, draw) operands are psummed over
    the mesh by shard_map's transpose.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    s_axis = "mc" if "mc" in mesh.axis_names else None
    n_axis = "dp" if "dp" in mesh.axis_names else None
    axes = tuple(a for a in (s_axis, n_axis) if a is not None)
    ss_spec = P(s_axis, n_axis)

    # check_vma=False: a pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the vma checker rejects any kernel inside the region;
    # correctness of the out_specs is pinned by the sharding tests instead.
    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), ss_spec, P()), out_specs=(ss_spec, P()))
    def integrate(gp_params, draw, ss, ts_pair):
        pred, st = integrate_segments(gp_params, draw, ss, ts_pair, cfg)
        # per-shard solver stats -> replicated worst-shard diagnostics
        if axes:
            from gpode_tpu.ops.ode import ODEStats
            st = ODEStats(num_rhs_evals=jax.lax.pmax(st.num_rhs_evals, axes),
                          num_accepted=jax.lax.pmax(st.num_accepted, axes),
                          num_attempted=jax.lax.pmax(st.num_attempted, axes),
                          num_covered=jax.lax.pmin(st.num_covered, axes))
        return pred, st

    return integrate


def elbo_loss(key: jax.Array, params: ShootingParams, ys: jax.Array,
              ts: jax.Array, cfg: SolverConfig, num_features: int,
              num_samples: int = 1, state_sharding=None,
              obs_mask=None, seg_mesh=None, segment_minibatch: int = 0,
              segment_idx=None) -> tuple[jax.Array, ShootingELBOTerms]:
    """Negative shooting ELBO; ys: (N, T, D_obs), ts: (T,) uniform grid.

    One GP function draw is shared by all `num_samples` state samples, as in
    the reference (one `rebuild_cache` per flow call, `models.py:119-125`).

    `state_sharding` (optional NamedSharding over (S, N, T, D)) pins the MC
    and sequence axes of the sampled shooting states to the device mesh; the
    flattened segment batch then integrates fully sharded with no collectives
    inside the ODE loop.

    `seg_mesh` (optional Mesh) additionally runs the segment integration in a
    `shard_map` manual region (:func:`shard_mapped_integrate`) so the fused
    Pallas kernels survive sharding; S must divide by the `mc` axis and N by
    `dp`.

    `segment_minibatch` (beyond-reference; 0 = off = reference behavior):
    integrate only K uniformly sampled segments per step instead of all T —
    the step cost becomes O(K) on arbitrarily long trajectories while the
    estimator stays UNBIASED: the observation term is a subsample mean
    (uniform inclusion), the continuity term a Horvitz-Thompson sum (each
    segment's constraint weighted by T/K; endpoint segment masked), and the
    analytic terms (entropy, both KLs) are exact as always. The variational
    objective the reference optimizes is recovered in expectation
    (`tests/test_models.py` enumerates K=1 batches to check this to float
    tolerance). `segment_idx` overrides the sampled indices (test hook).
    """
    k_draw, k_ss = jax.random.split(key)

    ss = sample_shooting_states(k_ss, params.states, num_samples)  # (S,N,T,D)
    if state_sharding is not None:
        ss = jax.lax.with_sharding_constraint(ss, state_sharding)
    s, n, t, d = ss.shape

    minibatched = segment_idx is not None or (0 < segment_minibatch < t)
    if minibatched:
        if segment_idx is None:
            # fold_in (not a third split) keeps the draw/state sampling
            # stream identical to the non-minibatched path
            k_idx = jax.random.fold_in(key, 0x5e6)
            idx = jax.random.permutation(k_idx, t)[:segment_minibatch]
        else:
            idx = jnp.asarray(segment_idx)
        k = idx.shape[0]
        ss_batch = jnp.take(ss, idx, axis=2)                  # (S,N,K,D)
        # continuity partner: state idx+1 (the final segment has none)
        has_next = (idx < t - 1).astype(ss.dtype)             # (K,)
        ss_next = jnp.take(ss, jnp.minimum(idx + 1, t - 1), axis=2)
    else:
        idx = None
        ss_batch = ss

    draw = gp.draw_posterior(k_draw, params.gp, num_features)
    if seg_mesh is not None:
        pred, stats = shard_mapped_integrate(seg_mesh, cfg)(
            params.gp, draw, ss_batch, ts[:2])
    else:
        pred, stats = integrate_segments(params.gp, draw, ss_batch, ts[:2],
                                         cfg)

    ys_batch = ys if idx is None else jnp.take(ys, idx, axis=1)
    lp = likelihood_log_prob(params.likelihood, pred, ys_batch[None])
    if obs_mask is None:
        # subsample mean over uniformly included segments = unbiased
        # estimator of the full mean
        observ_loglik = jnp.mean(lp)
        num_obs = ys.size
    else:
        # masked time points contribute no likelihood; shooting states and
        # the continuity constraint still span the full uniform grid, so the
        # ODE posterior interpolates through gaps (beyond-reference: the
        # shooting variant requires a uniform grid and could not do this).
        mask = obs_mask if idx is None else jnp.take(obs_mask, idx, axis=1)
        m = mask[None, :, :, None].astype(lp.dtype)
        m_total = jnp.sum(obs_mask)  # normalizer stays the FULL observed count
        batch_scale = 1.0 if idx is None else t / k
        observ_loglik = (batch_scale * jnp.sum(lp * m)
                         / (s * m_total * lp.shape[-1]))
        num_obs = m_total * lp.shape[-1]

    entropy = shooting_entropy(params.states)                    # (N, T-1)
    if idx is None:
        constr = constraint_log_prob(params.constraint, ss[:, :, 1:, :],
                                     pred[:, :, :-1, :]).sum(axis=3)  # (S,N,T-1)
        scaled_constr = jnp.mean(constr, axis=0).sum() / num_obs
    else:
        constr = constraint_log_prob(params.constraint, ss_next,
                                     pred).sum(axis=3)            # (S, N, K)
        # Horvitz-Thompson: inclusion probability K/T per segment
        scaled_constr = ((t / k) * jnp.mean(constr * has_next, axis=0).sum()
                         / num_obs)
    scaled_entropy = entropy.sum() / num_obs
    x0_kl = initial_state_kl(params.states.x0) / num_obs
    ind_kl = gp.kl(params.gp) / num_obs

    loss = -(observ_loglik + scaled_constr + scaled_entropy - x0_kl - ind_kl)
    return loss, ShootingELBOTerms(
        loss=loss, observ_nll=-observ_loglik,
        state_kl=-(scaled_constr + scaled_entropy),
        x0_kl=x0_kl, inducing_kl=ind_kl, nfe=stats.num_rhs_evals,
        natt=stats.num_attempted, ncov=stats.num_covered)
