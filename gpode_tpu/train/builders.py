"""Model wiring for the experiment families (VDP/FHN 2-D and MoCap).

Rebuilds the `build_model` functions of `src/gpode/model_builder.py:18-43`,
`src/gpode/mocap_model_builder.py:17-48`,
`src/gpode_shooting/model_builder.py:19-57` and their loss assembly, plus
vmapped prediction entry points. A "model" here is (params pytree, static
ModelArgs); the loss is a pure function of both.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from gpode_tpu.models import gp, gpode, shooting
from gpode_tpu.models.constraints import init_constraint
from gpode_tpu.models.flow import SolverConfig
from gpode_tpu.models.likelihoods import (GaussianLikelihood,
                                          ProjectedGaussianLikelihood,
                                          Projector, init_gaussian_likelihood)
from gpode_tpu.models.states import init_initial_state, init_shooting_states

SOLVERS = ("dopri5", "rk4", "midpoint", "euler", "explicit_adams",
           "fixed_adams", "adams", "implicit_adams", "bdf")
CONSTRAINTS = ("gauss", "laplace")


@dataclasses.dataclass(frozen=True)
class ModelArgs:
    """Static model hyperparameters; names/defaults track the reference CLI
    (`train_vdp_gpode.py:26-68`, `train_vdp_gpode_shooting.py:40-46`)."""

    num_features: int = 256
    num_inducing: int = 16
    dimwise: bool = True
    q_diag: bool = False
    solver: str = "dopri5"
    ts_dense_scale: int = 4
    rtol: float = 1e-6
    atol: float = 1e-6
    max_steps: int = 256
    first_step: Optional[float] = None  # dopri5 initial dt; -1.0 = full span
    use_adjoint: bool = False
    remat: bool = False
    num_samples: int = 5  # shooting MC draws per step
    constraint_type: str = "gauss"
    constraint_trainable: bool = False
    constraint_initial_scale: float = 1e-3
    # Constraint-scale annealing (0 = off, the reference behavior): the
    # continuity scale decays geometrically from `constraint_anneal_start`
    # to `constraint_initial_scale` over the first `constraint_anneal_iters`
    # iterations. A loose early constraint lets the shooting states settle
    # onto a consistent trajectory before the continuity factor tightens —
    # the mitigation for the seed-dependent 15k+ iteration convergence tail
    # (RESULTS.md; cf. reference `gpode_shooting/model_builder.py:38-45`,
    # which keeps the scale frozen at 1e-3 for all iterations).
    constraint_anneal_iters: int = 0
    constraint_anneal_start: float = 0.1
    # Stochastic segment minibatching (beyond-reference; 0 = off): integrate
    # only K uniformly sampled shooting segments per step — O(K) step cost on
    # arbitrarily long trajectories, unbiased ELBO estimator
    # (`models/shooting.elbo_loss`).
    segment_minibatch: int = 0

    def solver_config(self) -> SolverConfig:
        return SolverConfig(solver=self.solver, rtol=self.rtol, atol=self.atol,
                            ts_dense_scale=self.ts_dense_scale,
                            max_steps=self.max_steps,
                            first_step=self.first_step,
                            use_adjoint=self.use_adjoint, remat=self.remat)


def build_gpode(key: jax.Array, args: ModelArgs, data_ys: np.ndarray,
                projector: Optional[Projector] = None,
                full_dim: Optional[int] = None) -> gpode.GPODEParams:
    """Vanilla GPODE params for observed sequences (N, T, D_latent).

    With a projector, the likelihood is scored in `full_dim`-dimensional data
    space (MoCap setup, `mocap_model_builder.py:17-48`).
    """
    n, t, d = data_ys.shape
    k_gp, k_x0 = jax.random.split(key)
    gp_params = gp.init_svgp(k_gp, d, d, args.num_inducing,
                             dimwise=args.dimwise, q_diag=args.q_diag)
    x0 = init_initial_state(k_x0, n, d)
    if projector is None:
        likelihood = init_gaussian_likelihood(d)
    else:
        likelihood = ProjectedGaussianLikelihood(
            base=init_gaussian_likelihood(full_dim), projector=projector)
    return gpode.GPODEParams(gp=gp_params, x0=x0, likelihood=likelihood)


def build_shooting(key: jax.Array, args: ModelArgs, data_ys: np.ndarray,
                   projector: Optional[Projector] = None,
                   full_dim: Optional[int] = None) -> shooting.ShootingParams:
    """Shooting GPODE params: T-1 shooting states per sequence
    (`gpode_shooting/model_builder.py:19-57`)."""
    n, t, d = data_ys.shape
    k_gp, k_ss = jax.random.split(key)
    gp_params = gp.init_svgp(k_gp, d, d, args.num_inducing,
                             dimwise=args.dimwise, q_diag=args.q_diag)
    states = init_shooting_states(k_ss, n, t - 1, d)
    if projector is None:
        likelihood = init_gaussian_likelihood(d)
    else:
        likelihood = ProjectedGaussianLikelihood(
            base=init_gaussian_likelihood(full_dim), projector=projector)
    constraint = init_constraint(args.constraint_type, d=1,
                                 scale=args.constraint_initial_scale)
    return shooting.ShootingParams(gp=gp_params, states=states,
                                   likelihood=likelihood, constraint=constraint)


def gpode_loss_fn(args: ModelArgs):
    """loss(params, key, ys, ts) for the vanilla model (closure over statics)."""
    cfg = args.solver_config()

    def loss(params, key, ys, ts):
        return gpode.elbo_loss(key, params, ys, ts, cfg, args.num_features)

    return loss


def constraint_annealer(args: ModelArgs):
    """(params, itr) -> params with the annealed constraint scale swapped in.

    The geometric loose-to-tight schedule (RESULTS.md "annealing study"):
    scale decays from `constraint_anneal_start` to `constraint_initial_scale`
    over the first `constraint_anneal_iters` iterations, constant after.
    Returns None when annealing is off. Pure in (params, itr), so it composes
    with any step style — the single-device jitted step and both sharded
    steps (`parallel/train.py`, `parallel/shard_map_step.py`) apply it to the
    replicated params before the loss."""
    if args.constraint_anneal_iters <= 0:
        return None
    import jax.numpy as jnp

    from gpode_tpu.ops import math as om
    log_start = float(np.log(args.constraint_anneal_start))
    log_final = float(np.log(args.constraint_initial_scale))
    horizon = float(args.constraint_anneal_iters)

    def anneal(params, itr):
        frac = jnp.clip(itr / horizon, 0.0, 1.0)
        scale = jnp.exp((1.0 - frac) * log_start + frac * log_final)
        raw = om.invsoftplus(scale)
        constraint = params.constraint._replace(
            raw_scale=jnp.broadcast_to(
                raw, params.constraint.raw_scale.shape).astype(
                    params.constraint.raw_scale.dtype))
        return params._replace(constraint=constraint)

    return anneal


def shooting_loss_fn(args: ModelArgs):
    """loss(params, key, ys, ts) for the shooting model.

    With `constraint_anneal_iters > 0` the signature becomes
    loss(params, key, itr, ys, ts) (the Trainer threads a device-side
    iteration counter, `trainer.make_train_step(with_iteration=True)`): the
    constraint scale follows the geometric schedule instead of
    params.constraint.raw_scale.
    """
    cfg = args.solver_config()

    anneal = constraint_annealer(args)
    if anneal is not None:

        def annealed(params, key, itr, ys, ts):
            return shooting.elbo_loss(key, anneal(params, itr), ys, ts, cfg,
                                      args.num_features,
                                      num_samples=args.num_samples,
                                      segment_minibatch=args.segment_minibatch)

        return annealed

    def loss(params, key, ys, ts):
        return shooting.elbo_loss(key, params, ys, ts, cfg, args.num_features,
                                  num_samples=args.num_samples,
                                  segment_minibatch=args.segment_minibatch)

    return loss


def default_frozen_predicate(args: ModelArgs):
    """Which leaves stay fixed during training: the constraint scale unless
    `constraint_trainable` (`train_vdp_gpode_shooting.py:43-44`)."""

    def predicate(path: str) -> bool:
        return ("constraint" in path) and not args.constraint_trainable

    return predicate
