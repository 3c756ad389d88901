"""Explicit-collective (shard_map) shooting ELBO: per-device partial ELBOs + psum.

The GSPMD path (`gpode_tpu.parallel.train`) lets XLA infer collectives from
sharding annotations. This module is the explicit alternative: `shard_map`
splits sequences over `dp` and MC samples over `mc`, every device computes
the ELBO contributions of its local (S_local, N_local) block of shooting
segments — zero communication inside the ODE loop — and exactly two kinds of
cross-device traffic exist, both single-scalar `psum`s over ICI:

  * the ELBO term reductions (sums/means over the sample and sequence axes),
  * the gradient all-reduce that `jax.grad` induces through those psums.

Per-device sampling keys fold in the mesh coordinates, so devices draw
independent MC samples (statistically equivalent to, not bitwise equal to,
the unsharded estimator).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpode_tpu.models import gp
from gpode_tpu.models.constraints import constraint_log_prob
from gpode_tpu.models.likelihoods import likelihood_log_prob
from gpode_tpu.models.shooting import ShootingELBOTerms, ShootingParams, integrate_segments
from gpode_tpu.models.states import initial_state_kl, shooting_entropy
from gpode_tpu.ops import math as om
from gpode_tpu.train.builders import ModelArgs, constraint_annealer
from gpode_tpu.train.trainer import make_step_bodies


def _sample_local_states(key, states, n_lo, n_local, num_local):
    """Sample `num_local` draws of the local sequence block
    [n_lo, n_lo + n_local); n_local is static, n_lo may be traced."""
    k0, ks = jax.random.split(key)
    mean = jax.lax.dynamic_slice_in_dim(states.mean, n_lo, n_local, 0)
    tril = jax.lax.dynamic_slice_in_dim(states.tril(), n_lo, n_local, 0)
    n, t, d = mean.shape
    eps = jax.random.normal(ks, (num_local, n, t, d), dtype=mean.dtype)
    zs = jnp.einsum("ntij,sntj->snti", tril, eps, precision=om.HIGHEST)
    ss = zs + mean[None]

    x0_mean = jax.lax.dynamic_slice_in_dim(states.x0.mean, n_lo, n_local, 0)
    x0_tril = jax.lax.dynamic_slice_in_dim(states.x0.tril(), n_lo, n_local, 0)
    eps0 = jax.random.normal(k0, (num_local, n, d), dtype=mean.dtype)
    x0 = jnp.einsum("nij,snj->sni", x0_tril, eps0, precision=om.HIGHEST) + x0_mean[None]
    return jnp.concatenate([x0[:, :, None, :], ss], axis=2)  # (S_l, N_l, T, D)


def make_shard_map_shooting_loss(mesh: Mesh, args: ModelArgs):
    """loss(params, key, ys, ts) computed with shard_map + explicit psums.

    ys must have N divisible by the `dp` axis and `args.num_samples` by `mc`.
    Returns a replicated (loss, ShootingELBOTerms).
    """
    cfg = args.solver_config()
    if "dp" in mesh.axis_names:
        dp = mesh.shape["dp"]
    else:
        raise ValueError("mesh must carry a 'dp' axis (sequences shard over it)")
    has_mc = "mc" in mesh.axis_names
    mc = mesh.shape["mc"] if has_mc else 1
    if args.num_samples % mc:
        raise ValueError(f"num_samples={args.num_samples} not divisible by mc={mc}")
    s_local = args.num_samples // mc
    axes = ("dp", "mc") if has_mc else ("dp",)

    def loss(params: ShootingParams, key, ys, ts):
        n_total, t_obs, _ = ys.shape
        if n_total % dp:
            raise ValueError(f"N={n_total} not divisible by dp={dp}")
        n_local = n_total // dp
        num_obs = ys.size

        # check_vma=False: the Pallas megakernels run inside this region on
        # TPU and a pallas_call's out_shape carries no varying-axis
        # annotation; out_specs correctness is pinned by the exact value+grad
        # parity tests in tests/test_sharding.py.
        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P(), P(), P("dp"), P()),
                 out_specs=P())
        def sharded(params, key, ys_local, ts):
            di = jax.lax.axis_index("dp")
            k_draw, k_ss = jax.random.split(key)
            k_local = jax.random.fold_in(k_ss, di)
            if has_mc:
                k_local = jax.random.fold_in(k_local,
                                             jax.lax.axis_index("mc"))

            n_lo = di * n_local
            ss = _sample_local_states(k_local, params.states, n_lo,
                                      n_local, s_local)

            # one GP draw shared by every device (same key everywhere)
            draw = gp.draw_posterior(k_draw, params.gp, args.num_features)
            pred, stats = integrate_segments(params.gp, draw, ss, ts[:2], cfg)

            # local sums -> global means via psum over both axes
            lp = likelihood_log_prob(params.likelihood, pred, ys_local[None])
            obs_sum = jax.lax.psum(jnp.sum(lp), axes)
            observ_loglik = obs_sum / (args.num_samples * num_obs)

            constr = constraint_log_prob(params.constraint, ss[:, :, 1:, :],
                                         pred[:, :, :-1, :]).sum(axis=3)
            constr_sum = jax.lax.psum(jnp.sum(constr), axes)
            scaled_constr = constr_sum / (args.num_samples * num_obs)

            # entropy/KLs depend only on (replicated) params: no collective
            entropy = shooting_entropy(params.states).sum() / num_obs
            x0_kl = initial_state_kl(params.states.x0) / num_obs
            ind_kl = gp.kl(params.gp) / num_obs

            loss = -(observ_loglik + scaled_constr + entropy - x0_kl - ind_kl)
            # solver stats are per-shard (each device integrates its own
            # segment block); reduce to replicated diagnostics — worst-shard
            # budget use, worst-shard coverage
            terms = ShootingELBOTerms(
                loss=loss, observ_nll=-observ_loglik,
                state_kl=-(scaled_constr + entropy), x0_kl=x0_kl,
                inducing_kl=ind_kl,
                nfe=jax.lax.pmax(stats.num_rhs_evals, axes),
                natt=jax.lax.pmax(stats.num_attempted, axes),
                ncov=jax.lax.pmin(stats.num_covered, axes))
            return loss, terms

        return sharded(params, key, ys, ts)

    return loss


def make_shard_map_shooting_step(mesh: Mesh, args: ModelArgs,
                                 optimizer: optax.GradientTransformation,
                                 frozen_mask=None,
                                 with_iteration: bool = False):
    """Jitted train step over the shard_map loss (params replicated, ys
    sharded over `dp`). `frozen_mask` zeroes gradients of frozen leaves,
    matching the GSPMD step and the Trainer (constraint scale frozen by
    default).

    with_iteration=True threads a replicated device-side iteration counter
    (step signature gains `itr` after `key`, returns itr+1) and applies the
    constraint-scale annealing schedule to the replicated params before the
    shard_map region — `--constraint_anneal_iters` composes with `--mesh`."""
    loss_fn = make_shard_map_shooting_loss(mesh, args)
    rep = NamedSharding(mesh, P())
    data_shard = NamedSharding(mesh, P("dp"))

    anneal = constraint_annealer(args) if with_iteration else None

    def loss_at(p, sub, itr, ys, ts):
        if itr is not None and anneal is not None:
            p = anneal(p, itr)
        return loss_fn(p, sub, ys, ts)

    # step bodies shared with the single-device and GSPMD steps
    # (trainer.make_step_bodies); only the jit shardings differ
    step, step_itr = make_step_bodies(loss_at, optimizer, frozen_mask)
    if with_iteration:
        return partial(jax.jit,
                       in_shardings=(rep, rep, rep, rep, data_shard, rep),
                       out_shardings=(rep, rep, rep, rep, rep))(step_itr)
    return partial(jax.jit, in_shardings=(rep, rep, rep, data_shard, rep),
                   out_shardings=(rep, rep, rep, rep))(step)
