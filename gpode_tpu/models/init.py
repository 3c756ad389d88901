"""Data-driven model initialization (critical for GPODE convergence).

Rebuilds `src/gpode/model_initialization.py:6-76`,
`src/gpode_shooting/model_initialization.py:8-111` and the MoCap variants:

  * inducing locations at k-means cluster centers of the observed states;
  * whitened inducing means from a kernel ridge regression onto empirical
    time-difference gradients;
  * initial-state posterior mean by integrating the (freshly initialized) ODE
    backward one observation interval from the first observation;
  * shooting-state means at the observed values;
  * observation-noise and kernel hyperparameter setters.

K-means runs host-side (scipy, like the reference); the ridge/whitening
solves and the backward integration run on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.cluster.vq import kmeans2

from gpode_tpu.models import gp
from gpode_tpu.models.flow import SolverConfig, flow_forward_sampled
from gpode_tpu.models.gpode import GPODEParams
from gpode_tpu.models.shooting import ShootingParams
from gpode_tpu.ops import math as om
from gpode_tpu.ops.kernels import rbf_K


def _safe_cholesky(mat, jitter: float, max_tries: int = 6):
    """Host-side Cholesky with escalating jitter.

    K(Z,Z) from k-means centers can be numerically indefinite in f32 when M is
    large (clustered centers push the smallest eigenvalue below f32 noise);
    TPU's Cholesky then returns NaN where LAPACK may still succeed. This runs
    at init time (concrete values), so retrying with 100x jitter is cheap
    and matches the reference's intent (`model_initialization.py:39` used a
    fixed 1e-6, tested only up to M=100).
    """
    for _ in range(max_tries):
        chol = om.cholesky_jittered(mat, jitter)
        if bool(jnp.all(jnp.isfinite(chol))):
            return chol
        jitter *= 100.0
    raise FloatingPointError("Cholesky failed for inducing-init whitening "
                             f"even at jitter={jitter}")


def initialize_inducing(gp_params: gp.SVGPParams, data_ys: np.ndarray,
                        ts_max: float, data_noise: float = 1e-1,
                        rng: Optional[np.random.RandomState] = None,
                        max_obs: int = 1000) -> gp.SVGPParams:
    """Inducing locations at k-means centers; inducing values from empirical
    gradients via kernel ridge regression + whitening
    (`model_initialization.py:6-52`).

    data_ys: (N, T, D) observed sequences; ts_max: last observation time
    (observations assumed to start at t=0).
    """
    rng = np.random.RandomState() if rng is None else rng
    n, t, d = data_ys.shape

    # Empirical gradients f(y_t) ~ (y_{t+1} - y_t) * T / ts_max.
    f_xt = (data_ys[:, 1:, :] - data_ys[:, :-1, :]).reshape(-1, d) * (t / ts_max)
    xs = data_ys[:, :-1, :].reshape(-1, d)

    m = gp_params.num_inducing
    from gpode_tpu.utils import native
    if native.available():
        z = native.kmeans(xs, m, seed=int(rng.randint(2 ** 31)))
    else:
        z = kmeans2(xs, k=m, minit="points", seed=rng)[0].astype(np.float32)

    keep = rng.choice(xs.shape[0], min(max_obs, xs.shape[0]), replace=False)
    xs_sub = jnp.asarray(xs[keep])
    f_sub = jnp.asarray(f_xt[keep].astype(np.float32))

    kern = gp_params.kernel
    kxx = rbf_K(kern, xs_sub)                       # (n,n) or (D,n,n)
    kxz = rbf_K(kern, xs_sub, jnp.asarray(z))       # (n,M) or (D,n,M)
    kzz = rbf_K(kern, jnp.asarray(z))               # (M,M) or (D,M,M)
    lxx = om.cholesky_jittered(kxx, data_noise)
    lzz = _safe_cholesky(kzz, 1e-6)

    if gp_params.dimwise:
        alpha = om.solve_lower(lxx, f_sub.T[:, :, None])          # (D,n,1)
        alpha = om.solve_upper_from_lower(lxx, alpha)[..., 0]     # (D,n)
        f_update = jnp.einsum("dnm,dn->md", kxz, alpha, precision=om.HIGHEST)
        u_mean = om.solve_lower(lzz, f_update.T[:, :, None])[..., 0].T  # (M,D)
    else:
        alpha = om.solve_upper_from_lower(lxx, om.solve_lower(lxx, f_sub))  # (n,D)
        f_update = jnp.einsum("nm,nd->md", kxz, alpha, precision=om.HIGHEST)
        u_mean = om.solve_lower(lzz, f_update)                    # (M,D)

    return gp_params._replace(z=jnp.asarray(z), u_mean=u_mean)


def estimate_x0_backward(key: jax.Array, gp_params: gp.SVGPParams,
                         y_first: jax.Array, ts: jax.Array, cfg: SolverConfig,
                         num_features: int, num_samples: int = 20) -> jax.Array:
    """x0 estimate: integrate backward one interval from the first observation,
    averaged over fresh posterior draws (`model_initialization.py:55-76`).

    Exploits the `insert_zero_t0` convention: x(0) evolves one interval into
    y(t_0), so x0 = backward flow of y(t_0) over [t_1, t_0].
    """
    ts_back = jnp.stack([ts[1], ts[0]])
    chol = gp.precompute_chol(gp_params)

    def one(k):
        xs, _ = flow_forward_sampled(k, gp_params, y_first, ts_back, cfg,
                                     num_features, chol)
        return xs[:, -1]

    return jnp.mean(jax.vmap(one)(jax.random.split(key, num_samples)), axis=0)


def initialize_latents_with_data(key: jax.Array, params: GPODEParams,
                                 data_ys: np.ndarray, data_ts: np.ndarray,
                                 cfg: SolverConfig, num_features: int,
                                 num_samples: int = 20) -> GPODEParams:
    """Set the vanilla model's q(x0) mean from backward integration."""
    y_first = jnp.asarray(data_ys[:, 0])
    x0_mean = estimate_x0_backward(key, params.gp, y_first,
                                   jnp.asarray(data_ts), cfg, num_features,
                                   num_samples)
    return params._replace(x0=params.x0._replace(mean=x0_mean))


def initialize_shooting_states_with_data(key: jax.Array, params: ShootingParams,
                                         data_ys: np.ndarray, data_ts: np.ndarray,
                                         cfg: SolverConfig, num_features: int,
                                         num_samples: int = 50) -> ShootingParams:
    """Shooting init (`gpode_shooting/model_initialization.py:57-78`): x0 mean
    by backward integration, shooting-state means at observed values
    y_0..y_{T-2}."""
    y_first = jnp.asarray(data_ys[:, 0])
    x0_mean = estimate_x0_backward(key, params.gp, y_first,
                                   jnp.asarray(data_ts), cfg, num_features,
                                   num_samples)
    states = params.states._replace(
        x0=params.states.x0._replace(mean=x0_mean),
        mean=jnp.asarray(data_ys[:, :-1].astype(np.float32)))
    return params._replace(states=states)


def initialize_noisevar(likelihood, init_noisevar):
    """Set the observation-noise variance (`model_initialization.py:82-92`)."""
    raw = om.invsoftplus(jnp.asarray(init_noisevar, dtype=jnp.float32))
    base = likelihood.base if hasattr(likelihood, "base") else likelihood
    new_base = base._replace(raw_variance=jnp.broadcast_to(raw, base.raw_variance.shape))
    if hasattr(likelihood, "base"):
        return likelihood._replace(base=new_base)
    return new_base


def initialize_kernel_parameters(gp_params: gp.SVGPParams,
                                 lengthscale_value: float = 1.25,
                                 variance_value: float = 0.5) -> gp.SVGPParams:
    """Set kernel hyperparameters (`model_initialization.py:95-111`). Fixing
    them during training is an optimizer-mask concern (see
    `gpode_tpu.train.trainer.build_frozen_mask`)."""
    kern = gp_params.kernel
    new_kern = kern._replace(
        raw_lengthscales=jnp.full_like(kern.raw_lengthscales,
                                       om.invsoftplus(lengthscale_value)),
        raw_variance=jnp.full_like(kern.raw_variance,
                                   om.invsoftplus(variance_value)))
    return gp_params._replace(kernel=new_kern)
