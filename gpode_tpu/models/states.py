"""Variational state posteriors: initial state q(x0) and shooting states q(s_{1:T-1}).

Rebuilds `src/core/states.py:46-207` as parameter pytrees + pure functions:

  * `InitialStatePosterior` — full-rank Gaussian q(x0) = N(m, L L^T) per
    sequence, Cholesky-parameterized (`states.py:46-114`).
  * `ShootingStatePosterior` — factorized full-rank Gaussians over the T-1
    shooting states with an embedded x0 posterior (`states.py:144-207`).

Packed-triangular storage + one vectorized scatter replaces the reference's
per-matrix Python loops (`src/misc/transforms.py:70-116`): the (N,T,D,D)
shooting Choleskys materialize in a single fused XLA op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpode_tpu.ops import math as om

# Initial scale of state Cholesky factors (`states.py:10`).
INITIAL_STATE_SCALE = 1e-1


class InitialStatePosterior(NamedTuple):
    """q(x0) = N(mean, L L^T) per sequence.

    mean:        (N, D)
    tril_packed: (N, D(D+1)/2) packed lower-triangular scale.
    """

    mean: jax.Array
    tril_packed: jax.Array

    @property
    def dim_d(self) -> int:
        return self.mean.shape[-1]

    def tril(self) -> jax.Array:
        return om.fill_tril(self.tril_packed, self.dim_d)


def init_initial_state(key: jax.Array, dim_n: int, dim_d: int,
                       dtype=jnp.float32) -> InitialStatePosterior:
    """Random-mean init matching `states.py:60-65`."""
    mean = 1e-2 * jax.random.normal(key, (dim_n, dim_d), dtype=dtype)
    eye_packed = om.pack_tril(INITIAL_STATE_SCALE * jnp.eye(dim_d, dtype=dtype))
    tril_packed = jnp.broadcast_to(eye_packed, (dim_n,) + eye_packed.shape)
    return InitialStatePosterior(mean, tril_packed)


def sample_initial_state(key: jax.Array, p: InitialStatePosterior,
                         num_samples: int = 1) -> jax.Array:
    """Reparameterized x0 samples: (S, N, D) (`states.py:85-92`)."""
    n, d = p.mean.shape
    eps = jax.random.normal(key, (num_samples, n, d), dtype=p.mean.dtype)
    zs = jnp.einsum("nij,snj->sni", p.tril(), eps, precision=om.HIGHEST)
    return zs + p.mean[None]


def initial_state_kl(p: InitialStatePosterior) -> jax.Array:
    """KL( q(x0) || N(0, I) ) summed over sequences (`states.py:97-114`)."""
    return om.kl_whitened_gaussian(p.mean, p.tril())


def initial_state_log_prob(p: InitialStatePosterior, x: jax.Array,
                           jitter: float = om.DEFAULT_JITTER) -> jax.Array:
    """log q(x0 = x) with the reference's jittered covariance
    (`states.py:74-95`); x: (..., N, D) -> (..., N)."""
    return _mvn_log_prob(x, p.mean, p.tril(), jitter)


def _jittered_chol_from_scale(tril: jax.Array, jitter: float) -> jax.Array:
    """chol(L L^T + jitter I) — the reference materializes the covariance with
    jitter and lets the MVN re-factorize (`states.py:74-81,171-177`). State
    dims are tiny (D <= 8 for every dataset), so the batched factorization
    takes the unrolled fused algorithm instead of the Cholesky custom call
    (0.30 ms/step on the (N, T-1, 5, 5) shooting-entropy batch)."""
    cov = jnp.matmul(tril, jnp.swapaxes(tril, -1, -2), precision=om.HIGHEST)
    return om.cholesky_jittered_auto(cov, jitter)


def _mvn_log_prob(x, mean, tril, jitter):
    d = mean.shape[-1]
    chol = _jittered_chol_from_scale(tril, jitter)
    diff = x - mean
    alpha = om.solve_lower(chol, diff[..., None])[..., 0]
    maha = jnp.sum(jnp.square(alpha), axis=-1)
    logdet = om.tri_logdet_from_chol(chol)
    return -0.5 * (d * jnp.log(2.0 * jnp.pi) + logdet + maha)


class ShootingStatePosterior(NamedTuple):
    """Factorized q over the T-1 shooting states plus embedded q(x0).

    x0:          initial-state posterior.
    mean:        (N, T-1, D)
    tril_packed: (N, T-1, D(D+1)/2)
    """

    x0: InitialStatePosterior
    mean: jax.Array
    tril_packed: jax.Array

    @property
    def dim_d(self) -> int:
        return self.mean.shape[-1]

    def tril(self) -> jax.Array:
        return om.fill_tril(self.tril_packed, self.dim_d)


def init_shooting_states(key: jax.Array, dim_n: int, dim_t: int, dim_d: int,
                         dtype=jnp.float32) -> ShootingStatePosterior:
    """Random init matching `states.py:159-170`; dim_t = T - 1 shooting states."""
    k0, km = jax.random.split(key)
    x0 = init_initial_state(k0, dim_n, dim_d, dtype)
    mean = 1e-1 * jax.random.normal(km, (dim_n, dim_t, dim_d), dtype=dtype)
    eye_packed = om.pack_tril(INITIAL_STATE_SCALE * jnp.eye(dim_d, dtype=dtype))
    tril_packed = jnp.broadcast_to(eye_packed, (dim_n, dim_t) + eye_packed.shape)
    return ShootingStatePosterior(x0, mean, tril_packed)


def sample_shooting_states(key: jax.Array, p: ShootingStatePosterior,
                           num_samples: int = 1) -> jax.Array:
    """Samples of [x0, s_1, ..., s_{T-1}]: (S, N, T, D) (`states.py:199-201`)."""
    k0, ks = jax.random.split(key)
    n, t, d = p.mean.shape
    eps = jax.random.normal(ks, (num_samples, n, t, d), dtype=p.mean.dtype)
    zs = jnp.einsum("ntij,sntj->snti", p.tril(), eps, precision=om.HIGHEST)
    states = zs + p.mean[None]
    x0 = sample_initial_state(k0, p.x0, num_samples)[:, :, None, :]  # (S, N, 1, D)
    return jnp.concatenate([x0, states], axis=2)


def shooting_entropy(p: ShootingStatePosterior,
                     jitter: float = om.DEFAULT_JITTER) -> jax.Array:
    """Entropy of the factorized shooting posterior: (N, T-1)
    (`states.py:203-204` via `torch.distributions.MultivariateNormal`)."""
    d = p.dim_d
    chol = _jittered_chol_from_scale(p.tril(), jitter)
    logdet = om.tri_logdet_from_chol(chol)
    return 0.5 * (d * (1.0 + jnp.log(2.0 * jnp.pi)) + logdet)


def shooting_log_prob(p: ShootingStatePosterior, x: jax.Array,
                      jitter: float = om.DEFAULT_JITTER) -> jax.Array:
    """log q(s = x) for x (..., N, T-1, D) -> (..., N, T-1) (`states.py:206-207`)."""
    return _mvn_log_prob(x, p.mean, p.tril(), jitter)
