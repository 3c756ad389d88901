"""Observation likelihoods: diagonal Gaussian and PCA-projected Gaussian.

Rebuilds `src/core/likelihoods.py:10-45`. The projected variant composes a
latent-to-data linear map (the inverse of the MoCap PCA pipeline,
`src/misc/mocap_utils.py:12-34`) before the density, so dynamics live in a
small latent space while the likelihood is scored in the 50-D sensor space —
gradients flow through the projection inside the jitted loss.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpode_tpu.ops import math as om


class GaussianLikelihood(NamedTuple):
    """Diagonal Gaussian with softplus-constrained per-dim variance.

    raw_variance: (D,) unconstrained (init softplus^-1(0.25),
    `likelihoods.py:15-24`).
    """

    raw_variance: jax.Array

    @property
    def variance(self) -> jax.Array:
        return om.softplus(self.raw_variance)


def init_gaussian_likelihood(ndim: int, init_val: float = 0.25,
                             dtype=jnp.float32) -> GaussianLikelihood:
    return GaussianLikelihood(jnp.full((ndim,), om.invsoftplus(init_val), dtype=dtype))


def gaussian_log_prob(p: GaussianLikelihood, f: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise log N(y; f, variance) (`likelihoods.py:27-28`)."""
    return om.gaussian_logpdf(y, f, p.variance)


class Projector(NamedTuple):
    """Latent/PCA space -> observation space linear map (constants, not trained).

    Mirrors `Latent2DataProjector` (`src/misc/mocap_utils.py:12-34`): optional
    inverse PCA-normalization (x * std + mean) followed by multiplication with
    the PCA components. NOTE: faithful to the reference, the PCA data mean is
    NOT added back (`mocap_utils.py:29` omits `pca.mean_`).

    components: (L, D_full) PCA components.
    norm_mean / norm_std: (1, 1, L) PCA-space normalization constants, or None.
    """

    components: jax.Array
    norm_mean: Optional[jax.Array]
    norm_std: Optional[jax.Array]


def project(p: Projector, x: jax.Array) -> jax.Array:
    """(..., L) latents -> (..., D_full) observations."""
    if p.norm_mean is not None:
        x = x * jnp.reshape(p.norm_std, (-1,)) + jnp.reshape(p.norm_mean, (-1,))
    return jnp.einsum("...l,ld->...d", x, p.components, precision=om.HIGHEST)


class ProjectedGaussianLikelihood(NamedTuple):
    """Gaussian likelihood scored after a latent->data projection
    (`likelihoods.py:31-45`). `base.raw_variance` has D_full entries."""

    base: GaussianLikelihood
    projector: Projector

    @property
    def variance(self) -> jax.Array:
        return self.base.variance


def projected_gaussian_log_prob(p: ProjectedGaussianLikelihood,
                                f: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise log N(y; project(f), variance); f (..., L), y (..., D_full)."""
    return gaussian_log_prob(p.base, project(p.projector, f), y)


def likelihood_log_prob(p, f: jax.Array, y: jax.Array) -> jax.Array:
    """Dispatch on likelihood type (static pytree structure)."""
    if isinstance(p, ProjectedGaussianLikelihood):
        return projected_gaussian_log_prob(p, f, y)
    return gaussian_log_prob(p, f, y)
