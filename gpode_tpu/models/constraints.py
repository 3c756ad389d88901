"""Shooting continuity-constraint densities: Gaussian and Laplace.

Rebuilds `src/core/constraints.py:9-66`: a density p(s_{t+1} | segment-t
endpoint) with a softplus-constrained, optionally trainable scale. Whether the
scale trains is an optimizer-mask concern in this framework (see
`gpode_tpu.train.trainer`), not parameter state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpode_tpu.ops import math as om


class GaussianConstraint(NamedTuple):
    raw_scale: jax.Array  # (d,) unconstrained softplus scale

    @property
    def scale(self) -> jax.Array:
        return om.softplus(self.raw_scale)

    @property
    def variance(self) -> jax.Array:
        return jnp.square(self.scale)


class LaplaceConstraint(NamedTuple):
    raw_scale: jax.Array

    @property
    def scale(self) -> jax.Array:
        return om.softplus(self.raw_scale)

    @property
    def variance(self) -> jax.Array:
        return 2.0 * jnp.square(self.scale)


def init_constraint(kind: str, d: int = 1, scale: float = 1.0,
                    dtype=jnp.float32):
    """kind in {"gauss", "laplace"} (`gpode_shooting/model_builder.py:38-45`)."""
    raw = jnp.full((d,), om.invsoftplus(scale), dtype=dtype)
    if kind == "gauss":
        return GaussianConstraint(raw)
    if kind == "laplace":
        return LaplaceConstraint(raw)
    raise ValueError("invalid constraint kind; options are gauss/laplace")


def constraint_log_prob(c, loc: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise log p(y; loc, scale) (`constraints.py:33-36,62-66`)."""
    if isinstance(c, GaussianConstraint):
        return om.gaussian_logpdf(y, loc, jnp.square(c.scale))
    return om.laplace_logpdf(y, loc, c.scale)
