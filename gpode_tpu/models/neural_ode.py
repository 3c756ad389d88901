"""NeuralODE baseline: deterministic MLP vector field + the shared ODE engine.

Rebuilds `src/neuralode/model_builder.py:8-111` (the paper's comparison
baseline): a Linear-Tanh-Linear-Tanh-Linear network (H=128) as dx/dt, MSE
loss, deterministic predictions. Reuses `gpode_tpu.ops.ode` — the reference
carried its own copy of Flow; here the solver suite is shared.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpode_tpu.models.flow import SolverConfig
from gpode_tpu.ops import math as om
from gpode_tpu.ops.ode import ODEStats, odeint


class MLPParams(NamedTuple):
    """Three-layer tanh MLP (`model_builder.py:19-25`)."""

    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array
    w3: jax.Array
    b3: jax.Array


class NeuralODEParams(NamedTuple):
    mlp: MLPParams


def init_neural_ode(key: jax.Array, d: int, hidden: int = 128,
                    dtype=jnp.float32) -> NeuralODEParams:
    """Weight init N(0, 0.1), zero bias (`model_builder.py:27-30`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    std = 0.1
    return NeuralODEParams(MLPParams(
        w1=std * jax.random.normal(k1, (d, hidden), dtype=dtype),
        b1=jnp.zeros((hidden,), dtype=dtype),
        w2=std * jax.random.normal(k2, (hidden, hidden), dtype=dtype),
        b2=jnp.zeros((hidden,), dtype=dtype),
        w3=std * jax.random.normal(k3, (hidden, d), dtype=dtype),
        b3=jnp.zeros((d,), dtype=dtype)))


def mlp_rhs(params: NeuralODEParams, x: jax.Array) -> jax.Array:
    """dx/dt = MLP(x); (..., D) -> (..., D). Time-invariant like the reference."""
    m = params.mlp
    h = jnp.tanh(jnp.dot(x, m.w1, precision=om.HIGHEST) + m.b1)
    h = jnp.tanh(jnp.dot(h, m.w2, precision=om.HIGHEST) + m.b2)
    return jnp.dot(h, m.w3, precision=om.HIGHEST) + m.b3


def neural_ode_forward(params: NeuralODEParams, x0: jax.Array, ts: jax.Array,
                       cfg: SolverConfig) -> tuple[jax.Array, ODEStats]:
    """Integrate from x0 (N, D) over ts (T,) -> ((N, T, D), stats)."""
    xs, stats = odeint(lambda t, x: mlp_rhs(params, x), x0, ts,
                       solver=cfg.solver, rtol=cfg.rtol, atol=cfg.atol,
                       substeps=cfg.substeps, max_steps=cfg.max_steps)
    return jnp.moveaxis(xs, 0, 1), stats


class NeuralODETerms(NamedTuple):
    loss: jax.Array
    observ_nll: jax.Array  # = MSE (kept for Trainer meter compatibility)
    x0_kl: jax.Array
    inducing_kl: jax.Array
    nfe: jax.Array


def mse_loss(key: jax.Array, params: NeuralODEParams, ys: jax.Array,
             ts: jax.Array, cfg: SolverConfig) -> tuple[jax.Array, NeuralODETerms]:
    """MSE from the observed initial state (`model_builder.py:81-90`); the key
    argument keeps the Trainer signature (deterministic model ignores it)."""
    del key
    pred, stats = neural_ode_forward(params, ys[:, 0], ts, cfg)
    loss = jnp.mean(jnp.square(pred - ys))
    zero = jnp.zeros(())
    return loss, NeuralODETerms(loss=loss, observ_nll=loss, x0_kl=zero,
                                inducing_kl=zero, nfe=stats.num_rhs_evals)


def predict(params: NeuralODEParams, y0: jax.Array, ts: jax.Array,
            cfg: SolverConfig) -> jax.Array:
    """Deterministic prediction from y0 (`model_builder.py:93-103`)."""
    pred, _ = neural_ode_forward(params, y0, ts, cfg)
    return pred
