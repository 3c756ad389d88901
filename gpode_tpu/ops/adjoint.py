"""Continuous-adjoint gradients: O(1)-memory reverse mode through the solver.

The reference exposed torchdiffeq's `odeint_adjoint` via the `use_adjoint`
flag (`src/core/flow.py:41,68`; scripts default it off). This module provides
the same capability natively: :func:`odeint_adjoint` solves the IVP forward
WITHOUT taping solver internals, and its custom VJP integrates the augmented
system

    d/dt [x, a, g] = [f(t, x), -a^T df/dx, -a^T df/dtheta]

backward between observation times (Pontryagin/"optimize-then-discretize"),
accumulating the output cotangents into `a` at each observation. The
augmented state is raveled to a single vector so the stock solvers apply.

Trade-offs vs the default autodiff-through-solver: memory is O(state) instead
of O(steps x state), at the cost of a second (backward) solve and gradients
that are exact for the *continuous* problem rather than the discretized one.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.flatten_util
import jax.numpy as jnp

from gpode_tpu.ops.ode import odeint


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7, 8, 9))
def odeint_adjoint(f: Callable, params, x0: jax.Array, ts: jax.Array,
                   solver: str = "dopri5", rtol: float = 1e-6,
                   atol: float = 1e-6, substeps: int = 1,
                   max_steps: int = 256,
                   first_step: float | None = None):
    """Integrate dx/dt = f(params, t, x) from x0 over ts; gradients via the
    continuous adjoint. Returns (xs (T, *x0.shape), ODEStats) — the stats are
    the FORWARD solve's counters (integer outputs carry symbolic-zero
    cotangents through the custom vjp, so exposing them costs nothing); the
    backward adjoint solve's own evaluations are not counted.
    """
    return odeint(lambda t, x: f(params, t, x), x0, ts, solver=solver,
                  rtol=rtol, atol=atol, substeps=substeps,
                  max_steps=max_steps, first_step=first_step)


def _fwd(f, params, x0, ts, solver, rtol, atol, substeps, max_steps,
         first_step):
    # (custom_vjp passes nondiff args in-position to fwd, but first to bwd.)
    xs, stats = odeint_adjoint(f, params, x0, ts, solver, rtol, atol,
                               substeps, max_steps, first_step)
    return (xs, stats), (params, xs, ts)


def _bwd(f, solver, rtol, atol, substeps, max_steps, first_step, residuals,
         gs):
    # first_step tunes the FORWARD segment solves; the adjoint intervals
    # integrate backward over one observation interval each and keep the
    # init heuristic.
    del first_step
    g, _ = gs  # stats cotangents are symbolic zeros (integer outputs)
    params, xs, ts = residuals
    num_t = ts.shape[0]


    flat_params, unravel_params = jax.flatten_util.ravel_pytree(params)
    state_shape = xs.shape[1:]
    state_size = math.prod(state_shape)

    def pack(x, a, gp):
        return jnp.concatenate([x.reshape(-1), a.reshape(-1), gp])

    def unpack(z):
        x = z[:state_size].reshape(state_shape)
        a = z[state_size:2 * state_size].reshape(state_shape)
        gp = z[2 * state_size:]
        return x, a, gp

    def aug_dynamics(t, z):
        x, a, _ = unpack(z)

        def fx(params_, x_):
            return f(params_, t, x_)

        dx, vjp_fn = jax.vjp(fx, params, x)
        dparams, dx_cot = vjp_fn(a)
        dparams_flat, _ = jax.flatten_util.ravel_pytree(dparams)
        return pack(dx, -dx_cot, -dparams_flat)

    def backward_interval(carry, idx):
        """Integrate the adjoint from ts[idx] down to ts[idx-1]."""
        a, gp = carry
        # inject the cotangent of the observation at ts[idx]
        a = a + g[idx]
        x_t = xs[idx]
        z0 = pack(x_t, a, gp)
        t_pair = jnp.stack([ts[idx], ts[idx - 1]])
        zs, _ = odeint(aug_dynamics, z0, t_pair, solver=solver, rtol=rtol,
                       atol=atol, substeps=substeps, max_steps=max_steps)
        _, a_next, gp_next = unpack(zs[-1])
        return (a_next, gp_next), None

    a0 = jnp.zeros(state_shape, dtype=xs.dtype)
    gp0 = jnp.zeros_like(flat_params)
    (a_final, gp_final), _ = jax.lax.scan(
        backward_interval, (a0, gp0),
        jnp.arange(num_t - 1, 0, -1))
    a_final = a_final + g[0]  # cotangent of the initial observation

    return unravel_params(gp_final), a_final, jnp.zeros_like(ts)


odeint_adjoint.defvjp(_fwd, _bwd)
