"""Observation-time-grid helpers (reference: `src/misc/torch_utils.py:36-48`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def insert_zero_t0(ts: jax.Array, dt=None) -> jax.Array:
    """Prepend a t=0 point, shifting all observation times by one interval:
    ts -> [0, ts + dt] with dt = ts[1] - ts[0] by default. Matches
    `torch_utils.py:36-38` — the initial state lives one interval *before*
    the first observation.

    `dt` overrides the shift. The shift is part of the LEARNED time axis
    (training places observation k at model time trn_ts[k] + dt_trn), so
    evaluation on a grid whose first interval differs from the training
    grid's — e.g. `VanderPolNonUniform`'s random test grid — must pass the
    TRAINING grid's first interval here to stay time-aligned."""
    if dt is None:
        dt = ts[1] - ts[0]
    return jnp.concatenate([jnp.zeros((1,), dtype=ts.dtype), ts + dt])


def substeps_from_dense_scale(ts_dense_scale: int) -> int:
    """Fixed-step sub-steps per observation interval implied by the
    reference's `ts_dense_scale` densification: `compute_ts_dense` inserts
    `scale` linspace points per interval and drops the duplicate endpoint
    (`torch_utils.py:41-48`), i.e. `scale - 1` integration steps per interval;
    scale <= 1 means the raw grid."""
    return max(1, ts_dense_scale - 1)
