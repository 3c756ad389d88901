"""RBF (squared-exponential) kernel as pure functions over a parameter pytree.

Rebuilds `src/core/kernels.py:18-112` TPU-first:
  * parameters are unconstrained leaves (softplus bijector applied on read),
  * `dimwise` (per-output-dim lengthscales/variance) is inferred statically
    from parameter shapes — no object state, so the same functions trace into
    vanilla jit, vmap over MC draws, and shard_map over meshes,
  * the Gram matrix is assembled via one `dot_general` plus rank-1 row/col
    terms so XLA tiles it onto the MXU and fuses the exp epilogue; a Pallas
    fast path lives in `gpode_tpu.ops.pallas_kernels`.

Shapes follow the reference convention:
  non-dimwise: lengthscales (Din,), variance (1,), K -> (N, M)
  dimwise:     lengthscales (D, Din), variance (D,), K -> (D, N, M)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpode_tpu.ops.math import HIGHEST, invsoftplus, softplus


class RBFParams(NamedTuple):
    """Unconstrained RBF kernel parameters.

    raw_lengthscales: (Din,) or dimwise (D, Din)
    raw_variance:     (1,)  or dimwise (D,)
    """

    raw_lengthscales: jax.Array
    raw_variance: jax.Array

    @property
    def dimwise(self) -> bool:
        return self.raw_lengthscales.ndim == 2

    @property
    def lengthscales(self) -> jax.Array:
        return softplus(self.raw_lengthscales)

    @property
    def variance(self) -> jax.Array:
        return softplus(self.raw_variance)


def init_rbf(d_in: int, d_out: Optional[int] = None, *, dimwise: bool = False,
             lengthscale: float = 1.3, variance: float = 0.5,
             dtype=jnp.float32) -> RBFParams:
    """Constant initialization matching `src/core/kernels.py:41-43`."""
    d_out = d_in if d_out is None else d_out
    ls_shape = (d_out, d_in) if dimwise else (d_in,)
    var_shape = (d_out,) if dimwise else (1,)
    raw_ls = jnp.full(ls_shape, invsoftplus(lengthscale), dtype=dtype)
    raw_var = jnp.full(var_shape, invsoftplus(variance), dtype=dtype)
    return RBFParams(raw_ls, raw_var)


def _sqdist(x: jax.Array, x2: jax.Array) -> jax.Array:
    """Scaled squared distance ||x_n - x2_m||^2 for pre-scaled inputs.

    x: (..., N, Din), x2: (..., M, Din) -> (..., N, M). The -2 x x2^T term is a
    single batched matmul (MXU); the squared-norm terms are rank-1 broadcasts
    the compiler fuses into the epilogue. Mirrors `kernels.py:53-89`.
    """
    xs = jnp.sum(jnp.square(x), axis=-1)
    x2s = jnp.sum(jnp.square(x2), axis=-1)
    cross = jnp.einsum("...nk,...mk->...nm", x, x2, precision=HIGHEST)
    return xs[..., :, None] - 2.0 * cross + x2s[..., None, :]


def rbf_K(params: RBFParams, x: jax.Array, x2: Optional[jax.Array] = None) -> jax.Array:
    """Gram matrix K(x, x2).

    x: (N, Din), x2: (M, Din) (defaults to x).
    Returns (N, M) non-dimwise or (D, N, M) dimwise (`kernels.py:91-99`).
    """
    if x2 is None:
        x2 = x
    ls = params.lengthscales
    var = params.variance
    if params.dimwise:
        xd = x[None, :, :] / ls[:, None, :]        # (D, N, Din)
        x2d = x2[None, :, :] / ls[:, None, :]      # (D, M, Din)
        sq = _sqdist(xd, x2d)                      # (D, N, M)
        return var[:, None, None] * jnp.exp(-0.5 * sq)
    xd = x / ls
    x2d = x2 / ls
    sq = _sqdist(xd, x2d)                          # (N, M)
    return var * jnp.exp(-0.5 * sq)


def rbf_K_diag(params: RBFParams, x: jax.Array) -> jax.Array:
    """diag K(x, x): (N,) non-dimwise or (D, N) dimwise."""
    n = x.shape[0]
    var = params.variance
    if params.dimwise:
        return jnp.broadcast_to(var[:, None], (var.shape[0], n))
    return jnp.broadcast_to(var, (n,)) if var.shape == (1,) else jnp.full((n,), var)


def rbf_sample_freq(params: RBFParams, key: jax.Array, num_features: int) -> jax.Array:
    """Sample spectral frequencies for random Fourier features.

    Standard-normal draws scaled by inverse lengthscales
    (`kernels.py:101-112`): returns (Din, S) non-dimwise or (Din, S, D) dimwise.
    """
    ls = params.lengthscales
    if params.dimwise:
        d_out, d_in = ls.shape
        omega = jax.random.normal(key, (d_in, num_features, d_out), dtype=ls.dtype)
        return omega / ls.T[:, None, :]
    d_in = ls.shape[0]
    omega = jax.random.normal(key, (d_in, num_features), dtype=ls.dtype)
    return omega / ls[:, None]
