"""Math substrate: constraint bijectors, packed-triangular storage, PSD helpers.

Replaces the reference's L0 parameter/transform layer
(`src/misc/constraint_utils.py:5-13`, `src/misc/transforms.py:8-116`,
`src/misc/param.py:7-28`) with pure functions over unconstrained pytree leaves.

The reference scatters packed lower-triangular parameters into dense matrices
with Python loops over matrices (`src/misc/transforms.py:70-80,105-116`); here
a single vectorized `.at[..., rows, cols].set` handles any batch shape, so the
same code serves the (D,M,M) inducing scales and the (N,T,D,D) shooting-state
Choleskys in one fused XLA op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Matches the reference's softplus lower bound (`src/misc/constraint_utils.py:6`).
SOFTPLUS_LOWER = 1e-12

# Default jitter for PSD factorizations (`src/core/dsvgp.py:8`, `settings.jitter`).
DEFAULT_JITTER = 1e-5

# Full-f32 matmul accumulation. JAX's default matmul precision truncates
# operands to bf16 on TPU (and mirrors that on CPU), which injects ~1e-3
# relative error into Gram matrices — fatal for Cholesky-based GP math. Every
# precision-critical contraction in this package passes this explicitly;
# deliberately-low-precision fast paths (Pallas kernels) opt out locally.
HIGHEST = jax.lax.Precision.HIGHEST


def softplus(x: jax.Array) -> jax.Array:
    """Positivity bijector: unconstrained -> constrained (> SOFTPLUS_LOWER)."""
    return jax.nn.softplus(x) + SOFTPLUS_LOWER


def invsoftplus(y) -> jax.Array:
    """Inverse of :func:`softplus`; accepts floats or arrays.

    Mirrors `src/misc/constraint_utils.py:10-13`: y -> y + log(1 - exp(-y))
    after clamping away the additive lower bound.
    """
    y = jnp.asarray(y, dtype=jnp.result_type(float))
    ys = jnp.maximum(y - SOFTPLUS_LOWER, jnp.finfo(y.dtype).eps)
    return ys + jnp.log(-jnp.expm1(-ys))


@functools.lru_cache(maxsize=None)
def tril_indices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (host) lower-triangle indices, cached per size."""
    rows, cols = np.tril_indices(n)
    return rows, cols


def tril_size(n: int) -> int:
    return n * (n + 1) // 2


@functools.lru_cache(maxsize=None)
def _tril_gather_index(n: int) -> np.ndarray:
    """Static flat (n*n,) map: 1-based packed position of each (i, j) in the
    lower triangle, 0 (a dedicated zero slot) above the diagonal."""
    idx = np.zeros((n, n), np.int32)
    rows, cols = tril_indices(n)
    idx[rows, cols] = np.arange(1, len(rows) + 1, dtype=np.int32)
    return idx.ravel()


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fill_tril(packed: jax.Array, n: int) -> jax.Array:
    """Expand packed triangular entries (..., n(n+1)/2) into (..., n, n) lower
    triangular matrices. Vectorized over arbitrary leading batch dims.

    Formulated as a GATHER with a static index map (prepend one zero slot,
    take) rather than a scatter into zeros: TPU lowers big static scatters
    through a sort-based expansion that cannot constant-fold (at M=256 the
    q(u) factor unpack cost 0.56 ms/step — sort + permutation fusions in the
    round-4 scale trace), while the gather is one HBM-bound fused op. The
    custom VJP keeps the backward a gather too (`pack_tril` of the cotangent
    is exact: fill_tril is linear and every output element is either a packed
    entry or a constant zero); without it, AD would transpose the gather back
    into the scatter this formulation exists to avoid.

    Constraint: `jax.custom_vjp` forecloses forward-mode AD — `jax.jvp` /
    `jacfwd` through any packed Cholesky factor (gp.py q_sqrt, states.py
    covariances) raises. Nothing in the repo uses forward mode; if that
    changes, reformulate with `jax.custom_jvp` (the JVP is the same gather
    applied to the tangent) and derive the VJP by linearity.
    """
    batch = packed.shape[:-1]
    zero = jnp.zeros(batch + (1,), dtype=packed.dtype)
    padded = jnp.concatenate([zero, packed], axis=-1)
    out = jnp.take(padded, jnp.asarray(_tril_gather_index(n)), axis=-1)
    return out.reshape(batch + (n, n))


def _fill_tril_fwd(packed, n):
    return fill_tril(packed, n), None


def _fill_tril_bwd(n, _, g):
    return (pack_tril(g),)


fill_tril.defvjp(_fill_tril_fwd, _fill_tril_bwd)


def pack_tril(mat: jax.Array) -> jax.Array:
    """Gather the lower triangle of (..., n, n) into (..., n(n+1)/2)."""
    n = mat.shape[-1]
    rows, cols = tril_indices(n)
    return mat[..., rows, cols]


def add_jitter(mat: jax.Array, jitter: float = DEFAULT_JITTER) -> jax.Array:
    """Add `jitter * I` to the trailing (n, n) block of a (batched) matrix."""
    n = mat.shape[-1]
    return mat + jitter * jnp.eye(n, dtype=mat.dtype)


def cholesky_jittered(mat: jax.Array, jitter: float = DEFAULT_JITTER) -> jax.Array:
    """Cholesky of `mat + jitter*I`; batched over leading dims."""
    return jnp.linalg.cholesky(add_jitter(mat, jitter))


# Trailing dim at or below this routes batched factorizations through the
# unrolled elementwise algorithm instead of XLA's Cholesky custom call. The
# custom call is blocked/sequential and priced for big matrices: on a batch
# of tiny state covariances it costs ~0.5 us per 5x5 on a v5e (0.30 ms/step
# for the (N, T-1, 5, 5) shooting-entropy factorization — 9% of the whole
# bench train step), while the unrolled D(D+1)/2 vector ops fuse into the
# surrounding elementwise work for ~free.
SMALL_CHOL_MAX_DIM = 8


def cholesky_small(a: jax.Array) -> jax.Array:
    """Unrolled Cholesky–Crout for tiny trailing dims; batched over leading
    dims. Identical math to `jnp.linalg.cholesky` (same triangle, same
    recurrence order) expressed as D(D+1)/2 elementwise vector ops so XLA
    fuses the whole factorization — no custom call, differentiable through
    plain arithmetic."""
    d = a.shape[-1]
    col = [[None] * d for _ in range(d)]
    for j in range(d):
        s = a[..., j, j]
        for k in range(j):
            s = s - col[j][k] * col[j][k]
        col[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / col[j][j]
        for i in range(j + 1, d):
            t = a[..., i, j]
            for k in range(j):
                t = t - col[i][k] * col[j][k]
            col[i][j] = t * inv_d
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [jnp.stack([col[i][j] if j <= i else zero for j in range(d)],
                      axis=-1) for i in range(d)]
    return jnp.stack(rows, axis=-2)


def cholesky_jittered_auto(mat: jax.Array,
                           jitter: float = DEFAULT_JITTER) -> jax.Array:
    """`cholesky_jittered`, but tiny trailing dims take the unrolled fused
    algorithm (see SMALL_CHOL_MAX_DIM). Use for batches of small state
    covariances; keep `cholesky_jittered` for the (D, M, M) GP factors where
    the blocked custom call wins."""
    if mat.shape[-1] <= SMALL_CHOL_MAX_DIM:
        return cholesky_small(add_jitter(mat, jitter))
    return cholesky_jittered(mat, jitter)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L x = b with L lower triangular; batched over leading dims."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def solve_upper_from_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L^T x = b with L lower triangular; batched over leading dims."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True, trans=1)


def tri_logdet_from_chol(L: jax.Array) -> jax.Array:
    """log det(L L^T) = 2 * sum(log diag L); batched over leading dims."""
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def gaussian_logpdf(y: jax.Array, mean: jax.Array, var: jax.Array) -> jax.Array:
    """Elementwise diagonal-Gaussian log density (`src/core/likelihoods.py:27-28`)."""
    return -0.5 * (jnp.log(2.0 * jnp.pi) + jnp.log(var) + jnp.square(y - mean) / var)


def laplace_logpdf(y: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """Elementwise Laplace log density (`src/core/constraints.py:62-66`)."""
    return -jnp.log(2.0 * scale) - jnp.abs(y - loc) / scale


def kl_whitened_gaussian(mean: jax.Array, chol: jax.Array) -> jax.Array:
    """KL( N(mean, L L^T) || N(0, I) ) summed over leading batch dims.

    `mean`: (..., k); `chol`: (..., k, k) lower triangular. Closed form used by
    the reference for both the inducing posterior (`src/core/dsvgp.py:199-230`)
    and the initial-state posterior (`src/core/states.py:97-114`):
        2 KL = ||m||^2 + ||L||_F^2 - log det(L L^T) - k.
    """
    k = mean.shape[-1]
    L = jnp.tril(chol)
    mahalanobis = jnp.sum(jnp.square(mean), axis=-1)
    trace = jnp.sum(jnp.square(L), axis=(-2, -1))
    # The scale factor is a RAW parameter: its diagonal may be negative or
    # tiny mid-optimization. log(diag^2) via log|diag| keeps the KL defined
    # for either sign (the reference computes log(Lq_diag^2), dsvgp.py:214);
    # the floor stops f32 underflow of diag^2 from producing -inf.
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(diag) + 1e-20), axis=-1)
    two_kl = mahalanobis + trace - logdet_q - k
    return 0.5 * jnp.sum(two_kl)


def kl_whitened_gaussian_diag(mean: jax.Array, scale: jax.Array) -> jax.Array:
    """Diagonal-covariance version of :func:`kl_whitened_gaussian`.

    `mean`, `scale`: (..., k) with q = N(mean, diag(scale^2)); prior N(0, I).
    Matches the reference's `q_diag` branch (`src/core/dsvgp.py:208-227`).
    """
    k = mean.shape[-1]
    mahalanobis = jnp.sum(jnp.square(mean), axis=-1)
    trace = jnp.sum(jnp.square(scale), axis=-1)
    logdet_q = jnp.sum(jnp.log(jnp.square(scale)), axis=-1)
    two_kl = mahalanobis + trace - logdet_q - k
    return 0.5 * jnp.sum(two_kl)
