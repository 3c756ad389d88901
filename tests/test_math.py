"""Unit tests for the math substrate against closed forms and NumPy/SciPy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from gpode_tpu.ops import math as om


def test_softplus_roundtrip():
    x = jnp.linspace(-5.0, 5.0, 41)
    y = om.softplus(x)
    assert np.all(np.asarray(y) > 0)
    np.testing.assert_allclose(om.invsoftplus(y), x, rtol=1e-4, atol=1e-5)


def test_invsoftplus_matches_reference_constants():
    # The reference initializes kernels at softplus^-1(1.3), softplus^-1(0.5).
    for v in (1.3, 0.5, 0.25, 1e-3):
        np.testing.assert_allclose(float(om.softplus(om.invsoftplus(v))), v, rtol=1e-5)


def test_fill_pack_tril_roundtrip_batched():
    rng = np.random.default_rng(0)
    n = 5
    packed = jnp.asarray(rng.normal(size=(3, 4, om.tril_size(n))).astype(np.float32))
    dense = om.fill_tril(packed, n)
    assert dense.shape == (3, 4, n, n)
    # strictly lower-triangular structure
    assert np.allclose(np.triu(np.asarray(dense), k=1), 0.0)
    np.testing.assert_allclose(om.pack_tril(dense), packed)


def test_fill_tril_matches_scatter_oracle_and_grads():
    """fill_tril is a static GATHER with a custom gather VJP (the scatter
    lowering cost 0.56 ms/step at M=256 — round-4 scale trace). Pin value,
    gradient, and vmap equivalence against the plain scatter formulation."""
    def scatter_fill(packed, n):
        rows, cols = om.tril_indices(n)
        out = jnp.zeros(packed.shape[:-1] + (n, n), dtype=packed.dtype)
        return out.at[..., rows, cols].set(packed)

    rng = np.random.default_rng(2)
    for n, batch in ((1, ()), (5, (3,)), (17, (2, 4)), (64, (5,))):
        packed = jnp.asarray(
            rng.normal(size=batch + (om.tril_size(n),)).astype(np.float32))
        np.testing.assert_array_equal(om.fill_tril(packed, n),
                                      scatter_fill(packed, n))
        # cotangent mixes tril and (ignored) strict-upper positions
        cot = jnp.asarray(
            rng.normal(size=batch + (n, n)).astype(np.float32))
        g_gather = jax.grad(
            lambda p: jnp.vdot(om.fill_tril(p, n), cot))(packed)
        g_scatter = jax.grad(
            lambda p: jnp.vdot(scatter_fill(p, n), cot))(packed)
        np.testing.assert_array_equal(g_gather, g_scatter)

    # vmap over a leading axis the function does not broadcast itself
    packed = jnp.asarray(rng.normal(size=(6, om.tril_size(5))).astype(np.float32))
    np.testing.assert_array_equal(jax.vmap(lambda p: om.fill_tril(p, 5))(packed),
                                  om.fill_tril(packed, 5))


def test_cholesky_jittered_and_solves():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(6, 6)).astype(np.float32)
    spd = a @ a.T + 6 * np.eye(6, dtype=np.float32)
    L = om.cholesky_jittered(jnp.asarray(spd), jitter=0.0)
    np.testing.assert_allclose(np.asarray(L @ L.T), spd, rtol=1e-4, atol=1e-4)
    b = rng.normal(size=(6, 2)).astype(np.float32)
    x = om.solve_upper_from_lower(L, om.solve_lower(L, jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(spd @ np.asarray(x)), b, rtol=1e-3, atol=1e-3)


def test_gaussian_logpdf_matches_scipy():
    from scipy.stats import norm
    y, m, v = 0.3, -0.2, 0.7
    got = float(om.gaussian_logpdf(jnp.asarray(y), jnp.asarray(m), jnp.asarray(v)))
    np.testing.assert_allclose(got, norm.logpdf(y, loc=m, scale=np.sqrt(v)), rtol=1e-5)


def test_laplace_logpdf_matches_scipy():
    from scipy.stats import laplace
    got = float(om.laplace_logpdf(jnp.asarray(0.4), jnp.asarray(0.1), jnp.asarray(0.5)))
    np.testing.assert_allclose(got, laplace.logpdf(0.4, loc=0.1, scale=0.5), rtol=1e-5)


def _kl_mvn_vs_standard(mean, cov):
    """Closed-form KL(N(mean, cov) || N(0, I)) via scipy-free numpy."""
    k = mean.shape[0]
    sign, logdet = np.linalg.slogdet(cov)
    return 0.5 * (np.trace(cov) + mean @ mean - k - logdet)


def test_kl_whitened_gaussian_full():
    rng = np.random.default_rng(2)
    means = rng.normal(size=(3, 4)).astype(np.float32)
    trils = np.tril(rng.normal(size=(3, 4, 4)).astype(np.float32))
    for i in range(3):
        np.fill_diagonal(trils[i], np.abs(np.diag(trils[i])) + 0.5)
    got = float(om.kl_whitened_gaussian(jnp.asarray(means), jnp.asarray(trils)))
    want = sum(_kl_mvn_vs_standard(means[i], trils[i] @ trils[i].T) for i in range(3))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kl_whitened_gaussian_diag_matches_full():
    rng = np.random.default_rng(3)
    means = rng.normal(size=(2, 5)).astype(np.float32)
    scales = (0.1 + rng.random(size=(2, 5))).astype(np.float32)
    got = float(om.kl_whitened_gaussian_diag(jnp.asarray(means), jnp.asarray(scales)))
    trils = np.stack([np.diag(s) for s in scales])
    want = float(om.kl_whitened_gaussian(jnp.asarray(means), jnp.asarray(trils)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_logpdf_consistency_with_mvn():
    # diagonal-Gaussian elementwise logpdf sums to the MVN log density
    rng = np.random.default_rng(4)
    y = rng.normal(size=4)
    m = rng.normal(size=4)
    v = 0.3 + rng.random(4)
    got = float(jnp.sum(om.gaussian_logpdf(jnp.asarray(y), jnp.asarray(m), jnp.asarray(v))))
    want = multivariate_normal.logpdf(y, mean=m, cov=np.diag(v))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_cholesky_small_matches_lapack():
    # the unrolled fused factorization must equal jnp.linalg.cholesky in
    # value AND gradient on batched tiny SPD matrices (the shooting-entropy
    # shape class), including D=1 and the jittered-auto dispatch
    rng = np.random.default_rng(5)
    for d in (1, 3, 5, 8):
        a = rng.normal(size=(4, 7, d, d)).astype(np.float32)
        spd = a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(d, dtype=np.float32)
        want = np.asarray(jnp.linalg.cholesky(jnp.asarray(spd)))
        got = np.asarray(om.cholesky_small(jnp.asarray(spd)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

        # gradient convention differs on the (ignored) upper triangle —
        # cholesky_small reads only the lower triangle while lapack
        # symmetrizes the cotangent — so compare through the symmetric
        # construction the models actually use (cov = B B^T + c I): there
        # the two conventions chain to identical gradients.
        def through_sym(chol_fn):
            def loss(b):
                cov = b @ jnp.swapaxes(b, -1, -2) + 0.5 * jnp.eye(d)
                return jnp.sum(jnp.sin(chol_fn(cov)))
            return jax.grad(loss)(jnp.asarray(a))

        np.testing.assert_allclose(
            np.asarray(through_sym(om.cholesky_small)),
            np.asarray(through_sym(jnp.linalg.cholesky)),
            rtol=2e-4, atol=2e-4)

    auto = np.asarray(om.cholesky_jittered_auto(jnp.asarray(spd), 1e-5))
    ref = np.asarray(om.cholesky_jittered(jnp.asarray(spd), 1e-5))
    np.testing.assert_allclose(auto, ref, rtol=2e-5, atol=2e-5)
