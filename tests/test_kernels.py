"""RBF kernel tests against naive O(N^2) loops and spectral-density moments."""

import jax
import jax.numpy as jnp
import numpy as np

from gpode_tpu.ops.kernels import init_rbf, rbf_K, rbf_K_diag, rbf_sample_freq


def _naive_rbf(x, x2, ls, var):
    n, m = x.shape[0], x2.shape[0]
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            d = (x[i] - x2[j]) / ls
            out[i, j] = var * np.exp(-0.5 * np.sum(d * d))
    return out


def test_rbf_matches_naive_shared():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    x2 = rng.normal(size=(5, 3)).astype(np.float32)
    p = init_rbf(3, dimwise=False, lengthscale=1.3, variance=0.5)
    got = np.asarray(rbf_K(p, jnp.asarray(x), jnp.asarray(x2)))
    want = _naive_rbf(x, x2, np.asarray(p.lengthscales), float(p.variance[0]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rbf_matches_naive_dimwise():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 2)).astype(np.float32)
    p = init_rbf(2, 4, dimwise=True, lengthscale=0.9, variance=1.7)
    got = np.asarray(rbf_K(p, jnp.asarray(x)))
    assert got.shape == (4, 6, 6)
    want = _naive_rbf(x, x, np.asarray(p.lengthscales[0]), float(p.variance[0]))
    for d in range(4):
        np.testing.assert_allclose(got[d], want, rtol=1e-4, atol=1e-5)


def test_rbf_diag_and_symmetry():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 3)).astype(np.float32)
    for dimwise in (False, True):
        p = init_rbf(3, 3, dimwise=dimwise)
        k = np.asarray(rbf_K(p, jnp.asarray(x)))
        kd = np.asarray(rbf_K_diag(p, jnp.asarray(x)))
        if dimwise:
            np.testing.assert_allclose(np.diagonal(k, axis1=1, axis2=2), kd, rtol=1e-5)
            np.testing.assert_allclose(k, np.swapaxes(k, 1, 2), rtol=1e-4, atol=1e-5)
        else:
            np.testing.assert_allclose(np.diag(k), kd, rtol=1e-5)
            np.testing.assert_allclose(k, k.T, rtol=1e-4, atol=1e-5)


def test_sample_freq_shapes_and_scale():
    key = jax.random.PRNGKey(0)
    p = init_rbf(3, dimwise=False, lengthscale=2.0)
    om_ = rbf_sample_freq(p, key, 4096)
    assert om_.shape == (3, 4096)
    # omega ~ N(0, 1/ls^2): std should be ~1/2
    np.testing.assert_allclose(np.std(np.asarray(om_)), 0.5, rtol=0.05)

    p2 = init_rbf(2, 5, dimwise=True, lengthscale=0.5)
    om2 = rbf_sample_freq(p2, key, 128)
    assert om2.shape == (2, 128, 5)
    np.testing.assert_allclose(np.std(np.asarray(om2)), 2.0, rtol=0.1)


def test_rff_covariance_approximates_kernel():
    """E[phi(x) phi(y)] under the spectral measure approximates K(x, y)."""
    from gpode_tpu.models.gp import init_svgp, rff_eval
    key = jax.random.PRNGKey(42)
    p = init_svgp(key, 2, 2, 4, dimwise=False)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(5, 2)).astype(np.float32))

    s = 2048
    draws = []
    for i in range(200):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        omega = rbf_sample_freq(p.kernel, k1, s)
        phase = 2.0 * jnp.pi * jax.random.uniform(k2, (1, s))
        w = jax.random.normal(k3, (s, 1))
        draws.append(np.asarray(rff_eval(p, omega, phase, w, x))[:, 0])
    draws = np.stack(draws)  # (64, 5)
    emp_cov = draws.T @ draws / draws.shape[0]
    want = np.asarray(rbf_K(p.kernel, x))
    np.testing.assert_allclose(emp_cov, want, atol=0.2)
