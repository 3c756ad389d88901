"""SVGP core tests: decoupled-sampling moments vs the exact conditional, KL forms.

Strategy per SURVEY.md §4: check the rebuild against closed forms and the
reference's *math* (Wilson et al. 2020 pathwise sampling), not its code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpode_tpu.models import gp
from gpode_tpu.ops import math as om
from gpode_tpu.ops.kernels import rbf_K


def _make_params(key, d_in=2, d_out=2, m=8, dimwise=True, q_diag=False, informative=True):
    p = gp.init_svgp(key, d_in, d_out, m, dimwise=dimwise, q_diag=q_diag)
    if informative:
        # non-trivial posterior: random mean, non-identity scale
        k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
        p = p._replace(u_mean=jax.random.normal(k1, p.u_mean.shape))
        if q_diag:
            p = p._replace(u_diag_raw=om.invsoftplus(
                0.1 + 0.3 * jax.random.uniform(k2, p.u_diag_raw.shape)))
        else:
            tril = om.fill_tril(p.u_tril, m)
            bump = 0.3 * jax.random.normal(k2, tril.shape)
            tril = jnp.tril(bump) + 0.5 * jnp.eye(m)
            p = p._replace(u_tril=om.pack_tril(tril))
    return p


@pytest.mark.parametrize("dimwise,q_diag", [(True, False), (False, False),
                                            (True, True), (False, True)])
@pytest.mark.slow
def test_decoupled_sampling_moments_match_conditional(dimwise, q_diag):
    """Mean/var of many pathwise draws must match the exact conditional
    q(f(x)) (reference semantics: `build_cache`+`forward` vs
    `build_conditional`, dsvgp.py:92-197 vs 139-170)."""
    key = jax.random.PRNGKey(0)
    p = _make_params(key, dimwise=dimwise, q_diag=q_diag)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 2)).astype(np.float32) * 0.5)

    s = 512  # RFF features: large to shrink prior-approximation bias
    num_draws = 1500
    chol = gp.precompute_chol(p)

    def one(k):
        d = gp.draw_posterior(k, p, s, chol)
        return gp.eval_draw(p, d, x)

    fs = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(1), num_draws))  # (R,6,2)
    emp_mean = np.asarray(jnp.mean(fs, axis=0))
    emp_var = np.asarray(jnp.var(fs, axis=0))

    mean, var = gp.conditional(p, x)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(emp_var, np.asarray(var), rtol=0.25, atol=0.05)


def test_conditional_at_inducing_points_recovers_posterior():
    """At x = Z the whitened conditional mean is (K L^{-T}... ) — check via
    the identity mean(Z) = L u_mean (whitened parameterization)."""
    key = jax.random.PRNGKey(3)
    p = _make_params(key, dimwise=False)
    mean, var = gp.conditional(p, p.z, jitter=1e-10)
    kzz = rbf_K(p.kernel, p.z)
    L = om.cholesky_jittered(kzz, 1e-10)
    want = np.asarray(L @ p.u_mean)
    np.testing.assert_allclose(np.asarray(mean), want, rtol=1e-3, atol=1e-3)
    assert np.all(np.asarray(var) > -1e-4)


@pytest.mark.parametrize("q_diag", [False, True])
def test_kl_against_exact_gaussian_kl(q_diag):
    key = jax.random.PRNGKey(5)
    p = _make_params(key, dimwise=True, q_diag=q_diag)
    got = float(gp.kl(p))

    m = p.num_inducing
    total = 0.0
    for d in range(p.d_out):
        mu = np.asarray(p.u_mean[:, d])
        if q_diag:
            cov = np.diag(np.asarray(p.u_scale_diag()[:, d]) ** 2)
        else:
            L = np.asarray(p.u_scale_tril()[d])
            cov = L @ L.T
        sign, logdet = np.linalg.slogdet(cov)
        total += 0.5 * (np.trace(cov) + mu @ mu - m - logdet)
    np.testing.assert_allclose(got, total, rtol=1e-4)


def test_kl_zero_mean_identity_scale_is_zero():
    key = jax.random.PRNGKey(6)
    p = gp.init_svgp(key, 2, 2, 8, dimwise=True)
    p = p._replace(u_mean=jnp.zeros_like(p.u_mean),
                   u_tril=jnp.broadcast_to(om.pack_tril(jnp.eye(8)), p.u_tril.shape))
    np.testing.assert_allclose(float(gp.kl(p)), 0.0, atol=1e-5)


def test_draw_posterior_is_vmappable_and_deterministic():
    key = jax.random.PRNGKey(7)
    p = _make_params(key)
    x = jnp.ones((3, 2)) * 0.2
    d1 = gp.draw_posterior(jax.random.PRNGKey(9), p, 64)
    d2 = gp.draw_posterior(jax.random.PRNGKey(9), p, 64)
    np.testing.assert_array_equal(np.asarray(gp.eval_draw(p, d1, x)),
                                  np.asarray(gp.eval_draw(p, d2, x)))

    draws = jax.vmap(lambda k: gp.draw_posterior(k, p, 64))(
        jax.random.split(key, 4))
    fs = jax.vmap(lambda d: gp.eval_draw(p, d, x))(draws)
    assert fs.shape == (4, 3, 2)
    # different keys -> different fields
    assert not np.allclose(np.asarray(fs[0]), np.asarray(fs[1]))


def test_grads_flow_through_elbo_style_objective():
    key = jax.random.PRNGKey(8)
    p = _make_params(key)
    x = jnp.ones((4, 2)) * 0.3

    def loss(params):
        d = gp.draw_posterior(jax.random.PRNGKey(0), params, 32)
        return jnp.sum(gp.eval_draw(params, d, x) ** 2) + gp.kl(params)

    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.sum(jnp.abs(g.z))) > 0
    assert float(jnp.sum(jnp.abs(g.kernel.raw_lengthscales))) > 0


def test_conditional_full_cov_consistent_with_diag():
    key = jax.random.PRNGKey(10)
    p = _make_params(key, dimwise=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 2)).astype(np.float32))
    mean_d, var_d = gp.conditional(p, x, full_cov=False)
    mean_f, var_f = gp.conditional(p, x, full_cov=True)
    np.testing.assert_allclose(np.asarray(mean_d), np.asarray(mean_f), rtol=1e-4)
    # diagonal of the full covariance equals the diag-mode variance
    diag = np.asarray(jnp.diagonal(var_f, axis1=1, axis2=2)).T  # (N, D)
    np.testing.assert_allclose(diag, np.asarray(var_d), rtol=1e-3, atol=1e-4)


def test_rff_reference_scale_switch():
    from gpode_tpu.models.gp import set_rff_reference_scale
    key = jax.random.PRNGKey(11)
    p = _make_params(key, dimwise=False)
    x = jnp.ones((3, 2)) * 0.1
    omega = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    phase = 2 * jnp.pi * jax.random.uniform(jax.random.PRNGKey(2), (1, 64))
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 2))
    canonical = np.asarray(gp.rff_eval(p, omega, phase, w, x))
    try:
        set_rff_reference_scale(True)
        reference = np.asarray(gp.rff_eval(p, omega, phase, w, x))
    finally:
        set_rff_reference_scale(False)
    np.testing.assert_allclose(reference * np.sqrt(2.0), canonical, rtol=1e-5)
