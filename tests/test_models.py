"""Model-layer tests: states, likelihoods, constraints, ELBO structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import laplace, multivariate_normal, norm

from gpode_tpu.models import states as st
from gpode_tpu.models.constraints import constraint_log_prob, init_constraint
from gpode_tpu.models.likelihoods import (GaussianLikelihood, Projector,
                                          ProjectedGaussianLikelihood,
                                          gaussian_log_prob,
                                          init_gaussian_likelihood,
                                          likelihood_log_prob, project)
from gpode_tpu.ops import math as om


def test_initial_state_sample_moments():
    key = jax.random.PRNGKey(0)
    p = st.init_initial_state(key, dim_n=2, dim_d=3)
    # give it a non-trivial scale
    tril = 0.4 * jnp.eye(3) + 0.1
    p = p._replace(mean=jnp.asarray([[1.0, -1.0, 0.5], [0.0, 2.0, -0.3]]),
                   tril_packed=jnp.stack([om.pack_tril(jnp.tril(tril))] * 2))
    xs = st.sample_initial_state(jax.random.PRNGKey(1), p, 4000)  # (S,2,3)
    emp_mean = np.asarray(jnp.mean(xs, 0))
    np.testing.assert_allclose(emp_mean, np.asarray(p.mean), atol=0.05)
    L = np.tril(np.asarray(tril))
    want_cov = L @ L.T
    for n in range(2):
        emp_cov = np.cov(np.asarray(xs[:, n, :]).T)
        np.testing.assert_allclose(emp_cov, want_cov, atol=0.05)


def test_initial_state_kl_and_logprob_vs_scipy():
    key = jax.random.PRNGKey(2)
    p = st.init_initial_state(key, dim_n=3, dim_d=2)
    kl = float(st.initial_state_kl(p))
    # closed form check against numpy
    want = 0.0
    for n in range(3):
        m = np.asarray(p.mean[n])
        L = np.asarray(p.tril()[n])
        cov = L @ L.T
        want += 0.5 * (np.trace(cov) + m @ m - 2 - np.linalg.slogdet(cov)[1])
    np.testing.assert_allclose(kl, want, rtol=1e-4)

    x = np.asarray(p.mean) + 0.05
    got = np.asarray(st.initial_state_log_prob(p, jnp.asarray(x)))
    for n in range(3):
        L = np.asarray(p.tril()[n])
        want_lp = multivariate_normal.logpdf(
            x[n], mean=np.asarray(p.mean[n]), cov=L @ L.T + 1e-5 * np.eye(2))
        np.testing.assert_allclose(got[n], want_lp, rtol=1e-3, atol=1e-3)


def test_shooting_states_shapes_entropy():
    key = jax.random.PRNGKey(3)
    p = st.init_shooting_states(key, dim_n=2, dim_t=5, dim_d=3)
    ss = st.sample_shooting_states(jax.random.PRNGKey(4), p, num_samples=7)
    assert ss.shape == (7, 2, 6, 3)  # x0 + 5 shooting states

    ent = st.shooting_entropy(p)
    assert ent.shape == (2, 5)
    # entropy of N(m, L L^T + jitter) with L = 0.1 I:
    # 0.5*(d*(1+log 2pi) + logdet)
    want = 0.5 * (3 * (1 + np.log(2 * np.pi))
                  + np.linalg.slogdet(0.01 * np.eye(3) + 1e-5 * np.eye(3))[1])
    np.testing.assert_allclose(np.asarray(ent), want, rtol=1e-4)


def test_gaussian_likelihood_matches_scipy():
    lik = init_gaussian_likelihood(3, init_val=0.25)
    f = jnp.asarray([[0.1, -0.2, 0.3]])
    y = jnp.asarray([[0.0, 0.1, 0.2]])
    got = np.asarray(gaussian_log_prob(lik, f, y))
    var = np.asarray(lik.variance)
    want = norm.logpdf(np.asarray(y), loc=np.asarray(f), scale=var ** 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_projected_gaussian_and_projector():
    rng = np.random.default_rng(0)
    comps = rng.normal(size=(2, 5)).astype(np.float32)
    proj = Projector(components=jnp.asarray(comps),
                     norm_mean=jnp.asarray(rng.normal(size=(1, 1, 2)).astype(np.float32)),
                     norm_std=jnp.asarray((1 + rng.random((1, 1, 2))).astype(np.float32)))
    x = jnp.asarray(rng.normal(size=(3, 4, 2)).astype(np.float32))
    got = np.asarray(project(proj, x))
    want = (np.asarray(x) * np.asarray(proj.norm_std).reshape(-1)
            + np.asarray(proj.norm_mean).reshape(-1)) @ comps
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    lik = ProjectedGaussianLikelihood(base=init_gaussian_likelihood(5), projector=proj)
    y = jnp.asarray(rng.normal(size=(3, 4, 5)).astype(np.float32))
    lp = likelihood_log_prob(lik, x, y)
    assert lp.shape == (3, 4, 5)
    want_lp = norm.logpdf(np.asarray(y), loc=want,
                          scale=np.asarray(lik.variance) ** 0.5)
    np.testing.assert_allclose(np.asarray(lp), want_lp, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("kind,ref", [("gauss", norm), ("laplace", laplace)])
def test_constraints_match_scipy(kind, ref):
    c = init_constraint(kind, d=1, scale=1e-1)
    loc = jnp.asarray([0.3]); y = jnp.asarray([0.25])
    got = float(constraint_log_prob(c, loc, y)[0])
    want = ref.logpdf(0.25, loc=0.3, scale=float(c.scale[0]))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_frozen_mask_paths():
    from gpode_tpu.train.builders import (ModelArgs, build_shooting,
                                          default_frozen_predicate)
    from gpode_tpu.train.trainer import build_frozen_mask
    args = ModelArgs(num_inducing=4, num_features=8)
    params = build_shooting(jax.random.PRNGKey(0), args,
                            np.zeros((1, 5, 2), np.float32))
    mask = build_frozen_mask(params, default_frozen_predicate(args))
    assert bool(mask.constraint.raw_scale)            # frozen by default
    assert not bool(mask.gp.kernel.raw_lengthscales)  # trainable
    assert not bool(mask.likelihood.raw_variance)


@pytest.mark.slow
def test_neural_ode_baseline_learns_linear_system():
    import optax
    from gpode_tpu.models import neural_ode
    from gpode_tpu.models.flow import SolverConfig
    from gpode_tpu.train.trainer import make_train_step

    # data: exponential decay trajectories
    ts = jnp.linspace(0.0, 2.0, 10)
    x0 = jnp.asarray([[1.0, -1.0], [0.5, 2.0]])
    ys = x0[:, None, :] * jnp.exp(-ts)[None, :, None]

    cfg = SolverConfig(solver="rk4", ts_dense_scale=3, max_steps=16)
    params = neural_ode.init_neural_ode(jax.random.PRNGKey(0), 2, hidden=32)

    def loss_fn(p, key, ys, ts):
        return neural_ode.mse_loss(key, p, ys, ts, cfg)

    opt = optax.adam(1e-2)
    step = make_train_step(loss_fn, opt)
    s = opt.init(params)
    k = jax.random.PRNGKey(1)
    first = None
    for _ in range(150):
        params, s, k, terms = step(params, s, k, ys, ts)
        if first is None:
            first = float(terms.loss)
    assert float(terms.loss) < 0.1 * first
    pred = neural_ode.predict(params, x0, ts, cfg)
    assert float(jnp.mean(jnp.square(pred - ys))) < 0.05


# --- stochastic segment minibatching (beyond-reference scaling feature) ----

def _mb_setup(t=7):
    from gpode_tpu.models import shooting
    from gpode_tpu.train.builders import ModelArgs, build_shooting
    args = ModelArgs(num_inducing=6, num_features=8, solver="rk4",
                     ts_dense_scale=3, num_samples=3)
    rng = np.random.default_rng(3)
    ys = jnp.asarray(rng.normal(size=(2, t, 2)).astype(np.float32) * 0.4)
    ts = jnp.linspace(0.0, 1.0, t)
    params = build_shooting(jax.random.PRNGKey(0), args, np.asarray(ys))
    return shooting, args, params, ys, ts


@pytest.mark.slow
def test_segment_minibatch_identity_batch_equals_plain():
    """segment_idx = arange(T) runs the gather/Horvitz-Thompson formulation
    over every segment — it must reproduce the plain ELBO (same key)."""
    shooting, args, params, ys, ts = _mb_setup()
    key = jax.random.PRNGKey(5)
    cfg = args.solver_config()
    plain, _ = shooting.elbo_loss(key, params, ys, ts, cfg, args.num_features,
                                  num_samples=args.num_samples)
    t = ys.shape[1]
    full_idx, _ = shooting.elbo_loss(key, params, ys, ts, cfg,
                                     args.num_features,
                                     num_samples=args.num_samples,
                                     segment_idx=jnp.arange(t))
    np.testing.assert_allclose(float(full_idx), float(plain), rtol=1e-5)
    # permutation invariance of the estimator at K = T
    perm = jax.random.permutation(jax.random.PRNGKey(9), t)
    permuted, _ = shooting.elbo_loss(key, params, ys, ts, cfg,
                                     args.num_features,
                                     num_samples=args.num_samples,
                                     segment_idx=perm)
    np.testing.assert_allclose(float(permuted), float(plain), rtol=1e-5)


@pytest.mark.slow
def test_segment_minibatch_unbiased_by_enumeration():
    """K=1 enumerated over every segment: the average of the subsampled
    estimators equals the full ELBO exactly (uniform inclusion for the
    observation mean, T/K Horvitz-Thompson weights for the continuity sum,
    analytic terms constant)."""
    shooting, args, params, ys, ts = _mb_setup()
    key = jax.random.PRNGKey(5)
    cfg = args.solver_config()
    plain, _ = shooting.elbo_loss(key, params, ys, ts, cfg, args.num_features,
                                  num_samples=args.num_samples)
    t = ys.shape[1]
    losses = [float(shooting.elbo_loss(key, params, ys, ts, cfg,
                                       args.num_features,
                                       num_samples=args.num_samples,
                                       segment_idx=jnp.asarray([i]))[0])
              for i in range(t)]
    np.testing.assert_allclose(np.mean(losses), float(plain), rtol=1e-5)


@pytest.mark.slow
def test_segment_minibatch_trains_and_is_random_per_step():
    """The jitted random-subset path: finite losses, params move, and two
    different keys integrate different segment subsets (different losses at
    identical params)."""
    import optax
    from gpode_tpu.train.builders import shooting_loss_fn
    from gpode_tpu.train.trainer import make_train_step
    shooting, args, params, ys, ts = _mb_setup()
    import dataclasses as dc
    args = dc.replace(args, segment_minibatch=3)
    loss_fn = shooting_loss_fn(args)
    l1, _ = jax.jit(loss_fn)(params, jax.random.PRNGKey(1), ys, ts)
    l2, _ = jax.jit(loss_fn)(params, jax.random.PRNGKey(2), ys, ts)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)

    opt = optax.adam(1e-2)
    step = make_train_step(loss_fn, opt)
    p, s, k = params, opt.init(params), jax.random.PRNGKey(3)
    for _ in range(5):
        p, s, k, terms = step(p, s, k, ys, ts)
    assert np.isfinite(float(terms.loss))
    moved = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(params),
                                jax.tree_util.tree_leaves(p)))
    assert moved > 0
