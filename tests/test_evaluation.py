"""Device-side eval path: mixture metrics + fused predict->project->score."""

import jax
import jax.numpy as jnp
import numpy as np

from gpode_tpu.models import gpode
from gpode_tpu.train.builders import ModelArgs, build_gpode
from gpode_tpu.train.evaluation import make_projected_scorer
from gpode_tpu.train.metrics import compute_summary, mixture_summary_device


def test_device_summary_matches_host():
    rng = np.random.RandomState(0)
    actual = rng.randn(3, 7, 4).astype(np.float32)
    predicted = (actual[None] + 0.3 * rng.randn(16, 3, 7, 4)).astype(np.float32)
    noise_var = (0.05 + 0.1 * rng.rand(4)).astype(np.float32)

    ll_h, mse_h = compute_summary(actual, predicted, noise_var)
    ll_d, mse_d = jax.jit(mixture_summary_device)(
        jnp.asarray(actual), jnp.asarray(predicted), jnp.asarray(noise_var))
    np.testing.assert_allclose(float(ll_d), ll_h, rtol=2e-5)
    np.testing.assert_allclose(float(mse_d), mse_h, rtol=2e-5)


def test_projected_scorer_matches_host_pipeline():
    """The fused scorer must reproduce predict -> host compute_summary for
    the same key (identical draws -> identical trajectories -> metrics agree
    to f32-vs-f64 reduction tolerance)."""
    args = ModelArgs(num_inducing=8, num_features=16, solver="rk4",
                     ts_dense_scale=2, max_steps=8)
    rng = np.random.RandomState(1)
    ys = rng.randn(2, 6, 2).astype(np.float32)
    ts = np.linspace(0.0, 0.5, 6).astype(np.float32)
    params = build_gpode(jax.random.PRNGKey(0), args, ys)
    cfg = args.solver_config()

    key = jax.random.PRNGKey(42)
    x0 = jnp.asarray(ys[:, 0])
    scorer = make_projected_scorer(cfg, args.num_features, projector=None,
                                   ys_true=ys, ts=ts, x0=x0, num_draws=8)
    ll_d, mse_d = scorer(params, key)

    zs = gpode.predict(key, params, jnp.asarray(ts), cfg, args.num_features,
                       num_draws=8, x0=x0)
    ll_h, mse_h = compute_summary(ys, np.asarray(zs),
                                  np.asarray(params.likelihood.variance))
    np.testing.assert_allclose(float(ll_d), ll_h, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(mse_d), mse_h, rtol=2e-5, atol=1e-7)
