"""Predictive summary metrics: mixture log-likelihood and MSE.

Rebuilds `compute_summary` (`src/gpode/model_builder.py:99-120`): given S
posterior-predictive sample trajectories, score

    MLL = mean over points of  logsumexp_s N(y; pred_s, noise_var) - log S
    MSE = mean over points of  (y - mean_s pred_s)^2

with an optional per-dim rescaling for standardized data. Host-side numpy,
like the reference (metrics are offline), plus a jittable device-side variant
(`mixture_summary_device`) for in-training tracking evals where fetching the
full (S, N, T, D_full) prediction tensor through the TPU tunnel would dwarf
the solve itself (VERDICT r4 item 1).
"""

from __future__ import annotations

import numpy as np
from scipy.special import logsumexp
from scipy.stats import norm


def compute_summary(actual: np.ndarray, predicted: np.ndarray,
                    noise_var: np.ndarray, ys_scale=1.0):
    """actual (N,T,D), predicted (S,N,T,D), noise_var (D,) -> (mll, mse)."""
    actual = np.asarray(actual) * ys_scale
    predicted = np.asarray(predicted) * ys_scale
    noise_var = np.asarray(noise_var) * np.asarray(ys_scale) ** 2 + 1e-8

    lik_samples = norm.logpdf(actual, loc=predicted, scale=noise_var ** 0.5)
    mll = logsumexp(lik_samples, 0, b=1.0 / float(predicted.shape[0])).mean()
    mse = np.power(actual - predicted.mean(0), 2).mean()
    return float(mll), float(mse)


def mixture_summary_device(actual, predicted, noise_var):
    """Jittable `compute_summary`: (actual (N,T,D), predicted (S,N,T,D),
    noise_var (D,)) -> (mll, mse) device scalars.

    Same math as the host version (logsumexp mixture over the S draws with
    b=1/S, MSE of the posterior mean), evaluated in f32 on device so a
    tracking eval costs a 2-scalar fetch instead of shipping the full
    prediction tensor to host numpy. Against the f64 host metric the f32
    logsumexp agrees to ~1e-5 relative (pinned in tests/test_reference_parity
    .py::test_device_summary_matches_host); recorded crossings should still
    use the host metric.
    """
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp as jlse

    nv = noise_var + 1e-8
    log_norm = -0.5 * jnp.log(2.0 * jnp.pi * nv)
    lik = log_norm - 0.5 * (actual[None] - predicted) ** 2 / nv
    s = predicted.shape[0]
    mll = jlse(lik, axis=0, b=1.0 / s).mean()
    mse = ((actual - predicted.mean(0)) ** 2).mean()
    return mll, mse


def compute_mse(actual: np.ndarray, predicted: np.ndarray, ys_scale=1.0) -> float:
    """Deterministic-prediction MSE (NeuralODE baseline,
    `src/neuralode/model_builder.py:105-111`)."""
    actual = np.asarray(actual) * ys_scale
    predicted = np.asarray(predicted) * ys_scale
    return float(np.power(actual - predicted, 2).mean())


def compute_calibration(actual: np.ndarray, predicted: np.ndarray,
                        noise_var: np.ndarray,
                        levels=(0.5, 0.9, 0.95)) -> dict:
    """Empirical central-interval coverage of the predictive mixture.

    The predictive distribution at each point is the S-component Gaussian
    mixture sum_s N(y; pred_s, noise_var)/S — the same distribution the MLL
    metric scores. Its PIT value u = F(y_obs) is exact:
    u = mean_s Phi((y - pred_s)/sigma). A point falls inside the central
    q-interval iff |u - 1/2| <= q/2, so empirical coverage at level q is
    mean(|u - 1/2| <= q/2); a well-calibrated model gives coverage ~= q.

    Returns {"coverage": {q: frac}, "pit_mae": mean |u - 1/2| (0.25 when
    perfectly calibrated, -> 0 over-dispersed, -> 0.5 over-confident)}.
    """
    actual = np.asarray(actual)
    predicted = np.asarray(predicted)
    sigma = np.sqrt(np.asarray(noise_var) + 1e-12)
    pit = norm.cdf((actual[None] - predicted) / sigma).mean(0)  # (N,T,D)
    dev = np.abs(pit - 0.5)
    return {
        "coverage": {float(q): float((dev <= q / 2).mean()) for q in levels},
        "pit_mae": float(dev.mean()),
    }
