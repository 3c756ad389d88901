"""Predictive summary metrics: mixture log-likelihood and MSE.

Rebuilds `compute_summary` (`src/gpode/model_builder.py:99-120`): given S
posterior-predictive sample trajectories, score

    MLL = mean over points of  logsumexp_s N(y; pred_s, noise_var) - log S
    MSE = mean over points of  (y - mean_s pred_s)^2

with an optional per-dim rescaling for standardized data. Host-side numpy,
like the reference (metrics are offline).
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
