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
