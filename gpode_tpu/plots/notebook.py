"""Inline (notebook) display variants of the diagnostic plots.

Rebuilds `src/misc/plot_utils.py`: the same visuals as
`gpode_tpu.plots.plots_2d` but rendered to the active display instead of
files, for interactive use in the tutorial notebook.
"""

from __future__ import annotations

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from gpode_tpu.models import gp as gp_mod
from gpode_tpu.plots.plots_2d import _grid, unwhiten_inducing


def show_longitudinal(data, pred: np.ndarray, noise_var: np.ndarray):
    """Predictive bands vs observations, one panel per state dim."""
    mean, std = pred.mean(0), pred.std(0)
    d = mean.shape[-1]
    fig, axs = plt.subplots(1, d, figsize=(6 * d, 2.8))
    for dim, ax in enumerate(np.atleast_1d(axs)):
        m, s = mean[0, :, dim], std[0, :, dim]
        sp = np.sqrt(s ** 2 + noise_var[dim % len(noise_var)])
        ax.fill_between(data.tst.ts, m - 2 * sp, m + 2 * sp, alpha=0.2)
        ax.fill_between(data.tst.ts, m - 2 * s, m + 2 * s, alpha=0.4)
        ax.plot(data.tst.ts, m)
        ax.scatter(data.trn.ts, data.trn.ys[0, :, dim], c="k", s=8)
        ax.set_title(f"State {dim + 1}")
        ax.set_xlabel("time")
    plt.show()


def show_vectorfield(gp_params, data, pred: np.ndarray = None):
    """Learned mean field + posterior-std contours next to the truth."""
    xx, yy, grid = _grid(data)
    mean, var = gp_mod.conditional(gp_params, jnp.asarray(grid, dtype=jnp.float32))
    mean = np.asarray(mean)
    std = np.sqrt(np.maximum(np.asarray(var), 0.0)).sum(-1)
    true_field = np.stack([data.f(g) for g in grid])

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5), sharex=True, sharey=True)
    ax1.streamplot(xx, yy, true_field[:, 0].reshape(xx.shape),
                   true_field[:, 1].reshape(xx.shape), color="grey")
    ax1.set_title("True vector field")
    cs = ax2.contourf(xx, yy, std.reshape(xx.shape), levels=12, cmap="Blues",
                      alpha=0.6)
    fig.colorbar(cs, ax=ax2)
    ax2.streamplot(xx, yy, mean[:, 0].reshape(xx.shape),
                   mean[:, 1].reshape(xx.shape), color="k")
    if pred is not None:
        for s in range(min(8, pred.shape[0])):
            ax2.plot(pred[s, 0, :, 0], pred[s, 0, :, 1], "r-", alpha=0.3, lw=0.8)
    ax2.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], c="k", s=6)
    ax2.set_title("Learned posterior mean field")
    plt.show()


def show_vectorfield_posterior(gp_params, data, pred: np.ndarray, key=None,
                               num_features: int = 256):
    """The 3-panel sampled-field diagnostic, displayed inline
    (`src/misc/plot_utils.py:92-190`): true field, draw-mean field with
    log-std contours, and per-draw quiver samples with predictive
    trajectories."""
    from gpode_tpu.plots.plots_2d import vectorfield_3panel_figure

    vectorfield_3panel_figure(gp_params, data, pred, key=key,
                              num_features=num_features)
    plt.show()


def show_longitudinal_per_sequence(data, pred: np.ndarray,
                                   noise_var: np.ndarray):
    """Per-sequence posterior/predictive band figures, displayed inline
    (`src/misc/plot_utils.py:63-90`). Shares the figure builder with
    `plots_2d.plot_longitudinal_per_sequence`, including its skip semantics
    for predictions beyond the data's sequence count."""
    from gpode_tpu.plots.plots_2d import longitudinal_sequence_figure

    mean, var = pred.mean(0), pred.var(0)
    for n in range(mean.shape[0]):
        longitudinal_sequence_figure(data, mean, var, noise_var, n,
                                     "Predictive posterior")
        plt.show()


def show_inducing(gp_params, data):
    u, z = unwhiten_inducing(gp_params)
    fig, ax = plt.subplots(figsize=(5.5, 5.5))
    ax.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], c="k", s=6)
    ax.quiver(z[:, 0], z[:, 1], u[:, 0], u[:, 1], color="tab:blue", angles="xy")
    ax.scatter(z[:, 0], z[:, 1], c="tab:blue", s=14)
    ax.set_xlim(data.xlim); ax.set_ylim(data.ylim)
    plt.show()


def show_model_initialization(key, params, data, cfg, num_features: int,
                              num_draws: int = 20, ax=None):
    """Init-stage snapshot (`src/misc/plot_utils.py:11-60`): posterior mean
    field streamplot, mean predicted trajectory, observations, and the state
    posterior means (x0 always; shooting states when `params` has them)."""
    from gpode_tpu.models import gpode as gpode_mod

    show = ax is None
    if ax is None:
        _, ax = plt.subplots(figsize=(5.5, 5.5))
    xx, yy, grid = _grid(data)
    mean, _ = gp_mod.conditional(params.gp, jnp.asarray(grid, dtype=jnp.float32))
    mean = np.asarray(mean)
    ax.streamplot(xx, yy, mean[:, 0].reshape(xx.shape),
                  mean[:, 1].reshape(xx.shape), color="grey")
    ax.set_xticks([]), ax.set_yticks([])

    has_states = hasattr(params, "states")
    x0_post = params.states.x0 if has_states else params.x0
    vparams = gpode_mod.GPODEParams(gp=params.gp, x0=x0_post,
                                    likelihood=params.likelihood)
    pred = np.asarray(gpode_mod.predict(key, vparams,
                                        jnp.asarray(data.trn.ts), cfg,
                                        num_features,
                                        num_draws=num_draws)).mean(0)
    ax.plot(pred[0, :, 0], pred[0, :, 1], c="tab:red", lw=1.0, zorder=1)
    ax.scatter(pred[0, :, 0], pred[0, :, 1], marker="x", c="tab:red", s=18,
               zorder=2, label="predicted ys")
    ax.scatter(data.trn.ys[0, :, 0], data.trn.ys[0, :, 1], marker="x", c="k",
               s=18, zorder=2, label="observed ys")
    if has_states:
        sm = np.asarray(params.states.mean)
        ax.scatter(sm[0, :, 0], sm[0, :, 1], marker="x", c="tab:blue", s=18,
                   zorder=3, label="latent xs (mean)")
    x0m = np.asarray(x0_post.mean)
    ax.scatter(x0m[0, 0], x0m[0, 1], marker="o", c="tab:blue", zorder=4,
               label="latent x0 (mean)")
    ax.legend(loc="lower right", fontsize=8)
    if show:
        plt.show()


def show_trace(trainer):
    fig, axs = plt.subplots(1, 3, figsize=(12, 2.8))
    for (name, meter), ax in zip(
            [("loss", trainer.loss_meter),
             ("observation NLL", trainer.observ_nll_meter),
             ("inducing KL", trainer.inducing_kl_meter)], axs):
        ax.plot(meter.iters, meter.vals, lw=0.6)
        ax.set_title(name)
    plt.show()
