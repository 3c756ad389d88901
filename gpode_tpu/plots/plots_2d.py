"""2-D model diagnostics: longitudinal bands, vector fields, inducing posteriors.

Rebuilds the diagnostic plot suite of `src/gpode/plots_2d.py` /
`src/gpode_shooting/plots_2d.py`: predictive bands separating posterior vs
predictive variance, learned-vs-true vector-field streamplots with posterior
std contours, un-whitened inducing arrows, and optimization traces.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from gpode_tpu.models import gp as gp_mod
from gpode_tpu.ops import math as om
from gpode_tpu.ops.kernels import rbf_K

# The reference's `make_plot=True` interactive display mode
# (`src/gpode/plots_2d.py:85-90`, `src/misc/plot_utils.py`): every plot
# function routes through `finish_figure`, which shows instead of saving
# when the switch is on.
_DISPLAY_MODE = False


def set_display_mode(enabled: bool):
    """True -> plot functions `plt.show()` figures instead of saving them
    (the reference's `make_plot=True` switch); False (default) -> save PNGs
    into `save_dir`."""
    global _DISPLAY_MODE
    _DISPLAY_MODE = bool(enabled)


def finish_figure(fig, save_dir: str, fname: str, dpi: int = 120, **savefig_kwargs):
    """Show (display mode) or save-and-close a finished figure."""
    if _DISPLAY_MODE:
        plt.show()
        return
    fig.savefig(os.path.join(save_dir, fname), dpi=dpi, **savefig_kwargs)
    plt.close(fig)


def plot_longitudinal(data, test_pred: np.ndarray, noise_var: np.ndarray,
                      save_dir: str, fname: str = "plt_longitudinal.png"):
    """Per-dimension predictive bands over time: mean +/- 2 std (posterior)
    and +/- 2 sqrt(std^2 + noise) (predictive), observations overlaid
    (`gpode/plots_2d.py:57-90`)."""
    pred_mean = test_pred.mean(0)          # (N, T, D)
    pred_std = test_pred.std(0)
    ts = data.tst.ts
    n, t, d = pred_mean.shape
    fig, axs = plt.subplots(d, 1, figsize=(10, 2.5 * d), sharex=True)
    axs = np.atleast_1d(axs)
    for dim, ax in enumerate(axs):
        for seq in range(n):
            m = pred_mean[seq, :, dim]
            s = pred_std[seq, :, dim]
            sp = np.sqrt(s ** 2 + noise_var[dim % len(noise_var)])
            ax.fill_between(ts, m - 2 * sp, m + 2 * sp, alpha=0.2,
                            color="tab:blue", label="predictive" if seq == 0 else None)
            ax.fill_between(ts, m - 2 * s, m + 2 * s, alpha=0.4,
                            color="tab:blue", label="posterior" if seq == 0 else None)
            ax.plot(ts, m, color="tab:blue")
        for seq in range(data.trn.ys.shape[0]):
            ax.scatter(data.trn.ts, data.trn.ys[seq, :, dim], c="k", s=8,
                       label="observations" if seq == 0 else None)
        ax.plot(ts, data.tst.ys[0, :, dim], "r--", lw=1, label="truth")
        ax.set_ylabel(f"state {dim + 1}")
    axs[0].legend(loc="upper right", fontsize=8)
    axs[-1].set_xlabel("time")
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def longitudinal_sequence_figure(data, pred_mean: np.ndarray,
                                 pred_var: np.ndarray, noise_var: np.ndarray,
                                 n: int, title: str):
    """One sequence's posterior/predictive band figure (the body of the
    reference's per-n loop, `gpode/plots_2d.py:57-90`). Out-of-range n
    (predictions without a matching data sequence) simply omit the
    true-trajectory/train-obs overlays — NEVER substitutes another
    sequence's ground truth."""
    d = pred_mean.shape[-1]
    fig, axs = plt.subplots(1, d, figsize=(8 * d, 3), squeeze=False)
    for dim in range(d):
        ax = axs[0, dim]
        m, pv = pred_mean[n, :, dim], pred_var[n, :, dim]
        sv = np.sqrt(pv + noise_var[dim % len(noise_var)])
        ax.plot(data.tst.ts, m, c="r", alpha=0.7, zorder=3, label="predicted")
        ax.fill_between(data.tst.ts, m - 2 * np.sqrt(pv),
                        m + 2 * np.sqrt(pv), color="r", alpha=0.1,
                        zorder=1, label="posterior")
        ax.fill_between(data.tst.ts, m - 2 * sv, m + 2 * sv, color="b",
                        alpha=0.1, zorder=0, label="predictive")
        if n < data.tst.ys.shape[0]:
            ax.plot(data.tst.ts, data.tst.ys[n, :, dim], c="k", alpha=0.7,
                    zorder=2, label="true trajectory")
        if n < data.trn.ys.shape[0]:
            ax.scatter(data.trn.ts, data.trn.ys[n, :, dim], c="k", s=100,
                       marker=".", zorder=200, label="train obs")
        ax.set_title(f"State {dim + 1}")
        ax.set_xlabel("Time")
    axs[0, -1].legend(loc="upper right", fontsize=8)
    fig.suptitle(title)
    fig.subplots_adjust(wspace=0.2, hspace=0.2)
    return fig


def plot_longitudinal_per_sequence(data, test_pred: np.ndarray,
                                   noise_var: np.ndarray, save_dir: str):
    """One `plt_longitudinal_{n}.png` per sequence, matching the reference's
    artifact inventory (`gpode/plots_2d.py:57-90` loops over n): posterior and
    predictive bands per state dim, true trajectory and train obs overlaid."""
    pred_mean, pred_var = test_pred.mean(0), test_pred.var(0)
    for n in range(pred_mean.shape[0]):
        fig = longitudinal_sequence_figure(data, pred_mean, pred_var,
                                           noise_var, n,
                                           "Predictive posterior for GPODE")
        finish_figure(fig, save_dir, f"plt_longitudinal_{n}.png",
                      bbox_inches="tight", pad_inches=0.2)


def _grid(data, grid_size=30):
    xx, yy = np.meshgrid(np.linspace(*data.xlim, grid_size),
                         np.linspace(*data.ylim, grid_size))
    return xx, yy, np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)


def _field_draws(key, gp_params, grid: np.ndarray, num_draws: int,
                 num_features: int) -> np.ndarray:
    """Sampled vector fields on a grid: (S, G, D) — one `vmap` over posterior
    draws in place of the reference's 100-iteration `build_cache` loop
    (`gpode/plots_2d.py:126-131`)."""
    import jax

    chol = gp_mod.precompute_chol(gp_params)
    gx = jnp.asarray(grid, dtype=jnp.float32)

    def one(k):
        draw = gp_mod.draw_posterior(k, gp_params, num_features, chol)
        return gp_mod.eval_draw(gp_params, draw, gx, use_pallas=False)

    return np.asarray(jax.vmap(one)(jax.random.split(key, num_draws)))


def plot_vectorfield(gp_params, data, test_pred: np.ndarray, save_dir: str,
                     fname: str = "plt_vectorfield.png", grid_size: int = 30,
                     key=None, num_features: int = 256):
    """The reference's flagship 3-panel diagnostic (`gpode/plots_2d.py:93-194`);
    see :func:`vectorfield_3panel_figure`."""
    fig = vectorfield_3panel_figure(gp_params, data, test_pred,
                                    grid_size=grid_size, key=key,
                                    num_features=num_features)
    finish_figure(fig, save_dir, fname, bbox_inches="tight", pad_inches=0.01)


def vectorfield_3panel_figure(gp_params, data, test_pred: np.ndarray,
                              grid_size: int = 30, key=None,
                              num_features: int = 256):
    """Build the 3-panel vectorfield figure (`gpode/plots_2d.py:93-194` and
    the notebook variant `misc/plot_utils.py:92-190`):
    (1) true field streamplot with training observations, (2) learned
    draw-mean field with log draw-std contours, (3) 10 per-draw quiver fields
    colored by pointwise draw-std + predictive sample trajectories + the true
    test trajectory."""
    import jax

    key = jax.random.PRNGKey(0) if key is None else key
    xx, yy, grid = _grid(data, grid_size)
    field = _field_draws(key, gp_params, grid, 100, num_features)  # (S, G, 2)
    mean, std = field.mean(0), field.std(0)

    true_field = np.stack([data.f(g) for g in grid])

    fig, (ax1, ax2, ax3) = plt.subplots(
        1, 3, figsize=(21, 7), sharex="all", sharey="all",
        gridspec_kw={"width_ratios": [1, 1.25, 1]})

    ax1.streamplot(xx, yy, true_field[:, 0].reshape(xx.shape),
                   true_field[:, 1].reshape(xx.shape), color="grey")
    ax1.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], marker=".",
                c="k", alpha=0.8, s=200)
    ax1.scatter([], [], marker=".", c="k", s=200, label="Training obs")
    ax1.set_title("True vectorfield")
    ax1.legend(loc="lower right")

    ax2.streamplot(xx, yy, mean[:, 0].reshape(xx.shape),
                   mean[:, 1].reshape(xx.shape), color="k")
    cs2 = ax2.contourf(xx, yy, np.log(std.mean(1) + 1e-12).reshape(xx.shape),
                       levels=10, cmap="bwr", alpha=0.6)
    fig.colorbar(cs2, ax=ax2, shrink=0.9)
    ax2.locator_params(nbins=4)
    ax2.set_title("Learned vectorfield")

    # panel 3: per-draw quiver samples on a coarse grid, colored by the
    # pointwise std across draws (`gpode/plots_2d.py:146-189`)
    qxx, qyy, qgrid = _grid(data, 12)
    qfield = _field_draws(jax.random.fold_in(key, 1), gp_params, qgrid, 100,
                          num_features)                            # (S, G, 2)
    qstd = qfield.std(0).mean(1)
    for s in range(10):
        ax3.quiver(qxx, qyy, qfield[s, :, 0].reshape(qxx.shape),
                   qfield[s, :, 1].reshape(qxx.shape), qstd,
                   units="x", width=0.022, scale=1 / 0.15, zorder=2,
                   alpha=0.8, cmap="bwr")
    for s in range(min(test_pred.shape[0], 10)):
        for n in range(test_pred.shape[1]):
            ax3.plot(test_pred[s, n, :, 0], test_pred[s, n, :, 1],
                     color="g", alpha=0.3, lw=2.5, zorder=3)
    for n in range(data.tst.ys.shape[0]):
        ax3.plot(data.tst.ys[n, :, 0], data.tst.ys[n, :, 1], color="k",
                 lw=0.5, alpha=1.0, zorder=4)
    ax3.scatter(data.tst.ys[:, :, 0], data.tst.ys[:, :, 1], s=50, marker=".",
                c="k", alpha=0.9, zorder=4)
    ax3.plot([], [], color="g", alpha=0.7, label="predictive samples")
    ax3.plot([], [], color="k", marker=".", alpha=0.7, label="true trajectory")
    ax3.scatter([], [], c="k", marker=r"$\longrightarrow$", s=200,
                label="vectorfield samples")
    ax3.legend(loc="lower left")
    ax3.set_title("Predictive samples")

    for ax in (ax1, ax2, ax3):
        ax.set_xlim(*data.xlim)
        ax.set_ylim(*data.ylim)
    fig.subplots_adjust(wspace=0.2, hspace=0.2)
    return fig


def unwhiten_inducing(gp_params) -> tuple[np.ndarray, np.ndarray]:
    """(u, z) with u = L u_whitened — the un-whitened inducing values used for
    arrow plots (`gpode/mocap_model_builder.py:130-146`)."""
    z = np.asarray(gp_params.z)
    chol = om.cholesky_jittered(rbf_K(gp_params.kernel, gp_params.z), 1e-5)
    if gp_params.dimwise:
        u = np.asarray(jnp.einsum("dnm,md->nd", chol, gp_params.u_mean,
                                  precision=om.HIGHEST))
    else:
        u = np.asarray(chol @ gp_params.u_mean)
    return u, z


def plot_inducing_posterior(gp_params, data, save_dir: str,
                            fname: str = "plt_inducing_posterior.png"):
    """Inducing locations + un-whitened mean arrows over the observed phase
    plane (`gpode/plots_2d.py:246-290`)."""
    u, z = unwhiten_inducing(gp_params)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], c="k", s=6,
               label="observations")
    ax.quiver(z[:, 0], z[:, 1], u[:, 0], u[:, 1], color="tab:blue",
              angles="xy", label="inducing mean")
    ax.scatter(z[:, 0], z[:, 1], c="tab:blue", s=14)
    ax.set_xlim(data.xlim)
    ax.set_ylim(data.ylim)
    ax.legend()
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def plot_model_initialization(gp_params, data, save_dir: str, fname: str):
    """Field + inducing snapshot used before/after initialization
    (`gpode/plots_2d.py`, called from `train_vdp_gpode.py:100-103`)."""
    xx, yy, grid = _grid(data)
    mean, _ = gp_mod.conditional(gp_params, jnp.asarray(grid, dtype=jnp.float32))
    mean = np.asarray(mean)
    u, z = unwhiten_inducing(gp_params)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.streamplot(xx, yy, mean[:, 0].reshape(xx.shape),
                  mean[:, 1].reshape(xx.shape), color="grey")
    ax.quiver(z[:, 0], z[:, 1], u[:, 0], u[:, 1], color="tab:blue", angles="xy")
    ax.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], c="k", s=6)
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def plot_shooting_initialization(key, params, data, cfg, num_features: int,
                                 save_dir: str, fname: str,
                                 num_draws: int = 20):
    """Shooting-model snapshot (`gpode_shooting/plots_2d.py:12-64`): posterior
    mean field streamplot with the mean predicted trajectory from q(x0)
    (red), the shooting-state posterior means (blue), and observations
    overlaid. The reference averages 100 function draws for the field; the
    exact conditional mean is the same quantity without the MC noise."""
    import jax
    import jax.numpy as jnp_

    from gpode_tpu.models import gpode as gpode_mod

    xx, yy, grid = _grid(data)
    mean, _ = gp_mod.conditional(params.gp, jnp.asarray(grid, dtype=jnp.float32))
    mean = np.asarray(mean)

    # mean trajectory from q(x0) over the train grid + one extrapolated point
    ts = np.asarray(data.trn.ts)
    ts_ext = jnp_.asarray(np.concatenate([ts, [2 * ts[-1] - ts[-2]]]),
                          dtype=jnp_.float32)
    vparams = gpode_mod.GPODEParams(gp=params.gp, x0=params.states.x0,
                                    likelihood=params.likelihood)
    pred = np.asarray(gpode_mod.predict(key, vparams, ts_ext, cfg,
                                        num_features,
                                        num_draws=num_draws)).mean(0)
    states_mean = np.asarray(params.states.mean)        # (N, T-1, D)
    x0_mean = np.asarray(params.states.x0.mean)         # (N, D)

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.streamplot(xx, yy, mean[:, 0].reshape(xx.shape),
                  mean[:, 1].reshape(xx.shape), color="grey")
    ax.plot(pred[0, :, 0], pred[0, :, 1], c="tab:red", lw=1.0, zorder=1)
    ax.scatter(pred[0, :, 0], pred[0, :, 1], marker="x", c="tab:red", s=18,
               zorder=2, label="ys (mean trajectory)")
    ax.scatter(states_mean[0, :, 0], states_mean[0, :, 1], marker="x",
               c="tab:blue", s=18, zorder=3, label="xs (shooting states)")
    ax.scatter(x0_mean[0, 0], x0_mean[0, 1], marker="o", c="tab:blue",
               zorder=4, label="x0")
    ax.scatter(data.trn.ys[0, :, 0], data.trn.ys[0, :, 1], marker="x", c="k",
               s=18, zorder=2, label="obs")
    ax.set_xticks([]), ax.set_yticks([])
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def _long_pred_panel(ax, ts, data_seq, pred_seq, noise_var=None):
    """One (sequence, dim) band panel shared by the plot_long_pred family."""
    m, v = pred_seq.mean(0), pred_seq.var(0)
    ax.plot(ts, m, c="tab:red", alpha=0.6)
    ax.fill_between(ts, m - 2 * np.sqrt(v), m + 2 * np.sqrt(v),
                    color="tab:red", alpha=0.15, zorder=1, label="posterior")
    if noise_var is not None:
        sp = np.sqrt(v + noise_var)
        ax.fill_between(ts, m - 2 * sp, m + 2 * sp, color="tab:blue",
                        alpha=0.12, zorder=0, label="predictive")
    ax.scatter(ts, data_seq, c="k", s=6, marker=".", zorder=200)


def plot_long_pred(data_ys: np.ndarray, pred: np.ndarray, ts: np.ndarray,
                   save_dir: str, name: str, noise_var=None):
    """Long-horizon per-sequence band grid (`gpode_shooting/plots_2d.py:238-268`
    and, with noise_var, the `plot_longnoise_pred` variant `:265-293`):
    up to 4 sequences x D state panels of posterior (+ predictive) bands.

    data_ys: (N, T, D); pred: (S, N, T, D) posterior draws."""
    nobs = min(pred.shape[1], 4)
    d = pred.shape[-1]
    fig, axs = plt.subplots(nobs, d, figsize=(6 * d, 2.6 * nobs),
                            sharex="all", squeeze=False)
    for i in range(nobs):
        for j in range(d):
            nv = None if noise_var is None else noise_var[j % len(noise_var)]
            _long_pred_panel(axs[i, j], np.asarray(ts), data_ys[i, :, j],
                             pred[:, i, :, j], nv)
            if i == 0:
                axs[i, j].set_title(f"state {j + 1}")
            if i == nobs - 1:
                axs[i, j].set_xlabel("time")
        axs[i, -1].legend(loc="lower left", fontsize=8)
    fig.tight_layout()
    finish_figure(fig, save_dir, name)


def plot_long_pred_single(data_ys: np.ndarray, pred: np.ndarray,
                          ts: np.ndarray, save_dir: str, name: str,
                          noise_var=None):
    """Single-sequence variant (`gpode_shooting/plots_2d.py:296-343`)."""
    d = pred.shape[-1]
    fig, axs = plt.subplots(1, d, figsize=(6 * d, 2.6), sharex="all",
                            squeeze=False)
    for j in range(d):
        nv = None if noise_var is None else noise_var[j % len(noise_var)]
        _long_pred_panel(axs[0, j], np.asarray(ts), data_ys[0, :, j],
                         pred[:, 0, :, j], nv)
        axs[0, j].set_title(f"state {j + 1}")
        axs[0, j].set_xlabel("time")
    axs[0, -1].legend(loc="lower left", fontsize=8)
    fig.tight_layout()
    finish_figure(fig, save_dir, name)


def plot_node_longitudinal(data, test_pred: np.ndarray, save_dir: str,
                           fname: str = "plt_longitudinal.png"):
    """Deterministic neural-ODE predictive trajectories vs truth
    (`src/neuralode/plots_2d.py:11-32`). test_pred: (N, T, D)."""
    d = test_pred.shape[-1]
    fig, axs = plt.subplots(1, d, figsize=(6 * d, 3), squeeze=False)
    for dim in range(d):
        ax = axs[0, dim]
        ax.plot(data.tst.ts, test_pred[0, :, dim], c="tab:red", alpha=0.8,
                zorder=3, label="predictive trajectory")
        ax.plot(data.tst.ts, data.tst.ys[0, :, dim], c="k", alpha=0.7,
                zorder=2, label="true trajectory")
        ax.scatter(data.trn.ts, data.trn.ys[0, :, dim], c="k", s=20,
                   marker=".", zorder=200, label="train obs")
        ax.set_title(f"State {dim + 1}")
        ax.set_xlabel("Time")
    axs[0, -1].legend(loc="upper right", fontsize=8)
    fig.suptitle("Predictive plot for NeuralODE")
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def plot_node_vectorfield(rhs_fn, data, test_pred: np.ndarray, save_dir: str,
                          fname: str = "plt_vectorfield.png"):
    """True vs learned deterministic field with trajectories overlaid
    (`src/neuralode/plots_2d.py:35-95`). rhs_fn: (G, 2) -> (G, 2)."""
    xx, yy, grid = _grid(data)
    true_field = np.stack([data.f(g) for g in grid])
    learned = np.asarray(rhs_fn(jnp.asarray(grid, dtype=jnp.float32)))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5), sharex=True,
                                   sharey=True)
    ax1.streamplot(xx, yy, true_field[:, 0].reshape(xx.shape),
                   true_field[:, 1].reshape(xx.shape), color="grey")
    ax1.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], c="k", s=12,
                marker=".", label="training obs")
    ax1.set_title("True vectorfield")
    ax1.legend(loc="lower right", fontsize=8)
    ax2.streamplot(xx, yy, learned[:, 0].reshape(xx.shape),
                   learned[:, 1].reshape(xx.shape), color="k")
    for n in range(test_pred.shape[0]):
        ax2.plot(test_pred[n, :, 0], test_pred[n, :, 1], c="tab:green",
                 alpha=0.5, lw=2.0, zorder=3,
                 label="predicted trajectory" if n == 0 else None)
        ax2.plot(data.tst.ys[n, :, 0], data.tst.ys[n, :, 1], c="k", lw=0.6,
                 alpha=0.9, zorder=4,
                 label="true trajectory" if n == 0 else None)
    ax2.set_title("Learned vectorfield")
    ax2.legend(loc="lower left", fontsize=8)
    for ax in (ax1, ax2):
        ax.set_xlim(data.xlim), ax.set_ylim(data.ylim)
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def plot_trace(trainer, save_dir: str, fname: str = "plt_optimization_trace.png"):
    """Loss / NLL / KL traces from the trainer meters
    (`gpode/plots_2d.py:293-308`)."""
    meters = [("loss", trainer.loss_meter),
              ("observation NLL", trainer.observ_nll_meter),
              ("inducing KL", trainer.inducing_kl_meter)]
    if trainer.state_kl_meter.vals:
        meters.append(("state KL", trainer.state_kl_meter))
    fig, axs = plt.subplots(1, len(meters), figsize=(4 * len(meters), 3))
    for (name, meter), ax in zip(meters, np.atleast_1d(axs)):
        ax.plot(meter.iters, meter.vals, lw=0.6)
        ax.set_title(name)
        ax.set_xlabel("iteration")
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)


def plot_shooting_states(states, data, save_dir: str,
                         fname: str = "plt_shooting_states.png"):
    """Shooting-state posterior bands over time
    (`gpode_shooting/plots_2d.py:66-98`): mean +/- 2 std of every q(s_t),
    with the embedded q(x0) at the shifted t=0 slot."""
    mean = np.asarray(states.mean)                     # (N, T-1, D)
    std = np.asarray(jnp.linalg.norm(jnp.tril(states.tril()), axis=-1))
    x0_mean = np.asarray(states.x0.mean)               # (N, D)
    x0_std = np.asarray(jnp.linalg.norm(jnp.tril(states.x0.tril()), axis=-1))
    n, tm1, d = mean.shape
    ts = data.trn.ts
    fig, axs = plt.subplots(d, 1, figsize=(10, 2.5 * d), sharex=True)
    for dim, ax in enumerate(np.atleast_1d(axs)):
        for seq in range(n):
            m = np.concatenate([[x0_mean[seq, dim]], mean[seq, :, dim]])
            s = np.concatenate([[x0_std[seq, dim]], std[seq, :, dim]])
            grid = np.concatenate([[ts[0] - (ts[1] - ts[0])], ts[:tm1]])
            ax.errorbar(grid, m, yerr=2 * s, fmt=".", ms=3, lw=0.7,
                        color="tab:blue",
                        label="q(s_t) mean ± 2σ" if seq == 0 else None)
            ax.scatter(ts, data.trn.ys[seq, :, dim], c="k", s=8,
                       label="observations" if seq == 0 else None)
        ax.set_ylabel(f"state {dim + 1}")
    np.atleast_1d(axs)[0].legend(fontsize=8)
    np.atleast_1d(axs)[-1].set_xlabel("time")
    fig.tight_layout()
    finish_figure(fig, save_dir, fname)
