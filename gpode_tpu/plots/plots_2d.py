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
    fig.savefig(os.path.join(save_dir, fname), dpi=120)
    plt.close(fig)


def _grid(data, grid_size=30):
    xx, yy = np.meshgrid(np.linspace(*data.xlim, grid_size),
                         np.linspace(*data.ylim, grid_size))
    return xx, yy, np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)


def plot_vectorfield(gp_params, data, test_pred: np.ndarray, save_dir: str,
                     fname: str = "plt_vectorfield.png", grid_size: int = 30):
    """Learned posterior-mean field vs ground truth with posterior-std
    contours and predicted trajectories (`gpode/plots_2d.py:93-194`)."""
    xx, yy, grid = _grid(data, grid_size)
    mean, var = gp_mod.conditional(gp_params, jnp.asarray(grid, dtype=jnp.float32))
    mean = np.asarray(mean)
    std = np.sqrt(np.maximum(np.asarray(var), 0.0)).sum(-1)

    true_field = np.stack([data.f(g) for g in grid])

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5), sharex=True, sharey=True)
    ax1.streamplot(xx, yy, true_field[:, 0].reshape(xx.shape),
                   true_field[:, 1].reshape(xx.shape), color="grey")
    ax1.set_title("True vector field")
    cs = ax2.contourf(xx, yy, std.reshape(xx.shape), levels=12,
                      cmap="Blues", alpha=0.6)
    fig.colorbar(cs, ax=ax2, label="posterior std (sum over dims)")
    ax2.streamplot(xx, yy, mean[:, 0].reshape(xx.shape),
                   mean[:, 1].reshape(xx.shape), color="k", density=1.0)
    for s in range(min(8, test_pred.shape[0])):
        ax2.plot(test_pred[s, 0, :, 0], test_pred[s, 0, :, 1],
                 color="tab:red", alpha=0.3, lw=0.8)
    ax2.scatter(data.trn.ys[:, :, 0], data.trn.ys[:, :, 1], c="k", s=6)
    ax2.set_title("Learned posterior mean field")
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, fname), dpi=120)
    plt.close(fig)


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
    fig.savefig(os.path.join(save_dir, fname), dpi=120)
    plt.close(fig)


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
    fig.savefig(os.path.join(save_dir, fname), dpi=120)
    plt.close(fig)


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
    fig.savefig(os.path.join(save_dir, fname), dpi=120)
    plt.close(fig)


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
    fig.savefig(os.path.join(save_dir, fname), dpi=120)
    plt.close(fig)
