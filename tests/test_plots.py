"""Plot-suite smoke + artifact-inventory tests (VERDICT r2 item 8).

Every png *family* the four reference scripts emit must have a counterpart
produced by our plot suite; these tests render each family on a tiny config
and assert the files appear. Content is eyeballed in real runs — here we pin
that the code paths execute and the artifact inventory is complete.
"""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpode_tpu.data.vanderpol import VanderPol
from gpode_tpu.plots import plots_2d, plots_mocap
from gpode_tpu.train.builders import ModelArgs, build_gpode, build_shooting

_ARGS = ModelArgs(num_inducing=8, num_features=16, solver="rk4",
                  ts_dense_scale=2, max_steps=8, num_samples=2)


@pytest.fixture(scope="module")
def vdp():
    return VanderPol(s_train=8, t_train=2.0, s_test=12, t_test=3.0,
                     noise_var=0.05)


def _fake_pred(data, s=6):
    rng = np.random.default_rng(0)
    n, t, d = data.tst.ys.shape
    return data.tst.ys[None] + 0.1 * rng.normal(size=(s, n, t, d))


@pytest.mark.slow
def test_vdp_artifact_inventory(tmp_path, vdp):
    """The reference's train_vdp_gpode.py artifact families: init snapshots,
    per-sequence longitudinals, the 3-panel vectorfield, inducing arrows,
    long-pred bands, shooting-state bands."""
    params = build_gpode(jax.random.PRNGKey(0), _ARGS, vdp.trn.ys)
    sparams = build_shooting(jax.random.PRNGKey(0), _ARGS, vdp.trn.ys)
    pred = _fake_pred(vdp)
    nv = np.asarray(params.likelihood.variance)
    out = str(tmp_path)

    plots_2d.plot_model_initialization(params.gp, vdp, out,
                                       "model_before_initialization.png")
    plots_2d.plot_longitudinal(vdp, pred, nv, out)
    plots_2d.plot_longitudinal_per_sequence(vdp, pred, nv, out)
    plots_2d.plot_vectorfield(params.gp, vdp, pred, out,
                              key=jax.random.PRNGKey(1), num_features=16)
    plots_2d.plot_inducing_posterior(params.gp, vdp, out)
    plots_2d.plot_long_pred(vdp.tst.ys, pred, vdp.tst.ts, out,
                            "plt_long_pred.png")
    plots_2d.plot_long_pred(vdp.tst.ys, pred, vdp.tst.ts, out,
                            "plt_longnoise_pred.png", noise_var=nv)
    plots_2d.plot_long_pred_single(vdp.tst.ys, pred, vdp.tst.ts, out,
                                   "plt_longnoise_pred_single.png",
                                   noise_var=nv)
    plots_2d.plot_shooting_states(sparams.states, vdp, out)
    plots_2d.plot_shooting_initialization(
        jax.random.PRNGKey(2), sparams, vdp, _ARGS.solver_config(),
        _ARGS.num_features, out, "model_after_initialization.png",
        num_draws=3)

    expected = ["model_before_initialization.png",
                "model_after_initialization.png",
                "plt_longitudinal.png", "plt_longitudinal_0.png",
                "plt_vectorfield.png", "plt_inducing_posterior.png",
                "plt_long_pred.png", "plt_longnoise_pred.png",
                "plt_longnoise_pred_single.png", "plt_shooting_states.png"]
    import os
    for f in expected:
        assert os.path.exists(os.path.join(out, f)), f


def test_mocap_artifact_inventory(tmp_path):
    """The MoCap scripts' families: PCA/data prediction grids + 3-D inducing
    arrows + traces."""
    import os

    rng = np.random.default_rng(0)
    n, t, lat, full = 2, 6, 3, 8
    ys_lat = rng.normal(size=(n, t, lat)).astype(np.float32)
    ys_full = rng.normal(size=(n, t, full)).astype(np.float32)
    ts = 0.1 * np.arange(t)
    pred_lat = ys_lat[None] + 0.1 * rng.normal(size=(4, n, t, lat))
    pred_full = ys_full[None] + 0.1 * rng.normal(size=(4, n, t, full))
    params = build_gpode(jax.random.PRNGKey(0), _ARGS, ys_lat)
    out = str(tmp_path)

    plots_mocap.plot_pca_predictions(ys_lat, pred_lat, ts, out,
                                     name="plt_latents_after_optimization_train")
    plots_mocap.plot_data_predictions(ys_full, pred_full, ts, out,
                                      name="plt_data_after_optimization_train")
    plots_mocap.plot_inducing_posterior_3d(params.gp, pred_lat, out,
                                           name="inducing_posterior_train")
    # standalone time-colored 3-D latent scatter
    # (reference artifact plt_latents_3d, src/gpode/plots_mocap.py:75-124)
    plots_mocap.plot_latents_3d(pred_lat, ts, out, num_obs=2,
                                rng=np.random.RandomState(0))
    for f in ["plt_latents_after_optimization_train.png",
              "plt_data_after_optimization_train.png",
              "inducing_posterior_train.png",
              "plt_latents_3d.png"]:
        assert os.path.exists(os.path.join(out, f)), f


def test_notebook_variants_render(vdp):
    """Inline variants execute without a display (Agg)."""
    from gpode_tpu.plots import notebook

    params = build_gpode(jax.random.PRNGKey(0), _ARGS, vdp.trn.ys)
    pred = _fake_pred(vdp)
    nv = np.asarray(params.likelihood.variance)
    notebook.show_longitudinal(vdp, pred, nv)
    notebook.show_longitudinal_per_sequence(vdp, pred, nv)
    notebook.show_vectorfield(params.gp, vdp, pred)
    notebook.show_vectorfield_posterior(params.gp, vdp, pred,
                                        key=jax.random.PRNGKey(1),
                                        num_features=16)
    notebook.show_inducing(params.gp, vdp)
    notebook.show_model_initialization(jax.random.PRNGKey(2), params, vdp,
                                       _ARGS.solver_config(),
                                       _ARGS.num_features, num_draws=3)


def test_display_mode_shows_instead_of_saving(tmp_path, vdp, monkeypatch):
    """The reference's `make_plot=True` interactive mode
    (`src/gpode/plots_2d.py:85-90`): with `set_display_mode(True)` plot
    functions call plt.show() and write NO file."""
    import os

    import matplotlib.pyplot as plt

    shown = []
    monkeypatch.setattr(plt, "show", lambda *a, **k: shown.append(1))
    pred = _fake_pred(vdp)
    nv = np.full((2,), 0.05)
    out = str(tmp_path)
    plots_2d.set_display_mode(True)
    try:
        plots_2d.plot_longitudinal(vdp, pred, nv, out)
    finally:
        plots_2d.set_display_mode(False)
    assert shown, "display mode did not plt.show()"
    assert not os.listdir(out), "display mode still wrote files"
    plt.close("all")

    plots_2d.plot_longitudinal(vdp, pred, nv, out)  # save mode restored
    assert os.path.exists(os.path.join(out, "plt_longitudinal.png"))
