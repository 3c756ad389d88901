"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gpode_tpu.models import shooting
from gpode_tpu.parallel.mesh import make_mesh, sample_sharding
from gpode_tpu.parallel.train import (device_put_batch, device_put_replicated,
                                      make_sharded_shooting_step)
from gpode_tpu.train.builders import ModelArgs, build_shooting, shooting_loss_fn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

_ARGS = ModelArgs(num_inducing=8, num_features=16, solver="rk4",
                  ts_dense_scale=3, max_steps=16, num_samples=8)


def _data(n=4, t=6, d=2):
    rng = np.random.default_rng(0)
    ys = rng.normal(size=(n, t, d)).astype(np.float32) * 0.5
    ts = np.linspace(0, 1.0, t).astype(np.float32)
    return jnp.asarray(ys), jnp.asarray(ts)


def test_mesh_construction():
    mesh = make_mesh({"dp": 2, "mc": 4})
    assert mesh.devices.shape == (2, 4)
    mesh1 = make_mesh({"dp": -1})
    assert mesh1.devices.shape == (8,)


def test_sharded_step_runs_and_matches_replicated_loss():
    """The sharded ELBO must equal the unsharded ELBO (same key, same math)."""
    ys, ts = _data()
    params = build_shooting(jax.random.PRNGKey(0), _ARGS, np.asarray(ys))
    key = jax.random.PRNGKey(1)
    cfg = _ARGS.solver_config()

    loss_plain, _ = shooting.elbo_loss(key, params, ys, ts, cfg,
                                       _ARGS.num_features,
                                       num_samples=_ARGS.num_samples)

    mesh = make_mesh({"dp": 2, "mc": 4})
    ss_shard = sample_sharding(mesh)

    @jax.jit
    def sharded_loss(params, key, ys, ts):
        loss, _ = shooting.elbo_loss(key, params, ys, ts, cfg,
                                     _ARGS.num_features,
                                     num_samples=_ARGS.num_samples,
                                     state_sharding=ss_shard)
        return loss

    with mesh:
        got = sharded_loss(device_put_replicated(params, mesh), key,
                           device_put_batch(ys, mesh), ts)
    np.testing.assert_allclose(float(got), float(loss_plain), rtol=2e-4)


def test_sharded_train_step_updates_params():
    ys, ts = _data()
    params = build_shooting(jax.random.PRNGKey(0), _ARGS, np.asarray(ys))
    mesh = make_mesh({"dp": 2, "mc": 4})
    opt = optax.adam(1e-2)
    step = make_sharded_shooting_step(mesh, _ARGS, opt)

    p = device_put_replicated(params, mesh)
    s = device_put_replicated(opt.init(params), mesh)
    k = device_put_replicated(jax.random.PRNGKey(3), mesh)
    ys_s = device_put_batch(ys, mesh)
    ts_r = device_put_replicated(ts, mesh)

    p2, s2, k2, terms = step(p, s, k, ys_s, ts_r)
    assert np.isfinite(float(terms.loss))
    # params actually moved
    delta = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(p),
                                jax.tree_util.tree_leaves(p2)))
    assert delta > 0


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_predict():
    from gpode_tpu.models import gpode as gpode_mod
    from gpode_tpu.parallel.train import make_sharded_predict
    from gpode_tpu.train.builders import build_gpode
    ys, ts = _data(n=2)
    params = build_gpode(jax.random.PRNGKey(0), _ARGS, np.asarray(ys))
    mesh = make_mesh({"mc": 8})
    cfg = _ARGS.solver_config()
    predict = make_sharded_predict(mesh, cfg, _ARGS.num_features, num_draws=16)
    with mesh:
        pred = predict(jax.random.PRNGKey(1), params, ts, ys[:, 0])
    assert pred.shape == (16, 2, ys.shape[1], 2)
    # statistically equivalent to the unsharded path
    plain = gpode_mod.predict(jax.random.PRNGKey(1), params, ts, cfg,
                              _ARGS.num_features, num_draws=16, x0=ys[:, 0])
    np.testing.assert_allclose(np.asarray(pred).mean(), np.asarray(plain).mean(),
                               atol=0.2)


def test_shard_map_shooting_loss_and_step():
    """Explicit-collective path: replicated scalar, sane values, step updates."""
    from gpode_tpu.parallel.shard_map_step import (make_shard_map_shooting_loss,
                                                   make_shard_map_shooting_step)
    from gpode_tpu.models import shooting as shooting_mod
    ys, ts = _data(n=4)
    params = build_shooting(jax.random.PRNGKey(0), _ARGS, np.asarray(ys))
    mesh = make_mesh({"dp": 2, "mc": 4})

    loss_fn = make_shard_map_shooting_loss(mesh, _ARGS)
    with mesh:
        loss, terms = jax.jit(loss_fn)(params, jax.random.PRNGKey(1), ys, ts)
    assert np.isfinite(float(loss))
    # statistically close to the unsharded estimator (same params, diff keys)
    plain, _ = shooting_mod.elbo_loss(jax.random.PRNGKey(1), params, ys, ts,
                                      _ARGS.solver_config(), _ARGS.num_features,
                                      num_samples=_ARGS.num_samples)
    np.testing.assert_allclose(float(loss), float(plain), rtol=0.5)

    opt = optax.adam(1e-2)
    step = make_shard_map_shooting_step(mesh, _ARGS, opt)
    from gpode_tpu.parallel.train import device_put_batch, device_put_replicated
    p = device_put_replicated(params, mesh)
    s = device_put_replicated(opt.init(params), mesh)
    k = device_put_replicated(jax.random.PRNGKey(2), mesh)
    with mesh:
        p2, s2, k2, terms = step(p, s, k, device_put_batch(ys, mesh),
                                 device_put_replicated(ts, mesh))
    assert np.isfinite(float(terms.loss))
    delta = sum(float(jnp.sum(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(p),
                                jax.tree_util.tree_leaves(p2)))
    assert delta > 0
