"""Flat-vector Adam (optax.flatten) and step-buffer donation (round 4).

The Trainer's default optimizer runs Adam over ONE concatenated vector
instead of per-leaf tiny ops (+8% on the official bench step, measured by
`scripts/diag_adam_fusion.py`). These tests pin that the flat path is
numerically identical, that donation produces the same trajectory while
consuming its inputs, and that resuming a pre-flatten checkpoint fails with
an actionable error instead of a shape mismatch deep inside jit.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gpode_tpu.train.trainer import (TrainConfig, Trainer, default_optimizer,
                                     make_train_step)

Terms = collections.namedtuple("Terms", ["loss", "observ_nll", "x0_kl",
                                         "inducing_kl"])


def _toy_problem():
    """A tiny multi-leaf quadratic so flatten has something to concatenate."""
    params = {"a": jnp.arange(3.0), "b": {"w": jnp.ones((2, 2)),
                                          "s": jnp.asarray(0.5)}}
    target = jax.tree_util.tree_map(lambda x: x * 0.1, params)

    def loss_fn(p, key, ys, ts):
        sq = jax.tree_util.tree_map(lambda x, t: jnp.sum((x - t) ** 2),
                                    p, target)
        loss = sum(jax.tree_util.tree_leaves(sq)) + 0.0 * ys.sum()
        return loss, Terms(loss, loss, 0.0 * loss, 0.0 * loss)

    batch = (jnp.zeros((2, 2)), jnp.arange(2.0))
    return params, loss_fn, batch


def _run(optimizer, donate, steps=5):
    params, loss_fn, batch = _toy_problem()
    step = make_train_step(loss_fn, optimizer, donate=donate)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(steps):
        params, opt_state, key, terms = step(params, opt_state, key, *batch)
        losses.append(float(terms.loss))
    return losses, jax.device_get(params)


def test_flatten_matches_per_leaf_adam_exactly():
    """Adam is elementwise: the flat-vector wrapper is bit-identical."""
    for clip in (0.0, 1.0):
        flat_losses, flat_params = _run(
            default_optimizer(1e-2, grad_clip=clip, flatten=True), False)
        ref_losses, ref_params = _run(
            default_optimizer(1e-2, grad_clip=clip, flatten=False), False)
        np.testing.assert_array_equal(flat_losses, ref_losses)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               flat_params, ref_params)


def test_donated_step_matches_and_consumes_inputs():
    opt = default_optimizer(1e-2)
    ref_losses, ref_params = _run(opt, donate=False)
    don_losses, don_params = _run(opt, donate=True)
    np.testing.assert_array_equal(don_losses, ref_losses)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           don_params, ref_params)

    # the donated call consumes its params/opt_state inputs
    params, loss_fn, batch = _toy_problem()
    step = make_train_step(loss_fn, opt, donate=True)
    opt_state = opt.init(params)
    params_dev = jax.device_put(params)
    step(params_dev, opt_state, jax.random.PRNGKey(0), *batch)
    leaf = jax.tree_util.tree_leaves(params_dev)[0]
    assert leaf.is_deleted(), (
        "donate=True should consume the input buffers (if this backend "
        "stopped supporting donation, the +2% bench claim needs re-checking)")


def test_resume_with_preflatten_opt_state_raises_actionable_error():
    """A checkpointed per-leaf opt_state must not crash deep inside jit."""
    params, loss_fn, batch = _toy_problem()
    trainer = Trainer(loss_fn, TrainConfig(num_iter=0, log_freq=0,
                                           flatten_opt=True))
    legacy = default_optimizer(5e-3, flatten=False).init(params)
    with pytest.raises(ValueError, match="flatten_opt"):
        trainer.train(params, jax.random.PRNGKey(0), *batch, opt_state=legacy)


def test_trainer_runs_with_flat_default_and_matches_legacy():
    """Two Trainer loops (flatten on/off) produce identical parameters."""
    results = {}
    for flat in (True, False):
        params, loss_fn, batch = _toy_problem()
        trainer = Trainer(loss_fn, TrainConfig(num_iter=8, log_freq=0,
                                               flatten_opt=flat))
        p, _, _ = trainer.train(params, jax.random.PRNGKey(0), *batch)
        results[flat] = jax.device_get(p)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           results[True], results[False])
