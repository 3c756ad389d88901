"""Sharded training steps: the full ELBO + grad + Adam update over a mesh.

Parameters and optimizer state replicate; observations shard over `dp`
(sequences); sampled shooting states shard over (`mc`, `dp`). XLA inserts the
gradient all-reduce from these annotations. Everything stays one XLA program
per step, now SPMD over the mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpode_tpu.models import shooting
from gpode_tpu.parallel.mesh import batch_sharding, replicated, sample_sharding
from gpode_tpu.train.builders import ModelArgs


def make_sharded_shooting_step(mesh: Mesh, args: ModelArgs,
                               optimizer: optax.GradientTransformation,
                               frozen_mask=None):
    """Jitted sharded step: (params, opt_state, key, ys, ts) -> (params,
    opt_state, key, terms). ys must have N divisible by the `dp` axis size."""
    # Pin the XLA rhs under GSPMD: a pallas_call is opaque to the
    # partitioner, so XLA would all-gather the dp/mc-sharded segment batch
    # around it. The explicit-collective shard_map path keeps Pallas — its
    # kernels run per-shard (see parallel/shard_map_step.py).
    cfg = dataclasses.replace(args.solver_config(), pallas=False)
    ss_sharding = sample_sharding(mesh)
    rep = replicated(mesh)
    data_shard = batch_sharding(mesh, "dp") if "dp" in mesh.axis_names else rep

    def loss(params, key, ys, ts):
        return shooting.elbo_loss(key, params, ys, ts, cfg, args.num_features,
                                  num_samples=args.num_samples,
                                  state_sharding=ss_sharding)

    @partial(jax.jit,
             in_shardings=(rep, rep, rep, data_shard, rep),
             out_shardings=(rep, rep, rep, rep))
    def step(params, opt_state, key, ys, ts):
        key, sub = jax.random.split(key)
        (_, terms), grads = jax.value_and_grad(loss, has_aux=True)(params, sub, ys, ts)
        if frozen_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * 0 if m else g, grads, frozen_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, terms

    return step


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def device_put_batch(array, mesh: Mesh, axis: str = "dp"):
    return jax.device_put(array, NamedSharding(mesh, P(axis)))


def make_sharded_predict(mesh: Mesh, cfg, num_features: int,
                         num_draws: int = 128):
    """Posterior-predictive sampling with the draw axis sharded over the mesh.

    The reference evaluates 128 posterior draws in a serial Python loop
    (`gpode/model_builder.py:60-78`); here the draws stack into ONE batched
    solve (`flow_forward_batched`: real budget-skip branch, shared
    max-over-draw-RMS step control — the max reduction becomes an XLA
    all-reduce over the mesh) whose draw axis shards across every device.
    Returns predict(key, gp_params, x0_post, ts) -> (S, N, T, D).
    """
    import jax.numpy as jnp

    from gpode_tpu.models import gp as gp_mod
    from gpode_tpu.models.flow import flow_forward_batched

    axis = mesh.axis_names[0]
    draw_sharding = NamedSharding(mesh, P(axis))
    cfg = dataclasses.replace(cfg, pallas=False)   # same GSPMD rule as above

    @partial(jax.jit, out_shardings=draw_sharding)
    def predict(key, vparams, ts, x0):
        keys = jax.lax.with_sharding_constraint(
            jax.random.split(key, num_draws), draw_sharding)
        chol = gp_mod.precompute_chol(vparams.gp)
        draws = jax.vmap(
            lambda k: gp_mod.draw_posterior(k, vparams.gp, num_features,
                                            chol))(keys)
        starts = jnp.broadcast_to(x0, (num_draws,) + x0.shape)
        xs, _ = flow_forward_batched(vparams.gp, draws, starts, ts, cfg)
        return xs

    return predict
