"""Sharded training steps: the full ELBO + grad + Adam update over a mesh.

Parameters and optimizer state replicate; observations shard over `dp`
(sequences); sampled shooting states shard over (`mc`, `dp`). XLA inserts the
gradient all-reduce from these annotations. Everything stays one XLA program
per step, now SPMD over the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpode_tpu.models import shooting
from gpode_tpu.parallel.mesh import batch_sharding, replicated, sample_sharding
from gpode_tpu.train.builders import ModelArgs, constraint_annealer
from gpode_tpu.train.trainer import make_step_bodies


def make_sharded_shooting_step(mesh: Mesh, args: ModelArgs,
                               optimizer: optax.GradientTransformation,
                               frozen_mask=None, with_iteration: bool = False):
    """Jitted sharded step: (params, opt_state, key, ys, ts) -> (params,
    opt_state, key, terms). ys must have N divisible by the `dp` axis size
    and num_samples by `mc`.

    with_iteration=True matches `trainer.make_train_step`'s convention: the
    step becomes (params, opt_state, key, itr, ys, ts) -> (..., itr+1, terms)
    with a replicated device-side counter, and the constraint-scale annealing
    schedule (`builders.constraint_annealer`) applies to the replicated
    params before the sharded loss — `--constraint_anneal_iters` composes
    with `--mesh`."""
    # The segment integration runs in a shard_map manual region inside the
    # jitted program (`shooting.shard_mapped_integrate`): a bare pallas_call
    # is opaque to the GSPMD partitioner (XLA would all-gather the dp/mc-
    # sharded segment batch around it), but under shard_map the fused Pallas
    # megakernels run per-shard — the sharded step keeps the full fused-rhs/
    # megakernel speedup (VERDICT r2 item 3). Everything outside the region
    # (likelihood, constraint, KLs, grads, Adam) stays GSPMD-partitioned.
    cfg = args.solver_config()
    ss_sharding = sample_sharding(mesh)
    rep = replicated(mesh)
    data_shard = batch_sharding(mesh, "dp") if "dp" in mesh.axis_names else rep

    def loss(params, key, ys, ts):
        return shooting.elbo_loss(key, params, ys, ts, cfg, args.num_features,
                                  num_samples=args.num_samples,
                                  state_sharding=ss_sharding, seg_mesh=mesh,
                                  segment_minibatch=args.segment_minibatch)

    anneal = constraint_annealer(args) if with_iteration else None

    def loss_at(p, sub, itr, ys, ts):
        if itr is not None and anneal is not None:
            p = anneal(p, itr)
        return loss(p, sub, ys, ts)

    # the step bodies (split key -> value_and_grad -> frozen-grad zeroing ->
    # optimizer update) are shared with the single-device and shard_map
    # steps; only the jit shardings differ
    step, step_itr = make_step_bodies(loss_at, optimizer, frozen_mask)
    if with_iteration:
        return partial(jax.jit,
                       in_shardings=(rep, rep, rep, rep, data_shard, rep),
                       out_shardings=(rep, rep, rep, rep, rep))(step_itr)
    return partial(jax.jit,
                   in_shardings=(rep, rep, rep, data_shard, rep),
                   out_shardings=(rep, rep, rep, rep))(step)


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def device_put_batch(array, mesh: Mesh, axis: str = "dp"):
    return jax.device_put(array, NamedSharding(mesh, P(axis)))


def make_sharded_predict(mesh: Mesh, cfg, num_features: int,
                         num_draws: int = 128):
    """Posterior-predictive sampling with the draw axis sharded over the mesh.

    The reference evaluates 128 posterior draws in a serial Python loop
    (`gpode/model_builder.py:60-78`); here the draw axis shards across the
    mesh and each device runs ONE batched solve over its local draws
    (`flow_forward_batched` inside a shard_map region: real budget-skip
    branch, max-over-local-draw-RMS step control — embarrassingly parallel,
    zero collectives, and the fused Pallas rhs stays engaged per shard).
    Returns predict(key, gp_params, x0_post, ts) -> (S, N, T, D).
    """
    import jax.numpy as jnp
    from jax import shard_map

    from gpode_tpu.models import gp as gp_mod
    from gpode_tpu.models.flow import flow_forward_batched

    axis = mesh.axis_names[0]
    draw_sharding = NamedSharding(mesh, P(axis))

    @partial(jax.jit, out_shardings=draw_sharding)
    def predict(key, vparams, ts, x0):
        keys = jax.lax.with_sharding_constraint(
            jax.random.split(key, num_draws), draw_sharding)
        chol = gp_mod.precompute_chol(vparams.gp)
        draws = jax.vmap(
            lambda k: gp_mod.draw_posterior(k, vparams.gp, num_features,
                                            chol))(keys)
        starts = jnp.broadcast_to(x0, (num_draws,) + x0.shape)

        # check_vma=False: allows the fused Pallas rhs inside the region (a
        # pallas_call's out_shape carries no varying-axis annotation)
        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P(), P(axis), P(axis), P()), out_specs=P(axis))
        def solve(gp_params, draws_local, starts_local, ts):
            xs, _ = flow_forward_batched(gp_params, draws_local,
                                         starts_local, ts, cfg)
            return xs

        return solve(vparams.gp, draws, starts, ts)

    return predict
