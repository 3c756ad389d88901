"""Flow: numerical integration of a sampled GP vector field.

Rebuilds the reference's `Flow`/`ODEfunc` facade (`src/core/flow.py:7-130`)
functionally: a "flow" is just `odeint` applied to `eval_draw` of a fixed
:class:`~gpode_tpu.models.gp.PosteriorDraw`. The reference's
`before_odeint(rebuild_cache=True)` — draw once per solve so the rhs is
deterministic within a solve — becomes explicit: callers pass either a draw
(:func:`flow_forward`) or a PRNG key (:func:`flow_forward_sampled`).

Solver configuration is a static, hashable dataclass so it can parameterize
jitted train steps without retracing on value changes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gpode_tpu.models import gp
from gpode_tpu.ops.ode import ODEStats, odeint
from gpode_tpu.utils.time_grids import substeps_from_dense_scale


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver knobs (reference: `flow.py:41`, `train_vdp_gpode.py:47-53`).

    ts_dense_scale mirrors the reference flag: fixed-step solvers take
    `ts_dense_scale - 1` sub-steps per observation interval; dopri5 ignores it
    (dense output replaces grid densification).
    """

    solver: str = "dopri5"
    rtol: float = 1e-6
    atol: float = 1e-6
    ts_dense_scale: int = 1
    max_steps: int = 256
    # Initial adaptive step size (torchdiffeq's `first_step` option); None ->
    # Hairer's heuristic; ode.FIRST_STEP_SPAN (-1.0) -> the whole span (the
    # right choice for one-interval shooting segments).
    first_step: Optional[float] = None
    # Rematerialize rhs evaluations in the backward pass instead of storing
    # them: trades FLOPs for memory on long trajectories.
    remat: bool = False
    # O(1)-memory continuous-adjoint gradients (the reference's `use_adjoint`
    # flag -> torchdiffeq.odeint_adjoint, `flow.py:41,68`; scripts default it
    # off). See `gpode_tpu.ops.adjoint`.
    use_adjoint: bool = False
    # Per-config Pallas override: None defers to the global/auto rule
    # (`gp.set_pallas_rhs`); False pins the XLA rhs and disables the segment
    # megakernels. The GSPMD sharded step sets False — a pallas_call is
    # opaque to the partitioner, so under bare jit+GSPMD XLA would all-gather
    # the sharded segment batch around it (the shard_map path keeps Pallas:
    # kernels there run per-shard).
    pallas: Optional[bool] = None

    @property
    def substeps(self) -> int:
        return substeps_from_dense_scale(self.ts_dense_scale)


def _cfg_pallas_active(cfg: SolverConfig, gp_params: gp.SVGPParams,
                       n_rows: int) -> bool:
    """Megakernel gate: the config's `pallas` override, else global/auto."""
    if cfg.pallas is False:
        return False
    if cfg.pallas is True:
        active = gp_params.dimwise and gp._pallas_backend_ok()
        if not active:
            import logging

            reason = ("dimwise=False (kernels are dimwise-only)"
                      if not gp_params.dimwise else "backend is not TPU")
            gp._log_once(logging.WARNING,
                         f"SolverConfig(pallas=True) dropped: {reason} — "
                         f"XLA rhs used for this solve")
        return active
    return gp.pallas_rhs_active(gp_params, n_rows)


def flow_forward(gp_params: gp.SVGPParams, draw: gp.PosteriorDraw,
                 x0: jax.Array, ts: jax.Array,
                 cfg: SolverConfig) -> tuple[jax.Array, ODEStats]:
    """Integrate dx/dt = f_draw(x) from x0 over ts.

    x0: (N, D); ts: (T,) increasing or decreasing. Returns ((N, T, D), stats).
    """

    if cfg.use_adjoint:
        from gpode_tpu.ops.adjoint import odeint_adjoint

        adj_pallas = False if cfg.solver == "bdf" else cfg.pallas

        def rhs_p(p, t, x):
            del t  # time-invariant ODE (`dsvgp.py:172`)
            return gp.eval_draw(p[0], p[1], x, adj_pallas)

        xs, stats = odeint_adjoint(rhs_p, (gp_params, draw), x0, ts,
                                   cfg.solver, cfg.rtol, cfg.atol,
                                   cfg.substeps, cfg.max_steps,
                                   first_step=cfg.first_step)
        return jnp.moveaxis(xs, 0, 1), stats

    # RK4 one-interval segments (the shooting hot path) with a Pallas-active
    # batch take the segment megakernel: all 4*substeps stage evaluations and
    # RK combines in ONE kernel, state tile VMEM-resident throughout, with a
    # fused in-kernel reverse sweep for the backward (inherently
    # rematerialized — only x0 and the draw are saved).
    if (cfg.solver == "rk4" and ts.shape[0] == 2
            and _cfg_pallas_active(cfg, gp_params, x0.shape[0])):
        from gpode_tpu.ops.pallas_kernels import fused_rk4_segment
        dt = jax.lax.stop_gradient(ts[1] - ts[0])
        x1 = fused_rk4_segment(x0, dt, gp_params.z,
                               gp_params.kernel.lengthscales,
                               gp_params.kernel.variance, draw.omega,
                               draw.phase, gp.kernel_rff_weights(draw.weights),
                               draw.nu, cfg.substeps)
        steps = jnp.asarray(cfg.substeps)
        stats = ODEStats(num_rhs_evals=jnp.asarray(4 * cfg.substeps),
                         num_accepted=steps, num_attempted=steps,
                         num_covered=jnp.asarray(2))
        return jnp.stack([x0, x1], axis=1), stats

    # the implicit BDF solver differentiates its Newton vjp a second time in
    # the training backward; the Pallas custom_vjp has no rule for that, so
    # BDF pins the rhs to the XLA path.
    use_pallas = False if cfg.solver == "bdf" else cfg.pallas

    def rhs(t, x):
        del t  # time-invariant ODE (`dsvgp.py:172`)
        return gp.eval_draw(gp_params, draw, x, use_pallas)

    if cfg.remat:
        rhs = jax.checkpoint(rhs)

    # dopri5 whole-span shooting segments: one fused attempt kernel computes
    # f0 + all six stages + the scaled embedded error; the bounded-scan
    # solver remains as the lax.cond fallback for rejected attempts, so both
    # branches reproduce the XLA path's math exactly (an accepted whole-span
    # attempt IS the scan's first accepted step, endpoint un-interpolated).
    from gpode_tpu.ops.ode import FIRST_STEP_SPAN
    if (cfg.solver == "dopri5" and ts.shape[0] == 2
            and cfg.first_step == FIRST_STEP_SPAN
            and _cfg_pallas_active(cfg, gp_params, x0.shape[0])):
        from gpode_tpu.ops.pallas_kernels import fused_dopri5_attempt
        dt = jax.lax.stop_gradient(ts[1] - ts[0])
        x5, err_scaled = fused_dopri5_attempt(
            x0, dt, gp_params.z, gp_params.kernel.lengthscales,
            gp_params.kernel.variance, draw.omega, draw.phase,
            gp.kernel_rff_weights(draw.weights), draw.nu, cfg.rtol, cfg.atol)
        err_ratio = jnp.sqrt(jnp.mean(jnp.square(err_scaled)))

        def _accepted():
            st = ODEStats(jnp.asarray(7, jnp.int32), jnp.asarray(1, jnp.int32),
                          jnp.asarray(1, jnp.int32), jnp.asarray(2, jnp.int32))
            return x5, st

        def _fallback():
            # Seed the scan with the controller-shrunk dt (the same
            # safety * err^(-1/5) rule as the in-scan controller, capped at
            # 1 since this is a rejection): re-attempting the identical
            # whole-span step would deterministically re-reject, wasting 6
            # rhs evaluations per rejected segment solve.
            from gpode_tpu.ops.ode import _DFACTOR, _ORDER, _SAFETY
            dt_shrunk = dt * jnp.clip(
                _SAFETY * (err_ratio + 1e-30) ** (-1.0 / _ORDER),
                _DFACTOR, 1.0)

            # checkpoint the whole fallback solve: grad-of-cond materializes
            # the residuals of BOTH branches as cond outputs, so without
            # remat every train step zero-fills and carries the scan's
            # (max_steps, rows, D) per-iteration stacks even when the
            # attempt is accepted (device trace: six f32[8,3000,5]
            # broadcasts + the cond overhead, ~0.25 ms of the 3.7 ms bench
            # step). Rematerializing shrinks the untaken branch's residuals
            # to its inputs; rejected segments (rare) recompute the short
            # scan forward in the backward pass instead. The fallback's rhs
            # pins to XLA: a pallas_call inside this checkpoint region gets
            # its operands stacked on the kernel's scoped VMEM (16.1 MiB >
            # the 16 MiB limit at the bench shape — the remat interaction
            # PROFILE.md documents), and the rare branch's speed is
            # irrelevant anyway.
            def rhs_xla(t, x):
                del t
                return gp.eval_draw(gp_params, draw, x, False)

            # ALWAYS rematerialize the fallback's rhs too (independent of
            # cfg.remat): the whole-solve checkpoint above shrinks the cond
            # residuals, but the backward's recompute of the scan still
            # stores per-iteration residuals for its own VJP — without this
            # inner checkpoint those are the (max_steps, rows, S, D) phi
            # stacks, 750 MB apiece at the 19200-row scale config (HBM OOM).
            # With it the recompute stores only the (max_steps, rows, D)
            # carries. The rare branch's extra FLOPs are irrelevant.
            rhs_xla = jax.checkpoint(rhs_xla)

            def _solve(x0_, dt0_):
                return odeint(rhs_xla, x0_, ts, solver="dopri5",
                              rtol=cfg.rtol, atol=cfg.atol,
                              max_steps=cfg.max_steps, first_step=dt0_)

            xs, st = jax.checkpoint(_solve)(
                x0, jax.lax.stop_gradient(dt_shrunk))
            # the rejected attempt's 7 kernel evaluations still happened
            return xs[-1], ODEStats(
                jnp.asarray(st.num_rhs_evals + 7, jnp.int32),
                jnp.asarray(st.num_accepted, jnp.int32),
                jnp.asarray(st.num_attempted + 1, jnp.int32),
                jnp.asarray(st.num_covered, jnp.int32))

        x1, stats = jax.lax.cond(err_ratio <= 1.0, _accepted, _fallback)
        return jnp.stack([x0, x1], axis=1), stats

    xs, stats = odeint(rhs, x0, ts, solver=cfg.solver, rtol=cfg.rtol,
                       atol=cfg.atol, substeps=cfg.substeps,
                       max_steps=cfg.max_steps, first_step=cfg.first_step)
    return jnp.moveaxis(xs, 0, 1), stats


def flow_forward_batched(gp_params: gp.SVGPParams, draws: gp.PosteriorDraw,
                         x0: jax.Array, ts: jax.Array,
                         cfg: SolverConfig) -> tuple[jax.Array, ODEStats]:
    """Integrate S independent draws as ONE batched solve.

    draws: a PosteriorDraw pytree with leading draw axis S; x0: (S, N, D).
    Returns ((S, N, T, D), stats).

    The eval-path alternative to `vmap(flow_forward)`: under vmap the
    adaptive solver's budget-skip `lax.cond` lowers to `select`, so all
    `max_steps` budget iterations execute full dopri5 stage work for every
    draw even after its trajectory is covered. Stacking the draws into the
    solver state keeps the skip a real branch — iterations after global
    coverage cost one select. Step-size control is shared across draws with
    the conservative max-of-per-draw-RMS error norm
    (:func:`gpode_tpu.ops.ode.max_rms_over_axis0`): accuracy per draw is at
    least what its own controller would enforce (dt = min over draws),
    trading a few extra accepted steps for skipping the dead budget tail.
    Measured: 128-draw VDP posterior-predictive eval ~4x faster on TPU.
    """
    from gpode_tpu.ops.ode import max_rms_over_axis0

    if cfg.use_adjoint:
        # the batched path is the forward-only eval route; continuous-adjoint
        # gradients are a train-path strategy (flow_forward handles it). Warn
        # instead of silently ignoring the flag — if gradients are taken
        # through this solve they flow by autodiff-through-solver, with
        # cfg.remat as the memory knob.
        import warnings

        warnings.warn(
            "flow_forward_batched does not implement use_adjoint; gradients "
            "(if any) flow by autodiff-through-solver. Set remat=True to "
            "bound backward memory for large draw batches.", stacklevel=2)

    use_pallas = False if cfg.solver == "bdf" else cfg.pallas

    def rhs(t, x):
        del t  # time-invariant ODE (`dsvgp.py:172`)
        return jax.vmap(
            lambda dr, xi: gp.eval_draw(gp_params, dr, xi, use_pallas))(
                draws, x)

    if cfg.remat:
        # without this, differentiating a many-draw batched solve tapes every
        # rhs stage's (S, N, S_rff, D) features — the 128-draw eval at the
        # M=256 scale config has no other memory knob (VERDICT r3 item 3).
        # Known JAX limitation: scan still stacks the checkpointed rhs's
        # loop-INVARIANT residuals (the draw leaves) per budget iteration
        # instead of hoisting them, so the remat'd backward costs
        # O(max_steps * draw_bytes) — a ~5x cut vs untaped at probe shapes,
        # not O(1). Forward-only eval (the product path) tapes nothing.
        rhs = jax.checkpoint(rhs)

    xs, stats = odeint(rhs, x0, ts, solver=cfg.solver, rtol=cfg.rtol,
                       atol=cfg.atol, substeps=cfg.substeps,
                       max_steps=cfg.max_steps, first_step=cfg.first_step,
                       norm=max_rms_over_axis0)
    # (T, S, N, D) -> (S, N, T, D)
    return jnp.moveaxis(xs, 0, 2), stats


def flow_inverse(gp_params: gp.SVGPParams, draw: gp.PosteriorDraw,
                 x1: jax.Array, ts: jax.Array,
                 cfg: SolverConfig) -> tuple[jax.Array, ODEStats]:
    """Integrate backward over reversed ts (the reference's `Flow.inverse`,
    `flow.py:92-115`): returns states at flip(ts), shape (N, T, D)."""
    return flow_forward(gp_params, draw, x1, jnp.flip(ts, 0), cfg)


def flow_forward_sampled(key: jax.Array, gp_params: gp.SVGPParams,
                         x0: jax.Array, ts: jax.Array, cfg: SolverConfig,
                         num_features: int,
                         chol_zz: Optional[jax.Array] = None
                         ) -> tuple[jax.Array, ODEStats]:
    """Draw a fresh posterior sample, then integrate (the reference's
    `Flow.forward` with `rebuild_cache=True`, `flow.py:60-90`)."""
    draw = gp.draw_posterior(key, gp_params, num_features, chol_zz)
    return flow_forward(gp_params, draw, x0, ts, cfg)
