"""Pallas kernel correctness vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpode_tpu.models import gp
from gpode_tpu.ops.kernels import init_rbf, rbf_K
from gpode_tpu.ops.pallas_kernels import (_rhs_reference_jnp, fused_rhs,
                                          rbf_gram_pallas)

_INTERP = jax.devices()[0].platform != "tpu"


def _setup(n=300, m=24, din=3, d=4, s=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(m, din)).astype(np.float32))
    ls = jnp.asarray((0.5 + rng.random((d, din))).astype(np.float32))
    var = jnp.asarray((0.3 + rng.random(d)).astype(np.float32))
    omega = jnp.asarray(rng.normal(size=(din, s, d)).astype(np.float32))
    phase = jnp.asarray((2 * np.pi * rng.random((1, s, d))).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(s, d)).astype(np.float32))
    nu = jnp.asarray(rng.normal(size=(d, m)).astype(np.float32))
    return x, z, ls, var, omega, phase, w, nu


def test_rbf_gram_matches_reference():
    x, z, ls, var, *_ = _setup()
    got = np.asarray(rbf_gram_pallas(x, z, ls, var, tile_n=128, interpret=_INTERP))
    from gpode_tpu.ops.kernels import RBFParams
    from gpode_tpu.ops.math import invsoftplus
    p = RBFParams(invsoftplus(ls), invsoftplus(var))
    want = np.asarray(rbf_K(p, x, z))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_rbf_gram_padded_rows():
    # N not a multiple of the tile: padded rows must not leak into output
    x, z, ls, var, *_ = _setup(n=77)
    got = rbf_gram_pallas(x, z, ls, var, tile_n=64, interpret=_INTERP)
    assert got.shape == (4, 77, 24)
    assert np.all(np.isfinite(np.asarray(got)))


def test_fused_rhs_matches_jnp_reference():
    inputs = _setup()
    got = np.asarray(fused_rhs(*inputs, 128, _INTERP))
    want = np.asarray(_rhs_reference_jnp(*inputs))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_rhs_matches_eval_draw():
    """End-to-end: fused kernel equals models.gp.eval_draw for a real draw."""
    key = jax.random.PRNGKey(0)
    p = gp.init_svgp(key, 3, 4, 24, dimwise=True)
    draw = gp.draw_posterior(jax.random.PRNGKey(1), p, 64)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(50, 3)).astype(np.float32))
    want = np.asarray(gp.eval_draw(p, draw, x))
    got = np.asarray(fused_rhs(
        x, p.z, p.kernel.lengthscales, p.kernel.variance,
        draw.omega, draw.phase, draw.weights, draw.nu, 64, _INTERP))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_fused_rhs_gradients_match_reference():
    inputs = _setup(n=40, s=32)

    def loss_pallas(x, nu, w):
        return jnp.sum(fused_rhs(x, inputs[1], inputs[2], inputs[3], inputs[4],
                                 inputs[5], w, nu, 64, _INTERP) ** 2)

    def loss_ref(x, nu, w):
        return jnp.sum(_rhs_reference_jnp(x, inputs[1], inputs[2], inputs[3],
                                          inputs[4], inputs[5], w, nu) ** 2)

    gx1, gnu1, gw1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(
        inputs[0], inputs[7], inputs[6])
    gx2, gnu2, gw2 = jax.grad(loss_ref, argnums=(0, 1, 2))(
        inputs[0], inputs[7], inputs[6])
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gnu1), np.asarray(gnu2), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_fused_backward_kernel_all_cotangents():
    """The fused Pallas backward produces all eight cotangents equal to the
    jnp-reference VJP, including with N not a multiple of the tile (padded
    g rows must contribute zero)."""
    from gpode_tpu.ops.pallas_kernels import _fused_rhs_bwd_pallas
    inputs = _setup(n=77, s=32)
    g = jnp.asarray(np.random.default_rng(9).normal(size=(77, 4)).astype(np.float32))
    _, vjp = jax.vjp(_rhs_reference_jnp, *inputs)
    want = vjp(g)
    got = _fused_rhs_bwd_pallas(*inputs, g, tile_n=32, interpret=_INTERP)
    names = ("dx", "dz", "dls", "dvar", "domega", "dphase", "dw", "dnu")
    for nm, a, b in zip(names, want, got):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=nm)


@pytest.mark.slow
def test_fused_rk4_segment_matches_odeint_fixed():
    from gpode_tpu.ops.ode import odeint_fixed
    from gpode_tpu.ops.pallas_kernels import fused_rk4_segment
    # square field: state dim == output dim (the ODE case)
    x, z, ls, var, omega, phase, w, nu = _setup(n=70, din=4, d=4)
    dt = jnp.float32(0.07)
    f = lambda t, xx: _rhs_reference_jnp(xx, z, ls, var, omega, phase, w, nu)
    for substeps in (1, 3):
        got = fused_rk4_segment(x, dt, z, ls, var, omega, phase, w, nu,
                                substeps, 32, _INTERP)
        want, _ = odeint_fixed(f, x, jnp.array([0.0, 0.07]), solver="rk4",
                               substeps=substeps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want[-1]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_rk4_segment_gradients_match_reference():
    from gpode_tpu.ops.ode import odeint_fixed
    from gpode_tpu.ops.pallas_kernels import fused_rk4_segment
    x, z, ls, var, omega, phase, w, nu = _setup(n=50, din=4, d=4)
    dt = jnp.float32(0.05)

    def loss_pallas(x, z, ls, var, omega, phase, w, nu):
        out = fused_rk4_segment(x, dt, z, ls, var, omega, phase, w, nu,
                                2, 32, _INTERP)
        return jnp.sum(jnp.sin(out))

    def loss_ref(x, z, ls, var, omega, phase, w, nu):
        f = lambda t, xx: _rhs_reference_jnp(xx, z, ls, var, omega, phase,
                                             w, nu)
        xs, _ = odeint_fixed(f, x, jnp.array([0.0, 0.05]), solver="rk4",
                             substeps=2)
        return jnp.sum(jnp.sin(xs[-1]))

    args = (x, z, ls, var, omega, phase, w, nu)
    g_pallas = jax.grad(loss_pallas, argnums=tuple(range(8)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    names = ("dx", "dz", "dls", "dvar", "domega", "dphase", "dw", "dnu")
    for name, a, b in zip(names, g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


@pytest.mark.slow
def test_fused_dopri5_attempt_matches_dp_step():
    from gpode_tpu.ops.ode import odeint_dopri5
    from gpode_tpu.ops.pallas_kernels import fused_dopri5_attempt
    x, z, ls, var, omega, phase, w, nu = _setup(n=60, din=4, d=4)
    dt = jnp.float32(0.06)
    rtol, atol = 1e-6, 1e-6
    x5, err_scaled = fused_dopri5_attempt(x, dt, z, ls, var, omega, phase,
                                          w, nu, rtol, atol, 32, _INTERP)
    # an accepted whole-span attempt IS the scan solver's single step
    f = lambda t, xx: _rhs_reference_jnp(xx, z, ls, var, omega, phase, w, nu)
    want, stats = odeint_dopri5(f, x, jnp.array([0.0, 0.06]), rtol=rtol,
                                atol=atol, max_steps=8, first_step=-1.0)
    if int(stats.num_accepted) == 1 and int(stats.num_attempted) == 1:
        np.testing.assert_allclose(np.asarray(x5), np.asarray(want[-1]),
                                   rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(err_scaled)).all()


@pytest.mark.slow
def test_fused_dopri5_attempt_gradients_match_reference():
    from gpode_tpu.ops.pallas_kernels import (_rhs_reference_jnp,
                                              fused_dopri5_attempt)
    x, z, ls, var, omega, phase, w, nu = _setup(n=40, din=4, d=4)
    dt = jnp.float32(0.05)

    def loss_pallas(x, z, ls, var, omega, phase, w, nu):
        x5, _ = fused_dopri5_attempt(x, dt, z, ls, var, omega, phase, w, nu,
                                     1e-6, 1e-6, 32, _INTERP)
        return jnp.sum(jnp.sin(x5))

    def loss_ref(x, z, ls, var, omega, phase, w, nu):
        # the same single DP step via the differentiable scan solver
        from gpode_tpu.ops.ode import odeint_dopri5
        f = lambda t, xx: _rhs_reference_jnp(xx, z, ls, var, omega, phase,
                                             w, nu)
        xs, _ = odeint_dopri5(f, x, jnp.array([0.0, 0.05]), rtol=1e-6,
                              atol=1e-6, max_steps=4, first_step=-1.0)
        return jnp.sum(jnp.sin(xs[-1]))

    args = (x, z, ls, var, omega, phase, w, nu)
    g_pallas = jax.grad(loss_pallas, argnums=tuple(range(8)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    names = ("dx", "dz", "dls", "dvar", "domega", "dphase", "dw", "dnu")
    for name, a, b in zip(names, g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5, err_msg=name)


@pytest.mark.slow
def test_flow_level_megakernel_branches_under_force_interpret():
    """Exercise the FLOW-LEVEL megakernel wiring on CPU via the
    force-interpret seam (`pallas_kernels.set_force_interpret`).

    The gates in `models/gp.py`/`models/flow.py` pin the fused paths to the
    TPU backend, so without the seam the CPU suite only ever tests kernels in
    isolation — the branch logic around them (the fused dopri5 attempt +
    lax.cond checkpointed reject fallback with controller-shrunk seeding, the
    rk4 segment megakernel dispatch) would first execute on real hardware.
    Pins value AND gradient of each branch against the XLA path."""
    import dataclasses

    from gpode_tpu.models.flow import SolverConfig, flow_forward
    from gpode_tpu.ops import pallas_kernels as pk
    from gpode_tpu.ops.ode import FIRST_STEP_SPAN

    p = gp.init_svgp(jax.random.PRNGKey(0), 4, 4, 16, dimwise=True)
    draw = gp.draw_posterior(jax.random.PRNGKey(1), p, 32)
    x0 = jnp.asarray(
        np.random.default_rng(3).normal(size=(32, 4)).astype(np.float32))

    # gradients are compared only on the dopri5 cases — the cond/checkpoint
    # wiring is what this test owns; the rk4 flow path is a direct kernel
    # call whose gradients test_fused_rk4_segment_gradients_match_reference
    # already pins (interpret-mode grad traces dominate this test's cost).
    cases = {
        "rk4-segment": (SolverConfig(solver="rk4", ts_dense_scale=3),
                        jnp.array([0.0, 0.1]), False),
        "dopri5-accepted": (SolverConfig(solver="dopri5",
                                         first_step=FIRST_STEP_SPAN,
                                         max_steps=8),
                            jnp.array([0.0, 0.05]), True),
        # a whole-span attempt at tight tolerance deterministically rejects
        # -> the checkpointed scan fallback seeded with the shrunk dt
        "dopri5-rejected": (SolverConfig(solver="dopri5",
                                         first_step=FIRST_STEP_SPAN,
                                         max_steps=64, rtol=1e-7, atol=1e-7),
                            jnp.array([0.0, 0.5]), True),
    }

    pk.set_force_interpret(True)
    gp.set_pallas_rhs(True)
    try:
        assert gp.pallas_rhs_active(p, x0.shape[0])  # the seam opens the gate
        for name, (cfg, ts, check_grad) in cases.items():
            def loss(x0_, c):
                xs, st = flow_forward(p, draw, x0_, ts, c)
                return jnp.sum(jnp.sin(xs[:, -1])), st

            cfg_p = dataclasses.replace(cfg, pallas=True)
            cfg_x = dataclasses.replace(cfg, pallas=False)
            if check_grad:
                (lp, st_p), g_p = jax.value_and_grad(loss, has_aux=True)(
                    x0, cfg_p)
                (lx, st_x), g_x = jax.value_and_grad(loss, has_aux=True)(
                    x0, cfg_x)
                np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                           rtol=2e-3, atol=2e-4, err_msg=name)
            else:
                lp, st_p = loss(x0, cfg_p)
                lx, st_x = loss(x0, cfg_x)
            np.testing.assert_allclose(float(lp), float(lx), rtol=2e-4,
                                       atol=2e-5, err_msg=name)
            assert int(st_p.num_covered) == 2, name  # no starved fallback
            if name == "dopri5-accepted":
                assert int(st_p.num_attempted) == 1, name
            if name == "dopri5-rejected":
                # the fallback really ran: the rejected attempt plus the
                # scan's own attempts
                assert int(st_p.num_attempted) >= 2, name
                assert int(st_p.num_accepted) >= 1, name
    finally:
        pk.set_force_interpret(False)
        gp.set_pallas_rhs(None)


@pytest.mark.slow
def test_dopri5_fallback_backward_memory_bounded():
    """The reject fallback's backward recompute must NOT store per-iteration
    (max_steps, rows, S, D) phi stacks — at the 19200-row scale config those
    are 750 MB apiece and OOM the chip (the regression this pins: the
    whole-solve checkpoint alone shrinks the cond residuals but the scan's
    recompute still saved full rhs activations until the fallback rhs was
    itself rematerialized). Compile-only check via memory_analysis on the
    CPU backend; the phi stack at this shape is ~8 MB per tensor (several of
    them), so the 20 MB temp bound fails loudly if the inner checkpoint is
    lost."""
    import dataclasses

    from gpode_tpu.models.flow import SolverConfig, flow_forward
    from gpode_tpu.ops import pallas_kernels as pk
    from gpode_tpu.ops.ode import FIRST_STEP_SPAN

    p = gp.init_svgp(jax.random.PRNGKey(0), 4, 4, 16, dimwise=True)
    draw = gp.draw_posterior(jax.random.PRNGKey(1), p, 64)
    x0 = jnp.zeros((1024, 4), jnp.float32)
    ts = jnp.array([0.0, 0.1])
    cfg = SolverConfig(solver="dopri5", first_step=FIRST_STEP_SPAN,
                       max_steps=8, pallas=True)

    def loss(x0_, params):
        xs, _ = flow_forward(params, draw, x0_, ts, cfg)
        return jnp.sum(xs[:, -1])

    pk.set_force_interpret(True)
    gp.set_pallas_rhs(True)
    try:
        compiled = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(
            x0, p).compile()
    finally:
        pk.set_force_interpret(False)
        gp.set_pallas_rhs(None)
    temp = compiled.memory_analysis().temp_size_in_bytes
    assert temp < 20 * 1024 * 1024, f"fallback backward temp {temp/2**20:.1f} MiB"


@pytest.mark.slow
def test_toggles_invalidate_jit_caches(monkeypatch):
    """`set_pallas_rhs`/`set_force_interpret` are read at trace time; the
    setters must drop the jit caches so an ALREADY-JITTED closure — no
    rebuild — picks up the new path on its next call (VERDICT r3 item 7:
    the stale-executable footgun)."""
    from gpode_tpu.ops import pallas_kernels as pk

    p = gp.init_svgp(jax.random.PRNGKey(0), 3, 4, 16, dimwise=True)
    draw = gp.draw_posterior(jax.random.PRNGKey(1), p, 32)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(40, 3)).astype(np.float32))

    calls = []
    real = pk.fused_rhs

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pk, "fused_rhs", spy)

    fn = jax.jit(lambda xx: gp.eval_draw(p, draw, xx))
    want = np.asarray(fn(x))  # compiled on the XLA path (CPU, seam off)
    assert not calls

    gp.set_pallas_rhs(True)
    pk.set_force_interpret(True)
    try:
        got = np.asarray(fn(x))  # SAME jitted closure — must retrace
        assert calls, "stale XLA executable served after the toggle"
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
    finally:
        gp.set_pallas_rhs(None)
        pk.set_force_interpret(False)

    calls.clear()
    np.asarray(fn(x))  # toggled back: must NOT keep the Pallas executable
    assert not calls, "stale Pallas executable served after toggling back"


def test_pallas_fallback_telemetry(caplog):
    """Dropped fast paths log once per reason instead of failing silently
    (VERDICT r3 item 8): dimwise=False with the path requested, and the
    auto rule declining a small batch."""
    import logging

    p_shared = gp.init_svgp(jax.random.PRNGKey(0), 3, 4, 16, dimwise=False)
    p_dim = gp.init_svgp(jax.random.PRNGKey(0), 3, 4, 16, dimwise=True)

    gp._PALLAS_FALLBACK_LOGGED.clear()
    from gpode_tpu.ops import pallas_kernels as pk
    pk.set_force_interpret(True)  # opens the backend gate on CPU
    gp.set_pallas_rhs(True)
    try:
        with caplog.at_level(logging.INFO, logger="gpode_tpu.gp"):
            assert gp.pallas_rhs_active(p_shared, 10_000) is False
            assert any("dimwise" in r.message for r in caplog.records)
            caplog.clear()

            gp.set_pallas_rhs(None)  # auto rule, small batch
            assert gp.pallas_rhs_active(p_dim, 8) is False
            assert any("auto rule" in r.message for r in caplog.records)
            n_before = len(caplog.records)
            gp.pallas_rhs_active(p_dim, 8)  # dedupe: same reason logs once
            assert len(caplog.records) == n_before
    finally:
        gp.set_pallas_rhs(None)
        pk.set_force_interpret(False)
        gp._PALLAS_FALLBACK_LOGGED.clear()


def test_fused_rhs_respects_reference_rff_scale():
    # the kernels hardcode the canonical sqrt(2 var/S); under the
    # reference-compat scale the convention folds into the weights
    # (gp.kernel_rff_weights) — the kernel result must equal the XLA
    # eval_draw path in BOTH conventions.
    from gpode_tpu.models.gp import (kernel_rff_weights,
                                     set_rff_reference_scale)
    x, z, ls, var, omega, phase, w, nu = _setup(n=40, din=4, d=4)

    class P:  # minimal params stand-in for _rhs_reference-style math
        pass

    for ref_mode in (False, True):
        set_rff_reference_scale(ref_mode)
        try:
            import gpode_tpu.models.gp as gpm
            factor = gpm._RFF_SCALE_FACTOR
            # XLA-convention result at this factor
            s = w.shape[0]
            xo = jnp.einsum("nd,dfk->nfk", x, omega)
            phi = jnp.cos(xo + phase) * jnp.sqrt(factor * var / s)
            f_prior = jnp.einsum("nfk,fk->nk", phi, w)
            want = f_prior + jnp.einsum(
                "dm,dnm->nd", nu,
                var[:, None, None] * jnp.exp(-0.5 * (
                    jnp.sum((x[None] / ls[:, None])**2, -1)[:, :, None]
                    + jnp.sum((z[None] / ls[:, None])**2, -1)[:, None, :]
                    - 2 * jnp.einsum("dnk,dmk->dnm", x[None] / ls[:, None],
                                     z[None] / ls[:, None]))))
            got = fused_rhs(x, z, ls, var, omega, phase,
                            kernel_rff_weights(w), nu, 32, _INTERP)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"ref_mode={ref_mode}")
        finally:
            set_rff_reference_scale(False)


@pytest.mark.slow
def test_bwd_mxu_formulation_matches_loop():
    """The measured-and-rejected MXU backward formulation stays behind the
    `set_bwd_formulation` seam as reproducible evidence
    (scripts/diag_bwd_formulation.py, PROFILE.md round 5); its cotangents
    must keep matching the default loop form so the evidence doesn't rot."""
    from gpode_tpu.ops.pallas_kernels import (_fused_rhs_bwd_pallas,
                                              set_bwd_formulation)
    inputs = _setup(n=77, s=32)
    g = jnp.asarray(np.random.default_rng(3).normal(
        size=(77, 4)).astype(np.float32))
    try:
        set_bwd_formulation("loop")
        want = _fused_rhs_bwd_pallas(*inputs, g, tile_n=32, interpret=_INTERP)
        set_bwd_formulation("mxu")
        got = _fused_rhs_bwd_pallas(*inputs, g, tile_n=32, interpret=_INTERP)
    finally:
        set_bwd_formulation("auto")
    names = ("dx", "dz", "dls", "dvar", "domega", "dphase", "dw", "dnu")
    for nm, a, b in zip(names, want, got):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4 * scale, err_msg=nm)
