"""The faithful-dopri5 torchdiffeq stub is load-bearing for the north-star
metric (TIME_TO_NLL.json's `torch_reference_dopri5` baseline, pinned by
scripts/pin_baseline.py --torch_solver dopri5): it must integrate with
torchdiffeq-0.2.0-class accuracy and step counts or the pinned steps/s —
the reference's cost at its actual default solver (/root/reference/
train_mocap_gpode_shooting.py:62, src/core/flow.py:41) — is meaningless.

Checks, on the Van der Pol oscillator: solution accuracy against a tight
scipy RK45 reference, adaptive nfe in the expected range for rtol=1e-6,
tolerance monotonicity, gradient flow through the accepted-step graph, and
the fixed-grid RK4 path used by the favourable `torch_reference` baseline.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def odeint():
    spec = importlib.util.spec_from_file_location(
        "pin_baseline", os.path.join(_REPO, "scripts/pin_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._stub_torchdiffeq()
    import torchdiffeq
    yield torchdiffeq.odeint
    sys.modules.pop("torchdiffeq", None)


def _vdp(counter=None):
    def rhs(t, x):
        if counter is not None:
            counter[0] += 1
        x1, x2 = x[..., 0], x[..., 1]
        return torch.stack([x2, 0.5 * (1 - x1 ** 2) * x2 - x1], -1)
    return rhs


def _scipy_reference(ic, t_eval):
    from scipy.integrate import solve_ivp
    sol = solve_ivp(lambda t, x: [x[1], 0.5 * (1 - x[0] ** 2) * x[1] - x[0]],
                    (t_eval[0], t_eval[-1]), ic, t_eval=t_eval,
                    rtol=1e-10, atol=1e-12)
    return sol.y.T


def test_dopri5_accuracy_vs_scipy(odeint):
    ts = torch.linspace(0, 7, 15, dtype=torch.float64)
    x0 = torch.tensor([[2.0, 0.0], [1.0, 1.0]], dtype=torch.float64)
    out = odeint(_vdp(), x0, ts, rtol=1e-6, atol=1e-6, method="dopri5")
    for i, ic in enumerate([[2.0, 0.0], [1.0, 1.0]]):
        ref = _scipy_reference(ic, np.linspace(0, 7, 15))
        err = np.abs(out[:, i].numpy() - ref).max()
        assert err < 1e-4, f"ic {ic}: err {err}"


def test_dopri5_adaptive_nfe(odeint):
    ts = torch.linspace(0, 7, 15, dtype=torch.float64)
    x0 = torch.tensor([[2.0, 0.0]], dtype=torch.float64)
    nfe_loose, nfe_tight = [0], [0]
    odeint(_vdp(nfe_loose), x0, ts, rtol=1e-4, atol=1e-4, method="dopri5")
    odeint(_vdp(nfe_tight), x0, ts, rtol=1e-8, atol=1e-8, method="dopri5")
    # 7 time units of mild VdP: tens of steps at 1e-4, hundreds at 1e-8
    assert 50 <= nfe_loose[0] <= 400, nfe_loose[0]
    assert nfe_tight[0] > 1.5 * nfe_loose[0], (nfe_loose[0], nfe_tight[0])


def test_dopri5_gradient_flows(odeint):
    x0 = torch.tensor([[2.0, 0.0]], requires_grad=True)
    out = odeint(_vdp(), x0, torch.linspace(0, 1, 3), rtol=1e-6, atol=1e-6,
                 method="dopri5")
    out.sum().backward()
    assert x0.grad is not None and torch.isfinite(x0.grad).all()
    assert float(x0.grad.abs().sum()) > 0


def test_rk4_fixed_grid_path(odeint):
    ts = torch.linspace(0, 2, 41, dtype=torch.float64)  # dt=0.05 fine grid
    x0 = torch.tensor([[2.0, 0.0]], dtype=torch.float64)
    out = odeint(_vdp(), x0, ts, method="rk4")
    ref = _scipy_reference([2.0, 0.0], np.linspace(0, 2, 41))
    assert np.abs(out[:, 0].numpy() - ref).max() < 1e-5
