#!/usr/bin/env python
"""Pin the bench baselines as a recorded artifact (VERDICT r3 item 6).

The `vs_baseline` ratio in BENCH_r0N.json swung 2x between rounds because the
CPU denominator was re-measured live on a contended 1-core host every run.
This script measures both baselines ONCE, carefully (median of >= 5 timing
windows each), and writes them to BASELINE_CPU.json at the repo root with
provenance; bench.py then reads the pinned numbers and reports two ratios:

  * vs_baseline        — TPU steps/s vs this framework's own step compiled on
                         one CPU core (the conservative stand-in used since
                         round 1),
  * vs_torch_reference — TPU steps/s vs the ACTUAL reference implementation's
                         train step (imported from /root/reference, torch
                         CPU) on the matched MoCap-09 shooting problem. The
                         reference's torchdiffeq is stubbed with a fixed-grid
                         RK4 (same grid its ts_dense_scale produces), which
                         FAVOURS the reference: its default dopri5 would step
                         adaptively in a Python loop and be strictly slower.

Usage: python scripts/pin_baseline.py [--configs official fast]
       [--windows 5] [--steps 2] [--out BASELINE_CPU.json]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import statistics
import subprocess
import sys
import time
import types

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def measure_cpu_xla(config: str, windows: int, steps: int) -> dict:
    """Median steps/s of our own train step on one CPU core, measured in a
    fresh subprocess per window (fresh backend, no shared compile cache
    warm-up bias beyond the persistent cache all rounds share)."""
    per_window = []
    for w in range(windows):
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py"),
             "--platform", "cpu", "--iters", str(steps), "--no-baseline",
             "--json-only", "--preset", config],
            capture_output=True, text=True, timeout=3600, check=True)
        val = json.loads(out.stdout.strip().splitlines()[-1])["value"]
        per_window.append(val)
        print(f"  cpu-xla window {w + 1}/{windows}: {val:.4f} steps/s",
              flush=True)
    return {"steps_per_sec": statistics.median(per_window),
            "windows": per_window}


def _stub_torchdiffeq():
    """Install a torchdiffeq stand-in dispatching on `method`: non-dopri5
    methods get a fixed-grid RK4 (one step per dense-grid interval — FAVOURS
    the reference, whose default solver is dopri5); `method='dopri5'` gets a
    faithful reimplementation of torchdiffeq
    0.2.0's `dopri5` semantics (Dormand-Prince 5(4) with FSAL, Hairer initial
    step selection, rms error norm, safety/ifactor/dfactor step control, and
    the quartic `_interp_fit` dense output) — the work profile the reference
    ACTUALLY pays at its `--solver dopri5` default (train_mocap_gpode_
    shooting.py:62, src/core/flow.py:41 atol=rtol=1e-6). Per-step Python
    overhead here is, if anything, LOWER than real torchdiffeq's (no tuple
    pytrees, no event handling), so the pinned steps/s still favours the
    reference."""
    import torch

    def odeint_rk4(func, x0, ts, rtol=None, atol=None, method=None,
                   options=None):
        xs, x = [x0], x0
        for i in range(len(ts) - 1):
            t, dt = ts[i], ts[i + 1] - ts[i]
            k1 = func(t, x)
            k2 = func(t + dt / 2, x + dt / 2 * k1)
            k3 = func(t + dt / 2, x + dt / 2 * k2)
            k4 = func(t + dt, x + dt * k3)
            x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            xs.append(x)
        return torch.stack(xs)

    # Dormand-Prince 5(4) tableau + torchdiffeq's dense-output midpoint
    _C = (0.2, 0.3, 0.8, 8 / 9, 1.0, 1.0)
    _A = ((0.2,),
          (3 / 40, 9 / 40),
          (44 / 45, -56 / 15, 32 / 9),
          (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
          (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
          (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84))
    _B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
    _B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
           187 / 2100, 1 / 40)
    _BERR = tuple(b - b4 for b, b4 in zip(_B, _B4))
    _CMID = (6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
             -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
             -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2)

    def _rms(x):
        return float(x.detach().pow(2).mean().sqrt())

    def _interp_eval(coeffs, t0, dt, t):
        x = float((t - t0) / dt)
        a, b, c, d, e = coeffs
        return (((a * x + b) * x + c) * x + d) * x + e

    def odeint_dopri5(func, x0, ts, rtol=1e-7, atol=1e-9, method=None,
                      options=None):
        rtol = 1e-7 if rtol is None else rtol
        atol = 1e-9 if atol is None else atol
        t0f, t1f = float(ts[0]), float(ts[-1])
        y, t = x0, t0f
        f0 = func(ts[0], y)
        # Hairer initial step selection (torchdiffeq _select_initial_step)
        scale = atol + y.abs() * rtol
        d0, d1 = _rms(y / scale), _rms(f0 / scale)
        h0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
        f1 = func(ts[0] + h0, y + h0 * f0)
        d2 = _rms((f1 - f0) / scale) / h0
        if d1 <= 1e-15 and d2 <= 1e-15:
            h1 = max(1e-6, h0 * 1e-3)
        else:
            h1 = (0.01 / max(d1, d2)) ** 0.2
        dt = min(100 * h0, h1, t1f - t0f)

        outputs, next_i = [x0], 1
        while next_i < len(ts):
            if t1f - t < 1e-10:  # endpoint reached within float tolerance
                outputs.extend([y] * (len(ts) - next_i))
                break
            dt = min(dt, t1f - t)
            # one Dormand-Prince attempt (FSAL: f0 carried over)
            k = [f0]
            for ci, ai in zip(_C, _A):
                yi = y
                for aij, kj in zip(ai, k):
                    yi = yi + dt * aij * kj
                k.append(func(torch.as_tensor(t + ci * dt), yi))
            y1 = y
            for bi, ki in zip(_B, k):
                if bi:
                    y1 = y1 + dt * bi * ki
            err = sum(bi * ki for bi, ki in zip(_BERR, k) if bi) * dt
            ratio = _rms(err / (atol + rtol * torch.maximum(y.abs(),
                                                            y1.abs())))
            if ratio <= 1.0:  # accept
                y_mid = y
                for ci, ki in zip(_CMID, k):
                    if ci:
                        y_mid = y_mid + dt * ci * ki
                fa, fb = k[0], k[6]
                coeffs = (  # torchdiffeq _interp_fit quartic
                    2 * dt * (fb - fa) - 8 * (y1 + y) + 16 * y_mid,
                    dt * (5 * fa - 3 * fb) + 18 * y + 14 * y1 - 32 * y_mid,
                    dt * (fb - 4 * fa) - 11 * y - 5 * y1 + 16 * y_mid,
                    dt * fa, y)
                t_new = t + dt
                while next_i < len(ts) and float(ts[next_i]) <= t_new + 1e-12:
                    outputs.append(_interp_eval(coeffs, t, dt, ts[next_i]))
                    next_i += 1
                y, t, f0 = y1, t_new, k[6]
            factor = (10.0 if ratio == 0.0 else
                      min(10.0, max(0.2, 0.9 * ratio ** -0.2)))
            dt = dt * factor
        return torch.stack(outputs)

    def odeint(func, x0, ts, rtol=None, atol=None, method=None, options=None):
        if method == "dopri5":
            return odeint_dopri5(func, x0, ts, rtol=rtol, atol=atol)
        return odeint_rk4(func, x0, ts)

    stub = types.ModuleType("torchdiffeq")
    stub.odeint = odeint
    stub.odeint_adjoint = odeint
    sys.modules["torchdiffeq"] = stub


def _build_torch_reference(config: str, solver: str = "rk4"):
    """Build the reference's MoCap-09 shooting model at the bench problem's
    config: subject 09, seqlen 100, 5 PCA latents, M inducing per config,
    256 RFF features, projected Gaussian likelihood in 50-D data space.
    Returns (model, Args, data_pca, data_full, projector)."""
    import torch

    torch.set_num_threads(1)  # the host has one core; avoid oversubscription
    _stub_torchdiffeq()
    sys.path.insert(0, "/root/reference")
    from src.datasets.mocap import MocapDataset
    from src.gpode_shooting.mocap_model_builder import build_model
    from src.misc.mocap_utils import Latent2DataProjector
    from src.misc.torch_utils import seed_everything

    class Args:  # train_mocap_gpode_shooting.py defaults at the bench shape
        num_features = 256
        num_inducing = {"official": 100, "fast": 100, "scale": 256,
                        "m256": 256, "m256_fast": 256}[config]
        dimwise = True
        q_diag = False
        ts_dense_scale = 2
        use_adjoint = False
        constraint_type = "gauss"
        constraint_trainable = False
        constraint_initial_scale = 1e-3
        num_samples = {"official": 5, "fast": 5, "scale": 32, "m256": 5, "m256_fast": 5}[config]

    # rk4 = favourable fixed-grid stub; dopri5 = the reference's actual
    # default (train_mocap_gpode_shooting.py:62), served by the faithful
    # adaptive stub above
    Args.solver = solver
    seed_everything(121)
    data_path = os.path.join(_REPO, "data/mocap")
    data_pca = MocapDataset(data_path=data_path, subject="09",
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, seqlen=100)
    data_full = MocapDataset(data_path=data_path, subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=100)
    projector = Latent2DataProjector(data_pca)
    model = build_model(data_full.trn.ys, data_pca.trn.ys, projector, Args())
    return model, Args, data_pca, data_full, projector


def measure_torch_reference(config: str, windows: int, steps: int,
                            solver: str = "rk4") -> dict:
    """Median steps/s of the actual reference's train step (torch CPU)."""
    import torch

    model, Args, data_pca, data_full, _ = _build_torch_reference(
        config, solver)
    from src.gpode_shooting.mocap_model_builder import compute_loss
    ys_full = torch.tensor(data_full.trn.ys, dtype=torch.float32)
    ts = torch.tensor(data_pca.trn.ts, dtype=torch.float32)
    optimizer = torch.optim.Adam(model.parameters(), lr=5e-3)

    def one_step():
        model.train()
        optimizer.zero_grad()
        loss, *_ = compute_loss(model, ys_full, ts,
                                num_samples=Args.num_samples)
        loss.backward()
        optimizer.step()
        return float(loss)

    one_step()  # warmup (allocator, kernel autotuning)
    per_window = []
    for w in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            one_step()
        per_window.append(steps / (time.perf_counter() - t0))
        print(f"  torch-ref window {w + 1}/{windows}: "
              f"{per_window[-1]:.4f} steps/s", flush=True)
    return {"steps_per_sec": statistics.median(per_window),
            "windows": per_window}


def measure_torch_overheads(config: str, eval_draws: int = 128,
                            probe_draws: int = 4,
                            solver: str = "rk4") -> dict:
    """Pin the reference's OWN init and per-eval wall time for the
    wall-to-wall comparison in bench_time_to_nll.py.

    init = kernel-param + inducing + shooting-latents initialization
    (train_mocap_gpode_shooting.py:136-140) PLUS the `eval_sample_size`-draw
    `compute_predictions` pass its noise-variance init requires (`:140`,
    default eval_sample_size=128, `:76`). eval = `compute_test_predictions`
    (the serial per-draw Python loop, mocap_model_builder.py:104-119) +
    projection + `compute_summary` on the test split. Both prediction loops
    are timed at `probe_draws` draws and extrapolated linearly to
    `eval_draws` (the loop is draw-serial; linearity is exact up to cache
    effects, which favour the reference)."""
    import torch

    model, Args, data_pca, data_full, projector = _build_torch_reference(
        config, solver)
    from src.gpode_shooting.mocap_initialization import (
        initialize_and_fix_kernel_parameters, initialize_inducing,
        initialize_latents_with_data)
    from src.gpode_shooting.mocap_model_builder import (
        compute_predictions, compute_summary, compute_test_predictions)

    scale = eval_draws / probe_draws
    train_ts = torch.tensor(data_full.trn.ts, dtype=torch.float32)
    test_ts = torch.tensor(data_pca.tst.ts, dtype=torch.float32)
    test_y0 = torch.tensor(data_pca.tst.ys[:, 0], dtype=torch.float32)

    t0 = time.perf_counter()
    model = initialize_and_fix_kernel_parameters(
        model, lengthscale_value=1.25, variance_value=0.5, fix=False)
    model = initialize_inducing(model, data_pca.trn.ys,
                                data_pca.trn.ts.max(), 1e0)
    model = initialize_latents_with_data(model, data_pca.trn.ys,
                                         data_pca.trn.ts)
    t_init_fixed = time.perf_counter() - t0

    t0 = time.perf_counter()
    with torch.no_grad():
        zs = compute_predictions(model, train_ts,
                                 eval_sample_size=probe_draws)
        torch.stack([projector(p) for p in zs])
    t_init_pred = (time.perf_counter() - t0) * scale
    init_seconds = t_init_fixed + t_init_pred
    print(f"  torch-ref init: {t_init_fixed:.1f}s fixed + "
          f"{t_init_pred:.1f}s ({eval_draws}-draw noisevar predictions, "
          f"extrapolated from {probe_draws})", flush=True)

    t0 = time.perf_counter()
    with torch.no_grad():
        zs = compute_test_predictions(model, test_y0, test_ts,
                                      eval_sample_size=probe_draws)
        ys_pred = torch.stack([projector(p) for p in zs])
    compute_summary(data_full.tst.ys, ys_pred.numpy(),
                    model.likelihood.variance.detach().numpy())
    eval_seconds = (time.perf_counter() - t0) * scale
    print(f"  torch-ref eval ({eval_draws} draws, extrapolated from "
          f"{probe_draws}): {eval_seconds:.1f}s", flush=True)
    return {"init_seconds": round(init_seconds, 1),
            f"eval_seconds_{eval_draws}_draws": round(eval_seconds, 1),
            "overheads_method": (
                f"prediction loops timed at {probe_draws} draws and scaled "
                f"linearly to {eval_draws} (serial loop; favours the "
                "reference)")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["official", "fast"],
                    choices=["official", "fast", "scale", "m256", "m256_fast"])
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--steps", type=int, default=2,
                    help="train steps per timing window")
    ap.add_argument("--out", default=os.path.join(_REPO, "BASELINE_CPU.json"))
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--skip_cpu", action="store_true")
    ap.add_argument("--torch_overheads", action="store_true",
                    help="also pin the reference's init + per-eval wall "
                         "time (for the wall-to-wall ratio)")
    ap.add_argument("--torch_solver", default="rk4",
                    choices=["rk4", "dopri5"],
                    help="rk4 = favourable fixed-grid stub (pins "
                         "`torch_reference`); dopri5 = the reference's "
                         "actual default via the faithful adaptive stub "
                         "(pins `torch_reference_dopri5`)")
    a = ap.parse_args()
    torch_key = ("torch_reference" if a.torch_solver == "rk4"
                 else "torch_reference_dopri5")

    # merge into an existing pin file instead of clobbering other configs
    payload = {}
    if os.path.exists(a.out):
        with open(a.out) as f:
            payload = json.load(f)
    payload["provenance"] = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "host": platform.platform(),
        "cpu_count": os.cpu_count(),
        "method": (f"median of {a.windows} windows x {a.steps} steps each; "
                   "cpu-xla in fresh subprocesses; torch reference imported "
                   "from /root/reference; `torch_reference` uses a "
                   "fixed-grid RK4 torchdiffeq stub (favours the reference "
                   "vs its Python-loop dopri5); `torch_reference_dopri5` "
                   "uses a faithful torchdiffeq-0.2.0-semantics adaptive "
                   "dopri5 stub at the reference's default "
                   "atol=rtol=1e-6 — its actual advertised config"),
    }
    for config in a.configs:
        entry = payload.get(config, {})
        if not a.skip_cpu:
            print(f"[{config}] measuring own step on one CPU core...",
                  flush=True)
            entry["cpu_xla"] = measure_cpu_xla(config, a.windows, a.steps)
        if not a.skip_torch:
            print(f"[{config}] measuring the torch reference step "
                  f"({a.torch_solver})...", flush=True)
            prev = entry.get(torch_key, {})
            entry[torch_key] = {
                **prev, **measure_torch_reference(config, a.windows, a.steps,
                                                  a.torch_solver)}
        if a.torch_overheads:
            print(f"[{config}] measuring the torch reference init + eval "
                  f"overheads ({a.torch_solver})...", flush=True)
            entry.setdefault(torch_key, {}).update(
                measure_torch_overheads(config, solver=a.torch_solver))
        payload[config] = entry
        print(json.dumps({config: entry}, indent=2), flush=True)

    with open(a.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
