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
    import torch

    def odeint(func, x0, ts, rtol=None, atol=None, method=None, options=None):
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

    stub = types.ModuleType("torchdiffeq")
    stub.odeint = odeint
    stub.odeint_adjoint = odeint
    sys.modules.setdefault("torchdiffeq", stub)


def _build_torch_reference(config: str):
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
        solver = "rk4"  # fixed-grid stub; the real dopri5 would be slower
        ts_dense_scale = 2
        use_adjoint = False
        constraint_type = "gauss"
        constraint_trainable = False
        constraint_initial_scale = 1e-3
        num_samples = {"official": 5, "fast": 5, "scale": 32, "m256": 5, "m256_fast": 5}[config]

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


def measure_torch_reference(config: str, windows: int, steps: int) -> dict:
    """Median steps/s of the actual reference's train step (torch CPU)."""
    import torch

    model, Args, data_pca, data_full, _ = _build_torch_reference(config)
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
                            probe_draws: int = 4) -> dict:
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
        config)
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
    a = ap.parse_args()

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
                   "from /root/reference with a fixed-grid RK4 torchdiffeq "
                   "stub (favours the reference vs its Python-loop dopri5)"),
    }
    for config in a.configs:
        entry = payload.get(config, {})
        if not a.skip_cpu:
            print(f"[{config}] measuring own step on one CPU core...",
                  flush=True)
            entry["cpu_xla"] = measure_cpu_xla(config, a.windows, a.steps)
        if not a.skip_torch:
            print(f"[{config}] measuring the torch reference step...",
                  flush=True)
            prev = entry.get("torch_reference", {})
            entry["torch_reference"] = {
                **prev, **measure_torch_reference(config, a.windows, a.steps)}
        if a.torch_overheads:
            print(f"[{config}] measuring the torch reference init + eval "
                  "overheads...", flush=True)
            entry.setdefault("torch_reference", {}).update(
                measure_torch_overheads(config))
        payload[config] = entry
        print(json.dumps({config: entry}, indent=2), flush=True)

    with open(a.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
