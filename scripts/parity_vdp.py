#!/usr/bin/env python
"""End-to-end VDP parity: run the ACTUAL reference training next to ours.

Trains the reference implementation (imported from /root/reference with a
fixed-grid RK4 stub for torchdiffeq, torch CPU) on the VDP task at its script
defaults, then trains this framework at the matched config (rk4 on the same
dense grid, reference RFF scaling), and prints a side-by-side table of final
train/test MLL and MSE. Closes VERDICT r1 item 3's "parity section with
numbers, not prose".

    python scripts/parity_vdp.py --num_iter 2500 --out /tmp/parity_vdp.json
"""

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch


def _torch_rk4_odeint(func, x0, ts, rtol=None, atol=None, method="rk4",
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


def run_reference(num_iter: int, seed: int = 121, shooting: bool = False):
    """The reference's train_vdp_gpode[_shooting].py pipeline, as a library."""
    stub = types.ModuleType("torchdiffeq")
    stub.odeint = _torch_rk4_odeint
    stub.odeint_adjoint = _torch_rk4_odeint
    sys.modules.setdefault("torchdiffeq", stub)
    sys.path.insert(0, "/root/reference")
    from src.datasets.vanderpol import VanderPol
    if shooting:
        from src.gpode_shooting.model_builder import (build_model,
                                                      compute_loss,
                                                      compute_predictions,
                                                      compute_summary)
        from src.gpode_shooting.model_initialization import (
            initialize_inducing, initialize_latents_with_data)
    else:
        from src.gpode.model_builder import (build_model, compute_loss,
                                             compute_predictions,
                                             compute_summary)
        from src.gpode.model_initialization import (
            initialize_inducing, initialize_latents_with_data)
    from src.misc.torch_utils import seed_everything, torch2numpy

    class Args:  # train_vdp_gpode[_shooting].py defaults (rk4 stub solver)
        num_features = 256
        num_inducing = 16
        dimwise = True
        q_diag = False
        solver = "rk4"
        ts_dense_scale = 2
        use_adjoint = False
        eval_sample_size = 128
        # shooting extras (train_vdp_gpode_shooting.py:41-46,67-68)
        constraint_type = "gauss"
        constraint_trainable = False
        constraint_initial_scale = 1e-3
        num_samples = 5

    seed_everything(seed)
    data = VanderPol(S_train=25, T_train=7.0, S_test=50,
                     T_test=7.0 * 49 / 24, noise_var=0.05,
                     x0=np.array([[-1.5, 2.5]]), mu=0.5)
    t_train = data.trn.ys.shape[1]
    train_ys = torch.tensor(data.trn.ys, dtype=torch.float32)
    train_ts = torch.tensor(data.trn.ts, dtype=torch.float32)
    test_ts = torch.tensor(data.tst.ts, dtype=torch.float32)

    model = build_model(Args(), data.trn.ys)
    model = initialize_inducing(model, data.trn.ys, data.trn.ts.max())
    model = initialize_latents_with_data(model, data.trn.ys, data.trn.ts)

    loss_kwargs = dict(num_samples=Args.num_samples) if shooting else {}
    optimizer = torch.optim.Adam(model.parameters(), lr=5e-3)
    t0 = time.time()
    losses = []
    for itr in range(1, num_iter + 1):
        model.train()
        optimizer.zero_grad()
        loss, *_ = compute_loss(model, train_ys, train_ts, **loss_kwargs)
        loss.backward()
        optimizer.step()
        losses.append(float(loss))
        if itr % 250 == 0:
            print(f"  ref iter {itr}: loss {float(loss):.4f} "
                  f"({(time.time() - t0) / itr * 1000:.0f} ms/iter)", flush=True)
    train_time = time.time() - t0

    test_pred = torch2numpy(compute_predictions(model, test_ts,
                                                Args.eval_sample_size))
    train_pred = torch2numpy(compute_predictions(model, train_ts,
                                                 Args.eval_sample_size))
    nv = torch2numpy(model.likelihood.variance)
    train_ll, train_mse = compute_summary(data.trn.ys, train_pred, nv)
    test_ll, test_mse = compute_summary(data.tst.ys[:, t_train:],
                                        test_pred[:, :, t_train:], nv)
    return dict(train_ll=float(train_ll), train_mse=float(train_mse),
                test_ll=float(test_ll), test_mse=float(test_mse),
                loss_first=losses[0], loss_last=losses[-1],
                train_seconds=train_time, ms_per_iter=train_time / num_iter * 1e3)


def run_ours(num_iter: int, seed: int = 121, shooting: bool = False,
             anneal_iters: int = 0):
    from gpode_tpu.models.gp import set_rff_reference_scale
    from gpode_tpu.train.experiments import ExperimentArgs, run_vdp

    set_rff_reference_scale(True)  # reproduce the reference's RFF convention
    try:
        args = ExperimentArgs(solver="rk4", ts_dense_scale=2,
                              num_iter=num_iter, seed=seed, plots=False,
                              save="/tmp/parity_vdp_ours",
                              checkpoint_every=0,
                              constraint_anneal_iters=anneal_iters)
        t0 = time.time()
        params, trainer, metrics = run_vdp(args, shooting_variant=shooting)
        metrics = dict(metrics)
        metrics["train_seconds"] = time.time() - t0
        metrics["loss_first"] = trainer.loss_meter.vals[0]
        metrics["loss_last"] = trainer.loss_meter.vals[-1]
        return metrics
    finally:
        set_rff_reference_scale(False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_iter", type=int, default=2500)
    ap.add_argument("--out", type=str, default="/tmp/parity_vdp.json")
    ap.add_argument("--shooting", action="store_true",
                    help="the multiple-shooting variant at its script defaults")
    ap.add_argument("--seed", type=int, default=121)
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--skip_ref", action="store_true")
    ap.add_argument("--anneal_iters", type=int, default=0,
                    help="ours-side constraint-scale annealing horizon "
                         "(shooting only; 0 = reference behavior)")
    a = ap.parse_args()

    out = {"num_iter": a.num_iter, "shooting": a.shooting, "seed": a.seed}
    if not a.skip_ref:
        print("=== reference (torch CPU, rk4 grid) ===", flush=True)
        out["reference"] = run_reference(a.num_iter, seed=a.seed,
                                         shooting=a.shooting)
        print(json.dumps(out["reference"], indent=2), flush=True)
    if not a.skip_ours:
        print("=== gpode_tpu (matched config) ===", flush=True)
        out["ours"] = run_ours(a.num_iter, seed=a.seed, shooting=a.shooting,
                               anneal_iters=a.anneal_iters)
        print(json.dumps(out["ours"], indent=2), flush=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2)
    if "reference" in out and "ours" in out:
        r, o = out["reference"], out["ours"]
        print(f"\n{'':>14} {'ref':>10} {'ours':>10}")
        for k in ("train_ll", "train_mse", "test_ll", "test_mse",
                  "loss_first", "loss_last", "ms_per_iter"):
            if k in r or k in o:
                print(f"{k:>14} {r.get(k, float('nan')):>10.3f} "
                      f"{o.get(k, float('nan')):>10.3f}")


if __name__ == "__main__":
    main()
