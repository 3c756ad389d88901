#!/usr/bin/env python
"""Decompose the VDP parity gap (VERDICT r2 item 2) into eval vs training.

The round-2 parity table shows our test MSE systematically above the
reference's (0.121 vs 0.081 mean over 3 seeds) at the matched config. This
script isolates WHERE the gap comes from by swapping components between the
two implementations:

  cross     train the reference, then load its TRAINED parameters into our
            model (raw unconstrained leaves copy 1:1 — both sides use the
            same softplus/packed-tril parameterizations) and evaluate with
            OUR predict + metrics. If our numbers match the reference's
            self-eval, the eval protocols are equivalent and the gap is
            training-side; any difference here IS the eval-side gap.
  swapinit  load the reference's POST-INITIALIZATION parameters into our
            model and run OUR 5k-iteration training from there. Separates
            init-quality differences from optimization-dynamics differences.
  data      compare the two VanderPol pipelines' arrays bit-for-bit.

Usage:
    python scripts/diag_parity_gap.py --phase data
    python scripts/diag_parity_gap.py --phase cross --num_iter 5000 --seed 121
    python scripts/diag_parity_gap.py --phase swapinit --num_iter 5000
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _install_ref(seed):
    """Import the reference with the fixed-grid RK4 torchdiffeq stub."""
    from parity_vdp import _torch_rk4_odeint
    stub = types.ModuleType("torchdiffeq")
    stub.odeint = _torch_rk4_odeint
    stub.odeint_adjoint = _torch_rk4_odeint
    sys.modules.setdefault("torchdiffeq", stub)
    sys.path.insert(0, "/root/reference")
    from src.misc.torch_utils import seed_everything
    seed_everything(seed)


def _build_ref_model(data):
    from src.gpode.model_builder import build_model

    class Args:
        num_features = 256
        num_inducing = 16
        dimwise = True
        q_diag = False
        solver = "rk4"
        ts_dense_scale = 2
        use_adjoint = False

    return build_model(Args(), data.trn.ys), Args


def _ref_data():
    from src.datasets.vanderpol import VanderPol
    return VanderPol(S_train=25, T_train=7.0, S_test=50, T_test=7.0 * 49 / 24,
                     noise_var=0.05, x0=np.array([[-1.5, 2.5]]), mu=0.5)


def _our_data():
    from gpode_tpu.data.vanderpol import VanderPol
    return VanderPol(s_train=25, t_train=7.0, s_test=50, t_test=7.0 * 49 / 24,
                     noise_var=0.05, x0=np.array([[-1.5, 2.5]]), mu=0.5)


def _export_ref_params(model):
    """Reference model -> dict of numpy RAW (unconstrained) leaves."""
    import torch
    d = model.flow.odefunc.diffeq
    with torch.no_grad():
        return {
            "raw_lengthscales": d.kern.unconstrained_lengthscales.numpy().copy(),
            "raw_variance": d.kern.unconstrained_variance.numpy().copy(),
            "z": d.inducing_loc().numpy().copy(),
            "u_mean": d.Um().numpy().copy(),
            "u_tril_dense": d.Us_sqrt().numpy().copy(),        # (D, M, M)
            "lik_raw_variance":
                model.likelihood.unconstrained_variance.numpy().copy(),
            "x0_mean": model.x0_distribution.mean().numpy().copy(),
            "x0_tril_dense": model.x0_distribution.lchol().numpy().copy(),
        }


def _ref_params_to_ours(raw):
    """Raw reference leaves -> our GPODEParams (identical parameterizations:
    softplus hyperparams, whitened q(u), packed-tril Choleskys)."""
    import jax.numpy as jnp

    from gpode_tpu.models.gp import SVGPParams
    from gpode_tpu.models.gpode import GPODEParams
    from gpode_tpu.models.likelihoods import GaussianLikelihood
    from gpode_tpu.models.states import InitialStatePosterior
    from gpode_tpu.ops import math as om
    from gpode_tpu.ops.kernels import RBFParams

    kernel = RBFParams(jnp.asarray(raw["raw_lengthscales"]),
                       jnp.asarray(raw["raw_variance"]))
    m = raw["z"].shape[0]
    u_tril = om.pack_tril(jnp.asarray(raw["u_tril_dense"]))
    gp = SVGPParams(kernel, jnp.asarray(raw["z"]),
                    jnp.asarray(raw["u_mean"]), u_tril, None)
    x0 = InitialStatePosterior(jnp.asarray(raw["x0_mean"]),
                               om.pack_tril(jnp.asarray(raw["x0_tril_dense"])))
    lik = GaussianLikelihood(jnp.asarray(raw["lik_raw_variance"]))
    del m
    return GPODEParams(gp=gp, x0=x0, likelihood=lik)


def _train_ref(model, data, num_iter):
    import torch

    from src.gpode.model_builder import compute_loss
    train_ys = torch.tensor(data.trn.ys, dtype=torch.float32)
    train_ts = torch.tensor(data.trn.ts, dtype=torch.float32)
    optimizer = torch.optim.Adam(model.parameters(), lr=5e-3)
    for itr in range(1, num_iter + 1):
        model.train()
        optimizer.zero_grad()
        loss, *_ = compute_loss(model, train_ys, train_ts)
        loss.backward()
        optimizer.step()
        if itr % 500 == 0:
            print(f"  ref iter {itr}: loss {float(loss):.4f}", flush=True)
    return model


def _ref_eval(model, data):
    import torch

    from src.gpode.model_builder import compute_predictions, compute_summary
    from src.misc.torch_utils import torch2numpy
    t_train = data.trn.ys.shape[1]
    test_ts = torch.tensor(data.tst.ts, dtype=torch.float32)
    train_ts = torch.tensor(data.trn.ts, dtype=torch.float32)
    test_pred = torch2numpy(compute_predictions(model, test_ts, 128))
    train_pred = torch2numpy(compute_predictions(model, train_ts, 128))
    nv = torch2numpy(model.likelihood.variance)
    train_ll, train_mse = compute_summary(data.trn.ys, train_pred, nv)
    test_ll, test_mse = compute_summary(data.tst.ys[:, t_train:],
                                        test_pred[:, :, t_train:], nv)
    return (dict(train_ll=float(train_ll), train_mse=float(train_mse),
                 test_ll=float(test_ll), test_mse=float(test_mse)),
            train_pred, test_pred, nv)


def _our_eval(params, data, seed=7):
    """Evaluate a GPODEParams pytree with OUR predict + metrics at the parity
    config (rk4, dense scale 2, reference RFF convention)."""
    import jax
    import jax.numpy as jnp

    from gpode_tpu.models import gpode
    from gpode_tpu.models.flow import SolverConfig
    from gpode_tpu.train.metrics import compute_summary

    cfg = SolverConfig(solver="rk4", ts_dense_scale=2)
    t_train = data.trn.ys.shape[1]
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    test_pred = np.asarray(gpode.predict(k1, params, jnp.asarray(data.tst.ts),
                                         cfg, 256, num_draws=128))
    train_pred = np.asarray(gpode.predict(k2, params, jnp.asarray(data.trn.ts),
                                          cfg, 256, num_draws=128))
    nv = np.asarray(params.likelihood.variance)
    train_ll, train_mse = compute_summary(data.trn.ys, train_pred, nv)
    test_ll, test_mse = compute_summary(data.tst.ys[:, t_train:],
                                        test_pred[:, :, t_train:], nv)
    return (dict(train_ll=float(train_ll), train_mse=float(train_mse),
                 test_ll=float(test_ll), test_mse=float(test_mse)),
            train_pred, test_pred)


def _pred_stats(pred, name):
    """Draw-ensemble diagnostics: mean-trajectory spread and per-draw std."""
    spread = float(np.std(pred, axis=0).mean())
    print(f"  {name}: mean |pred| {np.abs(pred).mean():.3f}, "
          f"draw-std {spread:.4f}")


def phase_data():
    _install_ref(121)
    ref = _ref_data()
    ours = _our_data()
    for split in ("trn", "tst"):
        r = getattr(ref, split).ys
        o = np.asarray(getattr(ours, split).ys, dtype=np.float32)
        print(f"{split}: shapes {r.shape} vs {o.shape}, "
              f"max |diff| {np.max(np.abs(r - o)):.3e}")
        rt = getattr(ref, split).ts
        ot = np.asarray(getattr(ours, split).ts, dtype=np.float32)
        print(f"{split} ts: max |diff| {np.max(np.abs(rt - ot)):.3e}")


def phase_cross(num_iter, seed, out):
    from gpode_tpu.models.gp import set_rff_reference_scale
    _install_ref(seed)
    data = _ref_data()
    model, _ = _build_ref_model(data)
    from src.gpode.model_initialization import (initialize_inducing,
                                                initialize_latents_with_data)
    model = initialize_inducing(model, data.trn.ys, data.trn.ts.max())
    model = initialize_latents_with_data(model, data.trn.ys, data.trn.ts)
    model = _train_ref(model, data, num_iter)
    ref_metrics, ref_train_pred, ref_test_pred, nv = _ref_eval(model, data)
    print("reference self-eval:", json.dumps(ref_metrics), flush=True)
    _pred_stats(ref_test_pred, "ref test pred")

    raw = _export_ref_params(model)
    params = _ref_params_to_ours(raw)
    set_rff_reference_scale(True)
    try:
        our_metrics, our_train_pred, our_test_pred = _our_eval(params, data)
    finally:
        set_rff_reference_scale(False)
    print("our eval of the SAME trained params:", json.dumps(our_metrics),
          flush=True)
    _pred_stats(our_test_pred, "our test pred (ref params)")

    # metric-function parity on identical predictions
    from src.gpode.model_builder import compute_summary as ref_summary
    from gpode_tpu.train.metrics import compute_summary as our_summary
    t_train = data.trn.ys.shape[1]
    a = ref_summary(data.tst.ys[:, t_train:], ref_test_pred[:, :, t_train:], nv)
    b = our_summary(data.tst.ys[:, t_train:], ref_test_pred[:, :, t_train:], nv)
    print(f"metric parity on identical preds: ref {a} vs ours "
          f"({float(b[0]):.6f}, {float(b[1]):.6f})")

    result = {"phase": "cross", "seed": seed, "num_iter": num_iter,
              "reference_self_eval": ref_metrics,
              "our_eval_of_ref_params": our_metrics}
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}")


def phase_swapinit(num_iter, seed, out):
    import jax
    import jax.numpy as jnp
    import optax

    from gpode_tpu.models.gp import set_rff_reference_scale
    from gpode_tpu.train.builders import ModelArgs, gpode_loss_fn
    from gpode_tpu.train.trainer import make_train_step

    _install_ref(seed)
    data = _ref_data()
    model, _ = _build_ref_model(data)
    from src.gpode.model_initialization import (initialize_inducing,
                                                initialize_latents_with_data)
    model = initialize_inducing(model, data.trn.ys, data.trn.ts.max())
    model = initialize_latents_with_data(model, data.trn.ys, data.trn.ts)
    raw = _export_ref_params(model)
    params = _ref_params_to_ours(raw)
    print("loaded the reference's post-init params into our model", flush=True)

    margs = ModelArgs(num_inducing=16, num_features=256, dimwise=True,
                      solver="rk4", ts_dense_scale=2)
    set_rff_reference_scale(True)
    try:
        loss_fn = gpode_loss_fn(margs)
        opt = optax.adam(5e-3)
        step = make_train_step(loss_fn, opt)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(seed)
        ys = jnp.asarray(np.asarray(data.trn.ys, dtype=np.float32))
        ts = jnp.asarray(np.asarray(data.trn.ts, dtype=np.float32))
        for itr in range(1, num_iter + 1):
            params, opt_state, key, terms = step(params, opt_state, key, ys, ts)
            if itr % 500 == 0:
                print(f"  ours iter {itr}: loss {float(terms.loss):.4f}",
                      flush=True)
        our_metrics, _, our_test_pred = _our_eval(params, data)
    finally:
        set_rff_reference_scale(False)
    print("ours trained FROM THE REFERENCE INIT:", json.dumps(our_metrics),
          flush=True)
    _pred_stats(our_test_pred, "our test pred (swapinit)")
    with open(out, "w") as f:
        json.dump({"phase": "swapinit", "seed": seed, "num_iter": num_iter,
                   "ours_from_ref_init": our_metrics}, f, indent=2)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("data", "cross", "swapinit"),
                    required=True)
    ap.add_argument("--num_iter", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=121)
    ap.add_argument("--out", type=str, default=None)
    a = ap.parse_args()
    out = a.out or f"/tmp/parity_gap_{a.phase}_{a.seed}.json"
    if a.phase == "data":
        phase_data()
    elif a.phase == "cross":
        phase_cross(a.num_iter, a.seed, out)
    else:
        phase_swapinit(a.num_iter, a.seed, out)


if __name__ == "__main__":
    main()
