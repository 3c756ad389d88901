#!/usr/bin/env python
"""The north-star metric, measured directly (VERDICT r3 item 1 / r4 item 1 /
BASELINE.md): wall-clock time for MoCap-09 shooting-GPODE to FIRST reach the
reference-class test NLL on one TPU chip — INCLUDING init, compiles and
evaluations — vs the CPU baselines.

Trains the headline recipe (subject 09, seqlen 100, 5 PCA latents, M=100,
S_rff=256, 5 MC draws, dopri5 whole-span megakernel — the RESULTS.md config
that lands test LL -1.419 at 10k iters) from scratch. The test metric is the
reference's: mixture log-likelihood over `--eval_draws` posterior draws
scored in the 50-D data space (`src/gpode/model_builder.py:99-120`).

Round-5 overhead architecture (the round-4 run spent 1313 s of wall for
21.6 s of training; the fix is overlap + device-side eval, NOT the persistent
compile cache, whose executable deserialization through the tunnel costs as
much as compiling — measured, PROFILE.md):

  * the data-driven init pipeline runs in a CPU-pinned SUBPROCESS
    (`scripts/_init_mocap_cpu.py`) — identical math, ~60 s instead of
    200-400 s of tunnel compiles — while the main process AOT-compiles...
  * ...the train step and BOTH eval programs on the TPU in concurrent
    threads (tunnel compiles are server-side and parallelize — measured);
  * evaluations are fully device-side (predict -> project -> mixture
    metrics, 2-scalar fetch; `gpode_tpu/train/evaluation.py`): a cheap
    `--track_draws`-draw tracking eval every `--eval_every` iters, and a
    full `--eval_draws`-draw eval to CONFIRM each crossing (recorded
    crossings always come from the full-draw reference metric; the f32
    device metric agrees with the f64 host metric to ~1e-5 relative,
    pinned in tests/test_evaluation.py).

CPU extrapolations (pinned in BASELINE_CPU.json by scripts/pin_baseline.py):

  * train-only: iters_to_target / pinned_steps_per_sec for the identical
    XLA program on one CPU core and for the ACTUAL torch reference — both
    with a fixed-grid RK4 torchdiffeq stub that favours it
    (`torch_reference`) and at its REAL dopri5 default via the faithful
    adaptive stub (`torch_reference_dopri5`, pin_baseline.py
    --torch_solver dopri5) — no overheads charged to either CPU side
    (conservative);
  * wall-to-wall (if torch overheads are pinned via
    `pin_baseline.py --torch_overheads`): the torch side additionally pays
    its own measured init time and its serial per-eval time at the SAME
    eval cadence — apples-to-apples.

Writes TIME_TO_NLL.json at the repo root.

Usage: python scripts/bench_time_to_nll.py [--num_iter 10000]
       [--eval_every 250] [--targets -1.5 -1.45 -1.42]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_iter", type=int, default=10000)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--targets", type=float, nargs="+",
                    default=[-1.50, -1.45, -1.42])
    ap.add_argument("--eval_draws", type=int, default=128)
    ap.add_argument("--track_draws", type=int, default=16)
    ap.add_argument("--preset", default="official",
                    choices=["official", "fast", "m256", "m256_fast"],
                    help="official = dopri5 megakernel; fast = rk4 segment "
                         "megakernel (bit-equal step losses on the dt=0.01 "
                         "grid, much cheaper to compile)")
    ap.add_argument("--seed", type=int, default=121)
    ap.add_argument("--out", default=os.path.join(_REPO, "TIME_TO_NLL.json"))
    a = ap.parse_args()

    t_start = time.perf_counter()

    # ---- phase 0a: the init pipeline, concurrently on the CPU backend ----
    init_path = f"/tmp/ttn_init_{os.getpid()}.npz"
    # The noise-variance init runs INSIDE the CPU subprocess for every
    # preset: its 16-draw predict compiles in a predictable ~5 s (rk4 eval)
    # to ~35 s (dopri5 eval) there, while the equivalent TPU `resid` program
    # paid the tunnel-compile roulette (measured 10 s, 85 s, 298 s, 914 s
    # for the same program on different runs).
    resid_on_tpu = False
    init_proc = subprocess.Popen(
        [sys.executable, os.path.join(_REPO, "scripts/_init_mocap_cpu.py"),
         "--preset", a.preset, "--seed", str(a.seed), "--out", init_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
    from gpode_tpu.models import gpode
    from gpode_tpu.models.init import initialize_noisevar
    from gpode_tpu.models.likelihoods import project
    from gpode_tpu.train.builders import (build_shooting,
                                          default_frozen_predicate,
                                          shooting_loss_fn)
    from gpode_tpu.train.bench_setup import preset_model_args
    from gpode_tpu.train.evaluation import make_projected_scorer
    from gpode_tpu.train.trainer import (build_frozen_mask, default_optimizer,
                                         make_step_bodies)
    from gpode_tpu.utils.checkpoint import load_checkpoint

    margs = preset_model_args(a.preset)
    cfg = margs.solver_config()
    eval_cfg = dataclasses.replace(cfg, max_steps=max(512, cfg.max_steps),
                                   first_step=None)

    data_dir = os.path.join(_REPO, "data/mocap")
    data_pca = MocapDataset(data_path=data_dir, subject="09",
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, seqlen=100)
    data_full = MocapDataset(data_path=data_dir, subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=100)
    projector = latent_to_data_projector(data_pca)

    key = jax.random.PRNGKey(a.seed)
    k_build, _, _, k_train, k_eval = jax.random.split(key, 5)

    # parameter SHAPES for AOT compilation (the real initialized values
    # arrive from the subprocess later); eval_shape costs milliseconds
    shapes = jax.eval_shape(lambda kk: build_shooting(
        kk, margs, data_pca.trn.ys, projector=projector,
        full_dim=data_full.trn.ys.shape[-1]), k_build)

    loss_fn = shooting_loss_fn(margs)
    opt = default_optimizer(5e-3)
    frozen = build_frozen_mask(shapes, default_frozen_predicate(margs))
    opt_shapes = jax.eval_shape(opt.init, shapes)

    ys = jnp.asarray(data_full.trn.ys)
    ts = jnp.asarray(data_pca.trn.ts)
    test_ts = jnp.asarray(data_pca.tst.ts)
    test_x0 = jnp.asarray(data_pca.tst.ys[:, 0])

    track_scorer = make_projected_scorer(
        eval_cfg, margs.num_features, projector, data_full.tst.ys, test_ts,
        test_x0, num_draws=a.track_draws)
    full_scorer = make_projected_scorer(
        eval_cfg, margs.num_features, projector, data_full.tst.ys, test_ts,
        test_x0, num_draws=a.eval_draws)
    vshapes = gpode.GPODEParams(gp=shapes.gp, x0=shapes.states.x0,
                                likelihood=shapes.likelihood)

    def loss_at(p, sub, itr, *batch):
        return loss_fn(p, sub, *batch)

    step_body, _ = make_step_bodies(loss_at, opt, frozen)

    @jax.jit
    def chunk_step(params, opt_state, key, ys_, ts_):
        """eval_every train steps fused into ONE scan program: AOT
        executables dispatch through a slow Python path (~10-20 ms/call
        over the tunnel, measured as the 32 s -> 250 s train-time swings);
        one call per eval window makes that overhead irrelevant."""
        def body(c, _):
            p, o, k = c
            p, o, k, terms = step_body(p, o, k, ys_, ts_)
            return (p, o, k), terms.loss
        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=a.eval_every)
        return params, opt_state, key, losses[-1]

    # init noise-variance program: 16-draw predict on the training split ->
    # residual variance in data space (train/experiments.py run_mocap; moved
    # onto the TPU so the CPU subprocess skips its costliest compile)
    ys_full_trn = jnp.asarray(data_full.trn.ys)
    k_noise = jax.random.fold_in(key, 17)

    @jax.jit
    def resid_fn(vparams):
        zs = gpode.predict(k_noise, vparams, ts, eval_cfg,
                           margs.num_features, num_draws=16)
        init_ys = project(projector, zs)
        return (ys_full_trn[None] - init_ys).var(axis=(0, 1, 2)) + 1e-4

    # ---- phase 0b: TPU AOT compiles, ONE at a time in priority order.
    # Concurrent tunnel compiles amplify each other's latency (measured:
    # three ~5 s eval compiles took ~183 s each when submitted together with
    # the step compile; solo they take 5 s), so a single worker compiles in
    # the order programs are needed: step + resid + opt_init gate training;
    # the tracking eval is needed at iter eval_every (and is skipped, not
    # blocked on, while still compiling); the full eval only at the first
    # crossing. Tracing is GIL-bound and cheap; compile RPCs run while the
    # init subprocess owns the core.
    if a.num_iter % a.eval_every:
        raise SystemExit("--num_iter must be a multiple of --eval_every "
                         "(the step program is a fused scan of eval_every "
                         "steps)")
    step_lowered = chunk_step.lower(shapes, opt_shapes, k_train, ys, ts)
    queue = ([("resid", lambda: resid_fn.lower(vshapes))]
             if resid_on_tpu else []) + [
        ("step", lambda: step_lowered),
        ("opt_init", lambda: jax.jit(opt.init).lower(shapes)),
        ("track", lambda: track_scorer.lower(vshapes, k_eval)),
        ("full", lambda: full_scorer.lower(vshapes, k_eval)),
    ]
    compiled, compile_secs = {}, {}
    done_events = {tag: threading.Event() for tag, _ in queue}

    def compile_worker():
        for tag, lower_thunk in queue:
            t0 = time.perf_counter()
            compiled[tag] = lower_thunk().compile()
            compile_secs[tag] = round(time.perf_counter() - t0, 1)
            done_events[tag].set()
            print(f"[{time.perf_counter() - t_start:7.1f}s] compiled {tag} "
                  f"({compile_secs[tag]}s)", flush=True)

    worker = threading.Thread(target=compile_worker, daemon=True)
    worker.start()

    init_proc.wait()
    if init_proc.returncode != 0:
        raise RuntimeError("CPU init subprocess failed")
    state = load_checkpoint(init_path)
    os.unlink(init_path)
    params = jax.device_put(state["params"])
    t_init_done = time.perf_counter()
    print(f"[{t_init_done - t_start:7.1f}s] init pipeline done (CPU "
          f"subprocess)", flush=True)

    def vp(p):
        return gpode.GPODEParams(gp=p.gp, x0=p.states.x0,
                                 likelihood=p.likelihood)

    if resid_on_tpu:
        import numpy as np
        done_events["resid"].wait()
        resid_var = np.asarray(compiled["resid"](vp(params)))
        params = params._replace(likelihood=initialize_noisevar(
            params.likelihood, 1.5 * resid_var))

    done_events["opt_init"].wait()  # step + resid + opt_init gate training
    opt_state = compiled["opt_init"](params)
    t_train_start = time.perf_counter()
    print(f"[{t_train_start - t_start:7.1f}s] training starts", flush=True)

    def run_eval(tag, p, itr, block=True):
        """(ll, mse) floats, or None while the program is still compiling
        and block=False (training continues instead of stalling)."""
        if not block and not done_events[tag].is_set():
            return None
        done_events[tag].wait()
        ll, mse = compiled[tag](vp(p), jax.random.fold_in(k_eval, itr))
        return float(ll), float(mse)

    # ---- phase 1: train, track, confirm crossings ----
    k = k_train
    trace = []
    crossings = {}
    # easiest target first = LOWEST LL bound (crossed earliest in training)
    pending_targets = sorted(a.targets)
    train_seconds = 0.0
    eval_seconds = 0.0
    n_track_evals = 0
    n_full_evals = 0
    itr = 0
    while itr < a.num_iter:
        t0 = time.perf_counter()
        params, opt_state, k, last_loss = compiled["step"](
            params, opt_state, k, ys, ts)
        final_loss = float(last_loss)  # hard sync through the tunnel
        train_seconds += time.perf_counter() - t0
        itr += a.eval_every

        t0 = time.perf_counter()
        res = run_eval("track", params, itr, block=itr >= a.num_iter)
        row = dict(iter=itr, train_seconds=round(train_seconds, 3))
        if res is None:  # tracking program still compiling: keep training
            row["wall_seconds"] = round(time.perf_counter() - t_start, 3)
            trace.append(row)
            print(f"iter {itr}: loss {final_loss:.4f}, tracking eval still "
                  f"compiling, train {train_seconds:.1f}s", flush=True)
            continue
        ll_t, mse_t = res
        n_track_evals += 1
        row.update(track_ll=round(ll_t, 4), track_mse=round(mse_t, 3))
        # confirm crossings with the full-draw reference metric
        while pending_targets and ll_t >= pending_targets[0]:
            tgt = pending_targets[0]
            ll_f, mse_f = run_eval("full", params, itr)
            n_full_evals += 1
            row.update(test_ll=round(ll_f, 4), test_mse=round(mse_f, 3))
            if ll_f >= tgt:
                pending_targets.pop(0)
                wall = time.perf_counter() - t_start
                crossings[str(tgt)] = dict(
                    iter=itr, train_seconds=round(train_seconds, 3),
                    wall_seconds_incl_init_compile_evals=round(wall, 3),
                    test_ll=round(ll_f, 4), test_mse=round(mse_f, 3))
                print(f"*** target {tgt} confirmed at iter {itr}: "
                      f"LL {ll_f:.4f} ({a.eval_draws} draws), "
                      f"train {train_seconds:.1f}s, wall {wall:.1f}s",
                      flush=True)
            else:
                break  # tracking optimism; keep training
        eval_seconds += time.perf_counter() - t0
        row["wall_seconds"] = round(time.perf_counter() - t_start, 3)
        trace.append(row)
        print(f"iter {itr}: loss {final_loss:.4f}, track LL {ll_t:.4f} "
              f"({a.track_draws} draws), train {train_seconds:.1f}s",
              flush=True)
        if not pending_targets:
            break

    # final full eval (reference metric) regardless of crossings
    ll_f, mse_f = run_eval("full", params, itr)
    n_full_evals += 1
    final = dict(iter=itr, test_ll=round(ll_f, 4), test_mse=round(mse_f, 3))
    wall_total = time.perf_counter() - t_start

    # ---- phase 2: extrapolated baselines (shared helper; also covers the
    # faithful-dopri5 torch baseline when pinned) ----
    from gpode_tpu.train.bench_setup import extrapolate_baselines
    pinned_path = os.path.join(_REPO, "BASELINE_CPU.json")
    baselines = {}
    if os.path.exists(pinned_path):
        with open(pinned_path) as f:
            pinned = json.load(f).get(a.preset, {})
        baselines = extrapolate_baselines(crossings, pinned, a.eval_every,
                                          a.eval_draws)

    payload = {
        "metric": "mocap09_shooting_time_to_test_nll",
        "config": (f"{a.preset} (M={margs.num_inducing}, S_rff=256, "
                   f"{margs.num_samples} draws, {margs.solver} megakernel)"),
        "device": str(jax.devices()[0]),
        "targets": a.targets,
        "crossings": crossings,
        "final": final,
        "cpu_extrapolation": baselines,
        "methodology": (
            "test LL = logsumexp mixture over "
            f"{a.eval_draws} posterior draws in 50-D data space (reference "
            "metric, src/gpode/model_builder.py:99-120), computed on device "
            "in f32 (agrees with the f64 host metric to ~1e-5 rel, "
            "tests/test_evaluation.py); tracked every "
            f"{a.eval_every} iters with a cheap {a.track_draws}-draw eval, "
            f"crossings CONFIRMED with the {a.eval_draws}-draw metric; "
            "wall_seconds_incl_init_compile_evals counts EVERYTHING from "
            "process start (init subprocess, all compiles, all evals); "
            "train-only CPU extrapolations charge the CPU sides nothing "
            "for init/evals/compile (favours CPU); wall-to-wall charges "
            "the torch side its pinned init + serial per-eval time at the "
            "same cadence (apples-to-apples)"),
        "overheads": {
            "init_pipeline_seconds": round(t_init_done - t_start, 1),
            "compile_seconds": compile_secs,
            "wall_to_train_start_seconds": round(t_train_start - t_start, 1),
            "train_seconds": round(train_seconds, 1),
            "eval_seconds_total": round(eval_seconds, 1),
            "n_track_evals": n_track_evals,
            "n_full_evals": n_full_evals,
            "wall_seconds_total": round(wall_total, 1),
        },
        "trace": trace,
    }
    with open(a.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v for k, v in payload.items() if k != "trace"},
                     indent=2))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
