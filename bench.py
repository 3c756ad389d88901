"""Benchmark: MoCap shooting-GPODE training throughput (ELBO steps/sec).

The BASELINE.md headline scenario: CMU MoCap subject 09, seqlen 100, 5 PCA
latents, 100 inducing points, 256 RFF features, 5 MC draws/step, dopri5 —
the full training step (posterior draw -> Cholesky -> whitened solves ->
599-segment parallel integration -> 5-term ELBO -> grad -> Adam) compiled to
one XLA program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Two baseline ratios:
  * vs_baseline — against this framework's own step compiled on one host CPU
    core. Read from the pinned BASELINE_CPU.json when present (written by
    scripts/pin_baseline.py, median of >= 5 windows, with provenance —
    removes the contended-host jitter that made live denominators swing 2x
    between rounds); falls back to a live subprocess measurement otherwise.
  * vs_torch_reference — against the ACTUAL reference implementation's train
    step (torch CPU, fixed-grid RK4 torchdiffeq stub which favours the
    reference); pinned-only, null without the artifact.

Usage: python bench.py [--platform cpu] [--iters N] [--no-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def measure_steps_per_sec(iters: int = 200, warmup: int = 3,
                          scale: bool = False, fast: bool = False,
                          mesh_spec: str | None = None,
                          parallel: str = "shard_map", preset=None) -> dict:
    import jax
    cache_dir = os.environ.get("GPODE_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/gpode_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from gpode_tpu.train.bench_setup import build_bench_problem
    from gpode_tpu.train.builders import shooting_loss_fn
    from gpode_tpu.train.trainer import default_optimizer, make_train_step

    # the canonical bench problem — ONE definition shared with the
    # diagnostic scripts (gpode_tpu/train/bench_setup.py)
    if preset:
        from gpode_tpu.train.bench_setup import preset_model_args
        args, params, ys, ts = build_bench_problem(
            args=preset_model_args(preset))
    else:
        args, params, ys, ts = build_bench_problem(scale=scale, fast=fast)

    loss_fn = shooting_loss_fn(args)
    # flat-vector Adam — what the Trainer runs by default (round 4: +8%)
    opt = default_optimizer(5e-3)
    key = jax.random.PRNGKey(1)
    if mesh_spec:
        # --mesh dp=2,mc=4: the sharded train step (sequences over dp, MC
        # samples over mc, params/opt-state replicated) — same step the
        # training drivers run with --mesh.
        from gpode_tpu.parallel.mesh import make_mesh, parse_mesh_spec
        from gpode_tpu.parallel.shard_map_step import make_shard_map_shooting_step
        from gpode_tpu.parallel.train import (device_put_batch,
                                              device_put_replicated,
                                              make_sharded_shooting_step)
        mesh = make_mesh(parse_mesh_spec(mesh_spec))
        make = (make_sharded_shooting_step if parallel == "gspmd"
                else make_shard_map_shooting_step)
        step = make(mesh, args, opt)
        opt_state = device_put_replicated(opt.init(params), mesh)
        params = device_put_replicated(params, mesh)
        key = device_put_replicated(key, mesh)
        ys = (device_put_batch(ys, mesh) if "dp" in mesh.axis_names
              else device_put_replicated(ys, mesh))
        ts = device_put_replicated(ts, mesh)
    else:
        # donate the carry buffers (in-place update, +2%) — what a steady
        # training loop can run with donate_step=True
        step = make_train_step(loss_fn, opt, donate=True)
        opt_state = opt.init(params)

    # warmup: compile + settle (host fetch = hard sync; block_until_ready is
    # not a reliable barrier through the axon tunnel)
    for _ in range(warmup):
        params, opt_state, key, terms = step(params, opt_state, key, ys, ts)
    float(terms.loss)

    # Median of 3 timing windows (each synced by a scalar fetch): robust to
    # the one-core host's contention spikes, which made single-window
    # baseline measurements swing +-50% between rounds (BENCH_r01 vs r02).
    # Each window runs the FULL iteration count: the end-of-window sync fetch
    # costs ~25-100 ms through the axon tunnel, and short windows (iters//3)
    # were absorbing it into the timing — a measured 5-8% artificial
    # "regression" on the r3 driver bench vs the r2 single-window method.
    window = max(1, iters)
    window_times = []
    final_loss = None
    for _ in range(3):
        begin = time.perf_counter()
        for _ in range(window):
            params, opt_state, key, terms = step(params, opt_state, key, ys, ts)
        final_loss = float(terms.loss)  # forces completion of the chain
        window_times.append(time.perf_counter() - begin)
    steps_per_sec = window / sorted(window_times)[1]
    nfe = int(terms.nfe)
    # rhs batch = num_samples * N * T segments integrated per step
    segments = args.num_samples * ys.shape[0] * ys.shape[1]
    return {
        "steps_per_sec": steps_per_sec,
        "rhs_evals_per_sec": steps_per_sec * nfe * segments,
        "loss": final_loss,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def load_pinned_baseline(config: str) -> dict | None:
    """BASELINE_CPU.json entry for this config (written once, with >= 5
    timing windows per number, by scripts/pin_baseline.py). Pinning removes
    the round-to-round 2x jitter the live CPU denominator had on the
    contended 1-core host (BENCH_r01-r03: 0.274 -> 0.181 -> 0.119 steps/s
    for the same code class)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_CPU.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f).get(config)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. cpu)")
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--scale", action="store_true",
                        help="graded config 5: 256 inducing, 32 MC paths")
    parser.add_argument("--fast", action="store_true",
                        help="rk4 fast path (same losses on the MoCap grid)")
    parser.add_argument("--preset", default=None,
                        choices=("official", "fast", "scale", "m256",
                                 "m256_fast"),
                        help="named config preset (overrides --scale/--fast; "
                             "m256* = the recommended at-scale recipe, "
                             "256 inducing / 5 draws)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="device mesh for the sharded step, e.g. 'dp=2,mc=4'")
    parser.add_argument("--parallel", type=str, default="shard_map",
                        choices=("shard_map", "gspmd"))
    parser.add_argument("--no-baseline", action="store_true")
    parser.add_argument("--json-only", action="store_true")
    cli = parser.parse_args()

    if cli.platform:
        import jax
        jax.config.update("jax_platforms", cli.platform)

    result = measure_steps_per_sec(iters=cli.iters, scale=cli.scale,
                                   fast=cli.fast, mesh_spec=cli.mesh,
                                   parallel=cli.parallel, preset=cli.preset)

    vs_baseline = 1.0
    cpu_steps = None
    torch_steps = None
    baseline_source = None
    config_name = (cli.preset if cli.preset else
                   "scale" if cli.scale else "fast" if cli.fast else
                   "official")
    pinned = (load_pinned_baseline(config_name)
              if not cli.no_baseline and result["platform"] != "cpu" else None)
    if pinned is not None:
        cpu_steps = pinned["cpu_xla"]["steps_per_sec"]
        vs_baseline = result["steps_per_sec"] / cpu_steps
        torch_steps = pinned.get("torch_reference", {}).get("steps_per_sec")
        baseline_source = "pinned"
    elif not cli.no_baseline and result["platform"] != "cpu":
        # measure the CPU baseline in a subprocess (fresh backend).
        # measure_steps_per_sec times 3 windows of the full --iters count, so
        # --iters 3 = 3 median-filtered windows of 3 = 9 CPU steps total (the
        # 5-iter single window of rounds 1-2 swung +-50% under host
        # contention; 27 steps of the scale config would blow the timeout)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--platform", "cpu",
                 "--iters", "3", "--no-baseline", "--json-only"]
                + (["--scale"] if cli.scale else [])
                + (["--fast"] if cli.fast else []),
                capture_output=True, text=True, timeout=1800, check=True)
            cpu = json.loads(out.stdout.strip().splitlines()[-1])
            cpu_steps = cpu["value"]
            vs_baseline = result["steps_per_sec"] / cpu_steps
            baseline_source = "live"
        except Exception as e:
            # vs_baseline 1.0 + null cpu_baseline_steps_per_sec in the JSON
            # marks "baseline unavailable"; say why on stderr (the JSON line
            # on stdout stays the single driver-facing artifact).
            print(f"[bench] CPU baseline failed: {e!r}", file=sys.stderr)
            vs_baseline = 1.0

    payload = {
        "metric": ("mocap_shooting_elbo_steps_per_sec" if config_name ==
                   "official" else
                   f"mocap_shooting_{config_name}_elbo_steps_per_sec"),
        "value": round(result["steps_per_sec"], 4),
        "unit": "steps/sec",
        "vs_baseline": round(vs_baseline, 4),
        "rhs_evals_per_sec": round(result["rhs_evals_per_sec"], 1),
        "platform": result["platform"],
        "cpu_baseline_steps_per_sec": cpu_steps,
        "baseline_source": baseline_source,
        # ratio vs the ACTUAL torch reference step (pinned via
        # scripts/pin_baseline.py; null when no pinned artifact exists)
        "vs_torch_reference": (round(result["steps_per_sec"] / torch_steps, 4)
                               if torch_steps else None),
        "torch_reference_steps_per_sec": torch_steps,
        "final_loss": round(result["loss"], 4),
    }
    if cli.mesh:
        payload["mesh"] = cli.mesh
        payload["parallel"] = cli.parallel
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
