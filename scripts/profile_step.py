#!/usr/bin/env python
"""Per-op breakdown of the MoCap shooting train step (bench.py config).

Times, with the fused Pallas rhs forced ON and OFF:
  - one batched rhs evaluation at the in-solver shape (S*N segments x D),
  - the ELBO forward,
  - ELBO + grad,
  - the full train step (ELBO + grad + Adam),
and derives the backward/forward ratio. This is the before/after profile
artifact behind PROFILE.md (VERDICT r1 item 4). Optionally captures a
jax.profiler trace with --trace <dir>.

    python scripts/profile_step.py [--scale] [--iters 30] [--trace /tmp/trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, sync, iters, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    begin = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - begin) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--scale", action="store_true")
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a jax.profiler trace of 5 steps to this dir")
    ap.add_argument("--out", type=str, default="/tmp/profile_step.json")
    cli = ap.parse_args()

    import jax
    cache_dir = os.environ.get("GPODE_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/gpode_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gpode_tpu.models import gp
    from gpode_tpu.train.bench_setup import build_bench_problem
    from gpode_tpu.train.builders import shooting_loss_fn
    from gpode_tpu.train.trainer import default_optimizer, make_train_step

    args, params, ys, ts = build_bench_problem(scale=cli.scale)
    loss_fn = shooting_loss_fn(args)
    key = jax.random.PRNGKey(1)

    # rhs batch at the in-solver shape: S draws x (N*(T-1)) segments, dim D
    n_seq, t_len = ys.shape[0], ys.shape[1]
    d_lat = params.states.mean.shape[-1]
    rows = args.num_samples * n_seq * (t_len - 1)
    x_batch = jnp.asarray(np.random.RandomState(2).randn(rows, d_lat),
                          jnp.float32)

    opt = default_optimizer(5e-3)

    def sync_tree(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]

    report = {"config": "scale" if cli.scale else "default",
              "rhs_rows": int(rows), "platform": jax.devices()[0].platform}
    for mode in (True, False):
        # set_pallas_rhs is consumed at TRACE time: rebuild every jitted
        # callable per mode so each mode compiles its own program.
        gp.set_pallas_rhs(mode)
        tag = "pallas" if mode else "xla"

        @jax.jit
        def rhs_eval(gp_params, draw_key, x):
            draw = gp.draw_posterior(draw_key, gp_params, args.num_features)
            return gp.eval_draw(gp_params, draw, x)

        @jax.jit
        def fwd(params, key, ys, ts):
            return loss_fn(params, key, ys, ts)[0]

        grad_step = jax.jit(
            jax.grad(lambda p, k, ys, ts: loss_fn(p, k, ys, ts)[0]))
        step = make_train_step(loss_fn, opt)
        opt_state = opt.init(params)

        @jax.jit
        def draw_build(gp_params, k):
            # the ELBO's per-step posterior-draw build: shared Cholesky +
            # num_samples whitened draws (each: RFF sample, Kzz solves -> nu)
            chol = gp.precompute_chol(gp_params)
            keys = jax.random.split(k, args.num_samples)
            return jax.vmap(lambda kk: gp.draw_posterior(
                kk, gp_params, args.num_features, chol))(keys)

        r = {}
        r["draw_build_ms"] = _timeit(
            lambda: draw_build(params.gp, key), sync_tree, cli.iters * 4)
        r["rhs_eval_ms"] = _timeit(
            lambda: rhs_eval(params.gp, key, x_batch), sync_tree, cli.iters * 4)
        r["forward_ms"] = _timeit(
            lambda: fwd(params, key, ys, ts), sync_tree, cli.iters)
        r["grad_ms"] = _timeit(
            lambda: grad_step(params, key, ys, ts), sync_tree, cli.iters)
        st = [opt_state, key]

        def one_step():
            p2, o2, k2, terms = step(params, st[0], st[1], ys, ts)
            st[0], st[1] = o2, k2
            return terms.loss
        r["train_step_ms"] = _timeit(one_step, sync_tree, cli.iters)
        r["bwd_over_fwd"] = round(
            (r["grad_ms"] - r["forward_ms"]) / max(r["forward_ms"], 1e-9), 2)
        r = {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in r.items()}
        report[tag] = r
        print(f"[{tag:>6}] " + "  ".join(f"{k}={v}" for k, v in r.items()),
              flush=True)

    gp.set_pallas_rhs(None)  # restore auto
    if cli.trace:
        gp.set_pallas_rhs(True)
        step = make_train_step(loss_fn, opt)
        opt_state = opt.init(params)
        with jax.profiler.trace(cli.trace):
            for _ in range(5):
                params, opt_state, key, terms = step(params, opt_state, key,
                                                     ys, ts)
            float(terms.loss)
        gp.set_pallas_rhs(None)
        report["trace_dir"] = cli.trace
        print(f"trace written to {cli.trace}", flush=True)

    with open(cli.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
