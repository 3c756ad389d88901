"""The canonical bench problem, defined ONCE.

bench.py and the diagnostic scripts (capture_trace, profile_step,
diag_memory, diag_hlo_customcalls) all analyze the same MoCap shooting
configuration; previously each carried a copy of the dataset/ModelArgs/init
block, so a config change had to be replicated four-plus times — and a
missed copy silently diagnoses a different program than the one being
benchmarked. This module is the single source of truth.

Import lazily (inside main(), after jax.config updates) like the rest of
the script bodies: importing here pulls in jax.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
from gpode_tpu.models.init import (initialize_inducing,
                                   initialize_kernel_parameters)
from gpode_tpu.train.builders import ModelArgs, build_shooting

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def bench_model_args(scale: bool = False, fast: bool = False) -> ModelArgs:
    """The three graded bench configs (mutually exclusive flags)."""
    if scale:
        # BASELINE.md graded config 5: 256 inducing, 32 vmapped MC paths;
        # remat keeps the 19200-segment backward inside HBM.
        return ModelArgs(num_inducing=256, num_features=256, dimwise=True,
                         solver="dopri5", ts_dense_scale=2, max_steps=8,
                         first_step=-1.0, num_samples=32, remat=True)
    if fast:
        # rk4 with one step per interval: bit-identical losses to dopri5 on
        # the dt=0.01 MoCap grid (which needs exactly one adaptive step) at
        # higher throughput — the recommended production config.
        return ModelArgs(num_inducing=100, num_features=256, dimwise=True,
                         solver="rk4", ts_dense_scale=2, max_steps=8,
                         num_samples=5)
    return ModelArgs(num_inducing=100, num_features=256, dimwise=True,
                     solver="dopri5", ts_dense_scale=2, max_steps=8,
                     first_step=-1.0, num_samples=5)


def preset_model_args(name: str) -> ModelArgs:
    """Named bench presets: official / fast / scale, plus `m256` — the
    RESULTS.md recommended at-scale recipe (256 inducing, 5 MC draws:
    capacity scales fine, the 32-draw axis is what collapses quality —
    round-3 scale ablation)."""
    import dataclasses
    if name == "m256":
        return dataclasses.replace(bench_model_args(), num_inducing=256)
    if name == "m256_fast":
        # both documented recommendations at once: the rk4 segment
        # megakernel (bit-equal step losses to dopri5 on the dt=0.01 grid,
        # far cheaper to compile) at the M=256 capacity recipe
        return dataclasses.replace(bench_model_args(fast=True),
                                   num_inducing=256)
    return bench_model_args(scale=name == "scale", fast=name == "fast")


def build_bench_problem(scale: bool = False, fast: bool = False,
                        args: ModelArgs | None = None,
                        initialize: bool = True, data_dir: str | None = None):
    """Build the bench model + data: returns (args, params, ys, ts).

    MoCap subject 09, seqlen 100, 5 PCA latents, likelihood scored in the
    50-D data space through the projector. `initialize` runs the kernel +
    inducing initialization (compile-only diagnostics can skip it).
    `args` overrides the graded config selection entirely.
    """
    if data_dir is None:
        data_dir = os.path.join(_REPO_ROOT, "data/mocap")
    data_pca = MocapDataset(data_path=data_dir, subject="09",
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, seqlen=100)
    data_full = MocapDataset(data_path=data_dir, subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=100)
    projector = latent_to_data_projector(data_pca)

    if args is None:
        args = bench_model_args(scale=scale, fast=fast)
    params = build_shooting(jax.random.PRNGKey(0), args, data_pca.trn.ys,
                            projector=projector,
                            full_dim=data_full.trn.ys.shape[-1])
    if initialize:
        params = params._replace(gp=initialize_kernel_parameters(params.gp))
        params = params._replace(gp=initialize_inducing(
            params.gp, data_pca.trn.ys, float(data_pca.trn.ts.max()), 1e0,
            rng=np.random.RandomState(0)))

    ys = jnp.asarray(data_full.trn.ys)   # likelihood scored in 50-D data space
    ts = jnp.asarray(data_pca.trn.ts)
    return args, params, ys, ts


def extrapolate_baselines(crossings: dict, pinned: dict, eval_every: int,
                          eval_draws: int = 128) -> dict:
    """Recompute a TIME_TO_NLL payload's `cpu_extrapolation` block from a
    pinned BASELINE_CPU.json preset entry (single source of truth — lets
    merge_time_to_nll refresh old runs when a new baseline is pinned).

    Baselines: `cpu_xla` (this framework's own step on one CPU core),
    `torch_reference` (the actual reference with the FAVOURABLE fixed-grid
    RK4 torchdiffeq stub) and `torch_reference_dopri5` (the reference at its
    actual default solver via the faithful adaptive-dopri5 stub —
    train_mocap_gpode_shooting.py:62, src/core/flow.py:41). Train-only
    ratios charge the CPU sides nothing for init/evals/compile; wall-to-wall
    additionally charges the torch side its own pinned init + serial
    per-eval time at the same cadence."""
    out = {}
    for tgt, c in crossings.items():
        entry = {}
        wall = c["wall_seconds_incl_init_compile_evals"]
        cpu_sps = pinned.get("cpu_xla", {}).get("steps_per_sec")
        if cpu_sps:
            cpu_s = c["iter"] / cpu_sps
            entry["cpu_xla_seconds_extrapolated"] = round(cpu_s, 1)
            entry["speedup_vs_cpu_xla_train_only"] = round(
                cpu_s / max(c["train_seconds"], 1e-9), 1)
            entry["speedup_vs_cpu_xla_incl_compile_evals"] = round(
                cpu_s / wall, 1)
        for key in ("torch_reference", "torch_reference_dopri5"):
            tr = pinned.get(key, {})
            sps = tr.get("steps_per_sec")
            if not sps:
                continue
            t_s = c["iter"] / sps
            entry[f"{key}_seconds_extrapolated"] = round(t_s, 1)
            entry[f"speedup_vs_{key}_train_only"] = round(
                t_s / max(c["train_seconds"], 1e-9), 1)
            entry[f"speedup_vs_{key}_incl_compile_evals"] = round(
                t_s / wall, 1)
            t_init = tr.get("init_seconds")
            t_eval = tr.get(f"eval_seconds_{eval_draws}_draws")
            if t_init is not None and t_eval is not None:
                n_evals = (c["iter"] // eval_every) + 1
                t_wall = t_s + t_init + n_evals * t_eval
                entry[f"{key}_wall_seconds_extrapolated"] = round(t_wall, 1)
                suffix = "" if key == "torch_reference" else "_dopri5"
                entry[f"speedup_wall_to_wall{suffix}"] = round(
                    t_wall / wall, 1)
        out[tgt] = entry
    return out
