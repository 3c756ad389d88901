"""Shared CLI plumbing for the training scripts.

Flag names track the reference scripts (`train_vdp_gpode.py:26-68` etc.) so a
reference user can reuse their command lines.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Persistent compilation cache: first compiles of solver-scan train steps take
# minutes (remote AOT); cached reruns start in seconds.
_CACHE_DIR = os.environ.get("GPODE_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/gpode_tpu_jax"))
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpode_tpu.train.builders import CONSTRAINTS, SOLVERS  # noqa: E402
from gpode_tpu.train.experiments import ExperimentArgs  # noqa: E402


def _str2bool(v):
    return str(v).lower() in ("true", "1", "yes")


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description)
    p.add_argument("--num_features", type=int, default=256,
                   help="Number of Fourier basis functions (pathwise GP sampling)")
    p.add_argument("--num_inducing", type=int, default=16,
                   help="Number of inducing points for the sparse GP")
    p.add_argument("--dimwise", type=_str2bool, default=True,
                   help="Separate lengthscales for every output dimension")
    p.add_argument("--q_diag", type=_str2bool, default=False,
                   help="Diagonal posterior approximation for inducing variables")
    p.add_argument("--solver", type=str, default="dopri5", choices=SOLVERS,
                   help="ODE solver for numerical integration")
    p.add_argument("--ts_dense_scale", type=int, default=4,
                   help="Dense integration grid factor (fixed-step solvers)")
    p.add_argument("--first_step", type=float, default=None,
                   help="dopri5 initial step (None=heuristic, -1=whole span; "
                        "shooting drivers default to -1)")
    p.add_argument("--max_steps", type=int, default=64,
                   help="Adaptive-solver step budget per solve")
    p.add_argument("--use_adjoint", type=_str2bool, default=False,
                   help="O(1)-memory continuous-adjoint gradients")
    p.add_argument("--remat", type=_str2bool, default=False,
                   help="Rematerialize rhs evals in backward (large configs)")
    p.add_argument("--num_iter", type=int, default=5000,
                   help="Number of gradient steps")
    p.add_argument("--lr", type=float, default=0.005, help="Adam learning rate")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="Global-norm gradient clip (0 = off)")
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=("constant", "cosine"),
                   help="Learning-rate schedule (cosine decays to lr/100)")
    p.add_argument("--pallas_rhs", type=str, default="auto",
                   choices=("auto", "true", "false"),
                   help="Fused Pallas rhs kernel: auto (by batch size), "
                        "true (force), false (XLA path)")
    p.add_argument("--eval_sample_size", type=int, default=128,
                   help="Posterior samples for predictive evaluation")
    p.add_argument("--save", type=str, default="results/run",
                   help="Output directory")
    p.add_argument("--seed", type=int, default=121, help="Global seed")
    p.add_argument("--log_freq", type=int, default=10, help="Logging frequency")
    p.add_argument("--checkpoint_every", type=int, default=1000,
                   help="Periodic checkpoint cadence in iterations (0 = only "
                        "the final checkpoint)")
    p.add_argument("--no_plots", action="store_true", help="Skip diagnostics plots")
    p.add_argument("--resume", action="store_true",
                   help="Resume from <save>/checkpt.npz if present")
    p.add_argument("--flatten_opt", type=_str2bool, default=True,
                   help="Run Adam over one flat vector (optax.flatten; +8% "
                        "steps/s, numerically identical). Pass false to "
                        "resume checkpoints written before this default")
    p.add_argument("--eval_only", action="store_true",
                   help="Skip initialization and training: load the trained "
                        "checkpoint from <save> and run evaluation + plots + "
                        "prediction export only (model/data flags must match "
                        "the training run)")
    p.add_argument("--eval_checkpoint", type=str, default="checkpt.npz",
                   help="Checkpoint filename inside <save> for --eval_only "
                        "(e.g. checkpt_best.npz)")
    return p


def add_vdp_flags(p: argparse.ArgumentParser):
    p.add_argument("--data_obs_S", type=int, default=25, dest="data_obs_s",
                   help="Training sequence length")
    p.add_argument("--data_obs_T", type=float, default=7.0, dest="data_obs_t",
                   help="Training integration time")
    p.add_argument("--data_obs_noise_var", type=float, default=0.05,
                   help="Observation noise variance for simulation")
    p.add_argument("--data_nonuniform", type=_str2bool, default=False,
                   help="Observe VDP at sorted random times "
                        "(VanderPolNonUniform; vanilla variant only — the "
                        "dense-output solvers train on the irregular grid "
                        "directly, test split is pure extrapolation)")


def add_mocap_flags(p: argparse.ArgumentParser):
    p.add_argument("--data_subject", type=str, default="09",
                   choices=("09", "35", "39"), help="MoCap subject")
    p.add_argument("--data_seqlen", type=int, default=100,
                   help="Training sequence length")
    p.add_argument("--num_latents", type=int, default=5,
                   help="Latent (PCA) dimensionality")
    p.add_argument("--data_path", type=str, default="data/mocap")
    p.add_argument("--val_freq", type=int, default=500,
                   help="Validation-eval cadence in iterations (0 = off); "
                        "tracks val LL/MSE and keeps the best checkpoint")
    p.add_argument("--draw_stages", type=str, default="",
                   help="MC-draw schedule 'S1:N1,S2:N2' (stage iters must "
                        "sum to num_iter); trains the same params through "
                        "stages of num_samples — the at-scale S=32 recipe "
                        "is '5:8000,32:2000' (RESULTS.md)")
    p.add_argument("--val_draws", type=int, default=32,
                   help="Posterior draws per validation evaluation")


def add_shooting_flags(p: argparse.ArgumentParser):
    p.add_argument("--mesh", type=str, default=None,
                   help="Multi-chip device mesh, e.g. 'dp=2,mc=4' (sequences "
                        "shard over dp, MC samples over mc; one size may be "
                        "-1 to infer from the device count). Omit for "
                        "single-device training.")
    p.add_argument("--parallel", type=str, default="shard_map",
                   choices=("shard_map", "gspmd"),
                   help="Sharded-step style with --mesh: explicit collectives "
                        "(shard_map, keeps Pallas kernels per-shard) or "
                        "GSPMD sharding annotations")
    p.add_argument("--constraint_type", type=str, default="gauss",
                   choices=CONSTRAINTS, help="Shooting-constraint density")
    p.add_argument("--constraint_trainable", type=_str2bool, default=False,
                   help="Learn the constraint scale")
    p.add_argument("--constraint_initial_scale", type=float, default=1e-3,
                   help="Constraint scale init")
    p.add_argument("--constraint_anneal_iters", type=int, default=0,
                   help="Anneal the constraint scale geometrically from "
                        "--constraint_anneal_start down to "
                        "--constraint_initial_scale over this many iterations "
                        "(0 = off, the reference's frozen-scale behavior); "
                        "stabilizes seed-dependent shooting convergence")
    p.add_argument("--constraint_anneal_start", type=float, default=0.1,
                   help="Initial (loose) constraint scale when annealing")
    p.add_argument("--num_samples", type=int, default=5,
                   help="Reparameterized MC samples per gradient step")
    p.add_argument("--segment_minibatch", type=int, default=0,
                   help="Integrate only K uniformly sampled shooting segments "
                        "per step (0 = all, the reference behavior): O(K) "
                        "step cost on long trajectories, unbiased ELBO "
                        "estimator")


def to_experiment_args(ns: argparse.Namespace) -> ExperimentArgs:
    choice = getattr(ns, "pallas_rhs", "auto")
    if choice != "auto":
        from gpode_tpu.models.gp import set_pallas_rhs
        set_pallas_rhs(choice == "true")
    args = ExperimentArgs()
    for field in vars(args):
        if hasattr(ns, field):
            setattr(args, field, getattr(ns, field))
    args.plots = not getattr(ns, "no_plots", False)
    return args
