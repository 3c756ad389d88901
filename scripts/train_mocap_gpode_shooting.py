#!/usr/bin/env python
"""Learn human motion dynamics with shooting GPODE (reference: train_mocap_gpode_shooting.py)."""

from _cli import (add_mocap_flags, add_shooting_flags, base_parser,
                  to_experiment_args)

from gpode_tpu.train.experiments import run_mocap

if __name__ == "__main__":
    parser = base_parser("Learning human motion dynamics with GPODE-shooting")
    add_mocap_flags(parser)
    add_shooting_flags(parser)
    parser.set_defaults(save="results/mocap/gpode-shooting", num_inducing=100, max_steps=8,
                        ts_dense_scale=2, num_iter=10000, log_freq=20)
    args = to_experiment_args(parser.parse_args())
    run_mocap(args, shooting_variant=True)
