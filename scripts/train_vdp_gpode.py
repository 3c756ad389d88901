#!/usr/bin/env python
"""Learn the Van der Pol system with vanilla GPODE (reference: train_vdp_gpode.py)."""

from _cli import add_vdp_flags, base_parser, to_experiment_args

from gpode_tpu.train.experiments import run_vdp

if __name__ == "__main__":
    parser = base_parser("Learning Van der Pol system with GPODE")
    add_vdp_flags(parser)
    parser.set_defaults(save="results/vdp/gpode")
    args = to_experiment_args(parser.parse_args())
    run_vdp(args, shooting_variant=False)
