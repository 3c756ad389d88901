#!/usr/bin/env python
"""Learn Van der Pol with multiple-shooting GPODE (reference: train_vdp_gpode_shooting.py)."""

from _cli import add_shooting_flags, add_vdp_flags, base_parser, to_experiment_args

from gpode_tpu.train.experiments import run_vdp

if __name__ == "__main__":
    parser = base_parser("Learning Van der Pol (long sequences) with GPODE-shooting")
    add_vdp_flags(parser)
    add_shooting_flags(parser)
    parser.set_defaults(save="results/vdp/gpode-shooting", max_steps=16)
    args = to_experiment_args(parser.parse_args())
    run_vdp(args, shooting_variant=True)
