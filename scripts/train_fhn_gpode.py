#!/usr/bin/env python
"""Learn FitzHugh-Nagumo dynamics with GPODE (BASELINE graded config 3:
adaptive dopri5, larger MC sample count). The reference ships the FHN
simulator (src/datasets/fhn.py) without a training driver; this script
completes the family, with --shooting for the multiple-shooting variant."""

from _cli import add_shooting_flags, add_vdp_flags, base_parser, to_experiment_args

from gpode_tpu.train.experiments import run_fhn

if __name__ == "__main__":
    parser = base_parser("Learning FitzHugh-Nagumo dynamics with GPODE")
    add_vdp_flags(parser)
    add_shooting_flags(parser)
    parser.add_argument("--shooting", action="store_true",
                        help="use the multiple-shooting variant")
    parser.set_defaults(save="results/fhn/gpode", data_obs_s=30,
                        data_obs_t=6.0, data_obs_noise_var=0.025,
                        num_samples=10)
    ns = parser.parse_args()
    args = to_experiment_args(ns)
    run_fhn(args, shooting_variant=ns.shooting)
