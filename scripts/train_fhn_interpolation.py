#!/usr/bin/env python
"""FHN interpolation experiment on the reference's shipped non-uniform splits
(data/fhn/fhn_interpolation[_small].npz): train on 38 observed points, score
the 12 held-out interpolation points."""

from _cli import base_parser, to_experiment_args

from gpode_tpu.train.experiments import run_fhn_interpolation

if __name__ == "__main__":
    parser = base_parser("FHN interpolation with GPODE (non-uniform grid)")
    parser.add_argument("--shooting", action="store_true",
                        help="masked shooting variant on the full uniform grid")
    parser.add_argument("--small", action="store_true",
                        help="use the small interpolation split")
    parser.set_defaults(save="results/fhn/interpolation", num_iter=3000)
    ns = parser.parse_args()
    args = to_experiment_args(ns)
    args.data_path = "data/fhn"
    run_fhn_interpolation(args, small=ns.small, shooting_variant=ns.shooting)
