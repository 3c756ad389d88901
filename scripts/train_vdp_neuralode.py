#!/usr/bin/env python
"""NeuralODE baseline on Van der Pol (reference exposes the same builder API in
src/neuralode/model_builder.py; no top-level script shipped — this one makes
the baseline directly runnable for parity comparisons)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from _cli import add_vdp_flags, base_parser

from gpode_tpu.data.vanderpol import VanderPol
from gpode_tpu.models import neural_ode
from gpode_tpu.models.flow import SolverConfig
from gpode_tpu.train.metrics import compute_mse
from gpode_tpu.train.trainer import TrainConfig, Trainer
from gpode_tpu.utils import io as io_utils
from gpode_tpu.utils.checkpoint import save_checkpoint

if __name__ == "__main__":
    parser = base_parser("NeuralODE baseline on Van der Pol")
    add_vdp_flags(parser)
    parser.add_argument("--num_hidden", type=int, default=128)
    parser.set_defaults(save="results/vdp/neuralode", num_iter=2000)
    ns = parser.parse_args()

    io_utils.makedirs(ns.save)
    logger = io_utils.get_logger(os.path.join(ns.save, "logs"), name="vdp_node")
    io_utils.save_args(ns, os.path.join(ns.save, "train_args.json"))

    n_ahead = ns.data_obs_s
    data = VanderPol(s_train=ns.data_obs_s, t_train=ns.data_obs_t,
                     s_test=ns.data_obs_s + n_ahead,
                     t_test=ns.data_obs_t * (ns.data_obs_s + n_ahead - 1) / (ns.data_obs_s - 1),
                     noise_var=ns.data_obs_noise_var)
    cfg = SolverConfig(solver=ns.solver, ts_dense_scale=ns.ts_dense_scale,
                       max_steps=ns.max_steps)
    params = neural_ode.init_neural_ode(jax.random.PRNGKey(ns.seed), 2, ns.num_hidden)

    def loss_fn(params, key, ys, ts):
        return neural_ode.mse_loss(key, params, ys, ts, cfg)

    trainer = Trainer(loss_fn, TrainConfig(num_iter=ns.num_iter, lr=ns.lr,
                                           log_freq=ns.log_freq), logger=logger)
    params, _, _ = trainer.train(params, jax.random.PRNGKey(ns.seed + 1),
                                 jnp.asarray(data.trn.ys), jnp.asarray(data.trn.ts))

    t_train = data.trn.ys.shape[1]
    test_pred = np.asarray(neural_ode.predict(params, jnp.asarray(data.tst.ys[:, 0]),
                                              jnp.asarray(data.tst.ts), cfg))
    train_pred = np.asarray(neural_ode.predict(params, jnp.asarray(data.trn.ys[:, 0]),
                                               jnp.asarray(data.trn.ts), cfg))
    logger.info(f"[TRAIN] MSE {compute_mse(data.trn.ys, train_pred):.3f}")
    logger.info(f"[TEST]  MSE {compute_mse(data.tst.ys[:, t_train:], test_pred[:, t_train:]):.3f}")
    if not ns.no_plots:
        from gpode_tpu.plots import plots_2d
        plots_2d.plot_node_longitudinal(data, test_pred, ns.save)
        plots_2d.plot_node_vectorfield(
            lambda x: neural_ode.mlp_rhs(params, x), data, test_pred, ns.save)
    save_checkpoint(os.path.join(ns.save, "checkpt.npz"), {"params": params})
    np.savez(os.path.join(ns.save, "model_predictions.npz"),
             train_pred=train_pred, test_pred=test_pred,
             train_ys=data.trn.ys, test_ys=data.tst.ys)
