#!/usr/bin/env python
"""NeuralODE baseline on MoCap (reference: src/neuralode/mocap_model_builder.py:72-111;
the reference ships the builder without a top-level script — this driver makes
the baseline directly comparable to the GPODE MoCap numbers).

Dynamics run in PCA latent space (same pipeline as the GPODE MoCap scripts);
training minimizes latent-space MSE from the observed initial latent state and
evaluation reports data-space MSE after the latent->data projection.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from _cli import add_mocap_flags, base_parser

from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
from gpode_tpu.models import neural_ode
from gpode_tpu.models.flow import SolverConfig
from gpode_tpu.models.likelihoods import project
from gpode_tpu.train.metrics import compute_mse
from gpode_tpu.train.trainer import TrainConfig, Trainer
from gpode_tpu.utils import io as io_utils
from gpode_tpu.utils.checkpoint import save_checkpoint

if __name__ == "__main__":
    parser = base_parser("NeuralODE baseline on CMU MoCap")
    add_mocap_flags(parser)
    parser.add_argument("--num_hidden", type=int, default=128)
    parser.set_defaults(save="results/mocap/neuralode", num_iter=2000,
                        solver="rk4", ts_dense_scale=2)
    ns = parser.parse_args()

    io_utils.makedirs(ns.save)
    logger = io_utils.get_logger(os.path.join(ns.save, "logs"), name="mocap_node")
    io_utils.save_args(ns, os.path.join(ns.save, "train_args.json"))

    data_pca = MocapDataset(data_path=ns.data_path, subject=ns.data_subject,
                            pca_components=ns.num_latents, data_normalize=False,
                            pca_normalize=True, dt=0.01, seqlen=ns.data_seqlen)
    data_full = MocapDataset(data_path=ns.data_path, subject=ns.data_subject,
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, dt=0.01, seqlen=ns.data_seqlen)
    projector = latent_to_data_projector(data_pca)

    cfg = SolverConfig(solver=ns.solver, rtol=1e-6, atol=1e-6,
                       ts_dense_scale=ns.ts_dense_scale, max_steps=ns.max_steps)
    params = neural_ode.init_neural_ode(jax.random.PRNGKey(ns.seed),
                                        ns.num_latents, ns.num_hidden)

    def loss_fn(params, key, ys, ts):
        return neural_ode.mse_loss(key, params, ys, ts, cfg)

    trainer = Trainer(loss_fn, TrainConfig(num_iter=ns.num_iter, lr=ns.lr,
                                           log_freq=ns.log_freq), logger=logger)
    params, _, _ = trainer.train(params, jax.random.PRNGKey(ns.seed + 1),
                                 jnp.asarray(data_pca.trn.ys),
                                 jnp.asarray(data_pca.trn.ts))
    logger.info("********** Optimization completed **********")

    def eval_split(zs_split, full_split, tag):
        pred_zs = neural_ode.predict(params, jnp.asarray(zs_split.ys[:, 0]),
                                     jnp.asarray(zs_split.ts), cfg)
        pred_ys = np.asarray(project(projector, pred_zs))
        mse = compute_mse(full_split.ys, pred_ys)
        logger.info(f"[{tag}] data-space MSE {mse:.3f}")
        return pred_zs, pred_ys, mse

    train_pred_zs, train_pred_ys, _ = eval_split(data_pca.trn, data_full.trn, "TRAIN")
    test_pred_zs, test_pred_ys, _ = eval_split(data_pca.tst, data_full.tst, "TEST")

    if not ns.no_plots:
        # data-space prediction grid (`src/neuralode/plots_mocap.py`): the
        # deterministic prediction enters as a single-draw band
        from gpode_tpu.plots import plots_mocap
        plots_mocap.plot_data_predictions(data_full.tst.ys, test_pred_ys[None],
                                          data_pca.tst.ts, ns.save,
                                          name="plt_data_test")
        plots_mocap.plot_pca_predictions(data_pca.tst.ys,
                                         np.asarray(test_pred_zs)[None],
                                         data_pca.tst.ts, ns.save,
                                         name="plt_latents_test")
    save_checkpoint(os.path.join(ns.save, "checkpt.npz"), {"params": params})
    np.savez(os.path.join(ns.save, "model_predictions.npz"),
             train_pred_zs=np.asarray(train_pred_zs), train_pred_ys=train_pred_ys,
             test_pred_zs=np.asarray(test_pred_zs), test_pred_ys=test_pred_ys)
