"""Golden-value regression test for the end-to-end VDP training trajectory.

Pins the exact loss trajectory of a fully deterministic short VDP run (fixed
PRNG keys, reference RFF scaling, rk4 on the reference's dense grid — the
same matched config `scripts/parity_vdp.py` uses to train side-by-side with
the actual reference; see RESULTS.md "parity"). Any change to the ELBO terms,
kernel math, RFF draw, initialization, or optimizer plumbing moves these
numbers; VERDICT r1 item 3's "regression test with golden values".

Goldens recorded on the pinned-CPU conftest backend (jax 0.9 era image);
rtol leaves room for XLA codegen drift, not for math changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpode_tpu.data.vanderpol import VanderPol
from gpode_tpu.models.gp import set_rff_reference_scale
from gpode_tpu.models.init import (initialize_inducing,
                                   initialize_kernel_parameters)
from gpode_tpu.train.builders import ModelArgs, build_gpode, gpode_loss_fn
from gpode_tpu.train.trainer import make_train_step

GOLDEN_FIRST = 10.856404304504395
GOLDEN_ITER10 = 6.6017255783081055
GOLDEN_LAST = 5.202798843383789


def test_vdp_training_loss_trajectory_matches_goldens():
    set_rff_reference_scale(True)
    try:
        data = VanderPol(s_train=25, t_train=7.0, noise_var=0.05,
                         x0=np.array([[-1.5, 2.5]]), mu=0.5)
        args = ModelArgs(num_inducing=16, num_features=256, dimwise=True,
                         solver="rk4", ts_dense_scale=2)
        params = build_gpode(jax.random.PRNGKey(121), args, data.trn.ys)
        params = params._replace(gp=initialize_kernel_parameters(params.gp))
        params = params._replace(gp=initialize_inducing(
            params.gp, data.trn.ys, float(data.trn.ts.max()), 1e0,
            rng=np.random.RandomState(121)))

        ys, ts = jnp.asarray(data.trn.ys), jnp.asarray(data.trn.ts)
        opt = optax.adam(5e-3)
        step = make_train_step(gpode_loss_fn(args), opt)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(121)
        losses = []
        for _ in range(30):
            params, opt_state, key, terms = step(params, opt_state, key,
                                                 ys, ts)
            losses.append(float(terms.loss))
    finally:
        set_rff_reference_scale(False)

    # iter 0 is a pure function of the seeds (no optimizer state yet): tight.
    np.testing.assert_allclose(losses[0], GOLDEN_FIRST, rtol=1e-3)
    # later iters accumulate Adam-step rounding: looser but still pinned.
    np.testing.assert_allclose(losses[9], GOLDEN_ITER10, rtol=1e-2)
    np.testing.assert_allclose(losses[-1], GOLDEN_LAST, rtol=2e-2)
    assert losses[-1] < losses[0]
