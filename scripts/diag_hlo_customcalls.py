#!/usr/bin/env python
"""Identify the named custom-calls in the compiled bench train step.

The device-trace rollup (scripts/analyze_trace.py) reports opaque names like
`custom-call.17`; this dumps each custom-call instruction in the compiled
step's HLO with its call target and shapes so the trace rows can be mapped
to framework ops (Cholesky, triangular solves, Pallas kernels).

    python scripts/diag_hlo_customcalls.py [--scale]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", action="store_true")
    cli = ap.parse_args()

    import jax
    cache_dir = os.environ.get("GPODE_TPU_JAX_CACHE",
                               os.path.expanduser("~/.cache/gpode_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gpode_tpu.data.mocap import MocapDataset, latent_to_data_projector
    from gpode_tpu.models import gp
    from gpode_tpu.models.init import (initialize_inducing,
                                       initialize_kernel_parameters)
    from gpode_tpu.train.builders import (ModelArgs, build_shooting,
                                          shooting_loss_fn)
    from gpode_tpu.train.trainer import make_train_step

    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data/mocap")
    data_pca = MocapDataset(data_path=data_dir, subject="09",
                            pca_components=5, data_normalize=False,
                            pca_normalize=True, seqlen=100)
    data_full = MocapDataset(data_path=data_dir, subject="09",
                             pca_components=-1, data_normalize=False,
                             pca_normalize=False, seqlen=100)
    projector = latent_to_data_projector(data_pca)

    if cli.scale:
        args = ModelArgs(num_inducing=256, num_features=256, dimwise=True,
                         solver="dopri5", ts_dense_scale=2, max_steps=8,
                         first_step=-1.0, num_samples=32, remat=True)
    else:
        args = ModelArgs(num_inducing=100, num_features=256, dimwise=True,
                         solver="dopri5", ts_dense_scale=2, max_steps=8,
                         first_step=-1.0, num_samples=5)

    params = build_shooting(jax.random.PRNGKey(0), args, data_pca.trn.ys,
                            projector=projector,
                            full_dim=data_full.trn.ys.shape[-1])
    params = params._replace(gp=initialize_kernel_parameters(params.gp))
    params = params._replace(gp=initialize_inducing(
        params.gp, data_pca.trn.ys, float(data_pca.trn.ts.max()), 1e0,
        rng=np.random.RandomState(0)))

    ys = jnp.asarray(data_full.trn.ys)
    ts = jnp.asarray(data_pca.trn.ts)
    loss_fn = shooting_loss_fn(args)
    key = jax.random.PRNGKey(1)

    gp.set_pallas_rhs(True)
    opt = optax.adam(5e-3)
    step = make_train_step(loss_fn, opt)
    opt_state = opt.init(params)

    lowered = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(
        params, opt_state, key, ys, ts)
    text = lowered.compile().as_text()
    gp.set_pallas_rhs(None)

    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.-]*custom-call[\w.]*)\s*=\s*([^\n]*?)"
        r"custom_call_target=\"([^\"]+)\"", re.M)
    for m in pat.finditer(text):
        name, head, target = m.groups()
        shape = head.split(" custom-call")[0].strip()
        print(f"{name:22s} target={target:32s} out={shape[:90]}")


if __name__ == "__main__":
    main()
