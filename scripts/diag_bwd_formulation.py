#!/usr/bin/env python
"""Same-process A/B of the fused-rhs backward tile formulations (VERDICT r4
item 7): the round-1..4 VPU loop (per-input-dim (TN, M) difference arrays)
vs the round-5 MXU matmul form (dsq @ z, dsq^T @ x + rank-1 reductions).

Cross-invocation bench A/Bs are meaningless under the shared tunnel's
10-900 s compile / ~3x execution variance (PROFILE.md round 5); this script
times BOTH formulations in one process back-to-back, alternating, on the
standalone fused_rhs backward at a chosen shape — the only trustworthy
instrument for a kernel-level delta here.

Usage: python scripts/diag_bwd_formulation.py [--rows 2970] [--m 100]
       [--s 256] [--d 5] [--din 5] [--iters 50] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2970)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--din", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpode_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(a.rows, a.din)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(a.m, a.din)).astype(np.float32))
    ls = jnp.asarray(1.0 + rng.random((a.d, a.din)).astype(np.float32))
    var = jnp.asarray(0.5 + rng.random((a.d,)).astype(np.float32))
    # PosteriorDraw dimwise conventions (models/gp.py): omega (Din, S, D),
    # phase (1, S, D), weights (S, D), nu (D, M)
    omega = jnp.asarray(rng.normal(size=(a.din, a.s, a.d)).astype(np.float32))
    phase = jnp.asarray(rng.random((1, a.s, a.d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(a.s, a.d)).astype(np.float32))
    nu = jnp.asarray(rng.normal(size=(a.d, a.m)).astype(np.float32))

    def loss(x_):
        f = pk.fused_rhs(x_, z, ls, var, omega, phase, w, nu)
        return jnp.sum(f * f)

    def run(name, x_):
        pk.set_bwd_formulation(name)  # trace-time seam; drops jit caches
        return jax.jit(jax.grad(loss))(x_)

    outs = {name: run(name, x) for name in ("loop", "mxu")}  # compile both
    np.testing.assert_allclose(np.asarray(outs["loop"]),
                               np.asarray(outs["mxu"]), rtol=2e-4, atol=2e-5)
    print(f"shape rows={a.rows} M={a.m} S={a.s} D={a.d} Din={a.din}: "
          "gradients agree (rtol 2e-4)", flush=True)

    g = jax.jit(jax.grad(loss))
    results = {"loop": [], "mxu": []}
    for r in range(a.rounds):
        for name in ("loop", "mxu") if r % 2 == 0 else ("mxu", "loop"):
            pk.set_bwd_formulation(name)
            float(jnp.sum(g(x)))  # recompile under this formulation + warm
            t0 = time.perf_counter()
            out = None
            for _ in range(a.iters):
                out = g(x)
            float(jnp.sum(out))  # tunnel-reliable sync
            dt = (time.perf_counter() - t0) / a.iters
            results[name].append(dt * 1e3)
            print(f"  round {r} {name}: {dt * 1e3:.3f} ms/grad", flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(f"median loop {med['loop']:.3f} ms vs mxu {med['mxu']:.3f} ms "
          f"-> mxu/loop = {med['mxu'] / med['loop']:.3f}")
    pk.set_bwd_formulation("auto")


if __name__ == "__main__":
    main()
