"""Prototype microbench: wide-layout fused rhs vs the per-dim kernel.

Hypothesis (PROFILE.md round-3): the rhs kernels sit ~100x off roofline
because the static D loop issues skinny K=Din matmuls and VPU outer-diff
loops. The wide layout packs all output dims into THREE fat matmuls:

    t   = x @ B            B = [omega_wide | z_scaled_wide]   (Din, W)
    act = [cos(t_rff + phase), exp(t_gram - 0.5 xn - 0.5 zn)] (TN, W)
    f   = act @ Wblk       Wblk block-diagonal, scales folded (W, D)

Gram via the norm expansion ||xd-zd||^2 = xn + zn - 2 xd.zd (the XLA Gram
path in ops/kernels.py already uses this form at HIGHEST precision).

Run on TPU: python scripts/proto_wide_rhs.py [--rows 2995] [--iters 200]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpode_tpu.ops.pallas_kernels import (_pad_rows, _full_spec, fused_rhs,
                                          _rhs_reference_jnp)

HI = jax.lax.Precision.HIGHEST
_ZN_PAD = 1e30  # padded z columns: exp(-0.5 * BIG) == 0


def _ceil128(v: int) -> int:
    return -(-v // 128) * 128


def wide_pack(z, lengthscales, variance, omega, phase, weights, nu, s_real):
    """Build the wide operands (pure XLA, small tensors).

    Layouts mirror fused_rhs: z (M, Din), ls (D, Din), var (D,),
    omega (Din, S, D), phase (1, S, D), weights (S, D), nu (D, M).
    """
    m, din = z.shape
    d = nu.shape[0]
    s = omega.shape[1]
    sp, mp = _ceil128(s), _ceil128(m)
    inv_ls2 = (1.0 / lengthscales ** 2).astype(jnp.float32)      # (D, Din)

    om_t = jnp.moveaxis(omega.astype(jnp.float32), 2, 1)          # (Din, D, S)
    om_p = jnp.pad(om_t, ((0, 0), (0, 0), (0, sp - s)))
    b_rff = om_p.reshape(din, d * sp)

    zs = inv_ls2[:, :, None] * z.T[None, :, :]                    # (D, Din, M)
    zs_p = jnp.pad(zs, ((0, 0), (0, 0), (0, mp - m)))
    b_gram = jnp.moveaxis(zs_p, 0, 1).reshape(din, d * mp)
    b = jnp.concatenate([b_rff, b_gram], axis=1)                  # (Din, W)

    ph = jnp.moveaxis(phase.astype(jnp.float32), 2, 0)[:, 0, :]   # (D, S)
    phase_w = jnp.pad(ph, ((0, 0), (0, sp - s))).reshape(1, d * sp)

    zn = jnp.einsum("mk,dk->dm", z * z, inv_ls2, precision=HI)    # (D, M)
    zn_w = jnp.pad(zn, ((0, 0), (0, mp - m)),
                   constant_values=_ZN_PAD).reshape(1, d * mp)

    scale = jnp.sqrt(2.0 * variance / s_real)                     # (D,)
    wsc = jnp.pad(weights.astype(jnp.float32) * scale[None, :],
                  ((0, sp - s), (0, 0)))                          # (Sp, D)
    eye = jnp.eye(d, dtype=jnp.float32)
    blk_rff = jnp.einsum("sd,de->dse", wsc, eye).reshape(d * sp, d)
    nuvar = jnp.pad(nu * variance[:, None], ((0, 0), (0, mp - m)))  # (D, Mp)
    blk_gram = jnp.einsum("dm,de->dme", nuvar, eye).reshape(d * mp, d)
    wblk = jnp.concatenate([blk_rff, blk_gram], axis=0)           # (W, D)

    invls2_t = inv_ls2.T                                          # (Din, D)
    return b, phase_w, zn_w, invls2_t, wblk, sp, mp


def _wide_rhs_kernel(d_out, sp, mp, x_ref, b_ref, phase_ref, zn_ref,
                     invls2_ref, wblk_ref, out_ref):
    x = x_ref[:]
    t = jnp.dot(x, b_ref[:], preferred_element_type=jnp.float32,
                precision=HI)                                     # (TN, W)
    xn = jnp.dot(x * x, invls2_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)                                    # (TN, D)
    ds = d_out * sp
    to = t[:, :ds] + phase_ref[:]
    xnrep = jnp.concatenate(
        [jnp.broadcast_to(xn[:, d:d + 1], (x.shape[0], mp))
         for d in range(d_out)], axis=1)                          # (TN, DMp)
    act = jnp.concatenate(
        [jnp.cos(to), jnp.exp(t[:, ds:] - 0.5 * (xnrep + zn_ref[:]))], axis=1)
    out_ref[:] = jnp.dot(act, wblk_ref[:],
                         preferred_element_type=jnp.float32, precision=HI)


def fused_rhs_wide(x, z, lengthscales, variance, omega, phase, weights, nu,
                   tile_n=256, interpret=False):
    n, din = x.shape
    d = nu.shape[0]
    s = weights.shape[0]
    b, phase_w, zn_w, invls2_t, wblk, sp, mp = wide_pack(
        z, lengthscales, variance, omega, phase, weights, nu, s)
    w = b.shape[1]
    x_p = _pad_rows(x, tile_n)
    n_pad = x_p.shape[0]
    out = pl.pallas_call(
        functools.partial(_wide_rhs_kernel, d, sp, mp),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((din, w)), _full_spec((1, d * sp)),
            _full_spec((1, d * mp)), _full_spec((din, d)),
            _full_spec((w, d)),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda ni: (ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
    )(x_p, b, phase_w, zn_w, invls2_t, wblk)
    return out[:n]


def _wide2_rhs_kernel(d_out, sp, mp, x_ref, b_ref, phase_ref, zn_ref,
                      invls2_ref, wsc_ref, nuvar_ref, out_ref):
    """Wide variant 2: one fat matmul + per-dim VPU multiply-reduces
    (no act concat, no K=W reduce matmul)."""
    x = x_ref[:]
    t = jnp.dot(x, b_ref[:], preferred_element_type=jnp.float32,
                precision=HI)                                     # (TN, W)
    xn = jnp.dot(x * x, invls2_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)                                    # (TN, D)
    ds = d_out * sp
    cosv = jnp.cos(t[:, :ds] + phase_ref[:])                      # (TN, DS)
    cols = []
    for d in range(d_out):
        pr = jnp.sum(cosv[:, d * sp:(d + 1) * sp] * wsc_ref[0, d * sp:(d + 1) * sp],
                     axis=1, keepdims=True)
        e = jnp.exp(t[:, ds + d * mp:ds + (d + 1) * mp]
                    - 0.5 * (xn[:, d:d + 1] + zn_ref[0, d * mp:(d + 1) * mp]))
        up = jnp.sum(e * nuvar_ref[0, d * mp:(d + 1) * mp], axis=1,
                     keepdims=True)
        cols.append(pr + up)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def fused_rhs_wide2(x, z, lengthscales, variance, omega, phase, weights, nu,
                    tile_n=512, interpret=False):
    n, din = x.shape
    d = nu.shape[0]
    s = weights.shape[0]
    b, phase_w, zn_w, invls2_t, wblk, sp, mp = wide_pack(
        z, lengthscales, variance, omega, phase, weights, nu, s)
    # flat per-column weights instead of the block matrix
    wsc = wblk[:d * sp].reshape(d, sp, d)
    idx = jnp.arange(d)
    wsc_w = wsc[idx, :, idx].reshape(1, d * sp)
    nv = wblk[d * sp:].reshape(d, mp, d)[idx, :, idx].reshape(1, d * mp)
    w = b.shape[1]
    x_p = _pad_rows(x, tile_n)
    n_pad = x_p.shape[0]
    out = pl.pallas_call(
        functools.partial(_wide2_rhs_kernel, d, sp, mp),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((din, w)), _full_spec((1, d * sp)),
            _full_spec((1, d * mp)), _full_spec((din, d)),
            _full_spec((1, d * sp)), _full_spec((1, d * mp)),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda ni: (ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
    )(x_p, b, phase_w, zn_w, invls2_t, wsc_w, nv)
    return out[:n]


def _wide_rhs_bwd_kernel(d_out, sp, mp, x_ref, b_ref, phase_ref, zn_ref,
                         invls2_ref, wblk_ref, g_ref,
                         dx_ref, db_ref, dwblk_ref, dphase_ref, dzn_ref,
                         dinvls2_ref):
    """Loop-free wide VJP: recompute t/act, then four fat matmuls.

    Per-tile outputs: dx tile-indexed; db/dwblk/dphase/dzn/dinvls2 are
    constant-index accumulators across the sequential grid. Cotangents of
    structurally-zero pad entries land in the packed outputs and are
    discarded by the caller's unpack."""
    ni = pl.program_id(0)
    x = x_ref[:]
    tn = x.shape[0]
    t = jnp.dot(x, b_ref[:], preferred_element_type=jnp.float32, precision=HI)
    xn = jnp.dot(x * x, invls2_ref[:], preferred_element_type=jnp.float32,
                 precision=HI)
    ds = d_out * sp
    to = t[:, :ds] + phase_ref[:]
    xnrep = jnp.concatenate(
        [jnp.broadcast_to(xn[:, d:d + 1], (tn, mp)) for d in range(d_out)],
        axis=1)
    cosv = jnp.cos(to)
    e = jnp.exp(t[:, ds:] - 0.5 * (xnrep + zn_ref[:]))
    act = jnp.concatenate([cosv, e], axis=1)                    # (TN, W)

    g = g_ref[:]                                                # (TN, D)
    # dact = g @ wblk.T via dot_general (no transpose materialization)
    dact = jax.lax.dot_general(g, wblk_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=HI)                    # (TN, W)
    dto = -jnp.sin(to) * dact[:, :ds]
    dte = e * dact[:, ds:]
    dt = jnp.concatenate([dto, dte], axis=1)                    # (TN, W)
    # dxn[:, d] = -0.5 * rowsum of dte block d
    dxn = jnp.concatenate(
        [-0.5 * jnp.sum(dte[:, d * mp:(d + 1) * mp], axis=1, keepdims=True)
         for d in range(d_out)], axis=1)                        # (TN, D)
    dx = (jax.lax.dot_general(dt, b_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=HI)
          + 2.0 * x * jax.lax.dot_general(
              dxn, invls2_ref[:], (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32, precision=HI))
    db = jax.lax.dot_general(x, dt, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=HI)                      # (Din, W)
    dwblk = jax.lax.dot_general(act, g, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=HI)                   # (W, D)
    dphase = jnp.sum(dto, axis=0, keepdims=True)                # (1, DS)
    dzn = -0.5 * jnp.sum(dte, axis=0, keepdims=True)            # (1, DMp)
    dinvls2 = jax.lax.dot_general(x * x, dxn, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=HI)                 # (Din, D)

    dx_ref[:] = dx

    @pl.when(ni == 0)
    def _init():
        db_ref[:] = db
        dwblk_ref[:] = dwblk
        dphase_ref[:] = dphase
        dzn_ref[:] = dzn
        dinvls2_ref[:] = dinvls2

    @pl.when(ni > 0)
    def _accum():
        db_ref[:] += db
        dwblk_ref[:] += dwblk
        dphase_ref[:] += dphase
        dzn_ref[:] += dzn
        dinvls2_ref[:] += dinvls2


def wide_unpack_cotangents(db, dwblk, dphase_w, dzn_w, dinvls2_xn,
                           z, lengthscales, variance, weights, nu, s, sp, mp):
    """Chain packed wide cotangents back to the original parameter layout
    (small-tensor XLA; discards structural-pad entries)."""
    m, din = z.shape
    d = nu.shape[0]
    inv_ls2 = 1.0 / lengthscales ** 2                            # (D, Din)
    idx = jnp.arange(d)

    db_rff = db[:, :d * sp].reshape(din, d, sp)[:, :, :s]        # (Din, D, S)
    domega = jnp.moveaxis(db_rff, 1, 2)                          # (Din, S, D)
    db_g = db[:, d * sp:].reshape(din, d, mp)[:, :, :m]          # (Din, D, M)
    dz = jnp.einsum("kdm,dk->mk", db_g, inv_ls2, precision=HI)
    dinvls2 = jnp.einsum("kdm,mk->dk", db_g, z, precision=HI)

    dwsc = dwblk[:d * sp].reshape(d, sp, d)[idx, :, idx][:, :s]  # (D, S)
    scale = jnp.sqrt(2.0 * variance / s)
    dweights = dwsc.T * scale[None, :]                           # (S, D)
    dscale = jnp.sum(dwsc.T * weights, axis=0)                   # (D,)
    dvar = dscale * scale / (2.0 * variance)
    dnv = dwblk[d * sp:].reshape(d, mp, d)[idx, :, idx][:, :m]   # (D, M)
    dnu = dnv * variance[:, None]
    dvar = dvar + jnp.sum(dnv * nu, axis=1)

    dphase = jnp.moveaxis(dphase_w.reshape(d, sp)[:, :s][:, None, :], 0, 2)
    # zn chains: zn[d, m] = sum_k z[m,k]^2 inv_ls2[d,k]
    dzn = dzn_w.reshape(d, mp)[:, :m]                            # (D, M)
    dz = dz + 2.0 * z * jnp.einsum("dm,dk->mk", dzn, inv_ls2, precision=HI)
    dinvls2 = dinvls2 + jnp.einsum("dm,mk->dk", dzn, z * z, precision=HI)
    dinvls2 = dinvls2 + dinvls2_xn.T                             # xn chain
    dls = -2.0 * dinvls2 / lengthscales ** 3
    return dz, dls, dvar, domega, dphase, dweights, dnu


def fused_rhs_wide_bwd(x, z, lengthscales, variance, omega, phase, weights,
                       nu, g, tile_n=256, interpret=False):
    n, din = x.shape
    d = nu.shape[0]
    s = weights.shape[0]
    b, phase_w, zn_w, invls2_t, wblk, sp, mp = wide_pack(
        z, lengthscales, variance, omega, phase, weights, nu, s)
    w = b.shape[1]
    x_p = _pad_rows(x, tile_n)
    g_p = _pad_rows(g.astype(jnp.float32), tile_n)
    n_pad = x_p.shape[0]
    outs = pl.pallas_call(
        functools.partial(_wide_rhs_bwd_kernel, d, sp, mp),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((din, w)), _full_spec((1, d * sp)),
            _full_spec((1, d * mp)), _full_spec((din, d)),
            _full_spec((w, d)),
            pl.BlockSpec((tile_n, d), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((din, w)), _full_spec((w, d)),
            _full_spec((1, d * sp)), _full_spec((1, d * mp)),
            _full_spec((din, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, din), jnp.float32),
            jax.ShapeDtypeStruct((din, w), jnp.float32),
            jax.ShapeDtypeStruct((w, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d * sp), jnp.float32),
            jax.ShapeDtypeStruct((1, d * mp), jnp.float32),
            jax.ShapeDtypeStruct((din, d), jnp.float32),
        ],
        interpret=interpret,
    )(x_p, b, phase_w, zn_w, invls2_t, wblk, g_p)
    dx, db, dwblk, dphase_w, dzn_w, dinvls2_xn = outs
    dz, dls, dvar, domega, dphase, dw, dnu = wide_unpack_cotangents(
        db, dwblk, dphase_w, dzn_w, dinvls2_xn, z, lengthscales, variance,
        weights, nu, s, sp, mp)
    return dx[:n], dz, dls, dvar, domega, dphase, dw, dnu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2995)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    cli = ap.parse_args()
    if cli.interpret:
        jax.config.update("jax_platforms", "cpu")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    n, din, d, m, s = cli.rows, cli.d, cli.d, cli.m, cli.s
    x = jax.random.normal(ks[0], (n, din))
    z = jax.random.normal(ks[1], (m, din))
    ls = 1.0 + jax.random.uniform(ks[2], (d, din))
    var = 0.5 + jax.random.uniform(ks[3], (d,))
    omega = jax.random.normal(ks[4], (din, s, d))
    phase = jax.random.uniform(ks[5], (1, s, d)) * 6.28
    wts = jax.random.normal(ks[6], (s, d))
    nu = jax.random.normal(ks[7], (d, m))
    args = (x, z, ls, var, omega, phase, wts, nu)

    ref = _rhs_reference_jnp(*args)
    wide = fused_rhs_wide(*args, interpret=cli.interpret)
    err = float(jnp.max(jnp.abs(wide - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"wide vs jnp reference: max rel err {err:.3e}")

    g = jax.random.normal(jax.random.PRNGKey(42), (n, d))
    _, vjp_fn = jax.vjp(_rhs_reference_jnp, *args)
    cots_ref = vjp_fn(g)
    cots_wide = fused_rhs_wide_bwd(*args, g, interpret=cli.interpret)
    names = ["dx", "dz", "dls", "dvar", "domega", "dphase", "dw", "dnu"]
    for nm, a, bb in zip(names, cots_wide, cots_ref):
        e = float(jnp.max(jnp.abs(a - bb)) / (jnp.max(jnp.abs(bb)) + 1e-9))
        flag = "" if e < 3e-5 else "  <-- MISMATCH"
        print(f"  bwd {nm}: max rel err {e:.3e}{flag}")
    if cli.interpret:
        return

    cur = fused_rhs(*args)
    err2 = float(jnp.max(jnp.abs(cur - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"current vs jnp reference: max rel err {err2:.3e}")

    CHAIN = 100

    def bench(fn, name):
        # chain CHAIN data-dependent evals inside ONE jitted scan: measures
        # pure kernel latency like the solver stage chain, no dispatch noise
        @jax.jit
        def run(x0):
            def body(xc, _):
                out = fn(xc, *args[1:])
                return out[:, :xc.shape[1]] * 1e-3 + xc, None
            xf, _ = jax.lax.scan(body, x0, None, length=CHAIN)
            return xf
        r = run(x); float(r[0, 0])  # compile+sync
        t0 = time.perf_counter()
        for _ in range(5):
            r = run(x)
        float(r[0, 0])
        dt = (time.perf_counter() - t0) / (5 * CHAIN)
        print(f"{name}: {dt * 1e6:.1f} us/eval (chained)")
        return dt

    t_cur = bench(lambda *a: fused_rhs(*a), "current per-dim kernel")
    t_wide = bench(lambda *a: fused_rhs_wide(*a), "wide kernel")
    wide2 = fused_rhs_wide2(*args)
    e3 = float(jnp.max(jnp.abs(wide2 - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"wide2 vs jnp reference: max rel err {e3:.3e}")
    t_wide2 = bench(lambda *a: fused_rhs_wide2(*a), "wide2 kernel (VPU reduce)")
    t_xla = bench(lambda *a: _rhs_reference_jnp(*a), "XLA path")
    print(f"fwd speedup wide vs current: {t_cur / t_wide:.2f}x; "
          f"vs XLA: {t_xla / t_wide:.2f}x")

    from gpode_tpu.ops.pallas_kernels import _fused_rhs_bwd_pallas

    CHAINB = 50

    def bench1(fn, name):
        @jax.jit
        def run(g0):
            def body(gc, _):
                outs = fn(*args, gc)
                return outs[0] * 1e-3 + gc, None
            gf, _ = jax.lax.scan(body, g0, None, length=CHAINB)
            return gf
        r = run(g); float(r[0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            r = run(g)
        float(r[0, 0])
        dt = (time.perf_counter() - t0) / (5 * CHAINB)
        print(f"{name}: {dt * 1e6:.1f} us/eval (chained)")
        return dt

    tb_cur = bench1(lambda *a: _fused_rhs_bwd_pallas(
        *a, tile_n=512, interpret=False), "current bwd kernel")
    tb_wide = bench1(lambda *a: fused_rhs_wide_bwd(*a), "wide bwd kernel")
    print(f"bwd speedup wide vs current: {tb_cur / tb_wide:.2f}x")


if __name__ == "__main__":
    main()
