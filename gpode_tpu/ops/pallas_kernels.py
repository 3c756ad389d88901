"""Pallas TPU kernels for the hot GPODE ops.

Two kernels, both built around the observation that GPODE's input dimension
is tiny (Din = 2..10) while the segment batch is large (N = thousands):

  * :func:`rbf_gram_pallas` — fused dimwise RBF Gram assembly K (D, N, M):
    the scaled squared distance accumulates as Din broadcasted outer
    differences on the VPU (no MXU needed at Din ~ 5 — a matmul would waste
    the systolic array on a contraction dim of 5) with the exp/variance
    epilogue fused in, so no intermediate squared-distance tensor touches HBM.

  * :func:`fused_rhs` — the ENTIRE decoupled-sampling ODE right-hand side
    f(x) = cos(x Omega + phase) * scale @ w  +  nu^T K(Z, x)
    in one kernel: the (TN, S) feature tile and the (TN, M) Gram tile live
    only in VMEM; HBM sees just x in and f out (N*D floats instead of the
    XLA path's (N,S,D) features + (D,M,N) Gram round trips — the dominant
    HBM traffic of the reference's hot loop, `dsvgp.py:124-197`).

Layout: grid over N tiles only; the tiny D axis is a static loop inside the
kernel (keeps every BlockSpec's trailing dims either 8/128-aligned or equal
to the full array — the Mosaic lowering requirement — and loads x once per
tile for all output dims). Small parameter tensors (Z, inv-lengthscales,
omega, phases, weights, nu) replicate into VMEM whole.

All kernels expose custom VJPs whose backward is ALSO a fused kernel
(`_rhs_vjp_tile` recomputes phi/gram in VMEM and emits all eight cotangents
per tile), so forward and backward both stay off HBM; `_rhs_reference_jnp`
remains as the test oracle only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 512

# Test seam: force every kernel below into pallas interpret mode regardless
# of the per-call flag, and (through the gp/flow gates, which consult
# `force_interpret_active`) let the fused paths engage off-TPU. This is how
# the CPU test suite exercises the FLOW-LEVEL megakernel branches — the
# dopri5 attempt cond + checkpointed reject fallback, the rk4 segment path —
# not just the kernels in isolation.
#
# Like `gp.set_pallas_rhs`, this is read at TRACE time. The setter drops the
# jit caches on a change, so already-jitted closures retrace through the new
# path on their next call — no stale-executable footgun (pinned by
# tests/test_pallas.py::test_toggles_invalidate_jit_caches).
_FORCE_INTERPRET = False


def set_force_interpret(enabled: bool):
    global _FORCE_INTERPRET
    if bool(enabled) != _FORCE_INTERPRET:
        _FORCE_INTERPRET = bool(enabled)
        jax.clear_caches()


def force_interpret_active() -> bool:
    return _FORCE_INTERPRET


# Backward-tile formulation seam. "auto" = the VPU loop form everywhere:
# the round-5 MXU matmul reformulation of the per-input-dim cotangent band
# (two MXU dots + rank-1 reductions instead of Din (TN, M) difference
# arrays) was MEASURED AND REJECTED — same-process alternating A/B
# (scripts/diag_bwd_formulation.py): mxu/loop = 1.049 at the official shape
# (M=100, S=256, 2970 rows), 0.966 (noise-class) at M=256/2970, 1.167 at
# the scale shape (M=256, 19008 rows); it also VMEM-OOMs the rk4 megakernel
# backward at tiny shapes (M=8/Din=3: Mosaic pads every dot operand to full
# MXU tiles, 16.47 MiB stack). The loop form IS the VPU-bound floor
# (PROFILE.md round 5). The "mxu" path stays behind this seam as the
# reproducible rejection evidence; changing the seam drops the jit caches.
_BWD_FORMULATION = "auto"


def set_bwd_formulation(mode: str):
    global _BWD_FORMULATION
    if mode not in ("auto", "loop", "mxu"):
        raise ValueError(f"bwd formulation must be auto|loop|mxu, got {mode}")
    if mode != _BWD_FORMULATION:
        _BWD_FORMULATION = mode
        jax.clear_caches()


def _use_mxu_bwd(m: int, s: int) -> bool:
    del m, s  # auto = loop at every shape (measured; see seam comment)
    return _BWD_FORMULATION == "mxu"

# Scoped-VMEM budgets for auto tile sizing (the hardware limit is 16 MiB;
# the estimates below run ~1.4x the compiler's actual stack allocation, so a
# 16 MiB estimate budget usually lands well under the hardware limit).
# The standalone fused_rhs kernels get a tighter 14 MiB budget: they are what
# `cfg.remat` wraps in `jax.checkpoint`, and under a checkpoint region XLA
# may pin a kernel's big operands in VMEM on top of its stack — measured
# 16.33 MiB actual for the fused_rhs backward at tile 512 (M=100, S=256,
# D=5, 19456 rows, remat), 2% over the hard limit. The megakernels carry
# their own in-kernel rematerialization (custom VJP) and never sit inside a
# checkpoint region, so they keep the full budget — tightening them too was
# measured to halve the scale config's backward tile (44.8 -> 39.9 steps/s).
_VMEM_BUDGET_BYTES = 16 << 20
_VMEM_BUDGET_REMAT_BYTES = 14 << 20


def _auto_tile(requested: int, n: int, est_floats_per_row: int,
               budget: int = _VMEM_BUDGET_BYTES) -> int:
    """Largest power-of-two tile whose estimated VMEM stack fits the budget.

    `est_floats_per_row`: per-tile-row f32 temporaries the kernel holds live
    (the Mosaic unroll over the D output dims does not share buffers, so the
    count scales with D). Calibrated against compiler failures: the scale
    config's backward (D=5, S=256, M=256) allocated 17.03 MiB at tile 512."""
    tile = min(requested, max(8, n))
    tile -= tile % 8          # Mosaic: second-to-minor block dim 8-aligned
    while tile > 8 and est_floats_per_row * tile * 4 > budget:
        tile //= 2
        tile -= tile % 8
    return max(tile, 8)


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _full_spec(shape):
    """Whole-array VMEM block, replicated to every program."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda ni: (0,) * nd, memory_space=pltpu.VMEM)


def _sqdist_tile(x, z, inv_ls_row):
    """(TN, M) scaled squared distances via Din outer differences (VPU)."""
    din = x.shape[1]
    acc = jnp.zeros((x.shape[0], z.shape[0]), dtype=jnp.float32)
    for k in range(din):
        xk = (x[:, k] * inv_ls_row[k])[:, None]
        zk = (z[:, k] * inv_ls_row[k])[None, :]
        diff = xk - zk
        acc = acc + diff * diff
    return acc


# ---------------------------------------------------------------------------
# Fused dimwise RBF Gram: K[d] = var[d] * exp(-0.5 * ||x/ls_d - z/ls_d||^2)
# ---------------------------------------------------------------------------

def _rbf_gram_kernel(x_ref, z_ref, inv_ls_ref, var_ref, out_ref):
    """One n-tile program: out (D, TN, M) for all output dims."""
    d_out = inv_ls_ref.shape[0]
    x = x_ref[:]                       # (TN, Din)
    z = z_ref[:]                       # (M, Din)
    for d in range(d_out):             # static tiny loop over output dims
        acc = _sqdist_tile(x, z, inv_ls_ref[d])
        out_ref[d] = var_ref[d, 0] * jnp.exp(-0.5 * acc)


def rbf_gram_pallas(x: jax.Array, z: jax.Array, lengthscales: jax.Array,
                    variance: jax.Array, *, tile_n: int = DEFAULT_TILE_N,
                    interpret: bool = False) -> jax.Array:
    """Dimwise Gram K (D, N, M) for x (N, Din), z (M, Din), ls (D, Din), var (D,)."""
    n, din = x.shape
    m = z.shape[0]
    d = lengthscales.shape[0]
    tile_n = _auto_tile(tile_n, n, d * 2 * m)  # sqdist acc + exp epilogue
    x_p = _pad_rows(x, tile_n)
    n_pad = x_p.shape[0]
    inv_ls = (1.0 / lengthscales).astype(jnp.float32)          # (D, Din)
    var2d = variance.reshape(d, 1).astype(jnp.float32)         # (D, 1)

    out = pl.pallas_call(
        _rbf_gram_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((m, din)),
            _full_spec((d, din)),
            pl.BlockSpec((d, 1), lambda ni: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((d, tile_n, m), lambda ni: (0, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, n_pad, m), jnp.float32),
        interpret=interpret or _FORCE_INTERPRET,
    )(x_p, z, inv_ls, var2d)
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# Fused decoupled-sampling rhs: f = rff_prior(x) + nu^T K(Z, x)
# ---------------------------------------------------------------------------

def _rhs_tile(x, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref, nu_ref):
    """rhs of one n-tile as VALUES: x (TN, Din) -> f (TN, D).

    Shared by the single-eval kernel and the rk4 segment megakernel. VMEM
    residents per output dim: phi (TN, S), gram (TN, M) — never in HBM.
    """
    d_out = inv_ls_ref.shape[0]
    s = omega_ref.shape[2]
    cols = []
    for d in range(d_out):                         # static tiny loop
        # RFF prior sample: cos(x @ omega_d + phase_d) * scale @ w_d.
        # The final contractions have output-dim 1; Mosaic can't lower such
        # matvecs (non-constant accumulator), so they run as VPU
        # multiply-reduce along lanes instead of MXU dots.
        xo = jnp.dot(x, omega_ref[d], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        scale = jnp.sqrt(2.0 * var_ref[d, 0] / s)
        phi = jnp.cos(xo + phase_ref[d]) * scale              # (TN, S)
        f_prior = jnp.sum(phi * w_ref[d], axis=1, keepdims=True)  # (TN, 1)

        # pathwise update: K_d(x, Z) @ nu_d
        gram = var_ref[d, 0] * jnp.exp(-0.5 * _sqdist_tile(x, z, inv_ls_ref[d]))
        f_update = jnp.sum(gram * nu_ref[d], axis=1, keepdims=True)  # (TN, 1)
        cols.append(f_prior + f_update)
    return jnp.concatenate(cols, axis=1)           # (TN, D)


def _fused_rhs_kernel(x_ref, z_ref, inv_ls_ref, var_ref, omega_ref, phase_ref,
                      w_ref, nu_ref, out_ref):
    """One n-tile program -> out (TN, D)."""
    out_ref[:] = _rhs_tile(x_ref[:], z_ref[:], inv_ls_ref, var_ref, omega_ref,
                           phase_ref, w_ref, nu_ref)


def _fused_rhs_forward(x, z, lengthscales, variance, omega, phase, weights, nu,
                       *, tile_n: int, interpret: bool) -> jax.Array:
    n, din = x.shape
    m = z.shape[0]
    d = nu.shape[0]
    s = weights.shape[0]
    tile_n = _auto_tile(tile_n, n, d * (3 * s + 2 * m),  # xo/phi/dphi + gram
                        budget=_VMEM_BUDGET_REMAT_BYTES)
    x_p = _pad_rows(x, tile_n)
    n_pad = x_p.shape[0]

    inv_ls = (1.0 / lengthscales).astype(jnp.float32)       # (D, Din)
    var2d = variance.reshape(d, 1).astype(jnp.float32)
    omega_t = jnp.moveaxis(omega, -1, 0)                    # (D, Din, S)
    phase_t = jnp.moveaxis(phase, -1, 0)                    # (D, 1, S)
    w_t = weights.T[:, None, :]                             # (D, 1, S)
    nu_t = nu[:, None, :]                                   # (D, 1, M)

    out = pl.pallas_call(
        _fused_rhs_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((m, din)),
            _full_spec((d, din)),
            pl.BlockSpec((d, 1), lambda ni: (0, 0), memory_space=pltpu.SMEM),
            _full_spec((d, din, s)),
            _full_spec((d, 1, s)),
            _full_spec((d, 1, s)),
            _full_spec((d, 1, m)),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda ni: (ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret or _FORCE_INTERPRET,
    )(x_p, z, inv_ls, var2d, omega_t, phase_t, w_t, nu_t)
    return out[:n]                                           # (N, D)


def _rhs_vjp_tile(x, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref,
                  nu_ref, g):
    """VJP of :func:`_rhs_tile` as VALUES: cotangent g (TN, D) -> (dx, params).

    Recomputes the forward intermediates (phi, gram) in VMEM and produces all
    eight cotangents as tile-local values: (dx (TN, Din), (dz, dls, dvar,
    domega, dphase, dw, dnu)). Matvec-shaped contractions run as VPU
    multiply-reduces (Mosaic cannot lower output-dim-1 MXU dots). Shared by
    the single-eval backward kernel and the rk4 segment megakernel backward.
    """
    d_out = inv_ls_ref.shape[0]
    din = x.shape[1]
    s = omega_ref.shape[2]
    use_mxu = _use_mxu_bwd(z.shape[0], s)

    dx_cols = []          # [d] -> (TN, Din)
    dz_cols = []          # [d][k] -> (M,)
    dls_rows = []         # [d] -> (Din,) scalars list
    dvar_rows = []        # [d] -> scalar
    domega_rows = []      # [d] -> (Din, S)
    dphase_rows = []      # [d] -> (1, S)
    dw_rows = []          # [d] -> (1, S)
    dnu_rows = []         # [d] -> (1, M)
    for d in range(d_out):                          # static tiny loop
        g_d = g[:, d:d + 1]                         # (TN, 1)
        var_d = var_ref[d, 0]
        scale = jnp.sqrt(2.0 * var_d / s)

        # ---- RFF prior part ----
        xo = jnp.dot(x, omega_ref[d], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) + phase_ref[d]
        cos_xo = jnp.cos(xo)                        # (TN, S)
        phi = cos_xo * scale
        dphi = g_d * w_ref[d]                       # (TN, S)
        dxo = -jnp.sin(xo) * scale * dphi           # (TN, S)

        dw_rows.append(jnp.sum(phi * g_d, axis=0, keepdims=True))    # (1, S)
        dphase_rows.append(jnp.sum(dxo, axis=0, keepdims=True))      # (1, S)
        # dvar via scale: d scale / d var = scale / (2 var)
        dvar_d = jnp.sum(cos_xo * dphi) * scale / (2.0 * var_d)

        # ---- Gram / pathwise-update part ----
        sq = _sqdist_tile(x, z, inv_ls_ref[d])
        gram = var_d * jnp.exp(-0.5 * sq)           # (TN, M)
        dgram = g_d * nu_ref[d]                     # (TN, M)
        dnu_rows.append(jnp.sum(gram * g_d, axis=0, keepdims=True))  # (1, M)
        dvar_rows.append(dvar_d + jnp.sum(dgram * gram) / var_d)
        dsq = -0.5 * gram * dgram                   # (TN, M)

        if use_mxu:
            # ---- per-input-dim chains, MXU matmul form (round 5) ----
            # The loop form below materializes Din pairs of (TN, M) arrays
            # (diff = x_k - z_k and dsq * diff) plus three reductions each —
            # the backward's M-proportional VPU band (PROFILE.md round-4:
            # the only double-digit kernel-vs-floor gap). Expanding the
            # square,
            #   sum_{t,m} dsq (x_tk - z_mk)   = x_k . rowsum - (dsq @ z)_k
            #   sum_{t,m} dsq (x_tk - z_mk)^2 = x_k^2 . rowsum
            #                                   - 2 x_k . (dsq @ z)_k
            #                                   + z_k^2 . colsum
            # turns the band into TWO MXU matmuls (dsq @ z, dsq^T @ x) +
            # rank-1 reductions; same for the RFF chain (dxo @ omega^T,
            # x^T @ dxo). Gradients agree with the loop form to f32
            # reduction order (tests/test_pallas.py grad-parity cases run
            # both formulations).
            inv_sq = (inv_ls_ref[d] * inv_ls_ref[d])[None, :]       # (1, Din)
            rowsum = jnp.sum(dsq, axis=1, keepdims=True)            # (TN, 1)
            colsum = jnp.sum(dsq, axis=0, keepdims=True)            # (1, M)
            hi = jax.lax.Precision.HIGHEST
            dsq_z = jnp.dot(dsq, z, preferred_element_type=jnp.float32,
                            precision=hi)                           # (TN, Din)
            dsqT_x = jnp.dot(dsq.T, x, preferred_element_type=jnp.float32,
                             precision=hi)                          # (M, Din)
            dx_rff = jnp.dot(dxo, omega_ref[d].T,
                             preferred_element_type=jnp.float32,
                             precision=hi)                          # (TN, Din)
            domega_rows.append(jnp.dot(x.T, dxo,
                                       preferred_element_type=jnp.float32,
                                       precision=hi))
            dx_gram = 2.0 * inv_sq * (x * rowsum - dsq_z)           # (TN, Din)
            dz_d = -2.0 * inv_sq * (dsqT_x - z * colsum.T)          # (M, Din)
            # dls_k = -2 inv^3 sum dsq (x_k - z_k)^2
            sq_sum = (jnp.sum(x * x * rowsum, axis=0)
                      - 2.0 * jnp.sum(x * dsq_z, axis=0)
                      + jnp.sum(z * z * colsum.T, axis=0))          # (Din,)
            dls_rows.append(-2.0 * inv_ls_ref[d] ** 3 * sq_sum)
            dx_cols.append(dx_rff + dx_gram)
            dz_cols.append(dz_d)
        else:
            # ---- per-input-dim chains, VPU loop form (small shapes:
            # Mosaic pads tiny dot operands to full MXU tiles, which VMEM-
            # OOMs the megakernel backward at M=8-class shapes) ----
            dx_parts, dz_parts, dls_parts, domega_parts = [], [], [], []
            for k in range(din):
                inv = inv_ls_ref[d, k]
                # RFF chain: dxo @ omega[k]^T and x[:,k]^T @ dxo
                dx_rff = jnp.sum(dxo * omega_ref[d, k][None, :], axis=1,
                                 keepdims=True)                      # (TN, 1)
                domega_parts.append(jnp.sum(x[:, k:k + 1] * dxo,
                                            axis=0))                 # (S,)
                # Gram chain: d sq / d x_k = 2 (x_k - z_k) inv^2
                diff = x[:, k:k + 1] - z[:, k][None, :]              # (TN, M)
                w_sq = dsq * diff                                    # (TN, M)
                dx_gram = 2.0 * inv * inv * jnp.sum(w_sq, axis=1,
                                                    keepdims=True)   # (TN, 1)
                dz_parts.append(-2.0 * inv * inv * jnp.sum(w_sq, axis=0))
                # d sq / d ls_k = -2 (x_k - z_k)^2 / ls^3
                dls_parts.append(-2.0 * inv ** 3 * jnp.sum(w_sq * diff))
                dx_parts.append(dx_rff + dx_gram)
            dx_cols.append(jnp.concatenate(dx_parts, axis=1))        # (TN, Din)
            dz_cols.append(jnp.stack(dz_parts, axis=1))              # (M, Din)
            dls_rows.append(jnp.stack(dls_parts))                    # (Din,)
            domega_rows.append(jnp.stack(domega_parts, axis=0))      # (Din, S)

    # assemble whole-block tile contributions
    dx_tile = sum(dx_cols)                                            # (TN, Din)
    dz_tile = sum(dz_cols)                                            # (M, Din)
    dls_tile = jnp.stack(dls_rows, axis=0)                            # (D, Din)
    dvar_tile = jnp.array(dvar_rows, dtype=jnp.float32).reshape(d_out, 1)
    domega_tile = jnp.stack(domega_rows, axis=0)                      # (D, Din, S)
    dphase_tile = jnp.stack(dphase_rows, axis=0)                      # (D, 1, S)
    dw_tile = jnp.stack(dw_rows, axis=0)                              # (D, 1, S)
    dnu_tile = jnp.stack(dnu_rows, axis=0)                            # (D, 1, M)
    return dx_tile, (dz_tile, dls_tile, dvar_tile, domega_tile, dphase_tile,
                     dw_tile, dnu_tile)


def _add_param_cotangents(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _fused_rhs_bwd_kernel(x_ref, z_ref, inv_ls_ref, var_ref, omega_ref,
                          phase_ref, w_ref, nu_ref, g_ref,
                          dx_ref, dz_ref, dls_ref, dvar_ref, domega_ref,
                          dphase_ref, dw_ref, dnu_ref):
    """Fused VJP of the rhs: one n-tile program.

    dx is tile-indexed; the parameter cotangents use constant-index output
    blocks accumulated across the (sequential) TPU grid with an
    init-on-first-step pattern.
    """
    ni = pl.program_id(0)
    dx_tile, params = _rhs_vjp_tile(x_ref[:], z_ref[:], inv_ls_ref, var_ref,
                                    omega_ref, phase_ref, w_ref, nu_ref,
                                    g_ref[:])
    dz_tile, dls_tile, dvar_tile, domega_tile, dphase_tile, dw_tile, \
        dnu_tile = params

    dx_ref[:] = dx_tile

    @pl.when(ni == 0)
    def _init():
        dz_ref[:] = dz_tile
        dls_ref[:] = dls_tile
        dvar_ref[:] = dvar_tile
        domega_ref[:] = domega_tile
        dphase_ref[:] = dphase_tile
        dw_ref[:] = dw_tile
        dnu_ref[:] = dnu_tile

    @pl.when(ni > 0)
    def _accum():
        dz_ref[:] += dz_tile
        dls_ref[:] += dls_tile
        dvar_ref[:] += dvar_tile
        domega_ref[:] += domega_tile
        dphase_ref[:] += dphase_tile
        dw_ref[:] += dw_tile
        dnu_ref[:] += dnu_tile


def _fused_rhs_bwd_pallas(x, z, lengthscales, variance, omega, phase, weights,
                          nu, g, *, tile_n: int, interpret: bool):
    """Run the fused backward kernel; returns cotangents in the forward's
    argument layout."""
    n, din = x.shape
    m = z.shape[0]
    d = nu.shape[0]
    s = weights.shape[0]
    tile_n = _auto_tile(tile_n, n, d * (4 * s + 5 * m),  # xo/cos/dphi/dxo
                        budget=_VMEM_BUDGET_REMAT_BYTES)
    x_p = _pad_rows(x, tile_n)
    g_p = _pad_rows(g.astype(jnp.float32), tile_n)  # zero rows -> zero cotangents
    n_pad = x_p.shape[0]

    inv_ls = (1.0 / lengthscales).astype(jnp.float32)
    var2d = variance.reshape(d, 1).astype(jnp.float32)
    omega_t = jnp.moveaxis(omega, -1, 0)            # (D, Din, S)
    phase_t = jnp.moveaxis(phase, -1, 0)            # (D, 1, S)
    w_t = weights.T[:, None, :]                     # (D, 1, S)
    nu_t = nu[:, None, :]                           # (D, 1, M)

    const = _full_spec
    outs = pl.pallas_call(
        _fused_rhs_bwd_kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            const((m, din)), const((d, din)),
            pl.BlockSpec((d, 1), lambda ni: (0, 0), memory_space=pltpu.SMEM),
            const((d, din, s)), const((d, 1, s)), const((d, 1, s)),
            const((d, 1, m)),
            pl.BlockSpec((tile_n, d), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),             # dx
            const((m, din)),                                   # dz
            const((d, din)),                                   # dls
            const((d, 1)),                                     # dvar
            const((d, din, s)),                                # domega
            const((d, 1, s)),                                  # dphase
            const((d, 1, s)),                                  # dweights
            const((d, 1, m)),                                  # dnu
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, din), jnp.float32),
            jax.ShapeDtypeStruct((m, din), jnp.float32),
            jax.ShapeDtypeStruct((d, din), jnp.float32),
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, din, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, m), jnp.float32),
        ],
        interpret=interpret or _FORCE_INTERPRET,
    )(x_p, z, inv_ls, var2d, omega_t, phase_t, w_t, nu_t, g_p)
    dx, dz, dls, dvar, domega_t, dphase_t, dw_t, dnu_t = outs
    return (dx[:n], dz, dls, dvar.reshape(variance.shape),
            jnp.moveaxis(domega_t, 0, -1), jnp.moveaxis(dphase_t, 0, -1),
            dw_t[:, 0, :].T, dnu_t[:, 0, :])


def _rhs_reference_jnp(x, z, lengthscales, variance, omega, phase, weights, nu):
    """jnp reference implementation (mirrors models/gp rff_eval + eval_draw for
    the dimwise case); used for the custom-VJP backward recompute."""
    s = weights.shape[0]
    xo = jnp.einsum("nd,dfk->nfk", x, omega,
                    precision=jax.lax.Precision.HIGHEST)
    phi = jnp.cos(xo + phase) * jnp.sqrt(2.0 * variance / s)
    f_prior = jnp.einsum("nfk,fk->nk", phi, weights,
                         precision=jax.lax.Precision.HIGHEST)

    xd = x[None, :, :] / lengthscales[:, None, :]
    zd = z[None, :, :] / lengthscales[:, None, :]
    sq = (jnp.sum(xd * xd, -1)[:, :, None] + jnp.sum(zd * zd, -1)[:, None, :]
          - 2.0 * jnp.einsum("dnk,dmk->dnm", xd, zd,
                             precision=jax.lax.Precision.HIGHEST))
    gram = variance[:, None, None] * jnp.exp(-0.5 * sq)      # (D, N, M)
    f_update = jnp.einsum("dm,dnm->nd", nu, gram,
                          precision=jax.lax.Precision.HIGHEST)
    return f_prior + f_update


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_rhs(x, z, lengthscales, variance, omega, phase, weights, nu,
              tile_n: int = DEFAULT_TILE_N, interpret: bool = False):
    """Fused dimwise ODE right-hand side: (N, Din) -> (N, D).

    Constrained parameters enter CONSTRAINED (lengthscales/variance, not raw).
    Differentiable: forward AND backward run fused Pallas kernels (the VJP
    recomputes phi/gram in VMEM; see `_fused_rhs_bwd_kernel`).
    """
    return _fused_rhs_forward(x, z, lengthscales, variance, omega, phase,
                              weights, nu, tile_n=tile_n, interpret=interpret)


def _fused_rhs_fwd(x, z, lengthscales, variance, omega, phase, weights, nu,
                   tile_n, interpret):
    # (custom_vjp passes nondiff args in-position to fwd, but first to bwd.)
    out = _fused_rhs_forward(x, z, lengthscales, variance, omega, phase,
                             weights, nu, tile_n=tile_n, interpret=interpret)
    return out, (x, z, lengthscales, variance, omega, phase, weights, nu)


def _fused_rhs_bwd(tile_n, interpret, residuals, g):
    return _fused_rhs_bwd_pallas(*residuals, g, tile_n=tile_n,
                                 interpret=interpret)


fused_rhs.defvjp(_fused_rhs_fwd, _fused_rhs_bwd)


# ---------------------------------------------------------------------------
# RK4 shooting-segment megakernel: the WHOLE one-interval integration (all
# 4*substeps rhs stage evaluations and the RK combines) in one kernel, state
# tile VMEM-resident throughout — HBM sees x0 in and x(t1) out. The backward
# recomputes the stage chain in VMEM and reverse-propagates through it with
# the fused rhs VJP, so the custom VJP is also its own rematerialization
# (only x0 and the draw parameters are saved).
# ---------------------------------------------------------------------------

def _rk4_stages(x, dt, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref,
                nu_ref):
    """One rk4 step from x: returns (x_next, stage inputs (x1..x4))."""
    k1 = _rhs_tile(x, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref,
                   nu_ref)
    x2 = x + 0.5 * dt * k1
    k2 = _rhs_tile(x2, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref,
                   nu_ref)
    x3 = x + 0.5 * dt * k2
    k3 = _rhs_tile(x3, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref,
                   nu_ref)
    x4 = x + dt * k3
    k4 = _rhs_tile(x4, z, inv_ls_ref, var_ref, omega_ref, phase_ref, w_ref,
                   nu_ref)
    x_next = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return x_next, (x, x2, x3, x4)


def _fused_rk4_kernel(substeps, dt_ref, x_ref, z_ref, inv_ls_ref, var_ref,
                      omega_ref, phase_ref, w_ref, nu_ref, out_ref,
                      *maybe_xs_ref):
    """With a trailing xs_ref output it additionally saves all 4*substeps
    stage inputs (4*substeps, TN, Din) so the backward skips the whole-chain
    recompute (stage states are tiny: N*Din floats each)."""
    dt = dt_ref[0, 0] / substeps
    z = z_ref[:]
    x = x_ref[:]
    stage_inputs = []
    for _ in range(substeps):                       # static tiny unroll
        x, xs4 = _rk4_stages(x, dt, z, inv_ls_ref, var_ref, omega_ref,
                             phase_ref, w_ref, nu_ref)
        stage_inputs.extend(xs4)
    out_ref[:] = x
    if maybe_xs_ref:
        maybe_xs_ref[0][:] = jnp.stack(stage_inputs, axis=0)


def _fused_rk4_bwd_kernel(substeps, dt_ref, xs_ref, z_ref, inv_ls_ref, var_ref,
                          omega_ref, phase_ref, w_ref, nu_ref, g_ref,
                          dx_ref, dz_ref, dls_ref, dvar_ref, domega_ref,
                          dphase_ref, dw_ref, dnu_ref):
    """Reverse sweep of the whole segment in VMEM.

    The stage-input chain (4*substeps, TN, Din) was saved by the forward —
    no recompute (halves the phi/gram passes; gradients bit-identical). For
    each step in reverse applies the rk4 chain rule
        gk4 = dt/6 g;        gk3 = dt/3 g + dt gx4
        gk2 = dt/3 g + dt/2 gx3;  gk1 = dt/6 g + dt/2 gx2
        g  <- g + gx1 + gx2 + gx3 + gx4
    with (gx_i, params_i) from the fused rhs VJP at stage input x_i.
    """
    ni = pl.program_id(0)
    dt = dt_ref[0, 0] / substeps
    z = z_ref[:]

    stage_inputs = [tuple(xs_ref[4 * k + i] for i in range(4))
                    for k in range(substeps)]

    def vjp(xi, gi):
        return _rhs_vjp_tile(xi, z, inv_ls_ref, var_ref, omega_ref,
                             phase_ref, w_ref, nu_ref, gi)

    g = g_ref[:]
    acc = None
    for (x1, x2, x3, x4) in reversed(stage_inputs):
        gx4, p4 = vjp(x4, (dt / 6.0) * g)
        gx3, p3 = vjp(x3, (dt / 3.0) * g + dt * gx4)
        gx2, p2 = vjp(x2, (dt / 3.0) * g + 0.5 * dt * gx3)
        gx1, p1 = vjp(x1, (dt / 6.0) * g + 0.5 * dt * gx2)
        g = g + gx1 + gx2 + gx3 + gx4
        step_acc = _add_param_cotangents(
            _add_param_cotangents(p1, p2), _add_param_cotangents(p3, p4))
        acc = step_acc if acc is None else _add_param_cotangents(acc, step_acc)
    dz_tile, dls_tile, dvar_tile, domega_tile, dphase_tile, dw_tile, \
        dnu_tile = acc

    dx_ref[:] = g

    @pl.when(ni == 0)
    def _init():
        dz_ref[:] = dz_tile
        dls_ref[:] = dls_tile
        dvar_ref[:] = dvar_tile
        domega_ref[:] = domega_tile
        dphase_ref[:] = dphase_tile
        dw_ref[:] = dw_tile
        dnu_ref[:] = dnu_tile

    @pl.when(ni > 0)
    def _accum():
        dz_ref[:] += dz_tile
        dls_ref[:] += dls_tile
        dvar_ref[:] += dvar_tile
        domega_ref[:] += domega_tile
        dphase_ref[:] += dphase_tile
        dw_ref[:] += dw_tile
        dnu_ref[:] += dnu_tile


def _rk4_operand_layout(x, dt, z, lengthscales, variance, omega, phase,
                        weights, nu, tile_n, est_floats_per_row):
    n, din = x.shape
    d = nu.shape[0]
    tile_n = _auto_tile(tile_n, n, est_floats_per_row)
    x_p = _pad_rows(x, tile_n)
    dt2d = jnp.reshape(dt, (1, 1)).astype(jnp.float32)
    inv_ls = (1.0 / lengthscales).astype(jnp.float32)
    var2d = variance.reshape(d, 1).astype(jnp.float32)
    omega_t = jnp.moveaxis(omega, -1, 0)            # (D, Din, S)
    phase_t = jnp.moveaxis(phase, -1, 0)            # (D, 1, S)
    w_t = weights.T[:, None, :]                     # (D, 1, S)
    nu_t = nu[:, None, :]                           # (D, 1, M)
    return tile_n, x_p, dt2d, inv_ls, var2d, omega_t, phase_t, w_t, nu_t


def _rk4_in_specs(tile_n, din, m, d, s):
    return [
        pl.BlockSpec((1, 1), lambda ni: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                     memory_space=pltpu.VMEM),
        _full_spec((m, din)),
        _full_spec((d, din)),
        pl.BlockSpec((d, 1), lambda ni: (0, 0), memory_space=pltpu.SMEM),
        _full_spec((d, din, s)),
        _full_spec((d, 1, s)),
        _full_spec((d, 1, s)),
        _full_spec((d, 1, m)),
    ]


def _fused_rk4_forward(x, dt, z, lengthscales, variance, omega, phase,
                       weights, nu, substeps, tile_n, interpret,
                       save_stages=False):
    n, din = x.shape
    m = z.shape[0]
    d = nu.shape[0]
    s = weights.shape[0]
    tile_n, x_p, dt2d, inv_ls, var2d, omega_t, phase_t, w_t, nu_t = \
        _rk4_operand_layout(x, dt, z, lengthscales, variance, omega, phase,
                            weights, nu, tile_n, 2 * d * (3 * s + 2 * m))
    n_pad = x_p.shape[0]

    tile_spec = pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [tile_spec]
    out_shape = [jax.ShapeDtypeStruct((n_pad, din), jnp.float32)]
    if save_stages:
        ns = 4 * substeps
        out_specs.append(pl.BlockSpec((ns, tile_n, din), lambda ni: (0, ni, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ns, n_pad, din), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_fused_rk4_kernel, substeps),
        grid=(n_pad // tile_n,),
        in_specs=_rk4_in_specs(tile_n, din, m, d, s),
        out_specs=out_specs if save_stages else out_specs[0],
        out_shape=out_shape if save_stages else out_shape[0],
        interpret=interpret or _FORCE_INTERPRET,
    )(dt2d, x_p, z, inv_ls, var2d, omega_t, phase_t, w_t, nu_t)
    if save_stages:
        return outs[0][:n], outs[1][:, :n, :]
    return outs[:n]


def _fused_rk4_bwd_pallas(xs, dt, z, lengthscales, variance, omega, phase,
                          weights, nu, g, substeps, tile_n, interpret):
    n, din = xs.shape[1], xs.shape[2]
    m = z.shape[0]
    d = nu.shape[0]
    s = weights.shape[0]
    # The saved stage inputs remove the whole-chain recompute (less WORK);
    # Mosaic's live set still holds multiple stage-VJP working sets, so the
    # proven 3x calibration stays for tile sizing.
    tile_n, _, dt2d, inv_ls, var2d, omega_t, phase_t, w_t, nu_t = \
        _rk4_operand_layout(xs[0], dt, z, lengthscales, variance, omega,
                            phase, weights, nu, tile_n,
                            3 * d * (4 * s + 5 * m))
    pad = (-n) % tile_n
    xs_p = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    g_p = _pad_rows(g.astype(jnp.float32), tile_n)
    n_pad = n + pad

    const = _full_spec
    in_specs = _rk4_in_specs(tile_n, din, m, d, s)
    in_specs[1] = pl.BlockSpec((4 * substeps, tile_n, din),
                               lambda ni: (0, ni, 0),
                               memory_space=pltpu.VMEM)   # xs replaces x0
    outs = pl.pallas_call(
        functools.partial(_fused_rk4_bwd_kernel, substeps),
        grid=(n_pad // tile_n,),
        in_specs=in_specs + [
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),             # dx0
            const((m, din)), const((d, din)), const((d, 1)),
            const((d, din, s)), const((d, 1, s)), const((d, 1, s)),
            const((d, 1, m)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, din), jnp.float32),
            jax.ShapeDtypeStruct((m, din), jnp.float32),
            jax.ShapeDtypeStruct((d, din), jnp.float32),
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, din, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, m), jnp.float32),
        ],
        interpret=interpret or _FORCE_INTERPRET,
    )(dt2d, xs_p, z, inv_ls, var2d, omega_t, phase_t, w_t, nu_t, g_p)
    dx, dz, dls, dvar, domega_t, dphase_t, dw_t, dnu_t = outs
    return (dx[:n], dz, dls, dvar.reshape(variance.shape),
            jnp.moveaxis(domega_t, 0, -1), jnp.moveaxis(dphase_t, 0, -1),
            dw_t[:, 0, :].T, dnu_t[:, 0, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_rk4_segment(x0, dt, z, lengthscales, variance, omega, phase,
                      weights, nu, substeps: int = 1,
                      tile_n: int = DEFAULT_TILE_N, interpret: bool = False):
    """Integrate one shooting segment with `substeps` rk4 steps in ONE kernel.

    x0 (N, Din) -> x(t0 + dt) (N, D); the state tile and every stage
    intermediate stay in VMEM for the whole integration. `dt` is treated as
    non-differentiable (its cotangent is zero — observation grids are data);
    call sites should stop_gradient it. All other operands get exact fused
    cotangents via the in-kernel reverse sweep.
    """
    return _fused_rk4_forward(x0, dt, z, lengthscales, variance, omega, phase,
                              weights, nu, substeps, tile_n, interpret)


def _fused_rk4_fwd(x0, dt, z, lengthscales, variance, omega, phase, weights,
                   nu, substeps, tile_n, interpret):
    out, xs = _fused_rk4_forward(x0, dt, z, lengthscales, variance, omega,
                                 phase, weights, nu, substeps, tile_n,
                                 interpret, save_stages=True)
    return out, (xs, dt, z, lengthscales, variance, omega, phase, weights, nu)


def _fused_rk4_bwd(substeps, tile_n, interpret, residuals, g):
    (xs, dt, z, lengthscales, variance, omega, phase, weights, nu) = residuals
    dx0, dz, dls, dvar, domega, dphase, dw, dnu = _fused_rk4_bwd_pallas(
        xs, dt, z, lengthscales, variance, omega, phase, weights, nu, g,
        substeps, tile_n, interpret)
    return (dx0, jnp.zeros_like(dt), dz, dls, dvar, domega, dphase, dw, dnu)


fused_rk4_segment.defvjp(_fused_rk4_fwd, _fused_rk4_bwd)


# ---------------------------------------------------------------------------
# dopri5 single-attempt megakernel: one whole-span Dormand-Prince step (the
# `first_step=FIRST_STEP_SPAN` shooting-segment case) — f0 + six fresh stage
# evaluations + 5th-order combine + scaled embedded error, all in one kernel.
# The caller checks the global error norm and lax.cond-falls back to the
# bounded-scan solver on the (rare) reject, so results match the XLA path in
# both branches. The error output is non-differentiable by construction
# (the step-size controller is stop-gradient); the backward reverses only
# the 5th-order stage chain, in-kernel.
# ---------------------------------------------------------------------------

# Dormand-Prince tableau: the ONE copy lives in ops/ode.py — exact
# coefficient agreement is the megakernel/scan-path equivalence invariant
# (an accepted whole-span attempt must BE the scan's first accepted step).
from gpode_tpu.ops.ode import (_DP_A as _DP_A_K, _DP_B4 as _DP_B4_K,
                               _DP_B5 as _DP_B5_K)


def _dp_stage_inputs(x, dt, z, inv_ls_ref, var_ref, omega_ref, phase_ref,
                     w_ref, nu_ref):
    """Forward stage sweep: returns (x5, stage inputs x1..x6, ks k1..k7)."""
    def f(xx):
        return _rhs_tile(xx, z, inv_ls_ref, var_ref, omega_ref, phase_ref,
                         w_ref, nu_ref)

    ks = [f(x)]
    xs = [x]
    for i in range(1, 6):
        xi = x + dt * sum(a * k for a, k in zip(_DP_A_K[i], ks))
        xs.append(xi)
        ks.append(f(xi))
    x5 = x + dt * sum(b * k for b, k in zip(_DP_B5_K, ks) if b != 0.0)
    ks.append(f(x5))                                     # k7 = f(x5), err only
    return x5, xs, ks


def _fused_dp_attempt_kernel(rtol, atol, dt_ref, x_ref, z_ref, inv_ls_ref,
                             var_ref, omega_ref, phase_ref, w_ref, nu_ref,
                             x5_ref, err_ref, *maybe_xs_ref):
    """Forward attempt; with a trailing xs_ref output it additionally saves
    the six stage inputs (6, TN, Din) so the backward can skip the
    whole-chain recompute (stage states are tiny: N*Din floats each)."""
    dt = dt_ref[0, 0]
    z = z_ref[:]
    x = x_ref[:]
    x5, xs, ks = _dp_stage_inputs(x, dt, z, inv_ls_ref, var_ref, omega_ref,
                                  phase_ref, w_ref, nu_ref)
    err = dt * sum((b5 - b4) * k
                   for b5, b4, k in zip(_DP_B5_K, _DP_B4_K, ks))
    scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))
    x5_ref[:] = x5
    err_ref[:] = err / scale
    if maybe_xs_ref:
        maybe_xs_ref[0][:] = jnp.stack(xs, axis=0)      # (6, TN, Din)


def _fused_dp_attempt_bwd_kernel(rtol, atol, dt_ref, xs_ref, z_ref, inv_ls_ref,
                                 var_ref, omega_ref, phase_ref, w_ref, nu_ref,
                                 g_ref, dx_ref, dz_ref, dls_ref, dvar_ref,
                                 domega_ref, dphase_ref, dw_ref, dnu_ref):
    """Reverse the 5th-order chain: y5 = x + dt sum b_i k_i, k_i = f(x_i).

    gk_i = dt*b_i*gy + dt * sum_{l>i} a_{l,i} * gx_l, processed descending;
    the embedded-error output carries no cotangent (stop-gradient controller).
    Stage inputs xs (6, TN, Din) were saved by the forward — no whole-chain
    recompute here (halves the backward's phi/gram passes; gradients are
    bit-identical since the VJPs see the exact forward stage states).
    """
    ni = pl.program_id(0)
    dt = dt_ref[0, 0]
    z = z_ref[:]
    xs = [xs_ref[i] for i in range(6)]

    def vjp(xi, gi):
        return _rhs_vjp_tile(xi, z, inv_ls_ref, var_ref, omega_ref,
                             phase_ref, w_ref, nu_ref, gi)

    gy = g_ref[:]
    gk = [dt * b * gy for b in _DP_B5_K[:6]]             # k7 has b5 = 0
    gx_total = gy
    acc = None
    for i in range(5, -1, -1):                           # stages 6..1
        gxi, pi = vjp(xs[i], gk[i])
        gx_total = gx_total + gxi
        for j in range(i):
            a = _DP_A_K[i][j]
            if a != 0.0:
                gk[j] = gk[j] + dt * a * gxi
        acc = pi if acc is None else _add_param_cotangents(acc, pi)
    dz_tile, dls_tile, dvar_tile, domega_tile, dphase_tile, dw_tile, \
        dnu_tile = acc

    dx_ref[:] = gx_total

    @pl.when(ni == 0)
    def _init():
        dz_ref[:] = dz_tile
        dls_ref[:] = dls_tile
        dvar_ref[:] = dvar_tile
        domega_ref[:] = domega_tile
        dphase_ref[:] = dphase_tile
        dw_ref[:] = dw_tile
        dnu_ref[:] = dnu_tile

    @pl.when(ni > 0)
    def _accum():
        dz_ref[:] += dz_tile
        dls_ref[:] += dls_tile
        dvar_ref[:] += dvar_tile
        domega_ref[:] += domega_tile
        dphase_ref[:] += dphase_tile
        dw_ref[:] += dw_tile
        dnu_ref[:] += dnu_tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_dopri5_attempt(x0, dt, z, lengthscales, variance, omega, phase,
                         weights, nu, rtol: float = 1e-6, atol: float = 1e-6,
                         tile_n: int = DEFAULT_TILE_N,
                         interpret: bool = False):
    """One whole-span Dormand-Prince attempt in ONE kernel.

    Returns (x5 (N, D), err_scaled (N, D)): the 5th-order endpoint and the
    embedded error estimate already divided by the tolerance scale — reduce
    with the caller's error norm and compare against 1 to accept. err_scaled
    is emitted under stop_gradient (controller decisions are
    non-differentiable, matching `ops/ode.py`); dt is likewise treated as
    non-differentiable.
    """
    x5, err = _fused_dp_forward(x0, dt, z, lengthscales, variance, omega,
                                phase, weights, nu, rtol, atol, tile_n,
                                interpret)
    return x5, jax.lax.stop_gradient(err)


def _fused_dp_forward(x, dt, z, lengthscales, variance, omega, phase, weights,
                      nu, rtol, atol, tile_n, interpret, save_stages=False):
    n, din = x.shape
    m = z.shape[0]
    d = nu.shape[0]
    s = weights.shape[0]
    tile_n, x_p, dt2d, inv_ls, var2d, omega_t, phase_t, w_t, nu_t = \
        _rk4_operand_layout(x, dt, z, lengthscales, variance, omega, phase,
                            weights, nu, tile_n, 2 * d * (3 * s + 2 * m))
    n_pad = x_p.shape[0]

    tile_spec = pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [tile_spec, tile_spec]
    out_shape = [jax.ShapeDtypeStruct((n_pad, din), jnp.float32),
                 jax.ShapeDtypeStruct((n_pad, din), jnp.float32)]
    if save_stages:
        out_specs.append(pl.BlockSpec((6, tile_n, din), lambda ni: (0, ni, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((6, n_pad, din), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_fused_dp_attempt_kernel, float(rtol), float(atol)),
        grid=(n_pad // tile_n,),
        in_specs=_rk4_in_specs(tile_n, din, m, d, s),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret or _FORCE_INTERPRET,
    )(dt2d, x_p, z, inv_ls, var2d, omega_t, phase_t, w_t, nu_t)
    if save_stages:
        x5, err, xs = outs
        return x5[:n], err[:n], xs[:, :n, :]
    x5, err = outs
    return x5[:n], err[:n]


def _fused_dp_fwd(x0, dt, z, lengthscales, variance, omega, phase, weights,
                  nu, rtol, atol, tile_n, interpret):
    x5, err, xs = _fused_dp_forward(x0, dt, z, lengthscales, variance, omega,
                                    phase, weights, nu, rtol, atol, tile_n,
                                    interpret, save_stages=True)
    return (x5, jax.lax.stop_gradient(err)), (
        xs, dt, z, lengthscales, variance, omega, phase, weights, nu)


def _fused_dp_bwd(rtol, atol, tile_n, interpret, residuals, gs):
    g_x5, _ = gs                                         # err: stop-gradient
    (xs, dt, z, lengthscales, variance, omega, phase, weights, nu) = residuals
    n, din = xs.shape[1], xs.shape[2]
    m = z.shape[0]
    d = nu.shape[0]
    s = weights.shape[0]
    # The saved stage inputs remove the whole-chain recompute (less WORK),
    # but Mosaic's live set barely shrinks: the six stage-VJP working sets
    # plus gk buffers still coexist (measured 19.6 MiB at tile 128 with a 3x
    # estimate) — keep the proven 5x calibration for tile sizing.
    tile_n, _, dt2d, inv_ls, var2d, omega_t, phase_t, w_t, nu_t = \
        _rk4_operand_layout(xs[0], dt, z, lengthscales, variance, omega,
                            phase, weights, nu, tile_n,
                            5 * d * (4 * s + 5 * m))
    pad = (-n) % tile_n
    xs_p = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    g_p = _pad_rows(g_x5.astype(jnp.float32), tile_n)
    n_pad = n + pad

    const = _full_spec
    in_specs = _rk4_in_specs(tile_n, din, m, d, s)
    in_specs[1] = pl.BlockSpec((6, tile_n, din), lambda ni: (0, ni, 0),
                               memory_space=pltpu.VMEM)   # xs replaces x0
    outs = pl.pallas_call(
        functools.partial(_fused_dp_attempt_bwd_kernel, float(rtol),
                          float(atol)),
        grid=(n_pad // tile_n,),
        in_specs=in_specs + [
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, din), lambda ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            const((m, din)), const((d, din)), const((d, 1)),
            const((d, din, s)), const((d, 1, s)), const((d, 1, s)),
            const((d, 1, m)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, din), jnp.float32),
            jax.ShapeDtypeStruct((m, din), jnp.float32),
            jax.ShapeDtypeStruct((d, din), jnp.float32),
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, din, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, s), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, m), jnp.float32),
        ],
        interpret=interpret or _FORCE_INTERPRET,
    )(dt2d, xs_p, z, inv_ls, var2d, omega_t, phase_t, w_t, nu_t, g_p)
    dx, dz, dls, dvar, domega_t, dphase_t, dw_t, dnu_t = outs
    return (dx[:n], jnp.zeros_like(dt), dz, dls,
            dvar.reshape(variance.shape), jnp.moveaxis(domega_t, 0, -1),
            jnp.moveaxis(dphase_t, 0, -1), dw_t[:, 0, :].T, dnu_t[:, 0, :])


fused_dopri5_attempt.defvjp(_fused_dp_fwd, _fused_dp_bwd)
