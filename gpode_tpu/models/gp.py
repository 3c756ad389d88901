"""Decoupled-sampling sparse variational GP (the ODE vector-field posterior).

TPU-native rebuild of the reference's `DSVGP_Layer` (`src/core/dsvgp.py:29-230`),
implementing pathwise/decoupled posterior sampling (Wilson et al., ICML 2020):
a posterior function draw is

    f(x) = f_prior(x) + K(x, Z) L^{-T} (v - L^{-1} f_prior(Z))

where f_prior is a random-Fourier-feature prior sample, L = chol(K(Z,Z)) and v
is a sample from the whitened inducing posterior q(v) = N(u_mean, S).

Architectural differences from the reference (deliberate, TPU-first):
  * A function draw is immutable data (:class:`PosteriorDraw`) built by the
    pure :func:`draw_posterior` — the `build_cache` equivalent
    (`dsvgp.py:92-122`) — so MC draws are one `vmap` instead of a Python loop,
    and the ODE right-hand side :func:`eval_draw` is a deterministic compiled
    function of (params, draw, x).
  * The draw-independent Cholesky of K(Z,Z) is computed once per training step
    (:func:`precompute`) and shared across all vmapped draws instead of being
    recomputed inside every cache rebuild.
  * All sampling uses explicit `jax.random` keys (the reference used fresh
    unseeded NumPy RNGs per call, `dsvgp.py:11-26`).
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpode_tpu.ops import math as om
from gpode_tpu.ops.kernels import RBFParams, init_rbf, rbf_K, rbf_K_diag, rbf_sample_freq


class SVGPParams(NamedTuple):
    """Trainable SVGP state (all leaves unconstrained where constrained).

    kernel:     RBF hyperparameters (dimwise inferred from shapes).
    z:          (M, Din) inducing locations.
    u_mean:     (M, D) whitened inducing posterior mean.
    u_tril:     (D, M(M+1)/2) packed Cholesky of the whitened posterior scale,
                or None when q_diag.
    u_diag_raw: (M, D) unconstrained (softplus) diagonal scales, or None when
                full-rank.
    """

    kernel: RBFParams
    z: jax.Array
    u_mean: jax.Array
    u_tril: Optional[jax.Array]
    u_diag_raw: Optional[jax.Array]

    @property
    def q_diag(self) -> bool:
        return self.u_tril is None

    @property
    def dimwise(self) -> bool:
        return self.kernel.dimwise

    @property
    def num_inducing(self) -> int:
        return self.z.shape[0]

    @property
    def d_in(self) -> int:
        return self.z.shape[1]

    @property
    def d_out(self) -> int:
        return self.u_mean.shape[1]

    def u_scale_tril(self) -> jax.Array:
        """Dense (D, M, M) lower-triangular scale of q(v)."""
        return om.fill_tril(self.u_tril, self.num_inducing)

    def u_scale_diag(self) -> jax.Array:
        """(M, D) positive diagonal scales (q_diag mode)."""
        return om.softplus(self.u_diag_raw)


class PosteriorDraw(NamedTuple):
    """One pathwise sample of the posterior vector field (immutable).

    omega:   RFF frequencies, (Din, S) or dimwise (Din, S, D).
    phase:   RFF phases, (1, S) or dimwise (1, S, D).
    weights: RFF weights, (S, D).
    nu:      pathwise-update coefficients L^{-T}(v - L^{-1} f_prior(Z)),
             stored as (D, M) for both dimwise and shared-kernel modes.
    """

    omega: jax.Array
    phase: jax.Array
    weights: jax.Array
    nu: jax.Array


def init_svgp(key: jax.Array, d_in: int, d_out: int, num_inducing: int, *,
              dimwise: bool = True, q_diag: bool = False,
              dtype=jnp.float32) -> SVGPParams:
    """Random initialization matching `dsvgp.py:66-76`:
    z ~ N(0,1), u_mean ~ 0.1 N(0,1), scale = 1e-3 (identity Cholesky or diag).
    """
    kz, km = jax.random.split(key)
    kernel = init_rbf(d_in, d_out, dimwise=dimwise, dtype=dtype)
    z = jax.random.normal(kz, (num_inducing, d_in), dtype=dtype)
    u_mean = 0.1 * jax.random.normal(km, (num_inducing, d_out), dtype=dtype)
    if q_diag:
        u_diag_raw = jnp.full((num_inducing, d_out), om.invsoftplus(1e-3), dtype=dtype)
        return SVGPParams(kernel, z, u_mean, None, u_diag_raw)
    eye_packed = om.pack_tril(1e-3 * jnp.eye(num_inducing, dtype=dtype))
    u_tril = jnp.broadcast_to(eye_packed, (d_out,) + eye_packed.shape)
    return SVGPParams(kernel, z, u_mean, u_tril, None)


def precompute_chol(params: SVGPParams, jitter: float = om.DEFAULT_JITTER) -> jax.Array:
    """Cholesky of K(Z,Z) + jitter I: (M, M) or dimwise (D, M, M).

    Draw-independent; hoisted out of :func:`draw_posterior` so that vmapping
    over MC draws shares one factorization (`dsvgp.py:110-111` redoes it per
    cache build).
    """
    kzz = rbf_K(params.kernel, params.z)
    return om.cholesky_jittered(kzz, jitter)


def sample_inducing(key: jax.Array, params: SVGPParams) -> jax.Array:
    """Reparameterized sample v ~ q(v) in whitened space: (M, D).

    Mirrors `dsvgp.py:78-90`.
    """
    m, d = params.u_mean.shape
    eps = jax.random.normal(key, (m, d), dtype=params.u_mean.dtype)
    if params.q_diag:
        zs = params.u_scale_diag() * eps
    else:
        zs = jnp.einsum("dnm,md->nd", params.u_scale_tril(), eps, precision=om.HIGHEST)
    return zs + params.u_mean


def rff_eval(params: SVGPParams, omega: jax.Array, phase: jax.Array,
             weights: jax.Array, x: jax.Array) -> jax.Array:
    """Evaluate the RFF prior sample at x: (N, Din) -> (N, D).

    phi(x) = cos(x omega + phase) * sqrt(2 * variance / S); f = phi @ weights.
    Mirrors `dsvgp.py:124-137` EXCEPT the canonical sqrt(2) factor (Rahimi &
    Recht 2007): the reference scales by sqrt(variance/S), so its prior
    samples carry variance sigma^2/2 instead of sigma^2 — with the correct
    factor, empirical draw covariance matches K (verified in tests against
    the exact conditional). Two matmuls with a fused cos epilogue — MXU work
    at S=256 features.
    """
    var = params.kernel.variance
    s = weights.shape[0]
    scale = jnp.sqrt(_RFF_SCALE_FACTOR * var / s)
    if params.dimwise:
        xo = jnp.einsum("nd,dfk->nfk", x, omega, precision=om.HIGHEST)       # (N, S, D)
        phi = jnp.cos(xo + phase) * scale                                    # (N, S, D)
        return jnp.einsum("nfk,fk->nk", phi, weights, precision=om.HIGHEST)  # (N, D)
    xo = jnp.einsum("nd,df->nf", x, omega, precision=om.HIGHEST)             # (N, S)
    phi = jnp.cos(xo + phase) * scale                                        # (N, S)
    return jnp.einsum("nf,fd->nd", phi, weights, precision=om.HIGHEST)       # (N, D)


def draw_posterior(key: jax.Array, params: SVGPParams, num_features: int,
                   chol_zz: Optional[jax.Array] = None) -> PosteriorDraw:
    """Sample one posterior function draw (the `build_cache` equivalent).

    Pure and vmappable over keys; mirrors `dsvgp.py:92-122`:
      1. draw RFF frequencies/phases/weights defining the prior sample,
      2. draw v ~ q(v) from the whitened inducing posterior,
      3. nu = L^{-T} (v - L^{-1} f_prior(Z)).
    """
    k_w, k_omega, k_phase, k_u = jax.random.split(key, 4)
    m, d = params.u_mean.shape
    dtype = params.u_mean.dtype
    s = num_features

    weights = jax.random.normal(k_w, (s, d), dtype=dtype)
    omega = rbf_sample_freq(params.kernel, k_omega, s)
    phase_shape = (1, s, d) if params.dimwise else (1, s)
    phase = 2.0 * jnp.pi * jax.random.uniform(k_phase, phase_shape, dtype=dtype)

    v = sample_inducing(k_u, params)                           # (M, D)
    if chol_zz is None:
        chol_zz = precompute_chol(params)
    u_prior = rff_eval(params, omega, phase, weights, params.z)  # (M, D)

    if params.dimwise:
        a = om.solve_lower(chol_zz, u_prior.T[:, :, None])       # (D, M, 1)
        nu = om.solve_upper_from_lower(chol_zz, v.T[:, :, None] - a)[..., 0]  # (D, M)
    else:
        a = om.solve_lower(chol_zz, u_prior)                     # (M, D)
        nu = om.solve_upper_from_lower(chol_zz, v - a).T         # (D, M)
    return PosteriorDraw(omega=omega, phase=phase, weights=weights, nu=nu)


# Pallas fast path for the dimwise rhs; trace-time static. None = auto: use
# the fused kernel on TPU when the batch fills at least one tile (large
# flattened shooting-segment batches win ~3x end-to-end from the fused
# forward+backward; tiny vanilla-ODE batches stay on the XLA path, whose
# fusions beat kernel-launch overhead at a handful of rows).
_USE_PALLAS_RHS: bool | None = None
_PALLAS_RHS_MIN_ROWS = 256

# RFF scale compatibility: canonical sqrt(2 var / S) by default; the reference
# uses sqrt(var / S) (prior sample variance var/2, `dsvgp.py:136`). Toggle to
# reproduce the reference's ELBO trajectories exactly.
_RFF_SCALE_FACTOR = 2.0

_logger = logging.getLogger("gpode_tpu.gp")
# Telemetry dedupe: trace-time fallback decisions log once per distinct
# message per process (a decision fires on every trace; without dedupe a
# retraced eval loop would spam the log).
_PALLAS_FALLBACK_LOGGED: set = set()


def _log_once(level: int, msg: str):
    if msg not in _PALLAS_FALLBACK_LOGGED:
        _PALLAS_FALLBACK_LOGGED.add(msg)
        _logger.log(level, msg)


def _invalidate_jit_caches():
    """The Pallas/RFF toggles below are read at TRACE time: a function jitted
    before a toggle would keep serving its stale compiled path. Dropping the
    jit caches forces every live jitted closure to retrace on its next call,
    so the toggles behave like real configuration instead of
    trace-order-dependent globals. Toggles are rare config-scope events; the
    recompiles they trigger are the price of correctness."""
    jax.clear_caches()


def set_rff_reference_scale(enabled: bool):
    """True -> reproduce the reference's sqrt(var/S) RFF scaling (its prior
    samples carry variance var/2); False (default) -> canonical sqrt(2var/S)."""
    global _RFF_SCALE_FACTOR
    new = 1.0 if enabled else 2.0
    if new != _RFF_SCALE_FACTOR:
        _RFF_SCALE_FACTOR = new
        _invalidate_jit_caches()


def set_pallas_rhs(enabled: bool | None):
    """Route dimwise `eval_draw` through the fused Pallas kernel (TPU only).

    The kernel keeps the (N,S) feature and (N,M) Gram tiles in VMEM instead
    of round-tripping them through HBM, in both directions (fused custom-VJP
    backward; see `gpode_tpu.ops.pallas_kernels.fused_rhs`).

    True forces the kernel for every dimwise eval, False forces the XLA path,
    None (the default) picks per call site by batch size at trace time.

    Already-jitted functions pick up the new setting on their next call (the
    setter drops the jit caches — the toggle participates in compilation
    like a real config value, at the cost of recompiles after a change).
    """
    global _USE_PALLAS_RHS
    if enabled is not _USE_PALLAS_RHS:
        _USE_PALLAS_RHS = enabled
        _invalidate_jit_caches()


def _pallas_backend_ok() -> bool:
    """Mosaic kernels need the TPU backend — except under the interpret-mode
    test seam (`pallas_kernels.set_force_interpret`), which runs every kernel
    through the Pallas interpreter so the CPU suite can exercise the
    flow-level megakernel branches, not just the kernels in isolation."""
    if jax.default_backend() == "tpu":
        return True
    from gpode_tpu.ops.pallas_kernels import force_interpret_active
    return force_interpret_active()


def pallas_rhs_active(params: SVGPParams, n_rows: int) -> bool:
    """Trace-time decision: would `eval_draw` take the fused Pallas kernel at
    this batch size? (Shared by the rk4 segment megakernel gate.)

    Dropped fast paths are logged once per distinct reason — a user who set
    `--pallas_rhs true` (or relies on the auto rule) should not silently land
    on the XLA path because of `dimwise=False`, a small batch, or a non-TPU
    backend.
    """
    if _USE_PALLAS_RHS is False:
        return False  # explicitly pinned to XLA: no telemetry needed
    auto = _USE_PALLAS_RHS is None
    want = n_rows >= _PALLAS_RHS_MIN_ROWS if auto else True
    if not want:
        if params.dimwise and _pallas_backend_ok():
            _log_once(logging.INFO,
                      f"Pallas rhs auto rule: batch of {n_rows} rows < "
                      f"{_PALLAS_RHS_MIN_ROWS} — taking the XLA path (XLA "
                      f"fusions beat kernel dispatch at small batches; force "
                      f"with set_pallas_rhs(True) / --pallas_rhs true)")
        return False
    mode = "auto rule" if auto else "forced True"
    if not params.dimwise:
        _log_once(logging.WARNING,
                  f"Pallas rhs {mode} dropped: the fused kernel is "
                  f"dimwise-only and this GP has dimwise=False — falling "
                  f"back to the XLA rhs for the whole solve")
        return False
    if not _pallas_backend_ok():
        if not auto:
            _log_once(logging.WARNING,
                      "Pallas rhs forced True but the default backend is not "
                      "TPU (and the interpret seam is off) — falling back to "
                      "the XLA rhs")
        return False
    return True


def kernel_rff_weights(weights: jax.Array) -> jax.Array:
    """RFF weights adjusted for the Pallas kernels, which hardcode the
    canonical sqrt(2 var/S) feature scale: under the reference-compat scale
    (`set_rff_reference_scale(True)`, factor 1) the convention folds into the
    weights as w * sqrt(factor/2) — mathematically identical prior sample,
    and cotangents chain through the outer multiply automatically."""
    if _RFF_SCALE_FACTOR == 2.0:
        return weights
    return weights * jnp.sqrt(_RFF_SCALE_FACTOR / 2.0)


def eval_draw(params: SVGPParams, draw: PosteriorDraw, x: jax.Array,
              use_pallas: bool | None = None) -> jax.Array:
    """Evaluate the sampled vector field f(x): (N, Din) -> (N, D).

    The hot ODE right-hand side (`dsvgp.py:172-197`): RFF prior eval plus the
    pathwise update nu^T K(Z, x). Deterministic given the draw, so an entire
    ODE solve traces into one XLA program.

    use_pallas overrides the global/auto kernel choice for this call site
    (needed where the caller requires ops the Pallas custom_vjp cannot
    provide, e.g. second-order differentiation through the implicit BDF
    solver's Newton iterations).
    """
    if use_pallas is None:
        use_pallas = pallas_rhs_active(params, x.shape[0])
    if use_pallas and params.dimwise and _pallas_backend_ok():
        from gpode_tpu.ops.pallas_kernels import fused_rhs
        return fused_rhs(x, params.z, params.kernel.lengthscales,
                         params.kernel.variance, draw.omega, draw.phase,
                         kernel_rff_weights(draw.weights), draw.nu)
    f_prior = rff_eval(params, draw.omega, draw.phase, draw.weights, x)
    kuf = rbf_K(params.kernel, params.z, x)                     # (M, N) or (D, M, N)
    if params.dimwise:
        f_update = jnp.einsum("dm,dmn->nd", draw.nu, kuf, precision=om.HIGHEST)
    else:
        f_update = jnp.einsum("dm,mn->nd", draw.nu, kuf, precision=om.HIGHEST)
    return f_prior + f_update


def conditional(params: SVGPParams, x: jax.Array, *, full_cov: bool = False,
                jitter: float = om.DEFAULT_JITTER):
    """Exact conditional q(f(x)) = N(mean, var) (`dsvgp.py:139-170`).

    Returns (mean (N, D), var (N, D)) or with full_cov (mean, var (D, N, N)).
    """
    chol_zz = precompute_chol(params, jitter)                  # (M,M) or (D,M,M)
    kuf = rbf_K(params.kernel, params.z, x)                    # (M,N) or (D,M,N)
    a = om.solve_lower(chol_zz, kuf)                           # same shape as kuf

    m = params.num_inducing
    if params.q_diag:
        # S = diag(s^2). (The reference's build_conditional builds the rank-1
        # outer product s s^T here, `dsvgp.py:155` — inconsistent with its own
        # q_diag sampling path `dsvgp.py:83`; we use the correct diagonal so
        # conditional moments match decoupled-sampling moments.)
        s2 = jnp.square(params.u_scale_diag().T)               # (D, M)
        sk = jax.vmap(jnp.diag)(s2) - jnp.eye(m, dtype=x.dtype)  # (D, M, M)
    else:
        us = params.u_scale_tril()                             # (D, M, M)
        sk = jnp.einsum("dmk,dek->dme", us, us, precision=om.HIGHEST) - jnp.eye(m, dtype=x.dtype)  # (D, M, M)

    a_d = a if params.dimwise else a[None]                     # (D or 1, M, N)
    b = jnp.einsum("dme,den->dmn", sk, jnp.broadcast_to(a_d, sk.shape[:1] + a_d.shape[1:]),
                   precision=om.HIGHEST)

    if full_cov:
        delta = jnp.einsum("dme,dmn->den", jnp.broadcast_to(a_d, b.shape), b,
                           precision=om.HIGHEST)  # (D, N, N)
        kff = rbf_K(params.kernel, x)
        kff = kff if params.dimwise else kff[None]
        var = kff + delta                                      # (D, N, N)
    else:
        delta = jnp.sum(jnp.broadcast_to(a_d, b.shape) * b, axis=1)  # (D, N)
        kff = rbf_K_diag(params.kernel, x)                     # (D, N) or (N,)
        kff = kff if params.dimwise else kff[None]
        var = (kff + delta).T                                  # (N, D)

    if params.dimwise:
        mean = jnp.einsum("dmn,md->nd", a, params.u_mean, precision=om.HIGHEST)
    else:
        mean = jnp.einsum("mn,md->nd", a, params.u_mean, precision=om.HIGHEST)
    return mean, var


def kl(params: SVGPParams) -> jax.Array:
    """KL( q(v) || N(0, I) ) of the whitened inducing posterior, summed over
    output dims (`dsvgp.py:199-230`)."""
    if params.q_diag:
        return om.kl_whitened_gaussian_diag(params.u_mean.T, params.u_scale_diag().T)
    return om.kl_whitened_gaussian(params.u_mean.T, params.u_scale_tril())
