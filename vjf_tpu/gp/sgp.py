"""Sparse-GP dynamics — the ``vjf.gp`` variant (BASELINE config #3).

The module is referenced by the snapshot's ``test/test_sgp.py:8-22`` but
absent from it; the API surface (``SGP(xdim, ydim, udim, covfun,
noise_var=..., f_cov="I", inducing=...)`` with ``initialize/predict/fit``)
is rebuilt from that test (SURVEY.md §2.3).

Design: in the *whitened* inducing-point parametrization, a sparse
variational GP over inducing points Z is exactly a Bayesian linear
regression — ``f(x) = phi(x) v`` with features ``phi(x) = k(x, Z) W``
(``W`` a whitening matrix with ``W W^T ~= K_zz^{-1}``) and prior
``v ~ N(0, I)``. RBF features at fixed centroids are the fixed-width
special case, so the SGP dynamics reuses the whole RLS/NSV machinery from
:mod:`vjf_tpu.models.regression` and plugs into the same transition
interface as :mod:`vjf_tpu.models.dynamics`. The predictive variance
carries the DTC correction ``k(x,x) - |phi(x)|^2`` on top of the
parametric term ``diag(phi V phi^T)``.

Whitening choice (TPU-native, load-bearing): ``W`` is the SYMMETRIC
(ZCA) whitener ``U diag(max(lam, floor))^{-1/2} U^T`` from one eigh of
``K_zz`` per epoch boundary — NOT the textbook ``L_zz^{-T}``. SE Gram
matrices are numerically low-rank (eigenvalues decay exponentially), so
in f32 the explicit triangular inverse has exponentially amplified
entries and ``k @ L^{-T}`` cancels catastrophically (measured on-chip:
whitened features oscillating between ~1e-15 and inf, NaN-ing the RLS
recursion within one epoch), while a per-step ``tril_solve`` is a
sequential-substitution op that cannot live inside a Pallas kernel. The
floored symmetric whitener keeps the mathematical bound
``|phi(x)|^2 <= k(x,x)`` (each spectral term only shrinks), has bounded
operator norm ``floor^{-1/2}``, and turns whitening into ONE stable MXU
matmul shared verbatim by the XLA path and the fused kernel
(``ops/pallas/fused_step.py:pad_carry``). Directions floored away are
exactly the DTC-truncated ones — their variance reappears in the
``k(x,x) - |phi|^2`` correction instead of exploding the basis.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..config import VJFConfig
from ..models import dynamics as dyn
from ..models import regression
from ..ops.functional import batch_weighted_mean, gaussian_loss, nonecat
from ..ops.linalg import cho_solve, safe_cholesky, tril_solve
from ..types import Gaussian
from .covfun import CovarianceFunction, SquaredExponential, _sqdist

_JITTER = 1e-6


def _jitter(dtype) -> float:
    """PSD jitter for K(Z,Z) cholesky: f32 needs a bigger floor (the SE
    kernel goes near-singular fast as the lengthscale grows)."""
    return 1e-6 if jnp.dtype(dtype) == jnp.float64 else 1e-5


class SGPDynamicsState(NamedTuple):
    inducing: Array       # Z, (m, xudim)
    whiten: Array         # W = U max(lam, floor)^{-1/2} U^T (see module doc)
    whiten_inv: Array     # W^{-1} = U max(lam, floor)^{1/2} U^T — the floored
    #                       sqrtm(K_zz); f(Z) = whiten_inv @ v is basis-free
    log_scale: Array      # kernel output scale (carried in state so the
    log_lengthscale: Array  # transition interface needs no cfg plumbing)
    blr: regression.BLRState
    logvar: Array         # scalar state noise (mirrors RBFDS, vjf/model.py:331)
    n_sample: Array


def whiten_matrices(kzz: Array) -> tuple:
    """(W, W^{-1}) by one eigh with relative eigenvalue flooring.

    The floor bounds ``|W|_2`` by ``(floor)^{-1/2}`` — the property the f32
    fused path needs. The floor must sit WELL ABOVE the dtype's eigen-noise
    level ``eps * lam_max``: computed eigenvectors of clustered tiny
    eigenvalues mix with the large-eigenvalue subspace at relative error
    ``eps * lam_max / gap``, and a floored direction contaminated by a
    fraction ``c`` of a big direction contributes a spurious
    ``(c |k|)^2 / floor`` to ``|phi|^2`` — measured as a 277x violation of
    the mathematical bound ``|phi(x)|^2 <= k(x,x)`` at rel=1e-6 in f32.
    rel = 1e-4 (f32) / 1e-8 (f64) keeps the mixing ratio ~1e-3, restoring
    the bound to within rounding; the discarded sub-floor directions carry
    < 1e-4 of the kernel's variance and reappear in the DTC correction.
    """
    lam, u = jnp.linalg.eigh(kzz)
    rel = 1e-8 if kzz.dtype == jnp.float64 else 1e-4
    floor = rel * jnp.maximum(lam[-1], 1e-30)
    lam_f = jnp.maximum(lam, floor)
    w = (u * (lam_f ** -0.5)) @ u.T
    w_inv = (u * (lam_f ** 0.5)) @ u.T
    return w, w_inv


# ---------------------------------------------------------------------------
# Transition-module interface (same surface as vjf_tpu.models.dynamics)
# ---------------------------------------------------------------------------


def _covfun(cfg: VJFConfig) -> CovarianceFunction:
    return SquaredExponential(cfg.sgp_scale, cfg.sgp_lengthscale)


def init_sgp_dynamics(
    key: jax.Array, cfg: VJFConfig, backend: Optional[str] = None
) -> SGPDynamicsState:
    from ..models.dynamics import resolve_backend

    backend = backend or resolve_backend(cfg)
    dtype = cfg.jdtype
    m = cfg.n_inducing
    inducing = jax.random.uniform(
        key, (m, cfg.xudim), dtype=dtype,
        minval=-cfg.centroid_init_range, maxval=cfg.centroid_init_range,
    )
    kzz = _covfun(cfg)(inducing, inducing)
    w, w_inv = whiten_matrices(kzz + _jitter(dtype) * jnp.eye(m, dtype=dtype))
    if backend == "covariance":
        blr = regression.init_covariance(m, cfg.xdim, dtype=dtype)
    elif backend == "nsv":
        blr = regression.init_nsv(m, cfg.xdim, dtype=dtype)
    else:
        blr = regression.init_precision(m, cfg.xdim, dtype=dtype)
    return SGPDynamicsState(
        inducing=inducing,
        whiten=w,
        whiten_inv=w_inv,
        log_scale=jnp.log(jnp.asarray(cfg.sgp_scale, dtype)),
        log_lengthscale=jnp.log(jnp.asarray(cfg.sgp_lengthscale, dtype)),
        blr=blr,
        logvar=jnp.zeros((), dtype=dtype),
        n_sample=jnp.zeros((), jnp.int32),
    )


def _se_kernel(x1: Array, x2: Array, log_scale: Array, log_lengthscale: Array) -> Array:
    """Squared-exponential Gram matrix from explicit log-hypers (the single
    shared implementation — used with the state's hypers by :func:`_kernel`
    and with free ``theta`` by the hyperparameter-adaptation objective)."""
    d2 = _sqdist(x1, x2)
    return jnp.exp(2.0 * log_scale - 0.5 * d2 * jnp.exp(-2.0 * log_lengthscale))


def _kernel(state: SGPDynamicsState, x1: Array, x2: Array) -> Array:
    return _se_kernel(x1, x2, state.log_scale, state.log_lengthscale)


def features(state: SGPDynamicsState, x: Array, u: Optional[Array] = None) -> Array:
    """Whitened kernel features ``phi(x) = k(xu, Z) W`` — one MXU matmul
    (shared verbatim with the fused kernel; see module docstring)."""
    xu = nonecat(x, u)
    kxz = _kernel(state, xu, state.inducing)
    return jnp.matmul(kxz, state.whiten, precision=jax.lax.Precision.HIGHEST)


def predict_from_features(
    state: SGPDynamicsState, x: Array, feat: Array, leak: float = 0.0
) -> Gaussian:
    g = regression.predict_gaussian(state.blr, feat)
    # DTC variance correction: k(x,x) - q(x,x) = scale^2 - |phi(x)|^2
    dtc = jnp.maximum(
        jnp.exp(2.0 * state.log_scale) - jnp.sum(feat * feat, axis=-1), 0.0
    )
    var = jnp.exp(g.logvar) + dtc[..., None]
    return Gaussian((1.0 - leak) * x + g.mean, jnp.log(var + 1e-30))


def transition_gaussian(
    state: SGPDynamicsState, x: Array, u: Optional[Array] = None, leak: float = 0.0
) -> Gaussian:
    x = jnp.atleast_2d(x)
    return predict_from_features(state, x, features(state, x, u), leak)


def update_from_features(
    cfg: VJFConfig,
    state: SGPDynamicsState,
    xt: Array,
    xs: Array,
    feat: Array,
    warm_up: bool = False,
    weights: Optional[Array] = None,
    warm_gate: Optional[Array] = None,
) -> SGPDynamicsState:
    """Mirror of RBFDS.update (``vjf/model.py:363-377``) on kernel features.

    ``weights``: optional (B,) 0/1 trial mask — zeroed feature rows drop
    out of the RLS statistics; masked rows are excluded from the residual
    MSE and sample count (see ``models/dynamics.py:update_from_features``).
    ``warm_gate``: optional traced phase gate (see
    ``models/dynamics.py:blr_residual_update``).
    """
    blr, logvar, n_sample = dyn.blr_residual_update(
        cfg, state.blr, state.logvar, state.n_sample, xt, xs, feat,
        warm_up=warm_up, weights=weights, update_rule="rls",
        warm_gate=warm_gate,
    )
    return state._replace(blr=blr, logvar=logvar, n_sample=n_sample)


def dynamics_update(
    cfg: VJFConfig,
    state: SGPDynamicsState,
    xt: Array,
    xs: Array,
    u: Optional[Array] = None,
    warm_up: bool = False,
) -> SGPDynamicsState:
    xs = jnp.atleast_2d(xs)
    xt = jnp.atleast_2d(xt)
    return update_from_features(
        cfg, state, xt, xs, features(state, xs, u), warm_up=warm_up
    )


def dynamics_initialize(
    cfg: VJFConfig,
    key: jax.Array,
    state: SGPDynamicsState,
    xt: Array,
    xs: Array,
    u: Optional[Array] = None,
    weights: Optional[Array] = None,
) -> SGPDynamicsState:
    """Post-warm-up bootstrap: re-place inducing points over the visited
    region (U[-r, r], r = max ||xu|| — mirroring the RBF re-init at
    ``vjf/module.py:144-148``), then one RLS pass on ``dx``. ``weights``:
    optional (N,) 0/1 pair mask (ragged trials)."""
    xs = jnp.atleast_2d(xs)
    xt = jnp.atleast_2d(xt)
    xu = nonecat(xs, u)
    dx = xt - xs
    if weights is None:
        mse0 = jnp.mean(jnp.square(dx))
    else:
        mse0 = batch_weighted_mean(jnp.mean(jnp.square(dx), axis=-1), weights)

    r = jnp.max(jnp.linalg.norm(xu, axis=-1))
    inducing = (
        jax.random.uniform(key, state.inducing.shape, dtype=state.inducing.dtype,
                           minval=-1.0, maxval=1.0) * r
    )
    state = state._replace(inducing=inducing)
    kzz = _kernel(state, inducing, inducing)
    w, w_inv = whiten_matrices(
        kzz + _jitter(kzz.dtype) * jnp.eye(kzz.shape[0], dtype=kzz.dtype)
    )
    state = state._replace(whiten=w, whiten_inv=w_inv)
    feat = features(state, xs, u)
    if weights is not None:
        feat = feat * weights.astype(feat.dtype)[:, None]
    blr = regression.one_shot_rls(
        state.blr, feat, dx, mse0, shrink=cfg.rls_shrink, jitter=cfg.chol_jitter
    )
    residual = dx - regression.predict_gaussian(blr, feat).mean
    if weights is None:
        mse = jnp.mean(jnp.square(residual))
    else:
        mse = batch_weighted_mean(jnp.mean(jnp.square(residual), axis=-1), weights)
    return state._replace(blr=blr, logvar=jnp.log(mse))


def dynamics_loss(
    state: SGPDynamicsState, pt: Gaussian, qt: Gaussian, trace_quirk: bool = True,
    weights: Optional[Array] = None,
) -> Array:
    return gaussian_loss(pt, qt, state.logvar, trace_quirk=trace_quirk,
                         weights=weights)


def forecast(
    state: SGPDynamicsState,
    x0: Array,
    key: jax.Array,
    n_step: int,
    u: Optional[Array] = None,
    noise: bool = False,
    leak: float = 0.0,
) -> Array:
    """Sampled autoregressive rollout on kernel features (weight sample
    per step, like ``vjf/model.py:342-361``) — the shared
    :func:`vjf_tpu.models.dynamics.sampled_rollout` scan."""
    w_sqrt = regression.weight_sqrt(state.blr)  # V constant during rollout

    def step(x, eps_w, ut):
        feat = features(state, x, ut)
        w = state.blr.w_mean + w_sqrt @ eps_w
        return (1.0 - leak) * x + feat @ w

    return dyn.sampled_rollout(
        state.blr, state.logvar, step, x0, key, n_step, u=u, noise=noise
    )


# ---------------------------------------------------------------------------
# Kernel hyperparameter adaptation (epoch-granular)
# ---------------------------------------------------------------------------


def hyperparam_nll(
    state: SGPDynamicsState, theta, xu: Array, dx: Array,
    weights: Optional[Array] = None,
) -> Array:
    """One-step predictive NLL of the velocity targets under hypers
    ``theta = (log_scale, log_lengthscale)``, holding the POSTERIOR MEAN AT
    THE INDUCING POINTS fixed (``f(Z) = W^{-1} v`` — a basis-free quantity,
    so the objective is differentiable in theta without re-deriving the
    whitened weights): ``f(x; theta) = k_theta(x,Z) K_theta(Z,Z)^{-1} f(Z)``
    with the DTC variance correction in the noise term.
    """
    log_scale, log_ls = theta
    z = state.inducing
    m = z.shape[0]
    f_z = jax.lax.stop_gradient(state.whiten_inv @ state.blr.w_mean)
    sv = jax.lax.stop_gradient(jnp.exp(state.logvar))

    kzz = _se_kernel(z, z, log_scale, log_ls) + _jitter(z.dtype) * jnp.eye(m, dtype=z.dtype)
    lzz = jnp.linalg.cholesky(kzz)
    kxz = _se_kernel(xu, z, log_scale, log_ls)
    alpha = cho_solve(lzz, f_z)                       # K^{-1} f(Z)
    mean = kxz @ alpha
    phi = tril_solve(lzz, kxz.T).T
    dtc = jnp.maximum(jnp.exp(2.0 * log_scale) - jnp.sum(phi * phi, axis=-1), 0.0)
    s = sv + dtc[:, None] + 1e-12
    resid = dx - mean
    nll_rows = jnp.mean(resid * resid / s + jnp.log(s), axis=-1)
    return 0.5 * batch_weighted_mean(nll_rows, weights)


def adapt_hyperparams(
    cfg: VJFConfig,
    state: SGPDynamicsState,
    xt: Array,
    xs: Array,
    u: Optional[Array] = None,
    lr: Optional[float] = None,
    n_steps: Optional[int] = None,
    weights: Optional[Array] = None,
) -> SGPDynamicsState:
    """Adapt ``log_scale``/``log_lengthscale`` by SGD on the pooled one-step
    predictive NLL, then re-whiten: rebuild ``L_zz`` and REPROJECT the
    weight posterior into the new feature basis.

    The whitened weights are basis-dependent (``f(Z) = L_zz v``), so a
    hyper change maps the posterior through ``A = L_new^{-1} L_old``:
    ``v' = A v`` (mean at Z preserved exactly), ``V' = A V A^T``,
    ``P' = A^{-T} P A^{-1}``. Runs at epoch granularity (the slow timescale
    of the dual-estimation structure — SGD hypers / closed-form weights),
    wired into ``fit`` via ``cfg.sgp_adapt_lr``.
    """
    lr = cfg.sgp_adapt_lr if lr is None else lr
    n_steps = cfg.sgp_adapt_steps if n_steps is None else n_steps
    xs = jnp.atleast_2d(xs)
    xt = jnp.atleast_2d(xt)
    xu = nonecat(xs, u)
    dx = xt - xs

    theta = (state.log_scale, state.log_lengthscale)
    grad_fn = jax.grad(lambda th: hyperparam_nll(state, th, xu, dx, weights=weights))
    for _ in range(max(0, n_steps)):
        g = grad_fn(theta)
        # finite-gated, clipped, and box-bounded: the NLL's cholesky grad
        # can overflow in f32 when the kernel drifts near-singular, and a
        # single NaN here would poison the whitener -> P/V/w for good (observed
        # on-chip). Non-finite steps are skipped; hypers stay in a sane box.
        g_ok = jnp.logical_and(jnp.isfinite(g[0]), jnp.isfinite(g[1]))
        theta = tuple(
            jnp.where(g_ok, t - lr * jnp.clip(gi, -cfg.clip, cfg.clip), t)
            for t, gi in zip(theta, g)
        )
        theta = (
            jnp.clip(theta[0], -5.0, 5.0),       # scale in [e^-5, e^5]
            jnp.clip(theta[1], -5.0, 5.0),
        )
    log_scale, log_ls = theta

    # re-whiten + reproject the posterior through A = W_new W_old^{-1}
    # (preserves the floored-basis posterior mean at Z, f(Z) = W^{-1} v,
    # exactly: W_new^{-1} (A v) = W_old^{-1} v)
    z = state.inducing
    m = z.shape[0]
    kzz = _se_kernel(z, z, log_scale, log_ls) + _jitter(z.dtype) * jnp.eye(m, dtype=z.dtype)
    w_whiten, w_inv = whiten_matrices(kzz)
    a = w_whiten @ state.whiten_inv                    # A = W_new W_old^{-1}
    a_inv = state.whiten @ w_inv                       # A^{-1} = W_old W_new^{-1}
    blr = state.blr
    w_new = a @ blr.w_mean
    if isinstance(blr, regression.NSVBLR):
        p_new = a_inv.T @ blr.precision @ a_inv
        v_new = a @ blr.cov @ a.T
        blr = regression.NSVBLR(w_new, p_new, v_new)
    elif isinstance(blr, regression.CovarianceBLR):
        blr = regression.CovarianceBLR(w_new, a @ blr.cov @ a.T)
    else:                                              # PrecisionBLR
        p_new = a_inv.T @ blr.precision @ a_inv
        p_new = 0.5 * (p_new + p_new.T)
        chol = safe_cholesky(p_new)
        from ..ops.linalg import inv_tril_transpose

        blr = regression.PrecisionBLR(w_new, p_new, chol, inv_tril_transpose(chol))
    new_state = state._replace(
        log_scale=log_scale, log_lengthscale=log_ls,
        whiten=w_whiten, whiten_inv=w_inv, blr=blr,
    )
    # whole-update finite gate (house rule: closed-form updates never cement
    # non-finite values — keep the old state instead)
    ok = jax.tree_util.tree_reduce(
        lambda acc, leaf: jnp.logical_and(
            acc,
            jnp.all(jnp.isfinite(leaf))
            if jnp.issubdtype(leaf.dtype, jnp.floating)
            else acc,
        ),
        new_state,
        jnp.asarray(True),
    )
    return jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), new_state, state
    )


# ---------------------------------------------------------------------------
# Standalone OO API mirroring the reference's test surface (test_sgp.py)
# ---------------------------------------------------------------------------


class SGP:
    """Sparse-GP regression ``y = f(x) + eps`` over inducing points.

    Constructor signature mirrors ``test_sgp.py:18``: ``SGP(xdim, ydim,
    udim, covfun, noise_var=..., f_cov="I", inducing=<(m, xdim) array>)``.
    """

    def __init__(
        self,
        xdim: int,
        ydim: int,
        udim: int = 0,
        covfun: CovarianceFunction = None,
        *,
        noise_var: float = 0.0,
        f_cov: str = "I",
        inducing: Array = None,
        dtype=jnp.float64,
    ):
        if covfun is None:
            covfun = SquaredExponential()
        if f_cov != "I":
            raise NotImplementedError("only the whitened identity prior (f_cov='I') is supported")
        if inducing is None:
            raise ValueError("inducing points are required")
        self.xdim, self.ydim, self.udim = xdim, ydim, udim
        self.covfun = covfun
        # noise_var=0 would make the Bayesian update degenerate; floor it.
        self.noise_var = max(float(noise_var), 1e-6)
        self.inducing = jnp.asarray(inducing, dtype=dtype)
        # the ACTUAL dtype, not the requested one: without x64 enabled,
        # asarray(..., float64) silently yields f32 — keying _jitter off
        # the request would then pick the too-small f64 floor (trap #11)
        self.dtype = self.inducing.dtype
        self.kzz_chol = None
        self.blr = None
        self.initialize()

    def initialize(self) -> None:
        m = self.inducing.shape[0]
        kzz = self.covfun(self.inducing, self.inducing)
        self.kzz_chol = safe_cholesky(kzz + _jitter(self.dtype) * jnp.eye(m, dtype=self.dtype))
        self.blr = regression.init_precision(m, self.ydim, dtype=self.dtype)

    def _features(self, x: Array) -> Array:
        kxz = self.covfun(jnp.atleast_2d(jnp.asarray(x, self.dtype)), self.inducing)
        return tril_solve(self.kzz_chol, kxz.T).T

    def predict(self, x: Array) -> Gaussian:
        """Predictive distribution of f(x): parametric term + DTC
        correction ``k(x,x) - q(x,x)``."""
        x = jnp.atleast_2d(jnp.asarray(x, self.dtype))
        feat = self._features(x)
        g = regression.predict_gaussian(self.blr, feat)
        dtc = jnp.maximum(self.covfun.diag(x) - jnp.sum(feat * feat, axis=-1), 0.0)
        var = jnp.exp(g.logvar) + dtc[..., None]
        return Gaussian(g.mean, jnp.log(var + 1e-30))

    def fit(self, x: Array, y: Array) -> "SGP":
        """One batch Bayesian update (online-composable: repeated calls
        accumulate evidence, like the reference's streaming ``fit``)."""
        x = jnp.atleast_2d(jnp.asarray(x, self.dtype))
        y = jnp.atleast_2d(jnp.asarray(y, self.dtype))
        feat = self._features(x)
        self.blr = regression.rls(self.blr, feat, y, jnp.asarray(self.noise_var, self.dtype))
        return self
