"""RBF dynamical system — the latent transition model.

Functional counterpart of ``/root/reference/vjf/model.py:327-391`` (``RBFDS``):
the velocity field ``f(x, u)`` is a Bayesian linear regression over RBF
features, ``x[t] = (1 - leak) x[t-1] + f(x[t-1], u[t])``, with scalar state
noise learned only by a running-variance rule (cap 500). The weight
posterior updates by closed-form RLS each step — no gradients ever flow
into this module (mirrored by keeping its state outside the differentiated
parameter pytree entirely, the structural equivalent of
``requires_grad=False`` + ``@torch.no_grad``).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..config import VJFConfig
from ..ops.functional import batch_weighted_mean, gaussian_loss, nonecat, running_var
from ..types import Gaussian
from . import regression
from .rbf import RBFParams, apply_rbf, init_rbf, reinit_rbf


class DynamicsState(NamedTuple):
    rbf: RBFParams
    blr: regression.BLRState
    logvar: Array     # scalar state noise (vjf/model.py:331)
    n_sample: Array   # running-var counter (vjf/model.py:332)


def resolve_backend(cfg: VJFConfig, batch_hint: Optional[int] = None) -> str:
    """'auto' backend choice:

    * float64 (parity/CPU runs) → ``precision``, the bit-closest mirror of
      the reference's RLS (``vjf/module.py:79-103``);
    * small per-step batch → ``covariance`` (Woodbury: only a B x B solve);
    * otherwise (TPU perf path, f32/bf16) → ``nsv``, the Newton-Schulz
      inverse-tracking form whose hot loop is MXU matmuls only.
    """
    if cfg.rls_backend == "auto" and cfg.dynamics_update == "kalman":
        # the weight-diffusion Kalman recursion lives natively in
        # covariance form (regression.kalman's direct Joseph hot path —
        # one B x B factorization per step); the nsv/precision backends
        # would pay a full (nf x nf) inverse or factor-pair rebuild every
        # step just to convert back
        return "covariance"
    if cfg.rls_backend != "auto":
        if cfg.rls_backend == "covariance" and cfg.chol_jitter:
            # fail at model construction, not at the first jitted rls trace
            # deep inside the fit loop (the kernel-level ValueError in
            # models/regression.py remains as the backstop)
            raise ValueError(
                "rls_backend='covariance' cannot apply chol_jitter (a "
                "full-rank precision ridge is not a rank-B Woodbury "
                "update); use 'nsv' or 'precision', or set chol_jitter=0"
            )
        return cfg.rls_backend
    if cfg.dtype == "float64":
        return "precision"
    if (
        batch_hint is not None
        and batch_hint * 2 < cfg.feature_dim
        and cfg.chol_jitter == 0.0
    ):
        # the covariance (Woodbury) form cannot apply the per-step jitter
        # ridge (a full-rank precision shift is not a rank-B update), so a
        # jittered config routes to the nsv form instead of silently
        # dropping the ridge
        return "covariance"
    return "nsv"


def init_dynamics(
    key: jax.Array, cfg: VJFConfig, backend: Optional[str] = None
) -> DynamicsState:
    backend = backend or resolve_backend(cfg)
    dtype = cfg.jdtype
    rbf = init_rbf(key, cfg.xudim, cfg.n_rbf, cfg.centroid_init_range, dtype=dtype)
    if backend == "covariance":
        blr = regression.init_covariance(cfg.n_rbf, cfg.xdim, dtype=dtype)
    elif backend == "nsv":
        blr = regression.init_nsv(cfg.n_rbf, cfg.xdim, dtype=dtype)
    else:
        blr = regression.init_precision(cfg.n_rbf, cfg.xdim, dtype=dtype)
    return DynamicsState(
        rbf=rbf,
        blr=blr,
        logvar=jnp.zeros((), dtype=dtype),
        n_sample=jnp.zeros((), dtype=jnp.int32),
    )


def features(state: DynamicsState, x: Array, u: Optional[Array] = None) -> Array:
    """Featurize ``concat(x, u)`` — shared by predict and update so the hot
    loop evaluates the basis once per step (forward and RLS see the same
    ``xu``, mirroring ``vjf/model.py:113`` and ``vjf/model.py:366-368``)."""
    return apply_rbf(state.rbf, nonecat(x, u))


def predict_from_features(
    state: DynamicsState, x: Array, feat: Array, leak: float = 0.0
) -> Gaussian:
    dx = regression.predict_gaussian(state.blr, feat)
    return Gaussian((1.0 - leak) * x + dx.mean, dx.logvar)


def transition_gaussian(
    state: DynamicsState, x: Array, u: Optional[Array] = None, leak: float = 0.0
) -> Gaussian:
    """Predictive ``p[t] = N((1-leak) x + F w, diag(F V F^T))`` —
    ``vjf/model.py:334-340`` with ``sampling=False``."""
    return predict_from_features(state, jnp.atleast_2d(x), features(state, x, u), leak)


def transition_sample(
    state: DynamicsState,
    x: Array,
    eps_w: Array,
    u: Optional[Array] = None,
    leak: float = 0.0,
    weight_sqrt: Optional[Array] = None,
) -> Array:
    """One sampled step ``(1-leak) x + F (w + S eps_w)`` —
    ``vjf/model.py:334-340`` with ``sampling=True``. Pass ``weight_sqrt`` to
    amortize the covariance square root across a rollout (V is constant
    during forecasting, so it is computed once, not per step)."""
    xu = nonecat(x, u)
    feat = apply_rbf(state.rbf, xu)
    s = weight_sqrt if weight_sqrt is not None else regression.weight_sqrt(state.blr)
    w = state.blr.w_mean + s @ eps_w
    return (1.0 - leak) * x + feat @ w


def sampled_rollout(
    blr,
    logvar: Array,
    step_sample,
    x0: Array,
    key: jax.Array,
    n_step: int,
    u: Optional[Array] = None,
    noise: bool = False,
) -> Array:
    """Autoregressive rollout with a fresh weight sample each step and
    optional additive state noise — ``vjf/model.py:342-361``. The single
    shared scan for every dynamics family (RBF here, kernel features in
    ``gp/sgp.py``); ``step_sample(x, eps_w, ut) -> x_next`` supplies the
    family's sampled transition.

    :param x0: (B, xdim) initial state
    :param u: optional (n_step, B, udim) controls
    :return: (n_step + 1, B, xdim) trajectory including x0
    """
    x0 = jnp.atleast_2d(x0)
    sqrt_v = jnp.exp(0.5 * logvar)
    nf, nout = blr.w_mean.shape

    keys = jax.random.split(key, n_step)
    us = u if u is not None else jnp.zeros((n_step, 0))

    def body(x, inp):
        k, ut = inp
        kw, kn = jax.random.split(k)
        eps_w = jax.random.normal(kw, (nf, nout), dtype=x.dtype)
        ut = ut if ut.shape[-1] > 0 else None
        x_next = step_sample(x, eps_w, ut)
        if noise:
            x_next = x_next + jax.random.normal(kn, x_next.shape, x.dtype) * sqrt_v
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, (keys, us))
    return jnp.concatenate([x0[None], xs], axis=0)


def forecast(
    state: DynamicsState,
    x0: Array,
    key: jax.Array,
    n_step: int,
    u: Optional[Array] = None,
    noise: bool = False,
    leak: float = 0.0,
) -> Array:
    """RBF-dynamics rollout — ``vjf/model.py:342-361`` (see
    :func:`sampled_rollout`)."""
    w_sqrt = regression.weight_sqrt(state.blr)  # V constant during rollout

    def step(x, eps_w, ut):
        return transition_sample(state, x, eps_w, ut, leak, weight_sqrt=w_sqrt)

    return sampled_rollout(
        state.blr, state.logvar, step, x0, key, n_step, u=u, noise=noise
    )


def update_from_features(
    cfg: VJFConfig,
    state: DynamicsState,
    xt: Array,
    xs: Array,
    feat: Array,
    warm_up: bool = False,
    weights: Optional[Array] = None,
    warm_gate: Optional[Array] = None,
) -> DynamicsState:
    """Closed-form learning step with precomputed features —
    ``vjf/model.py:363-377``.

    RLS on ``dx = x[t] - x[s]`` (skipped during warm-up), then the state
    noise is refreshed by a running variance of the post-update residual
    MSE (cap 500). Mirrors the reference's ordering: residual uses the *new*
    weights when RLS ran.

    ``weights``: optional (B,) 0/1 trial mask (ragged trials). A masked
    row's feature row is zeroed — a zero row contributes nothing to the RLS
    sufficient statistics ``F^T F`` / ``F^T dx`` — and it is excluded from
    the residual MSE and the sample count.

    ``warm_gate``: optional traced phase gate (see
    :func:`blr_residual_update`).
    """
    blr, logvar, n_sample = blr_residual_update(
        cfg, state.blr, state.logvar, state.n_sample, xt, xs, feat,
        warm_up=warm_up, weights=weights, update_rule=cfg.dynamics_update,
        warm_gate=warm_gate,
    )
    return DynamicsState(state.rbf, blr, logvar, n_sample)


def blr_residual_update(
    cfg: VJFConfig,
    blr,
    logvar: Array,
    n_sample: Array,
    xt: Array,
    xs: Array,
    feat: Array,
    warm_up: bool = False,
    weights: Optional[Array] = None,
    update_rule: str = "rls",
    warm_gate: Optional[Array] = None,
) -> Tuple[Any, Array, Array]:
    """The shared dynamics-learning tail (every dynamics family):
    closed-form weight update on ``dx`` (skipped during warm-up), then the
    state noise refreshed by a running variance of the POST-update residual
    MSE — the reference's ordering (``vjf/model.py:363-377``).

    ``warm_gate``: optional TRACED scalar phase gate (1.0 = warm-up) for
    ensemble fits whose members occupy different phases within one
    dispatch (``parallel.fit_ensemble``). When given it OVERRIDES the
    static ``warm_up`` flag: the weight update is computed unconditionally
    and selected away while the gate is warm, so the residual/running-var
    tail sees exactly the state either static phase would have seen.

    :return: ``(blr, logvar, n_sample)`` for the caller's state container.
    """
    if weights is not None:
        feat = feat * weights.astype(feat.dtype)[:, None]
    dx = xt - xs
    if not warm_up or warm_gate is not None:
        if update_rule == "kalman":
            # the reference's commented weight-diffusion alternative
            # (vjf/model.py:372): w[t] = w[t-1] + N(0, diffusion I)
            new_blr = regression.kalman(
                blr, feat, dx, jnp.exp(logvar), diffusion=cfg.kalman_diffusion,
                quirk=cfg.joseph_quirk,
            )
        else:
            new_blr = regression.rls(
                blr, feat, dx, jnp.exp(logvar),
                shrink=cfg.rls_shrink, jitter=cfg.chol_jitter,
            )
        if warm_gate is None:
            blr = new_blr
        else:
            blr = jax.tree.map(
                lambda n, o: jnp.where(warm_gate > 0, o, n), new_blr, blr
            )

    residual = dx - regression.predict_gaussian(blr, feat).mean
    if weights is None:
        mse = jnp.mean(jnp.square(residual))
        count = xs.shape[0]
    else:
        mse = batch_weighted_mean(
            jnp.mean(jnp.square(residual), axis=-1), weights
        )
        count = jnp.sum(weights.astype(feat.dtype))
    var, n_new = running_var(
        jnp.exp(logvar), n_sample, mse, count, size_cap=cfg.state_var_cap
    )
    new_logvar = jnp.clip(jnp.log(var), -cfg.logvar_clamp, cfg.logvar_clamp)
    # gate on the VARIANCE, not the clipped log: an inf/NaN running var
    # (overflowing residual from finite-huge weights) is SKIPPED, while
    # var == 0 (log = -inf) legitimately clamps to the floor
    ok = jnp.isfinite(var)
    return (
        blr,
        jnp.where(ok, new_logvar, logvar),
        jnp.where(ok, n_new.astype(jnp.int32), n_sample),
    )


def dynamics_update(
    cfg: VJFConfig,
    state: DynamicsState,
    xt: Array,
    xs: Array,
    u: Optional[Array] = None,
    warm_up: bool = False,
) -> DynamicsState:
    """Closed-form learning step — ``vjf/model.py:363-377``."""
    xs = jnp.atleast_2d(xs)
    xt = jnp.atleast_2d(xt)
    return update_from_features(
        cfg, state, xt, xs, features(state, xs, u), warm_up=warm_up
    )


def dynamics_initialize(
    cfg: VJFConfig,
    key: jax.Array,
    state: DynamicsState,
    xt: Array,
    xs: Array,
    u: Optional[Array] = None,
    weights: Optional[Array] = None,
) -> DynamicsState:
    """Post-warm-up bootstrap from the pooled posterior means —
    ``vjf/model.py:379-388`` + ``vjf/module.py:144-150``: re-init centroids
    to U[-r, r] with ``r = max ||xu||``, widths to ``log r``, run one RLS
    pass on ``dx`` with the naive-MSE noise, then set the state noise to the
    post-fit residual MSE.

    ``weights``: optional (N,) 0/1 mask over the pooled ``(xt, xs)`` pairs
    (ragged trials: a pair is valid iff both endpoints are observed —
    frozen-carry duplicates would otherwise teach ``f = 0`` at trial ends).
    """
    xs = jnp.atleast_2d(xs)
    xt = jnp.atleast_2d(xt)
    xu = nonecat(xs, u)
    dx = xt - xs

    rbf = reinit_rbf(key, state.rbf, xu)
    feat = apply_rbf(rbf, xu)
    if weights is None:
        mse0 = jnp.mean(jnp.square(dx))
    else:
        feat = feat * weights.astype(feat.dtype)[:, None]
        mse0 = batch_weighted_mean(jnp.mean(jnp.square(dx), axis=-1), weights)
    blr = regression.one_shot_rls(
        state.blr, feat, dx, mse0, shrink=cfg.rls_shrink, jitter=cfg.chol_jitter
    )
    residual = dx - regression.predict_gaussian(blr, feat).mean
    if weights is None:
        mse = jnp.mean(jnp.square(residual))
    else:
        mse = batch_weighted_mean(jnp.mean(jnp.square(residual), axis=-1), weights)
    return DynamicsState(rbf, blr, jnp.log(mse), state.n_sample)


def dynamics_loss(
    state: DynamicsState, pt: Gaussian, qt: Gaussian, trace_quirk: bool = True,
    weights: Optional[Array] = None,
) -> Array:
    """``gaussian_loss(pt, qt, state_logvar)`` — ``vjf/model.py:390-391``."""
    return gaussian_loss(pt, qt, state.logvar, trace_quirk=trace_quirk,
                         weights=weights)
