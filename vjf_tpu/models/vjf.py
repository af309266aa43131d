"""VJF orchestrator: the fused filter-then-learn step, scan, and fit loop.

TPU-native re-design of ``/root/reference/vjf/model.py:50-324`` (``VJF``).
The reference runs a Python loop that, per timestep, builds an autograd
graph, steps SGD, and does a closed-form RLS update (~400 steps/s on CPU).
Here the *entire* step — recognition forward, ELBO, backward, clipped SGD,
RLS, running-variance noise updates — is one pure function
:func:`filter_step` of an explicit :class:`TrainState` pytree, and a whole
epoch is a single ``lax.scan`` over time with donated carry. Trials ride the
batch axis and shard across a device mesh (see ``vjf_tpu.parallel``).

Data-dependent control flow (warm-up plateau exit, convergence, decoder
freeze — ``vjf/model.py:278-295``) lives in the host-side :func:`fit` loop
at epoch granularity, outside jit, exactly where the reference's own
epoch-boundary logic sits.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..config import StepFlags, VJFConfig
from ..ops.functional import finite_or_zero, gaussian_entropy, reparametrize
from ..ops.pallas import fused_step as _fused
from ..types import Gaussian
from . import dynamics as dyn
from .decoder import decode, init_decoder
from .likelihoods import (
    gaussian_lik_update,
    gaussian_nll,
    init_gaussian_lik,
    init_poisson_lik,
    poisson_nll,
)
from .recognition import LinearParams, RecognitionParams, apply_recognition, init_recognition

logger = logging.getLogger(__name__)


class PriorParams(NamedTuple):
    """Learnable-in-name-only initial-state prior: the reference registers
    these as Parameters but excludes them from every optimizer group
    (``vjf/model.py:66-77``), so they stay at zero. Kept for API parity."""

    mean: Array     # (xdim,)
    logvar: Array   # (xdim,)


class Params(NamedTuple):
    """The gradient-trained parameter pytree (SGD + value clip 1.0)."""

    recognition: RecognitionParams
    decoder: LinearParams
    likelihood: object            # GaussianLikParams | PoissonLikParams
    prior: PriorParams


class TrainState(NamedTuple):
    """Everything that evolves during training, in one checkpointable pytree.

    The reference scatters this across Parameters, plain attributes
    (invisible to ``state_dict()`` — ``vjf/module.py:46-54``), and Python
    ints; here it is a single pytree so checkpoint/resume is exact.
    """

    params: Params
    dynamics: dyn.DynamicsState
    lik_n_sample: Array           # float counter, vjf/likelihood.py:17 — float
                                  # (not the reference's int) because channel-
                                  # masked updates accumulate FRACTIONAL row
                                  # counts sum(mask)/ydim; integer values stay
                                  # exact in f32 up to the 1000 cap


class Metrics(NamedTuple):
    """Per-step ELBO components (sign conventions of ``vjf/model.py:151``:
    recon/dynamics/entropy are the *ELBO* terms, loss the negative ELBO).

    ``tau`` (fused path only) is the per-step Newton-Schulz residual bound —
    the cond-free mega segment self-reports it so the host can detect the
    (never-observed) case of an update skipped at ``tau >= NS_TAU_MAX``.
    """

    loss: Array
    recon: Array
    dynamics: Array
    entropy: Array
    tau: Optional[Array] = None


def init_state(
    key: jax.Array,
    cfg: VJFConfig,
    backend: Optional[str] = None,
    batch_hint: Optional[int] = None,
) -> TrainState:
    """Build a fresh model — the functional ``VJF.make_model``
    (``vjf/model.py:309-319``).

    ``batch_hint`` (expected per-step trial count) lets the ``'auto'`` RLS
    backend pick the covariance form for true-streaming workloads (B small
    relative to the feature count — only a B x B factorization per step).
    """
    k_rec, k_dec, k_dyn = jax.random.split(key, 3)
    dtype = cfg.jdtype
    if cfg.likelihood == "gaussian":
        lik = init_gaussian_lik(cfg.init_obs_logvar, dtype=dtype)
    elif cfg.likelihood == "poisson":
        lik = init_poisson_lik(dtype=dtype)
    else:
        raise ValueError(f"unknown likelihood: {cfg.likelihood}")
    params = Params(
        recognition=init_recognition(
            k_rec, cfg.ydim, cfg.xdim, cfg.udim, cfg.hidden_sizes, dtype=dtype
        ),
        decoder=init_decoder(k_dec, cfg.xdim, cfg.ydim, dtype=dtype),
        likelihood=lik,
        prior=PriorParams(
            mean=jnp.zeros((cfg.xdim,), dtype=dtype),
            logvar=jnp.zeros((cfg.xdim,), dtype=dtype),
        ),
    )
    backend = backend or dyn.resolve_backend(cfg, batch_hint=batch_hint)
    if cfg.dynamics == "sgp":
        from ..gp.sgp import init_sgp_dynamics

        dynamics = init_sgp_dynamics(k_dyn, cfg, backend=backend)
    else:
        dynamics = dyn.init_dynamics(k_dyn, cfg, backend=backend)
    return TrainState(params=params, dynamics=dynamics, lik_n_sample=jnp.zeros((), dtype))


def prior(params: Params, n_batch: int) -> Gaussian:
    """Broadcast the prior over the batch — ``vjf/model.py:80-95``."""
    return Gaussian(
        jnp.broadcast_to(params.prior.mean, (n_batch, params.prior.mean.shape[-1])),
        jnp.broadcast_to(params.prior.logvar, (n_batch, params.prior.logvar.shape[-1])),
    )


def _likelihood_loss(
    cfg: VJFConfig, lik_params, py: Array, y: Array,
    weights: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
) -> Array:
    if cfg.likelihood == "gaussian":
        return gaussian_nll(lik_params, py, y, weights=weights,
                            channel_mask=channel_mask)
    return poisson_nll(py, y, clamp=cfg.poisson_clamp, weights=weights,
                       channel_mask=channel_mask)


def _impute_y(cfg: VJFConfig, params: Params, qs: Gaussian, y: Array,
              channel_mask: Array) -> Array:
    """Model-based imputation of missing observation channels for the
    recognition input: masked entries are replaced by the decoder's
    prediction from the previous posterior mean (Gaussian: the predicted
    mean; Poisson: the predicted rate ``exp(min(eta, clamp))`` — the
    recognition net sees count-scale inputs). ``stop_gradient`` keeps the
    imputation from coupling the decoder into the recognition gradient —
    it is an input preprocessing step, not part of the ELBO."""
    eta = decode(params.decoder, jnp.atleast_2d(qs.mean))
    if cfg.likelihood != "gaussian":
        eta = jnp.exp(jnp.minimum(eta, cfg.poisson_clamp))
    y_hat = jax.lax.stop_gradient(eta)
    return jnp.where(channel_mask > 0, y, y_hat)


def _transition(cfg: VJFConfig):
    if cfg.dynamics == "sgp":
        from ..gp import sgp as mod
    else:
        mod = dyn
    return mod


def elbo_terms(
    cfg: VJFConfig,
    params: Params,
    dynamics,
    qs: Gaussian,
    y: Array,
    u: Optional[Array],
    eps_s: Array,
    eps_t: Array,
    weights: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
) -> Tuple[Tuple[Array, Array, Array], Tuple[Gaussian, Array, Array, Array]]:
    """Forward pass + the three ELBO components — ``vjf/model.py:97-154``.

    Sampling noise is injected (``eps_s`` for x[t-1] ~ q[t-1], ``eps_t`` for
    x[t] ~ q[t]) so parity harnesses can drive both frameworks with shared
    randomness. ``weights``: optional (B,) 0/1 trial mask — every batch
    reduction becomes a masked mean over the valid trials (ragged trials).
    ``channel_mask``: optional (B, ydim) 0/1 missing-observation mask —
    masked entries drop out of the likelihood channel sum and the
    recognition input sees the model's imputation (:func:`_impute_y`);
    ``y`` must already be sanitized at masked entries (finite values).
    """
    tr = _transition(cfg)
    xs = reparametrize(qs, eps_s)                        # vjf/model.py:112
    feat = tr.features(dynamics, xs, u)                  # shared: predict + RLS
    pt = tr.predict_from_features(dynamics, xs, feat, cfg.leak)
    y_rec = y if channel_mask is None else _impute_y(
        cfg, params, qs, y, channel_mask
    )
    qt = apply_recognition(
        params.recognition, y_rec, qs, u, activation=cfg.recognition_activation
    )                                                    # vjf/model.py:116
    # runaway guard: never binds in sane regimes (see VJFConfig.logvar_clamp)
    qt = Gaussian(qt.mean, jnp.clip(qt.logvar, -cfg.logvar_clamp, cfg.logvar_clamp))
    xt = reparametrize(qt, eps_t)                        # vjf/model.py:119
    py = decode(params.decoder, xt)                      # sample decode, model.py:120

    l_recon = finite_or_zero(
        _likelihood_loss(cfg, params.likelihood, py, y, weights=weights,
                         channel_mask=channel_mask)
    )
    l_dyn = finite_or_zero(
        tr.dynamics_loss(dynamics, pt, qt, trace_quirk=cfg.trace_quirk,
                         weights=weights)
    )
    h = finite_or_zero(gaussian_entropy(qt, weights=weights))
    return (l_recon, l_dyn, h), (qt, xt, xs, py, feat)


def filter_step(
    cfg: VJFConfig,
    flags: StepFlags,
    state: TrainState,
    qs: Gaussian,
    y: Array,
    u: Optional[Array],
    eps_s: Array,
    eps_t: Array,
    lr: Array,
    mask: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
    warm_gate: Optional[Array] = None,
) -> Tuple[TrainState, Gaussian, Metrics]:
    """One fused filter-then-learn step — the body of ``VJF.filter``
    (``vjf/model.py:179-221``), compiled as a single XLA computation.

    ``warm_gate``: optional TRACED scalar phase gate (1.0 = warm-up),
    the ensemble-fit mechanism for members in different phases sharing one
    dispatch (``parallel.fit_ensemble``). When given it overrides
    ``flags.warm_up`` / ``flags.train_decoder``: the dynamics loss term is
    scaled by ``(1 - warm_gate)``, the decoder SGD step is select-gated on
    ``warm_gate > 0`` (trains only while warm), and the closed-form weight
    update is computed then select-gated (see
    :func:`~vjf_tpu.models.dynamics.blr_residual_update`). With
    ``warm_gate`` at a constant 0.0/1.0 this is numerically identical to
    the corresponding static-flag trace (``0 * l_dyn`` adds exact zeros;
    selects copy bits) — property-tested in ``tests/test_ensemble.py``.

    Order mirrors the reference exactly: forward → loss → clipped SGD step
    → non-gradient updates (obs-noise running variance with the *post-SGD*
    log-variance, then RLS + state-noise running variance).

    ``mask``: optional (B,) 0/1 trial-validity mask (ragged trials — the
    reference trains only lockstep batches, ``vjf/model.py:183,253``). A
    masked trial contributes nothing this step: its inputs are sanitized to
    zero (so padding may be arbitrary finite OR non-finite), its loss /
    gradient / RLS / noise-update contributions are excluded with
    renormalization over the valid count, and its posterior carry is frozen
    at the last valid value. ``mask=None`` traces to the identical
    computation as before (the fused Pallas path never passes one).

    ``channel_mask``: optional (B, ydim) 0/1 missing-observation mask
    (electrode dropout — no reference counterpart). Masked entries drop
    out of the likelihood channel sum and the obs-noise update; the
    recognition input sees the model's imputation (the decoder's
    prediction from q[t-1]) at missing entries, so the posterior update
    is a genuine partial-observation filter step (an all-masked row is a
    pure prediction step). The carry does NOT freeze — that's the trial
    mask's job. Missing entries of ``y`` may hold arbitrary values
    (NaN-safe). Composes with ``mask``.
    """
    qs = jax.lax.stop_gradient(Gaussian(*qs))            # detach, vjf/model.py:45-47,110
    y = jnp.atleast_2d(y)
    weights = None
    if channel_mask is not None:
        cm = jnp.atleast_2d(channel_mask).astype(bool)   # (B, ydim)
        # sanitize: NaN at missing entries would poison the backward pass
        # (0-cotangent x NaN-activation = NaN in grad sums)
        y = jnp.where(cm, y, 0.0)
        channel_mask = cm.astype(y.dtype)
    if mask is not None:
        mb = jnp.atleast_1d(mask).astype(bool)           # (B,)
        weights = mb.astype(y.dtype)
        # sanitize masked inputs: NaN padding would otherwise poison the
        # backward pass (0-cotangent x NaN-activation = NaN in grad sums)
        y = jnp.where(mb[:, None], y, 0.0)
        if u is not None and u.shape[-1] > 0:
            u = jnp.where(mb[:, None], jnp.atleast_2d(u), 0.0)

    def loss_fn(params: Params):
        (l_recon, l_dyn, h), aux = elbo_terms(
            cfg, params, state.dynamics, qs, y, u, eps_s, eps_t,
            weights=weights, channel_mask=channel_mask,
        )
        loss = l_recon - h
        if warm_gate is not None:
            # traced phase: (1 - gate) * l_dyn is exactly l_dyn when the
            # gate is 0.0 and an exact zero (value AND gradient) at 1.0
            loss = loss + (1.0 - warm_gate) * l_dyn
        elif not flags.warm_up:                          # vjf/model.py:147-149
            loss = loss + l_dyn
        return loss, (aux, Metrics(loss, -l_recon, -l_dyn, h))

    if flags.sgd:
        (loss, ((qt, xt, xs, py, feat), metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # The reference catches a RuntimeError from backward and skips the
        # step (vjf/model.py:212-214); branchless equivalent: skip when any
        # RAW gradient is non-finite. Checked BEFORE the value clip so an
        # overflowed (inf) gradient skips rather than stepping with the
        # clip bound — mirrored exactly by the fused kernel's grad_check
        # gate (ops/pallas/fused_step.py:FusedSums).
        ok = jax.tree_util.tree_reduce(
            lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
            grads,
            jnp.asarray(True),
        )
        # clip_grad_value_(1.0) — vjf/model.py:210
        grads = jax.tree.map(lambda g: jnp.clip(g, -cfg.clip, cfg.clip), grads)

        def sgd(p, g):
            # select, don't scale: 0 * NaN = NaN would poison the params
            # straight through the skip gate
            return jax.tree.map(
                lambda pi, gi: jnp.where(ok, pi - lr * gi, pi), p, g
            )

        params = state.params
        if warm_gate is not None:
            # decoder trains only during warm-up (the fit loop's freeze,
            # vjf/model.py:283) — select-gated per traced phase
            dec_new = sgd(params.decoder, grads.decoder)
            decoder = jax.tree.map(
                lambda a, b: jnp.where(warm_gate > 0, a, b),
                dec_new, params.decoder,
            )
        elif flags.train_decoder:
            decoder = sgd(params.decoder, grads.decoder)
        else:
            decoder = params.decoder
        new_params = Params(
            recognition=sgd(params.recognition, grads.recognition),
            decoder=decoder,
            likelihood=sgd(params.likelihood, grads.likelihood),
            prior=params.prior,                          # never in the optimizer
        )
    else:
        loss, ((qt, xt, xs, py, feat), metrics) = loss_fn(state.params)
        new_params = state.params

    dynamics = state.dynamics
    lik_n = state.lik_n_sample
    if flags.update:                                     # vjf/model.py:156-177
        if cfg.likelihood == "gaussian" and flags.update_likelihood:
            new_lik, lik_n = gaussian_lik_update(
                new_params.likelihood, lik_n, py, y,
                size_cap=cfg.obs_var_cap, logvar_clamp=cfg.logvar_clamp,
                weights=weights, channel_mask=channel_mask,
            )
            new_params = new_params._replace(likelihood=new_lik)
    if flags.update and flags.update_transition:
        new_dynamics = _transition(cfg).update_from_features(
            cfg, dynamics, xt, xs, jax.lax.stop_gradient(feat),
            warm_up=flags.warm_up, weights=weights, warm_gate=warm_gate,
        )
        # skip the closed-form update entirely if its inputs OR outputs are
        # non-finite (the unguarded recursion would otherwise cement NaNs
        # into P/V — e.g. an f32 overflow in the exact-path Cholesky)
        upd_ok = jnp.logical_and(
            jnp.all(jnp.isfinite(xt)), jnp.all(jnp.isfinite(xs))
        )
        if weights is not None:
            # a fully-masked step must not advance the recursion (shrink
            # would decay P with no data behind it)
            upd_ok = jnp.logical_and(upd_ok, jnp.sum(weights) > 0)
        upd_ok = jax.tree_util.tree_reduce(
            lambda acc, leaf: jnp.logical_and(
                acc,
                jnp.all(jnp.isfinite(leaf))
                if jnp.issubdtype(leaf.dtype, jnp.floating)
                else acc,
            ),
            new_dynamics,
            upd_ok,
        )
        dynamics = jax.tree.map(
            lambda new_leaf, old_leaf: jnp.where(upd_ok, new_leaf, old_leaf),
            new_dynamics,
            dynamics,
        )

    if mask is not None:
        # frozen carry: a masked trial's posterior stays at its last valid
        # value (it re-enters the recognition input when the trial resumes)
        qt = Gaussian(
            jnp.where(mb[:, None], qt.mean, qs.mean),
            jnp.where(mb[:, None], qt.logvar, qs.logvar),
        )
    new_state = TrainState(params=new_params, dynamics=dynamics, lik_n_sample=lik_n)
    return new_state, qt, metrics


class EpochResult(NamedTuple):
    state: TrainState
    q_means: Array    # (T, B, xdim)
    q_logvars: Array  # (T, B, xdim)
    metrics: Metrics  # per-step arrays, each (T,)


def run_epoch(
    cfg: VJFConfig,
    flags: StepFlags,
    state: TrainState,
    ys: Array,
    us: Array,
    key: jax.Array,
    lr: Array,
    noise: Optional[Tuple[Array, Array]] = None,
    q0: Optional[Gaussian] = None,
    mask: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
    warm_gate: Optional[Array] = None,
) -> EpochResult:
    """One full pass over time as a single ``lax.scan`` — replaces the hot
    Python loop at ``vjf/model.py:252-258``.

    ``warm_gate``: optional traced scalar phase gate (see
    :func:`filter_step`); a gated epoch always takes the XLA scan (the
    pallas kernels bake the phase in statically — the ensemble driver
    routes phase-mixed epochs here and phase-uniform epochs to the
    static-flag fused path).

    :param ys: (T, B, ydim)
    :param us: (T, B, udim); pass udim=0 for autonomous systems
    :param noise: optional pre-generated (eps_s, eps_t), each (T, B, xdim),
        for golden-parity runs with injected randomness
    :param q0: posterior carried in from a previous chunk (streaming);
        defaults to the prior (``vjf/model.py:252``: ``q = None``)
    :param mask: optional (T, B) 0/1 trial-validity mask (ragged trials —
        see :func:`filter_step`); rides the fused/mega kernels (they carry
        the mask as an extra per-step input and renormalize over the valid
        count; the sharded path rides it too — see
        ``parallel.sharded.run_epoch_fused_sharded(mask=...)``)
    :param channel_mask: optional (T, B, ydim) 0/1 missing-observation mask
        (electrode dropout — see :func:`filter_step`); rides the fused/mega
        kernels too (the imputation feedback is one extra in-kernel decoder
        matmul from the previous posterior mean)
    """
    t_len, n_batch, _ = ys.shape
    # integer observation streams (e.g. uint8 spike counts, shipped over the
    # host->device link at 1/4 the f32 bytes) upcast HERE, on device — free
    # under jit, and every downstream consumer (noise draws, masks, kernels)
    # sees cfg.jdtype exactly as before
    if ys.dtype != cfg.jdtype:
        ys = ys.astype(cfg.jdtype)
    if us.dtype != cfg.jdtype:
        us = us.astype(cfg.jdtype)
    # promotion helpers, not bare broadcast_to: a (T,) per-time trial mask
    # must gain a TRIAL axis — right-aligned broadcasting raises at T != B
    # and silently transposes it into a per-trial mask at T == B (the same
    # trap documented at parallel/sharded.py's call path)
    mask = _promote_mask(mask, t_len, n_batch, ys.dtype)
    channel_mask = _promote_channel_mask(channel_mask, ys.shape, ys.dtype)
    if warm_gate is None and _fused.fused_enabled(cfg, state, n_batch=n_batch):
        return _fused.run_epoch_fused(
            cfg, flags, state, ys, us, key, lr, noise=noise, q0=q0, mask=mask,
            channel_mask=channel_mask,
        )
    xdim = cfg.xdim
    if q0 is None:
        q0 = prior(state.params, n_batch)

    if noise is None:
        # One vectorized draw for the whole epoch: keeps per-step threefry
        # chains (serial, latency-bound) out of the scan body.
        eps = jax.random.normal(key, (t_len, 2, n_batch, xdim), ys.dtype)
        noise = (eps[:, 0], eps[:, 1])

    # mask-free trace: identical to the pre-mask computation (None-ness is
    # preserved into filter_step so the unmasked path is untouched); the
    # masks were already promoted to (T, B) / (T, B, ydim) above
    have_m = mask is not None
    have_cm = channel_mask is not None
    scan_elems = [ys, us, noise[0], noise[1]]
    if have_m:
        scan_elems.append(mask)
    if have_cm:
        scan_elems.append(channel_mask)

    def body(carry, inp):
        st, q = carry
        y, u, eps_s, eps_t, *rest = inp
        m = rest[0] if have_m else None
        cmk = rest[-1] if have_cm else None
        st, q, metrics = filter_step(
            cfg, flags, st, q, y, u, eps_s, eps_t, lr,
            mask=m, channel_mask=cmk, warm_gate=warm_gate,
        )
        return (st, q), (q, metrics)

    (state, _), (q_seq, metrics) = jax.lax.scan(
        body, (state, q0), tuple(scan_elems)
    )
    return EpochResult(state, q_seq.mean, q_seq.logvar, metrics)


class EpochsResult(NamedTuple):
    state: TrainState
    q_means: Array        # (T, B, xdim) — LAST epoch only
    q_logvars: Array      # (T, B, xdim)
    epoch_loss: Array     # (n_epochs,) mean loss per epoch
    epoch_metrics: Metrics  # each (n_epochs,) epoch means
    max_tau: Array        # (n_epochs,) fused path only; zeros otherwise
    hot_frac: Array       # (n_epochs,) fraction of post-prefix steps at or
    #                       above the Newton-Schulz skip ceiling (the mega
    #                       layout's demotion signal); zeros on other paths


def epoch_tau_stats(cfg: VJFConfig, metrics: Metrics, t_len: int, dtype):
    """(max finite tau, hot fraction) over the post-prefix segment.

    Post-prefix only: inside the exact-inverse prefix tau may spike
    (including the forced-fallback inf marker) by design — the cond
    fallback repairs it there. Only the cond-free segment's tau is a
    health signal. Skipped-at-ceiling steps carry an inf marker in the
    tau stream; the diagnostic magnitude is the max FINITE bound (hot
    detection still counts the infs via ``>= NS_TAU_MAX``). Zeros when
    the path reports no tau (XLA step) or the epoch fits in the prefix.
    Shared by :func:`run_epochs` and the sharded block-dispatch scan
    (``parallel.sharded.run_epochs_fused_sharded``).
    """
    if metrics.tau is not None and t_len > cfg.ns_prefix:
        tau_seg = metrics.tau[cfg.ns_prefix:]
        max_tau = jnp.max(jnp.where(jnp.isfinite(tau_seg), tau_seg, 0.0))
        hot = jnp.mean((tau_seg >= _fused.NS_TAU_MAX).astype(dtype))
    else:
        max_tau = jnp.zeros((), dtype)
        hot = jnp.zeros((), dtype)
    return max_tau, hot


def run_epochs(
    cfg: VJFConfig,
    flags: StepFlags,
    state: TrainState,
    ys: Array,
    us: Array,
    keys: jax.Array,
    lrs: Array,
    q0: Optional[Gaussian] = None,
    mask: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
    warm_gate: Optional[Array] = None,
) -> EpochsResult:
    """Run ``len(keys)`` consecutive epochs in ONE compiled computation.

    ``warm_gate``: optional traced scalar phase gate held constant across
    the block (see :func:`filter_step`) — the blocked-ensemble driver's
    mechanism for members in different phases sharing one dispatch.

    The reference's ``fit`` syncs to host every epoch only to drive the
    plateau logic (``vjf/model.py:276-295``); between those decisions the
    epochs are a pure chain. Scanning them device-side amortizes dispatch
    latency and keeps the chip busy — the natural unit for a production
    training loop is "K epochs per dispatch, host checks the plateau every
    K". Per-epoch posterior sequences are not stacked (that would hold
    n_epochs copies of a (T, B, xdim) buffer); the last epoch's posteriors
    — the ones ``fit`` consumes — ride the scan carry.

    :param keys: (n_epochs, 2) PRNG keys (one per epoch)
    :param lrs: (n_epochs,) learning rate per epoch (ExponentialLR schedule)
    """
    t_len, n_batch, _ = ys.shape
    if q0 is None:
        q0 = prior(state.params, n_batch)
    # the compute dtype, NOT ys.dtype: integer wire-format observations
    # (e.g. uint8 counts) upcast inside run_epoch, so the scan carry and
    # the tau statistics must be built in cfg.jdtype or the carry dtypes
    # mismatch (and a uint8 hot-fraction mean truncates to 0/1)
    qdt = cfg.jdtype

    def body(carry, inp):
        st, _, _ = carry
        key, lr = inp
        res = run_epoch(cfg, flags, st, ys, us, key, lr, q0=q0, mask=mask,
                        channel_mask=channel_mask, warm_gate=warm_gate)
        mean_m = jax.tree.map(jnp.mean, res.metrics)
        max_tau, hot = epoch_tau_stats(cfg, res.metrics, t_len, qdt)
        return (res.state, res.q_means, res.q_logvars), (mean_m, max_tau, hot)

    q_shape = (t_len, n_batch, cfg.xdim)
    init = (state, jnp.zeros(q_shape, qdt), jnp.zeros(q_shape, qdt))
    (state, q_means, q_logvars), (mean_metrics, max_tau, hot_frac) = jax.lax.scan(
        body, init, (keys, lrs)
    )
    return EpochsResult(
        state=state,
        q_means=q_means,
        q_logvars=q_logvars,
        epoch_loss=mean_metrics.loss,
        epoch_metrics=mean_metrics,
        max_tau=max_tau,
        hot_frac=hot_frac,
    )


class ChunksResult(NamedTuple):
    state: TrainState
    q_means: Array        # (K, L, B, xdim) per-chunk posterior means
    q_logvars: Array      # (K, L, B, xdim)
    metrics: Metrics      # per-step arrays, each (K, L)
    q_last: Gaussian      # posterior after the final chunk (stream carry)
    hot_frac: Array       # scalar: hot fraction over ALL post-prefix steps


def run_chunks(
    cfg: VJFConfig,
    flags: StepFlags,
    state: TrainState,
    ys: Array,
    us: Array,
    keys: jax.Array,
    lr: Array,
    q0: Optional[Gaussian] = None,
    masks: Optional[Array] = None,
    channel_masks: Optional[Array] = None,
) -> ChunksResult:
    """Run ``K`` consecutive stream chunks in ONE compiled computation —
    the STREAMING analog of :func:`run_epochs` (``VJF.filter_stream``'s
    ``chunks_per_dispatch`` mode): the posterior ``q`` carries ACROSS
    chunk boundaries inside the device-side scan (one continuous filter,
    unlike ``run_epochs`` where every epoch restarts from ``q0``), so K
    chunks cost one dispatch round-trip instead of K. Observations may
    arrive in the integer wire dtype (e.g. uint8 spike counts — 1/4 the
    host->device bytes); :func:`run_epoch` upcasts on device.

    Unlike the one-chunk-per-dispatch path, only the block-FINAL state is
    materialized (intermediate per-chunk states ride the scan carry) —
    the per-chunk posteriors/metrics are all stacked and returned.

    :param ys: (K, L, B, ydim) — K stacked chunks
    :param keys: (K,) PRNG keys (one per chunk)
    :param masks: optional (K, L, B); ``channel_masks`` (K, L, B, ydim)
    """
    k_chunks, t_len, n_batch, _ = ys.shape
    if q0 is None:
        q0 = prior(state.params, n_batch)
    qdt = cfg.jdtype
    have_m = masks is not None
    have_cm = channel_masks is not None

    def body(carry, inp):
        st, q = carry
        y, u, key, *rest = inp
        m = rest[0] if have_m else None
        cmk = rest[-1] if have_cm else None
        res = run_epoch(cfg, flags, st, y, u, key, lr, q0=q, mask=m,
                        channel_mask=cmk)
        q_next = Gaussian(
            res.q_means[-1].astype(qdt), res.q_logvars[-1].astype(qdt)
        )
        _, hot = epoch_tau_stats(cfg, res.metrics, t_len, qdt)
        return (res.state, q_next), (
            res.q_means, res.q_logvars, res.metrics, hot
        )

    elems = [ys, us, keys]
    if have_m:
        elems.append(masks)
    if have_cm:
        elems.append(channel_masks)
    (state, q_last), (q_means, q_logvars, metrics, hot) = jax.lax.scan(
        body, (state, Gaussian(q0.mean.astype(qdt), q0.logvar.astype(qdt))),
        tuple(elems),
    )
    return ChunksResult(
        state=state, q_means=q_means, q_logvars=q_logvars, metrics=metrics,
        q_last=q_last, hot_frac=jnp.mean(hot),
    )


# ---------------------------------------------------------------------------
# Host-side fit loop (epoch-granular control flow lives outside jit)
# ---------------------------------------------------------------------------


def _isclose(a: float, b: float, rtol: float, atol: float = 1e-8) -> bool:
    """torch.isclose semantics (``vjf/model.py:279,293``).

    Non-finite values are never "close" (guards against a transient inf
    epoch loss poisoning the running loss and `inf <= inf` reading as a
    spurious plateau/convergence).
    """
    import math

    if not (math.isfinite(a) and math.isfinite(b)):
        return False
    return abs(a - b) <= atol + rtol * abs(b)


@dataclass
class FitResult:
    mu: Array         # (T, B, xdim) posterior means, final epoch
    logvar: Array     # (T, B, xdim)
    loss: float       # final epoch mean loss
    state: TrainState
    warm_up: bool = True   # False once the plateau fired (decoder frozen —
                           # persists like requires_grad_(False), model.py:283)
    lr: float = float("nan")     # learning rate AFTER the run's decay steps —
                                 # the ExponentialLR schedule position, for
                                 # exact resume (vjf/model.py:78)
    epochs_run: int = 0          # epochs actually executed (early convergence
                                 # breaks out before max_iter)
    # cfg.select='forecast' only: the epoch whose snapshot was returned and
    # its rollout-RMSE selection metric (mu/logvar/loss/state above are that
    # epoch's). lr stays the FULL run's schedule position (a resumed fit
    # continues the schedule, not the snapshot). None/nan under
    # select='loss' or if warm-up never ended.
    selected_epoch: Optional[int] = None
    selected_metric: float = float("nan")


class FitSnapshot(NamedTuple):
    """The COMPLETE solo ``fit`` loop state at an epoch boundary — the
    solo mirror of ``parallel.ensemble.EnsembleSnapshot`` (r4): an
    interrupted fit resumes BIT-identically to the uninterrupted run.
    Persisted via ``utils.checkpoint.save_ensemble_checkpoint`` (the
    generic atomic single-file pytree format)."""

    epoch: object           # completed epochs
    warm_up: object
    lr: object              # ExponentialLR schedule position
    running_loss: object
    plateau_hits: object
    key: object             # the fit PRNG chain
    state: object           # TrainState
    mu: object              # last epoch's (T, B, xdim) posteriors
    logvar: object
    epoch_loss: object
    demoted: object         # hot-tau demotion active (cfg_run != cfg)
    demote_epoch: object    # -1 encodes None
    repromotes_left: object
    best: object            # select='forecast': (state, mu, lv, loss,
    #                         epoch, metric) | None
    cfg_digest: object      # resume-compatibility fingerprint
    # the selection PRNG base (fold_in(entry_key, _SELECT_SALT)): derived
    # from the ORIGINAL run's entry key, which resume supersedes — it must
    # ride the snapshot or the resumed run would select on a different
    # metric stream. None when select='loss'.
    sel_base: object = None
    # epochs_per_dispatch of the saving run (validated on resume — a
    # different blocking changes the key-split and plateau cadence)
    k_block: object = None
    # prefix-free continuation engaged at the boundary (r5; blocked mode
    # only — None in older snapshots restores as False and re-engages
    # after one clean block)
    prefix_free: object = None


def _make_fit_snapshot(cfg, epoch, warm_up, lr, running_loss, plateau_hits,
                       key, state, result, epoch_loss, demoted,
                       demote_epoch, repromotes_left, best_snap, best_sel,
                       sel_base=None, k_block=1, prefix_free=False):
    from ..utils.checkpoint import config_digest

    best = None
    if best_snap is not None:
        b_state, b_mu, b_lv, b_loss, b_epoch = best_snap
        best = (b_state, b_mu, b_lv, np.float64(b_loss),
                np.int64(b_epoch), np.float64(best_sel))
    return FitSnapshot(
        epoch=np.int64(epoch), warm_up=np.bool_(warm_up),
        lr=np.float64(lr), running_loss=np.float64(running_loss),
        plateau_hits=np.int64(plateau_hits), key=key, state=state,
        mu=result.q_means, logvar=result.q_logvars,
        epoch_loss=np.float64(epoch_loss), demoted=np.bool_(demoted),
        demote_epoch=np.int64(-1 if demote_epoch is None else demote_epoch),
        repromotes_left=np.int64(repromotes_left), best=best,
        cfg_digest=config_digest(cfg), sel_base=sel_base,
        k_block=np.int64(k_block), prefix_free=np.bool_(prefix_free),
    )


def _load_fit_snapshot(cfg, resume_from: str, k_block: int) -> FitSnapshot:
    from ..utils.checkpoint import config_digest, load_ensemble_checkpoint

    snap = load_ensemble_checkpoint(resume_from)
    if not isinstance(snap, FitSnapshot):
        raise ValueError(
            f"resume_from {resume_from!r} is not a solo-fit snapshot "
            f"(got {type(snap).__name__}); fit_ensemble snapshots resume "
            "through fit_ensemble"
        )
    if not np.array_equal(np.asarray(snap.cfg_digest), config_digest(cfg)):
        raise ValueError(
            "resume_from snapshot was saved under a different config; "
            "resume with the same cfg"
        )
    if snap.k_block is not None and int(np.asarray(snap.k_block)) != k_block:
        raise ValueError(
            f"resume_from snapshot was saved with epochs_per_dispatch="
            f"{int(np.asarray(snap.k_block))}; resuming with {k_block} "
            "would change the key-split and plateau cadence (not bit-exact)"
        )
    return snap


def _restore_fit_snapshot(snap: FitSnapshot):
    """Re-host a :class:`FitSnapshot`'s loop variables — one source of
    truth for the resume state machine, shared by :func:`fit` and
    :func:`_fit_blocked` (the two copies this replaces had already
    diverged once, review r4)."""
    de = int(np.asarray(snap.demote_epoch))
    best_snap = None
    best_sel = float("inf")
    if snap.best is not None:
        b_state, b_mu, b_lv, b_loss, b_epoch, b_sel = snap.best
        best_snap = (b_state, b_mu, b_lv, float(np.asarray(b_loss)),
                     int(np.asarray(b_epoch)))
        best_sel = float(np.asarray(b_sel))
    return (
        int(np.asarray(snap.epoch)),
        bool(np.asarray(snap.warm_up)),
        float(np.asarray(snap.lr)),
        float(np.asarray(snap.running_loss)),
        int(np.asarray(snap.plateau_hits)),
        float(np.asarray(snap.epoch_loss)),
        bool(np.asarray(snap.demoted)),
        None if de < 0 else de,
        int(np.asarray(snap.repromotes_left)),
        best_snap,
        best_sel,
        (False if snap.prefix_free is None
         else bool(np.asarray(snap.prefix_free))),
    )


class StreamSnapshot(NamedTuple):
    """The COMPLETE :meth:`vjf_tpu.api.VJF.filter_stream` loop state at a
    chunk (or K-block) boundary — the streaming mirror of
    :class:`FitSnapshot` (r5, VERDICT r4 #3: an interrupted unbounded
    stream must not lose everything). Persisted via
    ``utils.checkpoint.save_ensemble_checkpoint`` (atomic single-file
    pytree). Resume is BIT-exact: the restored run continues the PRNG
    chain, posterior carry, lr, demotion machinery, and the K-block
    prefix-free contract exactly where the saving run stopped — the
    caller re-positions the chunk stream at ``chunks_done``.
    """

    chunks_done: object     # chunks fully consumed (stream position)
    state: object           # TrainState
    key: object             # the driver PRNG chain (VJF.key)
    lr: object
    q_mean: object          # posterior carry (last step) — None before
    q_logvar: object        #   the first chunk completes
    warm_up: object         # stream-level flag (validated on resume)
    decoder_frozen: object
    demoted: object         # hot-tau demotion applied (fused_step off)
    first_checked: object   # the first-chunk synchronous check ran
    pending_hot: object     # resolved hot-fraction awaiting its program
    #                         point (-1.0 encodes None) — resolving it at
    #                         save time is a pure read; applying it at
    #                         the SAME point keeps demotion timing
    #                         bit-identical to the uninterrupted stream
    k_block: object         # chunks_per_dispatch of the saving run
    cfg_digest: object


def _make_stream_snapshot(cfg, chunks_done, state, key, lr, q, warm_up,
                          decoder_frozen, demoted, first_checked,
                          pending_hot, k_block):
    from ..utils.checkpoint import config_digest

    return StreamSnapshot(
        chunks_done=np.int64(chunks_done), state=state, key=key,
        lr=np.float64(lr),
        q_mean=None if q is None else q.mean,
        q_logvar=None if q is None else q.logvar,
        warm_up=np.bool_(warm_up), decoder_frozen=np.bool_(decoder_frozen),
        demoted=np.bool_(demoted), first_checked=np.bool_(first_checked),
        pending_hot=np.float64(
            -1.0 if pending_hot is None else float(pending_hot)
        ),
        k_block=np.int64(k_block), cfg_digest=config_digest(cfg),
    )


def _load_stream_snapshot(cfg, resume_from: str, k_block: int,
                          warm_up: bool) -> StreamSnapshot:
    from ..utils.checkpoint import config_digest, load_ensemble_checkpoint

    snap = load_ensemble_checkpoint(resume_from)
    if not isinstance(snap, StreamSnapshot):
        raise ValueError(
            f"resume_from {resume_from!r} is not a filter_stream snapshot "
            f"(got {type(snap).__name__})"
        )
    # unconditional validation (r4 advisor finding on the ensemble
    # twin): a snapshot missing its fields is rejected, not trusted
    if snap.cfg_digest is None or snap.k_block is None:
        raise ValueError(
            "resume_from snapshot is missing validation fields — "
            "refusing to resume an unvalidatable snapshot"
        )
    if not np.array_equal(np.asarray(snap.cfg_digest), config_digest(cfg)):
        raise ValueError(
            "resume_from snapshot was saved under a different config; "
            "resume with the same cfg"
        )
    if int(np.asarray(snap.k_block)) != k_block:
        raise ValueError(
            f"resume_from snapshot was saved with chunks_per_dispatch="
            f"{int(np.asarray(snap.k_block))}; resuming with {k_block} "
            "would change block formation and the key chain (not bit-exact)"
        )
    if bool(np.asarray(snap.warm_up)) != bool(warm_up):
        raise ValueError(
            "resume_from snapshot was saved with warm_up="
            f"{bool(np.asarray(snap.warm_up))}; this call passes "
            f"warm_up={bool(warm_up)}"
        )
    return snap


def wire_put(y, jdtype) -> Array:
    """device_put ``y`` in its wire dtype: native when NARROWER than
    ``jdtype`` (uint8 spike counts ride the host->device link at 1/4 the
    f32 bytes — the dominant cost on tunneled/remote runtimes; the
    consumer upcasts on device), host-downcast first when WIDER (a
    float64 numpy array under x64 would otherwise ship double the bytes,
    the opposite of the optimization's intent)."""
    # the host-downcast branch is numpy-only: np.dtype() on a foreign
    # dtype object (e.g. torch.float32) raises, and any other array-like
    # (torch tensors included) went through plain jnp.asarray historically
    if (
        isinstance(y, np.ndarray)
        and y.dtype.itemsize > np.dtype(jdtype).itemsize
    ):
        y = np.asarray(y, dtype=jdtype)
    return jnp.asarray(y)


def wire_ingest(y, jdtype) -> Array:
    """Two-step ingest: :func:`wire_put` then an on-device upcast to
    ``jdtype`` (free under jit). The single point of truth for the
    integer-wire-format contract (docs/API.md)."""
    y = wire_put(y, jdtype)
    return y.astype(jdtype) if y.dtype != jdtype else y


def _promote_y(y: Array) -> Array:
    """(T, ydim) → (T, 1, ydim); (T, B, ydim) unchanged — the reference's
    ``atleast_2d`` + per-step promotion (``vjf/model.py:194-198, 236-237``)."""
    y = jnp.asarray(y)
    if y.ndim == 2:
        y = y[:, None, :]
    return y


def _promote_u(u: Optional[Array], t_len: int, n_batch: int, dtype) -> Array:
    if u is None:
        return jnp.zeros((t_len, n_batch, 0), dtype=dtype)
    u = jnp.asarray(u, dtype=dtype)
    if u.ndim == 2:
        u = u[:, None, :]
    if u.shape[1] != n_batch:
        u = jnp.broadcast_to(u, (t_len, n_batch, u.shape[-1]))
    return u


def _promote_mask(
    mask: Optional[Array], t_len: int, n_batch: int, dtype
) -> Optional[Array]:
    """Promote a (T,) / (T, B) trial-validity mask to (T, B) floats."""
    if mask is None:
        return None
    mask = jnp.asarray(mask).astype(dtype)
    if mask.ndim == 1:
        mask = mask[:, None]
    if mask.shape != (t_len, n_batch):
        mask = jnp.broadcast_to(mask, (t_len, n_batch))
    return mask


def _promote_channel_mask(
    channel_mask: Optional[Array], y_shape, dtype
) -> Optional[Array]:
    """Promote a (T, ydim) / (T, B, ydim) missing-observation mask to
    (T, B, ydim) floats."""
    if channel_mask is None:
        return None
    cm = jnp.asarray(channel_mask).astype(dtype)
    if cm.ndim == 2:
        cm = cm[:, None, :]
    if cm.shape != tuple(y_shape):
        cm = jnp.broadcast_to(cm, tuple(y_shape))
    return cm


def fit(
    cfg: VJFConfig,
    state: TrainState,
    y: Array,
    u: Optional[Array] = None,
    *,
    key: jax.Array,
    max_iter: int = 200,
    beta: Optional[float] = None,
    rtol: Optional[float] = None,
    callback=None,
    donate: bool = True,
    noise_hook=None,
    epochs_per_dispatch: int = 1,
    mask: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
    lr0: Optional[float] = None,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
) -> FitResult:
    """Epoch training loop with warm-up — ``VJF.fit`` (``vjf/model.py:223-307``).

    ``checkpoint_path`` + ``checkpoint_every=K``: persist the COMPLETE
    loop state (:class:`FitSnapshot` — state, phase, plateau machine, lr
    schedule, PRNG chain, demotion + selection machinery) every K epochs
    (block boundaries in blocked mode), atomically. ``resume_from``: path
    of such a snapshot — resume BIT-identically to the uninterrupted run
    (same cfg/data/epochs_per_dispatch; the ``state``/``key``/``lr0``
    argument VALUES are superseded by the snapshot). Not composable with
    ``noise_hook`` (parity harnesses re-run from scratch).

    ``lr0`` overrides the schedule's starting learning rate (default
    ``cfg.lr``): the reference holds its optimizer + ExponentialLR as
    instance state so a second ``fit()`` CONTINUES the decayed schedule
    (``vjf/model.py:69-78``) — the OO facade passes its current lr here;
    ``FitResult.lr`` reports the post-run schedule position.

    Two-phase semantics preserved exactly: during warm-up the dynamics term
    is excluded from the loss, RLS is skipped, and the decoder trains; when
    the epoch loss plateaus (torch.isclose, rtol), the decoder is frozen
    forever and the dynamics model is bootstrap-initialized from the pooled
    posterior means of that epoch. A second plateau ends training.

    ``noise_hook(epoch) -> (eps_s, eps_t)`` optionally injects the per-step
    sampling noise of each epoch (golden-parity harness).

    ``mask`` (optional (T,) / (T, B) 0/1): ragged-trial support — see
    :func:`filter_step`. Masked entries contribute nothing anywhere
    (including the warm-up-end bootstrap, where only pairs with both
    endpoints observed enter the re-init). Both masks ride the fused/mega
    kernels where enabled (:func:`run_epoch` dispatch).

    ``epochs_per_dispatch > 1`` switches to the block-dispatch production
    mode (:func:`_fit_blocked`): K epochs per device dispatch through
    :func:`run_epochs`, the plateau state machine replayed on the host per
    block. Amortizes dispatch latency (the dominant cost of small-batch
    fits over a high-latency link) at the documented cost of block-granular
    phase transitions — NOT for parity runs (K=1 reproduces the reference's
    per-epoch control flow exactly).

    ``mesh`` (optional ``jax.sharding.Mesh``): multi-chip training in one
    call — the SAME host control loop (warm-up plateau, decoder freeze,
    bootstrap, convergence), with every epoch dispatched through
    ``parallel.make_sharded_epoch`` (trials sharded over ``dp``, state
    replicated via the one sufficient-statistics collective; the fused
    kernel rides inside ``shard_map`` where eligible, masks included).
    The bootstrap/SGP-adapt steps run on the replicated result. Not
    composable with ``noise_hook`` (parity is a single-device concern).
    Composes with ``epochs_per_dispatch > 1``: K sharded epochs scan
    device-side per dispatch (``parallel.make_sharded_epochs``). Hot-tau
    demotion does not apply either way: the sharded fused path keeps the
    per-step exact-inverse fallback.
    """
    beta = cfg.beta if beta is None else beta
    rtol = cfg.rtol if rtol is None else rtol
    if mesh is not None and noise_hook is not None:
        raise ValueError("mesh and noise_hook are mutually exclusive")
    if cfg.multistep_refine > 0 and (cfg.udim > 0 or mask is not None):
        # validate UP-FRONT (both dispatch modes): failing on the first
        # post-warm-up epoch would discard the whole warm-up phase's work
        raise ValueError(
            "multistep_refine supports autonomous, unmasked fits only "
            "(the rollout has no control/validity alignment)"
        )
    if cfg.multistep_refine > 0:
        # DEPRECATED (r5, VERDICT r4 #7): the honest A/B says don't use
        # it — VdP 20-step forecast RMSE 0.257 -> 0.279 (WORSE), Lorenz
        # ~1% (docs/RESULTS.md "Forecast-skill training"), while
        # select='forecast' wins on both (VdP 0.468->0.445, Lorenz
        # 2.069->1.991) at zero quality risk (training bit-identical).
        import warnings

        warnings.warn(
            "cfg.multistep_refine is deprecated: the measured A/B shows "
            "it does not improve (VdP: worsens) long-horizon forecasts; "
            "use cfg.select='forecast' instead (docs/RESULTS.md "
            "'Forecast-skill training'). The knob will be removed in a "
            "future release.",
            DeprecationWarning,
            stacklevel=2,
        )
    select_on = _validate_select(cfg, mask, channel_mask, mesh)
    if resume_from is not None and noise_hook is not None:
        raise ValueError("resume_from and noise_hook are mutually exclusive")
    if epochs_per_dispatch > 1:
        if noise_hook is not None:
            raise ValueError(
                "epochs_per_dispatch > 1 is a production mode; the "
                "golden-parity noise_hook requires epochs_per_dispatch=1"
            )
        return _fit_blocked(
            cfg, state, y, u, key=key, max_iter=max_iter, beta=beta,
            rtol=rtol, callback=callback, k_block=int(epochs_per_dispatch),
            mask=mask, channel_mask=channel_mask, lr0=lr0, mesh=mesh,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, resume_from=resume_from,
        )
    y = _promote_y(wire_ingest(y, cfg.jdtype))
    t_len, n_batch, _ = y.shape
    us = _promote_u(u, t_len, n_batch, cfg.jdtype)
    mask = _promote_mask(mask, t_len, n_batch, cfg.jdtype)
    channel_mask = _promote_channel_mask(channel_mask, y.shape, cfg.jdtype)
    if mask is not None:
        pair_w = (mask[1:] * mask[:-1]).reshape(-1)  # bootstrap pair validity
    else:
        pair_w = None
    cfg = _demote_masked_small_sgp(cfg, mask)
    # load AFTER the cfg rewrite above: the snapshot digests the RESOLVED
    # cfg (the blocked path always did; the per-epoch copy diverged once —
    # review r4), and the restored state must precede every consumer below
    resume_snap = (
        _load_fit_snapshot(cfg, resume_from, 1)
        if resume_from is not None else None
    )
    if resume_snap is not None:
        state = resume_snap.state
        key = jnp.asarray(resume_snap.key)
    if select_on:
        _validate_select(cfg, None, None, mesh, t_len=t_len)
        sel_base = jax.random.fold_in(key, _SELECT_SALT)
    best_sel = float("inf")
    best_snap = None  # (state, mu, logvar, loss, epoch) at the best metric

    # Donation is skipped while hot-tau demotion is possible (mega layout
    # AND the fused path actually eligible for this cfg/state/batch): the
    # demote-retry path re-runs an epoch from its pre-epoch state, and
    # with donation that state's buffers would already be invalidated — a
    # per-epoch defensive tree-copy costs ~0.5 s of dispatch latency
    # through the remote-chip tunnel, vs ~1 MB of extra memory for simply
    # keeping the input buffers alive. Runs that can never take the mega
    # path (f64 parity, fused_step='off', small-batch SGP routing, CPU)
    # keep donating.
    # The relaxed-sync path (cfg.sync_every != 1) runs the mega kernel
    # PER CHIP, so it needs the same hot-tau demotion watch as the
    # single-device mega path — gated on the LOCAL per-chip batch (the
    # quantity that sets the NSV update size; B_local=1 regimes are hot
    # forever, CLAUDE.md traps 12/14).
    local_batch = n_batch if mesh is None else max(1, n_batch // mesh.size)
    mega_possible = (
        (mesh is None or cfg.sync_every != 1)
        and cfg.fused_epoch == "mega"
        and _fused.fused_enabled(cfg, state, n_batch=local_batch)
    )
    if cfg.dynamics_update != "rls" and not mega_possible:
        # performance-envelope notice (r4 VERDICT #8): the fused/mega
        # kernels implement the RLS learner only — the kalman
        # (weight-diffusion) variant runs the plain XLA epoch at ~8.7k
        # steps/s on the flagship config vs ~150k fused (docs/RESULTS.md
        # "kalman variant"). It is a parity/diagnostic path, not a
        # production one.
        logger.info(
            "dynamics_update=%r runs the XLA-only epoch path (the "
            "fused/mega kernels implement the RLS learner only): expect "
            "~17x lower throughput than the default 'rls' fused path "
            "(measured ~8.7k vs ~150k steps/s on the flagship config).",
            cfg.dynamics_update,
        )
    # select='forecast' keeps per-epoch snapshots alive PAST later epoch
    # dispatches — donation would invalidate the best snapshot's buffers
    # the moment the next epoch runs (same hazard class as the demotion
    # backup below; invisible on CPU, where donation is a no-op)
    donate = donate and not mega_possible and not select_on
    if mesh is not None and cfg.sync_every != 1:
        # relaxed-sync deviation (cfg.sync_every): K fully-local steps per
        # chip between state merges — parallel/sharded.run_epoch_sync_every
        if mask is not None or channel_mask is not None:
            raise ValueError(
                "sync_every != 1 does not support masks; use the exact "
                "per-step-sync path (cfg.sync_every=1) for ragged trials"
            )
        if cfg.rls_shrink >= 1.0:
            # root-caused r4 (docs/RESULTS.md "Relaxed-sync"): between
            # merges each chip runs an UNPOOLED B_local-sized RLS — at
            # small per-chip batches that is the pure-accumulation regime
            # CLAUDE.md trap 14 documents as f32-unsustainable, and the
            # measured outcome is divergence of the merged weights
            # (Lorenz: latent-R² collapse at K=32, silent dynamics death
            # at K=8) that exact sync masks by pooling every step.
            logger.warning(
                "sync_every=%d with rls_shrink=1.0: the per-chip RLS "
                "between merges is a pure accumulation over B_local=%d "
                "trials — measured to destabilize the merged dynamics. "
                "Set cfg.rls_shrink<1 (e.g. 0.999) + chol_jitter "
                "(e.g. 1e-3); cfg.sync_trust damping is active but only "
                "bounds the per-merge step, not the accumulation.",
                cfg.sync_every, local_batch,
            )
        if cfg.select != "forecast":
            # measured r4 (docs/RESULTS.md "Relaxed-sync"): even fully
            # guarded (shrink+jitter+sync_trust), frequent merges can
            # destroy FORECAST skill on fast-dynamics systems while
            # latents stay pristine (VdP K=8 rollout RMSE 12.2 vs 0.91
            # persistence; latent R² healthy — trap 23/24's "recognition
            # masks dynamics damage" at the parallelism level).
            # select='forecast' snapshots the consistent post-merge state
            # before the damage accrues (12.2 -> 0.43, beats persistence).
            logger.warning(
                "sync_every=%d without select='forecast': relaxed-sync "
                "merges can destroy forecast skill while latent "
                "reconstruction looks healthy (measured: VdP K=8 rollout "
                "RMSE 12.2 vs 0.91 persistence). Set cfg.select="
                "'forecast' to snapshot the best post-merge state, or "
                "gate your own quality checks on forecast skill, never "
                "latent R².",
                cfg.sync_every,
            )
        from ..parallel import shard_data, shard_state
        from ..parallel.sharded import run_epoch_sync_every

        state = shard_state(cfg, state, mesh)
        y, us = shard_data(mesh, y, us)
        _sync_jit = jax.jit(
            run_epoch_sync_every,
            static_argnames=("cfg", "flags", "mesh", "sync_every"),
        )

        def epoch_fn(cfg_run, flags, st, y_, us_, k_, lr_, noise=None,
                     mask=None, channel_mask=None):
            assert noise is None and mask is None and channel_mask is None
            return _sync_jit(cfg_run, flags, st, y_, us_, k_, lr_,
                             mesh=mesh, sync_every=cfg.sync_every)
    elif mesh is not None:
        # multi-chip: every epoch through make_sharded_epoch (one builder
        # per (cfg, flags) — warm-up and main phase use different flags)
        from ..parallel import make_sharded_epoch, shard_data, shard_state

        state = shard_state(cfg, state, mesh)
        y, us = shard_data(mesh, y, us)
        _sharded_cache = {}

        def epoch_fn(cfg_run, flags, st, y_, us_, k_, lr_, noise=None,
                     mask=None, channel_mask=None):
            assert noise is None
            kk = (cfg_run, flags)
            if kk not in _sharded_cache:
                _sharded_cache[kk] = make_sharded_epoch(
                    cfg_run, flags, mesh, donate=donate
                )
            return _sharded_cache[kk](st, y_, us_, k_, lr_, mask=mask,
                                      channel_mask=channel_mask)
    else:
        epoch_fn = jax.jit(
            run_epoch,
            static_argnames=("cfg", "flags"),
            donate_argnames=("state",) if donate else (),
        )
    init_fn = jax.jit(
        _transition(cfg).dynamics_initialize, static_argnames=("cfg",)
    )

    warm_up = True
    lr = cfg.lr if lr0 is None else float(lr0)
    running_loss = float("nan")
    epoch_loss = float("nan")
    result: Optional[EpochResult] = None
    # Hot-tau auto-demotion: the cond-free mega segment skips NSV samples
    # whose trace bound exceeds the escalation ceiling (a sound but lossy
    # in-kernel action). A regime where that fires past the exact prefix —
    # e.g. B=1 SGP, where per-step updates stay large relative to P — needs
    # the per-step exact-inverse fallback instead, so the epoch is RE-RUN
    # from its pre-epoch state on the XLA path (fused_step='off' — its
    # per-step lax.cond exact fallback is both sound and, unlike a
    # per-step pallas scan with a cholesky-bearing cond, fast: TPU conds
    # bill heavy untaken branches, CLAUDE.md trap #5). A demotion is NOT
    # permanent: after cfg.repromote_after epochs the mega layout is
    # re-probed (a hot probe epoch is re-run from its pre-epoch state just
    # like the original demotion; cfg.repromote_max bounds the probes), so
    # a transient hot epoch — e.g. the first post-bootstrap epoch — does
    # not condemn the rest of the fit to the slow path. The pre-epoch
    # state stays valid because donation is disabled under the mega
    # layout (above).
    cfg_run = cfg
    mega_guard = mega_possible
    demote_epoch: Optional[int] = None
    repromotes_left = cfg.repromote_max if cfg.repromote_after > 0 else 0
    plateau_hits = 0  # consecutive post-warm-up plateau epochs (stop_patience)

    start_epoch = 0
    if resume_snap is not None:
        (start_epoch, warm_up, lr, running_loss, plateau_hits, epoch_loss,
         demoted, demote_epoch, repromotes_left, r_best, r_sel, _pf_unused
         ) = _restore_fit_snapshot(resume_snap)
        if demoted:
            cfg_run = cfg.replace(fused_step="off")
            mega_guard = False
        if r_best is not None:
            best_snap, best_sel = r_best, r_sel
        if select_on and resume_snap.sel_base is not None:
            sel_base = jnp.asarray(resume_snap.sel_base)

    for epoch in range(start_epoch, max_iter):
        if (
            demote_epoch is not None
            and repromotes_left > 0
            and not warm_up
            and epoch - demote_epoch >= cfg.repromote_after
        ):
            repromotes_left -= 1
            demote_epoch = None
            cfg_run = cfg
            mega_guard = True
            logger.info(
                "Re-probing the mega layout at epoch %d (%d probes left) — "
                "the demoted hot-tau regime may have been a transient.",
                epoch, repromotes_left,
            )
        key, k_epoch = jax.random.split(key)
        flags = StepFlags(sgd=True, update=True, warm_up=warm_up, train_decoder=warm_up)
        noise = noise_hook(epoch) if noise_hook is not None else None
        backup = state if (mega_guard and not warm_up) else None
        result = epoch_fn(
            cfg_run, flags, state, y, us, k_epoch, jnp.asarray(lr, cfg.jdtype),
            noise=noise, mask=mask, channel_mask=channel_mask,
        )
        if (
            mega_guard
            and not warm_up
            and result.metrics.tau is not None
            and result.metrics.tau.shape[0] > cfg.ns_prefix
        ):
            # one host transfer for loss + tau stats (each scalar fetch
            # costs a full tunnel round-trip)
            tau_seg = result.metrics.tau[cfg.ns_prefix:]
            vals = np.asarray(jnp.stack([
                jnp.mean(result.metrics.loss),
                # max FINITE tau: ceiling-skipped steps mark inf (see
                # run_epochs), which would otherwise mask the magnitude
                jnp.max(jnp.where(jnp.isfinite(tau_seg), tau_seg, 0.0)),
                jnp.mean(
                    (tau_seg >= _fused.NS_TAU_MAX).astype(
                        result.metrics.loss.dtype
                    )
                ),
            ]))
            epoch_loss, max_tau, hot_frac = map(float, vals)
            # A RARE ceiling hit is harmless since the in-kernel skip keeps
            # P and V consistent (it just drops that sample); demote only
            # when hot steps are PERVASIVE — the regime where the mega
            # layout would systematically drop the most informative
            # samples (measured: B=1 SGP runs ~97% hot; a Van der Pol fit
            # trips a handful of transient steps and is fine on mega).
            if hot_frac > cfg.demote_hot_frac:
                logger.warning(
                    "Newton-Schulz residual bound exceeded the in-kernel "
                    "escalation ceiling on %.1f%% of post-prefix steps "
                    "(max finite tau=%.3f, epoch %d): demoting to the XLA epoch "
                    "with the per-step exact-inverse fallback and "
                    "re-running the epoch.", 100 * hot_frac, max_tau, epoch,
                )
                cfg_run = cfg_run.replace(fused_step="off")
                mega_guard = False
                demote_epoch = epoch
                # an epoch can be hot AND indefinite-at-start (both are
                # post-bootstrap symptoms): the XLA path's per-step exact
                # fallback choleskys P directly, so the re-run must not
                # resume from an unrepaired non-PD backup (PD-gated — a
                # healthy backup passes through untouched)
                backup = _fused.maybe_epoch_repair(cfg, flags, backup,
                                                   local_batch)
                result = epoch_fn(
                    cfg_run, flags, backup, y, us, k_epoch,
                    jnp.asarray(lr, cfg.jdtype), noise=noise,
                    mask=mask, channel_mask=channel_mask,
                )
                epoch_loss = float(jnp.mean(result.metrics.loss))
            elif hot_frac > 0:
                # max_tau alone can't witness a ceiling hit: the kernel
                # reports tau = inf for every skipped step, so the max
                # FINITE tau is < NS_TAU_MAX by construction — gate the
                # log on the inf-marker fraction instead
                logger.info(
                    "Rare Newton-Schulz ceiling hits (%.2f%% of steps, "
                    "max finite tau=%.3f, epoch %d): samples dropped "
                    "in-kernel; staying on the mega layout.",
                    100 * hot_frac, max_tau, epoch,
                )
        else:
            epoch_loss = float(jnp.mean(result.metrics.loss))
        state = result.state

        if callback is not None:
            callback(epoch, epoch_loss, result)

        converged_now = False
        if warm_up:
            plateau = _isclose(epoch_loss, running_loss, rtol)
            forced = cfg.warmup_max > 0 and epoch + 1 >= cfg.warmup_max
            if plateau or forced:
                if forced and not plateau:
                    logger.warning(
                        "Warm-up plateau never fired within warmup_max=%d "
                        "epochs; forcing the phase transition (decoder "
                        "freeze + dynamics bootstrap).", cfg.warmup_max,
                    )
                warm_up = False
                running_loss = epoch_loss
                logger.info("Warm up stopped at epoch %d.", epoch)
                key, k_init = jax.random.split(key)
                state = _bootstrap_dynamics(cfg, state, init_fn,
                                            result.q_means, us, k_init,
                                            pair_w=pair_w)
        else:
            if _isclose(epoch_loss, running_loss, rtol):
                plateau_hits += 1
                converged_now = plateau_hits >= cfg.stop_patience
            else:
                plateau_hits = 0
            if not converged_now:
                if cfg.dynamics == "sgp" and cfg.sgp_adapt_lr > 0:
                    state = _sgp_adapt_step(cfg, state, result.q_means, us,
                                            pair_w=pair_w)
                if cfg.multistep_refine > 0:
                    state = _multistep_refine_step(cfg, state, result.q_means)

        if select_on and not warm_up:
            # the selection metric on the state the loop would carry forward
            # (post-bootstrap / post-adapt); its PRNG stream is folded out of
            # the fit key, so training is bit-identical to select='loss'
            sel = float(_rollout_rmse_jit(
                cfg, state, result.q_means, y, us,
                jax.random.fold_in(sel_base, epoch),
            ))
            if sel < best_sel:                  # NaN metric never selects
                best_sel = sel
                best_snap = (state, result.q_means, result.q_logvars,
                             epoch_loss, epoch)
        if converged_now:
            logger.info("Converged at epoch %d.", epoch)
            break

        running_loss = (
            beta * running_loss + (1 - beta) * epoch_loss if epoch > 0 else epoch_loss
        )
        lr *= cfg.lr_decay                                  # ExponentialLR, model.py:78

        if (checkpoint_path is not None and checkpoint_every > 0
                and (epoch + 1) % checkpoint_every == 0):
            from ..utils.checkpoint import save_ensemble_checkpoint

            save_ensemble_checkpoint(checkpoint_path, _make_fit_snapshot(
                cfg, epoch + 1, warm_up, lr, running_loss, plateau_hits,
                key, state, result, epoch_loss, cfg_run != cfg,
                demote_epoch, repromotes_left,
                best_snap if select_on else None, best_sel,
                sel_base=sel_base if select_on else None,
            ))

    epochs_total = start_epoch if result is None else epoch + 1
    if select_on and best_snap is not None:
        b_state, b_mu, b_lv, b_loss, b_epoch = best_snap
        return FitResult(
            mu=b_mu, logvar=b_lv, loss=b_loss, state=b_state,
            warm_up=warm_up, lr=lr, epochs_run=epochs_total,
            selected_epoch=b_epoch, selected_metric=best_sel,
        )
    if result is None:
        # resume landed at (or past) max_iter: nothing to run — return the
        # snapshot's stored outputs
        assert resume_snap is not None
        return FitResult(
            mu=resume_snap.mu, logvar=resume_snap.logvar, loss=epoch_loss,
            state=state, warm_up=warm_up, lr=lr, epochs_run=start_epoch,
        )
    return FitResult(
        mu=result.q_means, logvar=result.q_logvars, loss=epoch_loss, state=state,
        warm_up=warm_up, lr=lr, epochs_run=epochs_total,
    )


def _demote_masked_small_sgp(cfg: VJFConfig, mask) -> VJFConfig:
    """The fused gate's small-batch SGP routing (`fused_enabled`,
    ops/pallas/fused_step.py) sizes itself on the PADDED batch, but with a
    ragged trial mask it is the EFFECTIVE per-step valid count that keeps
    the NSV trace bound hot (tiny-batch SGP is hot forever — the mega
    layout would only demote after a wasted compile). The mask is concrete
    at the fit() boundary, so size the decision host-side and route the
    whole fit to the XLA epoch when any step's valid count is below the
    gate. Explicit ``fused_step='on'``/'off' is respected."""
    if mask is None or cfg.dynamics != "sgp" or cfg.fused_step != "auto":
        return cfg
    eff = int(np.min(np.sum(np.asarray(mask), axis=1)))
    if eff < cfg.sgp_fused_min_batch:
        logger.info(
            "ragged SGP fit: min per-step valid count %d < "
            "sgp_fused_min_batch %d — routing to the XLA epoch (per-step "
            "exact-inverse fallback).", eff, cfg.sgp_fused_min_batch,
        )
        return cfg.replace(fused_step="off")
    return cfg


def _bootstrap_dynamics(cfg, state, init_fn, q_means, us, key, pair_w=None):
    """Warm-up-end phase transition (``vjf/model.py:283-291``): re-init the
    dynamics from the pooled posterior means — shared by the per-epoch and
    block-dispatch fit loops. ``pair_w``: optional (N,) validity of each
    pooled ``(x[t-1] -> x[t])`` pair (ragged trials — frozen-carry
    duplicates have ``dx = 0`` and would otherwise teach ``f = 0``)."""
    xt = q_means[1:].reshape(-1, cfg.xdim)
    xs = q_means[:-1].reshape(-1, cfg.xdim)
    u_init = _pooled_controls(cfg, us, pair_w)
    return state._replace(
        dynamics=init_fn(cfg, key, state.dynamics, xt, xs, u_init,
                         weights=pair_w)
    )


def _pooled_controls(cfg, us, pair_w):
    """Pool controls for the bootstrap / SGP-adapt paths, zeroing invalid
    pairs' rows: padded ``u`` entries (NaN or garbage under ragged masks)
    are weighted out of the RLS statistics by ``pair_w`` but would still
    poison ``max||cat(xs, u)||`` in the centroid re-init — and ``0 * NaN``
    is NaN in the weighted sums. The posterior means need no such guard
    (frozen carries keep them finite)."""
    if cfg.udim == 0:
        return None
    u_init = us[1:].reshape(-1, cfg.udim)
    if pair_w is not None:
        u_init = jnp.where(pair_w[:, None] > 0, u_init, 0.0)
    return u_init


def multistep_refine(
    cfg: VJFConfig,
    state: TrainState,
    mu: Array,
    horizon: Optional[int] = None,
    weight: Optional[float] = None,
    n_iter: Optional[int] = None,
) -> TrainState:
    """K-step rollout-consistency refinement of the velocity field (the
    forecast-skill training mode, ``cfg.multistep_refine`` — opt-in, no
    reference counterpart).

    The filter's RLS learns one-step displacements; its K-step rollouts
    compound one-step bias (measured: longer one-step training DEGRADES
    20-step forecasts, docs/RESULTS.md). This refinement enforces K-step
    consistency directly: with leak ``l`` and ``lam = 1 - l`` the rollout
    telescopes to ``x_{i+K} = lam^K x_i + sum_j lam^(K-1-j) phi(x_j) w``,
    so given the CURRENT rolled path the K-step displacement is LINEAR in
    ``w`` with path-accumulated features ``Phi_i = sum_j lam^(K-1-j)
    phi(xhat_j)``. We ridge-solve that regression over every start in the
    epoch's posterior means (relative-floored eigh — the pooled Gram is
    bootstrap-scale, CLAUDE.md trap 15) and blend ``w <- (1 - a) w + a
    w_ms``; iterating re-linearizes around the improved path. P/V are NOT
    touched: the blend nudges the mean field toward multi-step consistency
    while the uncertainty bookkeeping stays one-step conservative (no
    double-counted evidence from reprocessing the same trajectory every
    epoch).

    ``mu``: (T, B, xdim) posterior means (an epoch's ``q_means``).
    Controls are not supported (the rollout would need the u sequence
    aligned to every start) — guarded at the ``fit`` integration.
    """
    horizon = cfg.multistep_refine if horizon is None else horizon
    weight = cfg.multistep_weight if weight is None else weight
    n_iter = cfg.multistep_iters if n_iter is None else n_iter
    if horizon <= 1 or mu.shape[0] <= horizon:
        return state
    from ..ops.linalg import eigh_floor_inv_pair

    tr = _transition(cfg)
    dyn = state.dynamics
    lam = 1.0 - cfg.leak
    k = int(horizon)
    xd = cfg.xdim
    x0 = mu[:-k].reshape(-1, xd)                       # (S*B, xd) starts
    tgt = (mu[k:] - (lam ** k) * mu[:-k]).reshape(-1, xd)
    hp = jax.lax.Precision.HIGHEST
    n_rows = x0.shape[0]
    v = k * jnp.exp(dyn.logvar)                        # K-step noise scale

    for _ in range(n_iter):
        xj = x0
        acc = None
        for j in range(k):
            feat = tr.features(dyn, xj)                # (S*B, nf)
            step = feat @ dyn.blr.w_mean
            c = lam ** (k - 1 - j)
            acc = c * feat if acc is None else acc + c * feat
            xj = lam * xj + step
        # identity-prior ridge solve in >= f32 via the relative-floored
        # eigh (the pooled Gram reaches cond ~1e8 — trap 15 territory)
        sol_dt = jnp.promote_types(acc.dtype, jnp.float32)
        p = jnp.eye(acc.shape[1], dtype=sol_dt) + jnp.matmul(
            acc.T.astype(sol_dt), acc.astype(sol_dt), precision=hp
        ) / v.astype(sol_dt)
        _, v_sol = eigh_floor_inv_pair(p)
        w_ms = jnp.matmul(
            v_sol,
            jnp.matmul(acc.T.astype(sol_dt), tgt.astype(sol_dt),
                       precision=hp) / v.astype(sol_dt),
            precision=hp,
        ).astype(dyn.blr.w_mean.dtype)
        w_new = (1.0 - weight) * dyn.blr.w_mean + weight * w_ms
        dyn = dyn._replace(blr=dyn.blr._replace(w_mean=w_new))
    return state._replace(dynamics=dyn)


_MS_JIT = []  # shared jitted wrapper (same rationale as _ADAPT_JIT below)


def _multistep_refine_step(cfg, state, q_means):
    if not _MS_JIT:
        _MS_JIT.append(jax.jit(multistep_refine, static_argnames=("cfg",)))
    return _MS_JIT[0](cfg, state, q_means)


_ADAPT_JIT = []  # one shared jitted wrapper: a fresh jax.jit per call would
                 # discard the trace cache every post-warm-up epoch (30-60 s
                 # recompiles through the tunnel, plus accumulating XLA:CPU
                 # executables — the trap-13 segfault class)


def _sgp_adapt_step(cfg, state, q_means, us, pair_w=None):
    """Slow-timescale SGP kernel-hyperparameter step on the pooled posterior
    means (``gp/sgp.py:adapt_hyperparams``) — shared by both fit loops."""
    from ..gp.sgp import adapt_hyperparams

    if not _ADAPT_JIT:
        _ADAPT_JIT.append(jax.jit(adapt_hyperparams, static_argnames=("cfg",)))
    return state._replace(
        dynamics=_ADAPT_JIT[0](
            cfg, state.dynamics,
            q_means[1:].reshape(-1, cfg.xdim),
            q_means[:-1].reshape(-1, cfg.xdim),
            _pooled_controls(cfg, us, pair_w),
            weights=pair_w,
        )
    )


def _fit_blocked(
    cfg: VJFConfig,
    state: TrainState,
    y: Array,
    u: Optional[Array] = None,
    *,
    key: jax.Array,
    max_iter: int,
    beta: float,
    rtol: float,
    callback=None,
    k_block: int,
    mask: Optional[Array] = None,
    channel_mask: Optional[Array] = None,
    lr0: Optional[float] = None,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
) -> FitResult:
    """Block-dispatch fit: K epochs per device round-trip via
    :func:`run_epochs`, with ``fit``'s plateau state machine replayed on the
    host over the block's per-epoch mean losses.

    ``mesh``: multi-chip block dispatch — each block scans K SHARDED epochs
    device-side (``parallel.make_sharded_epochs``: the fused kernel inside
    ``shard_map`` with one sufficient-statistics psum per step where
    eligible, the GSPMD-annotated XLA epoch otherwise). Hot-tau demotion
    does not apply under a mesh (the sharded fused path keeps the per-step
    exact-inverse fallback), so the demotion machinery is bypassed.

    Deviations from the per-epoch loop (all block-granular, documented in
    docs/ARCHITECTURE.md):
    - phase transitions (warm-up end + dynamics bootstrap, convergence,
      hot-tau demotion, SGP hyperparameter steps) apply at block
      boundaries — epochs after an in-block plateau simply extend the
      current phase, which trains strictly more, never less;
    - the demotion re-run restarts the whole block from its pre-block
      state (same soundness argument as fit's per-epoch re-run);
    - ``callback`` receives an :class:`EpochResult` view per epoch whose
      ``metrics`` leaves are PER-EPOCH MEANS up to that epoch (one scalar
      per epoch — ``metrics.loss[-1]`` is this epoch's mean loss), not
      fit()'s per-step arrays; posteriors are the block's last epoch;
    - a final partial block (``max_iter % K != 0``) compiles one extra
      remainder-shaped graph — choose ``max_iter`` divisible by
      ``epochs_per_dispatch`` to avoid paying a compile for a few epochs.
    """
    select_on = _validate_select(cfg, mask, channel_mask, mesh)
    y = _promote_y(wire_ingest(y, cfg.jdtype))  # two-step ingest (see fit())
    t_len, n_batch, _ = y.shape
    us = _promote_u(u, t_len, n_batch, cfg.jdtype)
    mask = _promote_mask(mask, t_len, n_batch, cfg.jdtype)
    channel_mask = _promote_channel_mask(channel_mask, y.shape, cfg.jdtype)
    pair_w = (mask[1:] * mask[:-1]).reshape(-1) if mask is not None else None
    cfg = _demote_masked_small_sgp(cfg, mask)
    if select_on:
        _validate_select(cfg, None, None, mesh, t_len=t_len)
        sel_base = jax.random.fold_in(key, _SELECT_SALT)
    best_sel = float("inf")
    best_snap = None  # block-granular selection (see fit() docstring)

    if mesh is not None:
        from ..parallel import make_sharded_epochs, shard_data, shard_state

        state = shard_state(cfg, state, mesh)
        y, us = shard_data(mesh, y, us)
        _sharded_cache = {}

        def epochs_fn(cfg_run, flags, st, y_, us_, ekeys, lrs, mask=None,
                      channel_mask=None):
            kk = (cfg_run, flags)
            if kk not in _sharded_cache:
                _sharded_cache[kk] = make_sharded_epochs(cfg_run, flags, mesh)
            return _sharded_cache[kk](st, y_, us_, ekeys, lrs, mask=mask,
                                      channel_mask=channel_mask)

        # the sharded fused path repairs hot steps with the per-step exact
        # fallback (nothing is skipped), so demotion has nothing to fix
        mega_possible = False
    else:
        mega_possible = (
            cfg.fused_epoch == "mega"
            and _fused.fused_enabled(cfg, state, n_batch=n_batch)
        )
        epochs_fn = jax.jit(run_epochs, static_argnames=("cfg", "flags"))
    init_fn = jax.jit(
        _transition(cfg).dynamics_initialize, static_argnames=("cfg",)
    )

    warm_up = True
    lr = cfg.lr if lr0 is None else float(lr0)
    running_loss = float("nan")
    epoch_loss = float("nan")
    res: Optional[EpochsResult] = None
    cfg_run = cfg
    mega_guard = mega_possible
    demote_epoch: Optional[int] = None
    repromotes_left = cfg.repromote_max if cfg.repromote_after > 0 else 0
    plateau_hits = 0  # consecutive post-warm-up plateau epochs (stop_patience)
    prefix_free = False  # engaged by prefix_free_next after a clean block
    pf_logged = False
    epoch = 0

    resume_snap = (
        _load_fit_snapshot(cfg, resume_from, k_block)
        if resume_from is not None else None
    )
    if resume_snap is not None:
        state = resume_snap.state
        key = jnp.asarray(resume_snap.key)
        (epoch, warm_up, lr, running_loss, plateau_hits, epoch_loss,
         demoted, demote_epoch, repromotes_left, r_best, r_sel, prefix_free
         ) = _restore_fit_snapshot(resume_snap)
        if demoted:
            cfg_run = cfg.replace(fused_step="off")
            mega_guard = False
        if r_best is not None:
            best_snap, best_sel = r_best, r_sel
        if select_on and resume_snap.sel_base is not None:
            sel_base = jnp.asarray(resume_snap.sel_base)
        if mesh is not None:
            from ..parallel import shard_state as _ss

            state = _ss(cfg, state, mesh)

    while epoch < max_iter:
        if (
            demote_epoch is not None
            and repromotes_left > 0
            and not warm_up
            and epoch - demote_epoch >= cfg.repromote_after
        ):
            # same transient-recovery policy as fit(): re-probe the mega
            # layout at the block boundary; a hot probe block is re-run
            # from its pre-block state exactly like the original demotion
            repromotes_left -= 1
            demote_epoch = None
            cfg_run = cfg
            mega_guard = True
            logger.info(
                "Re-probing the mega layout at epoch %d (%d probes left) — "
                "the demoted hot-tau regime may have been a transient.",
                epoch, repromotes_left,
            )
        k = min(k_block, max_iter - epoch)
        if k != k_block:
            logger.info(
                "partial final block (%d of %d epochs): compiling one extra "
                "remainder-shaped graph — choose max_iter divisible by "
                "epochs_per_dispatch to avoid it.", k, k_block,
            )
        key, k_sub = jax.random.split(key)
        ekeys = jax.random.split(k_sub, k)
        lrs = jnp.asarray(
            lr * cfg.lr_decay ** np.arange(k), cfg.jdtype
        )
        flags = StepFlags(
            sgd=True, update=True, warm_up=warm_up, train_decoder=warm_up
        )
        backup = state if (mega_guard and not warm_up) else None
        # prefix-free continuation (cfg.ns_prefix_free, VERDICT r4 #5):
        # a contracted carry does not need the per-block exact-inverse
        # prefix re-run (CLAUDE.md note 21's run_chunks precedent) —
        # measured 18% of the blocked epoch at T=2000 (docs/RESULTS.md
        # "r5 attribution"); decision from the block's own tau stats,
        # first post-bootstrap block always keeps the full prefix
        engage_pf = (
            prefix_free and mega_guard and not warm_up
            and cfg.ns_prefix_free != "off" and cfg_run.ns_prefix > 0
        )
        cfg_disp = cfg_run.replace(ns_prefix=0) if engage_pf else cfg_run
        if engage_pf and not pf_logged:
            pf_logged = True
            logger.info(
                "blocked fit: carry contracted (max tau < %.2f) — "
                "continuing prefix-free from the epoch-%d block (one "
                "extra compile now).", _fused.NS_TAU_ESCALATE, epoch,
            )
        res = epochs_fn(cfg_disp, flags, state, y, us, ekeys, lrs, mask=mask,
                        channel_mask=channel_mask)
        # ONE host transfer per block for the control signals
        vals = np.asarray(
            jnp.concatenate([res.epoch_loss, res.max_tau, res.hot_frac])
        )
        losses, max_taus, hot_fracs = vals[:k], vals[k:2 * k], vals[2 * k:]
        if mega_guard and not warm_up:
            if t_len > cfg_disp.ns_prefix:
                prefix_free = _fused.prefix_free_next(
                    prefix_free, float(hot_fracs.max()), float(max_taus.max())
                )
            else:
                # whole block inside the protected prefix: engage
                # structurally (see the ensemble drivers / run_chunks'
                # first-chunk-only-prefix precedent); the engaged
                # dispatch's whole-stream stats then govern
                prefix_free = True

        if (
            mega_guard
            and not warm_up
            and float(hot_fracs.max()) > cfg.demote_hot_frac
        ):
            j = int(hot_fracs.argmax())
            logger.warning(
                "Newton-Schulz residual bound exceeded the in-kernel "
                "escalation ceiling on %.1f%% of post-prefix steps (max "
                "tau=%.3f, epoch %d): demoting to the XLA epoch and "
                "re-running the block from its pre-block state.",
                100 * float(hot_fracs[j]), float(max_taus[j]), epoch + j,
            )
            cfg_run = cfg_run.replace(fused_step="off")
            mega_guard = False
            demote_epoch = epoch + j
            # same hazard as fit()'s demotion: the XLA re-run must not
            # resume from an unrepaired indefinite backup (PD-gated)
            backup = _fused.maybe_epoch_repair(cfg, flags, backup, n_batch)
            res = epochs_fn(cfg_run, flags, backup, y, us, ekeys, lrs,
                            mask=mask, channel_mask=channel_mask)
            losses = np.asarray(res.epoch_loss)
        state = res.state

        warmup_plateau = False
        converged = False
        for j in range(k):
            epoch_loss = float(losses[j])
            if callback is not None:
                # EpochResult-shaped view honoring fit()'s callback
                # contract (result.metrics.<leaf>[-1] = this epoch's
                # value); leaves are per-epoch means, see docstring
                view = EpochResult(
                    state=res.state,
                    q_means=res.q_means,
                    q_logvars=res.q_logvars,
                    metrics=jax.tree.map(
                        lambda a: a[:j + 1], res.epoch_metrics
                    ),
                )
                callback(epoch + j, epoch_loss, view)
            if _isclose(epoch_loss, running_loss, rtol):
                if warm_up:
                    if not warmup_plateau:
                        warmup_plateau = True
                        logger.info(
                            "Warm up stopped at epoch %d (applied at the "
                            "block boundary).", epoch + j,
                        )
                else:
                    plateau_hits += 1
                    if plateau_hits >= cfg.stop_patience and not converged:
                        converged = True
                        logger.info("Converged at epoch %d.", epoch + j)
            elif not warm_up:
                plateau_hits = 0
            running_loss = (
                beta * running_loss + (1 - beta) * epoch_loss
                if epoch + j > 0 else epoch_loss
            )
        epoch += k
        lr *= cfg.lr_decay ** k
        if (
            warm_up and not warmup_plateau
            and cfg.warmup_max > 0 and epoch >= cfg.warmup_max
        ):
            warmup_plateau = True
            logger.warning(
                "Warm-up plateau never fired within warmup_max=%d epochs; "
                "forcing the phase transition at the block boundary.",
                cfg.warmup_max,
            )

        if warm_up and warmup_plateau:
            # phase transition at the block boundary: freeze the decoder and
            # bootstrap the dynamics from the block's final posterior means
            warm_up = False
            running_loss = epoch_loss
            key, k_init = jax.random.split(key)
            state = _bootstrap_dynamics(cfg, state, init_fn, res.q_means,
                                        us, k_init, pair_w=pair_w)
        elif not warm_up and not converged:
            if cfg.dynamics == "sgp" and cfg.sgp_adapt_lr > 0:
                state = _sgp_adapt_step(cfg, state, res.q_means, us,
                                        pair_w=pair_w)
            if cfg.multistep_refine > 0:
                # block-granular (like every other phase action here):
                # one rollout-consistency blend per K-epoch block
                state = _multistep_refine_step(cfg, state, res.q_means)
        if select_on and not warm_up:
            # block-granular selection: evaluate the block's final state
            # (the posteriors are the block's last epoch by construction)
            sel = float(_rollout_rmse_jit(
                cfg, state, res.q_means, y, us,
                jax.random.fold_in(sel_base, epoch - 1),
            ))
            if sel < best_sel:
                best_sel = sel
                best_snap = (state, res.q_means, res.q_logvars,
                             epoch_loss, epoch - 1)
        if converged:
            break
        if (checkpoint_path is not None and checkpoint_every > 0
                and (epoch // checkpoint_every)
                > ((epoch - k) // checkpoint_every)):
            from ..utils.checkpoint import save_ensemble_checkpoint

            save_ensemble_checkpoint(checkpoint_path, _make_fit_snapshot(
                cfg, epoch, warm_up, lr, running_loss, plateau_hits,
                key, state, res, epoch_loss, cfg_run != cfg,
                demote_epoch, repromotes_left,
                best_snap if select_on else None, best_sel,
                sel_base=sel_base if select_on else None, k_block=k_block,
                prefix_free=prefix_free,
            ))

    if select_on and best_snap is not None:
        b_state, b_mu, b_lv, b_loss, b_epoch = best_snap
        return FitResult(
            mu=b_mu, logvar=b_lv, loss=b_loss, state=b_state,
            warm_up=warm_up, lr=lr, epochs_run=epoch,
            selected_epoch=b_epoch, selected_metric=best_sel,
        )
    if res is None:
        # resume landed at (or past) max_iter — return the snapshot's
        # stored outputs
        assert resume_snap is not None
        return FitResult(
            mu=resume_snap.mu, logvar=resume_snap.logvar, loss=epoch_loss,
            state=state, warm_up=warm_up, lr=lr, epochs_run=epoch,
        )
    return FitResult(
        mu=res.q_means, logvar=res.q_logvars, loss=epoch_loss, state=state,
        warm_up=warm_up, lr=lr, epochs_run=epoch,
    )


def forecast(
    cfg: VJFConfig,
    state: TrainState,
    x0: Array,
    key: jax.Array,
    n_step: int = 1,
    u: Optional[Array] = None,
    noise: bool = False,
) -> Tuple[Array, Array]:
    """Rollout latents and decode — ``VJF.forecast`` (``vjf/model.py:321-324``)."""
    if u is not None and u.shape[0] != n_step:
        # vjf/model.py:352: 'u must have length of n_step if present'
        raise ValueError(
            f"u must have length n_step={n_step} if present, got {u.shape[0]}"
        )
    x = _transition(cfg).forecast(
        state.dynamics, x0, key, n_step, u=u, noise=noise, leak=cfg.leak
    )
    y = decode(state.params.decoder, x)
    return x, y


# ---------------------------------------------------------------------------
# Forecast-gated model selection (cfg.select='forecast')
# ---------------------------------------------------------------------------

# Selection PRNG stream: folded OUT of the fit key (fold_in, not split) so
# computing the metric never perturbs the training chain — a
# select='forecast' fit trains bit-identically to select='loss'.
_SELECT_SALT = 0x5E1EC7


def rollout_rmse(
    cfg: VJFConfig,
    state: TrainState,
    mu: Array,
    ys: Array,
    us: Array,
    key: jax.Array,
) -> Array:
    """Device-side K-step forecast RMSE — the ``cfg.select='forecast'``
    selection metric (a scalar: one extra fetch per epoch alongside the
    loss).

    From ``cfg.select_starts`` evenly-spaced posterior means, roll the
    learned dynamics ``cfg.select_horizon`` steps (reference rollout
    semantics: a fresh weight sample per step, ``vjf/model.py:342-361``),
    decode, and RMSE against the actually-observed future — on the count
    scale for Poisson, matching :func:`vjf_tpu.utils.evaluation.
    forecast_rmse`. All trials of every start ride ONE batched rollout.
    """
    t_len, n_batch, _ = ys.shape
    h = int(cfg.select_horizon)
    n_starts = min(int(cfg.select_starts), t_len - h - 1)
    starts = np.linspace(0, t_len - h - 2, n_starts).astype(int)
    x0 = mu[jnp.asarray(starts)].reshape(-1, cfg.xdim)     # (S*B, xdim)
    widx = jnp.asarray(starts[:, None] + 1 + np.arange(h)[None, :])  # (S, h)
    uw = None
    if cfg.udim > 0:
        # u[t] drives the transition INTO x[t] (vjf/model.py:252-258), so
        # the rollout from start s consumes u[s+1 : s+1+h]
        uw = (
            us[widx]                                       # (S, h, B, udim)
            .transpose(1, 0, 2, 3)
            .reshape(h, -1, cfg.udim)
        )
    _, yf = forecast(cfg, state, x0, key, n_step=h, u=uw, noise=False)
    yf = yf[1:].reshape(h, len(starts), n_batch, cfg.ydim)
    if cfg.likelihood == "poisson":
        # the linear decode is the LOG-rate; compare on the count scale
        # with the model's own rate clamp (likelihood.py:60 semantics)
        yf = jnp.exp(jnp.minimum(yf, cfg.poisson_clamp))
    future = ys[widx]                                      # (S, h, B, ydim)
    err = jnp.mean((yf.transpose(1, 0, 2, 3) - future) ** 2, axis=(1, 2, 3))
    return jnp.sqrt(jnp.mean(err))


_rollout_rmse_jit = jax.jit(rollout_rmse, static_argnames=("cfg",))


def _validate_select(cfg: VJFConfig, mask, channel_mask, mesh,
                     t_len: Optional[int] = None) -> bool:
    """Up-front validation for ``cfg.select``; returns True when
    forecast-gated selection is active."""
    if cfg.select not in ("loss", "forecast"):
        raise ValueError(f"unknown cfg.select: {cfg.select!r}")
    if cfg.select != "forecast":
        return False
    if mask is not None or channel_mask is not None:
        raise ValueError(
            "select='forecast' supports unmasked fits only (rollout "
            "windows have no validity alignment); use select='loss' for "
            "ragged/dropout data"
        )
    # relaxed sync (sync_every != 1) composes: run_epoch_sync_every's
    # returned state is the post-merge (consistent, replicated) state, so
    # the per-epoch snapshot is well-defined — and selection is exactly
    # what rescues forecast skill there (measured: frequent merges damage
    # the long-horizon field while latent R² stays ~0.99; the best-epoch
    # snapshot predates the damage — docs/RESULTS.md "Relaxed-sync").
    if t_len is not None and t_len < cfg.select_horizon + 2:
        raise ValueError(
            f"select='forecast' needs T >= select_horizon + 2 (got "
            f"T={t_len}, select_horizon={cfg.select_horizon})"
        )
    return True
