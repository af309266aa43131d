"""Held-out-channel predictive evaluation (co-smoothing).

Capability beyond the reference: the standard evaluation protocol for
latent population models on REAL data — infer the latent trajectory from
the *observed* channels only (held-out channels excluded from the smoother
exactly, via the infinite-observation-variance missing-data path), then
score the model's predictions of the held-out channels it never saw.
For Poisson observations the headline number is **bits per spike** (the
co-smoothing metric of the Neural Latents Benchmark): the predictive
log-likelihood improvement over a constant mean-rate null, per observed
spike, in bits.

The reference evaluates only latent recovery against known synthetic
trajectories (``/root/reference/script/example.py:60-88``) — a protocol
unavailable on real recordings, where the true latent does not exist and
the only honest score is prediction of held-out measurements. This module
closes that gap on top of the existing machinery: the channel-masked
parallel smoother (:mod:`vjf_tpu.models.smoothing`) does the inference,
the trained decoder + likelihood provide the predictive density.

Design notes (TPU): everything here is a handful of (T, k) elementwise
ops and one ``einsum`` over the smoothed covariances — negligible next to
the smoother itself, so it reuses the already-jitted smoothing dispatches
rather than adding a fused path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.scipy.special import gammaln

from ..config import VJFConfig
from . import smoothing
from .vjf import TrainState, wire_ingest


class HeldoutEval(NamedTuple):
    """Result of :func:`heldout_eval` (all scores over held-out entries only).

    ``pred`` is the posterior-predictive mean observation: the Poisson rate
    ``E[exp(eta)] = exp(C m + d + diag(C P C^T)/2)`` (lognormal mean, the
    posterior over the latent propagated through the log link) or the
    Gaussian mean ``C m + d``. ``eta`` is the natural parameter ``C m + d``.
    Shapes: (T, k) for one sequence, (T, B, k) for a batch, where k is the
    number of held-out channels. Columns follow ``res.heldout`` — the
    SORTED UNIQUE indices — not the order the caller passed (e.g.
    ``heldout=[9, 2]`` yields columns for channels ``[2, 9]``); index
    ``pred``/``eta`` by ``res.heldout``, never by the original list.

    ``loglik`` / ``loglik_null`` are TOTAL predictive log-likelihoods (nats)
    of the held-out entries under the model / under the per-channel constant
    null (mean rate for Poisson, mean + variance for Gaussian — both
    estimated on the same evaluated segment, the standard co-smoothing
    null). ``bits_per_spike`` is ``(loglik - loglik_null) / (n_spikes *
    ln 2)`` for Poisson (NaN when the held-out entries contain no spikes)
    and None for Gaussian; ``r2`` is the pooled prediction R² of ``pred``
    against the held-out values (both likelihoods — for Poisson it scores
    rate prediction, a secondary diagnostic).
    """

    eta: Array
    pred: Array
    loglik: Array
    loglik_null: Array
    bits_per_spike: Optional[Array]
    r2: Array
    heldout: np.ndarray        # (k,) int channel indices actually used
    smoothed_means: Array      # (T[, B], xdim) latents from observed channels
    n_spikes: Optional[Array] = None   # Poisson: scored (observed) spikes


def _normalize_heldout(heldout, ydim: int) -> np.ndarray:
    """Accept a boolean (ydim,) mask or an int index array; return sorted
    unique int indices, validated (nonempty, in range, not every channel —
    with nothing observed the smoother would run on the prior alone and the
    'evaluation' would score a model that saw no data)."""
    h = np.asarray(heldout)
    if h.dtype == bool:
        if h.shape != (ydim,):
            raise ValueError(
                f"boolean heldout must have shape ({ydim},); got {h.shape}"
            )
        idx = np.flatnonzero(h)
    else:
        idx = np.unique(h.astype(np.int64).ravel())
        if idx.size and (idx[0] < 0 or idx[-1] >= ydim):
            raise ValueError(
                f"heldout indices must lie in [0, {ydim}); got "
                f"[{idx[0]}, {idx[-1]}]"
            )
    if idx.size == 0:
        raise ValueError("heldout selects no channels")
    if idx.size >= ydim:
        raise ValueError(
            "heldout selects every channel — nothing would be observed; "
            "hold out a strict subset"
        )
    return idx


def heldout_eval(
    cfg: VJFConfig,
    state: TrainState,
    ys: Array,
    heldout,
    x_ref: Optional[Array] = None,
    us: Optional[Array] = None,
    n_iter: Optional[int] = None,
    mesh=None,
    channel_mask: Optional[Array] = None,
) -> HeldoutEval:
    """Co-smoothing evaluation: smooth with ``heldout`` channels masked
    out (they contribute exactly nothing to inference — the missing-data
    limit of the smoother), then score their predictive log-likelihood.

    ``ys``: (T, ydim) one sequence or (T, B, ydim) a batch of trials (the
    batch smooths in one vmapped dispatch; scores pool over trials).
    ``heldout``: int indices or a boolean (ydim,) mask of channels to hold
    out — normalized to SORTED UNIQUE indices; the returned ``eta`` /
    ``pred`` columns follow ``res.heldout`` (sorted), NOT the caller's
    argument order. ``x_ref`` / ``us`` / ``n_iter`` pass through to the
    smoother (:func:`vjf_tpu.models.smoothing.smooth_iterated` /
    :func:`~vjf_tpu.models.smoothing.smooth_batch`); ``n_iter=None``
    resolves to 8 for Poisson / 1 for Gaussian identically for BOTH input
    shapes, so (T, ydim) and (T, 1, ydim) score the same data the same
    way. ``mesh`` shards the batched smoother over trials and applies only
    to (T, B, ydim) input — passing it with a 2-d ``ys`` raises.

    ``channel_mask``: optional (T, ydim) (or (T, B, ydim) per-trial) 0/1
    observed-entry mask for data with electrode dropout — entries missing
    in the RECORDING. It composes with ``heldout``: inference sees only
    entries that are observed AND not held out; scoring (loglik, null,
    spikes, R²) runs over the observed held-out entries only (a held-out
    entry that was never recorded contributes nothing to either side, and
    its stored value may be NaN).

    The held-out VALUES in ``ys`` are used only for scoring, never for
    inference — pinned by ``tests/test_evaluate.py`` (corrupting them
    changes no prediction).
    """
    ys = wire_ingest(ys, cfg.jdtype)
    if ys.ndim not in (2, 3):
        raise ValueError(f"ys must be (T, ydim) or (T, B, ydim); got {ys.shape}")
    if ys.shape[-1] != cfg.ydim:
        raise ValueError(f"ys last dim must be ydim={cfg.ydim}; got {ys.shape}")
    idx = _normalize_heldout(heldout, cfg.ydim)
    t_len = ys.shape[0]

    cm_row = np.ones((cfg.ydim,), dtype=np.float64)
    cm_row[idx] = 0.0
    held_mask = jnp.asarray(
        np.broadcast_to(cm_row, (t_len, cfg.ydim)).copy(), cfg.jdtype
    )
    if channel_mask is not None:
        channel_mask = jnp.asarray(channel_mask, cfg.jdtype)
        valid = ((t_len, cfg.ydim),) + (
            ((t_len, ys.shape[1], cfg.ydim),) if ys.ndim == 3 else ()
        )
        if channel_mask.shape not in valid:
            raise ValueError(
                f"channel_mask must have shape in {valid}; "
                f"got {channel_mask.shape}"
            )
        if channel_mask.ndim == 3 and held_mask.ndim == 2:
            held_mask = held_mask[:, None, :]
        infer_mask = channel_mask * held_mask
        # scoring weight: observed AND held out
        obs_w = channel_mask[..., idx]
        if obs_w.ndim == 2 and ys.ndim == 3:
            obs_w = obs_w[:, None, :]
        obs_w = jnp.broadcast_to(obs_w, ys[..., idx].shape)
    else:
        infer_mask = held_mask
        obs_w = jnp.ones_like(ys[..., idx])

    # one shared default for both input shapes (smooth_batch's resolution);
    # (T, ydim) vs (T, 1, ydim) must score identically
    if n_iter is None:
        n_iter = 8 if cfg.likelihood == "poisson" else 1
    if ys.ndim == 3:
        _, smoothed = smoothing.smooth_batch(
            cfg, state, ys, x_ref=x_ref, channel_mask=infer_mask,
            mesh=mesh, us=us, n_iter=n_iter,
        )
    else:
        if mesh is not None:
            raise ValueError(
                "mesh= applies only to batched (T, B, ydim) input; a single "
                "(T, ydim) sequence smooths unsharded — drop mesh or add a "
                "trial axis"
            )
        _, smoothed = smoothing.smooth_iterated(
            cfg, state, ys, x_ref=x_ref, channel_mask=infer_mask,
            us=us, n_iter=n_iter,
        )

    return _score_heldout(cfg, state, ys, idx, obs_w, smoothed)


def _score_heldout(
    cfg: VJFConfig, state: TrainState, ys: Array, idx: np.ndarray,
    obs_w: Array, smoothed,
) -> HeldoutEval:
    """Score held-out channels against a smoother result (the scoring
    half of :func:`heldout_eval`, shared with the vmapped k-fold path).

    One JITTED dispatch (the eager version chained ~30 per-op dispatch
    round-trips). Measured on-chip this does NOT move the warm k-fold
    wall (48.6 vs 48.5 s): the fold cost is the iterated-Laplace
    smoother's own compute (assoc-scan batches of 10x10 inv/solve),
    which block_until_ready under-reports through the tunnel (trap 2) —
    the jit is kept for the dispatch-count hygiene."""
    out = _score_heldout_jit(
        cfg, tuple(int(i) for i in idx), state, ys, obs_w,
        smoothed.means, smoothed.covs,
    )
    if cfg.likelihood == "poisson":
        eta, pred, loglik, loglik_null, r2, bits, n_spk = out
    else:
        eta, pred, loglik, loglik_null, r2 = out
        bits = n_spk = None
    return HeldoutEval(
        eta=eta, pred=pred, loglik=loglik, loglik_null=loglik_null,
        bits_per_spike=bits, r2=r2, heldout=idx,
        smoothed_means=smoothed.means, n_spikes=n_spk,
    )


@partial(jax.jit, static_argnames=("cfg", "idx"))
def _score_heldout_jit(cfg, idx, state, ys, obs_w, means, covs):
    idx = jnp.asarray(idx)
    c_h = state.params.decoder.w[idx]           # (k, xdim)
    d_h = state.params.decoder.b[idx]           # (k,)
    # scored values: 0 at unobserved entries (stored NaN must not leak
    # through 0*NaN into the weighted sums)
    y_h = jnp.where(obs_w > 0, ys[..., idx], 0.0)
    eta = means @ c_h.T + d_h                   # (T[, B], k)
    # per-channel latent-uncertainty variance diag(C P C^T)
    s2 = jnp.einsum("ki,...ij,kj->...k", c_h, covs, c_h)

    def _chan_mean(v):
        """Per-channel weighted mean over all (T[, B]) observed entries."""
        w = obs_w.reshape(-1, idx.size)
        return (jnp.sum(w * v.reshape(-1, idx.size), axis=0)
                / jnp.clip(jnp.sum(w, axis=0), 1e-12))

    if cfg.likelihood == "poisson":
        # posterior-predictive mean rate (lognormal mean), under the same
        # runaway clamp the training likelihood applies to eta
        # (likelihoods.py poisson_nll, /root/reference/vjf/likelihood.py:60)
        log_rate = jnp.clip(eta + 0.5 * s2, None, cfg.poisson_clamp)
        pred = jnp.exp(log_rate)
        loglik = jnp.sum(
            obs_w * (y_h * log_rate - pred - gammaln(y_h + 1.0))
        )
        # null: per-channel constant mean rate on the evaluated segment
        rate0 = jnp.clip(_chan_mean(y_h), 1e-10)
        loglik_null = jnp.sum(
            obs_w * (y_h * jnp.log(rate0) - rate0 - gammaln(y_h + 1.0))
        )
        n_spk = jnp.sum(obs_w * y_h)
        bits = jnp.where(
            n_spk > 0,
            (loglik - loglik_null) / (n_spk * jnp.log(2.0)),
            jnp.nan,
        )
    else:
        if cfg.likelihood != "gaussian":
            raise NotImplementedError(f"unknown likelihood {cfg.likelihood}")
        var = s2 + jnp.exp(state.params.likelihood.logvar)
        pred = eta
        loglik = -0.5 * jnp.sum(
            obs_w * (jnp.log(2.0 * jnp.pi * var) + (y_h - pred) ** 2 / var)
        )
        mu0 = _chan_mean(y_h)
        var0_mle = _chan_mean((y_h - mu0) ** 2)
        # a channel with <2 observed entries (possible under channel_mask
        # dropout) has MLE variance ~0 and an unfloored null would gain
        # ~+13 nats per such entry, spuriously reporting the model as
        # losing to the null. Replace ONLY those degenerate channels'
        # null variance with the pooled held-out variance (a neutral
        # stand-in); well-observed channels keep their exact MLE null —
        # a blanket pooled-fraction floor would distort low-variance
        # channels on heterogeneous-scale populations (r3 review)
        w_all = obs_w.reshape(-1, idx.size)
        cnt = jnp.sum(w_all, axis=0)
        pooled = (jnp.sum(w_all * (y_h.reshape(-1, idx.size) - mu0) ** 2)
                  / jnp.clip(jnp.sum(w_all), 1.0))
        var0 = jnp.where(
            cnt >= 2.0,
            jnp.clip(var0_mle, 1e-12),
            jnp.maximum(pooled, 1e-12),
        )
        loglik_null = -0.5 * jnp.sum(
            obs_w * (jnp.log(2.0 * jnp.pi * var0) + (y_h - mu0) ** 2 / var0)
        )

    resid = jnp.sum(obs_w * (y_h - pred) ** 2)
    total = jnp.sum(obs_w * (y_h - _chan_mean(y_h)) ** 2)
    r2 = 1.0 - resid / jnp.clip(total, 1e-12)

    if cfg.likelihood == "poisson":
        return eta, pred, loglik, loglik_null, r2, bits, n_spk
    return eta, pred, loglik, loglik_null, r2


class KFoldEval(NamedTuple):
    """Result of :func:`kfold_channel_eval`. ``folds`` holds the per-fold
    :class:`HeldoutEval`s (fold f's channels are ``folds[f].heldout``);
    the scalars pool over folds, so every channel is scored exactly once
    while inference for each fold still sees the other ``k-1`` folds."""

    folds: Tuple[HeldoutEval, ...]
    loglik: float
    loglik_null: float
    bits_per_spike: Optional[float]   # Poisson; pooled over all folds
    r2: np.ndarray                    # (k,) per-fold prediction R²


def _kfold_folds_vmapped(
    cfg: VJFConfig,
    state: TrainState,
    ys: Array,
    fold_idx,
    x_ref: Optional[Array] = None,
    us: Optional[Array] = None,
    n_iter: Optional[int] = None,
    mesh=None,
    channel_mask: Optional[Array] = None,
) -> Tuple[HeldoutEval, ...]:
    """All ``n_folds`` co-smoothing folds in ONE batched-smoother dispatch.

    A fold is just a channel mask, and the batched smoother already vmaps
    over trials — so the folds ride the trial axis: the data is tiled to
    (T, F*B, ydim), trial slot ``f*B + b`` carries fold f's infer mask,
    and one :func:`smoothing.smooth_batch` call (8 iterated-Laplace
    passes for Poisson) smooths everything. The sequential fold loop paid
    F of those dispatch chains back-to-back (flagship: 312 s for 5 folds
    — docs/RESULTS.md); scoring is unchanged (:func:`_score_heldout` per
    fold on the per-fold slices). Memory: the smoother covariances become
    (T, F*B, xdim, xdim) — chunk or fall back to ``vmap_folds=False`` for
    very long sequences.
    """
    ys = wire_ingest(ys, cfg.jdtype)
    squeeze = ys.ndim == 2
    ys3 = ys[:, None, :] if squeeze else ys
    t_len, n_b, _ = ys3.shape
    n_folds = len(fold_idx)
    if mesh is not None and squeeze:
        raise ValueError(
            "mesh= applies only to batched (T, B, ydim) input"
        )

    rows = np.ones((n_folds, cfg.ydim), dtype=np.float64)
    for f, idx in enumerate(fold_idx):
        rows[f, idx] = 0.0
    # trial slot f*B + b carries fold f's mask
    fold_rows = np.repeat(rows, n_b, axis=0)            # (F*B, ydim)
    infer = jnp.asarray(
        np.broadcast_to(fold_rows, (t_len,) + fold_rows.shape).copy(),
        cfg.jdtype,
    )
    if channel_mask is not None:
        cm = jnp.asarray(channel_mask, cfg.jdtype)
        if cm.ndim == 2:
            # shared over trials -> shared over every F*B slot
            cm_rep = jnp.broadcast_to(cm[:, None, :], infer.shape)
        elif cm.shape == (t_len, n_b, cfg.ydim):
            cm_rep = jnp.tile(cm, (1, n_folds, 1))
        else:
            raise ValueError(
                f"channel_mask must be (T, ydim) or (T, B, ydim); got "
                f"{cm.shape}"
            )
        infer = infer * cm_rep
    ys_rep = jnp.tile(ys3, (1, n_folds, 1))
    us_rep = None
    if us is not None:
        u = jnp.asarray(us, cfg.jdtype)
        # (T, udim) shared controls stay shared across the F*B slots;
        # per-trial (T, B, udim) tiles along the fold axis
        us_rep = u if u.ndim == 2 else jnp.tile(u, (1, n_folds, 1))
    x_rep = None
    if x_ref is not None:
        xr = jnp.asarray(x_ref, cfg.jdtype)
        if xr.ndim == 2:
            xr = xr[:, None, :]
        x_rep = jnp.tile(xr, (1, n_folds, 1))
    if n_iter is None:
        n_iter = 8 if cfg.likelihood == "poisson" else 1
    _, smoothed = smoothing.smooth_batch(
        cfg, state, ys_rep, x_ref=x_rep, channel_mask=infer, mesh=mesh,
        us=us_rep, n_iter=n_iter,
    )

    folds = []
    for f, idx in enumerate(fold_idx):
        sl = slice(f * n_b, (f + 1) * n_b)
        view = smoothing.pkalman.SmoothResult(
            means=smoothed.means[:, sl].squeeze(1) if squeeze
            else smoothed.means[:, sl],
            covs=smoothed.covs[:, sl].squeeze(1) if squeeze
            else smoothed.covs[:, sl],
        )
        if channel_mask is not None:
            cm = jnp.asarray(channel_mask, cfg.jdtype)
            obs_w = cm[..., idx]
            if obs_w.ndim == 2 and not squeeze:
                obs_w = obs_w[:, None, :]
            obs_w = jnp.broadcast_to(obs_w, ys[..., idx].shape)
        else:
            obs_w = jnp.ones_like(ys[..., idx])
        folds.append(_score_heldout(cfg, state, ys, idx, obs_w, view))
    return tuple(folds)


def kfold_channel_eval(
    cfg: VJFConfig,
    state: TrainState,
    ys: Array,
    n_folds: int = 5,
    seed: int = 0,
    vmap_folds: bool = False,
    fold_chunk: Optional[int] = None,
    **kwargs,
) -> KFoldEval:
    """Rotate :func:`heldout_eval` over ``n_folds`` disjoint channel folds
    (a random balanced partition, ``seed``-deterministic) so EVERY channel
    gets a co-smoothing score from a smoother that never saw it —
    population-level evaluation with no sacrificed channels. ``kwargs``
    pass through to :func:`heldout_eval` (``x_ref``/``us``/``n_iter``/
    ``mesh``/``channel_mask``).

    ``vmap_folds=True``: all folds smooth in ONE batched dispatch — the
    fold axis rides the smoother's trial vmap
    (:func:`_kfold_folds_vmapped`; equality with the sequential loop is
    test-pinned). Measured on-chip at flagship scale (5 folds x 256
    trials, docs/RESULTS.md): the sequential loop's recorded 312 s wall
    was ~80% COMPILE (warm-cache 48.5 s), and the fold-vmapped variant
    is no faster warm (54.1 s — the 256-trial smoother already saturates
    the chip) while paying a larger cold compile, so the sequential loop
    stays the default; the vmapped path is for dispatch-latency-bound
    small models and one-dispatch composition. ``fold_chunk = c`` bounds
    the vmapped width to ``c`` folds per dispatch — mandatory at large
    F*B (the flagship's 1280-trial graph crashes the TPU compiler).

    Pooled ``bits_per_spike`` uses total loglik gain over total spikes
    (not a mean of per-fold ratios — folds with more spikes weigh more,
    matching the single-split definition applied to the union).
    """
    if not 2 <= n_folds <= cfg.ydim:
        raise ValueError(
            f"n_folds must be in [2, ydim={cfg.ydim}]; got {n_folds}"
        )
    perm = np.random.default_rng(seed).permutation(cfg.ydim)
    fold_idx = [np.sort(perm[f::n_folds]) for f in range(n_folds)]
    if vmap_folds:
        c = n_folds if not fold_chunk else max(1, int(fold_chunk))
        folds = []
        for lo in range(0, n_folds, c):
            folds.extend(_kfold_folds_vmapped(
                cfg, state, ys, fold_idx[lo:lo + c], **kwargs
            ))
        folds = tuple(folds)
    else:
        folds = tuple(
            heldout_eval(cfg, state, ys, fold_idx[f], **kwargs)
            for f in range(n_folds)
        )
    ll = float(sum(float(f.loglik) for f in folds))
    ll0 = float(sum(float(f.loglik_null) for f in folds))
    if cfg.likelihood == "poisson":
        n_spk = sum(float(f.n_spikes) for f in folds)
        bits = (ll - ll0) / (n_spk * np.log(2.0)) if n_spk > 0 else float("nan")
    else:
        bits = None
    return KFoldEval(
        folds=folds, loglik=ll, loglik_null=ll0, bits_per_spike=bits,
        r2=np.array([float(f.r2) for f in folds]),
    )
