"""Ensemble ``fit``: N independent models trained in ONE dispatch stream.

The multi-chip scaling analysis (docs/ARCHITECTURE.md §4) concludes that
for VJF's tiny per-step state the profitable parallel regime is
*independent* filters — seed ensembles, per-subject models, hyperparameter
sweeps — not one shared posterior with per-step collectives. Round 2 left
only epoch-level plumbing (``run_epoch_ensemble``); this module productizes
the full ``fit`` state machine (``/root/reference/vjf/model.py:223-307``)
per member:

* **per-member phases**: each member runs its own warm-up plateau exit,
  decoder freeze, dynamics bootstrap, convergence patience, and
  ExponentialLR schedule, transitioning independently — exactly the solo
  :func:`vjf_tpu.models.vjf.fit` semantics (member k of an ensemble equals
  a solo fit of member k, phase transitions included; pinned by
  ``tests/test_ensemble.py``).
* **one dispatch per epoch** regardless of phase mix: while every member
  shares a phase (the common case — all start warm, and plateaus cluster)
  the epoch runs the static-flag vmapped path, which engages the fused /
  mega Pallas kernels on TPU (the kernels batch — ``tests/
  test_sharding.py::test_ensemble_vmap_fused_path``). Phase-MIXED epochs
  run one vmapped XLA epoch with a traced per-member ``warm_gate`` (see
  :func:`vjf_tpu.models.vjf.filter_step`) — numerically identical to the
  member-wise static traces, still a single dispatch. Mixed-phase epochs
  therefore run at XLA-path (not mega-kernel) speed; that window is
  short (plateaus cluster), and the alternative — per-phase static
  sub-dispatches — would recompile the mega kernel for every distinct
  phase-split size (20-40 s each through a remote runtime), costing more
  than it saves.
* **per-member hot-tau safety** (round-2 weak #3; made per-member in
  round 4): on the mega layout the per-member skipped-update fraction is
  read from the vmapped tau stream; a pervasively-hot member has its
  epoch re-run on the XLA path (per-step exact-inverse fallback) from
  its PD-repaired pre-epoch backup via a pow2-padded SUBSET dispatch and
  the results scattered back (:func:`_rerun_hot_members`) — healthy
  members keep their mega trajectories bit-identical (reference
  semantics: members are independent fits, ``vjf/model.py:223-307``).
  There is no persistent per-member demotion state: the vmapped mega
  dispatch computes every member regardless, so each epoch doubles as a
  free repromote probe. Only the degenerate all-hot case (workload
  physics — members share the batch size, and mega would be pure waste)
  demotes the whole ensemble with the solo repromote machinery.
* **multi-chip**: pass ``mesh`` to shard the MEMBER axis
  (:func:`shard_ensemble`) — zero inter-chip collectives; each chip runs
  whole filters at single-chip mega throughput. This is the scaling mode
  the sharded-posterior path cannot beat (its per-step psum costs 2.7x
  per-chip throughput at flagship scale, docs/ARCHITECTURE.md §4).

Shared vs per-member data: ``ys`` may be ``(T, B, ydim)`` (one data set,
e.g. a seed ensemble — vmapped with ``in_axes=None``, no N-fold copy) or
``(N, T, B, ydim)`` (per-subject / per-fold data).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StepFlags, VJFConfig
from ..models import vjf as core
from ..models.vjf import _isclose, _pooled_controls, _transition
from ..ops.pallas import fused_step as _fused

import logging

logger = logging.getLogger(__name__)


class EnsembleFitResult(NamedTuple):
    """Per-member :class:`vjf_tpu.models.vjf.FitResult` fields, stacked on
    a leading member axis. Frozen at each member's own stopping epoch (a
    member that converges early stops evolving while the rest train on)."""

    mu: jax.Array          # (N, T, B, xdim) posterior means, each member's final epoch
    logvar: jax.Array      # (N, T, B, xdim)
    loss: np.ndarray       # (N,) final epoch mean loss per member
    states: core.TrainState  # stacked TrainState (N leading axis)
    warm_up: np.ndarray    # (N,) bool — True if the member never left warm-up
    lr: np.ndarray         # (N,) post-run schedule position per member
    epochs_run: np.ndarray  # (N,) epochs each member actually executed
    # cfg.select='forecast' only (per-member forecast-gated selection —
    # solo FitResult.selected_epoch semantics, member k == solo fit k):
    # the epoch whose snapshot each member returned (-1 = no snapshot,
    # e.g. warm-up never ended) and its rollout-RMSE metric (nan likewise)
    selected_epoch: Optional[np.ndarray] = None   # (N,) int
    selected_metric: Optional[np.ndarray] = None  # (N,) float


# module attribute (not a bare re-export inside the drivers) so tests can
# monkeypatch the decision; the shared implementation lives next to the
# tau thresholds it reads (ops/pallas/fused_step.py)
_prefix_free_next = _fused.prefix_free_next


def _member_select(take, new, old):
    """Per-member pytree select: leaf[i] <- new[i] where take[i]."""
    take = jnp.asarray(take)

    def sel(n, o):
        t = take.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(t, n, o)

    return jax.tree.map(sel, new, old)


# Module-level jitted dispatches: a fresh jax.jit(lambda) per fit_ensemble
# call would recompile every epoch variant on every call (measured on-chip:
# 2.77 s/epoch of pure recompilation vs 0.13 s executed). Static keys carry
# the per-call structure; None-valued pytree args (mask/warms) are part of
# the jit cache key automatically.
@partial(jax.jit, static_argnames=("cfg", "flags", "y_ax", "u_ax"))
def _ensemble_epoch(cfg, flags, y_ax, u_ax, sts, y, us, ks, lr,
                    warms, mask, channel_mask):
    def one(st, yy, uu, k, *w):
        return core.run_epoch(
            cfg, flags, st, yy, uu, k, lr, mask=mask,
            channel_mask=channel_mask, warm_gate=w[0] if w else None,
        )

    axes = (0, y_ax, u_ax, 0) + ((0,) if warms is not None else ())
    args = (sts, y, us, ks) + ((warms,) if warms is not None else ())
    return jax.vmap(one, in_axes=axes)(*args)


@partial(jax.jit, static_argnames=("cfg", "flags", "y_ax", "u_ax"))
def _ensemble_epochs(cfg, flags, y_ax, u_ax, sts, y, us, eks, lrs,
                     warms, mask, channel_mask):
    """Vmapped :func:`core.run_epochs` — K epochs per member per dispatch
    (the blocked-ensemble mode). ``lrs`` (K,) is shared across members
    (same schedule position — see the lr note in :func:`fit_ensemble`);
    ``eks`` is (N, K) per-member per-epoch keys; ``warms`` an optional
    (N,) phase gate held constant across the block."""
    def one(st, yy, uu, ks, *w):
        return core.run_epochs(
            cfg, flags, st, yy, uu, ks, lrs, mask=mask,
            channel_mask=channel_mask, warm_gate=w[0] if w else None,
        )

    axes = (0, y_ax, u_ax, 0) + ((0,) if warms is not None else ())
    args = (sts, y, us, eks) + ((warms,) if warms is not None else ())
    return jax.vmap(one, in_axes=axes)(*args)


@partial(jax.jit, static_argnames=("cfg", "u_ax"))
def _ensemble_boot(cfg, u_ax, sts, q_means, us, ks, pair_w):
    init_fn = _transition(cfg).dynamics_initialize
    xdim = cfg.xdim

    def one(st, qm, uu, k):
        xt = qm[1:].reshape(-1, xdim)
        xs = qm[:-1].reshape(-1, xdim)
        u_init = _pooled_controls(cfg, uu, pair_w)
        return st._replace(
            dynamics=init_fn(cfg, k, st.dynamics, xt, xs, u_init,
                             weights=pair_w)
        )

    return jax.vmap(one, in_axes=(0, 0, u_ax, 0))(sts, q_means, us, ks)


@partial(jax.jit, static_argnames=("cfg", "u_ax"))
def _ensemble_adapt(cfg, u_ax, sts, q_means, us, pair_w):
    from ..gp.sgp import adapt_hyperparams

    xdim = cfg.xdim

    def one(st, qm, uu):
        return st._replace(dynamics=adapt_hyperparams(
            cfg, st.dynamics,
            qm[1:].reshape(-1, xdim), qm[:-1].reshape(-1, xdim),
            _pooled_controls(cfg, uu, pair_w), weights=pair_w,
        ))

    return jax.vmap(one, in_axes=(0, 0, u_ax))(sts, q_means, us)


@partial(jax.jit, static_argnames=("cfg",))
def _ensemble_msrefine(cfg, sts, q_means):
    return jax.vmap(
        lambda st, qm: core.multistep_refine(cfg, st, qm)
    )(sts, q_means)


@partial(jax.jit, static_argnames=("cfg", "flags", "n_batch"))
def _ensemble_repair(cfg, flags, n_batch, sts):
    return jax.vmap(
        lambda st: _fused.maybe_epoch_repair(cfg, flags, st, n_batch)
    )(sts)


_gather_jit = jax.jit(lambda idx, tree: jax.tree.map(lambda x: x[idx], tree))
# duplicate indices (the pow2 padding repeats idx[0]) write identical rows —
# safe under .at[].set
_scatter_jit = jax.jit(
    lambda idx, new, old: jax.tree.map(lambda n, o: o.at[idx].set(n), new, old)
)


def _padded_hot_indices(hot: np.ndarray) -> np.ndarray:
    """Hot-member index vector padded to the next power of two (bounds the
    subset-dispatch compile variants to log2(N); padding repeats the first
    hot index, whose duplicate results scatter the same values)."""
    idx = np.flatnonzero(hot)
    pad = 1 << max(len(idx) - 1, 0).bit_length()
    return np.concatenate([idx, np.repeat(idx[:1], pad - len(idx))])


def _rerun_hot_members(cfg, flags, n_batch, y_ax, u_ax, backup, y, us, ks,
                       lr, mask, channel_mask, hot, result, losses,
                       epochs_mode=False, lrs=None):
    """Per-member hot-tau demotion: re-run ONLY the hot members' epoch (or
    block, ``epochs_mode``) on the XLA path from their PD-repaired
    pre-epoch backup, and scatter the results back — the healthy members'
    trajectories stay bit-identical to the all-mega run (reference
    semantics: members are independent fits, ``vjf/model.py:223-307``,
    so one pathological subject must not drag N-1 healthy members off the
    mega kernel).

    Unlike the solo fit there is no persistent demotion or repromote
    budget: the vmapped mega dispatch computes every member regardless,
    so a hot member's next-epoch mega slice is free — each epoch IS the
    repromote probe, and a member that cools simply keeps its mega
    result. The only marginal cost is this subset dispatch on hot epochs.
    """
    pidx = _padded_hot_indices(hot)
    pidx_t = jnp.asarray(pidx)
    sub_states = _ensemble_repair(
        cfg, flags, n_batch, _gather_jit(pidx_t, backup)
    )
    sub_y = y[pidx_t] if y_ax == 0 else y
    sub_us = us[pidx_t] if u_ax == 0 else us
    sub_ks = ks[pidx_t]
    cfg_off = cfg.replace(fused_step="off")
    # the XLA path reports no tau (metrics.tau=None) while the mega result
    # carries one — scatter field-wise around that leaf and keep the mega
    # tau (it was already consumed by the hot detection)
    if epochs_mode:
        sub = _ensemble_epochs(cfg_off, flags, y_ax, u_ax, sub_states,
                               sub_y, sub_us, sub_ks, lrs, None, mask,
                               channel_mask)
        sub_losses = np.asarray(sub.epoch_loss)          # (pad, K)
        merged = core.EpochsResult(
            state=_scatter_jit(pidx_t, sub.state, result.state),
            q_means=result.q_means.at[pidx_t].set(sub.q_means),
            q_logvars=result.q_logvars.at[pidx_t].set(sub.q_logvars),
            epoch_loss=result.epoch_loss.at[pidx_t].set(sub.epoch_loss),
            epoch_metrics=core.Metrics(
                *(
                    o.at[pidx_t].set(n)
                    for n, o in zip(sub.epoch_metrics[:4],
                                    result.epoch_metrics[:4])
                ),
                tau=result.epoch_metrics.tau,
            ),
            max_tau=result.max_tau.at[pidx_t].set(0.0),
            hot_frac=result.hot_frac.at[pidx_t].set(0.0),
        )
    else:
        sub = _ensemble_epoch(cfg_off, flags, y_ax, u_ax, sub_states,
                              sub_y, sub_us, sub_ks, lr, None, mask,
                              channel_mask)
        sub_losses = np.asarray(jnp.mean(sub.metrics.loss, axis=-1))
        merged = core.EpochResult(
            state=_scatter_jit(pidx_t, sub.state, result.state),
            q_means=result.q_means.at[pidx_t].set(sub.q_means),
            q_logvars=result.q_logvars.at[pidx_t].set(sub.q_logvars),
            metrics=core.Metrics(
                *(
                    o.at[pidx_t].set(n)
                    for n, o in zip(sub.metrics[:4], result.metrics[:4])
                ),
                tau=result.metrics.tau,
            ),
        )
    n_hot = int(hot.sum())
    losses = np.array(losses)
    losses[pidx[:n_hot]] = sub_losses[:n_hot]
    return merged, losses


_select_jit = jax.jit(_member_select)


@partial(jax.jit, static_argnames=("cfg", "y_ax", "u_ax"))
def _ensemble_select_metric(cfg, y_ax, u_ax, sts, q_means, y, us, ks):
    """Per-member forecast-selection metric (``core.rollout_rmse``) in one
    vmapped dispatch; returns (N,) rollout RMSEs."""
    return jax.vmap(
        lambda st, qm, yy, uu, k: core.rollout_rmse(cfg, st, qm, yy, uu, k),
        in_axes=(0, 0, y_ax, u_ax, 0),
    )(sts, q_means, y, us, ks)


@jax.jit
def _fold_members(keys, data):
    """fold_in per member key — the ensemble mirror of the solo fit's
    selection-stream derivation (never perturbs the training chains).
    Module-level jit: a fresh vmap per epoch would re-trace inside the
    dispatch-latency-sensitive driver (trap 19)."""
    return jax.vmap(lambda k: jax.random.fold_in(k, data))(keys)


class _SelectTracker:
    """Host-side per-member best-forecast snapshot tracker shared by the
    per-epoch and blocked ensemble drivers (solo ``fit`` selection
    semantics per member; device buffers updated via member selects)."""

    def __init__(self, n_models: int, sel_base):
        self.sel_base = sel_base
        self.best_sel = np.full(n_models, np.inf)
        self.best_loss = np.full(n_models, np.nan)
        self.sel_epoch = np.full(n_models, -1, dtype=np.int64)
        self.have = np.zeros(n_models, dtype=bool)
        self.states = None
        self.mu = None
        self.lv = None

    def observe(self, cfg, y_ax, u_ax, states, result_mu, result_lv,
                y, us, epoch: int, eligible: np.ndarray, losses: np.ndarray):
        if not eligible.any():
            return
        k_sel = _fold_members(self.sel_base, epoch)
        sel = np.asarray(_ensemble_select_metric(
            cfg, y_ax, u_ax, states, result_mu, y, us, k_sel
        ))
        sel = np.where(np.isfinite(sel), sel, np.inf)  # NaN never selects
        take = eligible & (sel < self.best_sel)
        if not take.any():
            return
        if self.states is None:
            # alias init is safe (arrays immutable); only members with
            # have=True are ever read back
            self.states, self.mu, self.lv = states, result_mu, result_lv
        tk = jnp.asarray(take)
        self.states = _select_jit(tk, states, self.states)
        bshape = (-1,) + (1,) * (self.mu.ndim - 1)
        self.mu = jnp.where(tk.reshape(bshape), result_mu, self.mu)
        self.lv = jnp.where(tk.reshape(bshape), result_lv, self.lv)
        self.best_sel = np.where(take, sel, self.best_sel)
        self.best_loss = np.where(take, losses, self.best_loss)
        self.sel_epoch = np.where(take, epoch, self.sel_epoch)
        self.have |= take

    def snapshot(self):
        """Serializable view (a plain tuple pytree) for
        ``utils.checkpoint.save_ensemble_checkpoint``."""
        return (self.sel_base, self.best_sel, self.best_loss,
                self.sel_epoch, self.have, self.states, self.mu, self.lv)

    @classmethod
    def restore(cls, n_models: int, snap):
        t = cls(n_models, jnp.asarray(snap[0]))
        t.best_sel = np.asarray(snap[1])
        t.best_loss = np.asarray(snap[2])
        t.sel_epoch = np.asarray(snap[3]).astype(np.int64)
        t.have = np.asarray(snap[4]).astype(bool)
        t.states, t.mu, t.lv = snap[5], snap[6], snap[7]
        return t

    def finalize(self, states, mu_store, lv_store, losses_final):
        """Merge the best snapshots into the final result tensors; returns
        (states, mu, logvar, loss, selected_epoch, selected_metric)."""
        if not self.have.any():
            return (states, mu_store, lv_store, losses_final,
                    self.sel_epoch, np.where(self.have, self.best_sel, np.nan))
        hb = jnp.asarray(self.have)
        states = _select_jit(hb, self.states, states)
        bshape = (-1,) + (1,) * (mu_store.ndim - 1)
        mu_store = jnp.where(hb.reshape(bshape), self.mu, mu_store)
        lv_store = jnp.where(hb.reshape(bshape), self.lv, lv_store)
        losses_final = np.where(self.have, self.best_loss, losses_final)
        return (states, mu_store, lv_store, losses_final, self.sel_epoch,
                np.where(self.have, self.best_sel, np.nan))


@partial(jax.jit, static_argnames=("cfg", "n_step", "noise"))
def forecast_ensemble(cfg, states, x0, key, n_step, u=None, noise=False):
    """Vmapped :func:`core.forecast` over the member axis — every member
    rolls out in ONE dispatch (the example's member loop costs N
    round-trips; on a tunneled runtime that is N x ~30 ms of pure
    latency). ``x0``: (N, B, xdim) per-member starts (or (N, xdim));
    ``u``: optional (n_step, ...) controls shared across members.
    Returns ``(xs, ys)`` with a leading member axis; distinct per-member
    weight-sampling streams are split from ``key``."""
    n_models = jax.tree_util.tree_leaves(states)[0].shape[0]
    keys = jax.random.split(key, n_models)
    return jax.vmap(
        lambda st, x, k: core.forecast(cfg, st, x, k, n_step, u=u,
                                       noise=noise)
    )(states, x0, keys)


def _split_members(keys):
    """Advance N member key chains one split (mirrors the solo fit's
    ``key, k = jax.random.split(key)`` per member)."""
    s = jax.vmap(jax.random.split)(keys)
    return s[:, 0], s[:, 1]


class EnsembleSnapshot(NamedTuple):
    """The COMPLETE per-member fit state machine at an epoch boundary —
    everything ``fit_ensemble`` evolves (host arrays + device pytrees) —
    so an interrupted multi-subject sweep resumes BIT-identically to the
    uninterrupted run (the ensemble mirror of
    ``utils.checkpoint.FitLoopState``; persisted via
    ``utils.checkpoint.save_ensemble_checkpoint``)."""

    epoch: object           # completed epochs
    warm: object            # (N,) bool
    done: object            # (N,) bool
    running: object         # (N,) running EMA loss
    losses_final: object    # (N,)
    plateau_hits: object    # (N,) int
    lr: object              # (N,) schedule positions
    epochs_run: object      # (N,) int
    keys: object            # (N, 2) member PRNG chains
    states: object          # stacked TrainState
    mu_store: object        # (N, T, B, xdim) | None (no epoch completed)
    lv_store: object
    demoted: object         # bool: whole-ensemble hot-tau demotion active
    demote_epoch: object    # int; -1 encodes None
    repromotes_left: object
    tracker: object         # forecast-selection tracker snapshot | None
    # resume-compatibility fingerprint (validated by resume_from — a
    # mismatched resume would otherwise SILENTLY violate the bit-exact
    # contract, e.g. a different epochs_per_dispatch changes the member
    # key-split cadence)
    n_models: object = None
    k_block: object = None    # epochs_per_dispatch of the saving run
    cfg_digest: object = None  # stable md5 of the resolved cfg (uint8[16])
    # prefix-free continuation engaged at the boundary (r5; None in older
    # snapshots restores as False — the layout re-engages after one clean
    # epoch, so an old-snapshot resume is valid, just one epoch slower)
    prefix_free: object = None


def _cfg_digest(cfg: VJFConfig) -> np.ndarray:
    from ..utils.checkpoint import config_digest

    return config_digest(cfg)


def _restore_host_state(snap: "EnsembleSnapshot"):
    """Re-host an :class:`EnsembleSnapshot`'s loop variables (shared by
    the per-epoch and blocked drivers — one source of truth for the
    resume state machine)."""
    de = int(np.asarray(snap.demote_epoch))
    return (
        int(np.asarray(snap.epoch)),
        np.asarray(snap.warm).astype(bool),
        np.asarray(snap.done).astype(bool),
        np.asarray(snap.running).astype(float),
        np.asarray(snap.losses_final).astype(float),
        np.asarray(snap.plateau_hits).astype(np.int64),
        np.asarray(snap.lr).astype(float),
        np.asarray(snap.epochs_run).astype(np.int64),
        snap.mu_store,
        snap.lv_store,
        bool(np.asarray(snap.demoted)),
        None if de < 0 else de,
        int(np.asarray(snap.repromotes_left)),
        (False if snap.prefix_free is None
         else bool(np.asarray(snap.prefix_free))),
    )


def _make_snapshot(epoch, warm, done, running, losses_final, plateau_hits,
                   lr, epochs_run, keys, states, mu_store, lv_store,
                   demoted, demote_epoch, repromotes_left, tracker,
                   n_models, k_block, cfg, prefix_free=False):
    return EnsembleSnapshot(
        epoch=np.int64(epoch), warm=warm.copy(), done=done.copy(),
        running=running.copy(), losses_final=losses_final.copy(),
        plateau_hits=plateau_hits.copy(), lr=lr.copy(),
        epochs_run=epochs_run.copy(), keys=keys, states=states,
        mu_store=mu_store, lv_store=lv_store, demoted=np.bool_(demoted),
        demote_epoch=np.int64(-1 if demote_epoch is None else demote_epoch),
        repromotes_left=np.int64(repromotes_left),
        tracker=None if tracker is None else tracker.snapshot(),
        n_models=np.int64(n_models), k_block=np.int64(k_block),
        cfg_digest=_cfg_digest(cfg), prefix_free=np.bool_(prefix_free),
    )


def fit_ensemble(
    cfg: VJFConfig,
    states,
    y,
    u=None,
    *,
    key: Optional[jax.Array] = None,
    keys: Optional[jax.Array] = None,
    max_iter: int = 200,
    beta: Optional[float] = None,
    rtol: Optional[float] = None,
    callback=None,
    mask=None,
    channel_mask=None,
    lr0: Optional[float] = None,
    mesh=None,
    epochs_per_dispatch: int = 1,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
) -> EnsembleFitResult:
    """Train every member of a stacked ensemble with the FULL per-member
    ``fit`` state machine in one dispatch stream (module docstring above;
    reference semantics per member: ``vjf/model.py:223-307``).

    :param states: stacked TrainState (leading member axis N) from
        :func:`init_ensemble`
    :param y: (T, B, ydim) shared data, or (N, T, B, ydim) per-member;
        (T, ydim) promotes to (T, 1, ydim)
    :param u: controls, same axis conventions (None for autonomous)
    :param key: base PRNG key — split into N member chains; or pass
        ``keys`` (N keys) directly to match N solo fits key-for-key
    :param mask: optional (T,)/(T, B) trial-validity mask, shared across
        members; ``channel_mask`` (T[, B], ydim) likewise
    :param mesh: optional Mesh — shards the member axis (zero-collective
        multi-chip; N should be a multiple of the mesh size)
    :param epochs_per_dispatch: K > 1 = the BLOCKED production mode (the
        ensemble analog of ``fit(epochs_per_dispatch=K)``): every member
        runs K epochs per device round-trip through vmapped
        ``run_epochs``, the per-member plateau state machine replayed
        host-side per block with phase transitions at block boundaries
        (same block-granular semantics as ``models/vjf._fit_blocked`` —
        an in-block plateau extends the current phase, strictly more
        training). Member k == a solo ``fit(epochs_per_dispatch=K)`` of
        member k. The dominant win for small-batch multi-subject sweeps,
        which are dispatch-latency-bound (measured: docs/RESULTS.md).
    :param checkpoint_path: with ``checkpoint_every=K > 0``, persist the
        COMPLETE per-member state machine every K epochs (block
        boundaries in blocked mode) via
        ``utils.checkpoint.save_ensemble_checkpoint``; the write is
        atomic, so a kill mid-save never corrupts the previous snapshot
    :param resume_from: path of such a snapshot — resume BIT-identically
        to the uninterrupted run (same cfg / data / epochs_per_dispatch
        required; the ``states``/``key`` argument VALUES are superseded
        by the snapshot)
    """
    beta = cfg.beta if beta is None else beta
    rtol = cfg.rtol if rtol is None else rtol
    n_models = int(jax.tree_util.tree_leaves(states)[0].shape[0])
    if keys is None:
        if key is None:
            raise ValueError("pass key= (split per member) or keys= (N,)")
        keys = jax.random.split(key, n_models)
    else:
        keys = jnp.asarray(keys)
        if keys.shape[0] != n_models:
            raise ValueError(
                f"keys leading axis {keys.shape[0]} != n_models {n_models}"
            )

    resume_snap = None
    if resume_from is not None:
        # exact mid-fit resume: the snapshot carries the COMPLETE
        # per-member state machine (resume with the same cfg / data /
        # epochs_per_dispatch; the `states`/`key` arguments' VALUES are
        # superseded by the snapshot)
        from ..utils.checkpoint import load_ensemble_checkpoint

        resume_snap = load_ensemble_checkpoint(resume_from)
        if not isinstance(resume_snap, EnsembleSnapshot):
            raise ValueError(
                f"resume_from {resume_from!r} is not a fit_ensemble "
                f"snapshot (got {type(resume_snap).__name__}); solo-fit "
                "snapshots resume through fit()"
            )
        states = resume_snap.states
        keys = jnp.asarray(resume_snap.keys)

    y = jnp.asarray(core.wire_ingest(y, cfg.jdtype))
    if y.ndim == 2:
        y = y[:, None, :]
    per_member_data = y.ndim == 4
    if per_member_data and y.shape[0] != n_models:
        raise ValueError(
            f"per-member y leading axis {y.shape[0]} != n_models {n_models}"
        )
    t_len, n_batch = (y.shape[1], y.shape[2]) if per_member_data else (y.shape[0], y.shape[1])
    y_ax = 0 if per_member_data else None

    if u is None:
        us = jnp.zeros(
            ((n_models,) if per_member_data else ()) + (t_len, n_batch, 0),
            dtype=cfg.jdtype,
        )
        u_ax = y_ax
    else:
        us = jnp.asarray(u, cfg.jdtype)
        if us.ndim == 4:
            u_ax = 0
        else:
            # shared controls: same promotion/broadcast as solo fit
            us = core._promote_u(us, t_len, n_batch, cfg.jdtype)
            u_ax = None
    mask = core._promote_mask(mask, t_len, n_batch, cfg.jdtype)
    channel_mask = core._promote_channel_mask(
        channel_mask,
        (t_len, n_batch, cfg.ydim),
        cfg.jdtype,
    )
    pair_w = (mask[1:] * mask[:-1]).reshape(-1) if mask is not None else None
    cfg = core._demote_masked_small_sgp(cfg, mask)
    select_on = core._validate_select(cfg, mask, channel_mask, None,
                                      t_len=t_len)
    if cfg.multistep_refine > 0 and (cfg.udim > 0 or mask is not None):
        # same constraint as solo fit, validated up-front (not after an
        # entire warm-up phase)
        raise ValueError(
            "multistep_refine supports autonomous, unmasked fits only "
            "(the rollout has no control/validity alignment)"
        )
    if cfg.multistep_refine > 0:
        import warnings

        # deprecated (r5): measured-negative — see solo fit()'s warning
        warnings.warn(
            "cfg.multistep_refine is deprecated: the measured A/B shows "
            "it does not improve (VdP: worsens) long-horizon forecasts; "
            "use cfg.select='forecast' instead (docs/RESULTS.md "
            "'Forecast-skill training'). The knob will be removed in a "
            "future release.",
            DeprecationWarning,
            stacklevel=2,
        )

    if mesh is not None:
        from .replicated import shard_ensemble

        states = shard_ensemble(states, mesh)
        spec = jax.sharding.PartitionSpec("dp")
        ns = jax.sharding.NamedSharding(mesh, spec)
        keys = jax.device_put(keys, ns)
        if per_member_data:
            y = jax.device_put(y, ns)

    if resume_snap is not None:
        # validate the snapshot against THIS call — a mismatched resume
        # (different member count / dispatch blocking / config) would
        # silently break the bit-exact-resume contract, not error.
        # Validation is UNCONDITIONAL: a snapshot missing these fields
        # (hand-edited, truncated, future format) is rejected rather than
        # resumed unvalidated (r4 advisor finding).
        if (resume_snap.n_models is None or resume_snap.k_block is None
                or resume_snap.cfg_digest is None):
            raise ValueError(
                "resume_from snapshot is missing validation fields "
                "(n_models/k_block/cfg_digest) — refusing to resume an "
                "unvalidatable snapshot"
            )
        snap_n = int(np.asarray(resume_snap.n_models))
        if snap_n != n_models:
            raise ValueError(
                f"resume_from snapshot has {snap_n} members; this "
                f"call passes states for {n_models}"
            )
        snap_k = int(np.asarray(resume_snap.k_block))
        if snap_k != int(epochs_per_dispatch):
            raise ValueError(
                f"resume_from snapshot was saved with "
                f"epochs_per_dispatch={snap_k}; resuming with "
                f"{int(epochs_per_dispatch)} would change the member "
                "key-split and plateau-replay cadence (not bit-exact)"
            )
        if not np.array_equal(np.asarray(resume_snap.cfg_digest),
                              _cfg_digest(cfg)):
            raise ValueError(
                "resume_from snapshot was saved under a different "
                "config; resume with the same cfg"
            )

    tracker = None
    if select_on:
        if resume_snap is not None and resume_snap.tracker is not None:
            tracker = _SelectTracker.restore(n_models, resume_snap.tracker)
        else:
            # sel_base folds from the ORIGINAL member keys at fit start —
            # on a fresh run `keys` still are those
            tracker = _SelectTracker(
                n_models, _fold_members(keys, core._SELECT_SALT)
            )

    if epochs_per_dispatch > 1:
        return _fit_ensemble_blocked(
            cfg, states, y, us, y_ax, u_ax, keys, mask, channel_mask,
            pair_w, n_models, n_batch, k_block=int(epochs_per_dispatch),
            max_iter=max_iter, beta=beta, rtol=rtol, callback=callback,
            lr0=lr0, tracker=tracker, checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, resume_snap=resume_snap,
        )

    # --- dispatches (module-level jitted; compiled once per variant) ---
    # lr is UNBATCHED: every active member shares the same schedule
    # position (unconditional decay from one lr0; a frozen member's epoch
    # output is select-discarded), and an unbatched lr is what lets the
    # mega kernel vmap — its lr rides an SMEM scalar, and Mosaic rejects
    # batched SMEM blocks (observed on-chip).
    def epoch_fn(flags, sts, ks, lr_s, warms=None, cfg_disp=None):
        return _ensemble_epoch(cfg_disp or cfg_run, flags, y_ax, u_ax, sts,
                               y, us, ks, lr_s, warms, mask, channel_mask)

    use_adapt = cfg.dynamics == "sgp" and cfg.sgp_adapt_lr > 0

    # --- per-member host state (the vectorized fit state machine) ---
    warm = np.ones(n_models, dtype=bool)
    done = np.zeros(n_models, dtype=bool)
    running = np.full(n_models, np.nan)
    losses_final = np.full(n_models, np.nan)
    plateau_hits = np.zeros(n_models, dtype=np.int64)
    lr = np.full(n_models, cfg.lr if lr0 is None else float(lr0))
    epochs_run = np.zeros(n_models, dtype=np.int64)
    mu_store = None
    lv_store = None

    # hot-tau demotion state (ensemble-wide: members share the batch size,
    # so a hot regime is workload physics, not a per-seed accident)
    cfg_base = cfg
    cfg_run = cfg
    mega_possible = (
        cfg.fused_epoch == "mega"
        and _fused.fused_enabled(
            cfg, jax.tree.map(lambda x: x[0], states), n_batch=n_batch
        )
    )
    mega_guard = mega_possible
    demote_epoch: Optional[int] = None
    repromotes_left = cfg.repromote_max if cfg.repromote_after > 0 else 0
    member_demoted = np.zeros(n_models, dtype=bool)  # per-member log state
    prefix_free = False  # engaged by _prefix_free_next after a clean epoch
    pf_logged = False

    start_epoch = 0
    if resume_snap is not None:
        (start_epoch, warm, done, running, losses_final, plateau_hits,
         lr, epochs_run, mu_store, lv_store, demoted, demote_epoch,
         repromotes_left, prefix_free) = _restore_host_state(resume_snap)
        if demoted:
            cfg_run = cfg_base.replace(fused_step="off")
            mega_guard = False

    for epoch in range(start_epoch, max_iter):
        if done.all():
            break
        if (
            demote_epoch is not None
            and repromotes_left > 0
            and not warm.any()
            and epoch - demote_epoch >= cfg.repromote_after
        ):
            repromotes_left -= 1
            demote_epoch = None
            cfg_run = cfg_base
            mega_guard = True
            logger.info(
                "ensemble: re-probing the mega layout at epoch %d "
                "(%d probes left).", epoch, repromotes_left,
            )
        keys, k_epoch = _split_members(keys)
        uniform_phase = warm.all() or not warm.any()
        all_warm = bool(warm.all())
        backup = states if (mega_guard and not all_warm) else None
        # one schedule position for every active member (see _epoch note)
        lr_shared = jnp.asarray(float(lr[~done][0]), cfg.jdtype)
        # prefix-free continuation (cfg.ns_prefix_free, VERDICT r4 #5):
        # once every member's previous mega epoch ran contracted, drop the
        # exact-inverse prefix — under vmap its lax.cond lowers to select
        # and every member pays the full Cholesky branch on all ns_prefix
        # steps (measured 2x at N=1). One extra static-cfg compile the
        # first time the regime engages.
        engage_pf = (
            prefix_free and mega_guard and uniform_phase and not all_warm
            and cfg.ns_prefix_free != "off" and cfg_run.ns_prefix > 0
        )
        cfg_disp = cfg_run.replace(ns_prefix=0) if engage_pf else cfg_run
        if engage_pf and not pf_logged:
            pf_logged = True
            logger.info(
                "ensemble: every member contracted (max tau < %.2f) — "
                "continuing prefix-free from epoch %d (one extra compile "
                "now; ~2x per-member-step on the vmapped layout).",
                _fused.NS_TAU_ESCALATE, epoch,
            )
        if uniform_phase:
            flags = StepFlags(sgd=True, update=True, warm_up=all_warm,
                              train_decoder=all_warm)
            result = epoch_fn(flags, states, k_epoch, lr_shared,
                              cfg_disp=cfg_disp)
        else:
            flags = StepFlags(sgd=True, update=True, warm_up=False,
                              train_decoder=False)
            result = epoch_fn(flags, states, k_epoch, lr_shared,
                              warms=jnp.asarray(warm, cfg.jdtype))
        # per-member hot-tau watch on the mega layout (uniform non-warm
        # epochs only — that's the only phase that reaches the mega kernel).
        # Losses, hot fractions and max taus reduce ON DEVICE and come back
        # in one (3, N) fetch — a raw (N, T) tau transfer through the
        # tunnel per epoch is the scalar-fetch trap at scale (CLAUDE.md
        # trap 3).
        tau = result.metrics.tau
        watch_hot = (
            mega_guard
            and uniform_phase and not all_warm
            and tau is not None
            and tau.ndim == 2
            and tau.shape[1] > cfg_disp.ns_prefix
        )
        if watch_hot:
            tau_seg = tau[:, cfg_disp.ns_prefix:]
            hot_dev = jnp.mean(
                (~jnp.isfinite(tau_seg) | (tau_seg >= _fused.NS_TAU_MAX))
                .astype(cfg.jdtype), axis=1,
            )
            tau_dev = jnp.max(
                jnp.where(jnp.isfinite(tau_seg), tau_seg, 0.0), axis=1
            )
            stats = np.asarray(jnp.stack(
                [jnp.mean(result.metrics.loss, axis=-1), hot_dev, tau_dev]
            ))
            losses, hot_frac, max_taus = stats[0], stats[1], stats[2]
            prefix_free = _prefix_free_next(
                prefix_free, float(hot_frac.max()), float(max_taus.max()),
            )
        else:
            losses = np.asarray(jnp.mean(result.metrics.loss, axis=-1))
            if (
                mega_guard and uniform_phase and not all_warm
                and tau is not None and tau.ndim == 2
                and tau.shape[1] <= cfg_disp.ns_prefix
            ):
                # the whole epoch ran inside the protected prefix (T <=
                # ns_prefix): no post-prefix tau evidence exists or ever
                # will, but the carry leaves this epoch consistent (the
                # exact fallback guards every step) — engage structurally
                # (run_chunks' first-chunk-only-prefix precedent); the
                # engaged dispatch's WHOLE-stream watch then governs
                prefix_free = True
        if watch_hot and hot_frac.max() > cfg.demote_hot_frac:
            hot = hot_frac > cfg.demote_hot_frac
            if hot.all():
                # degenerate case: EVERY member is hot — workload physics
                # (members share the batch size), so the mega dispatch is
                # pure waste; whole-ensemble demotion with the solo
                # repromote machinery, exactly as before
                logger.warning(
                    "ensemble: all %d members skipped >%.1f%% of RLS "
                    "updates on the mega layout (epoch %d) — demoting the "
                    "ensemble to the XLA epoch and re-running from backup.",
                    n_models, 100 * cfg.demote_hot_frac, epoch,
                )
                cfg_run = cfg_base.replace(fused_step="off")
                mega_guard = False
                demote_epoch = epoch
                backup = _ensemble_repair(cfg_base, flags, n_batch, backup)
                result = epoch_fn(flags, backup, k_epoch, lr_shared)
                losses = np.asarray(jnp.mean(result.metrics.loss, axis=-1))
            else:
                # per-member demotion (reference semantics: members are
                # INDEPENDENT fits, vjf/model.py:223-307 — one pathological
                # subject must not drag N-1 healthy members off the mega
                # kernel); the demotion itself is stateless — next epoch's
                # mega slice is free (the vmapped dispatch computes every
                # member regardless), so each epoch doubles as the
                # repromote probe — member_demoted only tracks transitions
                # for the log
                newly = hot & ~member_demoted
                if newly.any():
                    logger.warning(
                        "ensemble: members %s skipped up to %.1f%% of RLS "
                        "updates on the mega layout (epoch %d) — re-running "
                        "only those members on the XLA path from their "
                        "repaired pre-epoch backup (per epoch, until their "
                        "mega probe runs clean).",
                        np.flatnonzero(newly).tolist(), 100 * hot_frac.max(),
                        epoch,
                    )
                result, losses = _rerun_hot_members(
                    cfg_base, flags, n_batch, y_ax, u_ax, backup, y, us,
                    k_epoch, lr_shared, mask, channel_mask, hot, result,
                    losses,
                )
        else:
            hot = np.zeros(n_models, dtype=bool)
        if watch_hot:
            recovered = member_demoted & ~hot
            if recovered.any():
                logger.info(
                    "ensemble: members %s ran clean on the mega layout at "
                    "epoch %d — keeping their mega results (implicit "
                    "repromotion).", np.flatnonzero(recovered).tolist(),
                    epoch,
                )
            member_demoted = hot.copy()

        active = ~done
        act_t = jnp.asarray(active)
        states = _select_jit(act_t, result.state, states)
        if mu_store is None:
            mu_store = result.q_means
            lv_store = result.q_logvars
        else:
            mu_store = jnp.where(
                act_t.reshape((-1,) + (1,) * (mu_store.ndim - 1)),
                result.q_means, mu_store,
            )
            lv_store = jnp.where(
                act_t.reshape((-1,) + (1,) * (lv_store.ndim - 1)),
                result.q_logvars, lv_store,
            )
        losses_final = np.where(active, losses, losses_final)
        epochs_run = np.where(active, epoch + 1, epochs_run)

        if callback is not None:
            callback(epoch, losses, result)

        # --- vectorized phase transitions (solo fit semantics per member) ---
        trans = np.zeros(n_models, dtype=bool)
        newly_done = np.zeros(n_models, dtype=bool)
        for i in np.flatnonzero(active):
            if warm[i]:
                plateau = _isclose(losses[i], running[i], rtol)
                forced = cfg.warmup_max > 0 and epoch + 1 >= cfg.warmup_max
                if plateau or forced:
                    trans[i] = True
            else:
                if _isclose(losses[i], running[i], rtol):
                    plateau_hits[i] += 1
                    if plateau_hits[i] >= cfg.stop_patience:
                        newly_done[i] = True
                else:
                    plateau_hits[i] = 0
        adapt_mask = active & ~warm & ~newly_done

        if trans.any():
            keys2, k_init = _split_members(keys)
            tr_t = jnp.asarray(trans)
            # advance ONLY transitioning members' key chains (the solo
            # fit's extra `key, k_init = split(key)` at its transition)
            keys = jnp.where(
                tr_t.reshape((-1,) + (1,) * (keys.ndim - 1)), keys2, keys
            )
            boot_states = _ensemble_boot(cfg, u_ax, states, result.q_means, us, k_init, pair_w)
            states = _select_jit(tr_t, boot_states, states)
            warm[trans] = False
            running[trans] = losses[trans]
            for i in np.flatnonzero(trans):
                logger.info("ensemble: member %d left warm-up at epoch %d.",
                            i, epoch)

        if newly_done.any():
            done |= newly_done
            for i in np.flatnonzero(newly_done):
                logger.info("ensemble: member %d converged at epoch %d.",
                            i, epoch)

        if use_adapt and adapt_mask.any():
            adapted = _ensemble_adapt(cfg, u_ax, states, result.q_means, us,
                                      pair_w)
            states = _select_jit(jnp.asarray(adapt_mask), adapted, states)

        if cfg.multistep_refine > 0 and adapt_mask.any():
            # the solo fit's per-epoch rollout-consistency blend, applied
            # to the same member set (member k == solo fit of member k)
            refined = _ensemble_msrefine(cfg, states, result.q_means)
            states = _select_jit(jnp.asarray(adapt_mask), refined, states)

        if tracker is not None:
            # per-member forecast-gated selection on the state each member
            # carries forward (post-bootstrap / post-adapt — solo order)
            tracker.observe(cfg, y_ax, u_ax, states, result.q_means,
                            result.q_logvars, y, us, epoch,
                            active & ~warm, losses)

        still = active & ~newly_done
        if epoch > 0:
            running = np.where(still, beta * running + (1 - beta) * losses,
                               running)
        else:
            running = np.where(still, losses, running)
        lr = np.where(still, lr * cfg.lr_decay, lr)

        if (checkpoint_path is not None and checkpoint_every > 0
                and (epoch + 1) % checkpoint_every == 0):
            from ..utils.checkpoint import save_ensemble_checkpoint

            save_ensemble_checkpoint(checkpoint_path, _make_snapshot(
                epoch + 1, warm, done, running, losses_final, plateau_hits,
                lr, epochs_run, keys, states, mu_store, lv_store,
                cfg_run != cfg_base, demote_epoch, repromotes_left,
                tracker, n_models, 1, cfg_base, prefix_free=prefix_free,
            ))

    sel_ep = sel_m = None
    if tracker is not None:
        (states, mu_store, lv_store, losses_final, sel_ep, sel_m
         ) = tracker.finalize(states, mu_store, lv_store, losses_final)
    return EnsembleFitResult(
        mu=mu_store, logvar=lv_store, loss=losses_final, states=states,
        warm_up=warm, lr=lr, epochs_run=epochs_run,
        selected_epoch=sel_ep, selected_metric=sel_m,
    )


def _fit_ensemble_blocked(
    cfg: VJFConfig,
    states,
    y,
    us,
    y_ax,
    u_ax,
    keys,
    mask,
    channel_mask,
    pair_w,
    n_models: int,
    n_batch: int,
    *,
    k_block: int,
    max_iter: int,
    beta: float,
    rtol: float,
    callback,
    lr0: Optional[float],
    tracker: Optional["_SelectTracker"] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_snap: Optional[EnsembleSnapshot] = None,
) -> EnsembleFitResult:
    """Blocked ensemble driver: K epochs per member per dispatch through
    vmapped :func:`core.run_epochs`; the per-member plateau machine
    replays host-side over each block's (N, K) loss table with phase
    transitions at block boundaries — member-wise mirror of
    ``models/vjf._fit_blocked`` (see :func:`fit_ensemble` docstring)."""
    use_adapt = cfg.dynamics == "sgp" and cfg.sgp_adapt_lr > 0

    warm = np.ones(n_models, dtype=bool)
    done = np.zeros(n_models, dtype=bool)
    running = np.full(n_models, np.nan)
    losses_final = np.full(n_models, np.nan)
    plateau_hits = np.zeros(n_models, dtype=np.int64)
    lr = np.full(n_models, cfg.lr if lr0 is None else float(lr0))
    epochs_run = np.zeros(n_models, dtype=np.int64)
    mu_store = None
    lv_store = None

    cfg_base = cfg
    cfg_run = cfg
    mega_possible = (
        cfg.fused_epoch == "mega"
        and _fused.fused_enabled(
            cfg, jax.tree.map(lambda x: x[0], states), n_batch=n_batch
        )
    )
    mega_guard = mega_possible
    demote_epoch: Optional[int] = None
    repromotes_left = cfg.repromote_max if cfg.repromote_after > 0 else 0
    member_demoted = np.zeros(n_models, dtype=bool)  # per-member log state
    prefix_free = False  # engaged by _prefix_free_next after a clean block
    pf_logged = False
    epoch = 0

    if resume_snap is not None:
        # exact block-boundary resume (k_block alignment validated by
        # fit_ensemble); states/keys were already replaced there
        (epoch, warm, done, running, losses_final, plateau_hits,
         lr, epochs_run, mu_store, lv_store, demoted, demote_epoch,
         repromotes_left, prefix_free) = _restore_host_state(resume_snap)
        if demoted:
            cfg_run = cfg_base.replace(fused_step="off")
            mega_guard = False

    while epoch < max_iter and not done.all():
        if (
            demote_epoch is not None
            and repromotes_left > 0
            and not warm.any()
            and epoch - demote_epoch >= cfg.repromote_after
        ):
            repromotes_left -= 1
            demote_epoch = None
            cfg_run = cfg_base
            mega_guard = True
            logger.info(
                "ensemble: re-probing the mega layout at epoch %d "
                "(%d probes left).", epoch, repromotes_left,
            )
        k = min(k_block, max_iter - epoch)
        keys, k_sub = _split_members(keys)
        eks = jax.vmap(lambda kk: jax.random.split(kk, k))(k_sub)  # (N, K)
        lr_shared = float(lr[~done][0])
        lrs = jnp.asarray(
            lr_shared * cfg.lr_decay ** np.arange(k), cfg.jdtype
        )
        uniform_phase = warm.all() or not warm.any()
        all_warm = bool(warm.all())
        backup = states if (mega_guard and not all_warm) else None
        # prefix-free continuation (cfg.ns_prefix_free — see the per-epoch
        # driver): contracted blocks drop the vmap-hostile exact-inverse
        # prefix; run_epochs' tau stats then cover the whole stream (its
        # epoch_tau_stats slices from the DISPATCHED cfg's ns_prefix)
        engage_pf = (
            prefix_free and mega_guard and uniform_phase and not all_warm
            and cfg.ns_prefix_free != "off" and cfg_run.ns_prefix > 0
        )
        cfg_disp = cfg_run.replace(ns_prefix=0) if engage_pf else cfg_run
        if engage_pf and not pf_logged:
            pf_logged = True
            logger.info(
                "ensemble: every member contracted (max tau < %.2f) — "
                "continuing prefix-free from the epoch-%d block.",
                _fused.NS_TAU_ESCALATE, epoch,
            )
        if uniform_phase:
            flags = StepFlags(sgd=True, update=True, warm_up=all_warm,
                              train_decoder=all_warm)
            res = _ensemble_epochs(cfg_disp, flags, y_ax, u_ax, states, y,
                                   us, eks, lrs, None, mask, channel_mask)
        else:
            flags = StepFlags(sgd=True, update=True, warm_up=False,
                              train_decoder=False)
            res = _ensemble_epochs(cfg_run, flags, y_ax, u_ax, states, y,
                                   us, eks, lrs,
                                   jnp.asarray(warm, cfg.jdtype),
                                   mask, channel_mask)
        # one (3N*K,) control-signal fetch per block (trap 3)
        vals = np.asarray(jnp.concatenate([
            res.epoch_loss.reshape(-1), res.max_tau.reshape(-1),
            res.hot_frac.reshape(-1),
        ]))
        nk = n_models * k
        losses_blk = vals[:nk].reshape(n_models, k)
        tau_blk = vals[nk:2 * nk].reshape(n_models, k)
        hot_blk = vals[2 * nk:].reshape(n_models, k)
        t_len = y.shape[1] if y_ax == 0 else y.shape[0]
        if mega_guard and uniform_phase and not all_warm:
            if t_len > cfg_disp.ns_prefix:
                prefix_free = _prefix_free_next(
                    prefix_free, float(hot_blk.max()), float(tau_blk.max())
                )
            else:
                # whole block inside the protected prefix (max_tau reports
                # 0 — no evidence, see epoch_tau_stats): engage
                # structurally after this protected block (run_chunks'
                # first-chunk-only-prefix precedent); the engaged
                # dispatch's whole-stream stats then govern
                prefix_free = True

        if (
            mega_guard
            and uniform_phase and not all_warm
            and float(hot_blk.max()) > cfg.demote_hot_frac
        ):
            hot = hot_blk.max(axis=1) > cfg.demote_hot_frac
            i, j = np.unravel_index(int(hot_blk.argmax()), hot_blk.shape)
            if hot.all():
                # degenerate case: see the per-epoch driver — mega is pure
                # waste when everyone is hot; whole-ensemble demotion
                logger.warning(
                    "ensemble: all %d members skipped >%.1f%% of RLS "
                    "updates on the mega layout (epoch %d) — demoting the "
                    "ensemble to the XLA epoch and re-running the block "
                    "from backup.",
                    n_models, 100 * cfg.demote_hot_frac, epoch + int(j),
                )
                cfg_run = cfg_base.replace(fused_step="off")
                mega_guard = False
                demote_epoch = epoch + int(j)
                backup = _ensemble_repair(cfg_base, flags, n_batch, backup)
                res = _ensemble_epochs(cfg_run, flags, y_ax, u_ax, backup,
                                       y, us, eks, lrs, None, mask,
                                       channel_mask)
                losses_blk = np.asarray(res.epoch_loss)
            else:
                # per-member block demotion (see _rerun_hot_members): only
                # the hot members' block re-runs on the XLA path; warn on
                # TRANSITIONS only (a persistently-hot member would
                # otherwise re-fire the warning every block)
                newly = hot & ~member_demoted
                if newly.any():
                    logger.warning(
                        "ensemble: members %s skipped up to %.1f%% of RLS "
                        "updates on the mega layout (epoch %d) — "
                        "re-running only those members' block on the XLA "
                        "path from their repaired pre-block backup (per "
                        "block, until their mega probe runs clean).",
                        np.flatnonzero(newly).tolist(),
                        100 * float(hot_blk.max()), epoch + int(j),
                    )
                res, losses_blk = _rerun_hot_members(
                    cfg_base, flags, n_batch, y_ax, u_ax, backup, y, us,
                    eks, None, mask, channel_mask, hot, res, losses_blk,
                    epochs_mode=True, lrs=lrs,
                )
        else:
            hot = np.zeros(n_models, dtype=bool)
        if mega_guard and uniform_phase and not all_warm:
            recovered = member_demoted & ~hot
            if recovered.any():
                logger.info(
                    "ensemble: members %s ran clean on the mega layout at "
                    "the epoch-%d block — keeping their mega results "
                    "(implicit repromotion).",
                    np.flatnonzero(recovered).tolist(), epoch,
                )
            member_demoted = hot.copy()

        active = ~done
        act_t = jnp.asarray(active)
        states = _select_jit(act_t, res.state, states)
        if mu_store is None:
            mu_store = res.q_means
            lv_store = res.q_logvars
        else:
            mu_store = jnp.where(
                act_t.reshape((-1,) + (1,) * (mu_store.ndim - 1)),
                res.q_means, mu_store,
            )
            lv_store = jnp.where(
                act_t.reshape((-1,) + (1,) * (lv_store.ndim - 1)),
                res.q_logvars, lv_store,
            )
        losses_final = np.where(active, losses_blk[:, -1], losses_final)
        epochs_run = np.where(active, epoch + k, epochs_run)

        if callback is not None:
            callback(epoch, losses_blk, res)

        # --- per-member replay of the block's K epochs (solo _fit_blocked
        # semantics: transitions latch in-block, apply at the boundary) ---
        warmup_plateau = np.zeros(n_models, dtype=bool)
        converged = np.zeros(n_models, dtype=bool)
        for j in range(k):
            for i in np.flatnonzero(active):
                el = float(losses_blk[i, j])
                if _isclose(el, running[i], rtol):
                    if warm[i]:
                        warmup_plateau[i] = True
                    else:
                        plateau_hits[i] += 1
                        if plateau_hits[i] >= cfg.stop_patience:
                            converged[i] = True
                elif not warm[i]:
                    plateau_hits[i] = 0
                running[i] = (
                    beta * running[i] + (1 - beta) * el
                    if epoch + j > 0 else el
                )
        epoch += k
        lr = np.where(active, lr * cfg.lr_decay ** k, lr)
        if cfg.warmup_max > 0 and epoch >= cfg.warmup_max:
            forced = active & warm & ~warmup_plateau
            if forced.any():
                logger.warning(
                    "ensemble: warm-up plateau never fired within "
                    "warmup_max=%d for members %s; forcing the phase "
                    "transition at the block boundary.", cfg.warmup_max,
                    np.flatnonzero(forced).tolist(),
                )
                warmup_plateau |= forced

        trans = active & warm & warmup_plateau
        if trans.any():
            keys2, k_init = _split_members(keys)
            tr_t = jnp.asarray(trans)
            keys = jnp.where(
                tr_t.reshape((-1,) + (1,) * (keys.ndim - 1)), keys2, keys
            )
            boot_states = _ensemble_boot(cfg, u_ax, states, res.q_means,
                                         us, k_init, pair_w)
            states = _select_jit(tr_t, boot_states, states)
            warm[trans] = False
            running[trans] = losses_blk[trans, -1]
            for i in np.flatnonzero(trans):
                logger.info(
                    "ensemble: member %d left warm-up at the epoch-%d "
                    "block boundary.", i, epoch,
                )

        newly_done = active & ~warm & converged & ~trans
        if newly_done.any():
            done |= newly_done
            for i in np.flatnonzero(newly_done):
                logger.info("ensemble: member %d converged by epoch %d.",
                            i, epoch)

        post_mask = active & ~warm & ~newly_done & ~trans
        if use_adapt and post_mask.any():
            adapted = _ensemble_adapt(cfg, u_ax, states, res.q_means, us,
                                      pair_w)
            states = _select_jit(jnp.asarray(post_mask), adapted, states)
        if cfg.multistep_refine > 0 and post_mask.any():
            refined = _ensemble_msrefine(cfg, states, res.q_means)
            states = _select_jit(jnp.asarray(post_mask), refined, states)

        if tracker is not None:
            # block-granular per-member selection (solo _fit_blocked
            # semantics: evaluate each block's final state/posteriors)
            tracker.observe(cfg, y_ax, u_ax, states, res.q_means,
                            res.q_logvars, y, us, epoch - 1,
                            active & ~warm, losses_blk[:, -1])

        if (checkpoint_path is not None and checkpoint_every > 0
                and (epoch // checkpoint_every)
                > ((epoch - k) // checkpoint_every)):
            from ..utils.checkpoint import save_ensemble_checkpoint

            save_ensemble_checkpoint(checkpoint_path, _make_snapshot(
                epoch, warm, done, running, losses_final, plateau_hits,
                lr, epochs_run, keys, states, mu_store, lv_store,
                cfg_run != cfg_base, demote_epoch, repromotes_left,
                tracker, n_models, k_block, cfg_base,
                prefix_free=prefix_free,
            ))

    sel_ep = sel_m = None
    if tracker is not None:
        (states, mu_store, lv_store, losses_final, sel_ep, sel_m
         ) = tracker.finalize(states, mu_store, lv_store, losses_final)
    return EnsembleFitResult(
        mu=mu_store, logvar=lv_store, loss=losses_final, states=states,
        warm_up=warm, lr=lr, epochs_run=epochs_run,
        selected_epoch=sel_ep, selected_metric=sel_m,
    )
