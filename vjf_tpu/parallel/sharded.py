"""Sharded training: GSPMD annotations for the VJF step/epoch.

Design (SURVEY.md §2.4/§5): trials shard over the ``dp`` mesh axis,
observation channels optionally over ``tp``; all model/dynamics state is
replicated (the whole model is ~1e4 params — parameter sharding would be
pure overhead) except the channel-indexed decoder rows, which ride ``tp``.
XLA's SPMD partitioner then auto-inserts the collectives the algorithm
needs: a ``psum`` of the RLS sufficient statistics ``F^T F`` / ``F^T dx``
(the contraction over the sharded trial axis in
``vjf_tpu.models.regression.rls``), the gradient/metric means, and the
channel reduction of the recognition input matmul. No hand-written
communication — the sharding annotations ARE the parallelism strategy.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StepFlags, VJFConfig
from ..models import vjf as core


def _tp_axis(mesh: Mesh) -> Optional[str]:
    return "tp" if "tp" in mesh.axis_names and mesh.shape.get("tp", 1) > 1 else None


def _dp_axis(mesh: Mesh) -> Optional[str]:
    return "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]


def data_sharding(mesh: Mesh, ydim: int) -> NamedSharding:
    """(T, B, ydim): time replicated (sequential), trials on dp, channels on
    tp when they divide evenly."""
    tp = _tp_axis(mesh)
    if tp is not None and ydim % mesh.shape[tp] != 0:
        tp = None
    return NamedSharding(mesh, P(None, _dp_axis(mesh), tp))


def control_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, _dp_axis(mesh), None))


def state_shardings(cfg: VJFConfig, state: core.TrainState, mesh: Mesh):
    """Replicate everything; shard decoder rows (one per observation
    channel) over tp when it divides evenly."""
    replicated = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: replicated, state)
    tp = _tp_axis(mesh)
    if tp is not None and cfg.ydim % mesh.shape[tp] == 0:
        dec = state.params.decoder
        new_dec = type(dec)(
            w=NamedSharding(mesh, P("tp", None)),
            b=NamedSharding(mesh, P("tp")) if dec.b is not None else None,
        )
        shardings = shardings._replace(
            params=shardings.params._replace(decoder=new_dec)
        )
    return shardings


def shard_state(cfg: VJFConfig, state: core.TrainState, mesh: Mesh) -> core.TrainState:
    return jax.device_put(state, state_shardings(cfg, state, mesh))


def shard_data(mesh: Mesh, ys, us):
    ys = jax.device_put(ys, data_sharding(mesh, ys.shape[-1]))
    us = jax.device_put(us, control_sharding(mesh))
    return ys, us


def run_epoch_fused_sharded(
    cfg: VJFConfig,
    flags: StepFlags,
    state: core.TrainState,
    ys,
    us,
    key,
    lr,
    mesh: Mesh,
    noise=None,
    q0=None,
    interpret: Optional[bool] = None,
    mask=None,
    channel_mask=None,
):
    """The fused kernel under multi-chip sharding (``shard_map`` over dp).

    Trials are embarrassingly parallel inside the step; the only coupling is
    through the batch sums (gradients, RLS sufficient statistics, scalar
    ELBO/noise stats — SURVEY.md §2.4). So the step splits into exactly two
    phases around ONE collective:

    1. phase 1 — :func:`~...fused_step.forward_sums_call`: each device runs
       the whole per-trial pallas kernel (forward + hand-written backward +
       trial reductions) on its local shard;
    2. ``psum`` of the :class:`~...fused_step.FusedSums` pytree over dp —
       the single ICI collective per step;
    3. phase 2 — :func:`~...fused_step.step_apply`: every device applies the
       identical SGD + Newton-Schulz RLS + noise updates, keeping the
       replicated training state bit-consistent with the single-device path
       (the exact-inverse fallback runs stats-based, features never leave
       their device).

    The grid-over-time mega kernel cannot cross the collective (a psum
    cannot run inside a pallas grid iteration), so the sharded path scans
    the two-phase step; per-chip overhead is two kernel invocations + one
    psum per step.

    ``mask``: optional (T, B) 0/1 trial-validity mask (ragged trials). The
    per-step GLOBAL valid counts are computed once OUTSIDE the shard_map
    (the mask is replicated along time) and ride the scan as replicated
    scalars: each device's phase-1 kernel renormalizes its masked local
    sums by the global ``1/count`` (so the psum still reproduces the
    single-device masked values), and :func:`...fused_step.step_apply`
    gates counters/recursion on the same global count. Masked rows keep
    the frozen-posterior carry convention of the single-device path.

    ``channel_mask``: optional (T, B, ydim) 0/1 missing-observation mask,
    sharded exactly like ``ys``. Needs no count plumbing: the observed-
    entry statistic ``cm_sum`` is a raw local sum that rides the FusedSums
    psum, so every cm-derived term in ``step_apply`` (per-observed-entry
    logvar constant, obs-mse, fractional sample count) is computed from
    the summed GLOBAL value. Composes with ``mask``.
    """
    from ..ops.pallas import fused_step as F

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from jax import shard_map

    # integer wire-format contract (docs/API.md): like core.run_epoch,
    # upcast wire-dtype (e.g. uint8 count) inputs to the compute dtype on
    # device — free under jit, and ys.dtype below must be a float anyway
    if ys.dtype != cfg.jdtype:
        ys = ys.astype(cfg.jdtype)
    if us is not None and us.dtype != cfg.jdtype:
        us = us.astype(cfg.jdtype)

    t_len, n_batch, _ = ys.shape
    dp = _dp_axis(mesh)
    n_dp = mesh.shape[dp]
    assert n_batch % n_dp == 0, (n_batch, n_dp)
    if q0 is None:
        q0 = core.prior(state.params, n_batch)
    if noise is None:
        eps = jax.random.normal(key, (t_len, 2, n_batch, cfg.xdim), ys.dtype)
        noise = (eps[:, 0], eps[:, 1])

    do_fallback = flags.update and flags.update_transition and not flags.warm_up
    # same epoch-boundary spectral repair as the single-device fused path,
    # gated on the GLOBAL batch so sharded == single-device stays exact;
    # runs on the replicated state before padding/shard_map
    state = F.maybe_epoch_repair(cfg, flags, state, n_batch)

    carry0 = F.pad_carry(cfg, state)
    inv_b = 1.0 / n_batch
    has_u = cfg.udim > 0
    has_mask = mask is not None
    if has_mask:
        mask = core._promote_mask(mask, t_len, n_batch, ys.dtype)
        mask3 = (mask > 0).astype(ys.dtype)[:, :, None]        # (T, B, 1)
        counts = jnp.sum(mask3[:, :, 0], axis=1)               # (T,) GLOBAL
        inv_bs = 1.0 / jnp.maximum(counts, 1.0)
    else:
        # dummy replicated scan inputs keep ONE scan/body signature
        mask3 = jnp.ones((t_len, 1, 1), ys.dtype)
        counts = jnp.full((t_len,), float(n_batch), ys.dtype)
        inv_bs = jnp.full((t_len,), inv_b, ys.dtype)
    has_cmask = channel_mask is not None
    if has_cmask:
        # promotion helper, NOT bare broadcast_to: a (T, ydim) mask
        # right-aligns into a per-trial mask when T == B (silent transpose)
        cm = core._promote_channel_mask(channel_mask, ys.shape, ys.dtype)
        cmask3 = (cm > 0).astype(ys.dtype)
    else:
        cmask3 = jnp.ones((t_len, 1, 1), ys.dtype)   # dummy, unread

    def local_epoch(carry0, qm0, qlv0, ys_l, us_l, e1_l, e2_l, m_l, cm_l,
                    cnt, ib, lr):
        def body(c, inp):
            carry, qm, qlv = c
            y, u, e1, e2, m, cmk, cnt_t, ib_t = inp
            sums, qt_m, qt_lv = F.forward_sums_call(
                cfg, flags, carry, qm, qlv, y, u if has_u else None,
                e1, e2, ib_t if has_mask else inv_b, interpret=interpret,
                mask=m if has_mask else None,
                cmask=cmk if has_cmask else None,
            )
            sums = jax.lax.psum(sums, dp)
            new_carry, scal, g_vec = F.step_apply(
                cfg, flags, carry, sums, lr, n_batch,
                valid_count=cnt_t if has_mask else None,
            )
            if do_fallback:
                new_carry = F.exact_v_fallback_sums(
                    cfg, new_carry, carry, sums, g_vec, scal.tau[0, 0],
                    cnt_t if has_mask else n_batch,
                )
            if has_mask:
                # frozen-posterior carry over masked rows (filter_step)
                keep = m > 0
                qt_m = jnp.where(keep, qt_m, qm)
                qt_lv = jnp.where(keep, qt_lv, qlv)
            q_pack = jnp.stack([qt_m, qt_lv])
            srow = jnp.concatenate(
                [scal.loss, scal.recon, scal.dyn, scal.ent, scal.tau], axis=1
            )
            return (new_carry, qt_m, qt_lv), (q_pack, srow)

        (carry_f, _, _), (q_seq, scal_seq) = jax.lax.scan(
            body, (carry0, qm0, qlv0),
            (ys_l, us_l, e1_l, e2_l, m_l, cm_l, cnt, ib),
        )
        return carry_f, q_seq, scal_seq

    carry_spec = jax.tree.map(lambda _: P(), carry0)
    fn = shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(
            carry_spec, P(dp), P(dp),
            P(None, dp), P(None, dp), P(None, dp), P(None, dp),
            P(None, dp) if has_mask else P(),
            P(None, dp) if has_cmask else P(),
            P(), P(), P(),
        ),
        out_specs=(carry_spec, P(None, None, dp), P()),
        check_vma=False,
    )
    carry_f, q_seq, scal_seq = fn(
        carry0, q0.mean, q0.logvar, ys, us, noise[0], noise[1],
        mask3, cmask3, counts, inv_bs,
        jnp.asarray(lr, ys.dtype),
    )
    metrics = core.Metrics(
        loss=scal_seq[:, 0, 0],
        recon=scal_seq[:, 0, 1],
        dynamics=scal_seq[:, 0, 2],
        entropy=scal_seq[:, 0, 3],
        tau=scal_seq[:, 0, 4],
    )
    return core.EpochResult(
        state=F.unpad_carry(cfg, carry_f, state),
        q_means=q_seq[:, 0],
        q_logvars=q_seq[:, 1],
        metrics=metrics,
    )


def run_epochs_fused_sharded(
    cfg: VJFConfig,
    flags: StepFlags,
    state: core.TrainState,
    ys,
    us,
    keys,
    lrs,
    mesh: Mesh,
    mask=None,
    channel_mask=None,
    interpret: Optional[bool] = None,
) -> core.EpochsResult:
    """K consecutive sharded fused epochs in ONE compiled computation —
    the multi-chip counterpart of :func:`core.run_epochs` (block-dispatch
    production mode, ``fit(mesh=..., epochs_per_dispatch=K)``).

    Each scan iteration runs :func:`run_epoch_fused_sharded` (per-trial
    pallas kernel inside ``shard_map``, one FusedSums psum per step,
    per-step exact-inverse fallback — nothing is skipped, so the reported
    hot fraction is diagnostic-only). Per-epoch posterior sequences are not
    stacked; the last epoch's ride the scan carry, mirroring
    ``core.run_epochs``.
    """
    t_len, n_batch, _ = ys.shape
    q0 = core.prior(state.params, n_batch)
    qdt = cfg.jdtype  # compute dtype (ys may arrive in an integer wire format)

    def body(carry, inp):
        st, _, _ = carry
        key, lr = inp
        res = run_epoch_fused_sharded(
            cfg, flags, st, ys, us, key, lr, mesh, q0=q0,
            interpret=interpret, mask=mask, channel_mask=channel_mask,
        )
        mean_m = jax.tree.map(jnp.mean, res.metrics)
        max_tau, hot = core.epoch_tau_stats(cfg, res.metrics, t_len, qdt)
        return (res.state, res.q_means, res.q_logvars), (mean_m, max_tau, hot)

    q_shape = (t_len, n_batch, cfg.xdim)
    init = (state, jnp.zeros(q_shape, qdt), jnp.zeros(q_shape, qdt))
    (state, q_means, q_logvars), (mean_metrics, max_tau, hot_frac) = (
        jax.lax.scan(body, init, (keys, lrs))
    )
    return core.EpochsResult(
        state=state,
        q_means=q_means,
        q_logvars=q_logvars,
        epoch_loss=mean_metrics.loss,
        epoch_metrics=mean_metrics,
        max_tau=max_tau,
        hot_frac=hot_frac,
    )


def make_sharded_epochs(cfg: VJFConfig, flags: StepFlags, mesh: Mesh,
                        donate: bool = False):
    """Jit ``run_epochs`` (K epochs per dispatch) over ``mesh`` — the
    block-dispatch counterpart of :func:`make_sharded_epoch`.

    Returns ``fn(state, ys, us, keys, lrs, mask=None, channel_mask=None)
    -> core.EpochsResult``. Fused-eligible configs scan
    :func:`run_epoch_fused_sharded` device-side
    (:func:`run_epochs_fused_sharded`); others run ``core.run_epochs``
    under the same GSPMD in/out shardings :func:`make_sharded_epoch` uses,
    with keys/lrs replicated. Donation is off by default: the caller's
    block-granular control flow may re-read the pre-block state.
    """
    cfg_xla = cfg.replace(fused_step="off")
    cache = {}

    def build_xla(state, ys, masked, chmasked):
        st_shard = state_shardings(cfg_xla, state, mesh)
        replicated = NamedSharding(mesh, P())
        dpax = _dp_axis(mesh)
        out_shardings = core.EpochsResult(
            state=st_shard,
            q_means=NamedSharding(mesh, P(None, dpax, None)),
            q_logvars=NamedSharding(mesh, P(None, dpax, None)),
            epoch_loss=replicated,
            # XLA-path metrics carry no tau leaf (fused path only), so the
            # 4-field Metrics default matches the traced output tree
            epoch_metrics=jax.tree.map(
                lambda _: replicated, core.Metrics(0, 0, 0, 0)
            ),
            max_tau=replicated,
            hot_frac=replicated,
        )
        in_shardings = [
            st_shard,
            data_sharding(mesh, ys.shape[-1]),
            control_sharding(mesh),
            replicated,  # (K, 2) per-epoch keys
            replicated,  # (K,) lr schedule
        ]
        if masked:
            in_shardings.append(NamedSharding(mesh, P(None, dpax)))
        if chmasked:
            in_shardings.append(data_sharding(mesh, ys.shape[-1]))

        def fn(state, ys, us, keys, lrs, *rest):
            kw = {}
            if masked:
                kw["mask"] = rest[0]
            if chmasked:
                kw["channel_mask"] = rest[-1]
            return core.run_epochs(cfg_xla, flags, state, ys, us, keys, lrs,
                                   **kw)

        return jax.jit(fn, in_shardings=tuple(in_shardings),
                       out_shardings=out_shardings,
                       donate_argnums=(0,) if donate else ())

    def build_fused(masked, chmasked):
        def fn(state, ys, us, keys, lrs, *rest):
            kw = {}
            if masked:
                kw["mask"] = rest[0]
            if chmasked:
                kw["channel_mask"] = rest[-1]
            return run_epochs_fused_sharded(cfg, flags, state, ys, us, keys,
                                            lrs, mesh, **kw)

        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    def call(state, ys, us, keys, lrs, mask=None, channel_mask=None):
        from ..ops.pallas import fused_step as F

        # promote masks with core's shape semantics (a (T,) trial mask
        # gains a trial axis; bare broadcast_to would transpose at T == B)
        rest = []
        if mask is not None:
            rest.append(core._promote_mask(
                mask, ys.shape[0], ys.shape[1], cfg.jdtype
            ))
        if channel_mask is not None:
            rest.append(core._promote_channel_mask(
                channel_mask, ys.shape, cfg.jdtype
            ))
        fused = F.fused_enabled(cfg, state, n_batch=ys.shape[1])
        k = (fused, mask is not None, channel_mask is not None)
        if k not in cache:
            cache[k] = (build_fused(k[1], k[2]) if fused
                        else build_xla(state, ys, k[1], k[2]))
        return cache[k](state, ys, us, keys, lrs, *rest)

    return call


def make_sharded_epoch(cfg: VJFConfig, flags: StepFlags, mesh: Mesh, donate: bool = True):
    """Jit ``run_epoch`` with explicit in/out shardings over ``mesh``.

    Returns ``fn(state, ys, us, key, lr) -> EpochResult`` where trials are
    sharded on dp and state stays replicated-consistent across shards (the
    RLS all-reduce guarantees every shard applies the identical dynamics
    update — the JAX equivalent of the shared dynamics posterior noted at
    SURVEY.md §2.4).

    When the fused kernel is eligible (nsv backend, rbf or sgp dynamics
    with the rls learner, f32)
    the epoch runs :func:`run_epoch_fused_sharded` — the per-step pallas
    kernel inside ``shard_map`` with one explicit psum of the sufficient
    statistics — including under a trial mask (ragged trials; the mask
    column rides into each device's kernel with the global per-step valid
    count) and a channel mask (missing observations; sharded like the data,
    its cm_sum statistic rides the psum). Otherwise the XLA step runs under
    GSPMD annotations (whose sufficient-statistic contractions auto-insert
    the same collectives).
    """
    st_shard = None

    cfg_xla = cfg.replace(fused_step="off")

    def fn(state, ys, us, key, lr):
        return core.run_epoch(cfg_xla, flags, state, ys, us, key, lr)

    def make_masked_fn(have_m, have_cm):
        def fn_m(state, ys, us, key, lr, *rest):
            kw = {}
            if have_m:
                kw["mask"] = rest[0]
            if have_cm:
                kw["channel_mask"] = rest[-1]
            return core.run_epoch(cfg_xla, flags, state, ys, us, key, lr, **kw)

        return fn_m

    def build(state, ys, masked=False, chmasked=False):
        nonlocal st_shard
        st_shard = state_shardings(cfg_xla, state, mesh)
        replicated = NamedSharding(mesh, P())
        dpax = _dp_axis(mesh)
        out_shardings = core.EpochResult(
            state=st_shard,
            q_means=NamedSharding(mesh, P(None, dpax, None)),
            q_logvars=NamedSharding(mesh, P(None, dpax, None)),
            metrics=jax.tree.map(lambda _: replicated, core.Metrics(0, 0, 0, 0)),
        )
        in_shardings = (
            st_shard,
            data_sharding(mesh, ys.shape[-1]),
            control_sharding(mesh),
            replicated,
            replicated,
        )
        if masked:
            # (T, B) trial-validity mask rides the dp axis with the trials
            in_shardings = in_shardings + (NamedSharding(mesh, P(None, dpax)),)
        if chmasked:
            # (T, B, ydim) missing-observation mask shards exactly like ys
            in_shardings = in_shardings + (data_sharding(mesh, ys.shape[-1]),)
        return jax.jit(
            make_masked_fn(masked, chmasked) if (masked or chmasked) else fn,
            in_shardings=in_shardings,
            out_shardings=out_shardings,
            donate_argnums=(0,) if donate else (),
        )

    def build_fused(masked=False, chmasked=False):
        if masked or chmasked:
            def fused_fn(state, ys, us, key, lr, *rest):
                kw = {}
                if masked:
                    kw["mask"] = rest[0]
                if chmasked:
                    kw["channel_mask"] = rest[-1]
                return run_epoch_fused_sharded(
                    cfg, flags, state, ys, us, key, lr, mesh, **kw
                )
        else:
            def fused_fn(state, ys, us, key, lr):
                return run_epoch_fused_sharded(
                    cfg, flags, state, ys, us, key, lr, mesh
                )

        return jax.jit(fused_fn, donate_argnums=(0,) if donate else ())

    cache = {}

    def call(state, ys, us, key, lr, mask=None, channel_mask=None):
        from ..ops.pallas import fused_step as F

        if (
            (mask is not None or channel_mask is not None)
            and F.fused_enabled(cfg, state, n_batch=ys.shape[1])
        ):
            # masks ride the sharded fused path: the trial column enters
            # each device's phase-1 kernel renormalized by the GLOBAL
            # per-step valid count; the channel mask shards like ys and
            # its cm_sum statistic rides the psum (run_epoch_fused_sharded)
            from ..models.vjf import _promote_channel_mask, _promote_mask

            k = ("fused_masked", mask is not None, channel_mask is not None)
            if k not in cache:
                cache[k] = build_fused(masked=mask is not None,
                                       chmasked=channel_mask is not None)
            rest = []
            if mask is not None:
                rest.append(_promote_mask(
                    mask, ys.shape[0], ys.shape[1], ys.dtype
                ))
            if channel_mask is not None:
                rest.append(_promote_channel_mask(
                    channel_mask, ys.shape, ys.dtype
                ))
            return cache[k](state, ys, us, key, lr, *rest)
        if mask is not None or channel_mask is not None:
            # non-fused configs: the XLA path under GSPMD — each mask
            # shards alongside the data it gates and the masked batch
            # reductions auto-insert the same collectives.
            # promote with the same shape semantics as core.fit — a (T,)
            # trial mask gains a trial axis and a (T, ydim) channel mask a
            # batch axis (bare right-aligned broadcast_to would silently
            # transpose a (T,) mask when T == B)
            from ..models.vjf import _promote_channel_mask, _promote_mask

            rest = []
            if mask is not None:
                rest.append(_promote_mask(
                    mask, ys.shape[0], ys.shape[1], ys.dtype
                ))
            if channel_mask is not None:
                rest.append(_promote_channel_mask(
                    channel_mask, ys.shape, ys.dtype
                ))
            k = ("fn_masked", mask is not None, channel_mask is not None)
            if k not in cache:
                cache[k] = build(state, ys, masked=mask is not None,
                                 chmasked=channel_mask is not None)
            return cache[k](state, ys, us, key, lr, *rest)
        if F.fused_enabled(cfg, state, n_batch=ys.shape[1]):
            if "fused" not in cache:
                cache["fused"] = build_fused()
            return cache["fused"](state, ys, us, key, lr)
        if "fn" not in cache:
            cache["fn"] = build(state, ys)
        return cache["fn"](state, ys, us, key, lr)

    return call
