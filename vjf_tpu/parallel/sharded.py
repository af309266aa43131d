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


def _merge_local_states(cfg: VJFConfig, st0: core.TrainState,
                        st_loc: core.TrainState, dp: str, n_dev: int,
                        k_steps: int, rls_active: bool = True
                        ) -> core.TrainState:
    """Merge per-device locally-advanced training states at a relaxed-sync
    segment boundary (``sync_every=K`` — flag-gated deviation, see
    :func:`run_epoch_sync_every`).

    RLS merge is EXACT in exact arithmetic for the sufficient statistics:
    over K local steps each device computed ``P_c = lam^K P_0 + Jacc I +
    dF_c`` and ``g_c = lam^K g_0 + dG_c`` (precision-form recursion,
    ``models/regression.py:rls``; Jacc is the deterministic accumulated
    jitter, identical across devices), so the synced-path statistics are
    recovered by summing and subtracting the (n_dev - 1) over-counted
    bases. ``g_c`` is reconstructed as ``P_c w_c`` (exact for the
    precision backend; NSV-tracking-accurate for nsv). The merged inverse
    is re-derived by Cholesky + Newton-Schulz polish (2 iterations,
    full-precision pins — CLAUDE.md traps 10/11 territory: the explicit
    f32 triangular inverse alone carries ~cond-level error; the NS polish
    squares it away). SGD-trained params merge by averaging (local-SGD /
    FedAvg semantics); running-variance counters merge additively under
    their caps. The recognition/decoder drift between syncs is the
    approximation being bought — quantified in docs/RESULTS.md.
    """
    import jax.numpy as _jnp

    from ..models import regression as R
    from ..ops.linalg import inv_tril_transpose, safe_cholesky

    hp = jax.lax.Precision.HIGHEST
    if rls_active:
        lam = cfg.rls_shrink ** k_steps
        if cfg.rls_shrink == 1.0:
            jacc = cfg.chol_jitter * k_steps
        else:
            jacc = cfg.chol_jitter * (1.0 - lam) / (1.0 - cfg.rls_shrink)
    else:
        # the RLS never ran this segment (warm-up / update flags off):
        # every device still holds exactly P_0 — the over-counted base is
        # the UNDECAYED P_0, no accumulated jitter. Subtracting the
        # advanced base here would drain (n_dev-1)*jacc*I from P at every
        # boundary and push it indefinite within one warm-up epoch
        # (review finding, r3).
        lam = 1.0
        jacc = 0.0

    blr0, blr = st0.dynamics.blr, st_loc.dynamics.blr
    if not isinstance(blr, (R.NSVBLR, R.PrecisionBLR)):
        raise NotImplementedError(
            "sync_every > 1 requires a precision-carrying RLS backend "
            "('nsv' or 'precision'); the covariance backend cannot merge"
        )
    eye = _jnp.eye(blr.precision.shape[0], dtype=blr.precision.dtype)
    g_loc = _jnp.matmul(blr.precision, blr.w_mean, precision=hp)
    p_sum = jax.lax.psum(blr.precision, dp)
    g_sum = jax.lax.psum(g_loc, dp)
    base_p = lam * blr0.precision + jacc * eye
    base_g = lam * _jnp.matmul(blr0.precision, blr0.w_mean, precision=hp)
    p_m = p_sum - (n_dev - 1.0) * base_p
    g_m = g_sum - (n_dev - 1.0) * base_g
    p_m = 0.5 * (p_m + p_m.T)
    # bounded inverse at ANY conditioning: the merged Gram is pooled
    # (bootstrap-scale) — an f32 triangular inverse here has error ~cond,
    # and a Newton-Schulz polish from a residual > 1 DIVERGES as r^(2^k)
    # (observed: V went NaN at the first merge of a B_local=1 VdP run).
    # Same remedy as one_shot_rls: relative-floored eigh pair (trap 15).
    from ..ops.linalg import eigh_floor_inv_pair

    sol_dt = _jnp.promote_types(p_m.dtype, _jnp.float32)
    p_sol, v_sol = eigh_floor_inv_pair(p_m.astype(sol_dt))
    w_m = _jnp.matmul(v_sol, g_m.astype(sol_dt), precision=hp).astype(
        blr.w_mean.dtype
    )
    p_m = p_sol.astype(blr.precision.dtype)
    v_m = v_sol.astype(blr.precision.dtype)
    if rls_active and cfg.sync_trust > 0 and n_dev > 1:
        # trust-region damping of the merged weight step (cfg.sync_trust):
        # the pooled natural-gradient step is computed from locally-
        # drifted B_local-sized trajectories, and the un-damped recursion
        # amplifies |w| multiplicatively per boundary (the r4-root-caused
        # Lorenz K=32 collapse / K=8 silent dynamics death —
        # docs/RESULTS.md "Relaxed-sync"). P/V stay exact (they are
        # sufficient statistics; only the step into w is a judgment call).
        d_w = w_m - blr0.w_mean
        ratio = _jnp.linalg.norm(d_w) / _jnp.maximum(
            _jnp.linalg.norm(blr0.w_mean), 1.0
        )
        scale = _jnp.minimum(
            1.0, cfg.sync_trust / _jnp.maximum(ratio, 1e-30)
        ).astype(w_m.dtype)
        w_m = blr0.w_mean + scale * d_w
    if isinstance(blr, R.NSVBLR):
        blr_m = R.NSVBLR(w_m, p_m, v_m)
    else:
        chol = safe_cholesky(p_sol).astype(blr.precision.dtype)
        blr_m = R.PrecisionBLR(w_m, p_m, chol, inv_tril_transpose(chol))

    params_m = jax.tree.map(lambda x: jax.lax.pmean(x, dp), st_loc.params)
    dyn0, dyn = st0.dynamics, st_loc.dynamics
    logvar_m = jax.lax.pmean(dyn.logvar, dp)
    n_m = _jnp.minimum(
        dyn0.n_sample + jax.lax.psum(dyn.n_sample - dyn0.n_sample, dp),
        cfg.state_var_cap,
    ).astype(dyn.n_sample.dtype)
    lik_n_m = _jnp.minimum(
        st0.lik_n_sample
        + jax.lax.psum(st_loc.lik_n_sample - st0.lik_n_sample, dp),
        cfg.obs_var_cap,
    ).astype(st_loc.lik_n_sample.dtype)
    return core.TrainState(
        params=params_m,
        dynamics=dyn._replace(blr=blr_m, logvar=logvar_m, n_sample=n_m),
        lik_n_sample=lik_n_m,
    )


def run_epoch_sync_every(
    cfg: VJFConfig,
    flags: StepFlags,
    state: core.TrainState,
    ys,
    us,
    key,
    lr,
    mesh: Mesh,
    sync_every: int,
) -> core.EpochResult:
    """Relaxed-sync multi-chip epoch (flag-gated DEVIATION — the reference
    semantics sync the shared dynamics/parameters every step,
    ``vjf/module.py:94-96``; :func:`run_epoch_fused_sharded` reproduces
    that exactly with one psum per step, which costs 2.7x per-chip
    throughput at flagship scale, docs/ARCHITECTURE.md §4).

    ``sync_every = K``: trials shard over dp; each device runs K
    consecutive steps COMPLETELY LOCALLY — on TPU that is the per-chip
    mega kernel, zero collectives — then the training states merge at the
    segment boundary (:func:`_merge_local_states`: exact RLS
    sufficient-statistics merge, FedAvg'd SGD params). ``sync_every = 0``
    syncs once at the epoch end only. The posterior carry stays local to
    each device's trials throughout (it is per-trial state).

    Per-device RNG: the epoch key is folded with the device index so
    different shards draw independent sampling noise (the synced path
    gets this implicitly from the trial axis).

    Cost: one boundary merge = one ~(n_rbf)^2 psum + one Cholesky +
    triangular inverse + 6 matmuls, amortized over K steps — negligible
    for K >= 256 or epoch-level sync. Quality vs K is measured in
    docs/RESULTS.md ("Relaxed-sync"); masks are not supported on this
    path (use the exact-sync path for ragged trials).
    """
    rls_active = (
        flags.update and flags.update_transition and not flags.warm_up
    )
    t_len, n_batch, _ = ys.shape
    if ys.dtype != cfg.jdtype:
        ys = ys.astype(cfg.jdtype)
    if us is not None and us.dtype != cfg.jdtype:
        us = us.astype(cfg.jdtype)
    dp = _dp_axis(mesh)
    n_dev = mesh.shape[dp]
    if n_batch % n_dev != 0:
        raise ValueError(f"batch {n_batch} must divide over {n_dev} devices")
    k_steps = sync_every if sync_every > 0 else t_len
    if t_len % k_steps != 0:
        raise ValueError(
            f"sync_every={k_steps} must divide the epoch length {t_len}"
        )
    n_seg = t_len // k_steps
    seg_keys = jax.random.split(key, n_seg)

    # only the epoch's FIRST segment needs the per-step exact-inverse
    # prefix (fresh/epoch-start tau); later segments continue a contracted
    # carry and run pure-mega (ns_prefix=0) — the same argument as the
    # streaming K-block pipeline. Without this, sync_every <= ns_prefix
    # runs the whole epoch on the per-step kernel (measured: 24 us/step
    # vs 7.8 us with the split).
    cfg_rest = cfg.replace(ns_prefix=0)

    def local_fn(st, ys_l, us_l, keys_l, lr_):
        dev = jax.lax.axis_index(dp)

        def seg_with(cfg_seg):
            def seg(carry, inp):
                st_seg, q = carry
                y_seg, u_seg, k_seg = inp
                res = core.run_epoch(
                    cfg_seg, flags, st_seg, y_seg, u_seg,
                    jax.random.fold_in(k_seg, dev), lr_, q0=q,
                )
                merged = _merge_local_states(cfg, st_seg, res.state, dp,
                                             n_dev, k_steps,
                                             rls_active=rls_active)
                q_next = core.Gaussian(res.q_means[-1], res.q_logvars[-1])
                mean_metrics = jax.tree.map(
                    lambda a: jax.lax.pmean(a, dp), res.metrics
                )
                return (merged, q_next), (res.q_means, res.q_logvars,
                                          mean_metrics)

            return seg

        b_local = ys_l.shape[1]
        q0_l = core.prior(st.params, b_local)
        ys_seg = ys_l.reshape(n_seg, k_steps, b_local, ys_l.shape[-1])
        us_seg = us_l.reshape(n_seg, k_steps, b_local, us_l.shape[-1])
        carry, (qm0, qlv0, mm0) = seg_with(cfg)(
            (st, q0_l), (ys_seg[0], us_seg[0], keys_l[0])
        )
        if n_seg > 1:
            (st_f, _), (qm1, qlv1, mm1) = jax.lax.scan(
                seg_with(cfg_rest), carry,
                (ys_seg[1:], us_seg[1:], keys_l[1:])
            )
            qm = jnp.concatenate([qm0[None], qm1], axis=0)
            qlv = jnp.concatenate([qlv0[None], qlv1], axis=0)
            mm = jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0), mm0, mm1
            )
        else:
            st_f, qm, qlv = carry[0], qm0[None], qlv0[None]
            mm = jax.tree.map(lambda a: a[None], mm0)
        qm = qm.reshape(t_len, b_local, -1)
        qlv = qlv.reshape(t_len, b_local, -1)
        mm = jax.tree.map(lambda a: a.reshape(t_len, *a.shape[2:]), mm)
        return st_f, qm, qlv, mm

    from jax import shard_map

    state_spec = jax.tree.map(lambda _: P(), state)
    metrics_struct = jax.eval_shape(
        lambda: core.run_epoch(
            cfg, flags, state, ys[:k_steps, : n_batch // n_dev],
            us[:k_steps, : n_batch // n_dev], key, lr,
        ).metrics
    )
    m_spec = jax.tree.map(lambda _: P(), metrics_struct)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(state_spec, P(None, dp), P(None, dp), P(), P()),
        out_specs=(state_spec, P(None, dp), P(None, dp), m_spec),
        check_vma=False,
    )
    st_f, qm, qlv, mm = fn(state, ys, us, seg_keys,
                           jnp.asarray(lr, cfg.jdtype))
    return core.EpochResult(state=st_f, q_means=qm, q_logvars=qlv,
                            metrics=mm)


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
