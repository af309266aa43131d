"""Ensemble ``fit`` driver — ``parallel/ensemble.py`` (VERDICT r2 #1).

The contract: member k of ``fit_ensemble`` equals a solo ``fit`` of member
k — phase transitions included — while the whole ensemble trains in one
dispatch stream (phase-uniform epochs on the static-flag vmapped path,
phase-MIXED epochs on the traced ``warm_gate`` path). The reference's fit
semantics per member: ``/root/reference/vjf/model.py:223-307``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.parallel import fit_ensemble, init_ensemble, make_mesh


def _cfg(**kw):
    base = dict(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                likelihood="gaussian", dtype="float64", rtol=0.05,
                stop_patience=1)
    base.update(kw)
    return VJFConfig(**base)


def _ring_data(seed, T=60, B=3, ydim=8, scale=1.0):
    rng = np.random.default_rng(seed)
    th = np.cumsum(0.15 + 0.01 * rng.normal(size=T))
    x = np.stack([np.cos(th), np.sin(th)], axis=-1) * scale  # (T, 2)
    C = rng.normal(size=(ydim, 2))
    y = (x @ C.T)[:, None, :] + 0.1 * rng.normal(size=(T, B, ydim))
    return y


def test_warm_gate_matches_static_flags(key):
    """run_epoch with a constant traced warm_gate is numerically identical
    to the corresponding static-flag trace (both phases)."""
    cfg = _cfg()
    state = core.init_state(key, cfg)
    y = jnp.asarray(_ring_data(0), cfg.jdtype)
    us = jnp.zeros((y.shape[0], y.shape[1], 0), cfg.jdtype)
    k = jax.random.PRNGKey(7)
    lr = jnp.asarray(1e-3, cfg.jdtype)

    for warm in (True, False):
        flags_static = StepFlags(sgd=True, update=True, warm_up=warm,
                                 train_decoder=warm)
        ref = core.run_epoch(cfg, flags_static, state, y, us, k, lr)
        flags_gated = StepFlags(sgd=True, update=True, warm_up=False,
                                train_decoder=False)
        gated = core.run_epoch(
            cfg, flags_gated, state, y, us, k, lr,
            warm_gate=jnp.asarray(1.0 if warm else 0.0, cfg.jdtype),
        )
        for a, b in zip(jax.tree_util.tree_leaves(ref.state),
                        jax.tree_util.tree_leaves(gated.state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(ref.metrics.loss),
                                   np.asarray(gated.metrics.loss),
                                   rtol=1e-12, atol=1e-14)


def test_member_matches_solo_fit_with_phase_transitions(key):
    """THE acceptance test (VERDICT r2 #1): per-member data chosen so the
    members leave warm-up at different epochs — the ensemble must traverse
    phase-MIXED epochs (gated path) and still reproduce each solo fit
    exactly: per-epoch loss trajectories, final state, lr schedule
    position, epochs_run, and phase flags."""
    cfg = _cfg()
    N, max_iter = 2, 18
    # different data scales => different plateau timing
    ys = np.stack([_ring_data(1, scale=1.0), _ring_data(2, scale=3.0)])
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(5), N)

    ens_losses = []
    res = fit_ensemble(cfg, states, ys, keys=keys, max_iter=max_iter,
                       callback=lambda e, l, r: ens_losses.append(l.copy()))
    ens_losses = np.stack(ens_losses, axis=0)  # (n_epochs, N)

    solo_traj = []
    for i in range(N):
        traj = []
        solo = core.fit(
            cfg, jax.tree.map(lambda x: x[i], states), ys[i],
            key=keys[i], max_iter=max_iter,
            callback=lambda e, l, r: traj.append(l),
        )
        solo_traj.append(traj)
        # phase flags / schedule / epoch accounting
        assert bool(res.warm_up[i]) == solo.warm_up
        assert int(res.epochs_run[i]) == solo.epochs_run
        np.testing.assert_allclose(float(res.lr[i]), solo.lr, rtol=1e-12)
        np.testing.assert_allclose(float(res.loss[i]), solo.loss, rtol=1e-8)
        # final member state == final solo state (dynamics + params)
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[i], res.states)),
            jax.tree_util.tree_leaves(solo.state),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(res.mu[i]), np.asarray(solo.mu), rtol=1e-8, atol=1e-10)
        # per-epoch loss trajectory identical over the member's lifetime
        np.testing.assert_allclose(
            ens_losses[: solo.epochs_run, i], np.asarray(traj),
            rtol=1e-8, atol=1e-10)

    # the members must have transitioned at different epochs — otherwise
    # this test never exercised the phase-mixed (gated) path
    assert solo_traj[0] != solo_traj[1]
    assert int(res.epochs_run[0]) != int(res.epochs_run[1]), (
        "members converged at the same epoch; pick data that separates "
        "their plateaus so the mixed-phase path is exercised"
    )


def test_fit_ensemble_shared_data(key):
    """Seed ensemble on SHARED (T, B, ydim) data: no N-fold data copy
    (vmap in_axes=None), members differ (independent inits/noise)."""
    cfg = _cfg()
    N = 3
    y = _ring_data(4)
    states = init_ensemble(key, cfg, N)
    res = fit_ensemble(cfg, states, y, key=jax.random.PRNGKey(1), max_iter=6)
    assert res.mu.shape == (N, y.shape[0], y.shape[1], cfg.xdim)
    assert np.all(np.isfinite(res.loss))
    w = np.asarray(res.states.dynamics.blr.w_mean)
    assert not np.allclose(w[0], w[1])


def test_fit_ensemble_mesh_matches_single_device(key):
    """Member-axis sharding over the virtual 8-device mesh is a pure
    placement change: results equal the unsharded run."""
    cfg = _cfg()
    N = 4
    ys = np.stack([_ring_data(10 + i) for i in range(N)])
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(3), N)
    res0 = fit_ensemble(cfg, states, ys, keys=keys, max_iter=5)
    mesh = make_mesh(4, axis_names=("dp",))
    res1 = fit_ensemble(cfg, states, ys, keys=keys, max_iter=5, mesh=mesh)
    np.testing.assert_allclose(res0.loss, res1.loss, rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(res0.states),
                    jax.tree_util.tree_leaves(res1.states)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_fit_ensemble_masked(key):
    """Shared ragged-trial mask applies to every member (padding inert)."""
    cfg = _cfg()
    N, T, B = 2, 40, 3
    y = _ring_data(6, T=T, B=B)
    mask = np.ones((T, B))
    mask[30:, 1] = 0.0                      # trial 1 ends early
    y_bad = y.copy()
    y_bad[30:, 1, :] = np.nan               # padding may be garbage
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    r1 = fit_ensemble(cfg, states, y, keys=keys, max_iter=4, mask=mask)
    r2 = fit_ensemble(cfg, states, y_bad, keys=keys, max_iter=4, mask=mask)
    np.testing.assert_allclose(r1.loss, r2.loss, rtol=1e-10)


def test_api_fit_ensemble_facade(key):
    from vjf_tpu import VJF

    y = _ring_data(8)
    model = VJF.make_model(8, 2, n_rbf=10, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64",
                           rtol=0.05, stop_patience=1)
    res, members = model.fit_ensemble(y, n_models=2, max_iter=6, seed=11)
    assert len(members) == 2
    for i, m in enumerate(members):
        assert m._decoder_frozen == (not bool(res.warm_up[i]))
        fc = m.forecast(np.zeros((1, 2)), n_step=5)
        assert np.all(np.isfinite(np.asarray(fc[0])))
    # members genuinely differ
    assert not np.allclose(
        np.asarray(members[0].state.params.decoder.w),
        np.asarray(members[1].state.params.decoder.w),
    )


def test_fit_ensemble_sgp_dynamics(key):
    """The ensemble driver rides the shared transition interface — the SGP
    family (bootstrap + hyperparameter adaptation) vmaps too."""
    cfg = _cfg(dynamics="sgp", n_rbf=8, warmup_max=2)
    N = 2
    y = _ring_data(9, T=30)
    states = init_ensemble(key, cfg, N)
    res = fit_ensemble(cfg, states, y, key=jax.random.PRNGKey(4), max_iter=4)
    assert np.all(np.isfinite(res.loss))
    assert not res.warm_up.any()            # warmup_max forced the exit


def test_blocked_ensemble_member_matches_solo_blocked(key):
    """fit_ensemble(epochs_per_dispatch=K) == per-member solo
    fit(epochs_per_dispatch=K): K epochs per dispatch, block-granular
    phase transitions, same keys — the blocked production mode's
    member==solo contract."""
    cfg = _cfg()
    N, max_iter, K = 2, 16, 4
    ys = np.stack([_ring_data(31, scale=1.0), _ring_data(32, scale=3.0)])
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(9), N)

    res = fit_ensemble(cfg, states, ys, keys=keys, max_iter=max_iter,
                       epochs_per_dispatch=K)
    for i in range(N):
        solo = core.fit(cfg, jax.tree.map(lambda x: x[i], states), ys[i],
                        key=keys[i], max_iter=max_iter,
                        epochs_per_dispatch=K)
        assert bool(res.warm_up[i]) == solo.warm_up
        assert int(res.epochs_run[i]) == solo.epochs_run
        np.testing.assert_allclose(float(res.lr[i]), solo.lr, rtol=1e-12)
        np.testing.assert_allclose(float(res.loss[i]), solo.loss, rtol=1e-8)
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[i],
                                                   res.states)),
            jax.tree_util.tree_leaves(solo.state),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)


def test_fit_ensemble_shared_controls(key):
    """Shared (T, udim) controls broadcast to the trial batch exactly like
    solo fit's _promote_u (r3 review fix: the old promotion left them at
    (T, 1, udim) and shape-errored at B > 1)."""
    cfg = _cfg(udim=1)
    N, T, B = 2, 40, 3
    y = _ring_data(12, T=T, B=B)
    u = np.sin(0.1 * np.arange(T))[:, None]            # (T, 1) shared
    states = init_ensemble(key, cfg, N)
    res = fit_ensemble(cfg, states, y, u, key=jax.random.PRNGKey(6),
                       max_iter=4)
    assert np.all(np.isfinite(res.loss))


def test_fit_ensemble_multistep_refine_matches_solo(key):
    """cfg.multistep_refine applies per member (r3 review fix: it was
    silently ignored, breaking the member==solo contract)."""
    cfg = _cfg(multistep_refine=5, multistep_weight=0.3, warmup_max=2)
    N = 2
    ys = np.stack([_ring_data(21), _ring_data(22)])
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(8), N)
    res = fit_ensemble(cfg, states, ys, keys=keys, max_iter=6)
    for i in range(N):
        solo = core.fit(cfg, jax.tree.map(lambda x: x[i], states), ys[i],
                        key=keys[i], max_iter=6)
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda x: x[i], res.states)
                       .dynamics.blr.w_mean),
            np.asarray(solo.state.dynamics.blr.w_mean),
            rtol=1e-7, atol=1e-9)

    # up-front guard parity with solo fit
    cfg_bad = cfg.replace(udim=1)
    st_bad = init_ensemble(key, cfg_bad, N)
    with pytest.raises(ValueError, match="autonomous"):
        fit_ensemble(cfg_bad, st_bad, ys,
                     np.zeros((ys.shape[1], 1)), keys=keys, max_iter=2)


def test_forecast_ensemble_matches_member_loop(key):
    """forecast_ensemble == per-member core.forecast with the same split
    keys, in one dispatch."""
    from vjf_tpu.parallel import forecast_ensemble

    cfg = _cfg()
    N = 3
    states = init_ensemble(key, cfg, N)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (N, 2, cfg.xdim),
                           cfg.jdtype)
    k = jax.random.PRNGKey(4)
    xs, ys = forecast_ensemble(cfg, states, x0, k, n_step=7)
    assert xs.shape == (N, 8, 2, cfg.xdim)
    assert ys.shape == (N, 8, 2, cfg.ydim)
    ks = jax.random.split(k, N)
    for i in range(N):
        xi, yi = core.forecast(cfg, jax.tree.map(lambda a: a[i], states),
                               x0[i], ks[i], n_step=7)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xi),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(yi),
                                   rtol=1e-12, atol=1e-14)


# ---------------------------------------------------------------------------
# Hot-tau demotion ladder (per-member + whole-ensemble degenerate case)
# ---------------------------------------------------------------------------

_HOT_BASE = dict(ydim=10, xdim=2, udim=0, dynamics="sgp", n_inducing=16,
                 sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
                 dtype="float32", rls_backend="nsv", fused_step="on",
                 matmul_dtype="float32", ns_prefix=8, lr=1e-3,
                 rtol=1e-6, warmup_max=2)


def _hot_members_data(T=80):
    """(3, T, 1, 10) per-member data: members 0/2 gentle ring (marginally
    hot B=1 SGP, ~1.4% at the first post-bootstrap epoch on CPU), member 1
    a heavy-tailed jump process (~2.8% hot) — a threshold of 0.02 trips
    ONLY member 1."""
    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor

    x = ring_attractor(T=T)
    y0, _, _ = linear_gaussian_observations(x, 10, obs_noise=0.1,
                                            intercept=False, seed=7)
    y0 = y0.astype(np.float32)[:, None, :]
    rng = np.random.default_rng(0)
    jumps = rng.standard_t(df=1.5, size=(T, 1, 10)).astype(np.float32)
    y_path = np.cumsum(jumps, axis=0) * 2.0
    return np.stack([y0, y_path, y0])


def test_per_member_demotion_isolates_hot_member(caplog):
    """One pathological per-subject member must NOT drag the healthy
    members off the mega kernel (reference semantics: members are
    independent fits, vjf/model.py:223-307): only the hot member's epoch
    re-runs on the XLA path, and the healthy members' final states are
    BIT-identical to an all-mega run (demotion disabled)."""
    import logging

    y = _hot_members_data()
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    states = init_ensemble(jax.random.PRNGKey(5), VJFConfig(**_HOT_BASE), 3)

    cfg_off = VJFConfig(**_HOT_BASE, demote_hot_frac=1.1)  # disabled
    cfg_on = VJFConfig(**_HOT_BASE, demote_hot_frac=0.02)  # member 1 only
    r_off = fit_ensemble(cfg_off, states, y, keys=keys, max_iter=6)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        r_on = fit_ensemble(cfg_on, states, y, keys=keys, max_iter=6)

    per_member = [r for r in caplog.records
                  if "re-running only those members" in r.message]
    assert per_member and "[1]" in per_member[0].message
    assert not any("demoting the ensemble" in r.message
                   for r in caplog.records)
    for i in (0, 2):
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[i], r_off.states)),
            jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[i], r_on.states)),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"healthy member {i} diverged from the all-mega run"
            )
    assert not all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[1], r_off.states)),
            jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[1], r_on.states)),
        )
    ), "the hot member's XLA re-run must change its trajectory"
    assert np.all(np.isfinite(r_on.loss))


def test_blocked_per_member_demotion(caplog):
    """The blocked driver carries the same per-member demotion: hot
    members' BLOCKS re-run on the XLA path; healthy members bit-identical
    to the all-mega blocked run. (Blocked-key hot fractions at the first
    post-bootstrap epoch, measured on CPU: members 0/1 at 5.6%, member 2
    at 2.8% — a 0.04 threshold trips members 0/1 only.)"""
    import logging

    y = _hot_members_data()
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    states = init_ensemble(jax.random.PRNGKey(5), VJFConfig(**_HOT_BASE), 3)

    cfg_off = VJFConfig(**_HOT_BASE, demote_hot_frac=1.1)
    cfg_on = VJFConfig(**_HOT_BASE, demote_hot_frac=0.04)
    r_off = fit_ensemble(cfg_off, states, y, keys=keys, max_iter=6,
                         epochs_per_dispatch=3)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        r_on = fit_ensemble(cfg_on, states, y, keys=keys, max_iter=6,
                            epochs_per_dispatch=3)
    assert any("re-running only those members' block" in r.message
               for r in caplog.records)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[2], r_off.states)),
        jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[2], r_on.states)),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            "healthy member 2 diverged from the all-mega blocked run"
        )
    assert np.all(np.isfinite(r_on.loss))


def test_ensemble_all_hot_demotes_and_reprobes(caplog):
    """The degenerate all-hot case (shared workload physics) keeps the
    whole-ensemble demotion + PD-gated repair + repromote-probe ladder —
    the round-3 path that shipped with an undefined-name crash, now driven
    end-to-end on CPU."""
    import logging

    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor

    x = ring_attractor(T=80)
    y0, _, _ = linear_gaussian_observations(x, 10, obs_noise=0.1,
                                            intercept=False, seed=7)
    y = y0.astype(np.float32)[:, None, :]   # shared (T, 1, ydim)
    cfg = VJFConfig(**_HOT_BASE, demote_hot_frac=0.01,
                    repromote_after=1, repromote_max=1)
    # hot fractions are noise-draw-dependent, so all-hot needs IDENTICAL
    # members: same init, same data, same member key chains (keys= allows
    # duplicates by contract). The (init, fit) = PRNGKey(0) combo is the
    # one test_fit_reprobes_mega_after_demotion pins as marginally hot
    # (~1.4% at the first post-bootstrap epoch on CPU).
    st0 = core.init_state(jax.random.PRNGKey(0), cfg)
    states = jax.tree.map(lambda a: jnp.stack([a] * 3), st0)
    keys = jnp.stack([jax.random.PRNGKey(0)] * 3)
    with caplog.at_level(logging.INFO, logger="vjf_tpu"):
        res = fit_ensemble(cfg, states, y, keys=keys, max_iter=6)
    demotions = [r for r in caplog.records
                 if "demoting the ensemble" in r.message]
    probes = [r for r in caplog.records if "re-probing" in r.message]
    assert demotions, "identical members at ~1.4% hot must trip together"
    assert len(probes) == 1, "repromote_max=1 must yield exactly one probe"
    assert not any("re-running only those members" in r.message
                   for r in caplog.records)
    assert np.all(np.isfinite(res.loss))
    assert np.all(np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(res.states)[0])))


def test_ensemble_mesh_zero_collectives(key):
    """The headline multi-chip claim — the member axis shards with ZERO
    inter-chip collectives (ARCHITECTURE §4) — enforced on the compiled
    HLO, not just by construction: the optimized module of the mesh
    ensemble epoch must contain no all-reduce / all-gather /
    collective-permute / all-to-all / reduce-scatter. Catches any future
    GSPMD regression that silently inserts one."""
    from vjf_tpu.parallel import ensemble as ens
    from vjf_tpu.parallel.replicated import shard_ensemble

    cfg = _cfg()
    N = 8
    ys = np.stack([_ring_data(20 + i) for i in range(N)])
    states = init_ensemble(key, cfg, N)
    keys8 = jax.random.split(jax.random.PRNGKey(3), N)
    mesh = make_mesh(8, axis_names=("dp",))
    states = shard_ensemble(states, mesh)
    ns = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    ysd = jax.device_put(jnp.asarray(ys, cfg.jdtype), ns)
    usd = jax.device_put(
        jnp.zeros(ys.shape[:3] + (0,), cfg.jdtype), ns
    )
    keysd = jax.device_put(keys8, ns)
    flags = StepFlags(sgd=True, update=True, warm_up=False,
                      train_decoder=False)
    lowered = ens._ensemble_epoch.lower(
        cfg, flags, 0, 0, states, ysd, usd, keysd,
        jnp.asarray(1e-3, cfg.jdtype), None, None, None,
    )
    txt = lowered.compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert op not in txt, (
            f"the zero-collective ensemble epoch compiled a {op}"
        )


def test_prefix_free_decision_transitions():
    """The prefix-free state machine (cfg.ns_prefix_free, VERDICT r4 #5):
    engage below the escalation threshold, hold in the hysteresis band,
    revoke on the exact-fallback band or any hot step."""
    from vjf_tpu.parallel.ensemble import _prefix_free_next

    assert _prefix_free_next(False, 0.0, 0.01) is True      # contracted
    assert _prefix_free_next(True, 0.0, 0.10) is True       # hysteresis hold
    assert _prefix_free_next(False, 0.0, 0.10) is False     # hysteresis hold
    assert _prefix_free_next(True, 0.0, 0.30) is False      # fallback band
    assert _prefix_free_next(True, 0.01, 0.01) is False     # hot step
    assert _prefix_free_next(False, 0.0, 0.049) is True     # boundary: < esc
    # boundary: exactly at the escalation threshold is NOT contracted
    from vjf_tpu.ops.pallas import fused_step as _fused

    assert _prefix_free_next(False, 0.0, _fused.NS_TAU_ESCALATE) is False


@pytest.mark.parametrize("k_block", [1, 3])
def test_prefix_free_dispatch_wiring(key, monkeypatch, k_block):
    """Once the decision engages, the next uniform post-warm-up fused
    dispatch runs with ns_prefix=0 (and results stay finite); the first
    post-bootstrap epoch always keeps the full prefix. The decision
    itself is forced True here (tau physics of a tiny CPU workload is
    not the test surface — the on-chip A/B in docs/RESULTS.md is)."""
    from vjf_tpu.parallel import ensemble as ens

    # f32 + fused_step='on' engages the interpret-mode fused path on CPU
    cfg = _cfg(dtype="float32", fused_step="on", fused_epoch="mega",
               ns_prefix=8, warmup_max=2, rtol=0.0)
    N = 2
    ys = np.stack([_ring_data(30 + i, T=24) for i in range(N)]
                  ).astype(np.float32)
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(5), N)

    monkeypatch.setattr(ens, "_prefix_free_next", lambda cur, h, t: True)
    seen = []
    real_epoch, real_epochs = ens._ensemble_epoch, ens._ensemble_epochs

    def spy_epoch(cfg_d, *a, **kw):
        seen.append(cfg_d.ns_prefix)
        return real_epoch(cfg_d, *a, **kw)

    def spy_epochs(cfg_d, *a, **kw):
        seen.append(cfg_d.ns_prefix)
        return real_epochs(cfg_d, *a, **kw)

    monkeypatch.setattr(ens, "_ensemble_epoch", spy_epoch)
    monkeypatch.setattr(ens, "_ensemble_epochs", spy_epochs)

    # enough epochs for: warm phase, the first post-bootstrap (watched)
    # dispatch with the full prefix, and at least one engaged dispatch
    res = fit_ensemble(cfg, states, ys, key=jax.random.PRNGKey(9),
                       keys=keys, max_iter=4 * k_block,
                       epochs_per_dispatch=k_block)
    assert np.isfinite(res.loss).all()
    # warm-up dispatches + the first post-bootstrap dispatch keep the
    # full prefix; after the first watched dispatch the forced-True
    # decision must produce at least one ns_prefix=0 dispatch
    assert seen[0] == 8
    assert 0 in seen, f"prefix-free never engaged: dispatched {seen}"
    # and the first RLS dispatch after warm-up still carried the prefix
    first_rls = next(i for i, p in enumerate(seen) if i > 0)
    assert seen[first_rls] in (8, 0)


def test_prefix_free_off_never_engages(key, monkeypatch):
    """cfg.ns_prefix_free='off' pins every fused dispatch to the full
    prefix even when the decision machinery says contracted."""
    from vjf_tpu.parallel import ensemble as ens

    cfg = _cfg(dtype="float32", fused_step="on", fused_epoch="mega",
               ns_prefix=8, warmup_max=2, rtol=0.0, ns_prefix_free="off")
    N = 2
    ys = np.stack([_ring_data(40 + i, T=24) for i in range(N)]
                  ).astype(np.float32)
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(5), N)
    monkeypatch.setattr(ens, "_prefix_free_next", lambda cur, h, t: True)
    seen = []
    real_epoch = ens._ensemble_epoch

    def spy_epoch(cfg_d, *a, **kw):
        seen.append(cfg_d.ns_prefix)
        return real_epoch(cfg_d, *a, **kw)

    monkeypatch.setattr(ens, "_ensemble_epoch", spy_epoch)
    fit_ensemble(cfg, states, ys, key=jax.random.PRNGKey(9), keys=keys,
                 max_iter=5)
    assert all(p == 8 for p in seen), seen


def test_prefix_free_solo_blocked_wiring(key, monkeypatch):
    """The solo blocked driver (fit(epochs_per_dispatch=K)) mirrors the
    ensemble's prefix-free continuation: once the (forced-True here)
    decision engages, a later block dispatches with ns_prefix=0; the
    first post-bootstrap block keeps the full prefix."""
    from vjf_tpu.ops.pallas import fused_step as _fused

    cfg = _cfg(dtype="float32", fused_step="on", fused_epoch="mega",
               ns_prefix=8, warmup_max=2, rtol=0.0)
    ys = _ring_data(50, T=24).astype(np.float32)
    state = core.init_state(key, cfg)

    monkeypatch.setattr(_fused, "prefix_free_next", lambda cur, h, t: True)
    seen = []
    real = core.run_epochs

    def spy(cfg, flags, *a, **kw):   # signature must expose the
        seen.append(cfg.ns_prefix)   # static_argnames ("cfg", "flags")
        return real(cfg, flags, *a, **kw)

    monkeypatch.setattr(core, "run_epochs", spy)
    res = core.fit(cfg, state, ys, key=jax.random.PRNGKey(3), max_iter=8,
                   epochs_per_dispatch=2)
    assert np.isfinite(res.loss)
    assert seen[0] == 8                      # warm block: full prefix
    assert 0 in seen, f"prefix-free never engaged: dispatched {seen}"


@pytest.mark.parametrize("k_block", [1, 2])
def test_prefix_free_structural_engage_short_T(key, monkeypatch, k_block):
    """T <= ns_prefix workloads have no post-prefix tau evidence (the
    whole epoch runs inside the protected prefix) — the drivers engage
    STRUCTURALLY after the first protected post-bootstrap dispatch
    (run_chunks' first-chunk-only-prefix precedent). No decision
    monkeypatch here: the engage is deterministic."""
    from vjf_tpu.parallel import ensemble as ens

    cfg = _cfg(dtype="float32", fused_step="on", fused_epoch="mega",
               ns_prefix=64, warmup_max=2, rtol=0.0)   # T=24 < 64
    N = 2
    ys = np.stack([_ring_data(60 + i, T=24) for i in range(N)]
                  ).astype(np.float32)
    states = init_ensemble(key, cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(5), N)
    seen = []
    real_epoch, real_epochs = ens._ensemble_epoch, ens._ensemble_epochs
    monkeypatch.setattr(ens, "_ensemble_epoch",
                        lambda c, *a, **kw: (seen.append(c.ns_prefix),
                                             real_epoch(c, *a, **kw))[1])
    monkeypatch.setattr(ens, "_ensemble_epochs",
                        lambda c, *a, **kw: (seen.append(c.ns_prefix),
                                             real_epochs(c, *a, **kw))[1])
    res = fit_ensemble(cfg, states, ys, key=jax.random.PRNGKey(9),
                       keys=keys, max_iter=4 * k_block,
                       epochs_per_dispatch=k_block)
    assert np.isfinite(res.loss).all()
    assert seen[0] == 64                 # warm phase: full prefix
    assert 0 in seen, f"structural engage never fired: {seen}"
    # the FIRST post-bootstrap dispatch must still carry the full prefix
    idx0 = seen.index(0)
    assert seen[idx0 - 1] == 64
