"""End-to-end tests of the fused filter-then-learn loop and fit/forecast —
the de-facto integration level the reference covers with test_VJF
(``/root/reference/test/test_model.py:32-44``), plus latent-recovery checks
on the canonical limit-cycle system (``script/example.py:17-33``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu import VJF, StepFlags, VJFConfig
from vjf_tpu.models import vjf as core


def limit_cycle_data(key, T=400, ydim=20, noise=0.1, dtype=jnp.float64):
    """sin/cos limit cycle + linear-Gaussian observations, mirroring the
    canonical example (``script/example.py:17-33``)."""
    dt = 1e-2 * np.pi
    t = jnp.arange(0, T * dt, dt, dtype=dtype)
    x = jnp.stack([jnp.sin(t), jnp.cos(t)], axis=-1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = x + noise * jax.random.normal(k1, x.shape, dtype)
    C = jax.random.normal(k2, (2, ydim), dtype)
    d = jax.random.normal(k3, (ydim,), dtype)
    y = x @ C + d + noise * jax.random.normal(k4, (t.shape[0], ydim), dtype)
    return x, y


def test_filter_step_smoke(key):
    cfg = VJFConfig(ydim=10, xdim=3, udim=1, n_rbf=10, hidden_sizes=(5, 5),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    n = 4
    y = jax.random.normal(key, (n, cfg.ydim), dtype=jnp.float64)
    u = jax.random.normal(key, (n, cfg.udim), dtype=jnp.float64)
    qs = core.prior(state.params, n)
    eps = jax.random.normal(key, (2, n, cfg.xdim), dtype=jnp.float64)
    flags = StepFlags()
    new_state, qt, metrics = jax.jit(
        core.filter_step, static_argnames=("cfg", "flags")
    )(cfg, flags, state, qs, y, u, eps[0], eps[1], jnp.asarray(1e-4))
    assert qt.mean.shape == (n, cfg.xdim)
    assert np.isfinite(float(metrics.loss))
    # SGD moved the recognition net; RLS moved the dynamics weights
    assert not np.allclose(
        np.asarray(new_state.params.recognition.mean.w),
        np.asarray(state.params.recognition.mean.w),
    )
    assert not np.allclose(
        np.asarray(new_state.dynamics.blr.w_mean), np.asarray(state.dynamics.blr.w_mean)
    )
    assert int(new_state.dynamics.n_sample) == n
    assert int(new_state.lik_n_sample) == n


def test_filter_step_flags(key):
    """sgd=False leaves params; warm_up skips RLS; train_decoder=False
    freezes the decoder (vjf/model.py:179-221, 283)."""
    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    y = jax.random.normal(key, (3, cfg.ydim), dtype=jnp.float64)
    qs = core.prior(state.params, 3)
    eps = jax.random.normal(key, (2, 3, cfg.xdim), dtype=jnp.float64)
    lr = jnp.asarray(1e-4)

    s1, _, _ = core.filter_step(
        cfg, StepFlags(sgd=False, update=False), state, qs, y, None, eps[0], eps[1], lr
    )
    assert np.allclose(np.asarray(s1.params.recognition.mean.w),
                       np.asarray(state.params.recognition.mean.w))
    assert np.array_equal(np.asarray(s1.dynamics.blr.w_mean),
                          np.asarray(state.dynamics.blr.w_mean))

    s2, _, _ = core.filter_step(
        cfg, StepFlags(warm_up=True), state, qs, y, None, eps[0], eps[1], lr
    )
    assert np.array_equal(np.asarray(s2.dynamics.blr.w_mean),
                          np.asarray(state.dynamics.blr.w_mean))  # RLS skipped
    assert int(s2.dynamics.n_sample) == 3  # but noise running-var still ran

    s3, _, _ = core.filter_step(
        cfg, StepFlags(train_decoder=False), state, qs, y, None, eps[0], eps[1], lr
    )
    assert np.array_equal(np.asarray(s3.params.decoder.w),
                          np.asarray(state.params.decoder.w))


def test_run_epoch_and_injected_noise(key):
    """Scan-based epoch runs, and injected-noise mode is deterministic."""
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    T, B = 25, 3
    ys = jax.random.normal(key, (T, B, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((T, B, 0), dtype=jnp.float64)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), dtype=jnp.float64)

    flags = StepFlags(warm_up=True)
    r1 = core.run_epoch(cfg, flags, state, ys, us, key, jnp.asarray(1e-4),
                        noise=(eps[0], eps[1]))
    r2 = core.run_epoch(cfg, flags, state, ys, us, key, jnp.asarray(1e-4),
                        noise=(eps[0], eps[1]))
    assert r1.q_means.shape == (T, B, cfg.xdim)
    np.testing.assert_array_equal(np.asarray(r1.q_means), np.asarray(r2.q_means))
    np.testing.assert_array_equal(
        np.asarray(r1.metrics.loss), np.asarray(r2.metrics.loss)
    )
    assert np.all(np.isfinite(np.asarray(r1.metrics.loss)))


@pytest.mark.parametrize("backend", ["precision", "covariance"])
def test_fit_recovers_limit_cycle(key, backend):
    """The flagship correctness test: posterior means must recover the 2D
    limit cycle latent (up to linear transform) from 20-D observations."""
    kd, km = jax.random.split(key)
    x_true, y = limit_cycle_data(kd, T=800)
    cfg = VJFConfig(ydim=20, xdim=2, udim=0, n_rbf=50, hidden_sizes=(20,),
                    likelihood="gaussian", dtype="float64", lr=3e-3,
                    rls_backend=backend)
    state = core.init_state(km, cfg)
    result = core.fit(cfg, state, y, key=km, max_iter=60)
    assert np.isfinite(result.loss)

    m = np.asarray(result.mu[:, 0, :])               # (T, 2)
    xt = np.asarray(x_true)
    # linear map from posterior to truth should explain most variance
    A, *_ = np.linalg.lstsq(
        np.concatenate([m, np.ones((m.shape[0], 1))], axis=1), xt, rcond=None
    )
    pred = np.concatenate([m, np.ones((m.shape[0], 1))], axis=1) @ A
    r2 = 1 - np.sum((pred - xt) ** 2) / np.sum((xt - xt.mean(0)) ** 2)
    assert r2 > 0.85, f"latent recovery R^2 too low: {r2}"


def test_fit_poisson_smoke(key):
    """Poisson likelihood end-to-end (BASELINE config #2 shape)."""
    kd, km = jax.random.split(key)
    x_true, _ = limit_cycle_data(kd, T=120)
    C = jax.random.normal(kd, (2, 15), dtype=jnp.float64) * 0.5
    rate = jnp.exp(x_true @ C)
    y = jax.random.poisson(kd, rate).astype(jnp.float64)
    cfg = VJFConfig(ydim=15, xdim=2, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="poisson", dtype="float64", lr=1e-3)
    state = core.init_state(km, cfg)
    result = core.fit(cfg, state, y, key=km, max_iter=5)
    assert np.isfinite(result.loss)


def test_fit_blocked_matches_quality(key):
    """Block-dispatch production fit (epochs_per_dispatch=K via run_epochs):
    K epochs per device round-trip with block-granular phase transitions
    must recover the limit cycle as well as the per-epoch loop (the control
    flow deviates — plateau applied at block boundaries — so the gate is
    quality equivalence, not bit parity)."""
    kd, km = jax.random.split(key)
    x_true, y = limit_cycle_data(kd, T=600)
    cfg = VJFConfig(ydim=20, xdim=2, udim=0, n_rbf=40, hidden_sizes=(16,),
                    likelihood="gaussian", dtype="float64", lr=3e-3)
    state = core.init_state(km, cfg)

    seen = []
    blocked = core.fit(
        cfg, state, y, key=km, max_iter=42, epochs_per_dispatch=6,
        # result must honor fit()'s callback contract (result.metrics with
        # indexable leaves — progress_callback does metrics.recon[-1];
        # r2 review finding: the raw EpochsResult crashed it)
        callback=lambda e, loss, res: seen.append(
            (e, loss, float(np.asarray(res.metrics.loss[-1])),
             float(np.asarray(res.metrics.recon[-1])))
        ),
    )
    assert not blocked.warm_up, "warm-up never ended in blocked mode"
    assert np.isfinite(blocked.loss)
    # the callback saw every epoch exactly once, in order, with finite
    # losses, and the metrics view's last entry IS that epoch's mean loss
    assert [e for e, *_ in seen] == list(range(len(seen)))
    assert all(np.isfinite(l) for _, l, *_ in seen)
    assert all(abs(l - ml) < 1e-6 for _, l, ml, _ in seen)

    m = np.asarray(blocked.mu[:, 0, :])
    xt = np.asarray(x_true)
    X = np.concatenate([m, np.ones((m.shape[0], 1))], axis=1)
    A, *_ = np.linalg.lstsq(X, xt, rcond=None)
    r2 = 1 - np.sum((X @ A - xt) ** 2) / np.sum((xt - xt.mean(0)) ** 2)
    assert r2 > 0.85, f"blocked-fit latent recovery R^2 too low: {r2}"

    # parity mode rejects block dispatch
    with pytest.raises(ValueError):
        core.fit(cfg, state, y, key=km, max_iter=4, epochs_per_dispatch=2,
                 noise_hook=lambda e: None)


def test_fit_blocked_demotes_on_hot_tau(key, caplog):
    """The block path must carry fit()'s hot-tau demotion: B=1 SGP keeps
    the NSV trace bound above the mega kernel's skip ceiling, so the block
    driver must detect the per-epoch hot fraction, demote to the XLA epoch,
    and re-run the block from its pre-block state."""
    import logging

    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor

    x = ring_attractor(T=80)
    y, _, _ = linear_gaussian_observations(x, 10, obs_noise=0.1,
                                           intercept=False, seed=7)
    y = y.astype(np.float32)

    cfg = VJFConfig(ydim=10, xdim=2, udim=0, dynamics="sgp", n_inducing=16,
                    sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
                    dtype="float32", rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", ns_prefix=8, lr=1e-3, rtol=0.5)
    state = core.init_state(key, cfg)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        result = core.fit(cfg, state, y, key=key, max_iter=8,
                          epochs_per_dispatch=4)
    assert not result.warm_up, "warm-up never ended; the mega path never ran"
    assert np.isfinite(result.loss)
    assert np.all(np.isfinite(np.asarray(result.state.dynamics.blr.precision)))
    assert any("demoting" in r.message for r in caplog.records)


def test_fit_reprobes_mega_after_demotion(key, caplog):
    """Hot-tau demotion must not be permanent: after cfg.repromote_after
    epochs fit() re-probes the mega layout (cfg.repromote_max bounds the
    probes). This gentle B=1 SGP config trips the demotion threshold
    marginally (~1.4% hot at the first post-bootstrap epoch on CPU), so
    the probe may land either way — both outcomes are valid: a clean
    probe stays on mega (one demotion total), a hot probe re-runs from
    its pre-epoch state and demotes again (two). The invariants are that
    exactly repromote_max probes fire and the fit stays finite."""
    import logging

    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor

    x = ring_attractor(T=80)
    y, _, _ = linear_gaussian_observations(x, 10, obs_noise=0.1,
                                           intercept=False, seed=7)
    y = y.astype(np.float32)

    base = dict(ydim=10, xdim=2, udim=0, dynamics="sgp", n_inducing=16,
                sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
                dtype="float32", rls_backend="nsv", fused_step="on",
                matmul_dtype="float32", ns_prefix=8, lr=1e-3,
                rtol=1e-6, warmup_max=2)
    cfg = VJFConfig(**base, repromote_after=1, repromote_max=1)
    state = core.init_state(key, cfg)
    with caplog.at_level(logging.INFO, logger="vjf_tpu"):
        result = core.fit(cfg, state, y, key=key, max_iter=6)
    assert np.isfinite(result.loss)
    assert np.all(np.isfinite(np.asarray(result.state.dynamics.blr.precision)))
    demotions = [r for r in caplog.records if "demoting" in r.message]
    probes = [r for r in caplog.records if "Re-probing" in r.message]
    assert len(probes) == 1, "repromote_max=1 must yield exactly one probe"
    assert len(demotions) in (1, 2), "one initial demotion, plus one more " \
        "only if the probe epoch itself ran hot"

    # repromote_after=0 restores permanent demotion
    caplog.clear()
    cfg0 = VJFConfig(**base, repromote_after=0)
    state0 = core.init_state(key, cfg0)
    with caplog.at_level(logging.INFO, logger="vjf_tpu"):
        result0 = core.fit(cfg0, state0, y, key=key, max_iter=6)
    assert np.isfinite(result0.loss)
    assert not any("Re-probing" in r.message for r in caplog.records)
    assert sum("demoting" in r.message for r in caplog.records) == 1


def test_stop_patience_defers_convergence(key):
    """``cfg.stop_patience`` requires N CONSECUTIVE post-warm-up plateau
    epochs before the early stop (default 1 = the reference's single-shot
    break, vjf/model.py:293-295 — measured to stop a Van der Pol fit on a
    transient plateau with the dynamics undertrained). With rtol large
    enough that EVERY epoch is a plateau hit, the convergence epoch must
    move by exactly stop_patience - 1, in both fit loops."""
    rng = np.random.default_rng(0)
    y = rng.normal(size=(40, 3, 8)).astype(np.float32)

    def run(patience, k=None):
        cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(8,),
                        likelihood="gaussian", dtype="float32",
                        rls_backend="nsv", rtol=10.0, stop_patience=patience)
        state = core.init_state(key, cfg)
        kwargs = {} if k is None else {"epochs_per_dispatch": k}
        return core.fit(cfg, state, y, key=key, max_iter=12, **kwargs)

    r1, r3 = run(1), run(3)
    assert r3.epochs_run == r1.epochs_run + 2
    # the block-dispatch loop honors it too (the break applies at the
    # block boundary; with k=2 and patience-1=2 the boundary math is exact)
    b1, b3 = run(1, k=2), run(3, k=2)
    assert b3.epochs_run == b1.epochs_run + 2


def test_oo_api_mirrors_reference(key):
    """The reference's test_VJF flow: make_model → fit → forecast
    (test_model.py:32-44), including control inputs."""
    N, ydim, xdim, udim = 60, 10, 3, 1
    y = np.random.default_rng(0).normal(size=(N, ydim))
    u = np.random.default_rng(1).normal(size=(N, udim))
    model = VJF.make_model(ydim, xdim, udim, n_rbf=10, hidden_sizes=[5, 5],
                           likelihood="gaussian", dtype="float64")
    mu, logvar, loss = model.fit(y, u, max_iter=2)
    assert mu.shape == (N, 1, xdim)
    x, yhat = model.forecast(mu[0, 0], u=np.repeat(u[None, :1], 20, 0), n_step=20)
    assert x.shape == (21, 1, xdim)
    assert yhat.shape == (21, 1, ydim)

    # streaming filter API
    qt, l = model.filter(y[0], u[0])
    qt, l = model.filter(y[1], u[1], qs=qt)
    assert qt.mean.shape == (1, xdim)


def test_oo_make_model_seed_and_cfg_precedence():
    """Two facade regressions: (1) ``make_model(seed=...)`` must actually
    seed the model (it was dropped, so every factory model was seed 0);
    (2) ``fit`` must inherit ``cfg.beta``/``cfg.rtol`` instead of
    shadowing them with the signature defaults (a model built with
    ``rtol=2e-3`` silently ran the plateau check at 1e-4)."""
    kw = dict(n_rbf=8, hidden_sizes=[6], likelihood="gaussian",
              dtype="float32", fused_step="off")
    m1 = VJF.make_model(6, 2, seed=1, **kw)
    m2 = VJF.make_model(6, 2, seed=2, **kw)
    w1 = np.asarray(jax.tree_util.tree_leaves(m1.state.params)[0])
    w2 = np.asarray(jax.tree_util.tree_leaves(m2.state.params)[0])
    assert not np.array_equal(w1, w2), "seed kwarg ignored by make_model"

    # cfg.rtol made enormous: the plateau must fire at the first check, so
    # warm-up ends and the decoder freezes within a few epochs. Under the
    # shadowed-default bug the effective rtol is 1e-4 and (on random data)
    # warm-up persists.
    m3 = VJF.make_model(6, 2, seed=0, rtol=1e9, **kw)
    y = np.random.default_rng(3).normal(size=(40, 1, 6)).astype(np.float32)
    m3.fit(y, max_iter=4)
    assert m3._decoder_frozen, "cfg.rtol shadowed by fit()'s default"


def test_velocity_field_query(key):
    model = VJF.make_model(8, 2, 0, n_rbf=10, hidden_sizes=[5],
                           likelihood="gaussian", dtype="float64")
    grid = np.random.default_rng(0).normal(size=(30, 2))
    v = model.velocity(grid)
    assert v.shape == (30, 2)


def test_run_epochs_matches_sequential_run_epoch(key):
    """The multi-epoch device-side driver (one dispatch per K epochs) must
    equal K sequential run_epoch dispatches given the same per-epoch keys
    and lrs — both the final state and per-epoch mean losses."""
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off")
    state = core.init_state(key, cfg)
    T, B, E = 30, 4, 3
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    keys = jax.random.split(key, E)
    lrs = cfg.lr * (cfg.lr_decay ** jnp.arange(E, dtype=jnp.float32))
    flags = StepFlags()

    multi = core.run_epochs(cfg, flags, state, ys, us, keys, lrs)

    st = state
    losses = []
    for e in range(E):
        res = core.run_epoch(cfg, flags, st, ys, us, keys[e], lrs[e])
        st = res.state
        losses.append(float(jnp.mean(res.metrics.loss)))

    np.testing.assert_allclose(np.asarray(multi.epoch_loss), np.asarray(losses),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(multi.q_means), np.asarray(res.q_means),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(multi.state),
                    jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_oo_api_smooth_facade(key):
    """VJF.smooth: the post-hoc parallel RTS smoother is reachable from the
    OO facade for both likelihoods and returns finite (T, xdim) means."""
    N, ydim, xdim = 50, 8, 2
    rng = np.random.default_rng(0)
    for lik in ("gaussian", "poisson"):
        if lik == "gaussian":
            y = rng.normal(size=(N, ydim))
        else:
            y = rng.poisson(1.0, size=(N, ydim)).astype(np.float64)
        model = VJF.make_model(ydim, xdim, 0, n_rbf=10, hidden_sizes=[5],
                               likelihood=lik, dtype="float64")
        model.fit(y, max_iter=2)
        filtered, smoothed = model.smooth(y)
        assert smoothed.means.shape == (N, xdim)
        assert np.all(np.isfinite(np.asarray(smoothed.means)))
        assert np.all(np.isfinite(np.asarray(smoothed.covs)))

        # (T, B, ydim) dispatches to the batched vmapped smoother; trial 0
        # of a stacked batch reproduces the single-sequence result
        yb = np.stack([y, y + rng.normal(size=y.shape) * 0.1], axis=1)
        fb, sb = model.smooth(yb)
        assert sb.means.shape == (N, 2, xdim)
        np.testing.assert_allclose(np.asarray(sb.means[:, 0]),
                                   np.asarray(smoothed.means),
                                   rtol=2e-6, atol=1e-8)


def test_warmup_max_forces_transition(key):
    """cfg.warmup_max: with a plateau that can never fire (rtol=0), the
    fit would reference-faithfully warm up forever and never train the
    dynamics; the cap forces the phase transition. Both fit modes."""
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", fused_step="off",
                    rls_backend="nsv", rtol=0.0, warmup_max=4)
    t_len = 60
    y = jax.random.normal(key, (t_len, 1, cfg.ydim), jnp.float32)

    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=10)
    assert not res.warm_up
    assert int(res.state.dynamics.n_sample) > 0   # RLS actually ran

    res_b = core.fit(cfg, core.init_state(key, cfg), y, key=key, max_iter=10,
                     epochs_per_dispatch=3)
    assert not res_b.warm_up
    assert int(res_b.state.dynamics.n_sample) > 0

    # default (warmup_max=0): reference behavior — warm-up never ends here
    cfg0 = cfg.replace(warmup_max=0)
    res0 = core.fit(cfg0, core.init_state(key, cfg0), y, key=key, max_iter=10)
    assert res0.warm_up


def test_oo_loss_matches_filter_components(key):
    """VJF.loss (vjf/model.py:124-154) composed from forward outputs must
    equal recon - entropy (+ dynamics unless warm_up) as the verbose
    filter reports them."""
    model = VJF.make_model(6, 2, n_rbf=8, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64",
                           fused_step="off")
    y = np.random.default_rng(4).normal(size=(1, 6))
    xs, pt, qt, xt, py = model.forward(y)
    l_warm = model.loss(y, xs, pt, qt, xt, py, warm_up=True)
    l_full = model.loss(y, xs, pt, qt, xt, py, warm_up=False)
    from vjf_tpu.models.vjf import _likelihood_loss
    from vjf_tpu.ops.functional import gaussian_entropy

    import jax.numpy as jnp
    recon = _likelihood_loss(model.cfg, model.state.params.likelihood, py,
                             jnp.asarray(y))
    h = gaussian_entropy(qt)
    np.testing.assert_allclose(float(l_warm), float(recon - h), rtol=1e-10)
    assert float(l_full) != float(l_warm)  # dynamics term included
    assert np.isfinite(float(l_full))


def test_lr_schedule_position_carries_and_saves(key, tmp_path):
    """The ExponentialLR schedule is facade instance state, like the
    reference's scheduler (vjf/model.py:69-78): FitResult reports the
    post-run lr + epochs actually executed, a second fit() CONTINUES the
    decay instead of restarting at cfg.lr, and save()/load() round-trips
    the position (review finding: self._lr was never written back, so the
    persisted 'schedule position' was always the construction-time lr)."""
    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float32", fused_step="off",
                    rls_backend="nsv", rtol=0.0, warmup_max=2)
    y = jax.random.normal(key, (30, 1, cfg.ydim), jnp.float32)

    # functional core: epochs_run + post-run lr (rtol=0 => never converges)
    res = core.fit(cfg, core.init_state(key, cfg), y, key=key, max_iter=5)
    assert res.epochs_run == 5
    np.testing.assert_allclose(res.lr, cfg.lr * cfg.lr_decay ** 5, rtol=1e-12)
    # lr0 override continues from an arbitrary position
    res2 = core.fit(cfg, res.state, y, key=key, max_iter=3, lr0=res.lr)
    np.testing.assert_allclose(res2.lr, cfg.lr * cfg.lr_decay ** 8, rtol=1e-12)

    # blocked mode decays identically (block-granular application)
    res_b = core.fit(cfg, core.init_state(key, cfg), y, key=key, max_iter=6,
                     epochs_per_dispatch=3)
    assert res_b.epochs_run == 6
    np.testing.assert_allclose(res_b.lr, cfg.lr * cfg.lr_decay ** 6, rtol=1e-12)

    # facade: schedule continues across fit() calls and survives save/load
    model = VJF(cfg, seed=3)
    model.fit(np.asarray(y), max_iter=4)
    np.testing.assert_allclose(model._lr, cfg.lr * cfg.lr_decay ** 4,
                               rtol=1e-12)
    path = str(tmp_path / "ckpt")
    model.save(path)
    restored = VJF.load(path)
    np.testing.assert_allclose(restored._lr, model._lr, rtol=0, atol=0)
    restored.fit(np.asarray(y), max_iter=2)
    np.testing.assert_allclose(restored._lr, cfg.lr * cfg.lr_decay ** 6,
                               rtol=1e-12)
