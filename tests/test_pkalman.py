"""Parallel (associative-scan) Kalman filter/smoother must match the O(T)
sequential recursions exactly, and actually smooth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.ops import pkalman as PK


@pytest.fixture
def lgssm(key):
    xdim, ydim, T = 3, 5, 64
    k1, k2, k3 = jax.random.split(key, 3)
    th = 0.3
    rot = jnp.asarray(
        [[jnp.cos(th), -jnp.sin(th), 0], [jnp.sin(th), jnp.cos(th), 0], [0, 0, 0.95]],
        dtype=jnp.float64,
    )
    a = 0.98 * rot
    q = 0.05 * jnp.eye(xdim, dtype=jnp.float64)
    h = jax.random.normal(k1, (ydim, xdim), dtype=jnp.float64)
    r = 0.2 * jnp.eye(ydim, dtype=jnp.float64)
    m0 = jnp.zeros(xdim, dtype=jnp.float64)
    p0 = jnp.eye(xdim, dtype=jnp.float64)

    # simulate
    def step(c, k):
        x = c
        kq, kr = jax.random.split(k)
        x = a @ x + jnp.sqrt(0.05) * jax.random.normal(kq, (xdim,), jnp.float64)
        y = h @ x + jnp.sqrt(0.2) * jax.random.normal(kr, (ydim,), jnp.float64)
        return x, (x, y)

    _, (xs, ys) = jax.lax.scan(step, jnp.ones(xdim, jnp.float64), jax.random.split(k2, T))
    return a, q, h, r, m0, p0, xs, ys


def test_parallel_filter_matches_sequential(lgssm):
    a, q, h, r, m0, p0, xs, ys = lgssm
    par = PK.parallel_filter(a, q, h, r, m0, p0, ys)
    seq = PK.sequential_filter(a, q, h, r, m0, p0, ys)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(par.covs), np.asarray(seq.covs),
                               rtol=1e-8, atol=1e-10)


def test_parallel_smoother_matches_sequential(lgssm):
    a, q, h, r, m0, p0, xs, ys = lgssm
    filtered, smoothed = PK.parallel_smooth(a, q, h, r, m0, p0, ys)
    seq = PK.sequential_smooth(a, q, filtered)
    np.testing.assert_allclose(np.asarray(smoothed.means), np.asarray(seq.means),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(smoothed.covs), np.asarray(seq.covs),
                               rtol=1e-7, atol=1e-9)


def test_smoothing_beats_filtering(lgssm):
    a, q, h, r, m0, p0, xs, ys = lgssm
    filtered, smoothed = PK.parallel_smooth(a, q, h, r, m0, p0, ys)
    err_f = float(jnp.mean(jnp.square(filtered.means - xs)))
    err_s = float(jnp.mean(jnp.square(smoothed.means - xs)))
    assert err_s < err_f  # smoothing uses future data; must not be worse
    # covariances stay PSD-ish
    eigs = np.linalg.eigvalsh(np.asarray(smoothed.covs))
    assert eigs.min() > -1e-9


def test_vjf_posthoc_smoothing(key):
    """Smoothing a trained VJF model improves latent recovery vs the online
    filter on the limit cycle (uses the linearized learned dynamics)."""
    import math

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing
    from vjf_tpu.models import vjf as core

    dt = 1e-2 * math.pi
    t = jnp.arange(0, 600 * dt, dt, dtype=jnp.float64)
    x_true = jnp.stack([jnp.sin(t), jnp.cos(t)], -1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xn = x_true + 0.1 * jax.random.normal(k1, x_true.shape, jnp.float64)
    C = jax.random.normal(k2, (2, 20), jnp.float64)
    y = xn @ C + jax.random.normal(k3, (20,), jnp.float64) \
        + 0.1 * jax.random.normal(k4, (t.shape[0], 20), jnp.float64)

    cfg = VJFConfig(ydim=20, xdim=2, udim=0, n_rbf=40, hidden_sizes=(16,),
                    likelihood="gaussian", dtype="float64", lr=3e-3)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=40)

    filtered, smoothed = smoothing.smooth(cfg, res.state, y)
    assert smoothed.means.shape == (t.shape[0], 2)
    assert bool(jnp.all(jnp.isfinite(smoothed.means)))

    def r2(m):
        m = np.asarray(m)
        X = np.concatenate([m, np.ones((m.shape[0], 1))], 1)
        A, *_ = np.linalg.lstsq(X, np.asarray(x_true), rcond=None)
        p = X @ A
        xt = np.asarray(x_true)
        return 1 - np.sum((p - xt) ** 2) / np.sum((xt - xt.mean(0)) ** 2)

    assert r2(smoothed.means) > 0.8

    # x_ref as a (T, xdim) reference trajectory (advertised in the API
    # docstring; r2 review finding — used to crash): per-step linearization
    # at x_ref[t-1], exactly the smooth_iterated convention, so passing the
    # first pass's smoothed means must reproduce iteration 2 of
    # smooth_iterated.
    _, smoothed_traj = smoothing.smooth(cfg, res.state, y,
                                        x_ref=smoothed.means)
    assert smoothed_traj.means.shape == (t.shape[0], 2)
    assert bool(jnp.all(jnp.isfinite(smoothed_traj.means)))
    _, smoothed_it2 = smoothing.smooth_iterated(cfg, res.state, y, n_iter=2)
    np.testing.assert_allclose(np.asarray(smoothed_traj.means),
                               np.asarray(smoothed_it2.means),
                               rtol=1e-8, atol=1e-10)

    # a single (xdim,) linearization point still works
    _, smoothed_pt = smoothing.smooth(
        cfg, res.state, y, x_ref=jnp.zeros((2,), jnp.float64)
    )
    np.testing.assert_allclose(np.asarray(smoothed_pt.means),
                               np.asarray(smoothed.means), rtol=1e-12)


def test_time_varying_affine_matches_sequential(key):
    """Per-step (A_t, b_t) dynamics: parallel == sequential recursions."""
    xdim, ydim, T = 3, 4, 40
    k1, k2, k3 = jax.random.split(key, 3)
    a_seq = 0.9 * jnp.stack([
        jnp.eye(xdim) + 0.1 * jax.random.normal(k, (xdim, xdim), jnp.float64)
        for k in jax.random.split(k1, T)
    ])
    b_seq = 0.1 * jax.random.normal(k2, (T, xdim), jnp.float64)
    q = 0.05 * jnp.eye(xdim, dtype=jnp.float64)
    h = jax.random.normal(k3, (ydim, xdim), jnp.float64)
    r = 0.2 * jnp.eye(ydim, dtype=jnp.float64)
    m0 = jnp.zeros(xdim, jnp.float64)
    p0 = jnp.eye(xdim, dtype=jnp.float64)
    ys = jax.random.normal(k3, (T, ydim), jnp.float64)

    par_f = PK.parallel_filter(a_seq, q, h, r, m0, p0, ys, b=b_seq)
    seq_f = PK.sequential_filter(a_seq, q, h, r, m0, p0, ys, b=b_seq)
    np.testing.assert_allclose(np.asarray(par_f.means), np.asarray(seq_f.means),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(par_f.covs), np.asarray(seq_f.covs),
                               rtol=1e-8, atol=1e-10)

    _, par_s = PK.parallel_smooth(a_seq, q, h, r, m0, p0, ys, b=b_seq)
    seq_s = PK.sequential_smooth(a_seq, q, par_f, b=b_seq)
    np.testing.assert_allclose(np.asarray(par_s.means), np.asarray(seq_s.means),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par_s.covs), np.asarray(seq_s.covs),
                               rtol=1e-7, atol=1e-9)


def test_iterated_smoothing_improves_or_holds(key):
    """Iterated re-linearization along the smoothed trajectory must not
    degrade latent recovery on the limit cycle."""
    import math

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing
    from vjf_tpu.models import vjf as core

    dt = 1e-2 * math.pi
    t = jnp.arange(0, 500 * dt, dt, dtype=jnp.float64)
    x_true = jnp.stack([jnp.sin(t), jnp.cos(t)], -1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xn = x_true + 0.1 * jax.random.normal(k1, x_true.shape, jnp.float64)
    C = jax.random.normal(k2, (2, 20), jnp.float64)
    y = xn @ C + jax.random.normal(k3, (20,), jnp.float64) \
        + 0.1 * jax.random.normal(k4, (t.shape[0], 20), jnp.float64)

    cfg = VJFConfig(ydim=20, xdim=2, udim=0, n_rbf=40, hidden_sizes=(16,),
                    likelihood="gaussian", dtype="float64", lr=3e-3)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=30)

    def r2(m):
        m = np.asarray(m)
        X = np.concatenate([m, np.ones((m.shape[0], 1))], 1)
        A, *_ = np.linalg.lstsq(X, np.asarray(x_true), rcond=None)
        xt = np.asarray(x_true)
        return 1 - np.sum((X @ A - xt) ** 2) / np.sum((xt - xt.mean(0)) ** 2)

    _, s1 = smoothing.smooth(cfg, res.state, y)
    _, s3 = smoothing.smooth_iterated(cfg, res.state, y, n_iter=3)
    assert np.all(np.isfinite(np.asarray(s3.means)))
    assert r2(s3.means) > r2(s1.means) - 0.02  # no degradation
    assert r2(s3.means) > 0.8


def test_per_step_obs_noise_matches_sequential(lgssm, key):
    """Per-step R_t (the Laplace/Poisson working-observation case) through
    the associative scan == the O(T) sequential filter."""
    a, q, h, r, m0, p0, xs, ys = lgssm
    T = ys.shape[0]
    scales = 0.05 + jax.random.uniform(key, (T,), jnp.float64)
    r_seq = scales[:, None, None] * jnp.broadcast_to(r, (T,) + r.shape)

    par = PK.parallel_filter(a, q, h, r_seq, m0, p0, ys)
    seq = PK.sequential_filter(a, q, h, r_seq, m0, p0, ys)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(par.covs), np.asarray(seq.covs),
                               rtol=1e-9, atol=1e-11)


def test_poisson_smoothing_recovers_latent(key):
    """Iterated-Laplace parallel smoothing for the POISSON likelihood
    (models/smoothing.py:smooth_poisson): on synthetic Poisson counts from a
    known contraction, the smoothed latents must beat the naive working-
    response estimate and the one-iteration (pure-EKF) pass."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core

    rng = np.random.default_rng(8)
    T, xdim, ydim = 300, 2, 30
    # rotating contraction latent
    th = 0.12
    A = 0.98 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x = np.zeros((T, xdim))
    x[0] = [1.0, 0.0]
    for t in range(T - 1):
        x[t + 1] = A @ x[t] + 0.05 * rng.normal(size=xdim)
    C = rng.normal(size=(ydim, xdim))
    d = np.full(ydim, 0.3)
    lam = np.exp(np.clip(x @ C.T + d, None, 5))
    y = rng.poisson(lam).astype(np.float64)

    cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=32, hidden_sizes=(8,),
                    likelihood="poisson", dtype="float64")
    state = core.init_state(key, cfg)
    # install the true decoder and a dynamics model fit to the true pairs
    state = state._replace(
        params=state.params._replace(
            decoder=type(state.params.decoder)(jnp.asarray(C), jnp.asarray(d))
        ),
        dynamics=dyn.dynamics_initialize(
            cfg, key, state.dynamics, jnp.asarray(x[1:]), jnp.asarray(x[:-1])
        ),
    )

    filtered, smoothed = SM.smooth(cfg, state, y)          # dispatches poisson
    m = np.asarray(smoothed.means)
    rmse = np.sqrt(np.mean((m - x) ** 2))

    # baseline 1: decoder pseudo-inverse of the working response
    eta0 = np.log(y + 0.5) - d
    x_naive = eta0 @ np.linalg.pinv(C).T
    rmse_naive = np.sqrt(np.mean((x_naive - x) ** 2))
    assert rmse < 0.5 * rmse_naive, (rmse, rmse_naive)

    # baseline 2: a single Laplace pass (no re-linearization) is worse
    _, sm1 = SM.smooth_poisson(cfg, state, y, n_iter=1)
    rmse1 = np.sqrt(np.mean((np.asarray(sm1.means) - x) ** 2))
    assert rmse <= rmse1 + 1e-9, (rmse, rmse1)

    # smoothing uses the future: beats the filtered estimate too
    rmse_f = np.sqrt(np.mean((np.asarray(filtered.means) - x) ** 2))
    assert rmse < rmse_f, (rmse, rmse_f)

    # smooth_iterated dispatches Poisson to the iterated-Laplace smoother
    # (whose loop already re-linearizes the dynamics) instead of raising
    _, sm_it = SM.smooth_iterated(cfg, state, y, n_iter=3)
    _, sm_pl = SM.smooth_poisson(cfg, state, y, n_iter=3)
    np.testing.assert_array_equal(np.asarray(sm_it.means),
                                  np.asarray(sm_pl.means))


def test_smoothing_with_missing_observations(key):
    """Missing-data smoothing (``channel_mask``): exact LGSSM treatment by
    observation-variance inflation. All-ones mask == unmasked; missing
    entries' values are irrelevant (NaN-safe); 30% dropout degrades the
    smoothed estimate only mildly."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core
    from vjf_tpu.models.likelihoods import GaussianLikParams

    rng = np.random.default_rng(12)
    T, xdim, ydim = 300, 2, 20
    th = 0.12
    A = 0.98 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x = np.zeros((T, xdim))
    x[0] = [1.0, 0.0]
    for t in range(T - 1):
        x[t + 1] = A @ x[t] + 0.05 * rng.normal(size=xdim)
    C = rng.normal(size=(ydim, xdim))
    d = 0.3 * np.ones(ydim)
    y = (x @ C.T + d + 0.1 * rng.normal(size=(T, ydim))).astype(np.float64)

    cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=32, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    state = state._replace(
        params=state.params._replace(
            decoder=type(state.params.decoder)(jnp.asarray(C), jnp.asarray(d)),
            likelihood=GaussianLikParams(
                logvar=jnp.asarray(np.log(0.01), jnp.float64)
            ),
        ),
        dynamics=dyn.dynamics_initialize(
            cfg, key, state.dynamics, jnp.asarray(x[1:]), jnp.asarray(x[:-1])
        ),
    )

    _, sm_full = SM.smooth(cfg, state, y)
    _, sm_ones = SM.smooth(cfg, state, y, channel_mask=np.ones((T, ydim)))
    np.testing.assert_allclose(np.asarray(sm_ones.means),
                               np.asarray(sm_full.means), rtol=1e-6, atol=1e-9)

    cm = (rng.uniform(size=(T, ydim)) > 0.3).astype(np.float64)
    y_nan = np.where(cm > 0, y, np.nan)
    y_zero = np.where(cm > 0, y, 0.0)
    f_miss, sm_nan = SM.smooth(cfg, state, y_nan, channel_mask=cm)
    _, sm_zero = SM.smooth(cfg, state, y_zero, channel_mask=cm)
    np.testing.assert_array_equal(np.asarray(sm_nan.means),
                                  np.asarray(sm_zero.means))
    assert np.all(np.isfinite(np.asarray(sm_nan.means)))

    rmse_full = np.sqrt(np.mean((np.asarray(sm_full.means) - x) ** 2))
    rmse_miss = np.sqrt(np.mean((np.asarray(sm_nan.means) - x) ** 2))
    assert rmse_miss < 2.0 * rmse_full + 1e-6, (rmse_miss, rmse_full)
    # smoothing with missing data still beats its own filtered estimate
    rmse_f = np.sqrt(np.mean((np.asarray(f_miss.means) - x) ** 2))
    assert rmse_miss < rmse_f, (rmse_miss, rmse_f)

    # iterated variant accepts the mask too
    _, sm_it = SM.smooth_iterated(cfg, state, y_nan, n_iter=2, channel_mask=cm)
    assert np.all(np.isfinite(np.asarray(sm_it.means)))


def test_poisson_smoothing_with_missing_counts(key):
    """Poisson iterated-Laplace smoothing under dropout: masked counts get a
    centered working observation + inflated working variance. All-ones ==
    unmasked; NaN-safe; mild degradation at 30% dropout."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core

    rng = np.random.default_rng(21)
    T, xdim, ydim = 300, 2, 30
    th = 0.12
    A = 0.98 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x = np.zeros((T, xdim))
    x[0] = [1.0, 0.0]
    for t in range(T - 1):
        x[t + 1] = A @ x[t] + 0.05 * rng.normal(size=xdim)
    C = rng.normal(size=(ydim, xdim))
    d = np.full(ydim, 0.3)
    lam = np.exp(np.clip(x @ C.T + d, None, 5))
    y = rng.poisson(lam).astype(np.float64)

    cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=32, hidden_sizes=(8,),
                    likelihood="poisson", dtype="float64")
    state = core.init_state(key, cfg)
    state = state._replace(
        params=state.params._replace(
            decoder=type(state.params.decoder)(jnp.asarray(C), jnp.asarray(d))
        ),
        dynamics=dyn.dynamics_initialize(
            cfg, key, state.dynamics, jnp.asarray(x[1:]), jnp.asarray(x[:-1])
        ),
    )

    _, sm_full = SM.smooth_poisson(cfg, state, y)
    _, sm_ones = SM.smooth_poisson(cfg, state, y,
                                   channel_mask=np.ones((T, ydim)))
    np.testing.assert_allclose(np.asarray(sm_ones.means),
                               np.asarray(sm_full.means), rtol=1e-6, atol=1e-9)

    cm = (rng.uniform(size=(T, ydim)) > 0.3).astype(np.float64)
    y_nan = np.where(cm > 0, y, np.nan)
    y_zero = np.where(cm > 0, y, 0.0)
    _, sm_nan = SM.smooth_poisson(cfg, state, y_nan, channel_mask=cm)
    _, sm_zero = SM.smooth_poisson(cfg, state, y_zero, channel_mask=cm)
    np.testing.assert_array_equal(np.asarray(sm_nan.means),
                                  np.asarray(sm_zero.means))
    assert np.all(np.isfinite(np.asarray(sm_nan.means)))

    rmse_full = np.sqrt(np.mean((np.asarray(sm_full.means) - x) ** 2))
    rmse_miss = np.sqrt(np.mean((np.asarray(sm_nan.means) - x) ** 2))
    assert rmse_miss < 2.0 * rmse_full + 1e-6, (rmse_miss, rmse_full)


def test_diag_r_matches_dense_per_step(lgssm, key):
    """The information-form diagonal-R path (O(T xdim^2) memory, xdim-sized
    solves) must match the dense per-step-R path (O(T ydim^2)) to machine
    precision for finite variances."""
    a, q, h, r, m0, p0, xs, ys = lgssm
    T, ydim = ys.shape
    r_diag = jax.random.uniform(key, (T, ydim), jnp.float64, 0.05, 0.5)
    r_dense = jax.vmap(jnp.diag)(r_diag)
    f1, s1 = PK.parallel_smooth(a, q, h, r_dense, m0, p0, ys)
    f2, s2 = PK.parallel_smooth(a, q, h, r_diag, m0, p0, ys, diag_r=True)
    np.testing.assert_allclose(np.asarray(f2.means), np.asarray(f1.means),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f2.covs), np.asarray(f1.covs),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.means), np.asarray(s1.means),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.covs), np.asarray(s1.covs),
                               rtol=1e-9, atol=1e-12)


def test_diag_r_inf_equals_channel_deleted(lgssm):
    """r = inf (missing observation) must equal physically deleting the
    channel from (H, R, y) — Kalman gain exactly zero. A finite inflation
    factor is NOT exact: with tiny observed variances the masked channel
    keeps gain ~HPH'/(HPH' + scale*r), the r1 review's failure mode."""
    a, q, h, r, m0, p0, xs, ys = lgssm
    T, ydim = ys.shape
    miss = 2
    r_small = 1e-10 * jnp.ones((T, ydim), jnp.float64)  # near-noiseless decoder
    r_inf = r_small.at[:, miss].set(jnp.inf)
    ys_nan = ys.at[:, miss].set(jnp.nan)                # value must not matter
    f_m, s_m = PK.parallel_smooth(a, q, h, r_inf, m0, p0, ys_nan, diag_r=True)

    keep = np.array([i for i in range(ydim) if i != miss])
    f_d, s_d = PK.parallel_smooth(a, q, h[keep], r_small[:, keep], m0, p0,
                                  ys[:, keep], diag_r=True)
    np.testing.assert_allclose(np.asarray(f_m.means), np.asarray(f_d.means),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_m.means), np.asarray(s_d.means),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_m.covs), np.asarray(s_d.covs),
                               rtol=1e-9, atol=1e-12)


def test_masked_smoothing_zero_gain_at_tiny_obs_noise(key):
    """Regression (r1 review): relative variance inflation (r_base * 1e9)
    left O(1) gain on masked channels when the trained observation noise
    was tiny — smoothed means were pulled toward decoding the zeroed
    placeholder. Exact check: masking channel 0 at every step must equal
    a model with that channel's decoder row deleted."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core
    from vjf_tpu.models.likelihoods import GaussianLikParams

    rng = np.random.default_rng(3)
    T, xdim, ydim = 120, 2, 6
    th = 0.15
    A = 0.98 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x = np.zeros((T, xdim)); x[0] = [1.0, 0.0]
    for t in range(T - 1):
        x[t + 1] = A @ x[t] + 0.05 * rng.normal(size=xdim)
    C = rng.normal(size=(ydim, xdim))
    d = 0.3 * np.ones(ydim)
    y = (x @ C.T + d + 1e-5 * rng.normal(size=(T, ydim))).astype(np.float64)

    def make_state(cfg, C_, d_):
        state = core.init_state(key, cfg)
        return state._replace(
            params=state.params._replace(
                decoder=type(state.params.decoder)(jnp.asarray(C_), jnp.asarray(d_)),
                likelihood=GaussianLikParams(
                    logvar=jnp.asarray(np.log(1e-10), jnp.float64)  # tiny r
                ),
            ),
            dynamics=dyn.dynamics_initialize(
                cfg, key, state.dynamics, jnp.asarray(x[1:]), jnp.asarray(x[:-1])
            ),
        )

    cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float64")
    state = make_state(cfg, C, d)
    cm = np.ones((T, ydim)); cm[:, 0] = 0.0
    y_nan = np.where(cm > 0, y, np.nan)
    _, sm_masked = SM.smooth(cfg, state, y_nan, channel_mask=cm)

    cfg_red = cfg.replace(ydim=ydim - 1)
    state_red = make_state(cfg_red, C[1:], d[1:])
    _, sm_red = SM.smooth(cfg_red, state_red, y[:, 1:])
    np.testing.assert_allclose(np.asarray(sm_masked.means),
                               np.asarray(sm_red.means),
                               rtol=1e-8, atol=1e-10)


def test_smoothing_n_iter_validation():
    """Review finding: smooth_poisson(n_iter=0) silently returned
    (None, None); both iterated entry points now validate up front."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(ydim=4, xdim=2, udim=0, n_rbf=8, hidden_sizes=(4,),
                    likelihood="poisson", dtype="float64")
    state = core.init_state(jax.random.PRNGKey(0), cfg)
    y = np.zeros((10, 4))
    with pytest.raises(ValueError, match="n_iter"):
        SM.smooth_poisson(cfg, state, y, n_iter=0)
    with pytest.raises(ValueError, match="n_iter"):
        SM.smooth_iterated(cfg, state, y, n_iter=0)
    # Poisson smooth_iterated honors the caller's n_iter exactly
    _, s1 = SM.smooth_iterated(cfg, state, y, n_iter=1)
    _, p1 = SM.smooth_poisson(cfg, state, y, n_iter=1)
    np.testing.assert_array_equal(np.asarray(s1.means), np.asarray(p1.means))


def test_smooth_batch_matches_per_trial(key):
    """smooth_batch: one vmapped dispatch over (T, B, ydim) trials must
    reproduce the per-trial single-sequence smoother for both likelihoods,
    including per-trial x_ref linearizations and a shared channel mask;
    and the dp-sharded variant must match the unsharded one."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing
    from vjf_tpu.models import vjf as core
    from vjf_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    T, B, ydim = 40, 8, 12
    for lik in ("gaussian", "poisson"):
        cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=12,
                        hidden_sizes=(8,), likelihood=lik, dtype="float32",
                        rls_backend="nsv")
        state = core.init_state(key, cfg)
        if lik == "gaussian":
            y = rng.normal(size=(T, B, ydim)).astype(np.float32)
        else:
            y = rng.poisson(1.0, size=(T, B, ydim)).astype(np.float32)

        fb, sb = smoothing.smooth_batch(cfg, state, y)
        assert sb.means.shape == (T, B, 2)
        assert fb.covs.shape == (T, B, 2, 2)
        for b in (0, 3):
            fr, sr = smoothing.smooth(cfg, state, y[:, b])
            np.testing.assert_allclose(np.asarray(sb.means[:, b]),
                                       np.asarray(sr.means),
                                       rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(np.asarray(fb.covs[:, b]),
                                       np.asarray(fr.covs),
                                       rtol=2e-5, atol=2e-6)

        if len(jax.devices()) >= 8:
            mesh = make_mesh(8, axis_names=("dp",))
            fm, sm = smoothing.smooth_batch(cfg, state, y, mesh=mesh)
            np.testing.assert_allclose(np.asarray(sm.means),
                                       np.asarray(sb.means),
                                       rtol=1e-6, atol=1e-7)

        cm = (rng.uniform(size=(T, ydim)) > 0.3).astype(np.float32)
        xr = rng.normal(size=(T, B, 2)).astype(np.float32)
        f3, s3 = smoothing.smooth_batch(cfg, state, y, x_ref=xr,
                                        channel_mask=cm)
        n_it = 8 if lik == "poisson" else 1
        fr3, sr3 = smoothing.smooth_iterated(cfg, state, y[:, 2],
                                             n_iter=n_it, x_ref=xr[:, 2],
                                             channel_mask=cm)
        np.testing.assert_allclose(np.asarray(s3.means[:, 2]),
                                   np.asarray(sr3.means),
                                   rtol=2e-5, atol=2e-6)


def test_smooth_batch_validation(key):
    """Shape validation: 2-d input, wrong x_ref/channel_mask shapes."""
    import pytest

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(4,),
                    likelihood="gaussian", dtype="float32")
    state = core.init_state(key, cfg)
    y3 = np.zeros((10, 4, 6), np.float32)
    with pytest.raises(ValueError, match="single sequence"):
        smoothing.smooth_batch(cfg, state, np.zeros((10, 6), np.float32))
    with pytest.raises(ValueError, match="x_ref"):
        smoothing.smooth_batch(cfg, state, y3,
                               x_ref=np.zeros((10, 2), np.float32))
    with pytest.raises(ValueError, match="channel_mask"):
        smoothing.smooth_batch(cfg, state, y3,
                               channel_mask=np.ones((10, 5), np.float32))


def test_smoothing_with_sgp_dynamics(key):
    """The post-hoc smoother linearizes whatever transition the model
    carries — the SGP velocity field included (transition_gaussian is the
    shared interface). Plain, iterated, and batched variants."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=12, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float32", dynamics="sgp",
                    rls_backend="nsv")
    state = core.init_state(key, cfg)
    rng = np.random.default_rng(1)
    y = rng.normal(size=(30, 8)).astype(np.float32)

    f, s = smoothing.smooth(cfg, state, y)
    assert s.means.shape == (30, 2)
    assert np.all(np.isfinite(np.asarray(s.means)))
    f2, s2 = smoothing.smooth_iterated(cfg, state, y, n_iter=3)
    assert np.all(np.isfinite(np.asarray(s2.means)))
    yb = rng.normal(size=(30, 4, 8)).astype(np.float32)
    fb, sb = smoothing.smooth_batch(cfg, state, yb)
    assert sb.means.shape == (30, 4, 2)
    assert np.all(np.isfinite(np.asarray(sb.means)))


def test_smooth_controls_linearization_exact(key):
    """linearize_dynamics(u_ref=...) (models/smoothing.py): for a udim > 0
    model the affine model must reproduce the transition mean EXACTLY at
    the linearization point — A x0 + c == f(x0, u0) — with the control
    entering the offset (different u -> different c), the Jacobian taken
    w.r.t. x only, and smoothing without controls must fail loudly (it
    previously crashed with a cryptic dot_general shape error)."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(ydim=6, xdim=2, udim=2, n_rbf=12, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    # give the dynamics non-trivial weights so f depends on (x, u)
    rng = np.random.default_rng(0)
    blr = state.dynamics.blr
    state = state._replace(dynamics=state.dynamics._replace(
        blr=blr._replace(w_mean=jnp.asarray(
            rng.normal(scale=0.3, size=np.asarray(blr.w_mean).shape)))))

    from vjf_tpu.models import dynamics as dyn

    x0 = jnp.asarray([0.4, -0.2])
    u0 = jnp.asarray([0.7, -1.1])
    a, c = SM.linearize_dynamics(cfg, state, x0, u_ref=u0)
    f0 = dyn.transition_gaussian(state.dynamics, x0[None], u0[None],
                                 cfg.leak).mean[0]
    np.testing.assert_allclose(np.asarray(a @ x0 + c), np.asarray(f0),
                               rtol=1e-9, atol=1e-12)
    # a different control shifts the offset (controls reach the dynamics)
    _, c2 = SM.linearize_dynamics(cfg, state, x0, u_ref=2.0 * u0)
    assert np.abs(np.asarray(c2 - c)).max() > 1e-6
    # Jacobian is w.r.t. x only: finite differences at fixed u agree
    eps = 1e-6
    for j in range(cfg.xdim):
        dx = jnp.zeros(cfg.xdim).at[j].set(eps)
        fd = (dyn.transition_gaussian(state.dynamics, (x0 + dx)[None],
                                      u0[None], cfg.leak).mean[0] - f0) / eps
        np.testing.assert_allclose(np.asarray(a[:, j]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-6)

    # missing controls fail loudly at every entry point
    y = jnp.zeros((8, cfg.ydim))
    with pytest.raises(ValueError, match="udim"):
        SM.smooth(cfg, state, y)
    with pytest.raises(ValueError, match="udim"):
        SM.smooth_batch(cfg, state, jnp.zeros((8, 3, cfg.ydim)))
    # wrong length fails loudly too
    with pytest.raises(ValueError, match="us must be"):
        SM.smooth(cfg, state, y, us=jnp.zeros((5, cfg.udim)))


def test_smooth_controls_drive_recovery(key):
    """Post-hoc smoothing of a control-DRIVEN system (the r2 fuzz find:
    udim > 0 smoothing used to crash): with the true control sequence the
    smoother recovers the latent well; zeroed controls measurably degrade
    it (the offset term carries the drive). Batch arm: (T, B, udim)
    per-trial controls through smooth_batch == per-trial smooth()."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn
    from vjf_tpu.models import smoothing as SM
    from vjf_tpu.models import vjf as core

    rng = np.random.default_rng(3)
    T, xdim, ydim, udim = 200, 2, 12, 2
    Bm = np.array([[0.8, 0.0], [0.0, -0.6]])
    u = np.sin(np.stack([np.linspace(0, 9, T), np.linspace(0, 5, T)], -1))
    u += 0.2 * rng.normal(size=u.shape)
    x = np.zeros((T, xdim))
    for t in range(T - 1):
        # filter alignment: u[t+1] drives the transition INTO t+1
        x[t + 1] = 0.9 * x[t] + Bm @ u[t + 1] + 0.03 * rng.normal(size=xdim)
    C = rng.normal(size=(ydim, xdim))
    y = x @ C.T + 0.05 * rng.normal(size=(T, ydim))

    cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=udim, n_rbf=24,
                    hidden_sizes=(8,), likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    state = state._replace(
        params=state.params._replace(
            decoder=type(state.params.decoder)(
                jnp.asarray(C), jnp.zeros(ydim))
        ),
        dynamics=dyn.dynamics_initialize(
            cfg, key, state.dynamics, jnp.asarray(x[1:]), jnp.asarray(x[:-1]),
            u=jnp.asarray(u[1:]),
        ),
    )

    us = jnp.asarray(u)
    _, sm = SM.smooth_iterated(cfg, state, jnp.asarray(y), n_iter=3, us=us)
    rmse = np.sqrt(np.mean((np.asarray(sm.means) - x) ** 2))
    _, sm0 = SM.smooth_iterated(cfg, state, jnp.asarray(y), n_iter=3,
                                us=jnp.zeros_like(us))
    rmse0 = np.sqrt(np.mean((np.asarray(sm0.means) - x) ** 2))
    assert rmse < 0.2, rmse                      # true controls: tight
    assert rmse < 0.8 * rmse0, (rmse, rmse0)     # zeroed controls: worse

    # batch arm: two trials with per-trial controls == per-trial smooth()
    yb = jnp.stack([jnp.asarray(y), jnp.asarray(y)], axis=1)
    ub = jnp.stack([us, jnp.zeros_like(us)], axis=1)
    _, smb = SM.smooth_batch(cfg, state, yb, us=ub, n_iter=3)
    np.testing.assert_allclose(np.asarray(smb.means[:, 0]),
                               np.asarray(sm.means), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(smb.means[:, 1]),
                               np.asarray(sm0.means), rtol=1e-7, atol=1e-9)


def test_gj_inverse_matches_linalg_inv():
    """The unrolled Gauss-Jordan inverse (r5: replaces batched
    lax.linalg solves in the hot scan path — see _gj_inverse's perf
    note) must match jnp.linalg.inv including cases that REQUIRE
    pivoting, in both dtypes."""
    from vjf_tpu.ops.pkalman import _gj_inverse

    rng = np.random.default_rng(7)
    m = np.eye(10) + 0.3 * rng.normal(size=(40, 10, 10))
    got = np.asarray(_gj_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(got, np.linalg.inv(m), rtol=1e-9,
                               atol=1e-11)
    # zero leading pivot: unpivoted elimination would divide by zero
    perm = np.array([[0.0, 1.0], [1.0, 0.0]])
    got = np.asarray(_gj_inverse(jnp.asarray(perm[None])))
    np.testing.assert_allclose(got, perm[None], atol=1e-15)
    # f32 batch, moderately conditioned SPD (the Laplace working regime)
    a = rng.normal(size=(64, 10, 10)).astype(np.float32) * 0.1
    spd = a @ np.swapaxes(a, -1, -2) + np.eye(10, dtype=np.float32)
    got32 = np.asarray(_gj_inverse(jnp.asarray(spd)))
    resid = got32 @ spd - np.eye(10, dtype=np.float32)
    assert np.abs(resid).max() < 1e-4
