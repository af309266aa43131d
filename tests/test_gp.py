"""Sparse-GP dynamics tests — including a port of the reference's own
``test/test_sgp.py`` flow (which documents the API of the missing vjf.gp
module), plus regression-quality and VJF-integration checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor
from vjf_tpu.gp import SGP, covfun
from vjf_tpu.gp import sgp as sgp_mod
from vjf_tpu.models import vjf as core


@pytest.mark.parametrize("n, m, xdim, ydim", [(10, 5, 3, 2)])
def test_sgp_reference_flow(n, m, xdim, ydim):
    """Mirrors test_sgp.py:5-22: linear data, SE kernel, init/predict/fit."""
    rng = np.random.default_rng(0)
    A = rng.normal(size=(xdim, ydim))
    x = rng.normal(size=(n, xdim))
    y = x @ A
    inducing = rng.normal(size=(m, xdim))
    cf = covfun.SquaredExponential(1.0, 0.1)
    sgp = SGP(xdim, ydim, 0, cf, noise_var=0.0, f_cov="I", inducing=inducing)
    sgp.initialize()
    sgp.predict(x)
    sgp.fit(x, y)
    g = sgp.predict(x)
    assert g.mean.shape == (n, ydim)
    assert np.all(np.isfinite(np.asarray(g.mean)))


def test_sgp_regression_quality():
    """With a sane lengthscale and enough inducing points, the SGP must
    actually fit a smooth function."""
    rng = np.random.default_rng(1)
    x = np.linspace(-2, 2, 200)[:, None]
    y = np.sin(2 * x)
    inducing = np.linspace(-2, 2, 30)[:, None]
    sgp = SGP(1, 1, 0, covfun.SquaredExponential(1.0, 0.5),
              noise_var=1e-3, inducing=inducing)
    sgp.fit(x, y)
    pred = np.asarray(sgp.predict(x).mean)
    rmse = np.sqrt(np.mean((pred - y) ** 2))
    assert rmse < 0.05, rmse
    # predictive variance grows away from data (DTC correction)
    far = np.asarray(sgp.predict(np.array([[10.0]])).logvar)
    near = np.asarray(sgp.predict(np.array([[0.0]])).logvar)
    assert far > near


def test_sgp_fit_accumulates():
    """Repeated fit() calls accumulate evidence (online-composable)."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-2, 2, size=(100, 1))
    y = np.cos(x)
    inducing = np.linspace(-2, 2, 20)[:, None]
    sgp = SGP(1, 1, 0, covfun.SquaredExponential(1.0, 0.7),
              noise_var=1e-2, inducing=inducing)
    for i in range(0, 100, 10):
        sgp.fit(x[i:i+10], y[i:i+10])
    pred = np.asarray(sgp.predict(x).mean)
    assert np.sqrt(np.mean((pred - y) ** 2)) < 0.1


def test_matern():
    k = covfun.Matern52(1.3, 0.8)
    x = np.random.default_rng(0).normal(size=(7, 2))
    K = np.asarray(k(x, x))
    np.testing.assert_allclose(np.diag(K), 1.3**2, rtol=1e-6)
    assert np.all(np.linalg.eigvalsh(K) > -1e-9)


def test_vjf_with_sgp_dynamics(key):
    """Full VJF loop with the SGP transition (BASELINE config #3 shape)."""
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dynamics="sgp", n_inducing=16,
                    sgp_lengthscale=0.7, dtype="float64", lr=1e-3)
    state = core.init_state(key, cfg)
    T, B = 40, 2
    ys = jax.random.normal(key, (T, B, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((T, B, 0), dtype=jnp.float64)
    out = core.run_epoch(cfg, StepFlags(), state, ys, us, key, jnp.asarray(1e-3))
    assert np.all(np.isfinite(np.asarray(out.metrics.loss)))
    assert int(out.state.dynamics.n_sample) == min(500, T * B) or int(out.state.dynamics.n_sample) > 0

    # fit loop incl. warm-up initialize path
    result = core.fit(cfg, state, ys, key=key, max_iter=3)
    assert np.isfinite(result.loss)

    # forecast
    x, yf = core.forecast(cfg, result.state, jnp.zeros((1, 2)), key, n_step=10)
    assert x.shape == (11, 1, 2)


def test_sgp_dynamics_initialize(key):
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    dynamics="sgp", n_inducing=32, sgp_lengthscale=1.0,
                    dtype="float64")
    state = sgp_mod.init_sgp_dynamics(key, cfg)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=(300, 2)))
    u = None
    xt = xs + 0.05 * (-xs)
    new = sgp_mod.dynamics_initialize(cfg, key, state, xt, xs, u)
    pred = sgp_mod.transition_gaussian(new, xs, u).mean
    err = float(jnp.sqrt(jnp.mean(jnp.square(pred - xt))))
    base = float(jnp.sqrt(jnp.mean(jnp.square(xs - xt))))
    assert err < 0.5 * base


def test_sgp_hyperparam_adaptation_improves_nll(key):
    """adapt_hyperparams must reduce the predictive NLL and move a badly
    mis-set lengthscale toward the data's scale (r1: the hypers were dead
    state fields)."""
    cfg = VJFConfig(ydim=8, xdim=1, udim=0, dynamics="sgp", n_inducing=24,
                    sgp_scale=1.0, sgp_lengthscale=3.0,   # way too long
                    dtype="float64", sgp_adapt_lr=0.1, sgp_adapt_steps=20)
    state = sgp_mod.init_sgp_dynamics(key, cfg)
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(400, 1)))
    xt = xs + 0.3 * jnp.sin(5.0 * xs)        # short-lengthscale velocity field
    # give the weights something to work with first
    state = sgp_mod.dynamics_update(cfg, state, xt, xs)

    theta0 = (state.log_scale, state.log_lengthscale)
    nll0 = float(sgp_mod.hyperparam_nll(state, theta0, np.asarray(xs), np.asarray(xt - xs)))
    new = sgp_mod.adapt_hyperparams(cfg, state, xt, xs)
    nll1 = float(sgp_mod.hyperparam_nll(
        new, (new.log_scale, new.log_lengthscale), np.asarray(xs), np.asarray(xt - xs)))
    assert nll1 < nll0
    assert float(new.log_lengthscale) < float(state.log_lengthscale)


def test_sgp_adapt_reprojection_preserves_posterior(key):
    """With zero adaptation steps the re-whitening reprojection is the
    identity; with a hyper CHANGE, the posterior mean AT THE INDUCING POINTS
    must be preserved exactly (f(Z) = W^{-1} v is basis-free)."""
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, dynamics="sgp", n_inducing=12,
                    sgp_lengthscale=0.8, dtype="float64", sgp_adapt_lr=0.05,
                    sgp_adapt_steps=3)
    state = sgp_mod.init_sgp_dynamics(key, cfg)
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(size=(100, 2)))
    xt = xs + 0.1 * (-xs)
    state = sgp_mod.dynamics_update(cfg, state, xt, xs)

    same = sgp_mod.adapt_hyperparams(cfg, state, xt, xs, n_steps=0)
    np.testing.assert_allclose(np.asarray(same.blr.w_mean),
                               np.asarray(state.blr.w_mean), rtol=1e-9)

    new = sgp_mod.adapt_hyperparams(cfg, state, xt, xs)
    f_z_old = np.asarray(state.whiten_inv @ state.blr.w_mean)
    f_z_new = np.asarray(new.whiten_inv @ new.blr.w_mean)
    np.testing.assert_allclose(f_z_new, f_z_old, rtol=1e-8, atol=1e-10)
    # the precision factorization stays consistent: P' (U' U'^T) ~= I
    u = np.asarray(new.blr.prec_chol_inv_t)
    pv = np.asarray(new.blr.precision) @ (u @ u.T)
    np.testing.assert_allclose(pv, np.eye(pv.shape[0]), atol=1e-6)


def test_sgp_ring_attractor_recovery(key):
    """BASELINE config #3 with a quality gate: VJF + SGP dynamics on a ring
    attractor must recover the latent trajectory (affine-aligned R^2) and
    the learned velocity field must point inward outside the ring."""
    T = 600
    x = ring_attractor(T=T)
    y, _, _ = linear_gaussian_observations(x, 12, obs_noise=0.1, seed=7)

    cfg = VJFConfig(ydim=12, xdim=2, udim=0, dynamics="sgp", n_inducing=30,
                    sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
                    dtype="float64", lr=1e-3, sgp_adapt_lr=0.02,
                    rtol=2e-3)   # coarser plateau: warm-up must END in-test
    state = core.init_state(key, cfg)
    result = core.fit(cfg, state, y, key=key, max_iter=60)
    assert not result.warm_up, "warm-up never ended; RLS never ran"
    m = np.asarray(result.mu[:, 0, :])

    X = np.concatenate([m, np.ones((T, 1))], axis=1)
    A, *_ = np.linalg.lstsq(X, x, rcond=None)
    r2 = 1 - np.sum((X @ A - x) ** 2) / np.sum((x - x.mean(0)) ** 2)
    assert r2 > 0.8, r2

    # velocity field sanity: just OUTSIDE the learned ring (still within the
    # kernel's reach — far away a zero-mean GP correctly predicts zero
    # velocity), motion points inward on average
    ring = m[T // 2 :][::40]                     # points on the learned ring
    probe = 1.35 * ring
    s = np.asarray(sgp_mod.transition_gaussian(result.state.dynamics,
                                               jnp.asarray(probe), None).mean) - probe
    radial = np.sum(s * probe, axis=-1)          # <x, dx>: negative = inward
    assert np.mean(radial) < 0, radial


def test_fit_demotes_mega_on_hot_tau(key, caplog):
    """Hot-tau auto-demotion (models/vjf.py:fit): small-batch SGP keeps the
    NSV trace bound above the mega kernel's escalation ceiling, so fit must
    detect the reported tau, demote to the XLA epoch, re-run from the
    pre-epoch state, and finish finite. fused_step='on' forces the fused
    path past the small-batch routing so the demotion machinery itself is
    exercised (interpret mode on CPU)."""
    import logging

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
        result = core.fit(cfg, state, y, key=key, max_iter=8, donate=False)
    assert not result.warm_up, "warm-up never ended; the mega path never ran"
    assert np.isfinite(result.loss)
    assert np.all(np.isfinite(np.asarray(result.state.dynamics.blr.precision)))
    assert any("demoting" in r.message for r in caplog.records), (
        "expected the hot-tau demotion to fire for B=1 SGP; tau regime "
        "may have drifted — check ns_prefix/threshold assumptions"
    )


def test_whiten_matrices_properties(key):
    """The floored symmetric whitener must satisfy the properties the f32
    fused path depends on: bounded |phi(x)|^2 <= k(x,x) (the DTC
    inequality — violated 277x by the unfloored f32 eigh, CLAUDE.md #11),
    W W^{-1} = I on the floored spectrum, and symmetry."""
    rng = np.random.default_rng(0)
    for dtype, tol in ((jnp.float64, 1e-8), (jnp.float32, 2e-2)):
        z = jnp.asarray(rng.uniform(-2, 2, size=(50, 2)), dtype)
        cf = covfun.SquaredExponential(1.0, 1.0)
        kzz = cf(z, z).astype(dtype)
        w, w_inv = sgp_mod.whiten_matrices(kzz)
        asym_tol = (1e-12 if dtype == jnp.float64 else 1e-5) * float(jnp.abs(w).max())
        np.testing.assert_allclose(np.asarray(w), np.asarray(w.T), atol=asym_tol)
        np.testing.assert_allclose(np.asarray(w @ w_inv), np.eye(50),
                                   atol=max(tol, 1e-5))
        x = jnp.asarray(rng.uniform(-3, 3, size=(200, 2)), dtype)
        kxz = cf(x, z).astype(dtype)
        phi = kxz @ w
        phi2 = np.asarray(jnp.sum(phi * phi, axis=-1))
        kxx = 1.0  # SE scale = 1
        assert phi2.max() <= kxx * (1 + tol), (dtype, phi2.max())
