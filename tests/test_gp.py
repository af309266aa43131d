"""Sparse-GP dynamics tests — including a port of the reference's own
``test/test_sgp.py`` flow (which documents the API of the missing vjf.gp
module), plus regression-quality and VJF-integration checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
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
