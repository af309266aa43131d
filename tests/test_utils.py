"""Utility-layer tests: metrics stream, progress callback, debugging
toggles, config round-trip."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.utils import MetricsWriter, StepTimer, multiplex, progress_callback
from vjf_tpu.utils.debugging import assert_all_finite


def _result(key):
    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    ys = jax.random.normal(key, (5, 2, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((5, 2, 0), dtype=jnp.float64)
    return core.run_epoch(cfg, StepFlags(), state, ys, us, key, jnp.asarray(1e-3))


def test_metrics_writer(tmp_path, key):
    out = _result(key)
    path = str(tmp_path / "metrics.jsonl")
    writer = MetricsWriter(path)
    writer(0, 1.25, out)
    writer(1, 1.10, out)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["epoch"] == 0 and lines[1]["loss"] == pytest.approx(1.10)
    assert np.isfinite(lines[0]["recon"])


def test_progress_and_multiplex(key, capsys):
    out = _result(key)
    seen = []
    cb = multiplex(progress_callback(verbose=False), lambda e, l, r: seen.append((e, l)))
    cb(3, 0.5, out)
    assert seen == [(3, 0.5)]


def test_step_timer():
    t = StepTimer()
    t.start()
    t.tick(100, sync_scalar=jnp.asarray(1.0))
    assert t.steps == 100
    assert t.steps_per_sec > 0


def test_assert_all_finite(key):
    good = {"a": jnp.ones(3), "b": (jnp.zeros(2),)}
    assert_all_finite(good)  # no raise
    bad = {"a": jnp.asarray([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError, match="a"):
        assert_all_finite(bad, "state")


def test_config_replace_and_hash():
    cfg = VJFConfig(ydim=4, xdim=2)
    cfg2 = cfg.replace(lr=1e-3)
    assert cfg2.lr == 1e-3 and cfg.lr == 1e-4
    assert hash(cfg) != hash(cfg2)       # usable as a jit static
    assert cfg.feature_dim == cfg.n_rbf
    sgp = cfg.replace(dynamics="sgp", n_inducing=7)
    assert sgp.feature_dim == 7


def test_api_with_sgp_dynamics(key):
    """OO facade drives the SGP transition end-to-end."""
    from vjf_tpu import VJF

    model = VJF.make_model(8, 2, 0, n_rbf=8, hidden_sizes=[5],
                           likelihood="gaussian", dynamics="sgp",
                           n_inducing=12, sgp_lengthscale=0.8, dtype="float64")
    y = np.random.default_rng(0).normal(size=(40, 8))
    mu, logvar, loss = model.fit(y, max_iter=2)
    assert np.isfinite(loss)
    x, yhat = model.forecast(mu[0, 0], n_step=5)
    assert x.shape == (6, 1, 2)
    v = model.velocity(np.zeros((4, 2)))
    assert v.shape == (4, 2)


def test_forecast_rmse_rejects_short_sequences():
    """T < horizon + 2 used to produce NEGATIVE start indices that wrapped
    to the array end and returned plausible garbage; it must raise."""
    import jax
    import numpy as np
    import pytest as _pytest

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import vjf as core
    from vjf_tpu.utils.evaluation import forecast_rmse

    cfg = VJFConfig(ydim=4, xdim=2, udim=0, n_rbf=6, hidden_sizes=(4,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(jax.random.PRNGKey(0), cfg)
    T = 15
    mu = np.zeros((T, 2)); y = np.zeros((T, 4))
    with _pytest.raises(ValueError, match="horizon"):
        forecast_rmse(cfg, state, mu, y, jax.random.PRNGKey(1), horizon=20)


def test_sgp_adapt_jit_wrapper_is_cached():
    """A fresh jax.jit wrapper per epoch would retrace/recompile the
    hyperparameter step every post-warm-up epoch (and accumulate XLA:CPU
    executables, the trap-13 segfault class); the wrapper must be shared."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(4,),
                    likelihood="gaussian", dtype="float64", dynamics="sgp",
                    n_inducing=8, sgp_adapt_lr=1e-2)
    state = core.init_state(jax.random.PRNGKey(0), cfg)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(10, 1, 2)))
    us = jnp.zeros((10, 1, 0))
    core._sgp_adapt_step(cfg, state, q, us)
    first = core._ADAPT_JIT[0]
    core._sgp_adapt_step(cfg, state, q, us)
    assert core._ADAPT_JIT[0] is first and len(core._ADAPT_JIT) == 1


def test_compile_cache_enable_and_env_gate(tmp_path, monkeypatch):
    """utils.compile_cache: explicit enable configures jax's persistent
    compilation cache at the requested path; the env-gated hook is a no-op
    without $VJF_COMPILE_CACHE, uses a path-like value as the directory,
    and maps bare truthy values to the default cache location."""
    import jax

    from vjf_tpu.utils import compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    try:
        p = cc.enable_compilation_cache(str(tmp_path / "xla"),
                                        min_compile_secs=60.0)
        assert p == str(tmp_path / "xla")
        assert jax.config.jax_compilation_cache_dir == p
        import os
        assert os.path.isdir(p)

        monkeypatch.delenv("VJF_COMPILE_CACHE", raising=False)
        assert cc.maybe_enable_from_env() is None

        monkeypatch.setenv("VJF_COMPILE_CACHE", str(tmp_path / "xla2"))
        assert cc.maybe_enable_from_env() == str(tmp_path / "xla2")

        monkeypatch.setattr(cc, "_DEFAULT_DIR", str(tmp_path / "dflt"))
        monkeypatch.setenv("VJF_COMPILE_CACHE", "1")
        assert cc.maybe_enable_from_env() == str(tmp_path / "dflt")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
