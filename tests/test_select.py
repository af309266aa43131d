"""Forecast-gated model selection (``cfg.select='forecast'``).

The one-step filtering objective makes long-horizon forecast skill peak
BEFORE the loss plateau (measured three independent ways — docs/RESULTS.md
"Task quality"); ``select='forecast'`` snapshots the best-rollout state
per epoch and returns it instead of the final one. These tests pin:

* training is BIT-identical to ``select='loss'`` (the selection PRNG
  stream is folded out of the fit key, never split from it);
* the reported metric is reproducible from the documented key formula
  (``fold_in(fold_in(key, _SELECT_SALT), epoch)``);
* selection is argmin: the snapshot's metric is <= the final state's
  under matched per-epoch keys;
* ensemble member k == solo fit k, selection fields included;
* the validation surface (masks, short series, bad knob values).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vjf_tpu.config import VJFConfig
from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor
from vjf_tpu.models import vjf as core


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _data(t_len=160, seed=3):
    x = ring_attractor(T=t_len)
    y, _, _ = linear_gaussian_observations(
        x, 12, obs_noise=0.1, intercept=False, seed=seed
    )
    return y.astype(np.float32)


_BASE = dict(ydim=12, xdim=2, udim=0, n_rbf=30, likelihood="gaussian",
             dtype="float32", rls_backend="nsv", fused_step="off",
             lr=1e-3, warmup_max=5, rtol=1e-6)


def test_select_forecast_training_identical_and_snapshot(key):
    y = _data()
    cfg_l = VJFConfig(**_BASE)
    cfg_f = cfg_l.replace(select="forecast", select_horizon=10,
                          select_starts=8)

    losses_l, losses_f = [], []
    rl = core.fit(cfg_l, core.init_state(key, cfg_l), y, key=key,
                  max_iter=12, donate=False,
                  callback=lambda e, l, r: losses_l.append(l))
    rf = core.fit(cfg_f, core.init_state(key, cfg_f), y, key=key,
                  max_iter=12, donate=False,
                  callback=lambda e, l, r: losses_f.append(l))

    # selection must not perturb the training chain (fold_in, not split)
    assert losses_l == losses_f
    assert rl.selected_epoch is None and np.isnan(rl.selected_metric)
    assert rf.selected_epoch is not None

    # the reported metric reproduces from the documented key formula
    sel_base = jax.random.fold_in(key, core._SELECT_SALT)
    ys = jnp.asarray(y)[:, None, :]
    us = jnp.zeros((y.shape[0], 1, 0), jnp.float32)
    m = float(core.rollout_rmse(
        cfg_f, rf.state, rf.mu, ys, us,
        jax.random.fold_in(sel_base, rf.selected_epoch),
    ))
    np.testing.assert_allclose(m, rf.selected_metric, rtol=1e-6)

    # argmin property: the final (plateau-default) state's metric under
    # its own epoch key cannot beat the selected snapshot
    m_final = float(core.rollout_rmse(
        cfg_l, rl.state, rl.mu, ys, us,
        jax.random.fold_in(sel_base, rl.epochs_run - 1),
    ))
    assert rf.selected_metric <= m_final + 1e-9


def test_select_forecast_blocked(key):
    y = _data()
    cfg = VJFConfig(**_BASE, select="forecast", select_horizon=10,
                    select_starts=8)
    rb = core.fit(cfg, core.init_state(key, cfg), y, key=key, max_iter=12,
                  epochs_per_dispatch=4)
    assert rb.selected_epoch is not None
    # block granularity: snapshots land on block-final epochs only
    assert (rb.selected_epoch + 1) % 4 == 0
    sel_base = jax.random.fold_in(key, core._SELECT_SALT)
    ys = jnp.asarray(y)[:, None, :]
    us = jnp.zeros((y.shape[0], 1, 0), jnp.float32)
    m = float(core.rollout_rmse(
        cfg, rb.state, rb.mu, ys, us,
        jax.random.fold_in(sel_base, rb.selected_epoch),
    ))
    np.testing.assert_allclose(m, rb.selected_metric, rtol=1e-6)


def test_select_forecast_ensemble_member_matches_solo(key):
    from vjf_tpu.parallel import ensemble as ens
    from vjf_tpu.parallel.replicated import init_ensemble

    y = _data(t_len=140).astype(np.float64)
    cfg = VJFConfig(**{**_BASE, "dtype": "float64", "warmup_max": 4},
                    select="forecast", select_horizon=10, select_starts=8)
    states = init_ensemble(jax.random.PRNGKey(5), cfg, 3)
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    res = ens.fit_ensemble(cfg, states, y, keys=keys, max_iter=10)
    assert res.selected_epoch is not None

    st1 = jax.tree.map(lambda a: a[1], states)
    solo = core.fit(cfg, st1, y, key=keys[1], max_iter=10, donate=False)
    assert solo.selected_epoch == int(res.selected_epoch[1])
    np.testing.assert_allclose(float(res.selected_metric[1]),
                               solo.selected_metric, rtol=1e-8)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.tree.map(lambda x: x[1], res.states)),
        jax.tree_util.tree_leaves(solo.state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.mu[1]), np.asarray(solo.mu),
                               rtol=1e-6, atol=1e-9)

    # blocked ensemble == blocked solo, selection included
    resb = ens.fit_ensemble(cfg, states, y, keys=keys, max_iter=8,
                            epochs_per_dispatch=4)
    solob = core.fit(cfg, st1, y, key=keys[1], max_iter=8,
                     epochs_per_dispatch=4)
    assert solob.selected_epoch == int(resb.selected_epoch[1])
    np.testing.assert_allclose(float(resb.selected_metric[1]),
                               solob.selected_metric, rtol=1e-8)


def test_select_forecast_facade(key):
    from vjf_tpu.api import VJF

    y = _data()
    model = VJF.make_model(ydim=12, xdim=2, udim=0, n_rbf=30,
                           likelihood="gaussian", dtype="float32",
                           rls_backend="nsv", fused_step="off", lr=1e-3,
                           warmup_max=5, rtol=1e-6, select="forecast",
                           select_horizon=10, select_starts=8, seed=0)
    model.fit(y, max_iter=10)
    assert model.selected_epoch is not None
    assert np.isfinite(model.selected_metric)


def test_select_validation_errors(key):
    y = _data()
    cfg = VJFConfig(**_BASE, select="forecast")
    st = core.init_state(key, cfg)
    with pytest.raises(ValueError, match="unmasked"):
        core.fit(cfg, st, y, key=key, max_iter=2,
                 mask=np.ones(y.shape[0], np.float32))
    with pytest.raises(ValueError, match="unmasked"):
        core.fit(cfg, st, y, key=key, max_iter=2,
                 channel_mask=np.ones((y.shape[0], 12), np.float32))
    short = y[: cfg.select_horizon]  # < horizon + 2
    with pytest.raises(ValueError, match="select_horizon"):
        core.fit(cfg, st, short, key=key, max_iter=2)
    with pytest.raises(ValueError, match="unknown cfg.select"):
        core.fit(cfg.replace(select="bogus"), st, y, key=key, max_iter=2)


def test_select_composes_with_relaxed_sync(key):
    """select='forecast' on the relaxed-sync mesh path (sync_every != 1):
    run_epoch_sync_every returns the consistent POST-MERGE state, so the
    per-epoch snapshot is well-defined — and it is the measured rescue
    for relaxed sync's forecast damage (VdP K=8 fc 12.2 -> 0.43,
    docs/RESULTS.md). This pins the composition executes and selects."""
    from vjf_tpu.parallel import make_mesh

    y = _data(t_len=128)
    yb = np.repeat(y[:, None, :], 8, axis=1)
    cfg = VJFConfig(**{**_BASE, "warmup_max": 3},
                    sync_every=16, rls_shrink=0.999, chol_jitter=1e-3,
                    select="forecast", select_horizon=10, select_starts=8)
    mesh = make_mesh(8, axis_names=("dp",))
    res = core.fit(cfg, core.init_state(key, cfg), yb, key=key,
                   max_iter=8, mesh=mesh)
    assert res.selected_epoch is not None
    assert np.isfinite(res.selected_metric)
    assert np.all(np.isfinite(np.asarray(res.mu)))
