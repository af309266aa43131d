"""Held-out-channel (co-smoothing) evaluation — ``models/evaluate.py``.

The reference scores only latent recovery on synthetic data
(``/root/reference/script/example.py:60-88``); this module's protocol —
smooth from observed channels, score predictions of channels the model
never saw — is the capability a real-data user needs. Tests pin:
no-peeking (held-out values influence scoring only, never inference),
bits/spike > 0 for a good model on synthetic Poisson data, the Gaussian
variant, batch == per-trial, and argument validation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import VJFConfig
from vjf_tpu.models import dynamics as dyn
from vjf_tpu.models import evaluate as EV
from vjf_tpu.models import vjf as core


def _rotation_latent(rng, T, xdim=2, th=0.12, damp=0.98, q=0.05):
    A = damp * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x = np.zeros((T, xdim))
    x[0] = [1.0, 0.0]
    for t in range(T - 1):
        x[t + 1] = A @ x[t] + q * rng.normal(size=xdim)
    return x


def _installed_state(key, cfg, x, C, d):
    """True decoder + dynamics fitted to the true latent pairs (the pattern
    of tests/test_pkalman.py — isolates the evaluation from training)."""
    state = core.init_state(key, cfg)
    return state._replace(
        params=state.params._replace(
            decoder=type(state.params.decoder)(jnp.asarray(C), jnp.asarray(d))
        ),
        dynamics=dyn.dynamics_initialize(
            cfg, key, state.dynamics, jnp.asarray(x[1:]), jnp.asarray(x[:-1])
        ),
    )


def _poisson_setup(key, seed=8, T=300, ydim=30):
    rng = np.random.default_rng(seed)
    x = _rotation_latent(rng, T)
    C = rng.normal(size=(ydim, 2))
    d = np.full(ydim, 0.3)
    lam = np.exp(np.clip(x @ C.T + d, None, 5))
    y = rng.poisson(lam).astype(np.float64)
    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=32, hidden_sizes=(8,),
                    likelihood="poisson", dtype="float64")
    return cfg, _installed_state(key, cfg, x, C, d), y


def test_heldout_eval_poisson_bits_per_spike(key):
    cfg, state, y = _poisson_setup(key)
    held = [2, 7, 11, 19, 28]
    res = EV.heldout_eval(cfg, state, y, held)
    assert list(res.heldout) == held
    assert res.eta.shape == (y.shape[0], len(held))
    assert np.isfinite(float(res.loglik))
    # a model with the true decoder and a fitted transition must beat the
    # constant-mean-rate null on channels it never observed
    assert float(res.loglik) > float(res.loglik_null)
    assert float(res.bits_per_spike) > 0.05, float(res.bits_per_spike)
    assert float(res.r2) > 0.0

    # boolean-mask spec is equivalent to index spec
    mask = np.zeros(cfg.ydim, dtype=bool)
    mask[held] = True
    res_b = EV.heldout_eval(cfg, state, y, mask)
    np.testing.assert_array_equal(np.asarray(res_b.pred), np.asarray(res.pred))


def test_heldout_eval_never_peeks(key):
    """Held-out VALUES feed scoring only: corrupting them changes no
    prediction and no latent (the smoother sees an exact-missing channel)."""
    cfg, state, y = _poisson_setup(key)
    held = [0, 5, 9]
    res = EV.heldout_eval(cfg, state, y, held)
    y_bad = y.copy()
    y_bad[:, held] = 999.0
    res_bad = EV.heldout_eval(cfg, state, y_bad, held)
    np.testing.assert_array_equal(np.asarray(res_bad.pred),
                                  np.asarray(res.pred))
    np.testing.assert_array_equal(np.asarray(res_bad.smoothed_means),
                                  np.asarray(res.smoothed_means))
    # ... while the scores DO consume the stored values
    assert float(res_bad.loglik) != float(res.loglik)


def test_heldout_eval_gaussian(key):
    rng = np.random.default_rng(3)
    T, ydim = 300, 20
    x = _rotation_latent(rng, T)
    C = rng.normal(size=(ydim, 2))
    d = rng.normal(size=ydim) * 0.1
    y = x @ C.T + d + 0.1 * rng.normal(size=(T, ydim))
    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=32, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float64")
    state = _installed_state(key, cfg, x, C, d)
    # match the generator's observation noise (var 0.01)
    state = state._replace(params=state.params._replace(
        likelihood=type(state.params.likelihood)(
            jnp.asarray(np.log(0.01)))))
    res = EV.heldout_eval(cfg, state, y, [1, 8, 15])
    assert res.bits_per_spike is None
    assert float(res.loglik) > float(res.loglik_null)
    assert float(res.r2) > 0.5, float(res.r2)


def test_heldout_eval_batch_matches_per_trial(key):
    cfg, state, y = _poisson_setup(key, T=120)
    rng = np.random.default_rng(11)
    yb = np.stack([y, rng.permutation(y), y[::-1].copy()], axis=1)  # (T,3,yd)
    held = [4, 13]
    res_b = EV.heldout_eval(cfg, state, yb, held, n_iter=3)
    assert res_b.pred.shape == (120, 3, 2)
    per = [EV.heldout_eval(cfg, state, yb[:, i], held, n_iter=3)
           for i in range(3)]
    np.testing.assert_allclose(
        np.asarray(res_b.pred),
        np.stack([np.asarray(p.pred) for p in per], axis=1),
        rtol=1e-10, atol=1e-12,
    )
    # pooled loglik == sum of per-trial logliks
    np.testing.assert_allclose(
        float(res_b.loglik), sum(float(p.loglik) for p in per), rtol=1e-10)


def test_heldout_eval_validation(key):
    cfg, state, y = _poisson_setup(key, T=60)
    with pytest.raises(ValueError, match="no channels"):
        EV.heldout_eval(cfg, state, y, np.array([], dtype=int))
    with pytest.raises(ValueError, match="every channel"):
        EV.heldout_eval(cfg, state, y, np.arange(cfg.ydim))
    with pytest.raises(ValueError, match="in \\[0"):
        EV.heldout_eval(cfg, state, y, [cfg.ydim])
    with pytest.raises(ValueError, match="shape"):
        EV.heldout_eval(cfg, state, y, np.ones(3, dtype=bool))


def test_heldout_eval_with_dropout_mask(key):
    """channel_mask composes with heldout: inference sees observed AND not
    held out; scores run over observed held-out entries only (a held-out
    entry that was never recorded contributes nothing — its stored value
    may be anything, including NaN)."""
    cfg, state, y = _poisson_setup(key, T=150)
    held = [3, 12, 20]
    rng = np.random.default_rng(17)
    cm = (rng.uniform(size=y.shape) > 0.25).astype(np.float64)

    res = EV.heldout_eval(cfg, state, y, held, channel_mask=cm, n_iter=3)
    assert np.isfinite(float(res.loglik))
    assert float(res.loglik) > float(res.loglik_null)

    # dropped held-out entries are fully inert: corrupt them (NaN) — every
    # output is unchanged, predictions AND scores
    y_bad = y.copy()
    drop_h = cm[:, held] == 0
    assert drop_h.any()
    yh = y_bad[:, held]
    yh[drop_h] = np.nan
    y_bad[:, held] = yh
    res_bad = EV.heldout_eval(cfg, state, y_bad, held, channel_mask=cm,
                              n_iter=3)
    np.testing.assert_array_equal(np.asarray(res_bad.pred),
                                  np.asarray(res.pred))
    np.testing.assert_array_equal(np.asarray(res_bad.loglik),
                                  np.asarray(res.loglik))

    # all-ones mask == no mask
    res_ones = EV.heldout_eval(cfg, state, y, held,
                               channel_mask=np.ones_like(y), n_iter=3)
    res_none = EV.heldout_eval(cfg, state, y, held, n_iter=3)
    np.testing.assert_array_equal(np.asarray(res_ones.pred),
                                  np.asarray(res_none.pred))
    np.testing.assert_allclose(float(res_ones.loglik),
                               float(res_none.loglik), rtol=1e-12)

    # shape validation
    with pytest.raises(ValueError, match="channel_mask"):
        EV.heldout_eval(cfg, state, y, held, channel_mask=np.ones((3, 3)))


def test_heldout_eval_sgp_dynamics(key):
    """evaluate rides the shared transition interface — SGP included."""
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=12, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float32", dynamics="sgp",
                    rls_backend="nsv")
    state = core.init_state(key, cfg)
    rng = np.random.default_rng(1)
    y = rng.normal(size=(30, 8)).astype(np.float32)
    res = EV.heldout_eval(cfg, state, y, [2, 6], n_iter=2)
    assert res.pred.shape == (30, 2)
    assert np.all(np.isfinite(np.asarray(res.pred)))


def test_kfold_channel_eval(key):
    """Every channel scored exactly once; pooled scores add up; pooled
    bits/spike weights folds by their spikes (total gain / total spikes)."""
    cfg, state, y = _poisson_setup(key, T=120)
    res = EV.kfold_channel_eval(cfg, state, y, n_folds=5, n_iter=2)
    cover = np.concatenate([f.heldout for f in res.folds])
    assert sorted(cover.tolist()) == list(range(cfg.ydim))
    np.testing.assert_allclose(
        res.loglik, sum(float(f.loglik) for f in res.folds), rtol=1e-12)
    total_spk = sum(float(f.n_spikes) for f in res.folds)
    assert total_spk == float(np.sum(y))
    expect_bits = (res.loglik - res.loglik_null) / (total_spk * np.log(2.0))
    np.testing.assert_allclose(res.bits_per_spike, expect_bits, rtol=1e-12)
    # a true-decoder model beats the null over the whole population
    assert res.bits_per_spike > 0.0
    assert res.r2.shape == (5,)

    with pytest.raises(ValueError, match="n_folds"):
        EV.kfold_channel_eval(cfg, state, y, n_folds=1)


def test_heldout_default_n_iter_shape_invariant(key):
    """ADVICE r2 (medium): default n_iter resolves ONCE in heldout_eval —
    the same data as (T, ydim) and (T, 1, ydim) scores identically with
    n_iter unspecified (previously 3 vs 8 for Poisson)."""
    cfg, state, y = _poisson_setup(key, T=100)
    held = [4, 13]
    res_2d = EV.heldout_eval(cfg, state, y, held)
    res_3d = EV.heldout_eval(cfg, state, y[:, None, :], held)
    np.testing.assert_allclose(
        np.asarray(res_3d.pred)[:, 0], np.asarray(res_2d.pred),
        rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(res_3d.loglik), float(res_2d.loglik),
                               rtol=1e-10)


def test_heldout_mesh_with_2d_raises(key):
    """ADVICE r2 (low): mesh= only applies to batched input — silent
    unsharded execution is replaced by a loud error."""
    cfg, state, y = _poisson_setup(key, T=40)
    from vjf_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="mesh"):
        EV.heldout_eval(cfg, state, y, [2, 5], mesh=make_mesh(1))


def test_heldout_gaussian_null_floor_single_entry(key):
    """ADVICE r2 (low): a held-out channel with ONE observed entry must not
    hand the null a near-zero variance (+13 nats/entry). The null variance
    is floored at 1% of the pooled held-out variance."""
    rng = np.random.default_rng(9)
    T, ydim = 120, 12
    x = _rotation_latent(rng, T)
    C = rng.normal(size=(ydim, 2))
    d = np.zeros(ydim)
    y = x @ C.T + d + 0.1 * rng.normal(size=(T, ydim))
    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=16, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64")
    state = _installed_state(key, cfg, x, C, d)
    state = state._replace(params=state.params._replace(
        likelihood=type(state.params.likelihood)(jnp.asarray(np.log(0.01)))))
    held = [1, 7]
    cm = np.ones_like(y)
    cm[1:, 7] = 0.0     # channel 7: exactly one observed entry
    res = EV.heldout_eval(cfg, state, y, held, channel_mask=cm, n_iter=1)
    assert np.isfinite(float(res.loglik_null))
    # the one-entry channel's null no longer scores ~+13 nats: the model
    # (true decoder, matched noise) still beats the null overall
    assert float(res.loglik) > float(res.loglik_null)


def test_oo_api_evaluate_facade(key):
    from vjf_tpu.api import VJF

    rng = np.random.default_rng(5)
    y = rng.poisson(1.0, size=(80, 12)).astype(np.float64)
    model = VJF.make_model(12, 2, n_rbf=8, hidden_sizes=[6],
                          likelihood="poisson", dtype="float64")
    res = model.evaluate(y, heldout=[3, 9], n_iter=2)
    assert res.pred.shape == (80, 2)
    assert np.all(np.isfinite(np.asarray(res.pred)))
    assert np.isfinite(float(res.loglik))


def test_kfold_vmapped_matches_sequential(key):
    """The one-dispatch fold-vmapped k-fold equals the sequential fold
    loop (fold f just rides the smoother's trial axis with its channel
    mask) — 2-d and batched input, with and without a recording dropout
    mask."""
    cfg, state, y = _poisson_setup(key, T=80)
    rng = np.random.default_rng(5)
    cm = (rng.random((80, cfg.ydim)) > 0.1).astype(np.float64)

    for ys in (y, np.stack([y, y * (rng.random(y.shape) > 0.5)], axis=1)):
        for mask in (None, cm):
            rv = EV.kfold_channel_eval(cfg, state, ys, n_folds=3, n_iter=2,
                                       channel_mask=mask, vmap_folds=True)
            rs = EV.kfold_channel_eval(cfg, state, ys, n_folds=3, n_iter=2,
                                       channel_mask=mask, vmap_folds=False)
            np.testing.assert_allclose(rv.loglik, rs.loglik,
                                       rtol=1e-8, atol=1e-8)
            np.testing.assert_allclose(rv.loglik_null, rs.loglik_null,
                                       rtol=1e-10, atol=1e-10)
            np.testing.assert_allclose(rv.bits_per_spike, rs.bits_per_spike,
                                       rtol=1e-6, atol=1e-9)
            np.testing.assert_allclose(rv.r2, rs.r2, rtol=1e-7, atol=1e-9)
            for fv, fs in zip(rv.folds, rs.folds):
                np.testing.assert_array_equal(fv.heldout, fs.heldout)
                np.testing.assert_allclose(np.asarray(fv.pred),
                                           np.asarray(fs.pred),
                                           rtol=1e-7, atol=1e-9)
