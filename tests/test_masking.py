"""Ragged-trial (mask) support — beyond the reference, which trains only
lockstep batches (``vjf/model.py:183,253``). Contracts under test:

* padding invariance: a padded+masked run computes exactly the same
  training trajectory as the unpadded run, with the posterior carry frozen
  over the pad — even when the padding is NaN (inputs are sanitized);
* a fully-masked trial is equivalent to not batching it at all (zero
  feature rows contribute nothing to the RLS statistics; weighted means
  renormalize over the valid count);
* end-to-end: fit() on two unequal-length trials recovers both latents,
  with the warm-up bootstrap excluding frozen-carry pairs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.utils.evaluation import latent_r2


@pytest.fixture
def key():
    return jax.random.PRNGKey(11)


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7):
    ok = jax.tree_util.tree_map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else
        np.array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )
    return all(jax.tree_util.tree_leaves(ok))


def _cfg(**kw):
    base = dict(ydim=8, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                likelihood="gaussian", dtype="float32", rls_backend="nsv",
                fused_step="off")
    base.update(kw)
    return VJFConfig(**base)


@pytest.mark.parametrize("pad_value", [0.0, np.nan])
def test_padding_invariance_b1(key, pad_value):
    """Padded-and-masked == unpadded, bit-for-bit on the valid prefix,
    frozen carry + zero metrics on the pad — NaN padding included."""
    cfg = _cfg()
    t0, t_pad = 40, 60
    k1, k2 = jax.random.split(key)
    y_valid = jax.random.normal(k1, (t0, 1, cfg.ydim), jnp.float32)
    y_pad = jnp.full((t_pad - t0, 1, cfg.ydim), pad_value, jnp.float32)
    ys = jnp.concatenate([y_valid, y_pad])
    us_p = jnp.zeros((t_pad, 1, 0), jnp.float32)
    eps = jax.random.normal(k2, (t_pad, 2, 1, cfg.xdim), jnp.float32)
    mask = jnp.concatenate([jnp.ones((t0, 1)), jnp.zeros((t_pad - t0, 1))])

    state = core.init_state(key, cfg)
    flags = StepFlags()
    ref = core.run_epoch(cfg, flags, state, y_valid, us_p[:t0], key,
                         jnp.float32(cfg.lr), noise=(eps[:t0, 0], eps[:t0, 1]))
    got = core.run_epoch(cfg, flags, state, ys, us_p, key,
                         jnp.float32(cfg.lr), noise=(eps[:, 0], eps[:, 1]),
                         mask=mask)

    assert _tree_allclose(ref.state, got.state)
    assert np.allclose(np.asarray(ref.metrics.loss),
                       np.asarray(got.metrics.loss[:t0]), rtol=1e-6)
    # pad region: zero loss, frozen posterior carry
    assert np.all(np.asarray(got.metrics.loss[t0:]) == 0.0)
    last = np.asarray(got.q_means[t0 - 1])
    for t in range(t0, t_pad):
        assert np.array_equal(np.asarray(got.q_means[t]), last)
    assert np.all(np.isfinite(np.asarray(got.q_means)))


@pytest.mark.parametrize("backend", ["nsv", "precision"])
def test_fully_masked_trial_equals_smaller_batch(key, backend):
    """B=2 with one trial masked out for the whole epoch == B=1 with only
    the valid trial: weighted reductions renormalize and the masked trial's
    zeroed feature rows add nothing to the RLS statistics."""
    cfg = _cfg(rls_backend=backend)
    t_len = 50
    k1, k2 = jax.random.split(key)
    ys2 = jax.random.normal(k1, (t_len, 2, cfg.ydim), jnp.float32)
    us2 = jnp.zeros((t_len, 2, 0), jnp.float32)
    eps2 = jax.random.normal(k2, (t_len, 2, 2, cfg.xdim), jnp.float32)
    mask = jnp.stack([jnp.ones(t_len), jnp.zeros(t_len)], axis=1)

    state = core.init_state(key, cfg)
    flags = StepFlags()
    ref = core.run_epoch(cfg, flags, state, ys2[:, :1], us2[:, :1], key,
                         jnp.float32(cfg.lr),
                         noise=(eps2[:, 0, :1], eps2[:, 1, :1]))
    got = core.run_epoch(cfg, flags, state, ys2, us2, key,
                         jnp.float32(cfg.lr),
                         noise=(eps2[:, 0], eps2[:, 1]), mask=mask)

    assert _tree_allclose(ref.state, got.state, rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(ref.metrics.loss),
                       np.asarray(got.metrics.loss), rtol=2e-5, atol=1e-6)
    assert np.allclose(np.asarray(ref.q_means[:, 0]),
                       np.asarray(got.q_means[:, 0]), rtol=2e-5, atol=1e-6)


def test_mask_forces_xla_on_fused_config(key):
    """A mask on a fused='auto' config off-TPU routes to the XLA path and
    trains sanely. (Since round 2 BOTH masks RIDE the fused/mega kernels
    where they are enabled — equivalence pinned in
    tests/test_fused_step.py::test_fused_masked_* /
    test_fused_channel_masked_* — this test keeps the off-TPU 'auto'
    routing honest.)"""
    cfg = _cfg(fused_step="auto", n_rbf=16)
    t_len, n_batch = 30, 8
    ys = jax.random.normal(key, (t_len, n_batch, cfg.ydim), jnp.float32)
    us = jnp.zeros((t_len, n_batch, 0), jnp.float32)
    mask = jnp.ones((t_len, n_batch)).at[20:, 4:].set(0.0)
    state = core.init_state(key, cfg)
    res = core.run_epoch(cfg, StepFlags(), state, ys, us, key,
                         jnp.float32(cfg.lr), mask=mask)
    assert np.all(np.isfinite(np.asarray(res.metrics.loss)))
    assert np.all(np.isfinite(np.asarray(res.q_means)))


def test_fit_ragged_recovery(key):
    """End-to-end: two limit-cycle trials of unequal length (padded with
    NaN to a common T) fit jointly via ``fit(mask=...)``; both latents
    recover on their valid spans and the learned model forecasts finitely.
    Exercises the masked warm-up bootstrap (pair weights) too."""
    rng = np.random.default_rng(7)
    T, T2 = 800, 500
    t = np.arange(T) * 0.05
    x1 = np.stack([np.sin(t), np.cos(t)], -1) + 0.02 * rng.normal(size=(T, 2))
    x2 = np.stack([np.sin(t + 1.3), np.cos(t + 1.3)], -1) + 0.02 * rng.normal(size=(T, 2))
    C = rng.normal(size=(2, 12))
    d = rng.normal(size=12)
    y = np.stack([x1 @ C + d, x2 @ C + d], axis=1)          # (T, 2, 12)
    y += 0.1 * rng.normal(size=y.shape)
    y = y.astype(np.float32)
    y[T2:, 1, :] = np.nan                                   # ragged: trial 2 ends at T2
    mask = np.ones((T, 2), np.float32)
    mask[T2:, 1] = 0.0

    cfg = _cfg(ydim=12, n_rbf=30, hidden_sizes=(12,), lr=3e-3, rtol=2e-3,
               rls_shrink=0.999, chol_jitter=1e-3)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=30, mask=mask)
    assert not res.warm_up, "warm-up never ended under mask"
    assert np.isfinite(res.loss)

    r2_full = latent_r2(np.asarray(res.mu[:, 0, :]), x1)
    r2_short = latent_r2(np.asarray(res.mu[:T2, 1, :]), x2[:T2])
    assert r2_full > 0.9, r2_full
    assert r2_short > 0.9, r2_short

    xf, _ = core.forecast(cfg, res.state, res.mu[T2 - 1, 1], key, n_step=100)
    assert np.all(np.isfinite(np.asarray(xf)))


def test_fit_list_of_trials_matches_manual_padding(key):
    """The OO facade accepts a LIST of unequal-length trials: auto-pad +
    auto-mask must reproduce the manual pad_trials + fit(mask=...) path
    bit-for-bit, and return per-trial (T_i, xdim) results."""
    from vjf_tpu.api import VJF
    from vjf_tpu.utils.ragged import pad_trials

    rng = np.random.default_rng(3)
    cfg = _cfg(ydim=8, n_rbf=12)
    y1 = rng.normal(size=(60, 8)).astype(np.float32)
    y2 = rng.normal(size=(40, 8)).astype(np.float32)

    model_list = VJF(cfg, seed=5)
    mu_l, lv_l, loss_l = model_list.fit([y1, y2], max_iter=3)

    padded = pad_trials([y1, y2])
    model_pad = VJF(cfg, seed=5)
    mu_p, lv_p, loss_p = model_pad.fit(padded.y, mask=padded.mask, max_iter=3)

    assert isinstance(mu_l, list) and len(mu_l) == 2
    assert mu_l[0].shape == (60, cfg.xdim) and mu_l[1].shape == (40, cfg.xdim)
    np.testing.assert_array_equal(np.asarray(mu_l[0]), np.asarray(mu_p[:, 0]))
    np.testing.assert_array_equal(np.asarray(mu_l[1]), np.asarray(mu_p[:40, 1]))
    np.testing.assert_array_equal(np.asarray(lv_l[1]), np.asarray(lv_p[:40, 1]))
    assert loss_l == loss_p
    assert _tree_allclose(model_list.state, model_pad.state, rtol=0, atol=0)


def test_fit_list_of_trials_arg_validation():
    """List input composes with per-trial control/channel-mask lists and
    rejects mixed list/array arguments."""
    from vjf_tpu.api import VJF
    from vjf_tpu.utils.ragged import pad_trials, split_trials

    rng = np.random.default_rng(4)
    y1 = rng.normal(size=(30, 8)).astype(np.float32)
    y2 = rng.normal(size=(20, 8)).astype(np.float32)
    cfg = _cfg(ydim=8, n_rbf=10, udim=1)
    u1 = rng.normal(size=(30, 1)).astype(np.float32)
    u2 = rng.normal(size=(20, 1)).astype(np.float32)
    cm1 = (rng.uniform(size=(30, 8)) > 0.2).astype(np.float32)
    cm2 = (rng.uniform(size=(20, 8)) > 0.2).astype(np.float32)

    model = VJF(cfg, seed=1)
    mu, lv, loss = model.fit([y1, y2], u=[u1, u2], max_iter=2,
                             channel_mask=[cm1, cm2])
    assert np.isfinite(loss)
    assert mu[0].shape == (30, cfg.xdim) and mu[1].shape == (20, cfg.xdim)

    with pytest.raises(ValueError, match="not both"):
        model.fit([y1, y2], mask=np.ones((30, 2)), max_iter=1)
    with pytest.raises(ValueError, match="per-trial list"):
        model.fit([y1, y2], u=np.zeros((30, 2, 1)), max_iter=1)

    # pad_trials validation + split round-trip
    with pytest.raises(ValueError, match="empty"):
        pad_trials([])
    with pytest.raises(ValueError, match="matching trial 0"):
        pad_trials([y1, rng.normal(size=(10, 5))])
    with pytest.raises(ValueError, match="controls for trial"):
        pad_trials([y1, y2], us=[u1, u1])
    with pytest.raises(ValueError, match="channel mask for trial"):
        pad_trials([y1, y2], channel_masks=[cm1, cm1])
    p = pad_trials([y1, y2], us=[u1, u2], channel_masks=[cm1, cm2])
    back = split_trials(p.y, p.lengths)
    np.testing.assert_array_equal(back[0], y1)
    np.testing.assert_array_equal(back[1], y2)
    assert p.mask.shape == (30, 2) and p.mask[20:, 1].sum() == 0
    np.testing.assert_array_equal(p.channel_mask[:20, 1], cm2)
    assert np.all(p.channel_mask[20:, 1] == 0)

    # 1-D (T,) trials mean ydim=1 and must become (T, 1) — np.atleast_2d
    # would silently transpose them to (1, T) (review finding)
    v1, v2 = rng.normal(size=15), rng.normal(size=9)
    p1 = pad_trials([v1, v2])
    assert p1.y.shape == (15, 2, 1) and p1.lengths == [15, 9]
    np.testing.assert_array_equal(p1.y[:9, 1, 0], v2)


def test_fit_blocked_ragged_matches_quality(key):
    """The block-dispatch production mode accepts the mask too."""
    rng = np.random.default_rng(9)
    T, T2 = 400, 260
    t = np.arange(T) * 0.05
    x1 = np.stack([np.sin(t), np.cos(t)], -1) + 0.02 * rng.normal(size=(T, 2))
    C = rng.normal(size=(2, 10))
    y = np.stack([x1 @ C, x1 @ C], axis=1).astype(np.float32)
    y += 0.1 * rng.normal(size=y.shape).astype(np.float32)
    y[T2:, 1, :] = 1e30                                     # huge-but-finite pad
    mask = np.ones((T, 2), np.float32)
    mask[T2:, 1] = 0.0

    cfg = _cfg(ydim=10, n_rbf=24, hidden_sizes=(10,), lr=3e-3, rtol=2e-3,
               rls_shrink=0.999, chol_jitter=1e-3)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=24, mask=mask,
                   epochs_per_dispatch=6)
    assert not res.warm_up
    assert np.isfinite(res.loss)
    r2 = latent_r2(np.asarray(res.mu[:, 0, :]), x1)
    assert r2 > 0.9, r2


# ---------------------------------------------------------------------------
# channel mask (missing observations / electrode dropout)
# ---------------------------------------------------------------------------


def test_channel_mask_all_ones_matches_unmasked(key):
    """A channel mask of all ones is numerically the unmasked computation
    (select no-ops; the weighted obs-noise mse reduces to the plain mean)."""
    cfg = _cfg()
    T = 40
    k1, k2 = jax.random.split(key)
    ys = jax.random.normal(k1, (T, 2, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, 2, 0), jnp.float32)
    eps = jax.random.normal(k2, (T, 2, 2, cfg.xdim), jnp.float32)
    state = core.init_state(key, cfg)
    flags = StepFlags()
    ref = core.run_epoch(cfg, flags, state, ys, us, key, jnp.float32(cfg.lr),
                         noise=(eps[:, 0], eps[:, 1]))
    got = core.run_epoch(cfg, flags, state, ys, us, key, jnp.float32(cfg.lr),
                         noise=(eps[:, 0], eps[:, 1]),
                         channel_mask=jnp.ones((T, 2, cfg.ydim)))
    assert _tree_allclose(ref.state, got.state, rtol=1e-5, atol=1e-7)
    assert np.allclose(np.asarray(ref.metrics.loss),
                       np.asarray(got.metrics.loss), rtol=1e-5, atol=1e-7)


def test_channel_mask_nan_value_invariance(key):
    """Missing entries' stored values are irrelevant: NaN-filled and
    zero-filled missing entries give the identical trajectory."""
    cfg = _cfg()
    T = 40
    k1, k2, k3 = jax.random.split(key, 3)
    ys = jax.random.normal(k1, (T, 2, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, 2, 0), jnp.float32)
    eps = jax.random.normal(k2, (T, 2, 2, cfg.xdim), jnp.float32)
    cm = (jax.random.uniform(k3, (T, 2, cfg.ydim)) > 0.3).astype(jnp.float32)
    y_nan = jnp.where(cm > 0, ys, jnp.nan)
    y_zero = jnp.where(cm > 0, ys, 0.0)
    state = core.init_state(key, cfg)
    flags = StepFlags()
    a = core.run_epoch(cfg, flags, state, y_nan, us, key, jnp.float32(cfg.lr),
                       noise=(eps[:, 0], eps[:, 1]), channel_mask=cm)
    b = core.run_epoch(cfg, flags, state, y_zero, us, key, jnp.float32(cfg.lr),
                       noise=(eps[:, 0], eps[:, 1]), channel_mask=cm)
    assert _tree_allclose(a.state, b.state, rtol=0, atol=0)
    assert np.array_equal(np.asarray(a.q_means), np.asarray(b.q_means))
    assert np.all(np.isfinite(np.asarray(a.q_means)))
    assert np.all(np.isfinite(np.asarray(a.metrics.loss)))


def test_fit_channel_dropout_recovery(key):
    """End-to-end: 30% of observation entries missing at random (NaN); the
    masked fit still recovers the latent limit cycle."""
    rng = np.random.default_rng(3)
    T = 800
    t = np.arange(T) * 0.05
    x = np.stack([np.sin(t), np.cos(t)], -1) + 0.02 * rng.normal(size=(T, 2))
    C = rng.normal(size=(2, 12))
    y = (x @ C + 0.1 * rng.normal(size=(T, 12))).astype(np.float32)[:, None, :]
    cm = (rng.uniform(size=y.shape) > 0.3).astype(np.float32)
    y = np.where(cm > 0, y, np.nan)

    cfg = _cfg(ydim=12, n_rbf=30, hidden_sizes=(12,), lr=3e-3, rtol=2e-3,
               rls_shrink=0.999, chol_jitter=1e-3)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=30, channel_mask=cm)
    assert not res.warm_up, "warm-up never ended under channel dropout"
    assert np.isfinite(res.loss)
    r2 = latent_r2(np.asarray(res.mu[:, 0, :]), x)
    assert r2 > 0.85, r2


def test_poisson_channel_dropout_finite(key):
    """Poisson likelihood with dropout: the imputation feeds rates (count
    scale) to the recognition net and the run stays finite."""
    cfg = _cfg(likelihood="poisson", ydim=10)
    T = 60
    k1, k2 = jax.random.split(key)
    ys = jax.random.poisson(k1, 2.0, (T, 2, cfg.ydim)).astype(jnp.float32)
    us = jnp.zeros((T, 2, 0), jnp.float32)
    cm = (jax.random.uniform(k2, (T, 2, cfg.ydim)) > 0.4).astype(jnp.float32)
    ys = jnp.where(cm > 0, ys, jnp.nan)
    state = core.init_state(key, cfg)
    res = core.run_epoch(cfg, StepFlags(), state, ys, us, key,
                         jnp.float32(cfg.lr), channel_mask=cm)
    assert np.all(np.isfinite(np.asarray(res.metrics.loss)))
    assert np.all(np.isfinite(np.asarray(res.q_means)))


def test_oo_filter_channel_mask(key):
    """OO facade: ``VJF.filter(channel_mask=...)`` — all-ones mask matches
    the unmasked step; a half-masked NaN observation still filters finitely."""
    from vjf_tpu.api import VJF

    ydim = 8
    model = VJF.make_model(ydim, 2, n_rbf=12, hidden_sizes=[8],
                           likelihood="gaussian", seed=0,
                           fused_step="off", rls_backend="nsv")
    model2 = VJF.make_model(ydim, 2, n_rbf=12, hidden_sizes=[8],
                            likelihood="gaussian", seed=0,
                            fused_step="off", rls_backend="nsv")
    y = np.asarray(jax.random.normal(key, (1, ydim), jnp.float32))
    q1, l1 = model.filter(y)
    q2, l2 = model2.filter(y, channel_mask=np.ones((1, ydim), np.float32))
    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    assert np.allclose(np.asarray(q1.mean), np.asarray(q2.mean), rtol=1e-6)

    y_miss = y.copy()
    y_miss[0, : ydim // 2] = np.nan
    cmask = np.ones((1, ydim), np.float32)
    cmask[0, : ydim // 2] = 0.0
    q3, l3 = model2.filter(y_miss, qs=q2, channel_mask=cmask)
    assert np.isfinite(float(l3))
    assert np.all(np.isfinite(np.asarray(q3.mean)))


def test_oo_filter_trial_mask(key):
    """OO facade: ``VJF.filter(mask=...)`` — an absent trial's posterior
    carry freezes and the step matches the all-present step on the
    present trial."""
    from vjf_tpu.api import VJF

    ydim = 8
    m1 = VJF.make_model(ydim, 2, n_rbf=12, hidden_sizes=[8],
                        likelihood="gaussian", seed=0,
                        fused_step="off", rls_backend="nsv")
    y = np.asarray(jax.random.normal(key, (2, ydim), jnp.float32))
    q0, _ = m1.filter(y)
    mask = np.array([1.0, 0.0], np.float32)
    y_nan = y.copy(); y_nan[1] = np.nan
    q1, l1 = m1.filter(y_nan, qs=q0, mask=mask)
    assert np.isfinite(float(np.asarray(l1)))
    # frozen carry for the absent trial
    np.testing.assert_array_equal(np.asarray(q1.mean[1]), np.asarray(q0.mean[1]))
    assert np.all(np.isfinite(np.asarray(q1.mean)))


def test_channel_mask_fractional_lik_count_accumulates():
    """Regression (r1 review): the sample counter was int32 and the masked
    update's fractional row count sum(mask)/ydim truncated to 0 at B=1 —
    the obs-noise 'running average' had zero memory (each step overwrote
    logvar with its own masked mse). The counter is float now: at ~70%
    observed it must accumulate ~0.7 per step and the estimate must blend
    history."""
    from vjf_tpu.models.likelihoods import gaussian_lik_update, init_gaussian_lik

    rng = np.random.default_rng(0)
    lik = init_gaussian_lik(np.log(0.1), dtype=jnp.float64)
    n = jnp.zeros((), jnp.float64)
    steps = 20
    for _ in range(steps):
        eta = jnp.asarray(rng.normal(size=(1, 10)))
        tgt = eta + 0.3 * jnp.asarray(rng.normal(size=(1, 10)))
        cm = jnp.asarray((rng.uniform(size=(1, 10)) > 0.3).astype(float))
        prev_lv = float(lik.logvar)
        lik, n = gaussian_lik_update(lik, n, eta, tgt, channel_mask=cm)
    n_final = float(n)
    assert 0.4 * steps < n_final < steps, n_final  # ~0.7/step accumulated

    # memory: one more step with a wildly different mse moves the estimate
    # only fractionally (f2 = count / (n + count) << 1), not to the new mse
    eta = jnp.asarray(rng.normal(size=(1, 10)))
    tgt = eta + 30.0 * jnp.asarray(rng.normal(size=(1, 10)))   # mse ~ 900
    cm = jnp.ones((1, 10))
    before = float(jnp.exp(lik.logvar))
    lik2, _ = gaussian_lik_update(lik, n, eta, tgt, channel_mask=cm)
    after = float(jnp.exp(lik2.logvar))
    assert after < 0.25 * 900, after  # far from the outlier step's mse


def test_fit_ragged_nan_controls_bootstrap_finite(key):
    """Regression (r1 review): with udim > 0 and NaN-padded controls (the
    documented ragged padding style) the warm-up-end bootstrap pooled raw
    u rows, so max||cat(xs, u)|| — and 0 * NaN in the weighted RLS sums —
    went NaN: every centroid, the BLR posterior and the state noise turned
    NaN and the dynamics silently never trained. Padded u rows are zeroed
    before pooling now."""
    cfg = _cfg(udim=1)
    rng = np.random.default_rng(7)
    T, B = 40, 2
    y = rng.normal(size=(T, B, cfg.ydim)).astype(np.float32)
    u = rng.normal(size=(T, B, 1)).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    mask[25:, 1] = 0.0
    u[25:, 1] = np.nan                       # padding under the mask
    state = core.init_state(key, cfg)
    # huge rtol forces the warm-up plateau (and the bootstrap) immediately
    res = core.fit(cfg, state, y, u, key=key, max_iter=8, rtol=1e9, mask=mask)
    for leaf in jax.tree_util.tree_leaves(res.state.dynamics):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            assert bool(jnp.all(jnp.isfinite(leaf))), "NaN leaked into dynamics"
    assert int(res.state.dynamics.n_sample) > 0   # RLS actually ran post-bootstrap
    assert np.isfinite(res.loss)


def test_fit_ragged_on_fused_mega_path(key):
    """End-to-end fit() with a ragged mask ON the fused mega path
    (fused_step='on', interpret on CPU): warm-up, masked bootstrap, RLS —
    the whole control loop over the kernelized masked epoch."""
    rng = np.random.default_rng(12)
    T, T2 = 160, 100
    t = np.arange(T) * 0.08
    x1 = np.stack([np.sin(t), np.cos(t)], -1)
    C = rng.normal(size=(2, 10))
    y = np.stack([x1 @ C, x1 @ C], axis=1).astype(np.float32)
    y += 0.1 * rng.normal(size=y.shape).astype(np.float32)
    y[T2:, 1, :] = np.nan
    mask = np.ones((T, 2), np.float32)
    mask[T2:, 1] = 0.0

    cfg = _cfg(ydim=10, n_rbf=16, hidden_sizes=(10,), lr=3e-3, rtol=2e-3,
               fused_step="on", fused_epoch="mega", ns_prefix=16,
               matmul_dtype="float32", warmup_max=6)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=10, mask=mask)
    assert not res.warm_up
    assert np.isfinite(res.loss)
    assert np.all(np.isfinite(np.asarray(res.mu)))
    assert int(res.state.dynamics.n_sample) > 0
    # frozen padding on the dead trial
    last = np.asarray(res.mu[T2 - 1, 1])
    np.testing.assert_array_equal(np.asarray(res.mu[-1, 1]), last)


def test_fit_channel_mask_on_fused_mega_path(key):
    """End-to-end fit() with 25% electrode dropout ON the fused mega path
    (fused_step='on', interpret on CPU): the in-kernel imputation feedback,
    masked likelihood, and fractional obs-noise counts through the whole
    control loop."""
    rng = np.random.default_rng(21)
    T = 160
    t = np.arange(T) * 0.08
    x1 = np.stack([np.sin(t), np.cos(t)], -1)
    C = rng.normal(size=(2, 10))
    y = np.stack([x1 @ C, x1 @ C], axis=1).astype(np.float32)
    y += 0.1 * rng.normal(size=y.shape).astype(np.float32)
    cm = (rng.uniform(size=y.shape) > 0.25).astype(np.float32)
    y = np.where(cm > 0, y, np.nan)

    cfg = _cfg(ydim=10, n_rbf=16, hidden_sizes=(10,), lr=3e-3, rtol=2e-3,
               fused_step="on", fused_epoch="mega", ns_prefix=16,
               matmul_dtype="float32", warmup_max=6)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=10, channel_mask=cm)
    assert not res.warm_up
    assert np.isfinite(res.loss)
    assert np.all(np.isfinite(np.asarray(res.mu)))
    assert int(res.state.dynamics.n_sample) > 0
    assert float(res.state.lik_n_sample) > 0


def test_run_epoch_time_mask_promotion_at_t_equals_b(key):
    """A (T,) per-TIME trial mask passed directly to run_epoch when T == B
    must gain a trial axis (every trial invalid past t0), not be silently
    transposed into a per-trial mask by right-aligned broadcasting — the
    promotion-helper trap documented at parallel/sharded.py."""
    T = B = 8
    cfg = _cfg(ydim=6, n_rbf=8, hidden_sizes=(5,))
    state = core.init_state(key, cfg)
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    t_mask = jnp.asarray(np.r_[np.ones(5), np.zeros(3)], jnp.float32)  # (T,)

    got = core.run_epoch(cfg, StepFlags(), state, ys, us, key, lr,
                         noise=(eps[0], eps[1]), mask=t_mask)
    full = jnp.broadcast_to(t_mask[:, None], (T, B))
    ref = core.run_epoch(cfg, StepFlags(), state, ys, us, key, lr,
                         noise=(eps[0], eps[1]), mask=full)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(got.q_means),
                               np.asarray(ref.q_means), rtol=1e-7, atol=1e-9)
    # the transposed interpretation would keep steps 5..7 live
    assert np.all(np.asarray(got.metrics.loss[5:]) == 0.0)


def test_fit_demotes_masked_small_effective_batch_sgp(key):
    """A ragged SGP fit whose PADDED batch passes the fused gate but whose
    effective per-step valid count is tiny must route to the XLA epoch
    up front (host-side mask inspection) instead of compiling the mega
    kernel only to go tau-hot and demote."""
    from vjf_tpu.models.vjf import _demote_masked_small_sgp
    from vjf_tpu.config import VJFConfig

    cfg = VJFConfig(ydim=8, xdim=2, udim=0, dynamics="sgp", n_inducing=8,
                    hidden_sizes=(6,), likelihood="gaussian",
                    dtype="float32", rls_backend="nsv", fused_step="auto",
                    sgp_fused_min_batch=8)
    T, B = 20, 16
    mask = np.ones((T, B), np.float32)
    mask[5:, 2:] = 0.0                       # most steps have 2 valid trials
    out = _demote_masked_small_sgp(cfg, jnp.asarray(mask))
    assert out.fused_step == "off"
    # lockstep-equivalent mask keeps the fused routing
    out2 = _demote_masked_small_sgp(cfg, jnp.ones((T, B), jnp.float32))
    assert out2.fused_step == "auto"
    # explicit 'on' is respected
    out3 = _demote_masked_small_sgp(cfg.replace(fused_step="on"),
                                    jnp.asarray(mask))
    assert out3.fused_step == "on"
    # rbf dynamics untouched
    out4 = _demote_masked_small_sgp(cfg.replace(dynamics="rbf"),
                                    jnp.asarray(mask))
    assert out4.fused_step == "auto"


def test_filter_stream_with_channel_masks(key):
    """Live electrode dropout through filter_stream: per-chunk channel
    masks (NaN holes) train finitely, carry the posterior across chunk
    boundaries, and match the one-shot fit-free filter over the
    concatenated stream with the concatenated mask."""
    from vjf_tpu.api import VJF

    rng = np.random.default_rng(31)
    T, B, ydim, n_chunks = 60, 2, 8, 3
    t = np.arange(T) * 0.1
    lat = np.stack([np.sin(t), np.cos(t)], -1)
    C = rng.normal(size=(2, ydim))
    y = (lat[:, None, :] @ C + 0.1 * rng.normal(size=(T, B, ydim))).astype(np.float32)
    cm = (rng.uniform(size=(T, B, ydim)) > 0.25).astype(np.float32)
    y = np.where(cm > 0, y, np.nan)

    cfg = _cfg(ydim=ydim, n_rbf=12, hidden_sizes=(8,))
    model = VJF(cfg, seed=3)
    chunks = np.split(y, n_chunks)
    cms = np.split(cm, n_chunks)
    outs = list(model.filter_stream(iter(chunks), channel_masks=iter(cms)))
    assert len(outs) == n_chunks
    mu = np.concatenate([np.asarray(o.q_means) for o in outs])
    assert mu.shape == (T, B, cfg.xdim)
    assert np.all(np.isfinite(mu))
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o.metrics.loss)))
    # obs-noise counter advanced by fractional counts (channel-masked)
    assert float(outs[-1].state.lik_n_sample) > 0


def test_filter_stream_with_trial_masks(key):
    """Mid-stream trial dropout: per-chunk (chunk_len, B) masks freeze the
    dead trial's carry across chunks and keep training the live one."""
    from vjf_tpu.api import VJF

    rng = np.random.default_rng(33)
    T, B, ydim = 60, 2, 8
    y = rng.normal(size=(T, B, ydim)).astype(np.float32)
    mask = np.ones((T, B), np.float32)
    mask[30:, 1] = 0.0                       # trial 1 drops mid-stream
    y[30:, 1] = np.nan

    cfg = _cfg(ydim=ydim, n_rbf=12, hidden_sizes=(8,))
    model = VJF(cfg, seed=4)
    chunks = np.split(y, 3)
    ms = np.split(mask, 3)
    outs = list(model.filter_stream(iter(chunks), masks=iter(ms)))
    mu = np.concatenate([np.asarray(o.q_means) for o in outs])
    assert np.all(np.isfinite(mu))
    # frozen carry across the chunk boundary: trial 1 identical from t=30 on
    np.testing.assert_array_equal(mu[-1, 1], mu[29, 1])


def test_filter_stream_short_mask_iterable_raises(key):
    """A mask stream shorter than the chunk stream must fail loudly —
    silently training the remaining chunks unmasked is a correctness
    hazard (and a surprise recompile)."""
    import pytest

    from vjf_tpu.api import VJF

    rng = np.random.default_rng(35)
    T, B, ydim = 30, 2, 8
    y = rng.normal(size=(T, B, ydim)).astype(np.float32)
    mask = np.ones((T, B), np.float32)

    cfg = _cfg(ydim=ydim, n_rbf=12, hidden_sizes=(8,))
    model = VJF(cfg, seed=5)
    chunks = np.split(y, 3)
    with pytest.raises(ValueError, match="masks.*ran out"):
        list(model.filter_stream(iter(chunks), masks=iter(np.split(mask, 3)[:2])))
    model = VJF(cfg, seed=5)
    with pytest.raises(ValueError, match="channel_masks.*ran out"):
        list(model.filter_stream(
            iter(chunks),
            channel_masks=iter([np.ones((10, B, ydim), np.float32)]),
        ))
