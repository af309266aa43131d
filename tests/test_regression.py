"""The Bayesian linear regression is the load-bearing math of VJF: both
backends must agree with each other, with batch least squares, and with the
torch reference's RLS step."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.models import regression as R
from vjf_tpu.models.rbf import apply_rbf, init_rbf

sys.path.insert(0, "/root/reference")


def _setup(key, n=40, nf=12, nout=3):
    kx, kt = jax.random.split(key)
    feat = jax.random.normal(kx, (n, nf), dtype=jnp.float64)
    w_true = jax.random.normal(kt, (nf, nout), dtype=jnp.float64)
    target = feat @ w_true + 0.01 * jax.random.normal(kt, (n, nout), dtype=jnp.float64)
    return feat, target, w_true


def test_single_rls_equals_batch_lstsq(key):
    """One RLS pass from the identity-prior init must equal the closed-form
    batch posterior (vjf/module.py:79-103 semantics)."""
    feat, target, _ = _setup(key)
    v = jnp.asarray(0.5)
    state = R.init_precision(feat.shape[1], target.shape[1], dtype=jnp.float64)
    new = R.rls(state, feat, target, v)
    w_ref, p_ref = R.batch_lstsq_posterior(feat, target, v)
    np.testing.assert_allclose(np.asarray(new.w_mean), np.asarray(w_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(new.precision), np.asarray(p_ref), rtol=1e-8)


def test_backends_agree(key):
    """Precision and covariance backends produce the same posterior over a
    sequence of updates (they are algebraically the Woodbury duals)."""
    feat, target, _ = _setup(key, n=30)
    v = jnp.asarray(0.3)
    p_state = R.init_precision(feat.shape[1], target.shape[1], dtype=jnp.float64)
    c_state = R.init_covariance(feat.shape[1], target.shape[1], dtype=jnp.float64)
    for i in range(0, 30, 5):
        f, t = feat[i : i + 5], target[i : i + 5]
        p_state = R.rls(p_state, f, t, v)
        c_state = R.rls(c_state, f, t, v)
    np.testing.assert_allclose(
        np.asarray(p_state.w_mean), np.asarray(c_state.w_mean), rtol=1e-7, atol=1e-9
    )
    p_cov = np.linalg.inv(np.asarray(p_state.precision))
    np.testing.assert_allclose(p_cov, np.asarray(c_state.cov), rtol=1e-6, atol=1e-9)

    # predictive distributions agree too
    g_p = R.predict_gaussian(p_state, feat)
    g_c = R.predict_gaussian(c_state, feat)
    np.testing.assert_allclose(np.asarray(g_p.mean), np.asarray(g_c.mean), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(g_p.logvar), np.asarray(g_c.logvar), rtol=1e-6
    )


def test_rls_matches_torch_reference(key):
    """Golden parity of one RLS step against vjf/module.py:79-103 with
    identical inputs (features injected to bypass RNG differences)."""
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.double)
    from vjf.module import RBF as RefRBF
    from vjf.module import LinearRegression as RefLR

    nf, nout, n = 8, 2, 15
    feat, target, _ = _setup(key, n=n, nf=nout, nout=nout)  # raw x, features via RBF

    # Build the reference module and copy its (random) centroids into ours so
    # both see identical features.
    ref = RefLR(RefRBF(nout, nf), nout)
    centroid = np.asarray(ref.feature.centroid.detach())
    logwidth = np.asarray(ref.feature.logwidth.detach())

    from vjf_tpu.models.rbf import RBFParams

    params = RBFParams(jnp.asarray(centroid), jnp.asarray(logwidth))
    x = np.asarray(feat)  # (n, nout) raw inputs
    t = np.asarray(target)
    v = 0.7

    ref.rls(torch.tensor(x), torch.tensor(t), torch.tensor(v), shrink=1.0)

    ours = R.init_precision(nf, nout, dtype=jnp.float64)
    f = apply_rbf(params, jnp.asarray(x))
    ours = R.rls(ours, f, jnp.asarray(t), jnp.asarray(v), shrink=1.0)

    np.testing.assert_allclose(
        np.asarray(ours.w_mean), np.asarray(ref.w_mean), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ours.precision), np.asarray(ref.w_precision), rtol=1e-8
    )

    # predictive parity (sampling=False path, vjf/module.py:75-77)
    g = R.predict_gaussian(ours, f)
    ref_pred = ref(torch.tensor(x), sampling=False)
    np.testing.assert_allclose(
        np.asarray(g.mean), np.asarray(ref_pred.mean), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(g.logvar), np.asarray(ref_pred.logvar), rtol=1e-6, atol=1e-8
    )


def test_weight_sqrt_covariance(key):
    feat, target, _ = _setup(key)
    v = jnp.asarray(0.5)
    for init in (R.init_precision, R.init_covariance):
        st = R.rls(init(feat.shape[1], target.shape[1], dtype=jnp.float64), feat, target, v)
        s = R.weight_sqrt(st)
        cov = np.asarray(s @ s.T)
        if isinstance(st, R.PrecisionBLR):
            expected = np.linalg.inv(np.asarray(st.precision))
        else:
            expected = np.asarray(st.cov)
        np.testing.assert_allclose(cov, expected, rtol=1e-7, atol=1e-10)


def test_kalman_diffusion_matches_rls_at_zero(key):
    """kalman(diffusion=0) == rls(shrink=1) — both are the exact Bayesian
    update (vjf/module.py:114-142 with Q=0)."""
    feat, target, _ = _setup(key, n=10)
    v = jnp.asarray(0.4)
    c0 = R.init_covariance(feat.shape[1], target.shape[1], dtype=jnp.float64)
    via_rls = R.rls(c0, feat, target, v)
    via_kal = R.kalman(c0, feat, target, v, diffusion=0.0)
    np.testing.assert_allclose(
        np.asarray(via_rls.w_mean), np.asarray(via_kal.w_mean), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(via_rls.cov), np.asarray(via_kal.cov), rtol=1e-5, atol=1e-8
    )


def test_one_shot_rls_bounded_on_illconditioned_gram(key):
    """Regression: the NSV exact fallback (explicit f32 triangular inverse)
    on a ONE-SHOT pooled bootstrap Gram at cond ~1e8 produced |w| ~ 2e23 —
    the warm-up-end bootstrap destroyed the dynamics and pinned the state
    noise at +clamp (missing_data example, CPU f32). one_shot_rls solves
    the same normal equations through a relative-floored eigh: bounded
    (w, P, V) at any conditioning, V P == I where the floor is slack."""
    n, nf = 800, 40
    # highly-overlapping RBF features of a slow 1D walk: near-collinear
    # columns -> ill-conditioned Gram (the bootstrap's actual regime)
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)[:, None]
    rbf = init_rbf(key, 1, nf, 1.0, dtype=jnp.float32)
    feat = apply_rbf(rbf, t)
    dx = (0.05 * jnp.sin(4 * t) + 0.01 * jax.random.normal(key, (n, 1))
          ).astype(jnp.float32)

    state = R.init_nsv(nf, 1, dtype=jnp.float32)
    out = R.one_shot_rls(state, feat, dx, jnp.asarray(2.5e-3, jnp.float32),
                         shrink=0.999, jitter=1e-3)
    w = np.asarray(out.w_mean)
    assert np.isfinite(w).all()
    assert np.abs(w).max() < 1e3, np.abs(w).max()
    # the tracked pair stays mutually consistent (NS-polishable)
    vp = np.asarray(out.cov) @ np.asarray(out.precision)
    assert np.abs(vp - np.eye(nf)).max() < 1e-2, np.abs(vp - np.eye(nf)).max()
    # and the solution actually fits: residual well below the signal
    resid = np.asarray(dx - feat @ out.w_mean)
    assert np.sqrt(np.mean(resid**2)) < 0.5 * float(jnp.std(dx))


def test_one_shot_rls_matches_rls_when_well_conditioned(key):
    """Where the floor is slack the eigh route must agree with the
    incremental solve (same normal equations)."""
    n, nf = 30, 6
    feat = jax.random.normal(key, (n, nf), jnp.float64)
    w_true = jax.random.normal(jax.random.fold_in(key, 1), (nf, 2), jnp.float64)
    y = feat @ w_true
    for init in (R.init_nsv, R.init_precision):
        st = init(nf, 2, dtype=jnp.float64)
        a = R.rls(st, feat, y, jnp.asarray(0.1))
        b = R.one_shot_rls(st, feat, y, jnp.asarray(0.1))
        np.testing.assert_allclose(np.asarray(b.w_mean), np.asarray(a.w_mean),
                                   rtol=1e-8, atol=1e-10)


def test_one_shot_rls_f32_precision_backend_bounded(key):
    """Review finding: the f32 PRECISION backend's incremental rls forms an
    explicit triangular inverse (error ~cond), so the ill-conditioned
    one-shot bootstrap Gram must route through the eigh floor there too —
    and return a consistent PrecisionBLR factor pair."""
    n, nf = 800, 40
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)[:, None]
    rbf = init_rbf(key, 1, nf, 1.0, dtype=jnp.float32)
    feat = apply_rbf(rbf, t)
    dx = (0.05 * jnp.sin(4 * t) + 0.01 * jax.random.normal(key, (n, 1))
          ).astype(jnp.float32)

    st = R.init_precision(nf, 1, dtype=jnp.float32)
    out = R.one_shot_rls(st, feat, dx, jnp.asarray(2.5e-3, jnp.float32),
                         shrink=0.999, jitter=1e-3)
    assert type(out).__name__ == "PrecisionBLR"
    w = np.asarray(out.w_mean)
    assert np.isfinite(w).all() and np.abs(w).max() < 1e3, np.abs(w).max()
    resid = np.asarray(dx - feat @ out.w_mean)
    assert np.sqrt(np.mean(resid**2)) < 0.5 * float(jnp.std(dx))
    # factor pair consistency: chol @ chol.T == precision, U = inv(L)^T
    chol = np.asarray(out.prec_chol)
    prec = np.asarray(out.precision)
    scale = np.abs(prec).max()
    assert np.abs(chol @ chol.T - prec).max() < 1e-4 * scale
    u = np.asarray(out.prec_chol_inv_t)
    assert np.abs(u.T @ chol - np.eye(nf)).max() < 1e-2

    # f64 precision stays on the reference-faithful incremental path
    st64 = R.init_precision(nf, 1, dtype=jnp.float64)
    a = R.rls(st64, feat.astype(jnp.float64), dx.astype(jnp.float64),
              jnp.asarray(2.5e-3, jnp.float64), shrink=0.999, jitter=1e-3)
    b = R.one_shot_rls(st64, feat.astype(jnp.float64),
                       dx.astype(jnp.float64),
                       jnp.asarray(2.5e-3, jnp.float64),
                       shrink=0.999, jitter=1e-3)
    np.testing.assert_array_equal(np.asarray(a.w_mean), np.asarray(b.w_mean))


def test_covariance_jitter_rejected_at_config_time(key):
    """Review finding: covariance + chol_jitter failed only at the first
    jitted rls trace mid-fit; resolve_backend now rejects it up front."""
    import pytest

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="covariance", chol_jitter=1e-3)
    with pytest.raises(ValueError, match="chol_jitter"):
        dyn.resolve_backend(cfg)
    with pytest.raises(ValueError, match="chol_jitter"):
        from vjf_tpu.models import vjf as core
        core.init_state(key, cfg)


def test_spectral_repair_restores_tracked_pair():
    """Epoch-boundary NSV repair (regression.spectral_repair): an
    indefinite, ill-conditioned P with a drifted tracked inverse comes back
    as a PD pair with cond <= 1/rel_floor and V exactly P^{-1}, w kept —
    the state observed after one canonical B=1 epoch (evmin -7.2 at
    evmax 8.6e4, |PV - I| ~ 0.7) made the NEXT epoch explode to |w| ~ 2e12."""
    import numpy as np

    rng = np.random.default_rng(0)
    n = 12
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.array([8.6e4, 3e4, 1e3, 50.0, 5.0, 1.0,
                    1e-2, 1e-5, 0.0, -1e-3, 2e-6, -7.2])
    p = (q * lam) @ q.T
    w = rng.normal(size=(n, 3)).astype(np.float32)
    v_drift = (np.linalg.pinv(p) + 0.1 * rng.normal(size=(n, n))).astype(np.float32)
    st = R.NSVBLR(jnp.asarray(w), jnp.asarray(p, jnp.float32), jnp.asarray(v_drift))

    rep = R.spectral_repair(st)
    evs = np.linalg.eigvalsh(np.asarray(rep.precision, dtype=np.float64))
    assert evs.min() > 0
    assert evs.max() / evs.min() <= 1e4 * 1.01
    resid = np.asarray(rep.precision) @ np.asarray(rep.cov) - np.eye(n)
    assert np.abs(resid).max() < 5e-3      # exact pair at f32 / cond 1e4
    np.testing.assert_array_equal(np.asarray(rep.w_mean), w)
    # informative subspace preserved: the top eigenvalue is untouched
    assert abs(evs.max() - 8.6e4) / 8.6e4 < 1e-3


def test_spectral_repair_gated_on_indefiniteness():
    """'auto' repair (only_if_indefinite=True, the default) must leave a
    HEALTHY pair bit-untouched: epoch-boundary probes (2026-08-19) showed
    PD P with a steady-state |PV - I| ~ 0.3-0.7 is the NORM for the
    self-correcting NS tracking, and unconditionally flooring it lifts
    genuine eigenvalues between the jitter floor (~1) and the 1e-4
    relative floor (~8.5 at evmax 8.6e4) — measured to degrade the VdP
    20-step forecast RMSE from 0.51 to 0.85 at matched epochs.
    only_if_indefinite=False ('on') must still floor unconditionally."""
    import numpy as np

    rng = np.random.default_rng(3)
    n = 12
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.geomspace(8.6e4, 1.0, n)        # PD, evmin at the jitter floor
    p = ((q * lam) @ q.T).astype(np.float32)
    w = rng.normal(size=(n, 3)).astype(np.float32)
    v_drift = (np.linalg.pinv(p.astype(np.float64))
               + 0.5 * rng.normal(size=(n, n)) / lam.max()).astype(np.float32)
    st = R.NSVBLR(jnp.asarray(w), jnp.asarray(p), jnp.asarray(v_drift))

    auto = R.spectral_repair(st)             # PD -> pass-through
    np.testing.assert_array_equal(np.asarray(auto.precision), p)
    np.testing.assert_array_equal(np.asarray(auto.cov), v_drift)

    forced = R.spectral_repair(st, only_if_indefinite=False)
    evs = np.linalg.eigvalsh(np.asarray(forced.precision, dtype=np.float64))
    assert evs.min() >= 8.6e4 * 1e-4 * 0.99  # unconditional floor applied
    resid = np.asarray(forced.precision) @ np.asarray(forced.cov) - np.eye(n)
    assert np.abs(resid).max() < 5e-3        # exact pair replaces the drift
