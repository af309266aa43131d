"""Component-level tests: recognition, likelihoods, decoder, dynamics."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import VJFConfig
from vjf_tpu.models import decoder as D
from vjf_tpu.models import dynamics as dyn
from vjf_tpu.models import likelihoods as L
from vjf_tpu.models import recognition as Rec
from vjf_tpu.models.rbf import apply_rbf
from vjf_tpu.types import Gaussian

sys.path.insert(0, "/root/reference")


def test_recognition_shapes(key):
    """Output shapes (the reference's only numeric-ish assertion,
    test_model.py:29) plus the udim path the stale reference test misses."""
    ydim, xdim, udim, n = 10, 3, 2, 20
    params = Rec.init_recognition(key, ydim, xdim, udim, (5, 5), dtype=jnp.float64)
    y = jax.random.normal(key, (n, ydim), dtype=jnp.float64)
    u = jax.random.normal(key, (n, udim), dtype=jnp.float64)
    qs = Gaussian(jnp.zeros((n, xdim)), jnp.zeros((n, xdim)))
    q = Rec.apply_recognition(params, y, qs, u)
    assert q.mean.shape == (n, xdim) and q.logvar.shape == (n, xdim)


def test_recognition_matches_torch_reference(key):
    """Same weights + same inputs → same posterior as vjf/recognition.py."""
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.double)
    from vjf.distribution import Gaussian as RefGaussian
    from vjf.recognition import Recognition as RefRec

    ydim, xdim, udim, n = 6, 2, 0, 4
    ref = RefRec(ydim, xdim, udim, [7, 5])

    # copy torch weights into our pytree
    lin = [m for m in ref.mlp if isinstance(m, torch.nn.Linear)]
    layers = tuple(
        Rec.LinearParams(
            jnp.asarray(m.weight.detach().numpy()), jnp.asarray(m.bias.detach().numpy())
        )
        for m in lin
    )
    params = Rec.RecognitionParams(
        layers=layers,
        mean=Rec.LinearParams(jnp.asarray(ref.mean.weight.detach().numpy()), None),
        logvar=Rec.LinearParams(
            jnp.asarray(ref.logvar.weight.detach().numpy()),
            jnp.asarray(ref.logvar.bias.detach().numpy()),
        ),
    )

    rng = np.random.default_rng(0)
    y = rng.normal(size=(n, ydim))
    qm = rng.normal(size=(n, xdim))
    qlv = rng.normal(size=(n, xdim))

    ours = Rec.apply_recognition(
        params, jnp.asarray(y), Gaussian(jnp.asarray(qm), jnp.asarray(qlv)), None
    )
    refq = ref(torch.tensor(y), RefGaussian(torch.tensor(qm), torch.tensor(qlv)))
    np.testing.assert_allclose(np.asarray(ours.mean), refq.mean.detach().numpy(), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ours.logvar), refq.logvar.detach().numpy(), rtol=1e-10
    )


def test_poisson_nll_matches_torch(key):
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.double)
    from vjf.likelihood import PoissonLikelihood

    rng = np.random.default_rng(1)
    eta = rng.normal(size=(5, 8)) * 4  # exercise the clamp at 10
    target = rng.poisson(size=(5, 8)).astype(np.float64)

    ours = L.poisson_nll(jnp.asarray(eta), jnp.asarray(target), clamp=10.0)
    ref = PoissonLikelihood.loss(torch.tensor(eta), torch.tensor(target)).item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-10)


def test_gaussian_lik_update_matches_torch(key):
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.double)
    from vjf.likelihood import GaussianLikelihood

    rng = np.random.default_rng(2)
    eta = rng.normal(size=(7, 3))
    target = rng.normal(size=(7, 3))

    ref = GaussianLikelihood()
    ref.update(torch.tensor(eta), torch.tensor(target))

    params = L.init_gaussian_lik(float(np.log(0.1)), dtype=jnp.float64)
    new, n = L.gaussian_lik_update(
        params, jnp.asarray(0), jnp.asarray(eta), jnp.asarray(target)
    )
    np.testing.assert_allclose(float(new.logvar), ref.logvar.item(), rtol=1e-10)
    assert int(n) == ref.n_sample


def test_decoder_gaussian_push(key):
    """Diagonal push-through equals the reference's full-matrix construction."""
    xdim, ydim, n = 3, 5, 4
    params = D.init_decoder(key, xdim, ydim, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    q = Gaussian(
        jnp.asarray(rng.normal(size=(n, xdim))), jnp.asarray(rng.normal(size=(n, xdim)))
    )
    out = D.decode_gaussian(params, q)
    # brute force: full covariance diag
    C = np.asarray(params.w)  # (ydim, xdim)
    for i in range(n):
        S = np.diag(np.exp(np.asarray(q.logvar[i])))
        V = C @ S @ C.T
        np.testing.assert_allclose(
            np.exp(np.asarray(out.logvar[i])), np.diag(V), rtol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(out.mean), np.asarray(q.mean) @ C.T + np.asarray(params.b), rtol=1e-10
    )


def _cfg(**kw):
    base = dict(
        ydim=10, xdim=3, udim=1, n_rbf=10, hidden_sizes=(5, 5),
        likelihood="gaussian", dtype="float64",
    )
    base.update(kw)
    return VJFConfig(**base)


def test_dynamics_update_and_loss(key):
    """Smoke + semantics of RBFDS.loss/update (vjf/model.py:363-391)."""
    cfg = _cfg()
    state = dyn.init_dynamics(key, cfg, backend="precision")
    n = 20
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(n, cfg.xdim)))
    u = jnp.asarray(rng.normal(size=(n, cfg.udim)))

    q = Gaussian(x, jnp.zeros_like(x))
    loss = dyn.dynamics_loss(state, q, q)
    assert np.isfinite(float(loss))

    new = dyn.dynamics_update(cfg, state, x, x, u, warm_up=False)
    assert int(new.n_sample) == n
    # perfect prediction of dx=0 from w=0 start: noise shrinks toward 0 mse
    assert float(new.logvar) < float(state.logvar)

    # warm-up skips RLS: weights unchanged
    warm = dyn.dynamics_update(cfg, state, x, x, u, warm_up=True)
    np.testing.assert_array_equal(
        np.asarray(warm.blr.w_mean), np.asarray(state.blr.w_mean)
    )


def test_dynamics_initialize(key):
    """Bootstrap re-init learns a simple linear flow (vjf/model.py:379-388)."""
    cfg = _cfg(udim=0, n_rbf=50)
    state = dyn.init_dynamics(key, cfg, backend="precision")
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(size=(400, cfg.xdim)))
    xt = xs + 0.05 * (-xs)  # contraction flow dx = -0.05 x
    new = dyn.dynamics_initialize(cfg, key, state, xt, xs, None)
    pred = dyn.transition_gaussian(new, xs, None).mean
    err = float(jnp.sqrt(jnp.mean(jnp.square(pred - xt))))
    base = float(jnp.sqrt(jnp.mean(jnp.square(xs - xt))))
    assert err < 0.5 * base  # explains most of the velocity
    assert float(new.logvar) < 2 * np.log(0.05)  # state noise near residual scale


def test_forecast_shapes(key):
    cfg = _cfg(udim=0)
    state = dyn.init_dynamics(key, cfg, backend="covariance")
    x0 = jnp.zeros((4, cfg.xdim))
    x = dyn.forecast(state, x0, key, n_step=7, noise=True)
    assert x.shape == (8, 4, cfg.xdim)
    assert np.all(np.isfinite(np.asarray(x)))


def test_kalman_dynamics_variant(key):
    """cfg.dynamics_update='kalman' — the weight-diffusion alternative the
    reference keeps commented at vjf/model.py:372 — trains end-to-end."""
    from vjf_tpu.config import StepFlags
    from vjf_tpu.models import vjf as core

    cfg = _cfg(udim=0, rls_backend="covariance",
               dynamics_update="kalman", kalman_diffusion=0.01)
    state = core.init_state(key, cfg)
    T, B = 30, 3
    ys = jax.random.normal(key, (T, B, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((T, B, 0), dtype=jnp.float64)
    out = core.run_epoch(cfg, StepFlags(), state, ys, us, key, jnp.asarray(1e-3))
    assert np.all(np.isfinite(np.asarray(out.metrics.loss)))
    assert not np.allclose(np.asarray(out.state.dynamics.blr.w_mean),
                           np.asarray(state.dynamics.blr.w_mean))


def test_recognition_activation_kwarg(key):
    """Recognition(activation=...) — vjf/recognition.py:17. relu must match
    a manual forward; tanh is the default and must equal the old behavior."""
    ydim, xdim, n = 6, 2, 5
    params = Rec.init_recognition(key, ydim, xdim, 0, (4,), dtype=jnp.float64)
    y = jax.random.normal(key, (n, ydim), dtype=jnp.float64)
    qs = Gaussian(jnp.zeros((n, xdim)), jnp.zeros((n, xdim)))

    q_relu = Rec.apply_recognition(params, y, qs, activation="relu")
    h = jnp.concatenate([y, qs.mean, qs.logvar], axis=-1)
    h = jax.nn.relu(h @ params.layers[0].w.T + params.layers[0].b)
    np.testing.assert_allclose(np.asarray(q_relu.mean), np.asarray(h @ params.mean.w.T))

    q_tanh = Rec.apply_recognition(params, y, qs)
    assert not np.allclose(np.asarray(q_relu.mean), np.asarray(q_tanh.mean))

    # end-to-end: a non-tanh model must run (fused kernel auto-disabled)
    from vjf_tpu import VJF

    m = VJF.make_model(ydim, xdim, 0, n_rbf=8, hidden_sizes=[4],
                       likelihood="gaussian", dtype="float64",
                       recognition_activation="relu")
    mu, logvar, loss = m.fit(np.random.default_rng(0).normal(size=(20, ydim)),
                             max_iter=2)
    assert np.isfinite(loss)


def test_nonbayes_linear_regression(key):
    """LinearRegression(bayes=False) — vjf/module.py:46-50,66-68: w is a
    gradient-trained parameter; forward is the point prediction F w."""
    from vjf_tpu.models import regression as R

    nf, nout, n = 7, 2, 12
    state = R.init_nonbayes(nf, nout, dtype=jnp.float64)
    feat = jax.random.normal(key, (n, nf), dtype=jnp.float64)
    target = jax.random.normal(key, (n, nout), dtype=jnp.float64)

    assert R.predict_point(state, feat).shape == (n, nout)

    # gradient-trainable: a few SGD steps reduce MSE (the defining property
    # vs the Bayesian mode, whose w_mean never sees the optimizer)
    def loss_fn(st):
        return jnp.mean((R.predict_point(st, feat) - target) ** 2)

    l0 = float(loss_fn(state))
    for _ in range(50):
        g = jax.grad(loss_fn)(state)
        state = jax.tree.map(lambda p, gi: p - 0.1 * gi, state, g)
    assert float(loss_fn(state)) < 0.5 * l0


def test_joseph_quirk_matches_torch_reference(key):
    """``joseph_update(quirk=True)`` replicates the reference's
    double-``S^{-1}`` gain (``vjf/kalman.py:131-139``) bit-faithfully on
    identical inputs — the strict-parity mode VERDICT r2 asked for; the
    default (quirk=False) is the corrected update and must differ."""
    torch = pytest.importorskip("torch")

    from vjf import kalman as ref_kalman
    from vjf_tpu.ops import kalman as K

    torch.set_default_dtype(torch.double)
    rng = np.random.default_rng(42)
    nf, nout, b = 6, 3, 4
    w = rng.normal(size=(nf, nout))
    a_raw = rng.normal(size=(nf, nf))
    v0 = a_raw @ a_raw.T + nf * np.eye(nf)         # PD covariance
    l0 = np.linalg.cholesky(v0)
    h = rng.normal(size=(b, nf))
    target = rng.normal(size=(b, nout))
    q = 0.01 * np.eye(nf)
    r = 0.5 * np.eye(b)

    ty, tx, tv = ref_kalman.predict(
        torch.tensor(w), torch.tensor(l0), torch.eye(nf), torch.tensor(q),
        torch.tensor(h), torch.tensor(r))
    tw, tl = ref_kalman.joseph_update(
        torch.tensor(target), ty, tx, tv, torch.tensor(h), torch.tensor(r))

    jy, jx, jv = K.predict(
        jnp.asarray(w), jnp.asarray(l0), jnp.eye(nf), jnp.asarray(q),
        jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), rtol=1e-10,
                               atol=1e-12)
    jw_q, jl_q = K.joseph_update(
        jnp.asarray(target), jy, jx, jv, jnp.asarray(h), jnp.asarray(r),
        quirk=True)
    np.testing.assert_allclose(np.asarray(jw_q), tw.numpy(), rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(jl_q @ jl_q.T),
                               (tl @ tl.T).numpy(), rtol=1e-9, atol=1e-11)
    # the corrected default is a DIFFERENT update (the quirk is real)
    jw_c, _ = K.joseph_update(
        jnp.asarray(target), jy, jx, jv, jnp.asarray(h), jnp.asarray(r))
    assert not np.allclose(np.asarray(jw_c), tw.numpy(), atol=1e-6)


def test_regression_kalman_quirk_matches_torch_reference(key):
    """``regression.kalman(quirk=True)`` == the reference's
    ``LinearRegression.kalman`` (``vjf/module.py:114-142``) end-to-end,
    copied weights and features, cfg.joseph_quirk plumbing included."""
    torch = pytest.importorskip("torch")

    from vjf.module import RBF as RefRBF
    from vjf.module import LinearRegression as RefLR
    from vjf_tpu.models import regression as R

    torch.set_default_dtype(torch.double)
    rng = np.random.default_rng(7)
    nf, xdim, nout, b = 9, 2, 2, 5
    ref = RefLR(RefRBF(xdim, nf), nout)
    w0 = rng.normal(size=(nf, nout))
    c_raw = rng.normal(size=(nf, nf)) * 0.3
    v0 = c_raw @ c_raw.T + np.eye(nf)
    ref.w_mean = torch.tensor(w0)
    ref.w_chol = torch.tensor(np.linalg.cholesky(v0))
    x = rng.normal(size=(b, xdim))
    target = rng.normal(size=(b, nout))
    v, diffusion = 0.3, 0.05
    feat = ref.feature(torch.tensor(x)).numpy()     # same features both sides
    ref.kalman(torch.tensor(x), torch.tensor(target), torch.tensor(v),
               diffusion=diffusion)

    state = R.CovarianceBLR(jnp.asarray(w0), jnp.asarray(v0))
    new = R.kalman(state, jnp.asarray(feat), jnp.asarray(target),
                   jnp.asarray(v), diffusion=diffusion, quirk=True)
    np.testing.assert_allclose(np.asarray(new.w_mean), ref.w_mean.numpy(),
                               rtol=1e-9, atol=1e-11)
    ref_cov = (ref.w_chol @ ref.w_chol.t()).numpy()
    np.testing.assert_allclose(np.asarray(new.cov), ref_cov,
                               rtol=1e-9, atol=1e-11)


def test_update_per_module_toggles(key):
    """VJF.update(likelhood=, transition=) — vjf/model.py:156-177: each
    toggle gates exactly its module's closed-form update."""
    from vjf_tpu import VJF

    ydim, xdim, n = 6, 2, 8
    rng = np.random.default_rng(3)
    y = rng.normal(size=(n, ydim))
    xs = rng.normal(size=(n, xdim))
    xt = xs + 0.1 * rng.normal(size=(n, xdim))

    m = VJF.make_model(ydim, xdim, 0, n_rbf=8, hidden_sizes=[4],
                       likelihood="gaussian", dtype="float64")
    w0 = np.asarray(m.state.dynamics.blr.w_mean).copy()
    lv0 = float(m.state.params.likelihood.logvar)

    m.update(y, xs, xt=xt, likelhood=False, transition=True)
    assert float(m.state.params.likelihood.logvar) == lv0          # untouched
    assert not np.allclose(np.asarray(m.state.dynamics.blr.w_mean), w0)

    w1 = np.asarray(m.state.dynamics.blr.w_mean).copy()
    m.update(y, xs, xt=xt, likelhood=True, transition=False)
    np.testing.assert_array_equal(np.asarray(m.state.dynamics.blr.w_mean), w1)
    assert float(m.state.params.likelihood.logvar) != lv0          # updated

    # the corrected-spelling alias wins over the reference's typo'd kwarg
    lv2 = float(m.state.params.likelihood.logvar)
    m.update(y, xs, xt=xt, likelhood=True, likelihood=False, transition=False)
    assert float(m.state.params.likelihood.logvar) == lv2

    # functional path: StepFlags toggles through filter_step
    from vjf_tpu.config import StepFlags
    from vjf_tpu.models import vjf as core

    cfg = m.cfg
    st = m.state
    qs = core.prior(st.params, n)
    eps = jax.random.normal(key, (2, n, xdim), cfg.jdtype)
    flags = StepFlags(update_transition=False)
    st2, _, _ = core.filter_step(cfg, flags, st, qs, jnp.asarray(y, cfg.jdtype),
                                 None, eps[0], eps[1], jnp.asarray(0.0, cfg.jdtype))
    np.testing.assert_array_equal(np.asarray(st2.dynamics.blr.w_mean),
                                  np.asarray(st.dynamics.blr.w_mean))
    assert int(st2.lik_n_sample) > int(st.lik_n_sample)            # lik updated


def test_forecast_u_length_validation(key):
    """vjf/model.py:352: u must have length n_step if present."""
    from vjf_tpu import VJF

    m = VJF.make_model(6, 2, 1, n_rbf=8, hidden_sizes=[4],
                       likelihood="gaussian", dtype="float64")
    u_bad = np.zeros((3, 1, 1))
    with pytest.raises(ValueError, match="n_step"):
        m.forecast(np.zeros(2), u=u_bad, n_step=5)
    x, yh = m.forecast(np.zeros(2), u=np.zeros((5, 1, 1)), n_step=5)
    assert x.shape[0] == 6


def test_auto_backend_batch_hint(key):
    """'auto' must reach the covariance backend for small-batch streaming
    (the batch_hint threading — VERDICT r1 item 10)."""
    from vjf_tpu.models import regression as R
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=32, hidden_sizes=(4,),
                    likelihood="gaussian", dtype="float32", rls_backend="auto")
    st_stream = core.init_state(key, cfg, batch_hint=1)
    assert isinstance(st_stream.dynamics.blr, R.CovarianceBLR)
    st_batch = core.init_state(key, cfg, batch_hint=256)
    assert isinstance(st_batch.dynamics.blr, R.NSVBLR)
    st_default = core.init_state(key, cfg)
    assert isinstance(st_default.dynamics.blr, R.NSVBLR)


def test_noise_updates_skip_inf_mse_instead_of_clamping():
    """Regression: the finiteness gate ran on the POST-clip log-variance,
    so an inf residual MSE (overflowing f32 square of finite-huge values,
    the trap-12/14 class) was laundered into the finite +clamp and
    CEMENTED. The gate reads the pre-clip value now: the update is
    skipped, state unchanged."""
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import dynamics as dyn
    from vjf_tpu.models.likelihoods import gaussian_lik_update, init_gaussian_lik

    cfg = VJFConfig(ydim=4, xdim=2, udim=0, n_rbf=6, hidden_sizes=(4,),
                    likelihood="gaussian", dtype="float32")
    state = dyn.init_dynamics(jax.random.PRNGKey(0), cfg)
    xt = jnp.full((3, 2), 1e25, jnp.float32)      # dx^2 overflows f32 -> inf
    xs = jnp.zeros((3, 2), jnp.float32)
    new = dyn.dynamics_update(cfg, state, xt, xs, warm_up=True)
    assert float(new.logvar) == float(state.logvar), "inf mse cemented"
    assert int(new.n_sample) == int(state.n_sample)

    lik = init_gaussian_lik(np.log(0.1), dtype=jnp.float32)
    n0 = jnp.zeros((), jnp.float32)
    eta = jnp.zeros((1, 4), jnp.float32)
    tgt = jnp.full((1, 4), 1e25, jnp.float32)
    lik2, n2 = gaussian_lik_update(lik, n0, eta, tgt)
    assert float(lik2.logvar) == float(lik.logvar)
    assert float(n2) == 0.0

    # SGP variant has the same guard now
    cfg_s = cfg.replace(dynamics="sgp", n_inducing=4)
    from vjf_tpu.gp import sgp as S
    st_s = S.init_sgp_dynamics(jax.random.PRNGKey(1), cfg_s)
    new_s = S.dynamics_update(cfg_s, st_s, xt, xs, warm_up=True)
    assert float(new_s.logvar) == float(st_s.logvar)
