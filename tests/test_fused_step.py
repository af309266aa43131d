"""Fused whole-step Pallas kernel: the hand-written backward and the packed
kernel I/O must reproduce the XLA step exactly (f32 matmul mode, interpret
on CPU), across likelihoods, flags, control inputs, and depths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.ops.pallas import fused_step as F

FLAG_CASES = [
    StepFlags(),
    StepFlags(warm_up=True),
    StepFlags(sgd=False),
    StepFlags(update=False),
    StepFlags(train_decoder=False),
]


def _setup(key, likelihood="poisson", udim=0, hidden=(16,)):
    cfg = VJFConfig(ydim=20, xdim=3, udim=udim, n_rbf=30, hidden_sizes=hidden,
                    likelihood=likelihood, dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    B = 8
    if likelihood == "poisson":
        y = jax.random.poisson(key, 1.0, (B, cfg.ydim)).astype(jnp.float32)
    else:
        y = jax.random.normal(key, (B, cfg.ydim), jnp.float32)
    u = (jax.random.normal(key, (B, udim), jnp.float32) if udim else None)
    eps = jax.random.normal(key, (2, B, cfg.xdim), jnp.float32)
    return cfg, state, y, u, eps


@pytest.mark.parametrize("likelihood", ["poisson", "gaussian"])
@pytest.mark.parametrize("flags", FLAG_CASES, ids=[str(f) for f in FLAG_CASES])
def test_step_math_matches_autodiff_step(key, likelihood, flags):
    """The manual backward in step_math == jax.grad through filter_step."""
    cfg, state, y, u, eps = _setup(key, likelihood)
    qs = core.prior(state.params, y.shape[0])
    lr = jnp.asarray(1e-3, jnp.float32)

    st_ref, qt_ref, m_ref = core.filter_step(
        cfg, flags, state, qs, y, u, eps[0], eps[1], lr
    )

    carry = F.pad_carry(cfg, state)
    out = F.step_math(cfg, flags, carry, qs.mean, qs.logvar, y, u, eps[0], eps[1], lr)
    if flags.update and not flags.warm_up:
        out = F.exact_v_fallback(cfg, out, carry, u)
    st = F.unpad_carry(cfg, out.carry, state)

    def close(a, b, tol=2e-4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)

    close(out.scal.loss[0, 0], m_ref.loss)
    close(out.qt_mean, qt_ref.mean)
    close(st.params.recognition.layers[0].w, st_ref.params.recognition.layers[0].w)
    close(st.params.recognition.mean.w, st_ref.params.recognition.mean.w)
    close(st.params.decoder.w, st_ref.params.decoder.w)
    close(st.dynamics.blr.w_mean, st_ref.dynamics.blr.w_mean)
    close(st.dynamics.blr.cov, st_ref.dynamics.blr.cov)
    close(st.dynamics.logvar, st_ref.dynamics.logvar)
    if likelihood == "gaussian":
        close(st.params.likelihood.logvar, st_ref.params.likelihood.logvar)


def test_fused_epoch_matches_xla_epoch(key):
    """Full scan through the pallas kernel (interpret) == XLA epoch."""
    cfg, state, *_ = _setup(key, "poisson", udim=2, hidden=(16, 8))
    T, B = 25, 8
    ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    us = jax.random.normal(key, (T, B, 2), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr, noise=(eps[0], eps[1]))
    got = F.run_epoch_fused(cfg, flags, state, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)

    np.testing.assert_allclose(
        np.asarray(got.metrics.loss), np.asarray(ref.metrics.loss), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.q_means), np.asarray(ref.q_means), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.state.dynamics.blr.w_mean),
        np.asarray(ref.state.dynamics.blr.w_mean),
        rtol=1e-3, atol=1e-4,
    )
    assert int(got.state.dynamics.n_sample) == int(ref.state.dynamics.n_sample)


def test_fused_epoch_matches_xla_with_forgetting(key):
    """RLS forgetting factor (cfg.rls_shrink, the reference's `shrink` at
    vjf/module.py:80-96) + per-step jitter ridge on the FUSED path: the
    kernels must implement the same lam/jitter recursion as regression.rls
    (the fused path used to silently ignore both). Exercises both the
    per-step layout and the mega layout's cond-free segment."""
    cfg = VJFConfig(ydim=14, xdim=2, udim=0, n_rbf=16, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=20,
                    rls_shrink=0.99, chol_jitter=1e-3)
    state = core.init_state(key, cfg)
    T, B = 60, 8
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr, noise=(eps[0], eps[1]))
    for layout in ("stepwise", "mega"):
        got = F.run_epoch_fused(cfg.replace(fused_epoch=layout), flags, state,
                                ys, us, key, lr, noise=(eps[0], eps[1]),
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got.metrics.loss),
                                   np.asarray(ref.metrics.loss),
                                   rtol=5e-4, atol=5e-4, err_msg=layout)
        # steady-state tau sits at ~0.2-0.29 by construction (with
        # forgetting tau does NOT decay: memory ~ 1/(1-lam)), so steps just
        # above NS_TAU_THRESHOLD take the exact-Cholesky cond on the
        # stepwise/XLA paths but the escalated-NS branch on mega — the
        # small bounded difference between those algorithms sets the atol
        # (measured |P V - I| stays ~5e-4 on both layouts).
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                                   np.asarray(ref.state.dynamics.blr.w_mean),
                                   rtol=2e-3, atol=2e-3, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.precision),
                                   np.asarray(ref.state.dynamics.blr.precision),
                                   rtol=2e-3, atol=2e-3, err_msg=layout)
        # the padded identity block must survive the forgetting recursion
        # bit-clean (pure shrink would decay it; its V inverse would blow up)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.cov),
                                   np.asarray(ref.state.dynamics.blr.cov),
                                   rtol=5e-3, atol=5e-3, err_msg=layout)


def test_mega_epoch_matches_stepwise_and_xla(key):
    """The grid-over-time mega kernel (prefix + cond-free steady state) must
    reproduce the per-step cond path and the XLA epoch. The regime is sized
    so tau contracts below threshold within the prefix (n_rbf=20, B=16,
    prefix=100) — the steady-state segment then exercises the in-kernel
    Newton-Schulz escalation branches instead of the exact fallback. T is
    deliberately not a multiple of the scalar-pack row block (8)."""
    cfg = VJFConfig(ydim=20, xdim=3, udim=0, n_rbf=20, hidden_sizes=(16,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=100)
    state = core.init_state(key, cfg)
    T, B = 163, 16
    ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    got = F.run_epoch_fused(cfg, flags, state, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)
    tau = np.asarray(got.metrics.tau)
    assert tau[cfg.ns_prefix:].max() < F.NS_TAU_THRESHOLD, "regime drifted hot"

    ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags, state,
                            ys, us, key, lr, noise=(eps[0], eps[1]), interpret=True)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.q_means), np.asarray(ref.q_means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.cov),
                               np.asarray(ref.state.dynamics.blr.cov),
                               rtol=1e-3, atol=1e-4)

    xla = core.run_epoch(cfg, flags, state, ys, us, key, lr, noise=(eps[0], eps[1]))
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(xla.metrics.loss), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.q_means), np.asarray(xla.q_means),
                               rtol=2e-3, atol=2e-4)


def test_mega_epoch_warmup_no_prefix(key):
    """Warm-up epochs skip RLS entirely, so the whole epoch runs mega with
    no prefix; must still match the stepwise layout."""
    cfg = VJFConfig(ydim=12, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=100)
    state = core.init_state(key, cfg)
    T, B = 30, 4
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags(warm_up=True)

    got = F.run_epoch_fused(cfg, flags, state, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)
    ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags, state,
                            ys, us, key, lr, noise=(eps[0], eps[1]), interpret=True)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.q_means), np.asarray(ref.q_means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.state.params.likelihood.logvar),
        np.asarray(ref.state.params.likelihood.logvar), rtol=1e-4)


def test_logvar_clamp_gradient_mask(key):
    """When the qt_logvar runaway clamp binds, the hand-written backward
    must zero the gradient into the logvar head exactly like jax.grad
    through jnp.clip on the XLA path (r1 advisor finding)."""
    cfg, state, y, u, eps = _setup(key, "gaussian")
    cfg = cfg.replace(logvar_clamp=0.05)   # tiny clamp: binds immediately
    qs = core.prior(state.params, y.shape[0])
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags(update=False)

    st_ref, _, _ = core.filter_step(cfg, flags, state, qs, y, u, eps[0], eps[1], lr)
    carry = F.pad_carry(cfg, state)
    out = F.step_math(cfg, flags, carry, qs.mean, qs.logvar, y, u, eps[0], eps[1], lr)
    st = F.unpad_carry(cfg, out.carry, state)

    # the clamp must actually bind for this test to mean anything
    assert np.any(np.abs(np.asarray(out.qt_logvar)) >= cfg.logvar_clamp - 1e-6)
    np.testing.assert_allclose(
        np.asarray(st.params.recognition.logvar.w),
        np.asarray(st_ref.params.recognition.logvar.w), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st.params.recognition.logvar.b),
        np.asarray(st_ref.params.recognition.logvar.b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st.params.recognition.layers[0].w),
        np.asarray(st_ref.params.recognition.layers[0].w), rtol=1e-5, atol=1e-6)


def test_pad_unpad_roundtrip(key):
    cfg, state, *_ = _setup(key, "gaussian", udim=1)
    carry = F.pad_carry(cfg, state)
    back = F.unpad_carry(cfg, carry, state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fused_epoch_nonaligned_nrbf(key):
    """Padding contract: n_rbf not a multiple of 128 (150 -> 256 pad) stays
    exactly decoupled through the whole update chain."""
    cfg = VJFConfig(ydim=12, xdim=2, udim=0, n_rbf=150, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 20, 4
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    ref = core.run_epoch(cfg, StepFlags(), state, ys, us, key, lr, noise=(eps[0], eps[1]))
    got = F.run_epoch_fused(cfg, StepFlags(), state, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)
    # this config has a violent early transient (large tau, near-threshold
    # NS-vs-exact branch choices), so compare trajectories, not bits
    np.testing.assert_allclose(np.asarray(got.metrics.loss), np.asarray(ref.metrics.loss),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.precision),
                               np.asarray(ref.state.dynamics.blr.precision),
                               rtol=2e-2, atol=1e-2)
    assert got.state.dynamics.blr.w_mean.shape == (150, 2)
    assert np.all(np.isfinite(np.asarray(got.state.dynamics.blr.w_mean)))


def test_sgp_step_math_matches_xla_step(key):
    """SGP dynamics through the fused kernel math: the whitened-feature
    matmul (w_white = scale^2 L^{-T}) + DTC variance correction must
    reproduce the XLA SGP step (gp/sgp.py features/predict/update)."""
    cfg = VJFConfig(ydim=20, xdim=3, udim=0, dynamics="sgp", n_inducing=30,
                    sgp_scale=1.2, sgp_lengthscale=0.8, hidden_sizes=(16,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    B = 8
    y = jax.random.normal(key, (B, cfg.ydim), jnp.float32)
    eps = jax.random.normal(key, (2, B, cfg.xdim), jnp.float32)
    qs = core.prior(state.params, B)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    st_ref, qt_ref, m_ref = core.filter_step(
        cfg, flags, state, qs, y, None, eps[0], eps[1], lr
    )

    carry = F.pad_carry(cfg, state)
    assert carry.w_white is not None and carry.scale2 is not None
    out = F.step_math(cfg, flags, carry, qs.mean, qs.logvar, y, None,
                      eps[0], eps[1], lr)
    out = F.exact_v_fallback(cfg, out, carry, None)
    st = F.unpad_carry(cfg, out.carry, state)

    def close(a, b, tol=2e-4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=tol, atol=tol)

    close(out.scal.loss[0, 0], m_ref.loss)
    close(out.qt_mean, qt_ref.mean)
    close(st.dynamics.blr.w_mean, st_ref.dynamics.blr.w_mean)
    close(st.dynamics.blr.cov, st_ref.dynamics.blr.cov, tol=5e-4)
    close(st.dynamics.logvar, st_ref.dynamics.logvar)
    # SGP-static fields pass through untouched
    np.testing.assert_array_equal(np.asarray(st.dynamics.inducing),
                                  np.asarray(state.dynamics.inducing))
    np.testing.assert_array_equal(np.asarray(st.dynamics.whiten),
                                  np.asarray(state.dynamics.whiten))


def test_sgp_mega_epoch_matches_xla_epoch(key):
    """Full SGP epoch through the fused runner (prefix + mega, interpret)
    == the XLA SGP epoch."""
    cfg = VJFConfig(ydim=16, xdim=2, udim=0, dynamics="sgp", n_inducing=20,
                    sgp_scale=1.0, sgp_lengthscale=1.0, hidden_sizes=(12,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=40)
    state = core.init_state(key, cfg)
    T, B = 90, 8
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr, noise=(eps[0], eps[1]))
    got = F.run_epoch_fused(cfg, flags, state, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)

    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.q_means), np.asarray(ref.q_means),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=2e-3, atol=2e-4)
    assert int(got.state.dynamics.n_sample) == int(ref.state.dynamics.n_sample)


def test_api_forward_surface(key):
    """VJF.forward mirrors the reference's forward tuple (vjf/model.py:97-122)."""
    from vjf_tpu import VJF

    model = VJF.make_model(8, 2, 0, n_rbf=10, hidden_sizes=[5],
                           likelihood="gaussian", dtype="float64")
    y = np.random.default_rng(0).normal(size=(3, 8))
    xs, pt, qt, xt, py = model.forward(y)
    assert xs.shape == (3, 2) and xt.shape == (3, 2)
    assert pt.mean.shape == (3, 2) and qt.mean.shape == (3, 2)
    assert py.shape == (3, 8)


def test_skip_gate_nonfinite_grad_finite_loss(key):
    """The r1 skip-gate deviation, closed: a NON-FINITE GRADIENT under a
    FINITE loss (every raw ELBO component finite) must skip the SGD step on
    BOTH paths. Construction: xt == 0 exactly (eps_t = 0, zero mean head)
    keeps the decode finite while a huge decoder weight overflows the
    backward (g_xt = g_py @ W_dec = inf), and the reparametrization factor
    eps_t = 0 turns it into NaN (inf * 0) in the logvar-head gradient —
    clip() would pass that NaN straight into the weights."""
    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    # zero mean head => qt_m = 0; with eps_t = 0, xt = 0 exactly
    rec = state.params.recognition
    rec = rec._replace(mean=rec.mean._replace(w=jnp.zeros_like(rec.mean.w)))
    dec = state.params.decoder._replace(
        w=jnp.full_like(state.params.decoder.w, 1e38))
    state = state._replace(params=state.params._replace(recognition=rec,
                                                        decoder=dec))
    B = 4
    y = 10.0 * jax.random.normal(key, (B, cfg.ydim), jnp.float32)
    eps_s = jax.random.normal(key, (B, cfg.xdim), jnp.float32)
    eps_t = jnp.zeros((B, cfg.xdim), jnp.float32)
    qs = core.prior(state.params, B)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags(update=False)

    # the construction must actually produce a non-finite gradient leaf
    def loss_fn(params):
        (l_recon, l_dyn, h), _ = core.elbo_terms(
            cfg, params, state.dynamics, qs, y, None, eps_s, eps_t)
        return l_recon - h + l_dyn
    grads = jax.grad(loss_fn)(state.params)
    bad = [not bool(jnp.all(jnp.isfinite(g)))
           for g in jax.tree_util.tree_leaves(grads)]
    assert any(bad), "construction no longer produces a non-finite gradient"

    # XLA path: finite loss, step skipped
    st_x, _, m_x = core.filter_step(cfg, flags, state, qs, y, None,
                                    eps_s, eps_t, lr)
    assert bool(jnp.isfinite(m_x.loss))
    for a, b in zip(jax.tree_util.tree_leaves(st_x.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fused path: same finite loss, same skip (grad_check gate)
    carry = F.pad_carry(cfg, state)
    out = F.step_math(cfg, flags, carry, qs.mean, qs.logvar, y, None,
                      eps_s, eps_t, lr)
    assert bool(np.isfinite(np.asarray(out.scal.loss)[0, 0]))
    st_f = F.unpad_carry(cfg, out.carry, state)
    for a, b in zip(jax.tree_util.tree_leaves(st_f.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(st_f.params.recognition.logvar.w)))


# ---------------------------------------------------------------------------
# Trial-mask (ragged) support on the fused/mega path
# ---------------------------------------------------------------------------


def test_fused_masked_epoch_matches_xla_masked(key):
    """Ragged-trial masks ride the fused kernels now: the masked fused
    epoch (both layouts) must reproduce the masked XLA epoch — same
    injected noise, NaN padding on the dead trial, renormalized batch
    means, frozen carries, gated RLS/noise counters."""
    cfg = VJFConfig(ydim=14, xdim=2, udim=0, n_rbf=16, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=20)
    state = core.init_state(key, cfg)
    T, B, T2 = 60, 4, 35
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    ys = ys.at[T2:, 1].set(jnp.nan)                  # trial 1 ends at T2
    mask = jnp.ones((T, B), jnp.float32).at[T2:, 1].set(0.0)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr,
                         noise=(eps[0], eps[1]), mask=mask)
    for layout in ("stepwise", "mega"):
        got = F.run_epoch_fused(cfg.replace(fused_epoch=layout), flags, state,
                                ys, us, key, lr, noise=(eps[0], eps[1]),
                                interpret=True, mask=mask)
        np.testing.assert_allclose(np.asarray(got.metrics.loss),
                                   np.asarray(ref.metrics.loss),
                                   rtol=5e-4, atol=5e-4, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.q_means),
                                   np.asarray(ref.q_means),
                                   rtol=1e-3, atol=1e-4, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                                   np.asarray(ref.state.dynamics.blr.w_mean),
                                   rtol=2e-3, atol=2e-3, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.logvar),
                                   np.asarray(ref.state.dynamics.logvar),
                                   rtol=1e-3, atol=1e-3, err_msg=layout)
        # counters advance by the VALID count only
        assert int(got.state.dynamics.n_sample) == int(ref.state.dynamics.n_sample)
        np.testing.assert_allclose(float(got.state.lik_n_sample),
                                   float(ref.state.lik_n_sample), rtol=1e-6)
        # frozen carry over the dead trial's padding
        last = np.asarray(got.q_means[T2 - 1, 1])
        for t in range(T2, T):
            np.testing.assert_array_equal(np.asarray(got.q_means[t, 1]), last)


def test_fused_mask_all_ones_matches_unmasked(key):
    """An all-ones mask through the fused path is numerically the unmasked
    computation (selects no-op, inv_b identical)."""
    cfg = VJFConfig(ydim=12, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=10)
    state = core.init_state(key, cfg)
    T, B = 30, 4
    ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    for layout in ("stepwise", "mega"):
        c = cfg.replace(fused_epoch=layout)
        plain = F.run_epoch_fused(c, flags, state, ys, us, key, lr,
                                  noise=(eps[0], eps[1]), interpret=True)
        ones = F.run_epoch_fused(c, flags, state, ys, us, key, lr,
                                 noise=(eps[0], eps[1]), interpret=True,
                                 mask=jnp.ones((T, B), jnp.float32))
        np.testing.assert_allclose(np.asarray(ones.metrics.loss),
                                   np.asarray(plain.metrics.loss),
                                   rtol=1e-6, atol=1e-6, err_msg=layout)
        np.testing.assert_allclose(
            np.asarray(ones.state.dynamics.blr.w_mean),
            np.asarray(plain.state.dynamics.blr.w_mean),
            rtol=1e-5, atol=1e-6, err_msg=layout,
        )


def test_fused_masked_padding_invariance_b1(key):
    """B=1: a padded+masked fused run == the unpadded fused run bit-for-bit
    on the valid prefix, with zero loss and frozen carry over the pad (the
    fused analogue of the XLA padding-invariance contract)."""
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=10,
                    fused_epoch="mega")
    state = core.init_state(key, cfg)
    t0, t_pad = 40, 56
    k1, k2 = jax.random.split(key)
    y_valid = jax.random.normal(k1, (t0, 1, cfg.ydim), jnp.float32)
    ys = jnp.concatenate(
        [y_valid, jnp.full((t_pad - t0, 1, cfg.ydim), jnp.nan, jnp.float32)]
    )
    us_p = jnp.zeros((t_pad, 1, 0), jnp.float32)
    eps = jax.random.normal(k2, (t_pad, 2, 1, cfg.xdim), jnp.float32)
    mask = jnp.concatenate([jnp.ones((t0, 1)), jnp.zeros((t_pad - t0, 1))])
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = F.run_epoch_fused(cfg, flags, state, y_valid, us_p[:t0], key, lr,
                            noise=(eps[:t0, 0], eps[:t0, 1]), interpret=True)
    got = F.run_epoch_fused(cfg, flags, state, ys, us_p, key, lr,
                            noise=(eps[:, 0], eps[:, 1]), interpret=True,
                            mask=mask)

    for a, b in zip(jax.tree_util.tree_leaves(ref.state),
                    jax.tree_util.tree_leaves(got.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref.q_means),
                                  np.asarray(got.q_means[:t0]))
    assert np.all(np.asarray(got.metrics.loss[t0:]) == 0.0)
    last = np.asarray(got.q_means[t0 - 1])
    for t in range(t0, t_pad):
        np.testing.assert_array_equal(np.asarray(got.q_means[t]), last)
    assert np.all(np.isfinite(np.asarray(got.q_means)))


# ---------------------------------------------------------------------------
# Channel-mask (missing observations) support on the fused/mega path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("lik", ["gaussian", "poisson"])
def test_fused_channel_masked_epoch_matches_xla(key, lik):
    """Electrode dropout rides the fused kernels: the channel-masked fused
    epoch (both layouts) must reproduce the channel-masked XLA epoch —
    NaN holes sanitized, masked entries out of the likelihood sum and its
    gradient, in-kernel imputation feedback into the recognition input,
    and (Gaussian) the per-observed-entry logvar constant + fractional
    obs-noise sample count."""
    cfg = VJFConfig(ydim=14, xdim=2, udim=0, n_rbf=16, hidden_sizes=(10,),
                    likelihood=lik, dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=20)
    state = core.init_state(key, cfg)
    T, B = 50, 4
    if lik == "poisson":
        ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    else:
        ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    rng = np.random.default_rng(3)
    cm = jnp.asarray((rng.uniform(size=(T, B, cfg.ydim)) > 0.3).astype(np.float32))
    ys = jnp.where(cm > 0, ys, jnp.nan)          # NaN at every missing entry
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr,
                         noise=(eps[0], eps[1]), channel_mask=cm)
    for layout in ("stepwise", "mega"):
        got = F.run_epoch_fused(cfg.replace(fused_epoch=layout), flags, state,
                                ys, us, key, lr, noise=(eps[0], eps[1]),
                                interpret=True, channel_mask=cm)
        np.testing.assert_allclose(np.asarray(got.metrics.loss),
                                   np.asarray(ref.metrics.loss),
                                   rtol=5e-4, atol=5e-4, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.q_means),
                                   np.asarray(ref.q_means),
                                   rtol=1e-3, atol=1e-3, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                                   np.asarray(ref.state.dynamics.blr.w_mean),
                                   rtol=2e-3, atol=2e-3, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.logvar),
                                   np.asarray(ref.state.dynamics.logvar),
                                   rtol=1e-3, atol=1e-3, err_msg=layout)
        # fractional obs-noise sample count (sum(cm)/ydim per step)
        np.testing.assert_allclose(float(got.state.lik_n_sample),
                                   float(ref.state.lik_n_sample), rtol=1e-5)
        if lik == "gaussian":
            np.testing.assert_allclose(
                np.asarray(got.state.params.likelihood.logvar),
                np.asarray(ref.state.params.likelihood.logvar),
                rtol=1e-4, err_msg=layout)


def test_fused_channel_mask_all_ones_matches_unmasked(key):
    """An all-ones channel mask through the fused path is numerically the
    unmasked computation (selection no-ops, cm_sum == B * ydim)."""
    cfg = VJFConfig(ydim=12, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=10)
    state = core.init_state(key, cfg)
    T, B = 30, 4
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    for layout in ("stepwise", "mega"):
        c = cfg.replace(fused_epoch=layout)
        plain = F.run_epoch_fused(c, flags, state, ys, us, key, lr,
                                  noise=(eps[0], eps[1]), interpret=True)
        ones = F.run_epoch_fused(c, flags, state, ys, us, key, lr,
                                 noise=(eps[0], eps[1]), interpret=True,
                                 channel_mask=jnp.ones_like(ys))
        np.testing.assert_allclose(np.asarray(ones.metrics.loss),
                                   np.asarray(plain.metrics.loss),
                                   rtol=1e-6, atol=1e-6, err_msg=layout)
        np.testing.assert_allclose(
            np.asarray(ones.state.dynamics.blr.w_mean),
            np.asarray(plain.state.dynamics.blr.w_mean),
            rtol=1e-5, atol=1e-6, err_msg=layout,
        )
        np.testing.assert_allclose(
            np.asarray(ones.state.params.likelihood.logvar),
            np.asarray(plain.state.params.likelihood.logvar),
            rtol=1e-6, err_msg=layout,
        )


def test_fused_combined_masks_match_xla(key):
    """Trial mask + channel mask together on the fused kernels: dropped
    channels AND a ragged trial, vs the XLA epoch. The per-entry validity
    folds the trial column into the channel statistics (cm_sum runs over
    valid trials only)."""
    cfg = VJFConfig(ydim=14, xdim=2, udim=0, n_rbf=16, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=20)
    state = core.init_state(key, cfg)
    T, B, T2 = 50, 4, 30
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    rng = np.random.default_rng(9)
    cm = jnp.asarray((rng.uniform(size=(T, B, cfg.ydim)) > 0.25).astype(np.float32))
    ys = jnp.where(cm > 0, ys, jnp.nan)
    ys = ys.at[T2:, 2].set(jnp.nan)
    mask = jnp.ones((T, B), jnp.float32).at[T2:, 2].set(0.0)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr,
                         noise=(eps[0], eps[1]), mask=mask, channel_mask=cm)
    for layout in ("stepwise", "mega"):
        got = F.run_epoch_fused(cfg.replace(fused_epoch=layout), flags, state,
                                ys, us, key, lr, noise=(eps[0], eps[1]),
                                interpret=True, mask=mask, channel_mask=cm)
        np.testing.assert_allclose(np.asarray(got.metrics.loss),
                                   np.asarray(ref.metrics.loss),
                                   rtol=5e-4, atol=5e-4, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.q_means),
                                   np.asarray(ref.q_means),
                                   rtol=1e-3, atol=1e-3, err_msg=layout)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                                   np.asarray(ref.state.dynamics.blr.w_mean),
                                   rtol=2e-3, atol=2e-3, err_msg=layout)
        np.testing.assert_allclose(float(got.state.lik_n_sample),
                                   float(ref.state.lik_n_sample), rtol=1e-5)
        # frozen carry over the ragged trial's padding
        last = np.asarray(got.q_means[T2 - 1, 2])
        np.testing.assert_array_equal(np.asarray(got.q_means[-1, 2]), last)


def test_mega_large_batch_single_ns_iteration_matches_xla(key):
    """B >= 64 auto-selects ONE base Newton-Schulz iteration in the mega
    kernel (batch-adaptive: post-prefix tau is provably tiny at large B).
    The single-iteration steady state must still match the XLA epoch (3
    fixed iterations) within the standard fused tolerances."""
    from vjf_tpu.ops.pallas.fused_step import NS_ONE_ITER_MIN_BATCH

    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=8, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=64,
                    fused_epoch="mega")
    state = core.init_state(key, cfg)
    # tau decays like 1/(steps so far): the prefix must be long enough
    # that the mega segment starts genuinely contracted (tau < ~0.02),
    # which is the regime the 1-iteration steady state is designed for
    T, B = 200, NS_ONE_ITER_MIN_BATCH
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr,
                         noise=(eps[0], eps[1]))
    got = F.run_epoch_fused(cfg, flags, state, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss),
                               rtol=5e-4, atol=5e-4)
    # 5e-3 (vs the 2-iteration tests' 2e-3): the single-iteration polish
    # carries an O(tau^2) V residual that biases w slightly over the
    # 136-step mega segment; at flagship scale (tau ~ 1e-9) the A/B epoch
    # losses are identical — this small config runs at tau ~ 1e-2
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.cov),
                               np.asarray(ref.state.dynamics.blr.cov),
                               rtol=5e-3, atol=5e-3)
    # no step hit the skip ceiling, and the segment ends contracted (the
    # 0.05-0.25 band early in the segment is the +1-escalation's job)
    tau = np.asarray(got.metrics.tau[cfg.ns_prefix:])
    assert np.all(np.isfinite(tau)) and tau.max() < 0.25, tau.max()
    assert tau[-16:].max() < 0.05, tau[-16:].max()


def test_retired_mega_unroll_checkpoint_config_loads(tmp_path, key):
    """The mega_unroll knob was cut in r4 (measured ~1-3%, VMEM-OOM when
    masked — docs/RESULTS.md); a checkpoint whose config still carries it
    (or any other retired field) must load with a warning, not
    TypeError."""
    import json
    import os
    import warnings

    from vjf_tpu.utils.checkpoint import (
        load_checkpoint, load_config, save_checkpoint,
    )

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(4,),
                    likelihood="gaussian", dtype="float32")
    state = core.init_state(key, cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, state, cfg=cfg)
    meta = (os.path.join(path, "vjf_meta.json") if os.path.isdir(path)
            else path + ".meta.json")
    with open(meta) as f:
        d = json.load(f)
    d["mega_unroll"] = 4
    with open(meta, "w") as f:
        json.dump(d, f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg2 = load_config(path)
    assert any("mega_unroll" in str(x.message) for x in w)
    assert cfg2 == cfg
    restored, _ = load_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_repair_mechanism_and_gating(key):
    """cfg.rls_epoch_repair: an RLS-active fused epoch at B < 64 ('auto')
    starts by spectral-repairing the NSV pair — running from a poisoned
    (indefinite-P, drifted-V) state with repair enabled must equal an
    explicit regression.spectral_repair followed by a repair-off epoch,
    and must stay finite/bounded (the unrepaired canonical continuation
    exploded to |w| ~ 2e12 with the state noise pinned at +clamp)."""
    from vjf_tpu.models import regression as R

    cfg = VJFConfig(ydim=12, xdim=2, udim=0, n_rbf=16, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32", ns_prefix=4,
                    rls_shrink=0.999, chol_jitter=1e-3)
    state = core.init_state(key, cfg)

    # poison the tracked pair the way a long f32 stream does: indefinite P
    # (noise below the jitter floor), V drifted off the true inverse
    rng = np.random.default_rng(1)
    n = cfg.n_rbf
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.concatenate([np.geomspace(8.6e4, 1.0, n - 3), [1e-4, 0.0, -7.2]])
    p_bad = ((q * lam) @ q.T).astype(np.float32)
    v_bad = (np.linalg.pinv(p_bad.astype(np.float64))
             + 0.05 * rng.normal(size=(n, n))).astype(np.float32)
    blr_bad = R.NSVBLR(state.dynamics.blr.w_mean, jnp.asarray(p_bad),
                       jnp.asarray(v_bad))
    poisoned = state._replace(dynamics=state.dynamics._replace(blr=blr_bad))

    T, B = 40, 8
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    assert F.epoch_repair_enabled(cfg, 8)                  # auto: B < 64
    assert not F.epoch_repair_enabled(cfg, 64)
    assert F.epoch_repair_enabled(cfg.replace(rls_epoch_repair="on"), 256)
    assert not F.epoch_repair_enabled(cfg.replace(rls_epoch_repair="off"), 1)

    got = F.run_epoch_fused(cfg, flags, poisoned, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)

    manual = poisoned._replace(dynamics=poisoned.dynamics._replace(
        blr=R.spectral_repair(poisoned.dynamics.blr)))
    ref = F.run_epoch_fused(cfg.replace(rls_epoch_repair="off"), flags,
                            manual, ys, us, key, lr,
                            noise=(eps[0], eps[1]), interpret=True)

    for a, b in zip(jax.tree.leaves(got.state), jax.tree.leaves(ref.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    w = np.asarray(got.state.dynamics.blr.w_mean)
    assert np.isfinite(w).all() and np.abs(w).max() < 1e3
    resid = np.asarray(got.state.dynamics.blr.precision
                       @ got.state.dynamics.blr.cov) - np.eye(n)
    assert np.abs(resid).max() < 0.1        # tracking healthy after the epoch


def test_epoch_repair_mode_validation_and_helper(key):
    """A typo'd rls_epoch_repair mode must fail loudly (silently resolving
    'On'/'always' to 'auto' would skip the forced repair the user asked
    for), and maybe_epoch_repair — the ONE gate shared by the fused,
    sharded-fused, and hot-tau-demotion paths — must pass warm-up epochs,
    repair-off configs, and large-batch 'auto' through untouched while
    repairing an indefinite pair at small batch."""
    from vjf_tpu.models import regression as R

    cfg = VJFConfig(ydim=12, xdim=2, udim=0, n_rbf=16, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="off", matmul_dtype="float32",
                    rls_shrink=0.999, chol_jitter=1e-3)
    state = core.init_state(key, cfg)

    for bad in ("On", "always", "true", ""):
        with pytest.raises(ValueError, match="rls_epoch_repair"):
            F.epoch_repair_enabled(cfg.replace(rls_epoch_repair=bad), 8)

    rng = np.random.default_rng(2)
    n = cfg.n_rbf
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.concatenate([np.geomspace(8.6e4, 1.0, n - 2), [0.0, -7.2]])
    p_bad = ((q * lam) @ q.T).astype(np.float32)
    v_bad = (np.linalg.pinv(p_bad.astype(np.float64))
             + 0.05 * rng.normal(size=(n, n))).astype(np.float32)
    poisoned = state._replace(dynamics=state.dynamics._replace(
        blr=R.NSVBLR(state.dynamics.blr.w_mean, jnp.asarray(p_bad),
                     jnp.asarray(v_bad))))

    # RLS-inactive epochs and disabled/out-of-regime configs: identity
    assert F.maybe_epoch_repair(
        cfg, StepFlags(warm_up=True), poisoned, 8) is poisoned
    assert F.maybe_epoch_repair(
        cfg, StepFlags(update=False), poisoned, 8) is poisoned
    assert F.maybe_epoch_repair(
        cfg.replace(rls_epoch_repair="off"), StepFlags(), poisoned, 8
    ) is poisoned
    assert F.maybe_epoch_repair(cfg, StepFlags(), poisoned, 256) is poisoned

    # RLS-active small-batch 'auto': the indefinite pair comes back PD —
    # the state fit()'s demotion branch hands to the XLA re-run, whose
    # per-step exact fallback choleskys P directly
    repaired = F.maybe_epoch_repair(cfg, StepFlags(), poisoned, 8)
    evs = np.linalg.eigvalsh(
        np.asarray(repaired.dynamics.blr.precision, dtype=np.float64))
    assert evs.min() > 0
    np.testing.assert_array_equal(np.asarray(repaired.dynamics.blr.w_mean),
                                  np.asarray(poisoned.dynamics.blr.w_mean))
