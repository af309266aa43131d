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
