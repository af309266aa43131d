"""Golden parity vs the runnable torch reference (SURVEY.md §7 step 4).

Both frameworks are driven with *identical* injected randomness (the
reference's ``reparametrize`` is monkeypatched to pop pre-generated draws;
ours takes eps explicitly) and identical initial parameters (copied from
the torch modules). Per-step negative-ELBO trajectories over full
filter-then-learn steps (SGD + RLS + noise running-variance) must then
agree to float64 round-off — the BASELINE.json tolerance is 1e-5.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.models.recognition import LinearParams, RecognitionParams
from vjf_tpu.models.regression import PrecisionBLR
from vjf_tpu.models.rbf import RBFParams
from vjf_tpu.models.dynamics import DynamicsState
from vjf_tpu.models.likelihoods import GaussianLikParams, PoissonLikParams
from vjf_tpu.types import Gaussian

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")
torch.set_default_dtype(torch.double)


def _t2j(t):
    # copy=True is load-bearing: jax-on-CPU can zero-copy alias the numpy
    # view of torch storage, and torch's in-place optimizer updates would
    # silently mutate "our" parameters mid-comparison.
    return jnp.asarray(np.array(t.detach(), copy=True), dtype=jnp.float64)


def make_pair(ydim, xdim, udim, n_rbf, hidden, likelihood, seed=0):
    """Build a torch reference model and mirror its exact parameters into a
    vjf_tpu TrainState (precision backend, float64)."""
    from vjf.model import VJF as RefVJF

    torch.manual_seed(seed)
    ref = RefVJF.make_model(ydim, xdim, udim, n_rbf, list(hidden), likelihood)

    cfg = VJFConfig(
        ydim=ydim, xdim=xdim, udim=udim, n_rbf=n_rbf, hidden_sizes=tuple(hidden),
        likelihood=likelihood, dtype="float64", rls_backend="precision",
    )

    lin = [m for m in ref.recognition.mlp if isinstance(m, torch.nn.Linear)]
    rec = RecognitionParams(
        layers=tuple(LinearParams(_t2j(m.weight), _t2j(m.bias)) for m in lin),
        mean=LinearParams(_t2j(ref.recognition.mean.weight), None),
        logvar=LinearParams(
            _t2j(ref.recognition.logvar.weight), _t2j(ref.recognition.logvar.bias)
        ),
    )
    dec = LinearParams(_t2j(ref.decoder.decode.weight), _t2j(ref.decoder.decode.bias))
    if likelihood == "gaussian":
        lik = GaussianLikParams(logvar=_t2j(ref.likelihood.logvar))
    else:
        lik = PoissonLikParams()
    params = core.Params(
        recognition=rec,
        decoder=dec,
        likelihood=lik,
        prior=core.PriorParams(_t2j(ref.mean), _t2j(ref.logvar)),
    )
    nf = n_rbf
    dynamics = DynamicsState(
        rbf=RBFParams(
            _t2j(ref.transition.velocity.feature.centroid),
            _t2j(ref.transition.velocity.feature.logwidth),
        ),
        blr=PrecisionBLR(
            w_mean=_t2j(ref.transition.velocity.w_mean),
            precision=_t2j(ref.transition.velocity.w_precision),
            prec_chol=jnp.eye(nf, dtype=jnp.float64),
            prec_chol_inv_t=jnp.eye(nf, dtype=jnp.float64),
        ),
        logvar=_t2j(ref.transition.logvar),
        n_sample=jnp.zeros((), jnp.int32),
    )
    state = core.TrainState(params=params, dynamics=dynamics,
                            lik_n_sample=jnp.zeros((), jnp.int32))
    return ref, cfg, state


class EpsQueue:
    """Deterministic replacement for the reference's reparametrize draws."""

    def __init__(self, eps_seq):
        self.seq = [torch.tensor(np.asarray(e)) for e in eps_seq]
        self.i = 0

    def __call__(self, q):
        mean, logvar = q
        eps = self.seq[self.i]
        self.i += 1
        return mean + eps * torch.exp(0.5 * logvar)


@pytest.mark.parametrize("likelihood", ["gaussian", "poisson"])
@pytest.mark.parametrize("warm_up", [False, True])
@pytest.mark.parametrize("udim,B", [(0, 1), (2, 3)])
def test_filter_learn_parity(likelihood, warm_up, udim, B):
    ydim, xdim, n_rbf, hidden = 12, 3, 20, (8,)
    T = 60
    if udim > 0 and warm_up:
        pytest.skip("covered by the udim=0 warm-up case")
    ref, cfg, state = make_pair(ydim, xdim, udim, n_rbf, hidden, likelihood)

    rng = np.random.default_rng(42)
    if likelihood == "poisson":
        y = rng.poisson(2.0, size=(T, B, ydim)).astype(np.float64)
    else:
        y = rng.normal(size=(T, B, ydim))
    u = rng.normal(size=(T, B, udim)) if udim else None
    eps = rng.normal(size=(T, 2, B, xdim))

    # --- reference side, instrumented ---
    import vjf.model as ref_model_mod

    queue = EpsQueue([eps[t, i] for t in range(T) for i in range(2)])
    orig = ref_model_mod.reparametrize
    ref_model_mod.reparametrize = queue
    try:
        ref_losses = []
        q = None
        for t in range(T):
            ut = torch.tensor(u[t]) if u is not None else None
            q, loss = ref.filter(
                torch.tensor(y[t]), ut, q, sgd=True, update=True, warm_up=warm_up
            )
            ref_losses.append(loss.item())
    finally:
        ref_model_mod.reparametrize = orig

    # --- vjf_tpu side, same eps ---
    flags = StepFlags(sgd=True, update=True, warm_up=warm_up, train_decoder=True)
    step = jax.jit(core.filter_step, static_argnames=("cfg", "flags"))
    qs = core.prior(state.params, B)
    lr = jnp.asarray(cfg.lr, jnp.float64)
    our_losses = []
    for t in range(T):
        state, qs, metrics = step(
            cfg, flags, state, qs, jnp.asarray(y[t]),
            jnp.asarray(u[t]) if u is not None else None,
            jnp.asarray(eps[t, 0]), jnp.asarray(eps[t, 1]), lr,
        )
        our_losses.append(float(metrics.loss))

    # BASELINE.json tolerance is 1e-5; residual fp64 noise comes from the
    # rbf distance formulation (cdist vs matmul expansion)
    np.testing.assert_allclose(
        np.asarray(our_losses), np.asarray(ref_losses), rtol=5e-6, atol=1e-8
    )

    # trained parameters also agree at the end
    final_ref_w = np.asarray(ref.transition.velocity.w_mean)
    np.testing.assert_allclose(
        np.asarray(state.dynamics.blr.w_mean), final_ref_w, rtol=5e-6, atol=1e-8
    )
    rec_w = np.asarray(ref.recognition.mean.weight.detach())
    np.testing.assert_allclose(
        np.asarray(state.params.recognition.mean.w), rec_w, rtol=1e-6, atol=1e-10
    )


def test_forecast_distribution_parity():
    """Forecast draws fresh weight samples per step; with matched weight
    sqrt factors and injected noise the rollouts agree."""
    ydim, xdim = 8, 2
    ref, cfg, state = make_pair(ydim, xdim, 0, 10, (6,), "gaussian")

    rng = np.random.default_rng(7)
    # pretrain both with identical updates so w_chol is nontrivial
    x = rng.normal(size=(30, xdim))
    dx = 0.1 * rng.normal(size=(30, xdim))
    ref.transition.velocity.rls(torch.tensor(x), torch.tensor(dx), torch.tensor(0.5))
    from vjf_tpu.models import regression as R
    from vjf_tpu.models.dynamics import features

    feat = features(state.dynamics, jnp.asarray(x), None)
    blr = R.rls(state.dynamics.blr, feat, jnp.asarray(dx), jnp.asarray(0.5))
    state = state._replace(dynamics=state.dynamics._replace(blr=blr))

    np.testing.assert_allclose(
        np.asarray(R.weight_sqrt(blr)),
        np.asarray(ref.transition.velocity.w_chol),
        rtol=1e-7, atol=1e-10,
    )
