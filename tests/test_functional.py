"""Property tests for the math kernel, cross-checked against the runnable
torch reference where available (SURVEY.md §4: the reference has almost no
behavioral coverage, so parity-vs-reference is the spec)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.ops import functional as F
from vjf_tpu.types import Gaussian

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")
torch.set_default_dtype(torch.double)


def _np(x):
    return np.asarray(x, dtype=np.float64)


def test_rbf_matches_reference():
    from vjf.functional import rbf as ref_rbf

    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3))
    c = rng.normal(size=(11, 3))
    w = np.exp(rng.normal(size=(11,)))

    ours = F.rbf(jnp.asarray(x), jnp.asarray(c), jnp.asarray(w))
    ref = ref_rbf(torch.tensor(x), torch.tensor(c), torch.tensor(w)).numpy()
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-10, atol=1e-12)


def test_gaussian_entropy_matches_reference():
    from vjf.distribution import Gaussian as RefGaussian
    from vjf.functional import gaussian_entropy as ref_entropy

    rng = np.random.default_rng(1)
    mean = rng.normal(size=(5, 4))
    logvar = rng.normal(size=(5, 4))

    ours = F.gaussian_entropy(Gaussian(jnp.asarray(mean), jnp.asarray(logvar)))
    ref = ref_entropy(RefGaussian(torch.tensor(mean), torch.tensor(logvar))).item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-12)


@pytest.mark.parametrize("a_gauss", [False, True])
@pytest.mark.parametrize("b_gauss", [False, True])
def test_gaussian_loss_matches_reference(a_gauss, b_gauss):
    from vjf.distribution import Gaussian as RefGaussian
    from vjf.functional import gaussian_loss as ref_loss

    rng = np.random.default_rng(2)
    m1, m2 = rng.normal(size=(6, 3)), rng.normal(size=(6, 3))
    lv1, lv2 = rng.normal(size=(6, 3)), rng.normal(size=(6, 3))
    logvar = rng.normal(size=())

    a = Gaussian(jnp.asarray(m1), jnp.asarray(lv1)) if a_gauss else jnp.asarray(m1)
    b = Gaussian(jnp.asarray(m2), jnp.asarray(lv2)) if b_gauss else jnp.asarray(m2)
    ra = (
        RefGaussian(torch.tensor(m1), torch.tensor(lv1))
        if a_gauss
        else torch.tensor(m1)
    )
    rb = (
        RefGaussian(torch.tensor(m2), torch.tensor(lv2))
        if b_gauss
        else torch.tensor(m2)
    )

    ours = F.gaussian_loss(a, b, jnp.asarray(logvar), trace_quirk=True)
    ref = ref_loss(ra, rb, torch.tensor(logvar)).item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-10)


def test_gaussian_loss_corrected_trace():
    """Corrected mode adds variances (the reference multiplies them)."""
    rng = np.random.default_rng(3)
    m = jnp.asarray(rng.normal(size=(4, 2)))
    lv1 = jnp.asarray(rng.normal(size=(4, 2)))
    lv2 = jnp.asarray(rng.normal(size=(4, 2)))
    logvar = jnp.asarray(0.3)

    a, b = Gaussian(m, lv1), Gaussian(m, lv2)
    got = F.gaussian_loss(a, b, logvar, trace_quirk=False)
    expected = 0.5 * jnp.mean(
        jnp.sum(logvar + jnp.exp(lv1 - logvar) + jnp.exp(lv2 - logvar), axis=-1)
    )
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-12)


def test_running_var_matches_reference():
    from vjf.util import running_var as ref_rv

    var, n = F.running_var(jnp.asarray(2.0), jnp.asarray(1500), jnp.asarray(0.5), 20, size_cap=1000)
    rvar, rn = ref_rv(torch.tensor(2.0), 1500, torch.tensor(0.5), 20, size_cap=1000)
    np.testing.assert_allclose(float(var), rvar.item(), rtol=1e-12)
    assert int(n) == rn


def test_reparametrize_deterministic_injection():
    q = Gaussian(jnp.asarray([[1.0, 2.0]]), jnp.asarray([[0.0, jnp.log(4.0)]]))
    eps = jnp.asarray([[1.0, -1.0]])
    out = F.reparametrize(q, eps)
    np.testing.assert_allclose(_np(out), [[2.0, 0.0]], rtol=1e-12)


def test_nonecat():
    a = jnp.ones((3, 2))
    assert F.nonecat(a, None).shape == (3, 2)
    assert F.nonecat(a, jnp.ones((3, 0))).shape == (3, 2)
    assert F.nonecat(a, jnp.ones((3, 4))).shape == (3, 6)


def test_finite_or_zero_guards_gradients():
    def f(x):
        bad = jnp.where(x > 0, jnp.nan, x)  # non-finite branch
        return F.finite_or_zero(jnp.sum(bad))

    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
    assert float(F.finite_or_zero(jnp.asarray(jnp.inf))) == 0.0
    assert float(F.finite_or_zero(jnp.asarray(3.0))) == 3.0
