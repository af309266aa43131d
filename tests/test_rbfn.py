"""RBFN — the reference's non-Bayesian RBF network (vjf/module.py:153-173,
exercised by test/test_module.py:18-27)."""
import jax
import jax.numpy as jnp
import numpy as np

from vjf_tpu.models import apply_rbfn, init_rbfn


def test_rbfn_forward_shapes(key):
    params = init_rbfn(key, 3, 3, 10, dtype=jnp.float64)
    x = jax.random.normal(key, (20, 3), dtype=jnp.float64)
    out = apply_rbfn(params, x)
    assert out.shape == (20, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rbfn_trains_by_gradient(key):
    """Gradient-trainable (unlike the Bayesian regression): fit a smooth map."""
    params = init_rbfn(key, 1, 1, 30, dtype=jnp.float64)
    x = jnp.linspace(-2, 2, 200)[:, None]
    y = jnp.sin(2 * x)

    def loss_fn(p):
        return jnp.mean((apply_rbfn(p, x) - y) ** 2)

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(500):
        l, g = loss_grad(params)
        params = jax.tree.map(lambda p, gi: p - 0.1 * gi, params, g)
    assert float(l) < 0.05, float(l)
