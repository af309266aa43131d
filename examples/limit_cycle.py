"""Canonical example: noisy limit cycle, 20-D Gaussian observations.

Mirrors the reference's ``script/example.py`` flow (generate data →
make_model → fit → velocity field → forecast) on the TPU-native stack.
Run: ``python examples/limit_cycle.py [--plot out.png]``.
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# allow running straight from a checkout: python examples/limit_cycle.py
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def generate_data(key, T=100.0, dt=1e-2 * math.pi, xdim=2, ydim=20, obs_noise=0.1):
    """sin/cos limit cycle + linear-Gaussian observations
    (``script/example.py:17-33``)."""
    t = jnp.arange(0, T, dt)
    x = jnp.stack([jnp.sin(t), jnp.cos(t)], axis=-1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = x + obs_noise * jax.random.normal(k1, x.shape)
    C = jax.random.normal(k2, (xdim, ydim))
    d = jax.random.normal(k3, (ydim,))
    y = x @ C + d + obs_noise * jax.random.normal(k4, (t.shape[0], ydim))
    return np.asarray(x), np.asarray(y)


def main():
    from vjf_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()  # $VJF_COMPILE_CACHE: skip cold XLA compiles
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", default=None, help="save figure to this path")
    parser.add_argument("--max-iter", type=int, default=100)
    parser.add_argument("--dtype", default="float32")
    args = parser.parse_args()

    from vjf_tpu import VJF
    from vjf_tpu.utils import progress_callback

    key = jax.random.PRNGKey(0)
    x_true, y = generate_data(key)
    print(f"data: T={y.shape[0]}, ydim={y.shape[1]}")

    model = VJF.make_model(
        ydim=y.shape[1], xdim=2, udim=0, n_rbf=100, hidden_sizes=[20],
        likelihood="gaussian", dtype=args.dtype, lr=1e-3,
        # production B=1 knobs (see bench_all.py / CLAUDE.md):
        # - rtol=0 + warmup_max=15: at the reference-faithful rtol=1e-4
        #   the warm-up plateau NEVER fires on this system, so the RLS
        #   dynamics silently never train (latent R^2 still looks great —
        #   recognition tracks regardless; the tell is a forecast worse
        #   than persistence). Forcing the phase transition and running
        #   the full epoch budget gives forecast 0.36 vs persistence 0.49.
        # - rls_shrink+chol_jitter: f32 conditioning guard for the ~300k
        #   B=1 RLS steps this fit runs (pure accumulation diverges)
        rtol=0.0, warmup_max=15, rls_shrink=0.999, chol_jitter=1e-3,
    )

    t0 = time.time()
    mu, logvar, loss = model.fit(
        y, max_iter=args.max_iter, callback=progress_callback(verbose=True, total=args.max_iter)
    )
    steps = y.shape[0] * model.epochs_run   # epochs ACTUALLY run
    print(f"\nfit: loss={loss:.4f}, {steps / (time.time() - t0):.0f} steps/s")

    from vjf_tpu.utils.evaluation import latent_r2

    m = np.asarray(mu[:, 0, :])
    # latent recovery quality (up to affine map)
    r2 = latent_r2(m, x_true)
    print(f"latent recovery R^2 = {r2:.3f}")

    # forecast from step 10 (example.py:79)
    xf, yf = model.forecast(x0=mu[9, 0], n_step=1000)
    print(f"forecast: {xf.shape[0]} steps, finite={bool(np.all(np.isfinite(np.asarray(xf))))}")

    # self-validating: a trained transition must beat the persistence
    # baseline (an untrained one looks fine on latent R^2 — recognition
    # tracks regardless — and only fails HERE)
    from vjf_tpu.utils.evaluation import forecast_rmse

    fr, pr = forecast_rmse(model.cfg, model.state, m, y,
                           key=jax.random.PRNGKey(1), horizon=20, n_starts=20)
    print(f"20-step forecast RMSE {fr:.3f} vs persistence {pr:.3f} "
          f"({'OK' if fr < pr else 'WORSE THAN PERSISTENCE — dynamics did not train'})")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        axes[0, 0].plot(x_true)
        axes[0, 0].set_title("True state")
        axes[0, 1].plot(m)
        axes[0, 1].set_title("Posterior mean")

        r = 1.5 * np.abs(m).max()
        g = np.linspace(-r, r, 51)
        X_, Y_ = np.meshgrid(g, g)
        grid = np.column_stack([X_.ravel(), Y_.ravel()])
        V = np.asarray(model.velocity(grid))
        axes[1, 0].streamplot(X_, Y_, V[:, 0].reshape(X_.shape), V[:, 1].reshape(Y_.shape))
        axes[1, 0].plot(*m.T, color="C1", alpha=0.5)
        axes[1, 0].set_title("Velocity field")

        axes[1, 1].plot(np.asarray(xf[:, 0, :]))
        axes[1, 1].set_title("Forecast")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=100)
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
