"""Sparse-GP dynamics example: ring attractor, 20-D Gaussian observations.

The latent state orbits a noisy ring attractor; the transition model is the
sparse variational GP (``dynamics='sgp'``, BASELINE config #3 — API
recovered from the reference's ``test/test_sgp.py``) instead of the RBF
network: inducing-point kernel features over the same Bayesian linear
regression machinery, with the DTC variance correction making the
predictive uncertainty GROW away from the data (the RBF network's
parametric variance shrinks to zero there instead).

Run: ``python examples/ring_attractor_sgp.py [--plot out.png]``.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

# allow running straight from a checkout
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def generate_data(T=1500, ydim=20, obs_noise=0.1):
    """Noisy ring attractor (radial pull to |x| = 1, constant rotation)
    through a linear-Gaussian readout — the shared generators of
    :mod:`vjf_tpu.datasets` (same system as the quality gate and
    ``bench_all.py``)."""
    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor

    x = ring_attractor(T=T)
    # seed 1, deliberately: forecast skill varies strongly with the
    # observation draw (bench_all.py reports BOTH seed 1 — fits to loss
    # ~-30 — and the hard draw seed 7, which barely fits; a demo should
    # show the system working, the benchmark shows the spread)
    y, _, _ = linear_gaussian_observations(x, ydim, obs_noise=obs_noise, seed=1)
    return x, y.astype(np.float32)


def main():
    from vjf_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()  # $VJF_COMPILE_CACHE: skip cold XLA compiles
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", default=None, help="save figure to this path")
    parser.add_argument("--max-iter", type=int, default=60)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--n-inducing", type=int, default=50)
    args = parser.parse_args()

    from vjf_tpu import VJF
    from vjf_tpu.utils import progress_callback

    x_true, y = generate_data()
    print(f"data: T={y.shape[0]}, ydim={y.shape[1]}")

    model = VJF.make_model(
        ydim=y.shape[1], xdim=2, udim=0,
        dynamics="sgp", n_inducing=args.n_inducing,
        sgp_scale=1.0, sgp_lengthscale=1.0,
        likelihood="gaussian", dtype=args.dtype, lr=1e-3,
        # rtol=2e-3: the warm-up plateau must actually fire or the SGP
        # dynamics never train (bench_all.py / CLAUDE.md trap #14)
        rtol=2e-3,
    )

    t0 = time.time()
    mu, logvar, loss = model.fit(
        y, max_iter=args.max_iter,
        callback=progress_callback(verbose=True, total=args.max_iter),
    )
    steps = y.shape[0] * model.epochs_run   # epochs ACTUALLY run
    print(f"\nfit: loss={loss:.4f}, {steps / (time.time() - t0):.0f} steps/s")

    from vjf_tpu.utils.evaluation import latent_r2

    m = np.asarray(mu[:, 0, :])
    r2 = latent_r2(m, x_true)
    print(f"latent recovery R^2 = {r2:.3f}")

    # the DTC correction in action: predictive variance is reduced where
    # the inducing points cover the trajectory and reverts to the GP prior
    # (logvar -> 2 log scale = 0 here) far off-manifold
    import jax.numpy as jnp

    from vjf_tpu.gp import sgp as sgp_mod

    state = model.state.dynamics
    traj = jnp.asarray(m[::10])
    on_ring = sgp_mod.transition_gaussian(state, traj)
    far = sgp_mod.transition_gaussian(state, 20.0 * traj)
    print(
        "predictive logvar: mean along trajectory "
        f"{float(np.asarray(on_ring.logvar).mean()):.3f} "
        "(coverage-dependent via the DTC correction); far off-manifold "
        f"{float(np.asarray(far.logvar).mean()):.3f} "
        "(= the GP prior, 2 log scale)"
    )

    xf, yf = model.forecast(x0=mu[len(m) // 2, 0], n_step=500)
    print(f"forecast: {xf.shape[0]} steps, finite={bool(np.all(np.isfinite(np.asarray(xf))))}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        axes[0].plot(*x_true.T, alpha=0.7)
        axes[0].set_title("True ring attractor")
        axes[1].plot(*m.T, color="C1", alpha=0.7)
        axes[1].set_title("Posterior mean")
        axes[2].plot(*np.asarray(xf[:, 0, :]).T, color="C2", alpha=0.7)
        axes[2].set_title("SGP forecast")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=100)
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
