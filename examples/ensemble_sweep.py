"""Seed-ensemble example: N independent models on shared data, one
dispatch stream (``VJF.fit_ensemble`` — the productized zero-collective
multi-chip regime, docs/ARCHITECTURE.md §4 / docs/RESULTS.md "Ensemble
fit").

The reference trains one model per process; a robustness workflow (seed
ensembles, per-subject sweeps, hyperparameter grids) re-runs it N times.
Here all N members run the FULL fit state machine — warm-up plateau,
decoder freeze, dynamics bootstrap, convergence — inside one vmapped
dispatch per epoch, and the member axis shards over a mesh with zero
inter-chip collectives.

Self-validating: asserts every member recovers the latent limit cycle
(affine-aligned R^2) and reports the cross-member forecast spread — the
quantity an ensemble exists to estimate.

Run: ``python examples/ensemble_sweep.py [--members 4] [--max-iter 60]``.
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def generate_data(key, T=60.0, dt=2e-2 * math.pi, xdim=2, ydim=20,
                  obs_noise=0.1, n_trials=8):
    t = jnp.arange(0, T, dt)
    x = jnp.stack([jnp.sin(t), jnp.cos(t)], axis=-1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = x + obs_noise * jax.random.normal(k1, x.shape)
    C = jax.random.normal(k2, (xdim, ydim))
    d = jax.random.normal(k3, (ydim,))
    y = (
        (x @ C + d)[:, None, :]
        + obs_noise * jax.random.normal(k4, (t.shape[0], n_trials, ydim))
    )
    return np.asarray(x), np.asarray(y)


def main():
    from vjf_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--members", type=int, default=4)
    parser.add_argument("--max-iter", type=int, default=60)
    args = parser.parse_args()

    from vjf_tpu import VJF
    from vjf_tpu.utils.evaluation import latent_r2

    key = jax.random.PRNGKey(0)
    x_true, y = generate_data(key)

    # production knobs per docs/ARCHITECTURE.md §9: RLS forgetting +
    # jitter ridge bound cond(P) over the long f32 stream (the forecast
    # off the manifold is the quantity these protect — CLAUDE.md trap 14)
    template = VJF.make_model(
        ydim=y.shape[-1], xdim=2, n_rbf=50, hidden_sizes=[20],
        likelihood="gaussian", dtype="float32", lr=3e-3, rtol=2e-3,
        warmup_max=30, rls_shrink=0.999, chol_jitter=1e-3,
    )
    t0 = time.time()
    result, members = template.fit_ensemble(
        y, n_models=args.members, max_iter=args.max_iter, seed=7,
    )
    wall = time.time() - t0
    steps = int(np.sum(result.epochs_run)) * y.shape[0]
    print(
        f"fit_ensemble: {args.members} members x {y.shape[0]} steps, "
        f"epochs={result.epochs_run.tolist()}, {wall:.1f}s "
        f"({steps / wall / 1e3:.1f}k member-steps/s)"
    )

    # every member must recover the latent limit cycle on its own
    r2s = []
    for i, m in enumerate(members):
        r2 = latent_r2(np.asarray(result.mu[i, :, 0, :]), x_true)
        r2s.append(float(r2))
        assert r2 > 0.9, f"member {i} failed latent recovery: R^2={r2:.3f}"
    print(f"latent recovery R^2 per member: {np.round(r2s, 3).tolist()} (OK)")

    # per-member forecast skill (the canonical quality gate — 20-step
    # observation RMSE vs the persistence baseline), plus the ensemble's
    # product: the cross-member spread of that skill. A member whose
    # one-step-trained field degrades off-manifold shows up here — the
    # robustness signal a single fit cannot provide.
    from vjf_tpu.utils.evaluation import forecast_rmse

    skills = []
    for i, m in enumerate(members):
        mr, pr = forecast_rmse(m.cfg, m.state, result.mu[i, :, 0, :],
                               y[:, 0], jax.random.PRNGKey(100 + i),
                               horizon=20)
        skills.append((float(mr), float(pr)))
    mrs = np.array([s_[0] for s_ in skills])
    prs = np.array([s_[1] for s_ in skills])
    n_skilled = int(np.sum(mrs < prs))
    print(f"20-step forecast RMSE per member: {np.round(mrs, 3).tolist()} "
          f"vs persistence {prs[0]:.3f}; {n_skilled}/{len(members)} beat it; "
          f"cross-member spread {float(np.std(mrs)):.3f}")
    assert np.all(np.isfinite(mrs)), "a member's forecast diverged"
    assert n_skilled >= len(members) // 2 + 1, (
        "most members should beat the persistence baseline"
    )
    print("ensemble sweep OK")


if __name__ == "__main__":
    main()
