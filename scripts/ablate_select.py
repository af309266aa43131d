"""A/B of forecast-gated model selection (``cfg.select='forecast'``) on
the three recovery benches (VERDICT r3 #1's done-criterion table).

Uses the exact ``bench_all.py`` configs; both arms share the fit key so
the TRAINING trajectories are identical (the selection PRNG stream is
folded out of the fit key) — the arms differ only in which epoch's
snapshot is returned. Evaluation is ``utils.evaluation.forecast_rmse``
with an independent key (the selection metric uses its own starts/keys,
so this is not selection-on-the-test-metric).

Run on the real chip from /root/repo: ``python scripts/ablate_select.py``.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run():
    import jax

    from bench_all import bench_lorenz, bench_sgp_ring, bench_vdp  # noqa: F401
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.datasets import (
        linear_gaussian_observations,
        lorenz,
        ring_attractor,
        van_der_pol,
    )
    from vjf_tpu.models import vjf as core
    from vjf_tpu.utils.evaluation import forecast_rmse, latent_r2

    systems = []

    x = van_der_pol(T=1200)
    x = (x - x.mean(0)) / x.std(0)
    rng = np.random.default_rng(1)
    C = rng.normal(size=(2, 20))
    y = (x @ C + rng.normal(size=(20,))
         + 0.1 * rng.normal(size=(1200, 20))).astype(np.float32)
    systems.append(("VdP", VJFConfig(
        ydim=20, xdim=2, udim=0, n_rbf=100, hidden_sizes=(20,),
        likelihood="gaussian", dtype="float32", rls_backend="nsv",
        lr=3e-3, rtol=2e-3, rls_shrink=0.999, chol_jitter=1e-3), y, x))

    x = lorenz(T=1500)
    x = (x - x.mean(0)) / x.std(0)
    rng = np.random.default_rng(2)
    C = rng.normal(size=(3, 50)) * 0.4
    rate = np.exp(np.clip(x @ C + 0.5, -4, 3))
    y = rng.poisson(rate).astype(np.float32)
    systems.append(("Lorenz", VJFConfig(
        ydim=50, xdim=3, udim=0, n_rbf=100, hidden_sizes=(32,),
        likelihood="poisson", dtype="float32", rls_backend="nsv",
        lr=2e-3, rtol=2e-3, rls_shrink=0.999, chol_jitter=1e-3), y, x))

    x = ring_attractor(T=1000)
    y, _, _ = linear_gaussian_observations(x, 20, obs_noise=0.1, seed=1)
    systems.append(("SGP-ring", VJFConfig(
        ydim=20, xdim=2, udim=0, dynamics="sgp", n_inducing=50,
        sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
        dtype="float32", lr=1e-3, rtol=2e-3), y.astype(np.float32), x))

    key = jax.random.PRNGKey(0)
    rows = []
    for name, cfg0, y, x_true in systems:
        row = {"system": name}
        for sel in ("loss", "forecast"):
            cfg = cfg0.replace(select=sel)
            st = core.init_state(key, cfg)
            t0 = time.perf_counter()
            r = core.fit(cfg, st, y, key=key, max_iter=60)
            wall = time.perf_counter() - t0
            m, p = forecast_rmse(cfg, r.state, r.mu[:, 0, :], y,
                                 jax.random.PRNGKey(123), horizon=20)
            row[sel] = {
                "epochs_run": int(r.epochs_run),
                "selected_epoch": (None if r.selected_epoch is None
                                   else int(r.selected_epoch)),
                "latent_r2": round(latent_r2(np.asarray(r.mu[:, 0, :]),
                                             x_true), 4),
                "forecast_rmse": round(m, 4),
                "persistence": round(p, 4),
                "wall_s": round(wall, 1),
            }
        rows.append(row)
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    run()
