"""Relaxed-sync quality A/B (VERDICT r2 #3): final loss, latent R^2, and
20-step forecast RMSE at sync_every K in {1, 8, 32, epoch} on the virtual
8-device CPU mesh, Van der Pol + Lorenz + a flagship-dims Poisson run.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/ablate_sync_every.py
(the script forces the cpu platform itself; results recorded in
docs/RESULTS.md "Relaxed-sync multi-chip").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from vjf_tpu.config import VJFConfig
from vjf_tpu.datasets import lorenz, van_der_pol, poisson_observations
from vjf_tpu.models import vjf as core
from vjf_tpu.parallel import make_mesh
from vjf_tpu.utils.evaluation import forecast_rmse, latent_r2


def run(name, cfg, y, x_true, key, max_iter, sync_every):
    cfg = cfg.replace(sync_every=sync_every)
    mesh = make_mesh(8, axis_names=("dp",))
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=max_iter, mesh=mesh)
    mu0 = np.asarray(res.mu[:, 0, :])
    r2 = latent_r2(mu0, x_true)
    m_rmse, p_rmse = forecast_rmse(cfg, res.state, res.mu[:, 0, :],
                                   y[:, 0] if y.ndim == 3 else y, key, horizon=20)
    return dict(system=name, K=("epoch" if sync_every == 0 else sync_every),
                loss=round(float(res.loss), 3), r2=round(float(r2), 3),
                fc_rmse=round(float(m_rmse), 3),
                persistence=round(float(p_rmse), 3),
                epochs=res.epochs_run)


def main():
    key = jax.random.PRNGKey(0)
    rows = []

    # Van der Pol, Gaussian obs, B=8 trials (1/device)
    x = van_der_pol()
    x = (x - x.mean(0)) / x.std(0)
    rng = np.random.default_rng(1)
    C = rng.normal(size=(2, 20))
    y1 = x @ C + rng.normal(size=(20,))
    yb = y1[:, None, :] + 0.1 * rng.normal(size=(x.shape[0], 8, 20))
    cfg_v = VJFConfig(ydim=20, xdim=2, udim=0, n_rbf=50, hidden_sizes=(20,),
                      likelihood="gaussian", dtype="float32", lr=3e-3,
                      rtol=2e-3, rls_backend="nsv", warmup_max=15)
    for K in (1, 8, 32, 0):
        if K and x.shape[0] % K:
            yk, xk = yb[: (x.shape[0] // K) * K], x[: (x.shape[0] // K) * K]
        else:
            yk, xk = yb, x
        rows.append(run("vdp", cfg_v, yk.astype(np.float32), xk, key, 40, K))
        print(rows[-1], flush=True)

    # Lorenz, Poisson obs
    xl = lorenz()
    xl = (xl - xl.mean(0)) / xl.std(0)
    rng2 = np.random.default_rng(7)
    lam = np.exp(np.clip(xl @ (0.4 * rng2.normal(size=(3, 50))) + 0.5, -4, 3))
    ylb = rng2.poisson(lam[:, None, :].repeat(8, 1)).astype(np.float32)
    cfg_l = VJFConfig(ydim=50, xdim=3, udim=0, n_rbf=60, hidden_sizes=(24,),
                      likelihood="poisson", dtype="float32", lr=3e-3,
                      rtol=2e-3, rls_backend="nsv", warmup_max=15)
    for K in (1, 8, 32, 0):
        if K and xl.shape[0] % K:
            yk, xk = ylb[: (xl.shape[0] // K) * K], xl[: (xl.shape[0] // K) * K]
        else:
            yk, xk = ylb, xl
        rows.append(run("lorenz", cfg_l, yk, xk, key, 40, K))
        print(rows[-1], flush=True)

    # r4 production recipe: relaxed sync REQUIRES the B=1 conditioning
    # guard (per-chip RLS between merges is an unpooled B_local=1
    # accumulation — the root cause of the r3 "K=32 collapse"); the
    # sync_trust merge damping is on by default. Table in docs/RESULTS.md
    # "Relaxed-sync".
    cfg_lc = cfg_l.replace(rls_shrink=0.999, chol_jitter=1e-3)
    for K in (8, 32, 0):
        if K and xl.shape[0] % K:
            yk, xk = ylb[: (xl.shape[0] // K) * K], xl[: (xl.shape[0] // K) * K]
        else:
            yk, xk = ylb, xl
        rows.append(run("lorenz-conditioned", cfg_lc, yk, xk, key, 40, K))
        print(rows[-1], flush=True)

    print("\nFINAL TABLE")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
