"""Forecast-skill training A/B (VERDICT r2 #8): 20-step forecast RMSE on
VdP / Lorenz with and without the multistep_refine blend, matched epochs.
Results recorded in docs/RESULTS.md "Forecast-skill training"."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from vjf_tpu.config import VJFConfig
from vjf_tpu.datasets import lorenz, van_der_pol
from vjf_tpu.models import vjf as core
from vjf_tpu.utils.evaluation import forecast_rmse, latent_r2


def one(system, refine, max_iter, key):
    if system == "vdp":
        x = van_der_pol()
        x = (x - x.mean(0)) / x.std(0)
        rng = np.random.default_rng(1)
        C = rng.normal(size=(2, 20))
        y = x @ C + rng.normal(size=(20,)) + 0.1 * rng.normal(size=(x.shape[0], 20))
        cfg = VJFConfig(ydim=20, xdim=2, udim=0, n_rbf=50, hidden_sizes=(20,),
                        likelihood="gaussian", dtype="float64", lr=3e-3,
                        rtol=2e-3)
    else:
        x = lorenz()
        x = (x - x.mean(0)) / x.std(0)
        rng = np.random.default_rng(7)
        lam = np.exp(np.clip(x @ (0.4 * rng.normal(size=(3, 50))) + 0.5, -4, 3))
        y = rng.poisson(lam).astype(np.float64)
        cfg = VJFConfig(ydim=50, xdim=3, udim=0, n_rbf=60, hidden_sizes=(24,),
                        likelihood="poisson", dtype="float64", lr=3e-3,
                        rtol=2e-3)
    if refine:
        cfg = cfg.replace(multistep_refine=10, multistep_weight=0.3)
    state = core.init_state(key, cfg)
    res = core.fit(cfg, state, y, key=key, max_iter=max_iter)
    r2 = latent_r2(np.asarray(res.mu[:, 0, :]), x)
    m, p = forecast_rmse(cfg, res.state, res.mu[:, 0, :], y, key, horizon=20)
    return dict(system=system, refine=refine, epochs=res.epochs_run,
                loss=round(float(res.loss), 3), r2=round(float(r2), 3),
                fc20=round(float(m), 3), persistence=round(float(p), 3))


def main():
    for system in ("vdp", "lorenz"):
        for max_iter in (40, 80):
            rows = []
            for refine in (False, True):
                rows.append(one(system, refine, max_iter,
                                jax.random.PRNGKey(0)))
                print(rows[-1], flush=True)


if __name__ == "__main__":
    main()
