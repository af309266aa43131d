"""Root-cause VERDICT r4 #2: bench_all config #3 (SGP ring attractor)
observation draw 7 fits only to loss -1.2 and forecasts ~ persistence.

Hypothesis under test: the warm-up plateau (`_isclose(epoch_loss,
running_loss, rtol)`, relative tolerance — `vjf/model.py:278-291`
semantics) never fires on draw 7 because its loss sits near -1 where a
2e-3 RELATIVE tolerance is ~0.002 absolute, while draw 1's loss passes
through -30 where the same rtol is ~0.06; warm-up then never ends,
the RLS dynamics never train (update skipped during warm-up,
`vjf/model.py:370-371`), and the forecast is the untrained transition
== persistence.

Prints per-epoch losses, warm-up end epoch (or NEVER), |w|, dyn logvar,
and forecast-vs-persistence RMSE for both draws, for the current bench
config and for the candidate fix (warmup_max + shrink/jitter).

Run: python scripts/diagnose_sgp_draw7.py [--cpu]
"""
import json
import logging
import sys

import numpy as np

sys.path.insert(0, ".")


def run_one(seed, warmup_max=0, shrink=1.0, jitter=0.0, max_iter=60,
            lr=1e-3, select="loss", center=False):
    import jax
    import jax.numpy as jnp

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor
    from vjf_tpu.models import vjf as core
    from vjf_tpu.utils.evaluation import forecast_rmse, latent_r2

    x = ring_attractor(T=1000)
    y, _, _ = linear_gaussian_observations(x, 20, obs_noise=0.1, seed=seed)
    if center:
        y = (y - y.mean(0)) / y.std(0)
    cfg = VJFConfig(ydim=20, xdim=2, udim=0, dynamics="sgp", n_inducing=50,
                    sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
                    dtype="float32", lr=lr, rtol=2e-3, select=select,
                    warmup_max=warmup_max, rls_shrink=shrink,
                    chol_jitter=jitter)
    key = jax.random.PRNGKey(0)
    state = core.init_state(key, cfg)

    losses = []
    warm_end = {"epoch": None}

    class _H(logging.Handler):
        def emit(self, rec):
            m = rec.getMessage()
            if "Warm up stopped at epoch" in m:
                warm_end["epoch"] = int(m.rsplit(" ", 1)[-1].rstrip("."))

    h = _H()
    logging.getLogger("vjf_tpu.models.vjf").addHandler(h)
    try:
        res = core.fit(cfg, state, y.astype(np.float32), key=key,
                       max_iter=max_iter, epochs_per_dispatch=5,
                       callback=lambda e, l, r: losses.append(round(l, 4)))
    finally:
        logging.getLogger("vjf_tpu.models.vjf").removeHandler(h)

    w = res.state.dynamics.blr.w_mean
    # decoder quality: R^2 of y from the point decode of the posterior
    # means (separates "recognition failed" from "decoder never learned
    # the channel map" — the draw-7 tell)
    dec = res.state.params.decoder
    yhat = np.asarray(res.mu[:, 0, :] @ dec.w.T + dec.b)
    ss_res = float(np.sum((y - yhat) ** 2))
    ss_tot = float(np.sum((y - y.mean(0)) ** 2))
    m_rmse, p_rmse = forecast_rmse(cfg, res.state, res.mu[:, 0, :],
                                   y.astype(np.float32), key, horizon=20)
    out = {
        "seed": seed,
        "warmup_max": warmup_max, "shrink": shrink, "jitter": jitter,
        "lr": lr, "select": select, "center": center,
        "selected_epoch": res.selected_epoch,
        "epochs_run": res.epochs_run,
        "warmup_end_epoch": warm_end["epoch"],
        "warm_up_still_on": bool(res.warm_up),
        "final_loss": round(res.loss, 4),
        "loss_first5": losses[:5],
        "loss_last5": losses[-5:],
        "w_norm": round(float(jnp.linalg.norm(w)), 4),
        "dyn_logvar": round(float(res.state.dynamics.logvar), 4),
        "latent_r2": round(latent_r2(np.asarray(res.mu[:, 0, :]), x), 4),
        "decoder_r2": round(1.0 - ss_res / ss_tot, 4),
        "obs_logvar": round(float(res.state.params.likelihood.logvar), 4),
        "forecast_rmse": round(m_rmse, 4),
        "persistence_rmse": round(p_rmse, 4),
    }
    print(json.dumps(out))
    return out


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--round2" in sys.argv:
        # candidate production configs for bench_all #3 (one config, both
        # draws — no per-draw tuning allowed)
        cands = [
            dict(warmup_max=30, shrink=0.999, jitter=1e-3, lr=3e-3),
            dict(warmup_max=15, shrink=0.999, jitter=1e-3),
            dict(warmup_max=30, shrink=0.999, jitter=1e-3,
                 select="forecast"),
            dict(warmup_max=30, shrink=0.999, jitter=1e-3, center=True),
            dict(warmup_max=20, shrink=0.999, jitter=1e-3, lr=3e-3,
                 center=True, select="forecast"),
        ]
        for kw in cands:
            print(f"== {kw} ==")
            for seed in (1, 7):
                run_one(seed, **kw)
        return
    print("== current bench config (no warmup_max, no conditioning) ==")
    for seed in (1, 7):
        run_one(seed)
    print("== candidate fix: warmup_max=30 + shrink 0.999 + jitter 1e-3 ==")
    for seed in (1, 7):
        run_one(seed, warmup_max=30, shrink=0.999, jitter=1e-3)


if __name__ == "__main__":
    main()
