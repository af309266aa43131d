"""End-to-end A/B of cfg.ns_prefix_free on the real chip (VERDICT r4 #5).

Same workload family as scripts/profile_ensemble_smallN.py (flagship
dims, B=32, T=2000; shrink-free — see the margin note there), driven
through the REAL fit_ensemble driver: fixed epoch count (rtol=0,
warmup_max=4, max_iter=16), N in {1, 4}, ns_prefix_free 'auto' vs 'off'.
Walls are whole-fit (includes the one extra compile 'auto' pays when the
regime engages), plus a warm second fit for the steady-state number.

Run: python scripts/ab_ensemble_prefix_free.py
"""
import json
import logging
import sys
import time

import numpy as np

sys.path.insert(0, ".")
logging.basicConfig(level=logging.INFO)


def main():
    import jax
    import jax.numpy as jnp

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.parallel import fit_ensemble, init_ensemble

    T, B, ydim, xdim = 2000, 32, 200, 10
    rng = np.random.default_rng(0)
    ts = np.arange(T)[:, None]
    freqs = 2 * np.pi * np.linspace(0.01, 0.05, 5)
    phase = rng.uniform(0, 2 * np.pi, size=(B, 5))
    x = np.stack(
        [np.sin(freqs * ts[:, None] + phase), np.cos(freqs * ts[:, None] + phase)],
        axis=-1,
    ).reshape(T, B, xdim)
    C = rng.normal(size=(xdim, ydim)) * 0.5
    rate = np.exp(np.clip(x @ C - 0.8, -6, 2.5))
    y = rng.poisson(rate).astype(np.float32)
    y = jax.device_put(y)

    MAX_ITER, WARM = 16, 4
    out = {}
    for mode in ("off", "auto"):
        cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=100,
                        hidden_sizes=(32,), likelihood="poisson",
                        dtype="float32", rls_backend="nsv", lr=1e-3,
                        warmup_max=WARM, rtol=0.0, ns_prefix_free=mode)
        for n in (1, 4):
            states = init_ensemble(jax.random.PRNGKey(0), cfg, n)
            keys = jax.random.split(jax.random.PRNGKey(7), n)
            walls = []
            losses = None
            for rep in range(2):  # rep 0 compiles; rep 1 = warm
                t0 = time.perf_counter()
                res = fit_ensemble(
                    cfg, states, y, key=jax.random.PRNGKey(9 + rep),
                    keys=keys, max_iter=MAX_ITER,
                )
                _ = np.asarray(res.loss)
                walls.append(round(time.perf_counter() - t0, 2))
                losses = [round(float(v), 4) for v in res.loss]
            ms = MAX_ITER * T * n / walls[-1] / 1e3
            row = {"wall_cold_s": walls[0], "wall_warm_s": walls[-1],
                   "member_ksteps_per_s_warm": round(ms, 1),
                   "us_per_member_step_warm": round(1e3 / ms, 2),
                   "losses": losses}
            out[f"{mode}_N{n}"] = row
            print(json.dumps({f"{mode}_N{n}": row}))

    for n in (1, 4):
        a, o = out[f"auto_N{n}"], out[f"off_N{n}"]
        print(json.dumps({
            f"speedup_N{n}_warm": round(
                o["us_per_member_step_warm"] / a["us_per_member_step_warm"], 2),
            "losses_equal": a["losses"] == o["losses"],
        }))


if __name__ == "__main__":
    main()
