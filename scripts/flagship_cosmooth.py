"""Flagship-scale co-smoothing wall: vmapped folds vs the sequential
fold loop (VERDICT r3 #3 — the 312 s five-fold evaluation).

Reproduces the round-3 setup: synthetic 10D-oscillator population,
200-ch Poisson, 256 trials, T=300; trained 25 epochs (warmup_max=25,
lr=1e-3), then ``kfold_channel_eval`` timed with ``vmap_folds`` on/off.
Run on the real chip from /root/repo: ``python scripts/flagship_cosmooth.py``.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import evaluate as EV
    from vjf_tpu.models import vjf as core

    T, B, ydim, xdim = 300, 256, 200, 10
    rng = np.random.default_rng(0)
    # 10D coupled-oscillator latents (5 planes, distinct frequencies)
    ts = np.arange(T)[:, None]
    freqs = 2 * np.pi * np.linspace(0.01, 0.05, 5)
    phase = rng.uniform(0, 2 * np.pi, size=(B, 5))
    x = np.stack(
        [np.sin(freqs * ts[:, None] + phase), np.cos(freqs * ts[:, None] + phase)],
        axis=-1,
    ).reshape(T, B, xdim)
    C = rng.normal(size=(xdim, ydim)) * 0.5
    rate = np.exp(np.clip(x @ C - 0.8, -6, 2.5))
    y = rng.poisson(rate).astype(np.uint8)

    cfg = VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=100,
                    hidden_sizes=(32,), likelihood="poisson",
                    dtype="float32", rls_backend="nsv", lr=1e-3,
                    warmup_max=25, rtol=2e-3)
    key = jax.random.PRNGKey(0)
    st = core.init_state(key, cfg)
    t0 = time.perf_counter()
    res = core.fit(cfg, st, y, key=key, max_iter=25)
    fit_wall = time.perf_counter() - t0
    print(f"fit: {res.epochs_run} epochs, loss {res.loss:.3f}, "
          f"{fit_wall:.1f} s")

    out = {}
    modes = [("sequential", dict(vmap_folds=False)),
             ("vmapped_c2", dict(vmap_folds=True, fold_chunk=2))]
    for name, kw in modes:
        walls = []
        for rep in range(2):  # rep 0 = cold (compiles), rep 1 = warm
            t0 = time.perf_counter()
            try:
                kf = EV.kfold_channel_eval(cfg, res.state, y, n_folds=5, **kw)
            except Exception as e:
                print(json.dumps({name: {"error": str(e)[:120]}}))
                kf = None
                break
            walls.append(round(time.perf_counter() - t0, 1))
        if kf is None:
            continue
        out[name] = {"wall_cold_s": walls[0],
                     "wall_warm_s": walls[-1] if len(walls) > 1 else None,
                     "bits_per_spike": round(float(kf.bits_per_spike), 4)}
        print(json.dumps({name: out[name]}))


if __name__ == "__main__":
    main()
