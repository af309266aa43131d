"""Attribute the small-N ensemble overhead (VERDICT r4 #5).

r4 measured 34.8 us/member-step at N=1 vs ~10 us solo at matched B —
this script decomposes the gap on-chip into:

  * dispatch/tunnel overhead (per-epoch K=1 wall vs K=5 blocked wall),
  * the ns_prefix per-step-kernel segment (default 512 of T=2000 steps
    run the slower per-step kernel with the exact-inverse fallback —
    CLAUDE.md note 21 says it's 26% of a K=2000 chunk),
  * residual vmap-layout cost (blocked prefix-free vmapped N=1 vs
    blocked prefix-free solo).

Workload mirrors the r4 member-scaling row: flagship dims (10D latent,
200-ch Poisson, n_rbf=100), B=32, T=2000, post-warm-up contracted
state. Timing defeats the remote execution cache by perturbing lr per
rep (CLAUDE.md trap 2) and forces completion with a value fetch.

Run on the real chip: python scripts/profile_ensemble_smallN.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import vjf as core
    from vjf_tpu.models.vjf import StepFlags
    from vjf_tpu.parallel import ensemble as ens

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

    def mkcfg(**kw):
        return VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=100,
                         hidden_sizes=(32,), likelihood="poisson",
                         dtype="float32", rls_backend="nsv", lr=1e-3,
                         rls_shrink=0.999, chol_jitter=1e-3, **kw)

    cfg = mkcfg()
    key = jax.random.PRNGKey(0)
    st0 = core.init_state(key, cfg)
    # contracted post-warm-up state: 3 forced warm epochs + bootstrap +
    # 3 RLS epochs (rtol=0 disables the plateau machinery)
    res = core.fit(cfg, st0, y, key=key, max_iter=6, rtol=0.0,
                   epochs_per_dispatch=0 or 1,
                   )
    base_state = res.state
    print(f"prep fit: epochs={res.epochs_run} loss={res.loss:.3f} "
          f"warm_up={res.warm_up}", file=sys.stderr)

    flags = StepFlags(sgd=True, update=True, warm_up=False,
                      train_decoder=False)
    K = 5

    epoch_jit = jax.jit(core.run_epoch, static_argnames=("cfg", "flags"))
    epochs_jit = jax.jit(core.run_epochs, static_argnames=("cfg", "flags"))

    def stack(n):
        return jax.tree.map(lambda a: jnp.stack([a] * n), base_state)

    def time_call(fn, reps=3):
        """fn(lr_perturbation) -> array to fetch; returns best wall."""
        best = float("inf")
        for r in range(reps + 1):  # rep 0 = compile, discarded
            d = 1e-6 * (r + 1)
            t0 = time.perf_counter()
            out = fn(d)
            v = float(np.asarray(out).ravel()[0])  # force completion
            w = time.perf_counter() - t0
            if r > 0:
                best = min(best, w)
        assert np.isfinite(v)
        return best

    out = {}

    def record(name, wall, n_members, n_epochs):
        us = wall / (T * n_members * n_epochs) * 1e6
        out[name] = round(us, 2)
        print(json.dumps({name: {"wall_s": round(wall, 3),
                                 "us_per_member_step": round(us, 2)}}))

    for tag, c in (("", cfg), ("_prefix0", mkcfg(ns_prefix=0))):
        lr_arr = lambda d: jnp.asarray(1e-3 + d, c.jdtype)

        # solo per-epoch dispatch
        w = time_call(lambda d: epoch_jit(
            c, flags, base_state, y, jnp.zeros((T, B, 0), jnp.float32),
            key, lr_arr(d)).metrics.loss)
        record(f"solo_K1{tag}", w, 1, 1)

        # solo blocked (K epochs, one dispatch)
        ks = jax.random.split(key, K)
        w = time_call(lambda d: epochs_jit(
            c, flags, base_state, y, jnp.zeros((T, B, 0), jnp.float32),
            ks, jnp.full((K,), 1e-3 + d, c.jdtype)).epoch_loss)
        record(f"solo_K{K}{tag}", w, 1, K)

        for n in (1, 2, 4):
            sts = stack(n)
            mks = jax.random.split(jax.random.PRNGKey(7), n)
            w = time_call(lambda d: ens._ensemble_epoch(
                c, flags, None, None, sts, y,
                jnp.zeros((T, B, 0), jnp.float32), mks,
                jnp.asarray(1e-3 + d, c.jdtype),
                None, None, None).metrics.loss)
            record(f"ens_N{n}_K1{tag}", w, n, 1)

            eks = jax.vmap(lambda kk: jax.random.split(kk, K))(mks)
            w = time_call(lambda d: ens._ensemble_epochs(
                c, flags, None, None, sts, y,
                jnp.zeros((T, B, 0), jnp.float32), eks,
                jnp.full((K,), 1e-3 + d, c.jdtype),
                None, None, None).epoch_loss)
            record(f"ens_N{n}_K{K}{tag}", w, n, K)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
