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
        # NOTE shrink/jitter deliberately OFF: B=32 + shrink 0.999 on this
        # synthetic population sits at the NS stability margin (probe tau
        # hovers at exactly the 0.05 escalation boundary, then the pair
        # poisons and every later step inf-marks) — that regime demotes to
        # XLA in production and is not the mega path this script times.
        return VJFConfig(ydim=ydim, xdim=xdim, udim=0, n_rbf=100,
                         hidden_sizes=(32,), likelihood="poisson",
                         dtype="float32", rls_backend="nsv", lr=1e-3, **kw)

    # a PROPERLY-converged post-warm-up state: a rushed forced bootstrap
    # (warmup_max=3) produced an ill-conditioned post-bootstrap P that ran
    # 99.8% hot and timed the wrong code path entirely (first run of this
    # script, 2026-08-21)
    cfg = mkcfg(warmup_max=12)
    key = jax.random.PRNGKey(0)
    st0 = core.init_state(key, cfg)
    res = core.fit(cfg, st0, y, key=key, max_iter=24, rtol=2e-3)
    base_state = res.state
    assert not res.warm_up, "prep fit must end warm-up (bootstrapped state)"
    print(f"prep fit: epochs={res.epochs_run} loss={res.loss:.3f} "
          f"warm_up={res.warm_up}", file=sys.stderr)
    cfg = mkcfg()  # timing cfg (no warmup_max; flags drive the phase)

    flags = StepFlags(sgd=True, update=True, warm_up=False,
                      train_decoder=False)
    K = 5

    # resident operands: a numpy y argument re-ships 51 MB through the
    # tunnel EVERY dispatch (~0.6 s — dominated the first run of this
    # script); the real fit loops keep data device-resident
    y = jax.device_put(y)
    us0 = jax.device_put(jnp.zeros((T, B, 0), jnp.float32))

    # sanity: the timed state must be CONTRACTED (cold tau) — a hot state
    # escalates/falls back every step and times a different code path
    probe = core.run_epoch(cfg, flags, base_state, y,
                           jnp.zeros((T, B, 0), jnp.float32), key,
                           jnp.asarray(1e-3, cfg.jdtype))
    tau = probe.metrics.tau
    if tau is not None:
        seg = np.asarray(tau[cfg.ns_prefix:])
        hot = float(np.mean(~np.isfinite(seg) | (seg >= 0.7)))
        print(f"probe: max finite tau={np.max(np.where(np.isfinite(seg), seg, 0)):.2e} "
              f"hot_frac={hot:.3f}", file=sys.stderr)
        assert hot < 0.01, (
            "timed state is HOT — these timings would measure the "
            "skip/escalation path, not the clean mega path"
        )

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
            c, flags, base_state, y, us0,
            key, lr_arr(d)).metrics.loss)
        record(f"solo_K1{tag}", w, 1, 1)

        # solo blocked (K epochs, one dispatch)
        ks = jax.random.split(key, K)
        w = time_call(lambda d: epochs_jit(
            c, flags, base_state, y, us0,
            ks, jnp.full((K,), 1e-3 + d, c.jdtype)).epoch_loss)
        record(f"solo_K{K}{tag}", w, 1, K)

        for n in (1, 2, 4):
            sts = stack(n)
            mks = jax.random.split(jax.random.PRNGKey(7), n)
            w = time_call(lambda d: ens._ensemble_epoch(
                c, flags, None, None, sts, y, us0, mks,
                jnp.asarray(1e-3 + d, c.jdtype),
                None, None, None).metrics.loss)
            record(f"ens_N{n}_K1{tag}", w, n, 1)

            eks = jax.vmap(lambda kk: jax.random.split(kk, K))(mks)
            w = time_call(lambda d: ens._ensemble_epochs(
                c, flags, None, None, sts, y, us0, eks,
                jnp.full((K,), 1e-3 + d, c.jdtype),
                None, None, None).epoch_loss)
            record(f"ens_N{n}_K{K}{tag}", w, n, K)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
