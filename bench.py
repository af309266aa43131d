"""Headline benchmark: fused filter+learn training throughput, flagship config.

Config (BASELINE.json): 10D latent, 200-channel Poisson observations,
n_rbf=100, hidden=(32,), 256 batched trials — the full filter-then-learn
step (recognition fwd, ELBO, backward, clipped SGD, RLS dynamics update,
running-variance noise updates) per timestep, scanned over time on one chip.

Methodology:
  * the measured unit is a REAL training segment: 5 consecutive
    post-warm-up epochs x 10k timesteps through ``run_epochs`` (the
    production multi-epoch driver — one dispatch per segment, exactly how
    ``fit`` consumes the device between plateau checks). One warm-up epoch
    runs first, outside the timed region, mirroring ``fit``'s two-phase
    semantics (``/root/reference/vjf/model.py:278-295``) so the timed
    epochs train sanely (losses finite, tau contracted — both asserted).
  * data is generated on-device (a host->device (10k, 256, 200) buffer is
    ~2 GB through the tunnel; jax.random.poisson's rejection sampler holds
    ~8 HBM copies — a bernoulli sum gives spikes with one cheap pass);
  * the lr operand is perturbed per rep (the remote runtime caches
    identical (executable, args) executions) and a loss value is fetched
    to force completion (block_until_ready under-reports via the tunnel).

Reference baseline (BASELINE.md): ~436 steps/s, same model dims, batch=1,
fp64, single CPU process (the reference has no published numbers, no batch
support in practice, and no accelerator path).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 436.0  # measured reference throughput (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vjf_tpu.config import StepFlags, VJFConfig
    from vjf_tpu.models import vjf as core
    from vjf_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()  # $VJF_COMPILE_CACHE: skip cold XLA compiles

    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    cfg = VJFConfig(
        ydim=200,
        xdim=10,
        udim=0,
        n_rbf=100,
        hidden_sizes=(32,),
        likelihood="poisson",
        dtype="float32",
        rls_backend="nsv",       # Newton-Schulz inverse tracking (MXU-only)
        fused_step="auto",       # whole-step pallas kernel on TPU
        fused_epoch="mega",      # grid-over-time epoch kernel
    )

    key = jax.random.PRNGKey(0)
    state = core.init_state(key, cfg)

    # On-device spike generation, rate ~0.12 (sparse, neural-data-like).
    k1, k2 = jax.random.split(key)
    ys = (
        jax.random.bernoulli(k1, 0.07, (t_chunk, n_batch, cfg.ydim)).astype(cfg.jdtype)
        + jax.random.bernoulli(k2, 0.05, (t_chunk, n_batch, cfg.ydim)).astype(cfg.jdtype)
    )
    us = jnp.zeros((t_chunk, n_batch, 0), dtype=cfg.jdtype)

    epochs_fn = jax.jit(core.run_epochs, static_argnames=("cfg", "flags"))
    keys = jax.random.split(key, n_epochs)
    lrs = cfg.lr * (cfg.lr_decay ** jnp.arange(n_epochs, dtype=cfg.jdtype))

    # warm-up epoch (fit's first phase): outside the timed region
    wu = epochs_fn(cfg, StepFlags(warm_up=True), state, ys, us, keys[:1], lrs[:1])
    state = wu.state

    # compile + warmup of the timed computation
    out = epochs_fn(cfg, StepFlags(), state, ys, us, keys, lrs)
    loss = float(np.asarray(out.epoch_loss[-1]))

    times = []
    for i in range(reps):
        lr_i = lrs * (1.0 + 1e-6 * (i + 1))
        t0 = time.perf_counter()
        out = epochs_fn(cfg, StepFlags(), state, ys, us, keys, lr_i)
        loss = float(np.asarray(out.epoch_loss[-1]))  # forces completion
        times.append(time.perf_counter() - t0)
    best = min(times)
    assert np.isfinite(loss) and loss != 0.0, f"degenerate loss {loss}"
    max_tau = float(np.asarray(out.max_tau).max())
    assert max_tau < 0.7, f"Newton-Schulz never contracted (tau={max_tau})"
    # max_tau alone cannot witness skipped steps (they mark tau=inf, and
    # max_tau is the max FINITE tau — vjf.py run_epochs); the hot fraction
    # is the real "did the dynamics actually train" gate
    hot = float(np.asarray(out.hot_frac).max())
    assert hot < 0.01, f"benchmark dropped {100 * hot:.1f}% of RLS updates"

    steps_per_sec = t_chunk * n_epochs / best
    median_sps = t_chunk * n_epochs / float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "filter+learn timesteps/sec/chip (10D latent, 200-ch Poisson, 256 trials, 5x10k-step epochs)",
                "value": round(steps_per_sec, 1),
                "unit": "timesteps/s/chip",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
                # variance documentation (VERDICT r2 #7): value stays
                # best-of-reps (the driver's contract — least tunnel/
                # contention noise); median over the same reps quantifies
                # the spread on a shared chip
                "median": round(median_sps, 1),
                "median_vs_baseline": round(median_sps / BASELINE_STEPS_PER_SEC, 2),
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
