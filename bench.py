"""Headline benchmark: fused filter+learn throughput on the flagship config.

Config (BASELINE.json): 10D latent, 200-channel Poisson observations,
n_rbf=100, hidden=(32,), 256 batched trials — the full filter-then-learn
step (recognition fwd, ELBO, backward, clipped SGD, RLS dynamics update,
running-variance noise updates) per timestep, scanned over time on one chip.

Methodology notes:
  * data is generated host-side (jax.random.poisson's rejection sampler
    would hold ~8 copies of the (T, B, ydim) buffer on HBM);
  * the lr operand is perturbed per rep — the remote TPU runtime caches
    identical (executable, args) executions, which would fake the timing;
  * one long scan (T=10k) amortizes the fixed per-dispatch overhead
    (~26 ms through the tunnel), and the result is fetched to host each
    rep to force completion.

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

    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

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
    )
    flags = StepFlags()

    key = jax.random.PRNGKey(0)
    state = core.init_state(key, cfg)

    # On-device spike generation: host->device of a (10k, 256, 200) buffer
    # is ~2 GB through the tunnel, and jax.random.poisson's rejection
    # sampler holds ~8 HBM copies; a sum of bernoullis gives Poisson-like
    # counts with one cheap pass (data content doesn't affect step cost).
    k1, k2 = jax.random.split(key)
    ys = (
        jax.random.bernoulli(k1, 0.4, (t_chunk, n_batch, cfg.ydim)).astype(cfg.jdtype)
        + jax.random.bernoulli(k2, 0.3, (t_chunk, n_batch, cfg.ydim)).astype(cfg.jdtype)
    )
    us = jnp.zeros((t_chunk, n_batch, 0), dtype=cfg.jdtype)

    epoch_fn = jax.jit(core.run_epoch, static_argnames=("cfg", "flags"))

    # compile + warmup
    out = epoch_fn(cfg, flags, state, ys, us, key, jnp.asarray(cfg.lr, cfg.jdtype))
    float(np.asarray(out.metrics.loss[-1]))

    best = float("inf")
    for i in range(reps):
        lr = jnp.asarray(cfg.lr * (1.0 + 1e-6 * (i + 1)), cfg.jdtype)
        t0 = time.perf_counter()
        out = epoch_fn(cfg, flags, state, ys, us, key, lr)
        loss = float(np.asarray(out.metrics.loss[-1]))  # forces completion
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(loss), f"non-finite loss {loss}"

    steps_per_sec = t_chunk / best
    print(
        json.dumps(
            {
                "metric": "filter+learn timesteps/sec/chip (10D latent, 200-ch Poisson, 256 trials)",
                "value": round(steps_per_sec, 1),
                "unit": "timesteps/s/chip",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
