"""Neural-population example: 200-channel Poisson observations, 10-D latent,
256 trials, streaming online filter (BASELINE configs #4/#5).

Demonstrates the TPU-scale path: batched trials through the fused
filter-then-learn scan, optional multi-device sharding, and the streaming
``filter`` API for true online use.

Run: ``python examples/neural_population.py [--trials 256] [--steps 2000]``.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# allow running straight from a checkout: python examples/neural_population.py
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from vjf_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()  # $VJF_COMPILE_CACHE: skip cold XLA compiles
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=256)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--ydim", type=int, default=200)
    parser.add_argument("--xdim", type=int, default=10)
    parser.add_argument("--shard", action="store_true", help="shard trials over all devices")
    args = parser.parse_args()

    from vjf_tpu.config import StepFlags, VJFConfig
    from vjf_tpu.models import vjf as core

    cfg = VJFConfig(
        ydim=args.ydim, xdim=args.xdim, udim=0, n_rbf=100, hidden_sizes=(32,),
        likelihood="poisson", dtype="float32",
    )
    key = jax.random.PRNGKey(0)
    state = core.init_state(key, cfg)

    # synthetic latent drives spike probabilities — generated ON DEVICE
    # (host->device of large arrays is slow through tunneled runtimes)
    k1, k2, k3 = jax.random.split(key, 3)
    C = 0.3 * jax.random.normal(k1, (args.xdim, args.ydim), jnp.float32)
    z = jnp.cumsum(0.05 * jax.random.normal(k2, (args.steps, args.trials, args.xdim)), axis=0)
    p = jax.nn.sigmoid(z @ C)
    ys = jax.random.bernoulli(k3, p).astype(jnp.float32) + jax.random.bernoulli(
        jax.random.fold_in(k3, 1), 0.5 * p
    ).astype(jnp.float32)
    y = np.asarray(ys[:, :1])  # small host copy for the streaming demo below
    us = jnp.zeros((args.steps, args.trials, 0), dtype=jnp.float32)

    flags = StepFlags()
    if args.shard and len(jax.devices()) > 1:
        from vjf_tpu.parallel import make_mesh, make_sharded_epoch, shard_data, shard_state

        mesh = make_mesh(axis_names=("dp", "tp"))
        print(f"mesh: {dict(mesh.shape)}")
        state = shard_state(cfg, state, mesh)
        ys, us = shard_data(mesh, ys, us)
        epoch_fn = make_sharded_epoch(cfg, flags, mesh, donate=False)
        run = lambda st: epoch_fn(st, ys, us, key, jnp.asarray(cfg.lr, jnp.float32))
    else:
        jitted = jax.jit(core.run_epoch, static_argnames=("cfg", "flags"))
        run = lambda st: jitted(cfg, flags, st, ys, us, key, jnp.asarray(cfg.lr, jnp.float32))

    out = run(state)  # compile + warmup
    float(np.asarray(out.metrics.loss[-1]))
    t0 = time.perf_counter()
    out = run(out.state)
    loss = float(np.asarray(out.metrics.loss[-1]))
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps x {args.trials} trials: {args.steps / dt:.0f} steps/s, final loss {loss:.2f}")

    # streaming single-step API (true online filtering)
    from vjf_tpu import VJF

    model = VJF(cfg.replace(), seed=1)
    q, _ = model.filter(y[0, 0], qs=None)  # compile outside the timed loop
    t0 = time.perf_counter()
    for t in range(1, 51):
        q, l = model.filter(y[t, 0], qs=q)
    print(
        f"streaming filter: {50 / (time.perf_counter() - t0):.0f} steps/s "
        "(each call pays one host->device dispatch round-trip — latency "
        "floor, not compute; chunked filter_stream reaches ~4k steps/s)"
    )


if __name__ == "__main__":
    main()
