"""Neural-population example: 200-channel Poisson observations, 10-D latent,
256 trials, streaming online filter (BASELINE configs #4/#5).

Demonstrates the TPU-scale path: batched trials through the fused
filter-then-learn scan, optional multi-device sharding, and the streaming
``filter`` API for true online use.

Run: ``python examples/neural_population.py [--trials 256] [--steps 2000]``.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
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

    # synthetic latent drives Poisson rates
    rng = np.random.default_rng(0)
    C = rng.normal(size=(args.xdim, args.ydim)) * 0.3
    z = np.cumsum(rng.normal(size=(args.steps, args.trials, args.xdim)) * 0.05, axis=0)
    y = rng.poisson(np.exp(np.clip(z @ C, -3, 3))).astype(np.float32)
    ys = jnp.asarray(y)
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
    q = None
    t0 = time.perf_counter()
    for t in range(50):
        q, l = model.filter(y[t, :1], qs=q)
    print(f"streaming filter: {50 / (time.perf_counter() - t0):.0f} steps/s (host-loop bound)")


if __name__ == "__main__":
    main()
