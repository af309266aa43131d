"""Interrupted multi-subject sweep: checkpoint -> crash -> bit-exact resume,
with per-member forecast-gated selection (round-4 features end-to-end).

Simulates the production pattern for long per-subject sweeps: fit N
independent models with `fit_ensemble(checkpoint_path=...,
checkpoint_every=K)`, kill the job partway (here: a max_iter cut),
resume with `resume_from=` — and verify the resumed sweep is
BIT-identical to an uninterrupted one, member for member, including the
forecast-selection snapshots. Self-validating (asserts), ~1-2 min on the
real chip, also runs on CPU.

Run from a checkout: ``python examples/sweep_resume.py``
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vjf_tpu.config import VJFConfig
from vjf_tpu.parallel import fit_ensemble, init_ensemble
from vjf_tpu.utils.evaluation import latent_r2


def main():
    # --- N=4 subjects: same ring dynamics, subject-specific observations
    T, B, ydim, N = 400, 2, 16, 4
    rng = np.random.default_rng(0)
    th = np.cumsum(0.12 + 0.01 * rng.normal(size=T))
    x = np.stack([np.cos(th), np.sin(th)], axis=-1)
    ys = np.stack([
        (x @ rng.normal(size=(ydim, 2)).T)[:, None, :]
        + 0.1 * rng.normal(size=(T, B, ydim))
        for _ in range(N)
    ]).astype(np.float32)

    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=40, hidden_sizes=(16,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", lr=1e-3, rtol=1e-6, warmup_max=4,
                    select="forecast", select_horizon=20, select_starts=16)
    states = init_ensemble(jax.random.PRNGKey(1), cfg, N)
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    max_iter, cut = 16, 8

    # --- the uninterrupted reference sweep
    full = fit_ensemble(cfg, states, ys, keys=keys, max_iter=max_iter)

    # --- interrupted run: checkpoint every 4 epochs, "crash" at epoch 8
    ckpt = os.path.join(tempfile.mkdtemp(), "sweep")
    fit_ensemble(cfg, states, ys, keys=keys, max_iter=cut,
                 checkpoint_path=ckpt, checkpoint_every=4)
    print(f"interrupted at epoch {cut}; snapshot at {ckpt}.npz "
          f"({os.path.getsize(ckpt + '.npz') / 1e6:.2f} MB)")

    # --- resume to completion
    resumed = fit_ensemble(cfg, states, ys, keys=keys, max_iter=max_iter,
                           resume_from=ckpt)

    # --- bit-exact, member for member (selection snapshots included)
    for a, b in zip(jax.tree_util.tree_leaves(full.states),
                    jax.tree_util.tree_leaves(resumed.states)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "resumed sweep diverged from the uninterrupted run"
    assert np.array_equal(full.selected_epoch, resumed.selected_epoch)
    np.testing.assert_allclose(np.asarray(full.selected_metric),
                               np.asarray(resumed.selected_metric),
                               rtol=1e-12)
    print("resume == uninterrupted: BIT-exact across all members (OK)")
    print("per-member selected epochs:", resumed.selected_epoch.tolist(),
          "of", resumed.epochs_run.tolist(), "run")

    # --- quality: every member recovers the latent ring
    r2 = [latent_r2(np.asarray(resumed.mu[i, :, 0, :]), x) for i in range(N)]
    print("latent R^2 per member:", [round(v, 3) for v in r2])
    assert all(v > 0.8 for v in r2), f"latent recovery too low: {r2}"
    print("sweep resume example OK")


if __name__ == "__main__":
    main()
