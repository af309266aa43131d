"""Missing-data example: ragged trials + electrode dropout + smoothing.

Capabilities beyond the reference (which trains only lockstep,
fully-observed batches — ``vjf/model.py:183,253``):

1. ragged trials — two unequal-length trials padded with NaN to a common
   T, trained jointly via ``fit(mask=...)``;
2. electrode dropout — 30% of observation entries missing at random
   (NaN), handled by ``fit(channel_mask=...)`` with model-based
   imputation of the recognition input;
3. post-hoc smoothing with missing data — ``VJF.smooth(channel_mask=...)``
   drops masked entries from the observation update exactly (infinite
   observation variance, zero Kalman gain).

Run: ``python examples/missing_data.py [--max-iter 30]``.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vjf_tpu.api import VJF
from vjf_tpu.utils.evaluation import latent_r2


def main():
    from vjf_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()  # $VJF_COMPILE_CACHE: skip cold XLA compiles
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-iter", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    T, T2, ydim = 800, 500, 16
    t = np.arange(T) * 0.05
    x1 = np.stack([np.sin(t), np.cos(t)], -1) + 0.02 * rng.normal(size=(T, 2))
    x2 = np.stack([np.sin(t + 1.3), np.cos(t + 1.3)], -1) \
        + 0.02 * rng.normal(size=(T, 2))
    C = rng.normal(size=(2, ydim))
    d = rng.normal(size=ydim)
    y = np.stack([x1 @ C + d, x2 @ C + d], axis=1)
    y += 0.1 * rng.normal(size=y.shape)
    y = y.astype(np.float32)

    # --- 1. ragged trials: trial 2 ends at T2; pad with NaN -------------
    y_ragged = y.copy()
    y_ragged[T2:, 1, :] = np.nan
    mask = np.ones((T, 2), np.float32)
    mask[T2:, 1] = 0.0

    model = VJF.make_model(ydim, 2, n_rbf=40, hidden_sizes=[16],
                           likelihood="gaussian", seed=0, lr=3e-3,
                           rls_backend="nsv", fused_step="off", rtol=2e-3,
                           rls_shrink=0.999, chol_jitter=1e-3)
    t0 = time.time()
    mu, _, loss = model.fit(y_ragged, mask=mask, max_iter=args.max_iter,
                            epochs_per_dispatch=5)
    print(f"ragged fit: loss={float(loss):.4f}  ({time.time() - t0:.1f}s)")
    print("  trial 1 (full)   R^2 =",
          f"{latent_r2(np.asarray(mu[:, 0]), x1):.3f}")
    print("  trial 2 (to T2)  R^2 =",
          f"{latent_r2(np.asarray(mu[:T2, 1]), x2[:T2]):.3f}")

    # --- 2. electrode dropout: 30% of entries missing -------------------
    cm = (rng.uniform(size=(T, 1, ydim)) > 0.3).astype(np.float32)
    y_drop = np.where(cm > 0, y[:, :1], np.nan)

    model2 = VJF.make_model(ydim, 2, n_rbf=40, hidden_sizes=[16],
                            likelihood="gaussian", seed=0, lr=3e-3,
                            rls_backend="nsv", fused_step="off", rtol=2e-3,
                            rls_shrink=0.999, chol_jitter=1e-3)
    t0 = time.time()
    mu2, _, loss2 = model2.fit(y_drop, channel_mask=cm,
                               max_iter=args.max_iter,
                               epochs_per_dispatch=5)
    print(f"30%-dropout fit: loss={float(loss2):.4f}  "
          f"({time.time() - t0:.1f}s)")
    print("  latent R^2 =", f"{latent_r2(np.asarray(mu2[:, 0]), x1):.3f}")

    # --- 3. post-hoc smoothing with the same missing entries ------------
    filtered, smoothed = model2.smooth(
        y_drop[:, 0], x_ref=np.asarray(mu2[:, 0]), channel_mask=cm[:, 0]
    )
    ok = bool(np.all(np.isfinite(np.asarray(smoothed.means))))
    print("smoothed-with-dropout R^2 =",
          f"{latent_r2(np.asarray(smoothed.means), x1):.3f}",
          f"finite={ok}")

    # --- 4. co-smoothing: hold out whole channels, score prediction -----
    # (the real-data evaluation protocol — the model never sees these
    # channels during inference; models/evaluate.py)
    held = [2, 9, 14]
    res = model2.evaluate(y[:, 0], heldout=held)
    print("co-smoothing (held-out channels", held, "):",
          f"pred R^2 = {float(res.r2):.3f},",
          f"loglik gain over null = {float(res.loglik - res.loglik_null):.1f} nats")
    assert float(res.loglik) > float(res.loglik_null), \
        "held-out prediction must beat the constant null"


if __name__ == "__main__":
    main()
