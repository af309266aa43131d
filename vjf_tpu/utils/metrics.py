"""Metrics stream, progress reporting, profiling hooks.

The reference's observability is a tqdm postfix with live ELBO components
(``vjf/model.py:262-274``) plus stray prints/warnings (SURVEY.md §5). Here
the step function already returns a metrics pytree per step; this module
adds host-side consumers: a progress callback factory (tqdm if available),
a JSONL metrics writer, and jax.profiler trace helpers for the throughput
work.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Optional

import numpy as np


def progress_callback(verbose: bool = True, total: Optional[int] = None) -> Callable:
    """Epoch-granular progress reporter for ``vjf_tpu.models.vjf.fit`` —
    the functional replacement of the reference's tqdm postfix."""
    bar = None
    if verbose:
        try:
            from tqdm import tqdm

            bar = tqdm(total=total, desc="fit")
        except Exception:
            bar = None

    def cb(epoch: int, epoch_loss: float, result) -> None:
        if bar is not None:
            m = result.metrics
            bar.update(1)
            bar.set_postfix(
                {
                    "Loss": f"{epoch_loss:.4f}",
                    "Recon": f"{float(np.asarray(m.recon[-1])):.4f}",
                    "Dynamics": f"{float(np.asarray(m.dynamics[-1])):.4f}",
                    "Entropy": f"{float(np.asarray(m.entropy[-1])):.4f}",
                }
            )
        elif verbose:
            print(f"epoch {epoch}: loss={epoch_loss:.6f}")

    return cb


class MetricsWriter:
    """Append-only JSONL metrics log (one line per epoch)."""

    def __init__(self, path: str):
        self.path = path
        self._t0 = time.time()

    def __call__(self, epoch: int, epoch_loss: float, result) -> None:
        m = result.metrics
        rec = {
            "epoch": epoch,
            "t": round(time.time() - self._t0, 3),
            "loss": float(epoch_loss),
            "recon": float(np.mean(np.asarray(m.recon))),
            "dynamics": float(np.mean(np.asarray(m.dynamics))),
            "entropy": float(np.mean(np.asarray(m.entropy))),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def multiplex(*callbacks: Callable) -> Callable:
    def cb(epoch, loss, result):
        for c in callbacks:
            c(epoch, loss, result)

    return cb


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """``jax.profiler`` trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec meter with honest device sync (fetches a scalar
    to force completion — plain block_until_ready can under-report through
    remote runtimes)."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n_steps: int, sync_scalar=None):
        if sync_scalar is not None:
            float(np.asarray(sync_scalar))
        self.steps += n_steps

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("nan")
