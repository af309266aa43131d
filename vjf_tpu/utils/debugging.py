"""Numerical debugging toggles.

The reference's failure handling is silent zeroing and warnings
(SURVEY.md §5); when something does go non-finite you want to find it, not
mask it. These helpers flip the JAX-native switches and provide a guarded
step wrapper that reports the first offending pytree leaf.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise on the first NaN produced anywhere under jit
    (``jax_debug_nans``); pair with ``JAX_DISABLE_JIT=1`` to get exact
    Python tracebacks."""
    jax.config.update("jax_debug_nans", enable)


def assert_all_finite(tree: Any, name: str = "pytree") -> None:
    """Host-side check: raises listing every non-finite leaf path."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        import numpy as np

        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite leaves in {name}: {bad}")


def debug_finite_callback(tree: Any, label: str = "state"):
    """Inside-jit finite check via ``jax.debug.callback``.

    NOT free: the reduced ``ok`` flag is transferred to the host and the
    Python callback runs on EVERY call, finite or not (only the print is
    conditional). Against a ~7 us/step hot loop that per-step host sync
    is orders of magnitude — use on suspect epochs/segments, not inside
    production scan bodies."""
    flat, _ = jax.tree_util.tree_flatten(tree)
    ok = jnp.array(True)
    for leaf in flat:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))

    def report(ok_val):
        if not bool(ok_val):
            print(f"[vjf_tpu] non-finite values detected in {label}")

    jax.debug.callback(report, ok)
