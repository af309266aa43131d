"""Persistent XLA compilation cache for cold-start walls.

The reference has no compilation step at all (eager torch,
``/root/reference/vjf/model.py`` runs ops as it goes), so its first epoch
costs the same as its last. Here every distinct (epoch layout, shape,
flags) graph pays one XLA compile — 30-60 s/graph through a tunneled
remote TPU runtime — which dominates SMALL workloads run in a fresh
process (measured: the canonical 3,183x150 fit ranges 25-675 s cold vs
9.4 s warm-cache; docs/RESULTS.md). JAX can persist compiled executables
to disk keyed by (HLO, flags, compiler version); this helper turns that
on with production defaults so the Nth process run costs roughly the
warm-cache wall plus deserialization.

Opt-in (one call, before the first jit dispatch is best — entries
compiled earlier in the process are still persisted at compile time, but
anything compiled before the call cannot be): ``bench_all.py`` and the
examples call it when ``VJF_COMPILE_CACHE`` is set.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("vjf_tpu")

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vjf_tpu", "xla"
)


def enable_compilation_cache(
    path: Optional[str] = None,
    min_compile_secs: float = 1.0,
) -> str:
    """Enable JAX's persistent compilation cache at ``path``.

    ``path`` defaults to ``$VJF_COMPILE_CACHE`` if set (any non-path-like
    truthy value like ``1`` maps to ``~/.cache/vjf_tpu/xla``), else the
    ``~/.cache`` default. ``min_compile_secs`` skips persisting trivial
    graphs (the cache would otherwise fill with sub-second CPU helper
    jits). Returns the cache directory actually configured.

    Safe to call more than once (idempotent config updates); safe on any
    backend — the cache key includes the compiler/platform, so CPU-test
    and TPU entries never collide.
    """
    import jax

    if path is None:
        env = os.environ.get("VJF_COMPILE_CACHE", "")
        path = env if os.sep in env or env.startswith(".") else _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    # cache regardless of how long the EXECUTABLE takes to run (default
    # behavior already, but pin explicitly for forward-compat)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (AttributeError, ValueError):  # older jax: flag absent
        pass
    logger.info("Persistent XLA compilation cache enabled at %s", path)
    return path


def maybe_enable_from_env() -> Optional[str]:
    """Enable the cache iff ``$VJF_COMPILE_CACHE`` is set (examples/bench
    hook — keeps the default behavior byte-identical for users who did
    not opt in). Returns the directory or None."""
    if os.environ.get("VJF_COMPILE_CACHE"):
        return enable_compilation_cache()
    return None
