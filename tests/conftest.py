"""Test harness configuration.

Tests run on a *virtual 8-device CPU mesh* — the JAX-world substitute for a
multi-chip TPU slice (SURVEY.md §4): sharding/collective behavior is
validated without hardware, and the driver separately dry-run-compiles the
multi-chip path.

Note: the container's sitecustomize imports jax at interpreter startup with
``JAX_PLATFORMS=axon`` (a tunneled real TPU chip), so the env var is already
captured before this file runs — we must override via ``jax.config`` (still
before first backend use). CPU is required here: remote round-trips are
~100x slower and TPUs have no float64 for the parity suite.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests against the float64 reference need x64; perf paths pass
# explicit float32 dtypes and are unaffected by this global.
jax.config.update("jax_enable_x64", True)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled executables between test modules.

    A full-suite run performs ~500 in-process XLA:CPU compilations; with all
    executables kept live, the final compilations can segfault inside
    ``backend_compile_and_load`` (observed on a 1-CPU container: crash in the
    last test of the suite, which passes in isolation and in a file-only
    run). Dropping the pjit caches at module boundaries frees the compiler's
    accumulated JIT state; cross-module cache hits are rare, so the recompile
    cost is small.
    """
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
