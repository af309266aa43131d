"""Numerical linear-algebra guards and Cholesky helpers.

TPU-native equivalents of ``/root/reference/vjf/numerical.py`` plus the
Cholesky plumbing the Bayesian regression needs. Under jit there are no
data-dependent exceptions, so the reference's try/except jitter-retry on
Cholesky failure (``vjf/module.py:104-112`` — whose fallback calls the
removed ``torch.eig`` and would crash on modern torch) becomes a branchless
detect-and-repair: compute the factor, and where it came back non-finite,
recompute from an eigenvalue-clamped PSD projection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def symmetric(a: Array, rtol: float = 1e-5, atol: float = 1e-8) -> Array:
    """Symmetry check — ``vjf/util.py:16-17`` (returns a traced bool; under
    jit use it in ``checkify``/``jnp.where`` guards rather than asserts)."""
    return jnp.allclose(a, a.swapaxes(-1, -2), rtol=rtol, atol=atol)


def symmetrize(a: Array) -> Array:
    """Exact symmetrization (upper triangle mirrored) — ``vjf/numerical.py:17-19``."""
    u = jnp.triu(a)
    return u + jnp.triu(a, 1).swapaxes(-1, -2)


def positivize(a: Array, eps: float = 1e-3) -> Array:
    """Eigenvalue-clamped PSD projection — ``vjf/numerical.py:8-14``."""
    w, v = jnp.linalg.eigh(a)
    s = jnp.sqrt(jnp.clip(w, min=eps))
    sqrt = v * s[..., None, :]
    return sqrt @ sqrt.swapaxes(-1, -2)


def eigh_floor_inv_pair(a: Array, rel_floor: float = 1e-5):
    """``(A_floored, A_floored^{-1})`` by one eigh with RELATIVE eigenvalue
    flooring: eigenvalues below ``rel_floor * lam_max`` are clamped up, so
    both outputs are bounded and EXACTLY mutually inverse (up to roundoff)
    at any input conditioning — the f32-robust solve for one-shot /
    bootstrap normal equations. Flooring the matrix (not just its inverse)
    keeps a tracked (P, V) pair consistent for downstream Newton-Schulz
    polishing. Host-level use only: eigh inside a TPU scan/cond is
    catastrophic (CLAUDE.md trap 5); the floor must stay well above
    f32 eps (trap 11)."""
    lam, u = jnp.linalg.eigh(symmetrize(a))
    lam_max = jnp.maximum(lam[-1], jnp.finfo(a.dtype).tiny)
    lam_f = jnp.maximum(lam, rel_floor * lam_max)
    # HIGHEST precision is load-bearing: the outputs feed iterative-inverse
    # chains (NSV tracking, bootstrap w solve); a default bf16-pass
    # reconstruction at cond 1/rel_floor ~ 1e4 would perturb P by more than
    # the jitter floor it is meant to restore (CLAUDE.md traps 8/10)
    hp = jax.lax.Precision.HIGHEST
    return (
        jnp.matmul(u * lam_f, u.T, precision=hp),
        jnp.matmul(u / lam_f, u.T, precision=hp),
    )


def cholesky_f32(a: Array) -> Array:
    """Cholesky with any internal matmuls pinned to full f32.

    Insurance, cheap: on v5e the small-matrix Cholesky was measured
    bit-identical with and without the pin, but XLA's blocked algorithm may
    lower to dots at other shapes/versions and TPU's default f32 matmul
    runs bf16 passes. (The measured |P V - I| ~ 2 exact-inverse failure was
    the UNPINNED ``x.T @ x`` product after the triangular inverse — see
    ``regression.rls``'s exact_path — not the factorization itself.)
    """
    with jax.default_matmul_precision("float32"):
        return jnp.linalg.cholesky(a)


def safe_cholesky(a: Array, eps: float = 1e-3) -> Array:
    """Cholesky with branchless PSD repair.

    ``jnp.linalg.cholesky`` returns NaNs (not an exception) on indefinite
    input; where that happens we refactor the ``positivize``-d matrix. The
    repair branch costs an eigh but runs behind ``lax.cond`` so the happy
    path stays one factorization.
    """
    chol = cholesky_f32(a)

    def repair(_):
        return cholesky_f32(positivize(a, eps))

    def keep(_):
        return chol

    bad = ~jnp.all(jnp.isfinite(chol))
    return jax.lax.cond(bad, repair, keep, operand=None)


def tril_solve(chol: Array, b: Array) -> Array:
    """Solve ``L x = b`` with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(chol, b, lower=True)


def cho_solve(chol: Array, b: Array) -> Array:
    """Solve ``(L L^T) x = b`` given the lower Cholesky factor."""
    return jax.scipy.linalg.cho_solve((chol, True), b)


def inv_tril_transpose(chol: Array) -> Array:
    """``inv(L)^T`` — the upper-triangular square root of ``inv(L L^T)``.

    Mirrors the reference's ``w_chol = inv(w_pchol.T)`` (``vjf/module.py:101``):
    with ``P = L L^T``, the returned ``U`` satisfies ``U U^T = P^{-1}``.
    """
    eye = jnp.eye(chol.shape[-1], dtype=chol.dtype)
    return tril_solve(chol, eye).T


def tri_inv_newton(tri: Array, lower: bool = True) -> Array:
    """Exact triangular inverse by Newton iteration — MXU-only.

    Seeded with ``diag(1/diag)``, the error ``E = I - T X0`` is *strictly*
    triangular, hence nilpotent (``E^n = 0``); each Newton step
    ``X <- X (2I - T X)`` squares E, so ceil(log2(n)) iterations terminate
    exactly. 2*ceil(log2(n)) matmuls (~3 us for n=128 on v5e) vs ~10 us for
    ``solve_triangular``'s sequential substitution — the TPU-native way to
    invert the small triangular factors in the RLS hot loop.
    """
    import math

    del lower  # the algorithm is triangularity-agnostic
    n = tri.shape[-1]
    eye = jnp.eye(n, dtype=tri.dtype)
    diag = jnp.diagonal(tri, axis1=-2, axis2=-1)
    x = eye * (1.0 / diag)[..., :, None]
    two_eye = 2.0 * eye
    # HIGHEST precision is load-bearing: TPU's default f32 matmul uses bf16
    # passes, whose rounding compounds through the inverse-feedback chain
    hp = jax.lax.Precision.HIGHEST
    for _ in range(max(1, math.ceil(math.log2(n)))):
        x = jnp.matmul(x, two_eye - jnp.matmul(tri, x, precision=hp), precision=hp)
    return x
