"""Fused RLS update as a single Pallas TPU kernel.

The per-timestep hot spot of VJF is the Bayesian regression update
(``vjf/module.py:79-103`` semantics): rank-B precision update, Cholesky
factorization, triangular inverse, and weight solve. Under plain XLA these
are 4+ separate ops with HBM round-trips and a slow blocked Cholesky
(~20-25 us/step measured on v5e); everything involved fits in VMEM many
times over, so one fused kernel removes all fusion boundaries.

Kernel internals (all VMEM-resident, n padded to a multiple of 128):

* ``P' = shrink * P + F^T F / v`` and ``g = shrink * P w + F^T dx / v`` —
  MXU matmuls.
* Cholesky by a symmetric rank-1 column sweep: the Schur complement of a
  symmetric matrix stays symmetric, so column j equals row j and the sweep
  reads *rows* (sublane-dim dynamic slices — the fast direction on TPU),
  avoiding lane-dim gathers entirely. Each of the n iterations is one
  row-normalize + one outer-product subtract on the VPU.
* Triangular inverse by Newton iteration ``X <- X (2I - A X)`` seeded with
  ``diag(1/diag)``: for triangular A the error ``I - A X0`` is strictly
  triangular, hence *nilpotent*, so the iteration terminates EXACTLY in
  ceil(log2(n)) steps — 7 pairs of MXU matmuls for n=128, no approximation.
* ``w' = U (U^T g)`` — two MXU matmuls (``U U^T = P'^{-1}``).

Padding contract: caller pads P with identity on the pad diagonal and
feat/w with zeros; padded dims then stay exactly decoupled through the
update and are sliced off afterwards.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def _chol_sweep_ref(m_ref, r_ref, n: int) -> None:
    """In-VMEM Cholesky of the symmetric matrix in ``m_ref`` (destroyed);
    writes the UPPER factor ``R = L^T`` into ``r_ref`` (row j of R is column
    j of L — written row-wise because sublane dynamic indexing is the fast
    direction on TPU; Mosaic has no value-level dynamic_slice, so the sweep
    runs on scratch refs)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(j, _):
        row = m_ref[pl.ds(j, 1), :]                                # (1, n) = M[j, :]
        d = jnp.sum(jnp.where(cols == j, row, 0.0))                # M[j, j]
        inv_s = jax.lax.rsqrt(d)
        l_row = jnp.where(cols >= j, row * inv_s, 0.0)             # (1, n)
        r_ref[pl.ds(j, 1), :] = l_row
        m_ref[:] = m_ref[:] - l_row * l_row.T                      # rank-1 outer, VPU
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _tri_inv_upper(r: Array, n: int) -> Array:
    """Exact inverse of upper-triangular ``r`` via Newton iteration.

    ``E = I - R X0`` is strictly upper triangular (nilpotent, E^n = 0), and
    each Newton step squares E, so ceil(log2(n)) iterations give the exact
    inverse using only MXU matmuls.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    eye_mask = (rows == cols).astype(r.dtype)
    diag = jnp.sum(r * eye_mask, axis=1, keepdims=True)            # (n, 1)
    x = eye_mask / diag
    two_eye = 2.0 * eye_mask
    for _ in range(max(1, math.ceil(math.log2(n)))):
        x = x @ (two_eye - r @ x)
    return x


def _rls_kernel(scal_ref, p_ref, w_ref, feat_ref, dx_ref,
                p_out, w_out, chol_out, u_out, m_scr, r_scr, *, n: int):
    v = scal_ref[0, 0]
    shrink = scal_ref[0, 1]
    inv_s = jax.lax.rsqrt(v)

    feat = feat_ref[:] * inv_s                                     # F / sqrt(v)
    dx = dx_ref[:] * inv_s
    p = p_ref[:]
    w = w_ref[:]

    g = (p @ w) * shrink + jnp.dot(feat.T, dx, preferred_element_type=p.dtype)
    p_new = p * shrink + jnp.dot(feat.T, feat, preferred_element_type=p.dtype)
    p_out[:] = p_new

    m_scr[:] = p_new
    _chol_sweep_ref(m_scr, r_scr, n)                               # upper, R^T R = P
    r = r_scr[:]
    chol_out[:] = r.T                                              # lower factor L
    u = _tri_inv_upper(r, n)                                       # U = R^{-1} = inv(L)^T
    u_out[:] = u
    w_out[:] = u @ (u.T @ g)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_rls(
    p: Array,
    w: Array,
    feat: Array,
    dx: Array,
    v: Array,
    shrink: Array,
    interpret: bool = False,
):
    """Fused precision-form RLS step.

    :param p: (nf, nf) precision
    :param w: (nf, no) weight mean
    :param feat: (B, nf) features
    :param dx: (B, no) targets
    :param v: scalar noise variance
    :param shrink: scalar forgetting factor
    :return: (p_new, w_new, chol_lower, u) with u = inv(chol)^T
    """
    nf, no = w.shape
    b = feat.shape[0]
    n = _round_up(nf)
    no_p = _round_up(no)
    b_p = _round_up(b, 8)
    dtype = p.dtype

    # pad: identity on P's pad diagonal keeps pad dims decoupled
    if n != nf:
        pad_eye = jnp.eye(n, dtype=dtype).at[:nf, :nf].set(0.0)
        p_pad = jnp.zeros((n, n), dtype).at[:nf, :nf].set(p) + pad_eye
    else:
        p_pad = p
    w_pad = jnp.zeros((n, no_p), dtype).at[:nf, :no].set(w)
    feat_pad = jnp.zeros((b_p, n), dtype).at[:b, :nf].set(feat)
    dx_pad = jnp.zeros((b_p, no_p), dtype).at[:b, :no].set(dx)
    scal = jnp.stack([jnp.asarray(v, dtype), jnp.asarray(shrink, dtype)]).reshape(1, 2)

    out_shapes = (
        jax.ShapeDtypeStruct((n, n), dtype),       # P'
        jax.ShapeDtypeStruct((n, no_p), dtype),    # w'
        jax.ShapeDtypeStruct((n, n), dtype),       # chol (lower)
        jax.ShapeDtypeStruct((n, n), dtype),       # U = inv(chol)^T
    )
    kernel = functools.partial(_rls_kernel, n=n)
    p_new, w_new, chol, u = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((n, n), dtype),
            pltpu.VMEM((n, n), dtype),
        ],
        interpret=interpret,
    )(scal, p_pad, w_pad, feat_pad, dx_pad)

    if n != nf or no_p != no:
        p_new = p_new[:nf, :nf]
        w_new = w_new[:nf, :no]
        chol = chol[:nf, :nf]
        u = u[:nf, :nf]
    return p_new, w_new, chol, u
