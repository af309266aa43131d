"""Parallel-in-time Kalman filtering and RTS smoothing via associative scan.

A TPU-native capability beyond the reference: the online filter is
inherently sequential (per-step parameter updates), but *post-hoc state
inference* in the learned model is not — for a (locally) linear-Gaussian
state-space model, Kalman filtering and smoothing are associative
operations (Sarkka & Garcia-Fernandez, "Temporal Parallelization of
Bayesian Smoothers", IEEE TAC 2021), so ``jax.lax.associative_scan`` runs
them in O(log T) depth across the whole sequence — the long-sequence trick
noted as future work in SURVEY.md §5.

Model (time-invariant system matrices, time-varying observations):

    x[t] = A x[t-1] + N(0, Q),   y[t] = H x[t] + N(0, R),  x[0] ~ N(m0, P0)

Five-tuple filtering elements ``(A, b, C, eta, J)`` composing as
conditional Gaussians; three-tuple smoothing elements ``(E, g, L)``
composing backward. Both passes are pure matmul/solve batches — MXU work
with logarithmic critical path.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import Array


class FilterResult(NamedTuple):
    means: Array   # (T, xdim) filtered means
    covs: Array    # (T, xdim, xdim) filtered covariances


class SmoothResult(NamedTuple):
    means: Array
    covs: Array


def _gj_inverse(m):
    """Batched inverse of SMALL (n <= ~16) matrices via UNROLLED
    Gauss-Jordan with partial pivoting — pure batched elementwise/gather
    XLA ops, no ``lax.linalg`` primitive anywhere.

    Why: on TPU, batched small-matrix LU is effectively a serialized
    per-matrix loop — ONE ``jnp.linalg.solve`` of (38400, 10, 10) systems
    measured 134 ms on-chip (~3.5 us per 10x10 matrix, ~100x off memory
    bandwidth), and the associative-scan combine runs two of them per
    scan level. The unrolled form is ~n passes of full-batch elementwise
    work (memory-bandwidth grade) and fuses into the surrounding scan.
    Partial pivoting keeps it LU-stable; the explicit-inverse-then-matmul
    application is accurate here because every consumer pins its
    application matmuls to full f32 precision (CLAUDE.md traps 8/10) and
    the combine's matrices ``I + C J`` have eigenvalues >= 1.
    """
    n = m.shape[-1]
    eye = jnp.eye(n, dtype=m.dtype)
    aug = jnp.concatenate([m, jnp.broadcast_to(eye, m.shape)], axis=-1)
    rows = jnp.arange(n)
    for k in range(n):
        # partial pivot: strongest remaining row in column k
        col = jnp.abs(aug[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)          # only rows >= k
        p = jnp.argmax(col, axis=-1)                        # (...,)
        pk = p[..., None]
        rows_b = jnp.broadcast_to(rows, aug.shape[:-2] + (n,))
        swapped = jnp.where(rows_b == k, pk,
                            jnp.where(rows_b == pk, k, rows_b))
        aug = jnp.take_along_axis(aug, swapped[..., None], axis=-2)
        # normalize pivot row, eliminate column k from every other row
        prow = aug[..., k:k + 1, :] / aug[..., k:k + 1, k:k + 1]
        fac = aug[..., :, k:k + 1]
        aug = jnp.where((rows == k)[:, None], prow, aug - fac * prow)
    return aug[..., :, n:]


_PHIGH = jax.lax.Precision.HIGHEST


def _apply(minv, rhs):
    """Explicit-inverse application at FULL f32 precision (the result
    feeds covariance/information recursions across the scan — default
    bf16 matmul passes are the trap-8/10 failure mode)."""
    return jnp.matmul(minv, rhs, precision=_PHIGH)


def _broadcast_a(a, t_len):
    """Accept a time-invariant (x, x) or per-step (T, x, x) transition."""
    if a.ndim == 2:
        return jnp.broadcast_to(a, (t_len,) + a.shape)
    return a


def _broadcast_b(b, t_len, xdim, dtype):
    if b is None:
        return jnp.zeros((t_len, xdim), dtype)
    if b.ndim == 1:
        return jnp.broadcast_to(b, (t_len, b.shape[0]))
    return b


def _filter_elements(a, q, h, r, m0, p0, ys, b=None):
    """Per-step associative elements (eqs. 10-12 of the paper); ``a`` may be
    time-varying (a[t] maps x[t-1] -> x[t]), the dynamics affine
    (``x[t] = a[t] x[t-1] + b[t] + noise``), and the observation noise ``r``
    per-step (``(T, ydim, ydim)`` — needed by the iterated Laplace/Poisson
    smoother, whose working observations carry R_t = diag(1/lambda_t))."""
    t_len = ys.shape[0]
    xdim = q.shape[0]
    eye = jnp.eye(xdim, dtype=q.dtype)
    a_seq = _broadcast_a(a, t_len)
    b_seq = _broadcast_b(b, t_len, xdim, q.dtype)

    if r.ndim == 2:
        # time-invariant observation side: factor once
        s = h @ q @ h.T + r                               # (ydim, ydim)
        s_chol = jax.scipy.linalg.cho_factor(s)
        k = jax.scipy.linalg.cho_solve(s_chol, h @ q).T   # K = Q H^T S^-1
        i_kh = eye - k @ h
        c_el = i_kh @ q
        hs_inv_h = h.T @ jax.scipy.linalg.cho_solve(s_chol, h)

        c_el = 0.5 * (c_el + c_el.T)   # exact-arith symmetric; pin it
        hs_inv_h = 0.5 * (hs_inv_h + hs_inv_h.T)

        def generic(a_t, b_t, y):
            innov = y - h @ b_t
            b_out = i_kh @ b_t + k @ y
            eta = a_t.T @ h.T @ jax.scipy.linalg.cho_solve(s_chol, innov)
            j_t = a_t.T @ hs_inv_h @ a_t
            return i_kh @ a_t, b_out, c_el, eta, 0.5 * (j_t + j_t.T)

        a_g, b_g, c_g, eta_g, j_g = jax.vmap(generic)(a_seq, b_seq, ys)
    else:

        def generic_t(a_t, b_t, y, r_t):
            s_t = jax.scipy.linalg.cho_factor(h @ q @ h.T + r_t)
            k_t = jax.scipy.linalg.cho_solve(s_t, h @ q).T
            i_kh_t = eye - k_t @ h
            innov = y - h @ b_t
            b_out = i_kh_t @ b_t + k_t @ y
            eta = a_t.T @ h.T @ jax.scipy.linalg.cho_solve(s_t, innov)
            j_t = a_t.T @ (h.T @ jax.scipy.linalg.cho_solve(s_t, h)) @ a_t
            c_t = i_kh_t @ q
            return (i_kh_t @ a_t, b_out, 0.5 * (c_t + c_t.T), eta,
                    0.5 * (j_t + j_t.T))

        a_g, b_g, c_g, eta_g, j_g = jax.vmap(generic_t)(a_seq, b_seq, ys, r)

    # first element conditions on the prior
    r0 = r if r.ndim == 2 else r[0]
    a0 = a_seq[0]
    m1m = a0 @ m0 + b_seq[0]
    p1m = a0 @ p0 @ a0.T + q
    s1 = h @ p1m @ h.T + r0
    s1_chol = jax.scipy.linalg.cho_factor(s1)
    k1 = jax.scipy.linalg.cho_solve(s1_chol, h @ p1m).T
    a1 = jnp.zeros((xdim, xdim), q.dtype)
    b1 = m1m + k1 @ (ys[0] - h @ m1m)
    c1 = (eye - k1 @ h) @ p1m
    c1 = 0.5 * (c1 + c1.T)
    eta1 = jnp.zeros((xdim,), q.dtype)
    j1 = jnp.zeros((xdim, xdim), q.dtype)

    a_all = a_g.at[0].set(a1)
    b_all = b_g.at[0].set(b1)
    c_all = c_g.at[0].set(c1)
    eta_all = eta_g.at[0].set(eta1)
    j_all = j_g.at[0].set(j1)
    return a_all, b_all, c_all, eta_all, j_all


def _filter_elements_diag(a, q, h, r, m0, p0, ys, b=None):
    """Per-step elements for DIAGONAL per-step observation noise ``r``
    of shape (T, ydim), in information form: with per-channel weights
    ``w = 1/r``, ``Phi_t = H^T diag(w_t) H`` and ``z_t = H^T (w_t * y_t)``,
    the Woodbury identity turns every S_t^-1 application into an
    xdim-by-xdim solve::

        K_t H = M_t^-1 Phi_t,   K_t y_t = M_t^-1 z_t,
        H^T S_t^-1 = Q^-1 M_t^-1 H^T diag(w_t),   M_t = Q^-1 + Phi_t

    so nothing of size (ydim, ydim) is ever materialized per step — the
    dense per-step-R path costs O(T ydim^2) memory and a (ydim, ydim)
    Cholesky per step (~11.5 GB and 72k 200x200 factorizations for the
    flagship's T=72k/ydim=200), this one O(T xdim^2) and xdim-sized
    solves. Entries with ``r = inf`` (missing observations) carry weight
    exactly 0 — the infinite-variance limit of deleting the row, with NO
    residual Kalman gain (a finite inflation factor leaves gain
    ~HPH'/(HPH'+scale*r) which is non-negligible when the trained r is
    tiny); their ``ys`` values may be NaN."""
    t_len = ys.shape[0]
    xdim = q.shape[0]
    eye = jnp.eye(xdim, dtype=q.dtype)
    a_seq = _broadcast_a(a, t_len)
    b_seq = _broadcast_b(b, t_len, xdim, q.dtype)
    r_seq = jnp.broadcast_to(jnp.asarray(r, q.dtype), (t_len, h.shape[0]))
    w = jnp.where(jnp.isfinite(r_seq), 1.0 / r_seq, 0.0)     # (T, ydim)
    y_safe = jnp.where(w > 0, ys, 0.0)                        # NaN-safe
    z = (w * y_safe) @ h                                      # (T, xdim)
    phi = jnp.einsum("ty,yi,yj->tij", w, h, h)                # (T, x, x)
    q_inv = _gj_inverse(q)

    def generic(a_t, b_t, phi_t, z_t):
        # ONE unrolled-GJ inverse + a stacked full-precision application
        # replaces three independent LU factorizations (batched small
        # linalg is the costliest primitive in this module on TPU — see
        # _gj_inverse's perf note)
        m = q_inv + phi_t
        m_inv = _gj_inverse(m)
        rhs = jnp.concatenate(
            [phi_t, z_t[:, None], (z_t - phi_t @ b_t)[:, None]], axis=-1
        )
        sol = _apply(m_inv, rhs)
        kh = sol[:, :xdim]                                    # K_t H
        i_kh = eye - kh
        b_out = i_kh @ b_t + sol[:, xdim]
        eta = a_t.T @ (q_inv @ sol[:, xdim + 1])
        j = a_t.T @ (q_inv @ kh) @ a_t
        j = 0.5 * (j + j.T)
        c_t = i_kh @ q
        return i_kh @ a_t, b_out, 0.5 * (c_t + c_t.T), eta, j

    a_g, b_g, c_g, eta_g, j_g = jax.vmap(generic)(a_seq, b_seq, phi, z)

    # first element conditions on the prior (information form again)
    a0 = a_seq[0]
    m1m = a0 @ m0 + b_seq[0]
    p1m = a0 @ p0 @ a0.T + q
    p1m_inv = _gj_inverse(p1m)
    c1 = _gj_inverse(p1m_inv + phi[0])
    c1 = 0.5 * (c1 + c1.T)
    b1 = c1 @ (p1m_inv @ m1m + z[0])
    a1 = jnp.zeros((xdim, xdim), q.dtype)
    eta1 = jnp.zeros((xdim,), q.dtype)
    j1 = jnp.zeros((xdim, xdim), q.dtype)

    return (
        a_g.at[0].set(a1),
        b_g.at[0].set(b1),
        c_g.at[0].set(c1),
        eta_g.at[0].set(eta1),
        j_g.at[0].set(j1),
    )


def _filter_combine(ei, ej):
    """(A,b,C,eta,J)_i then _j — eq. 9 of the paper (batched over scan).

    Perf (r5): this combine runs ~2T times per filter (the assoc-scan's
    total work), and batched small-matrix LU is the single most expensive
    primitive on TPU — the original form paid FIVE independent
    ``jnp.linalg.solve`` factorizations per combine. With ``C`` and ``J``
    symmetric (they are covariance-/information-matrix iterates, and the
    element constructors + this combine keep them symmetrized), ``N = I +
    J C = M^T``, so ONE :func:`_gj_inverse` of ``M = I + C J`` serves
    every solve — the M-solves and the transpose (N-) solves are two
    full-precision applications of the same explicit inverse. Notes from
    the on-chip bisection (2026-08-21): ``lu_factor``/``lu_solve``
    composed into ``associative_scan`` KERNEL-FAULTS the TPU worker
    (batched LU standalone is fine; in-scan it crashes twice,
    deterministically), and even plain ``jnp.linalg.solve`` costs
    ~3.5 us per 10x10 matrix batched — hence the unrolled Gauss-Jordan."""
    ai, bi, ci, etai, ji = ei
    aj, bj, cj, etaj, jj = ej
    xdim = ai.shape[-1]
    eye = jnp.eye(xdim, dtype=ai.dtype)

    m = eye + ci @ jj                                     # (..., x, x)
    m_inv = _gj_inverse(m)
    bc = bi[..., None] + ci @ etaj[..., None]             # (..., x, 1)
    rhs_m = jnp.concatenate([ai, bc, ci], axis=-1)        # (..., x, 2x+1)
    sol_m = _apply(m_inv, rhs_m)
    a_out = aj @ sol_m[..., :xdim]
    b_out = (aj @ sol_m[..., xdim:xdim + 1])[..., 0] + bj
    c_out = aj @ sol_m[..., xdim + 1:] @ jnp.swapaxes(aj, -1, -2) + cj
    c_out = 0.5 * (c_out + jnp.swapaxes(c_out, -1, -2))

    # N = I + J C = M^T for symmetric C, J: apply M^-T, same inverse
    nb = (etaj - (jj @ bi[..., None])[..., 0])[..., None]
    rhs_n = jnp.concatenate([nb, jj @ ai], axis=-1)       # (..., x, x+1)
    sol_n = _apply(jnp.swapaxes(m_inv, -1, -2), rhs_n)
    ait = jnp.swapaxes(ai, -1, -2)
    eta_out = (ait @ sol_n[..., :1])[..., 0] + etai
    j_out = ait @ sol_n[..., 1:] + ji
    j_out = 0.5 * (j_out + jnp.swapaxes(j_out, -1, -2))
    return a_out, b_out, c_out, eta_out, j_out


def parallel_filter(
    a: Array, q: Array, h: Array, r: Array, m0: Array, p0: Array, ys: Array,
    b: Array = None, *, diag_r: bool = False,
) -> FilterResult:
    """Kalman filter over (T, ydim) observations in O(log T) depth.

    ``diag_r=True``: ``r`` holds per-step diagonal observation VARIANCES,
    shape (T, ydim) or (ydim,); ``inf`` entries are missing observations
    (exactly zero weight). Otherwise ``r`` is a dense (ydim, ydim) or
    per-step (T, ydim, ydim) covariance."""
    make = _filter_elements_diag if diag_r else _filter_elements
    elems = make(a, q, h, r, m0, p0, ys, b)
    a_s, b_s, c_s, _, _ = jax.lax.associative_scan(_filter_combine, elems)
    del a_s
    return FilterResult(means=b_s, covs=c_s)


def _smooth_elements(a, q, filtered: FilterResult, b=None):
    """Backward elements (E, g, L): x_t | x_{t+1} ~ N(E x_{t+1} + g, L).

    With time-varying dynamics, the gain at t uses the transition INTO
    t+1, i.e. ``a[t+1]`` / ``b[t+1]``."""
    t_len = filtered.means.shape[0]
    xdim = q.shape[0]
    a_seq = _broadcast_a(a, t_len)
    b_seq = _broadcast_b(b, t_len, xdim, q.dtype)
    a_next = jnp.roll(a_seq, -1, axis=0)                 # a_next[t] = a[t+1]
    b_next = jnp.roll(b_seq, -1, axis=0)

    def elem(a_n, b_n, m, p):
        pp = a_n @ p @ a_n.T + q
        pp = 0.5 * (pp + pp.T)
        e = _apply(_gj_inverse(pp), a_n @ p).T           # G = P A^T Pp^-1
        g = m - e @ (a_n @ m + b_n)
        l = p - e @ pp @ e.T
        return e, g, 0.5 * (l + jnp.swapaxes(l, -1, -2))

    e_all, g_all, l_all = jax.vmap(elem)(a_next, b_next, filtered.means, filtered.covs)
    # last element: identity on the filtered terminal state
    xdim = q.shape[0]
    e_all = e_all.at[-1].set(jnp.zeros((xdim, xdim), q.dtype))
    g_all = g_all.at[-1].set(filtered.means[-1])
    l_all = l_all.at[-1].set(filtered.covs[-1])
    return e_all, g_all, l_all


def _smooth_combine(ej, ei):
    """Compose x_i = E_i x_j + g_i, backward direction."""
    ei_e, ei_g, ei_l = ei
    ej_e, ej_g, ej_l = ej
    e_out = ei_e @ ej_e
    g_out = (ei_e @ ej_g[..., None])[..., 0] + ei_g
    l_out = ei_e @ ej_l @ jnp.swapaxes(ei_e, -1, -2) + ei_l
    return e_out, g_out, l_out


def parallel_smooth(
    a: Array, q: Array, h: Array, r: Array, m0: Array, p0: Array, ys: Array,
    b: Array = None, *, diag_r: bool = False,
) -> Tuple[FilterResult, SmoothResult]:
    """Full RTS smoother in two associative scans (filter fwd, smooth bwd).
    ``diag_r``: see :func:`parallel_filter`."""
    filtered = parallel_filter(a, q, h, r, m0, p0, ys, b, diag_r=diag_r)
    elems = _smooth_elements(a, q, filtered, b)
    _, g_s, l_s = jax.lax.associative_scan(
        _smooth_combine, elems, reverse=True
    )
    return filtered, SmoothResult(means=g_s, covs=l_s)


def sequential_filter(a, q, h, r, m0, p0, ys, b=None) -> FilterResult:
    """O(T) reference implementation (lax.scan) for validation."""
    t_len = ys.shape[0]
    a_seq = _broadcast_a(a, t_len)
    b_seq = _broadcast_b(b, t_len, q.shape[0], q.dtype)
    # a time-invariant (ydim, ydim) R is closure-captured, NOT broadcast
    # to a (T, ydim, ydim) scan input — XLA would materialize it, which at
    # this module's own long-context scale (T=72k, ydim=200) is ~11.5 GB
    time_varying_r = r.ndim == 3

    def step(carry, inp):
        a_t, b_t, y, r_t = inp if time_varying_r else (*inp, r)
        m, p = carry
        mp = a_t @ m + b_t
        pp = a_t @ p @ a_t.T + q
        s = h @ pp @ h.T + r_t
        k = jnp.linalg.solve(s, h @ pp).T
        m_new = mp + k @ (y - h @ mp)
        p_new = (jnp.eye(q.shape[0], dtype=q.dtype) - k @ h) @ pp
        return (m_new, p_new), (m_new, p_new)

    xs = (a_seq, b_seq, ys, r) if time_varying_r else (a_seq, b_seq, ys)
    _, (ms, ps) = jax.lax.scan(step, (m0, p0), xs)
    return FilterResult(means=ms, covs=ps)


def sequential_smooth(a, q, filtered: FilterResult, b=None) -> SmoothResult:
    """O(T) RTS smoother for validation."""
    t_len = filtered.means.shape[0]
    a_seq = _broadcast_a(a, t_len)
    b_seq = _broadcast_b(b, t_len, q.shape[0], q.dtype)

    def step(carry, inp):
        a_n, b_n, m, p = inp                             # a_n/b_n at t+1
        ms_next, ps_next = carry
        pp = a_n @ p @ a_n.T + q
        g = jnp.linalg.solve(pp, a_n @ p).T
        m_s = m + g @ (ms_next - a_n @ m - b_n)
        p_s = p + g @ (ps_next - pp) @ g.T
        return (m_s, p_s), (m_s, p_s)

    init = (filtered.means[-1], filtered.covs[-1])
    _, (ms, ps) = jax.lax.scan(
        step, init,
        (a_seq[1:], b_seq[1:], filtered.means[:-1], filtered.covs[:-1]),
        reverse=True,
    )
    ms = jnp.concatenate([ms, filtered.means[-1:]], axis=0)
    ps = jnp.concatenate([ps, filtered.covs[-1:]], axis=0)
    return SmoothResult(means=ms, covs=ps)
