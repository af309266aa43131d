"""Bayesian linear regression — the closed-form dynamics learner.

Functional re-design of ``/root/reference/vjf/module.py:37-150``
(``LinearRegression``): the posterior over the weight matrix of a linear
map from features to velocity is updated *without gradients*, by recursive
least squares (RLS) or a weight-space Kalman step, once per timestep. This
dual gradient/closed-form structure is the defining feature of VJF.

Two algebraically-equivalent backends, chosen for TPU shape economics:

* **precision** — carries ``(w_mean, P, chol(P))`` like the reference
  (``vjf/module.py:52-54``). The update is one rank-B matmul on the MXU and
  one ``n_feat x n_feat`` Cholesky per step. Best when the per-step batch B
  is large (many trials share one dynamics model): the factorization size
  is independent of B.
* **covariance** — carries ``(w_mean, V = P^{-1})`` and updates by the
  Woodbury/Joseph form. The only factorization is ``B x B``; with B = 1
  (true streaming) it degenerates to pure vector ops — no Cholesky at all,
  the ideal TPU inner loop.

Both reproduce the reference's posterior exactly in exact arithmetic; the
precision backend is bit-closest to the reference for golden-parity runs.

The reference's Cholesky-failure fallback (``vjf/module.py:104-112``) calls
the long-removed ``torch.eig`` and crashes if ever hit; here the repair is
the branchless eigenvalue-clamp inside :func:`~vjf_tpu.ops.linalg.safe_cholesky`.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.kalman import joseph_update as _joseph_update
from ..ops.kalman import predict as _kalman_predict
from ..ops.linalg import (
    cho_solve,
    cholesky_f32,
    inv_tril_transpose,
    safe_cholesky,
    tri_inv_newton,
)
from ..types import Gaussian


class PrecisionBLR(NamedTuple):
    """Posterior ``w ~ N(w_mean, P^{-1})`` carried in precision form.

    Besides the Cholesky factor of P we cache its inverse transpose
    ``U = inv(L)^T`` (so ``U U^T = P^{-1}``). TPU rationale: the per-step
    predictive variance ``diag(F P^{-1} F^T)`` then costs one MXU matmul
    ``rowsum((F U)^2)`` instead of a (B-RHS) triangular solve inside the
    scan body — triangular solves are the slowest serial op on TPU, so they
    are paid once per *update* (n_feat RHS) rather than once per *predict*.
    """

    w_mean: Array          # (n_feature, n_out)
    precision: Array       # (n_feature, n_feature)
    prec_chol: Array       # lower Cholesky of precision
    prec_chol_inv_t: Array # U = inv(prec_chol)^T, U U^T = P^{-1}


class CovarianceBLR(NamedTuple):
    """Posterior ``w ~ N(w_mean, V)`` carried in covariance form."""

    w_mean: Array      # (n_feature, n_out)
    cov: Array         # (n_feature, n_feature)


class NSVBLR(NamedTuple):
    """Posterior carried as ``(w_mean, P, V ~= P^{-1})`` with the inverse
    maintained by warm-started Newton-Schulz refinement — the TPU-native
    hot-loop backend.

    Rationale (measured on v5e): XLA's Cholesky costs ~15 us and
    solve_triangular ~10 us per step inside scan, while 128x128 matmuls
    cost ~0.5 us. The hot loop only ever needs ``V`` itself (predictive
    variance ``diag(F V F^T)``, weight solve ``V g``) — never a triangular
    factor — so we track V across steps: with ``E = I - P_new V_old =
    -dP V_old`` and the trace bound ``tau = tr(dP V_old) = sum(fvf)/v``
    (a byproduct of the predictive variance), Newton-Schulz
    ``X <- X (2I - P X)`` contracts the residual as ``tau^(2^k)``; for
    ``tau < 1/4``, 3 iterations (6 matmuls) reach f32-level
    accuracy. Early steps where ``tau`` is large take a ``lax.cond``
    fallback through exact Cholesky + Newton triangular inverse (exact by
    nilpotency, MXU-only). Since ``tau ~ n_feat/t``, the fallback dies out
    after a few hundred steps. Being Newton refinement, the tracked V is
    *self-correcting* — per-step f32 rounding does not accumulate.
    """

    w_mean: Array      # (n_feature, n_out)
    precision: Array   # (n_feature, n_feature)
    cov: Array         # V, maintained ~= P^{-1}


BLRState = Union[PrecisionBLR, CovarianceBLR, NSVBLR]

NS_TAU_THRESHOLD = 0.25
NS_ITERS = 3


def init_precision(n_feature: int, n_out: int, dtype=jnp.float32) -> PrecisionBLR:
    """Zero mean, identity precision — ``vjf/module.py:46-54``."""
    # Distinct buffers (not one aliased eye): the training loop donates the
    # state pytree, and XLA rejects donating the same buffer twice.
    return PrecisionBLR(
        w_mean=jnp.zeros((n_feature, n_out), dtype=dtype),
        precision=jnp.eye(n_feature, dtype=dtype),
        prec_chol=jnp.eye(n_feature, dtype=dtype),
        prec_chol_inv_t=jnp.eye(n_feature, dtype=dtype),
    )


def init_covariance(n_feature: int, n_out: int, dtype=jnp.float32) -> CovarianceBLR:
    return CovarianceBLR(
        w_mean=jnp.zeros((n_feature, n_out), dtype=dtype),
        cov=jnp.eye(n_feature, dtype=dtype),
    )


def init_nsv(n_feature: int, n_out: int, dtype=jnp.float32) -> NSVBLR:
    return NSVBLR(
        w_mean=jnp.zeros((n_feature, n_out), dtype=dtype),
        precision=jnp.eye(n_feature, dtype=dtype),
        cov=jnp.eye(n_feature, dtype=dtype),
    )


def weight_sqrt(state: BLRState) -> Array:
    """A square root S of the weight covariance (``S S^T = V``).

    Precision backend returns ``inv(L_P)^T`` — the exact matrix the
    reference samples with (``vjf/module.py:71,101``); covariance backend
    returns ``chol(V)``. Either gives the correct sampling distribution
    ``w + S @ eps``.
    """
    if isinstance(state, PrecisionBLR):
        return state.prec_chol_inv_t
    return safe_cholesky(state.cov)   # CovarianceBLR and NSVBLR


def predict_gaussian(state: BLRState, feat: Array) -> Gaussian:
    """Predictive distribution given features — ``vjf/module.py:75-77``.

    Mean ``F w``; per-sample log-variance ``log diag(F V F^T)`` shared
    (tiled) across output dims, exactly like the reference's
    ``FL.mm(FL.t()).diagonal().log().tile(...)``.
    """
    mean = feat @ state.w_mean
    if isinstance(state, PrecisionBLR):
        z = feat @ state.prec_chol_inv_t               # F inv(L)^T — MXU matmul
        fvf = jnp.sum(z * z, axis=-1)                  # diag(F P^{-1} F^T)
    else:                                              # CovarianceBLR / NSVBLR
        fvf = jnp.sum((feat @ state.cov) * feat, axis=-1)
    logvar = jnp.broadcast_to(jnp.log(fvf)[..., None], mean.shape)
    return Gaussian(mean, logvar)


def predict_sample(state: BLRState, feat: Array, eps: Array) -> Array:
    """Draw ``w + S eps`` and apply — ``vjf/module.py:70-73`` with injected
    standard-normal ``eps`` of shape (n_feature, n_out)."""
    w = state.w_mean + weight_sqrt(state) @ eps
    return feat @ w


def rls(
    state: BLRState,
    feat: Array,
    target: Array,
    v: Array,
    shrink: float = 1.0,
    jitter: float = 0.0,
) -> BLRState:
    """One recursive-least-squares update on ``target ~ F w + N(0, v)``.

    Precision path mirrors ``vjf/module.py:79-103``: noise-scaled features,
    precision-recursive with forgetting factor ``shrink``; covariance path
    is the equivalent Woodbury/Joseph update (only a B x B factorization).

    :param feat: (B, n_feature)
    :param target: (B, n_out)
    :param v: scalar observation-noise variance
    """
    if isinstance(state, PrecisionBLR):
        # same f32 pin rationale as the NSV branch below: the g -> w -> g
        # feedback chain compounds bf16-pass rounding (no-op in f64 parity)
        hp = jax.lax.Precision.HIGHEST
        s = jnp.sqrt(v)
        sf = feat / s
        st = target / s
        g = (
            jnp.matmul(state.precision, state.w_mean, precision=hp) * shrink
            + sf.T @ st
        )
        p_new = state.precision * shrink + sf.T @ sf
        if jitter:
            p_new = p_new + jitter * jnp.eye(p_new.shape[0], dtype=p_new.dtype)
        chol = safe_cholesky(p_new)
        u = inv_tril_transpose(chol)                  # one n_feat-RHS solve/step
        w_new = jnp.matmul(                           # P^{-1} g via two matmuls
            u, jnp.matmul(u.T, g, precision=hp), precision=hp
        )
        return PrecisionBLR(w_new, p_new, chol, u)

    if isinstance(state, NSVBLR):
        # HIGHEST precision on the V/w feedback chain: TPU's default f32
        # matmul uses bf16 passes whose rounding compounds through the
        # g -> w -> g recursion (measured: training divergence at hot lr)
        hp = jax.lax.Precision.HIGHEST
        sf = feat / jnp.sqrt(v)
        st = target / jnp.sqrt(v)
        g = (
            jnp.matmul(state.precision, state.w_mean, precision=hp) * shrink
            + sf.T @ st
        )
        p_new = state.precision * shrink + sf.T @ sf
        if jitter:
            p_new = p_new + jitter * jnp.eye(p_new.shape[0], dtype=p_new.dtype)
        v_old = state.cov / shrink
        # trace bound of the NS residual: tau = tr(dP V_old) = sum(fvf)/v.
        # DELIBERATE under-count: dP also carries jitter*I, whose
        # jitter*tr(V_old) term is omitted here AND in the fused kernel —
        # the 0.05/0.25/0.7 escalation ladder was stability-tuned against
        # THIS definition (CLAUDE.md: the B=1+shrink fit sits at the
        # margin; shifting every band boundary re-opens that tuning)
        tau = jnp.sum((feat @ v_old) * feat) / v
        eye2 = 2.0 * jnp.eye(p_new.shape[0], dtype=p_new.dtype)

        def ns_path(v0):
            x = v0
            for _ in range(NS_ITERS):
                x = jnp.matmul(
                    x, eye2 - jnp.matmul(p_new, x, precision=hp), precision=hp
                )
            return 0.5 * (x + x.T)

        def exact_path(v0):
            del v0
            # plain cholesky: P is PD by construction here, and the eigh
            # repair inside safe_cholesky is catastrophic inside a TPU cond
            chol = cholesky_f32(p_new)
            x = tri_inv_newton(chol)                   # X = inv(L), exact, MXU-only
            # the final multiply MUST be full f32: at cond(P) ~ 1e4 the
            # default bf16-pass product leaves |P V - I| ~ 2 (measured) —
            # an "exact" inverse too wrong for Newton-Schulz to even polish
            return jnp.matmul(x.T, x, precision=hp)    # P^{-1} = L^-T L^-1

        v_new = jax.lax.cond(tau < NS_TAU_THRESHOLD, ns_path, exact_path, v_old)
        w_new = jnp.matmul(v_new, g, precision=hp)
        return NSVBLR(w_new, p_new, v_new)

    if jitter:
        # a full-rank precision shift is not expressible as a rank-B
        # Woodbury update; failing loudly beats silently dropping the
        # ridge the caller asked for (resolve_backend('auto') already
        # routes jittered configs away from this backend)
        raise ValueError(
            "the covariance RLS backend does not support chol_jitter; "
            "use the 'nsv' or 'precision' backend"
        )
    v1 = state.cov / shrink
    b = feat.shape[0]
    s_mat = v * jnp.eye(b, dtype=feat.dtype) + feat @ v1 @ feat.T
    ls = safe_cholesky(s_mat)
    k = cho_solve(ls, feat @ v1).T                    # gain, (n_feature, B)
    w_new = state.w_mean + k @ (target - feat @ state.w_mean)
    i_kf = jnp.eye(v1.shape[0], dtype=v1.dtype) - k @ feat
    cov_new = i_kf @ v1 @ i_kf.T + v * (k @ k.T)      # Joseph form
    return CovarianceBLR(w_new, cov_new)


def one_shot_rls(
    state: BLRState,
    feat: Array,
    target: Array,
    v: Array,
    shrink: float = 1.0,
    jitter: float = 0.0,
) -> BLRState:
    """Pooled (large-batch) RLS for the bootstrap/initialize paths
    (``vjf/module.py:144-150`` calls plain ``rls`` — fine in the
    reference's f64 torch, not in f32 on TPU).

    The incremental :func:`rls` is built for small rank-B updates; its NSV
    exact fallback forms an explicit triangular inverse whose f32 error
    grows ~cond(P)^2. A one-shot bootstrap Gram over ~800 pooled rows
    reaches cond ~1e8 (where the absolute ``chol_jitter`` is ~1e-9
    RELATIVE to the Gram's scale) and produced ``|w| ~ 2e23``, pinning the
    state noise at +clamp and silently destroying the learned dynamics
    (observed on the missing-data example). Here the same sufficient
    statistics feed one eigh with a relative eigenvalue floor
    (:func:`vjf_tpu.ops.linalg.eigh_floor_inv_pair`): bounded (P, V, w) at
    any conditioning, exactly consistent for downstream Newton-Schulz
    tracking. Once per fit, outside the hot scan — the eigh cost is
    irrelevant here (and only here)."""
    lowprec = jnp.asarray(state.w_mean).dtype != jnp.float64
    if not (
        isinstance(state, NSVBLR)
        or (isinstance(state, PrecisionBLR) and lowprec)
    ):
        # covariance path factorizes only a B x B matrix; the f64 precision
        # path is the golden-parity route and tolerates the one-shot Gram
        # (the reference itself runs plain rls here in f64 torch,
        # module.py:144-150) — both keep the incremental update
        return rls(state, feat, target, v, shrink=shrink, jitter=jitter)
    from ..ops.linalg import eigh_floor_inv_pair

    hp = jax.lax.Precision.HIGHEST
    s = jnp.sqrt(v)
    sf = feat / s
    st = target / s
    g = (
        jnp.matmul(state.precision, state.w_mean, precision=hp) * shrink
        + jnp.matmul(sf.T, st, precision=hp)
    )
    p_new = state.precision * shrink + jnp.matmul(sf.T, sf, precision=hp)
    if jitter:
        p_new = p_new + jitter * jnp.eye(p_new.shape[0], dtype=p_new.dtype)
    # solve in at least f32: eigh has no bf16 kernel (CPU LAPACK raises),
    # and a bf16 eigen-decomposition of a cond ~1e8 Gram would be noise
    dt = p_new.dtype
    sol_dt = jnp.promote_types(dt, jnp.float32)
    p_sol, v_sol = eigh_floor_inv_pair(p_new.astype(sol_dt))
    w_new = jnp.matmul(v_sol, g.astype(sol_dt), precision=hp).astype(dt)
    p_new, v_new = p_sol.astype(dt), v_sol.astype(dt)
    if isinstance(state, PrecisionBLR):
        # low-precision (f32/bf16) precision backend: its incremental rls
        # forms an explicit triangular inverse (inv_tril_transpose) whose
        # error grows with cond — fine per small step, not on a cond ~1e8
        # one-shot Gram.
        # Rebuild the factor pair from the FLOORED precision (cond <= the
        # floor's bound by construction, so the f32 triangular inverse of
        # this chol is accurate). Factor in >= f32 (no bf16 LAPACK kernel).
        chol = safe_cholesky(p_sol)
        return PrecisionBLR(
            w_new, p_new, chol.astype(dt), inv_tril_transpose(chol).astype(dt)
        )
    return NSVBLR(w_new, p_new, v_new)


def spectral_repair(
    state: NSVBLR, rel_floor: float = 1e-4, only_if_indefinite: bool = True
) -> NSVBLR:
    """Epoch-boundary re-factorization of the Newton-Schulz-tracked pair.

    Over a long small-batch stream, f32 accumulation noise in the precision
    recursion ``P <- lam P + F^T F + jitter I`` can push P's un-excited
    eigendirections INDEFINITE within a single epoch (measured on the
    canonical 3,183-step B=1 workload: evmin -7.2 at evmax 8.6e4 after the
    first post-bootstrap epoch; the VdP bench hit evmin -23.7 at the same
    phase boundary) — the NEXT epoch then explodes (w ~ 2e12, state noise
    pinned at +clamp) and costs a hot-tau demotion. This repair runs a
    relative-floored eigh (``ops.linalg.eigh_floor_inv_pair``; the 1e-4
    floor per CLAUDE.md trap 11) once per epoch BOUNDARY: P becomes PD with
    cond <= 1/rel_floor and V its exact inverse. ``w`` is kept — flooring
    is an identity-prior ridge on directions the data never excited.

    ``only_if_indefinite`` (the ``cfg.rls_epoch_repair='auto'`` behavior)
    applies the repaired pair ONLY when ``cholesky(P)`` fails — i.e. when P
    actually went indefinite. Measured (2026-08-19, epoch-boundary probes
    with the repair off): indefiniteness is a ONE-TIME event at the first
    post-bootstrap boundary, after which evmin sits at the jitter floor
    (~ chol_jitter/(1-shrink)) — while a steady-state NS tracking residual
    |PV - I| ~ 0.3-0.7 at the boundary snapshot is the healthy norm (the
    per-step Newton refinement is self-correcting, so it never compounds).
    Repairing UNCONDITIONALLY is actively harmful: at evmax ~ 8.5e4 the
    1e-4 relative floor lands at ~8.5 — ABOVE the legitimate jitter floor
    of ~1 — so every epoch start lifts genuinely-informative small
    eigenvalues, over-certifies those directions, and the RLS under-updates
    them ever after (measured: VdP 20-step forecast RMSE 0.85 with the
    unconditional repair vs 0.51 without, at matched epochs, identical
    latent R²). Pass ``only_if_indefinite=False`` (``'on'``) to force the
    old unconditional behavior.

    Cost: one eigh + one cholesky (n_feature+pad) per epoch (~1 ms on
    v5e) — invisible in the dispatch-bound B < 64 regime it targets
    (``cfg.rls_epoch_repair``, auto = mega/fused RLS epochs with batch <
    NS_ONE_ITER_MIN_BATCH). Not a per-step op: eigh inside the hot scan is
    catastrophic (trap 5). The PD probe is a plain ``jnp.linalg.cholesky``
    NaN-check, not a ``lax.cond`` (trap 5 again: heavy untaken branches
    bill anyway, so compute-and-select is the same cost and simpler).
    """
    from ..ops.linalg import eigh_floor_inv_pair

    dt = state.precision.dtype
    sol_dt = jnp.promote_types(dt, jnp.float32)
    p_sym = state.precision.astype(sol_dt)
    p_new, v_new = eigh_floor_inv_pair(p_sym, rel_floor=rel_floor)
    if only_if_indefinite:
        # XLA's cholesky yields NaNs past the failure point on a
        # non-PD input — a one-op PD witness (also trips on NaN/inf in P,
        # where the eigh repair output is garbage too, but the demotion
        # safety net catches that regime either way)
        ok = jnp.all(jnp.isfinite(jnp.linalg.cholesky(p_sym)))
        p_new = jnp.where(ok, p_sym, p_new)
        v_new = jnp.where(ok, state.cov.astype(sol_dt), v_new)
    return NSVBLR(state.w_mean, p_new.astype(dt), v_new.astype(dt))


def kalman(
    state: BLRState,
    feat: Array,
    target: Array,
    v: Array,
    diffusion: float = 0.0,
    quirk: bool = False,
) -> BLRState:
    """Weight-diffusion Kalman update ``w[t] = w[t-1] + N(0, diffusion I)``,
    ``target = F w[t] + N(0, v)`` — mirrors ``vjf/module.py:114-142`` via the
    Cholesky-form predict + Joseph update toolkit.

    State lives in weight space: "x" is the (n_feature, n_out) weight matrix
    with output dims playing the batch role, H is the feature matrix.

    ``quirk=True`` (``cfg.joseph_quirk``) runs the measurement update with
    the reference's double-``S^{-1}`` gain (``vjf/kalman.py:131-139``) for
    bit-faithful parity runs; see :func:`vjf_tpu.ops.kalman.joseph_update`.
    """
    if isinstance(state, PrecisionBLR):
        # Convert to covariance form, update, convert back.
        u0 = state.prec_chol_inv_t
        cov_state = CovarianceBLR(state.w_mean, u0 @ u0.T)
        new = kalman(cov_state, feat, target, v, diffusion, quirk)
        prec = jnp.linalg.inv(new.cov)
        chol = safe_cholesky(prec)
        return PrecisionBLR(new.w_mean, prec, chol, inv_tril_transpose(chol))

    if isinstance(state, NSVBLR):
        # cold path (weight-diffusion Kalman isn't used in the hot loop;
        # 'auto' routes kalman configs to the covariance backend —
        # resolve_backend): update in covariance form, rebuild the
        # tracked pair exactly.
        new = kalman(
            CovarianceBLR(state.w_mean, state.cov), feat, target, v,
            diffusion, quirk,
        )
        return NSVBLR(new.w_mean, jnp.linalg.inv(new.cov), new.cov)

    nf = state.cov.shape[0]
    b = feat.shape[0]
    eye = jnp.eye(nf, dtype=feat.dtype)
    if quirk:
        # strict-parity route: the Cholesky-form toolkit with the
        # reference's double-S^{-1} gain, factor-for-factor
        q = diffusion * eye
        r = v * jnp.eye(b, dtype=feat.dtype)
        chol_v = safe_cholesky(state.cov)
        yhat, what, chol_vhat = _kalman_predict(
            state.w_mean, chol_v, eye, q, feat
        )
        w_new, chol_new = _joseph_update(
            target, yhat, what, chol_vhat, feat, r, quirk=True
        )
        return CovarianceBLR(w_new, chol_new @ chol_new.T)

    # Hot path (r3, VERDICT #4): the direct covariance-form Joseph update.
    # Same math as predict + joseph_update, but with ZERO (nf x nf)
    # factorizations — the old route cost 3-4 safe_cholesky calls per
    # step, each carrying an eigh-repair lax.cond that TPU bills ~1 ms
    # even untaken (CLAUDE.md trap 5; measured 4,500 steps/s). Here the
    # only factorization is the (B x B) innovation Cholesky, PD by
    # construction (F Vhat F^T + v I with Vhat PD by the Joseph-form
    # induction), so plain cholesky_f32 suffices. Products feeding the
    # V'/w' recursion carry full-precision pins (trap 8: bf16 passes
    # compound through feedback chains).
    hp = jax.lax.Precision.HIGHEST
    vhat = state.cov + diffusion * eye
    hv = jnp.matmul(feat, vhat, precision=hp)            # (B, nf) = F Vhat
    s = jnp.matmul(hv, feat.T, precision=hp) + v * jnp.eye(b, dtype=feat.dtype)
    ls = cholesky_f32(0.5 * (s + s.T))
    k = cho_solve(ls, hv).T                              # Vhat F^T S^{-1}
    e = target - feat @ state.w_mean
    w_new = state.w_mean + jnp.matmul(k, e, precision=hp)
    i_kf = eye - jnp.matmul(k, feat, precision=hp)
    cov_new = (
        jnp.matmul(jnp.matmul(i_kf, vhat, precision=hp), i_kf.T, precision=hp)
        + v * jnp.matmul(k, k.T, precision=hp)
    )
    return CovarianceBLR(w_new, 0.5 * (cov_new + cov_new.T))


class NonBayesLR(NamedTuple):
    """The reference's ``LinearRegression(..., bayes=False)`` mode
    (``vjf/module.py:46-50,66-68``): ``w_mean`` is a gradient-trained
    parameter (a registered ``Parameter`` there — visible to the optimizer,
    unlike the Bayesian mode's plain attribute) and ``forward`` returns the
    point prediction ``F w``, never a Gaussian. No closed-form updates
    apply. Unused by the reference's ``VJF`` but part of the constructor
    surface; kept as its own tiny pytree so it slots into gradient-trained
    parameter collections.
    """

    w_mean: Array      # (n_feature, n_out)


def init_nonbayes(n_feature: int, n_out: int, dtype=jnp.float32) -> NonBayesLR:
    return NonBayesLR(w_mean=jnp.zeros((n_feature, n_out), dtype=dtype))


def predict_point(state: NonBayesLR, feat: Array) -> Array:
    """``functional.linear(feat, w.t())`` — ``vjf/module.py:66-68``."""
    return feat @ state.w_mean


def batch_lstsq_posterior(
    feat: Array, target: Array, v: Array, dtype=None
) -> Tuple[Array, Array]:
    """Closed-form batch posterior ``(w, P)`` from an identity prior — the
    ground truth that one RLS pass from init must reproduce (property-tested).
    """
    dtype = dtype or feat.dtype
    p = jnp.eye(feat.shape[1], dtype=dtype) + feat.T @ feat / v
    w = jnp.linalg.solve(p, feat.T @ target / v)
    return w, p
