"""The whole VJF filter-then-learn step as ONE Pallas TPU kernel.

Measured on v5e: the XLA-compiled step costs ~27 us of which the large
majority is per-op dispatch latency (~0.4-0.5 us per matmul/fusion at these
tiny shapes — a 128x128 matmul is ~50 ns of MXU time). Every tensor in the
step fits in VMEM hundreds of times over, so the TPU-native answer is to
fuse the *entire* step — recognition forward, ELBO, hand-derived backward,
clipped SGD, and the Newton-Schulz RLS update — into a single kernel with
no internal loops (NS iterations unrolled; no Cholesky — see
``vjf_tpu.models.regression.NSVBLR``).

Design notes:
  * :func:`step_math` is the full step as a pure jnp function, shared by
    the kernel body and by interpret/CPU tests, so the hand-written
    gradients are verified against ``jax.grad`` of the XLA formulation.
  * No concatenates anywhere: the recognition input ``[y, u, q.mean,
    q.logvar]`` and the RBF input ``[x, u]`` are handled by storing the
    first-layer weights and centroids pre-split per segment — lane-dim
    concats are relayouts on TPU; split weights turn them into extra MXU
    matmuls that fuse into the same pass.
  * The dynamics state is padded to a 128-multiple once per epoch
    (identity pad block on P/V, zero pad elsewhere, +1e6 pad centroids so
    padded basis responses are exactly 0) — zero per-step padding cost.
  * The rare exact-inverse fallback (early steps, before Newton-Schulz
    warm-start contracts) runs OUTSIDE the kernel behind ``lax.cond`` on
    the kernel's tau output.

Semantics mirror ``vjf/model.py:179-221`` (ordering: forward -> loss ->
clipped SGD -> obs-noise update -> RLS -> state-noise update), with two
documented perf-path deviations: the skip-step guard gates on loss
finiteness rather than per-leaf gradient finiteness, and V is
Newton-Schulz-tracked (exact to ~1e-6, self-correcting).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import StepFlags, VJFConfig

NS_ITERS = 3
NS_TAU_THRESHOLD = 0.25
# Escalation ceiling for the cond-free steady-state (mega) kernel: two extra
# Newton-Schulz iterations are applied when tau >= NS_TAU_THRESHOLD, which
# keeps the tracked inverse within ~tau^32 (< 1.1e-5 at tau = 0.7) of exact;
# beyond NS_TAU_MAX the update is skipped for that step and the tau shows up
# in the scalar stream for the host to inspect (fit() warns — see
# models.vjf.fit). Post-prefix tau was measured < 0.05 on every BASELINE
# config, so neither branch fires in steady state.
NS_TAU_MAX = 0.7
NS_EXTRA_ITERS = 2
# The mega kernel runs its base Newton-Schulz iterations (batch-adaptive,
# see mega_epoch_call: 1 at B >= NS_ONE_ITER_MIN_BATCH, else 2) and
# escalates behind hardware branches: +1 iteration at tau >= 0.05
# (matching the XLA path's fixed 3) and +2 more at tau >= NS_TAU_THRESHOLD.
# Each f32 128x128x128 iteration costs ~0.55 us on v5e, so the large-batch
# common case saves one iteration without giving up accuracy: steady-state
# tau at B = 256 measured 2e-9 (single-iteration residual tau^2 ~ 5e-18;
# flagship epoch losses identical to 4 decimals at ~8% more throughput).
# DO NOT touch the small-batch banding: the B = 1 + shrink regime sits
# exactly at this scheme's stability margin — empirically, EITHER dropping
# to 1 base iteration OR lowering the escalation threshold to 0.01 (even
# with MORE total iterations) tips a previously-clean Van der Pol fit into
# the hot-tau demotion path (the safety net catches it, at the cost of an
# XLA recompile and a demoted epoch layout).
NS_TAU_ESCALATE = 0.05
# Minimum per-step trial count for the 1-base-iteration steady state: tau
# scales like (per-step update)/(accumulated P), i.e. ~1/stream-length x
# batch-normalized — at B >= 64 the measured post-prefix tau is < 1e-6 on
# every config; at B = 1 it hovers near the escalation threshold.
NS_ONE_ITER_MIN_BATCH = 64


def prefix_free_next(current: bool, hot_max: float, tau_max: float) -> bool:
    """Next-dispatch prefix-free decision from a watched epoch's tau stats
    (``cfg.ns_prefix_free`` — see config.py; shared by ``fit_ensemble``
    and the solo blocked driver): engage below the in-kernel escalation
    threshold (the per-step and mega kernels compute identically there),
    revoke on any hot step or on re-entering the exact-fallback band,
    hold in the hysteresis band between (escalation handles it)."""
    if hot_max > 0 or tau_max >= NS_TAU_THRESHOLD:
        return False
    if tau_max < NS_TAU_ESCALATE:
        return True
    return current


def epoch_repair_enabled(cfg, n_batch: int) -> bool:
    """Resolve ``cfg.rls_epoch_repair``: 'auto' enables the epoch-boundary
    spectral repair (``models.regression.spectral_repair``) for small-batch
    fused epochs — the dispatch-bound regime where the per-epoch eigh is
    invisible and where long-stream f32 conditioning failures live (the
    large-batch bands measured post-prefix tau < 1e-6; their P stays
    benign and the flagship epoch is compute-bound, so auto skips them)."""
    mode = cfg.rls_epoch_repair
    if mode not in ("auto", "on", "off"):
        # fail loudly: a typo'd mode silently resolving to 'auto' would
        # skip the forced repair the user asked for, with no error or log
        raise ValueError(
            f"rls_epoch_repair must be 'auto', 'on', or 'off' (got {mode!r})"
        )
    if mode == "on":
        return True
    if mode == "off":
        return False
    return n_batch < NS_ONE_ITER_MIN_BATCH


def maybe_epoch_repair(cfg, flags, state, n_batch: int):
    """Epoch-boundary spectral repair of the NSV-tracked (P, V) pair, if
    this epoch is RLS-active and ``cfg.rls_epoch_repair`` resolves enabled.

    THE single implementation of the repair gate — called by
    ``run_epoch_fused``, the sharded fused epoch, and ``fit``'s hot-tau
    demotion branch (the XLA re-run must not resume from the unrepaired
    pre-epoch backup: an epoch that is both hot AND indefinite-at-start
    would hand the XLA path's plain-cholesky exact fallback a non-PD P).
    Must run on the UNPADDED blr: the relative floor would lift the pad
    identity block's unit eigenvalues to ``rel_floor * lam_max``. 'auto'
    repairs only when P actually went indefinite (unconditional flooring
    measurably degrades the learned dynamics — see ``spectral_repair``'s
    docstring); 'on' forces the floor every boundary.
    """
    do_fallback = flags.update and flags.update_transition and not flags.warm_up
    if not (do_fallback and epoch_repair_enabled(cfg, n_batch)):
        return state
    from ...models import regression as _reg

    if not isinstance(state.dynamics.blr, _reg.NSVBLR):
        return state
    return state._replace(
        dynamics=state.dynamics._replace(
            blr=_reg.spectral_repair(
                state.dynamics.blr,
                only_if_indefinite=cfg.rls_epoch_repair != "on",
            )
        )
    )


def _round_up(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


class FusedCarry(NamedTuple):
    """Kernel-layout training state (padded, biases 2D, weights pre-split)."""

    # recognition first layer, split by input segment (torch layout (out, in))
    w_in_y: Array                 # (h0, yd)
    w_in_u: Optional[Array]       # (h0, ud) or None when udim == 0
    w_in_m: Array                 # (h0, xd)
    w_in_lv: Array                # (h0, xd)
    # deeper hidden layers + all biases
    w_hidden: Tuple[Array, ...]   # each (h_i, h_{i-1}), layers 1..
    b_hidden: Tuple[Array, ...]   # each (1, h_i), layers 0..
    w_mean: Array                 # (xd, h_last)
    w_logvar: Array               # (xd, h_last)
    b_logvar: Array               # (1, xd)
    # decoder
    w_dec: Array                  # (yd, xd)
    b_dec: Array                  # (1, yd)
    # dynamics (padded to nfp), centroids split by segment
    cent_x: Array                 # (nfp, xd) — pad rows at +1e6
    cent_u: Optional[Array]       # (nfp, ud) or None
    c2: Array                     # (1, nfp) — sum of squared centroid coords
    inv_w2: Array                 # (1, nfp) — exp(-2 logwidth)
    # SGP dynamics only (None for rbf): whitened-feature transform. The SE
    # kernel row k(x, Z) is the unit-width RBF response scaled by scale^2,
    # so phi(x) = k(x, Z) L_zz^{-T} (gp/sgp.py:features) becomes one extra
    # MXU matmul by w_white = scale^2 * L_zz^{-T}, computed once per epoch
    # in pad_carry. scale2 feeds the DTC variance correction
    # k(x,x) - |phi|^2 (gp/sgp.py:predict_from_features).
    w_white: Optional[Array]      # (nfp, nfp), zero-padded, or None
    scale2: Optional[Array]       # (1, 1) exp(2 log_scale), or None
    p_mat: Array                  # (nfp, nfp) precision, identity pad block
    v_mat: Array                  # (nfp, nfp) NS-tracked inverse
    w_dyn: Array                  # (nfp, xd), zero pad rows
    # scalars as (1, 1)
    state_logvar: Array
    lik_logvar: Array             # gaussian obs noise (zeros for poisson)
    dyn_n: Array                  # float running-var counters
    lik_n: Array
    rng_seed: Array               # (1, 1) int32 — in-kernel PRNG base seed
    rng_count: Array              # (1, 1) int32 — per-step stream counter


class ScalarPack(NamedTuple):
    loss: Array                   # (1, 1) each
    recon: Array
    dyn: Array
    ent: Array
    tau: Array


class StepOut(NamedTuple):
    carry: FusedCarry
    qt_mean: Array
    qt_logvar: Array
    g_vec: Array                  # (nfp, xd) RLS target (for exact fallback)
    xt: Array                     # (B, xd)
    xs: Array                     # (B, xd)
    scal: ScalarPack


class FusedSums(NamedTuple):
    """Everything the step needs from the batch, reduced over trials.

    This is the whole cross-device surface of the algorithm: trials are
    embarrassingly parallel except through these sums (gradient batch-sums
    for SGD, the RLS sufficient statistics F^T F / F^T dx, and the scalar
    ELBO/noise statistics — SURVEY.md §2.4). Under ``shard_map`` a single
    ``psum`` of this pytree makes :func:`step_apply` bit-consistent on every
    device. Batch-dependent scalings use the GLOBAL inverse batch size
    (passed to :func:`step_forward_sums`), so local contributions sum to the
    single-device values exactly; additive constants (``xd * slogvar``,
    ``ydim * lik_lv``, ...) are applied once in :func:`step_apply`.
    """

    # gradient batch-sums (loss-scaled; pre-clip, pre-lr)
    g_w_in_y: Array
    g_w_in_u: Optional[Array]
    g_w_in_m: Array
    g_w_in_lv: Array
    g_w_hidden: Tuple[Array, ...]
    g_b_hidden: Tuple[Array, ...]
    g_w_mean: Array
    g_w_logvar: Array
    g_b_logvar: Array
    g_w_dec: Array
    g_b_dec: Array
    g_lik_lv_batch: Array     # () gaussian batch part (constant added in apply)
    # ELBO batch sums (per-trial parts only)
    recon_batch: Array        # () poisson recon; gaussian reconstructed from sq_y
    dyn_batch: Array          # ()
    ent: Array                # ()
    sq_y: Array               # () gaussian squared residual sum
    # sum over every gradient tensor: non-finite iff ANY gradient entry is
    # (inf + finite = inf, inf - inf = nan), so isfinite(grad_check) is an
    # exact-and-cheap per-leaf gradient gate — closing the r1 skip-gate
    # deviation (a NaN gradient under a FINITE loss is constructible via a
    # saturated tanh unit fed by an overflowing upstream gradient:
    # inf * (1 - tanh^2 = 0) = nan; clip() passes NaN through, so an
    # ungated step would cement it into the weights).
    grad_check: Array         # ()
    # RLS raw sufficient statistics (inv_sv scaling applied in apply)
    ftf_raw: Array            # (nfp, nfp)
    fxd_raw: Array            # (nfp, xd)
    fvf_sum: Array            # ()
    dx_sum: Array             # ()
    dx2_sum: Array            # ()
    # () count of OBSERVED (channel-mask x trial-mask) y entries, or None
    # when no channel mask rides the step — the gaussian likelihood's
    # per-observed-entry logvar constant and the fractional obs-noise
    # sample count (sum(cm)/ydim) both need it (models/likelihoods.py:
    # gaussian_lik_update channel_mask branch)
    cm_sum: Optional[Array] = None


class PerTrial(NamedTuple):
    """Trial-local step outputs (never cross devices)."""

    qt_m: Array
    qt_lv: Array
    xt: Array
    xs: Array
    feat: Array
    dx: Array


def _mm_fn(cfg: VJFConfig, f32):
    # bf16-input matmuls (f32 accumulate) for activations / gradients /
    # sufficient statistics: f32 matmuls cost 6 MXU passes on v5e. The
    # error-feedback-critical chain (P w, final NS polish, V g) stays f32 —
    # bf16 there would compound through the RLS recursion.
    mp = cfg.matmul_dtype == "bfloat16" and f32 == jnp.float32

    def mm(a_, b_):
        if mp:
            return jnp.dot(
                a_.astype(jnp.bfloat16),
                b_.astype(jnp.bfloat16),
                preferred_element_type=f32,
            )
        return jnp.dot(a_, b_, preferred_element_type=f32)

    return mm


def step_forward_sums(
    cfg: VJFConfig,
    flags: StepFlags,
    carry: FusedCarry,
    qs_m: Array,
    qs_lv: Array,
    y: Array,
    u: Optional[Array],
    eps_s: Array,
    eps_t: Array,
    inv_b,
    mask: Optional[Array] = None,
    local_renorm: bool = True,
    cmask: Optional[Array] = None,
) -> Tuple[FusedSums, PerTrial]:
    """Per-trial phase of the fused step: forward pass, hand-written
    backward, and trial-axis reductions. ``inv_b`` must be the GLOBAL
    1/batch so that summing :class:`FusedSums` across trial shards
    reproduces the single-device values (see class docstring).

    ``mask``: optional (B, 1) 0/1 trial-validity column (ragged trials).
    Semantics mirror the XLA path (models/vjf.py filter_step): masked rows
    are sanitized to zero at the inputs, selected out of every reduction
    (loss, gradients, RLS statistics, noise-update residuals), and the
    batch means divide by the valid count. With ``local_renorm=True``
    (single-device) that count is computed here from the LOCAL mask; a
    sharded caller passes ``local_renorm=False`` plus the traced GLOBAL
    ``inv_b = 1/max(valid count over all shards, 1)`` so the local
    contributions still sum to the single-device values across the psum.
    ``mask=None`` traces to the identical computation as before.

    ``cmask``: optional (B, ydim) 0/1 missing-observation mask (electrode
    dropout — :func:`models.vjf.filter_step` channel_mask). Masked entries
    are sanitized to zero, dropped from the likelihood channel sum and its
    gradient, and the recognition input sees the model's imputation (the
    decoder's prediction from ``qs_m`` — one extra MXU matmul; Poisson on
    the count scale, matching ``_impute_y``). Composes with ``mask``."""
    f32 = qs_m.dtype
    slogvar = carry.state_logvar[0, 0]
    has_u = u is not None and u.shape[-1] > 0
    mm = _mm_fn(cfg, f32)

    if cmask is not None:
        # channel holes first (select, not multiply: NaN-safe), matching
        # filter_step's sanitize order
        cm = (cmask > 0).astype(f32)                          # (B, ydim)
        y = jnp.where(cm > 0, y, 0.0)
    if mask is not None:
        # sanitize (select, not multiply: NaN padding * 0 = NaN) and
        # renormalize over the valid count — XLA batch_weighted_mean
        m_col = (mask > 0).astype(f32)                        # (B, 1)
        y = jnp.where(m_col > 0, y, 0.0)
        if has_u:
            u = jnp.where(m_col > 0, u, 0.0)
        if local_renorm:
            count = jnp.sum(m_col)
            inv_b = 1.0 / jnp.maximum(count, 1.0)
    if cmask is not None:
        # effective per-entry validity: a masked TRIAL's entries leave the
        # channel statistics too (likelihoods.py folds weights into m)
        cm_eff = cm * m_col if mask is not None else cm
        cm_sum = jnp.sum(cm_eff)
    else:
        cm_eff = None
        cm_sum = None

    # ---------------- forward (vjf/model.py:97-122) ----------------
    xs = qs_m + eps_s * jnp.exp(0.5 * qs_lv)

    # precision pins: no-ops inside Mosaic, load-bearing under XLA — this
    # function is shared code (CLAUDE.md #8; preferred_element_type alone
    # does NOT prevent bf16 multiply passes), and these dots feed the
    # exp-sensitive distances / the RLS feedback chain
    hi_ = jax.lax.Precision.HIGHEST
    x2 = jnp.sum(xs * xs, axis=-1, keepdims=True)             # (B, 1)
    cross = jnp.matmul(xs, carry.cent_x.T, precision=hi_)     # f32: K tiny, exp-sensitive
    if has_u:
        x2 = x2 + jnp.sum(u * u, axis=-1, keepdims=True)
        cross = cross + jnp.matmul(u, carry.cent_u.T, precision=hi_)
    d2 = jnp.maximum(x2 + carry.c2 - 2.0 * cross, 0.0)
    feat = jnp.exp(-0.5 * d2 * carry.inv_w2)                  # (B, nfp); pad cols 0
    if carry.w_white is not None:
        # SGP whitening: full f32 — these features feed the RLS recursion
        # (P/V/w feedback chain), where bf16 error compounds (CLAUDE.md #8)
        feat = jnp.dot(feat, carry.w_white, preferred_element_type=f32,
                       precision=hi_)

    z = mm(feat, carry.v_mat)                                 # (B, nfp), fvf only
    fvf = jnp.sum(z * feat, axis=-1, keepdims=True)           # (B, 1)
    fvf = jnp.maximum(fvf, 1e-30)
    if carry.w_white is not None:
        # DTC correction on the predictive variance (gp/sgp.py:110-115)
        dtc = jnp.maximum(
            carry.scale2[0, 0] - jnp.sum(feat * feat, axis=-1, keepdims=True),
            0.0,
        )
        pt_lv = jnp.log(fvf + dtc + 1e-30)                    # (B, 1)
    else:
        pt_lv = jnp.log(fvf)                                  # (B, 1), broadcast xd
    pt_m = (1.0 - cfg.leak) * xs + mm(feat, carry.w_dyn)

    if cmask is not None:
        # model-based imputation for the recognition input only (_impute_y,
        # models/vjf.py): masked entries see the decoder's prediction from
        # the PREVIOUS posterior mean (count scale for Poisson). The manual
        # backward never differentiates y_rec, which is exactly the XLA
        # path's stop_gradient.
        pred = mm(qs_m, carry.w_dec.T) + carry.b_dec
        if cfg.likelihood == "poisson":
            pred = jnp.exp(jnp.minimum(pred, cfg.poisson_clamp))
        y_rec = jnp.where(cm > 0, y, pred)
    else:
        y_rec = y
    a0 = mm(y_rec, carry.w_in_y.T) + mm(qs_m, carry.w_in_m.T) + mm(
        qs_lv, carry.w_in_lv.T
    )
    if has_u:
        a0 = a0 + mm(u, carry.w_in_u.T)
    a = jnp.tanh(a0 + carry.b_hidden[0])
    hs = [a]
    for i, w in enumerate(carry.w_hidden):
        a = jnp.tanh(mm(a, w.T) + carry.b_hidden[i + 1])
        hs.append(a)
    h_last = a
    qt_m = mm(h_last, carry.w_mean.T)
    raw_qt_lv = mm(h_last, carry.w_logvar.T) + carry.b_logvar
    # runaway guard; never binds in sane regimes (VJFConfig.logvar_clamp)
    qt_lv = jnp.clip(raw_qt_lv, -cfg.logvar_clamp, cfg.logvar_clamp)
    sig_t = jnp.exp(0.5 * qt_lv)
    xt = qt_m + eps_t * sig_t
    py = mm(xt, carry.w_dec.T) + carry.b_dec

    # ---------------- ELBO batch sums (vjf/model.py:124-154) ---------------
    zero = jnp.zeros((), f32)
    if cfg.likelihood == "poisson":
        pyc = jnp.minimum(py, cfg.poisson_clamp)
        exp_pyc = jnp.exp(pyc)
        nll_rows = exp_pyc - y * pyc
        if cm_eff is not None:
            nll_rows = nll_rows * cm_eff
        elif mask is not None:
            nll_rows = nll_rows * m_col
        recon_batch = jnp.sum(nll_rows) * inv_b
        sq_y = zero
    else:
        lik_lv = carry.lik_logvar[0, 0]
        resid_y = y - py
        sq_rows = resid_y * resid_y
        if cm_eff is not None:
            sq_rows = sq_rows * cm_eff
        elif mask is not None:
            sq_rows = sq_rows * m_col
        sq_y = jnp.sum(sq_rows)
        recon_batch = zero

    inv_sv = jnp.exp(-slogvar)
    diff = pt_m - qt_m
    if cfg.trace_quirk:
        trace = jnp.exp(pt_lv + qt_lv - slogvar)
    else:
        trace = jnp.exp(pt_lv - slogvar) + jnp.exp(qt_lv - slogvar)
    diff2 = diff * diff
    ent_rows = qt_lv
    if mask is not None:
        diff2 = diff2 * m_col
        trace = trace * m_col
        ent_rows = ent_rows * m_col
    dyn_batch = (
        jnp.sum(diff2) * inv_sv * inv_b + jnp.sum(trace) * inv_b
    )
    h_ent = 0.5 * jnp.sum(ent_rows) * inv_b

    # ---------------- manual backward (gradient batch-sums) ----------------
    xd = qt_m.shape[-1]
    nh = len(carry.w_hidden)
    if flags.sgd:
        if cfg.likelihood == "poisson":
            g_py = (exp_pyc - y) * (py < cfg.poisson_clamp) * inv_b
            g_lik_lv_batch = zero
        else:
            g_py = -resid_y * jnp.exp(-lik_lv) * inv_b
            # batch part only; the +0.5*ydim constant is added in apply
            # (sq_y is already channel-masked, so this term needs no mask)
            g_lik_lv_batch = -0.5 * sq_y * jnp.exp(-lik_lv) * inv_b
        if cm_eff is not None:
            # masked entries leave the likelihood sum, so nothing flows
            # back through them (= jax.grad through the where-select)
            g_py = g_py * cm_eff
        elif mask is not None:
            g_py = g_py * m_col

        g_xt = mm(g_py, carry.w_dec)                           # (B, xd)
        if flags.train_decoder:
            g_w_dec = mm(g_py.T, xt)
            g_b_dec = jnp.sum(g_py, axis=0, keepdims=True)
        else:
            g_w_dec = jnp.zeros_like(carry.w_dec)
            g_b_dec = jnp.zeros_like(carry.b_dec)

        g_qt_m = g_xt
        g_qt_lv = g_xt * eps_t * (0.5 * sig_t) - (0.5 * inv_b)  # + entropy term
        if not flags.warm_up:
            g_qt_m = g_qt_m - diff * (inv_sv * inv_b)
            if cfg.trace_quirk:
                g_qt_lv = g_qt_lv + 0.5 * trace * inv_b
            else:
                g_qt_lv = g_qt_lv + 0.5 * jnp.exp(qt_lv - slogvar) * inv_b

        # gradient of the clip: when the runaway guard binds, nothing flows
        # back into the logvar head — matches jax.grad through jnp.clip on
        # the XLA path (models/vjf.py:162). Binding is a runaway regime, so
        # this mask is all-ones in any sane run.
        g_qt_lv = g_qt_lv * (jnp.abs(raw_qt_lv) < cfg.logvar_clamp)

        if mask is not None:
            # masked rows leave the gradient entirely (the entropy/dynamics
            # terms above are per-row, so zeroing g_py alone is not enough);
            # downstream weight grads inherit the zero rows
            g_qt_m = g_qt_m * m_col
            g_qt_lv = g_qt_lv * m_col

        g_wm = mm(g_qt_m.T, h_last)
        g_wlv = mm(g_qt_lv.T, h_last)
        g_blv = jnp.sum(g_qt_lv, axis=0, keepdims=True)
        g_h = mm(g_qt_m, carry.w_mean) + mm(g_qt_lv, carry.w_logvar)

        g_w_hidden = [None] * nh
        g_b_hidden = [None] * (nh + 1)
        for i in range(nh, 0, -1):                             # layers n..1
            h_i = hs[i]
            g_a = g_h * (1.0 - h_i * h_i)
            g_w_hidden[i - 1] = mm(g_a.T, hs[i - 1])
            g_b_hidden[i] = jnp.sum(g_a, axis=0, keepdims=True)
            g_h = mm(g_a, carry.w_hidden[i - 1])
        g_a0 = g_h * (1.0 - hs[0] * hs[0])                     # first layer
        g_b_hidden[0] = jnp.sum(g_a0, axis=0, keepdims=True)
        g_w_in_u = mm(g_a0.T, u) if has_u else None
        g_w_in_y = mm(g_a0.T, y_rec)      # the layer SAW the imputed input
        g_w_in_m = mm(g_a0.T, qs_m)
        g_w_in_lv = mm(g_a0.T, qs_lv)
    else:
        g_w_in_y = jnp.zeros_like(carry.w_in_y)
        g_w_in_u = jnp.zeros_like(carry.w_in_u) if has_u else None
        g_w_in_m = jnp.zeros_like(carry.w_in_m)
        g_w_in_lv = jnp.zeros_like(carry.w_in_lv)
        g_w_hidden = [jnp.zeros_like(w) for w in carry.w_hidden]
        g_b_hidden = [jnp.zeros_like(bb) for bb in carry.b_hidden]
        g_wm = jnp.zeros_like(carry.w_mean)
        g_wlv = jnp.zeros_like(carry.w_logvar)
        g_blv = jnp.zeros_like(carry.b_logvar)
        g_w_dec = jnp.zeros_like(carry.w_dec)
        g_b_dec = jnp.zeros_like(carry.b_dec)
        g_lik_lv_batch = zero

    # ---------------- RLS raw statistics ----------------
    dx = xt - xs
    if flags.update and flags.update_transition:
        if mask is not None:
            # zeroed feature rows contribute nothing to F^T F / F^T dx —
            # the XLA path's exact move (models/dynamics.py:190-191);
            # dx/fvf sums are masked so the gates and the sharded-identity
            # mse see only valid rows
            feat_s = feat * m_col
            dx_s = dx * m_col
            dx_sum = jnp.sum(dx_s)
            dx2_sum = jnp.sum(dx_s * dx)
            fvf_sum = jnp.sum(fvf * m_col)
            ftf_raw = mm(feat_s.T, feat_s)
            fxd_raw = mm(feat_s.T, dx)
        else:
            dx_sum = jnp.sum(dx)
            dx2_sum = jnp.sum(dx * dx)
            fvf_sum = jnp.sum(fvf)
            ftf_raw = mm(feat.T, feat)
            fxd_raw = mm(feat.T, dx)
    else:
        dx_sum = dx2_sum = fvf_sum = zero
        ftf_raw = jnp.zeros_like(carry.p_mat)
        fxd_raw = jnp.zeros_like(carry.w_dyn)

    if flags.sgd:
        grad_leaves = (
            [g_w_in_y, g_w_in_m, g_w_in_lv, g_wm, g_wlv, g_blv, g_w_dec,
             g_b_dec, g_lik_lv_batch]
            + ([g_w_in_u] if has_u else [])
            + list(g_w_hidden) + list(g_b_hidden)
        )
        grad_check = sum(jnp.sum(g) for g in grad_leaves)
    else:
        grad_check = zero

    sums = FusedSums(
        g_w_in_y=g_w_in_y, g_w_in_u=g_w_in_u, g_w_in_m=g_w_in_m,
        g_w_in_lv=g_w_in_lv,
        g_w_hidden=tuple(g_w_hidden), g_b_hidden=tuple(g_b_hidden),
        g_w_mean=g_wm, g_w_logvar=g_wlv, g_b_logvar=g_blv,
        g_w_dec=g_w_dec, g_b_dec=g_b_dec, g_lik_lv_batch=g_lik_lv_batch,
        recon_batch=recon_batch, dyn_batch=dyn_batch, ent=h_ent, sq_y=sq_y,
        grad_check=grad_check,
        ftf_raw=ftf_raw, fxd_raw=fxd_raw, fvf_sum=fvf_sum,
        dx_sum=dx_sum, dx2_sum=dx2_sum, cm_sum=cm_sum,
    )
    per = PerTrial(qt_m=qt_m, qt_lv=qt_lv, xt=xt, xs=xs, feat=feat, dx=dx)
    return sums, per


def step_apply(
    cfg: VJFConfig,
    flags: StepFlags,
    carry: FusedCarry,
    sums: FusedSums,
    lr: Array,
    b_total: int,
    feat: Optional[Array] = None,
    dx: Optional[Array] = None,
    ns_extra=None,
    ns_tau_max: Optional[float] = None,
    ns_iters: int = NS_ITERS,
    mask: Optional[Array] = None,
    valid_count: Optional[Array] = None,
) -> Tuple[FusedCarry, ScalarPack, Array]:
    """Batch-independent phase: reconstruct the ELBO from the (possibly
    all-reduced) sums, apply clipped SGD, then the closed-form updates.
    Deterministic given ``sums`` — every device applies the identical
    update after one ``psum`` of the :class:`FusedSums` pytree.

    ``feat``/``dx`` (trial-local) select the direct residual computation for
    the single-device path; when absent (sharded), the post-update residual
    MSE comes from the algebraic identity over the summed statistics
    ``|dx - F w|^2 = dx2 - 2<w, F^T dx> + <w, F^T F w>``.

    ``mask``: optional (B, 1) trial-validity column matching the one given
    to :func:`step_forward_sums` (single-device only). The batch size in
    every count/denominator becomes the valid count; a fully-masked step
    contributes zero loss, zero gradients, and must not advance the RLS
    recursion (shrink would decay P with no data behind it) or the noise
    counters — the XLA path's ``upd_ok &= sum(weights) > 0`` gate.

    ``valid_count``: the sharded-masked alternative to ``mask`` — the
    traced GLOBAL valid count (replicated scalar, the sum the phase-1
    kernels renormalized by). Same count/gate semantics as ``mask``
    without the local column (which would undercount across shards);
    ``feat``/``dx`` must be absent (the stats-identity MSE already runs
    over valid rows only — masked feature rows are zero).
    """
    f32 = carry.w_dyn.dtype
    if mask is not None:
        m_col = (mask > 0).astype(f32)
        count = jnp.sum(m_col)                 # raw count (0 allowed) for
        b = jnp.maximum(count, 1.0)            # counters; guarded divisor
        has_data = count > 0
    elif valid_count is not None:
        assert feat is None, "valid_count is the sharded (stats-MSE) mode"
        count = valid_count.astype(f32)
        b = jnp.maximum(count, 1.0)
        has_data = count > 0
    else:
        b = b_total
        count = b
        has_data = True
    masked = mask is not None or valid_count is not None
    inv_b = 1.0 / b
    slogvar = carry.state_logvar[0, 0]
    mm = _mm_fn(cfg, f32)
    ydim = carry.w_dec.shape[0]
    xd = carry.w_dyn.shape[-1]
    # single full-precision binding for every feedback-critical matmul in
    # this function (one unpinned site among pinned ones is the CLAUDE.md
    # #10 failure class)
    hi = jax.lax.Precision.HIGHEST

    # ---------------- ELBO components with their constants -----------------
    has_cm = sums.cm_sum is not None
    if cfg.likelihood == "poisson":
        l_recon = sums.recon_batch
        obs_mse = jnp.zeros((), f32)
    else:
        lik_lv = carry.lik_logvar[0, 0]
        if has_cm:
            # the logvar constant is per OBSERVED entry (gaussian_loss
            # selects masked entries out of the channel sum), and the
            # running-var mse averages over observed entries only
            # (gaussian_lik_update channel_mask branch)
            l_recon = 0.5 * (
                sums.sq_y * jnp.exp(-lik_lv) * inv_b
                + sums.cm_sum * inv_b * lik_lv
            )
            obs_mse = sums.sq_y / jnp.maximum(sums.cm_sum, 1.0)
        else:
            l_recon = 0.5 * (sums.sq_y * jnp.exp(-lik_lv) * inv_b + ydim * lik_lv)
            obs_mse = sums.sq_y * inv_b / ydim
    l_dyn = 0.5 * (sums.dyn_batch + xd * slogvar)
    h_ent = sums.ent
    if masked:
        # a fully-masked step has no data and no loss (the per-trial sums
        # are already zero, but the constants — ydim*lik_lv, xd*slogvar —
        # would survive); matches the XLA batch_weighted_mean -> 0
        l_recon = jnp.where(has_data, l_recon, 0.0)
        l_dyn = jnp.where(has_data, l_dyn, 0.0)
        h_ent = jnp.where(has_data, h_ent, 0.0)

    # the skip-step gate must see the RAW components: the zeroed loss is
    # always finite, but non-finite components mean non-finite gradients.
    # In warm-up the dynamics term is outside the loss (vjf/model.py:148),
    # so its finiteness must not gate the step (matches the XLA gate, which
    # sees only the gradients of included terms).
    raw_ok = jnp.logical_and(jnp.isfinite(l_recon), jnp.isfinite(h_ent))
    if not flags.warm_up:
        raw_ok = jnp.logical_and(raw_ok, jnp.isfinite(l_dyn))
    l_recon = jnp.where(jnp.isfinite(l_recon), l_recon, 0.0)
    l_dyn = jnp.where(jnp.isfinite(l_dyn), l_dyn, 0.0)
    h_ent = jnp.where(jnp.isfinite(h_ent), h_ent, 0.0)
    loss = l_recon - h_ent + (0.0 if flags.warm_up else l_dyn)

    # ---------------- clipped SGD (vjf/model.py:206-214) ----------------
    new = carry
    if flags.sgd:
        # per-leaf gradient gate (see FusedSums.grad_check): mirrors the
        # XLA path's skip-on-non-finite-gradient, closing the r1 deviation
        sgd_ok = jnp.logical_and(raw_ok, jnp.isfinite(sums.grad_check))
        clip = cfg.clip

        def upd(p, g):
            # select, don't scale: 0 * NaN = NaN would poison the params
            # straight through the skip gate
            return jnp.where(sgd_ok, p - lr * jnp.clip(g, -clip, clip), p)

        if cfg.likelihood == "poisson":
            lik_logvar_new = carry.lik_logvar
        else:
            # the +0.5*ydim constant is d(0.5*ydim*lik_lv)/d(lik_lv): it is
            # count-independent for any count >= 1 (the per-trial term
            # averages to itself) but must vanish on a fully-masked step;
            # under a channel mask it is per OBSERVED entry
            # (0.5 * cm_sum * inv_b — zero at cm_sum == 0 automatically)
            if has_cm:
                g_lv_const = 0.5 * sums.cm_sum * inv_b
            else:
                g_lv_const = (
                    jnp.where(has_data, 0.5 * ydim, 0.0)
                    if masked else 0.5 * ydim
                )
            lik_logvar_new = upd(
                carry.lik_logvar, sums.g_lik_lv_batch + g_lv_const
            )
        if flags.train_decoder:
            w_dec_new = upd(carry.w_dec, sums.g_w_dec)
            b_dec_new = upd(carry.b_dec, sums.g_b_dec)
        else:
            w_dec_new, b_dec_new = carry.w_dec, carry.b_dec
        new = new._replace(
            w_in_y=upd(carry.w_in_y, sums.g_w_in_y),
            w_in_u=upd(carry.w_in_u, sums.g_w_in_u)
            if sums.g_w_in_u is not None
            else carry.w_in_u,
            w_in_m=upd(carry.w_in_m, sums.g_w_in_m),
            w_in_lv=upd(carry.w_in_lv, sums.g_w_in_lv),
            w_hidden=tuple(
                upd(w, g) for w, g in zip(carry.w_hidden, sums.g_w_hidden)
            ),
            b_hidden=tuple(
                upd(bb, g) for bb, g in zip(carry.b_hidden, sums.g_b_hidden)
            ),
            w_mean=upd(carry.w_mean, sums.g_w_mean),
            w_logvar=upd(carry.w_logvar, sums.g_w_logvar),
            b_logvar=upd(carry.b_logvar, sums.g_b_logvar),
            w_dec=w_dec_new,
            b_dec=b_dec_new,
            lik_logvar=lik_logvar_new,
        )

    # ---------------- non-gradient updates (vjf/model.py:156-177) ----------
    tau = jnp.zeros((), f32)
    g_vec = jnp.zeros_like(carry.w_dyn)
    if flags.update:
        if cfg.likelihood == "gaussian" and flags.update_likelihood:
            # running-var overwrite with the POST-SGD logvar (vjf ordering);
            # counts advance by the RAW valid count (0 on a fully-masked
            # step: tot == lik_n keeps var/n unchanged, or NaN-gates at
            # lik_n == 0 — both match the XLA running_var semantics). Under
            # a channel mask the count is the FRACTIONAL row count
            # sum(cm)/ydim (gaussian_lik_update channel_mask branch).
            adv = sums.cm_sum / ydim if has_cm else count
            lik_n = jnp.minimum(new.lik_n[0, 0], float(cfg.obs_var_cap))
            tot = lik_n + adv
            var = (lik_n / tot) * jnp.exp(new.lik_logvar[0, 0]) + (adv / tot) * obs_mse
            lik_lv_new = jnp.clip(jnp.log(var), -cfg.logvar_clamp, cfg.logvar_clamp)
            # gate on the VARIANCE, not the clipped log: an inf/NaN running
            # var (overflowing residual) must be SKIPPED, while var == 0
            # (log = -inf) legitimately clamps to the floor
            lik_ok = jnp.isfinite(var)
            new = new._replace(
                lik_logvar=jnp.where(lik_ok, lik_lv_new, new.lik_logvar[0, 0]).reshape(1, 1),
                lik_n=jnp.where(lik_ok, tot, new.lik_n[0, 0]).reshape(1, 1),
            )

    if flags.update and flags.update_transition:
        dyn_ok = jnp.isfinite(sums.dx_sum)
        if masked:
            # a fully-masked step must not advance the recursion (shrink
            # would decay P with no data behind it) — filter_step's
            # `upd_ok &= sum(weights) > 0` gate
            dyn_ok = jnp.logical_and(dyn_ok, has_data)
        w_dyn_new = carry.w_dyn
        if not flags.warm_up:
            # forgetting factor + per-step jitter (vjf/module.py:80-96
            # `shrink`; regression.rls mirrors both) — statics from cfg, so
            # the default lam=1/jit=0 compiles to the plain recursion.
            lam = float(cfg.rls_shrink)
            jit_c = float(cfg.chol_jitter)
            inv_sv_u = jnp.exp(-slogvar)
            ftf = sums.ftf_raw * inv_sv_u
            # P w stays f32: bf16 error here would compound through the
            # g -> w -> g recursion across the whole stream. precision=
            # HIGHEST is what pins it on the XLA path (sharded.py calls
            # this function OUTSIDE Mosaic, where preferred_element_type
            # alone does NOT prevent bf16 multiply passes — CLAUDE.md #8);
            # inside Mosaic it is a no-op (already full f32).
            g_vec = (
                lam
                * jnp.dot(carry.p_mat, carry.w_dyn,
                          preferred_element_type=f32, precision=hi)
                + sums.fxd_raw * inv_sv_u
            )
            p_new = lam * carry.p_mat + ftf
            if lam != 1.0 or jit_c != 0.0:
                # the identity pad block must stay EXACTLY identity (pure
                # shrink would decay it to 0 and 1/lam^t inflate its V);
                # the real block gets the per-step jitter ridge, matching
                # regression.rls's `jitter * eye(nf)`.
                nfp = carry.p_mat.shape[0]
                nf = cfg.feature_dim
                diag = jnp.eye(nfp, dtype=f32)
                rows = jax.lax.broadcasted_iota(jnp.int32, (nfp, nfp), 0)
                pad_diag = diag * (rows >= nf).astype(f32)
                p_new = (
                    p_new
                    + (1.0 - lam) * pad_diag
                    + jit_c * (diag - pad_diag)
                )
            # tau = tr(dP V_old), the NS-residual trace bound. DELIBERATE
            # under-count shared with models/regression.py::rls: the
            # chol_jitter contribution (jit_c * tr(V_old)) is omitted — the
            # escalation ladder was stability-tuned against this definition
            # (the B=1+shrink regime sits at the margin; see regression.py)
            tau = sums.fvf_sum * inv_sv_u / lam
            # Newton-Schulz in full f32: the residual floor scales with
            # eps * cond(P), and P's condition grows with the data stream —
            # bf16 iterations stall at ~0.01*cond and poison the w feedback
            # loop (measured: training quality loss within 2k steps).
            x_ns = carry.v_mat / lam if lam != 1.0 else carry.v_mat
            eye2 = 2.0 * jnp.eye(p_new.shape[0], dtype=f32)
            for _ in range(ns_iters):
                x_ns = jnp.dot(
                    x_ns,
                    eye2 - jnp.dot(p_new, x_ns,
                                   preferred_element_type=f32, precision=hi),
                    preferred_element_type=f32, precision=hi,
                )
            if ns_extra is not None:
                x_ns = ns_extra(x_ns, p_new, eye2, tau)
            v_new = 0.5 * (x_ns + x_ns.T)
            w_dyn_new = jnp.dot(v_new, g_vec,
                                preferred_element_type=f32, precision=hi)
            # Two distinct failure modes, two distinct actions:
            #  * non-finite INPUTS (dx): skip the whole update (tau -> 0 so
            #    the fallback doesn't fire on garbage) — the reference
            #    recursion has no escape hatch once NaN enters P/V;
            #  * finite inputs but the warm-started NS pass overflowed
            #    (tau was large): P/g are still valid — FORCE the exact
            #    Cholesky fallback (tau -> +inf) rather than dropping the
            #    update, and keep the carry finite meanwhile.
            ns_ok = jnp.isfinite(jnp.sum(v_new) + jnp.sum(w_dyn_new))
            if ns_tau_max is not None:
                ns_ok = jnp.logical_and(ns_ok, tau < ns_tau_max)
            w_dyn_new = jnp.where(
                jnp.logical_and(dyn_ok, ns_ok), w_dyn_new, carry.w_dyn
            )
            if ns_tau_max is not None:
                # cond-free segment (mega): a skipped V update MUST also
                # skip P — P advancing while V stays makes the pair
                # inconsistent, tau's trace bound stops bounding the true
                # NS residual, and the next near-threshold step's escalated
                # iterations can diverge to finite garbage (measured: state
                # noise pinned at the +clamp within one hot epoch). Skipping
                # both drops the sample but keeps every later step sound;
                # fit() demotes the epoch layout when it sees tau >= the
                # ceiling past the prefix.
                p_keep = jnp.logical_and(dyn_ok, ns_ok)
            else:
                # per-step segment: the exact fallback right after this
                # call recomputes V from p_new, so P must always advance
                p_keep = dyn_ok
            new = new._replace(
                p_mat=jnp.where(p_keep, p_new, carry.p_mat),
                v_mat=jnp.where(jnp.logical_and(dyn_ok, ns_ok), v_new, carry.v_mat),
                w_dyn=w_dyn_new,
            )
            tau = jnp.where(
                dyn_ok, jnp.where(ns_ok, tau, jnp.inf), 0.0
            )

        if feat is not None:
            resid = dx - mm(feat, w_dyn_new)                   # vjf/model.py:372
            if mask is not None:
                # weighted mean over the valid rows (batch_weighted_mean)
                mse_dyn = jnp.sum(resid * resid * m_col) / (b * xd)
            else:
                mse_dyn = jnp.mean(resid * resid)
        else:
            quad = jnp.sum(
                w_dyn_new
                * jnp.matmul(sums.ftf_raw, w_dyn_new, precision=hi)
            )
            mse_dyn = (
                sums.dx2_sum - 2.0 * jnp.sum(w_dyn_new * sums.fxd_raw) + quad
            ) / (b * xd)
        dyn_n = jnp.minimum(new.dyn_n[0, 0], float(cfg.state_var_cap))
        tot_d = dyn_n + count
        var_d = (dyn_n / tot_d) * jnp.exp(slogvar) + (count / tot_d) * mse_dyn
        slv_new = jnp.clip(jnp.log(var_d), -cfg.logvar_clamp, cfg.logvar_clamp)
        # gate on the VARIANCE: an overflowing residual (inf mse from
        # finite-huge w, the trap-12/14 class) must be SKIPPED, not
        # laundered into +clamp; var == 0 (log = -inf) floors legitimately
        noise_ok = jnp.isfinite(var_d)
        new = new._replace(
            state_logvar=jnp.where(noise_ok, slv_new, slogvar).reshape(1, 1),
            dyn_n=jnp.where(noise_ok, tot_d, new.dyn_n[0, 0]).reshape(1, 1),
        )

    scal = ScalarPack(
        loss=loss.reshape(1, 1),
        recon=(-l_recon).reshape(1, 1),
        dyn=(-l_dyn).reshape(1, 1),
        ent=h_ent.reshape(1, 1),
        tau=tau.reshape(1, 1),
    )
    return new, scal, g_vec


def step_math(
    cfg: VJFConfig,
    flags: StepFlags,
    carry: FusedCarry,
    qs_m: Array,
    qs_lv: Array,
    y: Array,
    u: Optional[Array],
    eps_s: Array,
    eps_t: Array,
    lr: Array,
    ns_extra=None,
    ns_tau_max: Optional[float] = None,
    ns_iters: int = NS_ITERS,
    mask: Optional[Array] = None,
    cmask: Optional[Array] = None,
) -> StepOut:
    """Pure-jnp fused step on padded arrays: forward-and-reduce
    (:func:`step_forward_sums`) composed with the batch-independent apply
    (:func:`step_apply`). See module docstring.

    ``ns_extra(x_ns, p_new, eye2, tau) -> x_ns`` optionally escalates the
    Newton-Schulz refinement (the mega kernel runs extra iterations behind a
    hardware branch when tau is near-threshold); ``ns_tau_max`` additionally
    gates the V/w update on ``tau < ns_tau_max`` for cond-free segments that
    have no exact-inverse fallback (the skipped-step tau is visible in the
    scalar stream).

    ``mask``: optional (B, 1) 0/1 trial-validity column (ragged trials,
    single-device only). Masked rows contribute nothing and their returned
    posterior is FROZEN at ``(qs_m, qs_lv)`` — the carry convention of the
    XLA path (filter_step's frozen-carry select).

    ``cmask``: optional (B, ydim) 0/1 missing-observation mask (see
    :func:`step_forward_sums`); the carry does NOT freeze — a fully-masked
    row is a pure prediction step (filter_step channel_mask semantics).
    """
    b = y.shape[0]
    sums, per = step_forward_sums(
        cfg, flags, carry, qs_m, qs_lv, y, u, eps_s, eps_t, 1.0 / b,
        mask=mask, cmask=cmask,
    )
    new, scal, g_vec = step_apply(
        cfg, flags, carry, sums, lr, b, feat=per.feat, dx=per.dx,
        ns_extra=ns_extra, ns_tau_max=ns_tau_max, ns_iters=ns_iters,
        mask=mask,
    )
    qt_m, qt_lv = per.qt_m, per.qt_lv
    if mask is not None:
        keep = mask > 0
        qt_m = jnp.where(keep, qt_m, qs_m)
        qt_lv = jnp.where(keep, qt_lv, qs_lv)
    return StepOut(
        carry=new, qt_mean=qt_m, qt_logvar=qt_lv, g_vec=g_vec,
        xt=per.xt, xs=per.xs, scal=scal,
    )


# ---------------------------------------------------------------------------
# Pallas wrapper
# ---------------------------------------------------------------------------


def _box_muller(shape, dtype):
    """Standard normals from the on-core PRNG (kernel context only)."""
    # bitcast is load-bearing: prng_random_bits yields signed bits, and a
    # signed shift would produce negative "uniforms" (log -> NaN).
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits -> int32 (always positive; Mosaic lacks uint32->f32 casts)
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    # 24-bit mantissa uniforms in (0, 1); offset avoids log(0)
    u1 = i1.astype(dtype) * (2.0**-24) + (2.0**-25)
    u2 = i2.astype(dtype) * (2.0**-24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * 3.14159265358979) * u2)


def _box_muller_latents(b: int, xd: int, dtype):
    """(eps_s, eps_t), each (B, xd), generated in a LANE-PACKED layout.

    A (B, xd) f32 array with xd ~ 10 pads its lane dimension 128/xd-fold, so
    Box-Muller's transcendentals (log, sqrt, cos) would run on ~13x more
    vregs than carry data — measured ~1.7 us/step of pure padding waste on
    the flagship shape. Generating in (2*xd, B) instead packs the lanes
    full; the one transpose back to (B, 2*xd) is a cheap relayout next to
    the transcendental savings.
    """
    eps = _box_muller((2 * xd, b), dtype).T        # (B, 2*xd)
    return eps[:, :xd], eps[:, xd:]


def _make_kernel(cfg: VJFConfig, flags: StepFlags, carry_treedef, n_carry: int,
                 has_u: bool, internal_rng: bool, xd: int,
                 has_mask: bool = False, has_cmask: bool = False):
    # data layout: qs_m, qs_lv, y, [u], [eps_s, eps_t unless internal_rng],
    # [mask], [cmask]
    n_data = (
        3 + (1 if has_u else 0) + (0 if internal_rng else 2)
        + (1 if has_mask else 0) + (1 if has_cmask else 0)
    )

    def kernel(*refs):
        lr_ref = refs[0]
        carry_refs = refs[1 : 1 + n_carry]
        data_refs = refs[1 + n_carry : 1 + n_carry + n_data]
        out_refs = refs[1 + n_carry + n_data :]

        carry = jax.tree_util.tree_unflatten(
            carry_treedef, [r[:] for r in carry_refs]
        )
        it = iter(data_refs)
        qs_m = next(it)[:]
        qs_lv = next(it)[:]
        y = next(it)[:]
        u = next(it)[:] if has_u else None
        if internal_rng:
            pltpu.prng_seed(carry.rng_seed[0, 0], carry.rng_count[0, 0])
            b = qs_m.shape[0]
            eps_s, eps_t = _box_muller_latents(b, xd, qs_m.dtype)
        else:
            eps_s = next(it)[:]
            eps_t = next(it)[:]
        mask = next(it)[:] if has_mask else None
        cmask = next(it)[:] if has_cmask else None

        out = step_math(
            cfg, flags, carry, qs_m, qs_lv, y, u, eps_s, eps_t, lr_ref[0],
            mask=mask, cmask=cmask,
        )
        out = out._replace(
            carry=out.carry._replace(rng_count=out.carry.rng_count + 1)
        )

        # outputs: carry leaves (aliased in-place), then packed q/g/x/scal
        n_c = n_carry
        for ref, val in zip(out_refs[:n_c], jax.tree_util.tree_leaves(out.carry)):
            ref[:] = val
        q_ref, g_ref, xt_ref, xs_ref, scal_ref = out_refs[n_c:]
        q_ref[0] = out.qt_mean
        q_ref[1] = out.qt_logvar
        g_ref[:] = out.g_vec
        xt_ref[:] = out.xt
        xs_ref[:] = out.xs
        # assemble the scalar pack as one vectorized row (Mosaic cannot
        # store scalars to VMEM)
        s = out.scal
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        row = (
            jnp.where(cols == 0, s.loss[0, 0], 0.0)
            + jnp.where(cols == 1, s.recon[0, 0], 0.0)
            + jnp.where(cols == 2, s.dyn[0, 0], 0.0)
            + jnp.where(cols == 3, s.ent[0, 0], 0.0)
            + jnp.where(cols == 4, s.tau[0, 0], 0.0)
        )
        scal_ref[:] = row

    return kernel


class PackedStepOut(NamedTuple):
    carry: FusedCarry
    q_pack: Array                 # (2, B, xd): qt mean / logvar
    g_vec: Array
    xt: Array
    xs: Array
    scal: Array                   # (1, 8): loss, recon, dyn, ent, tau


def fused_step_call(
    cfg: VJFConfig,
    flags: StepFlags,
    carry: FusedCarry,
    qs_m: Array,
    qs_lv: Array,
    y: Array,
    u: Optional[Array],
    eps_s: Optional[Array],
    eps_t: Optional[Array],
    lr: Array,
    interpret: bool = False,
    mask: Optional[Array] = None,
    cmask: Optional[Array] = None,
) -> PackedStepOut:
    """Run the fused kernel once. ``eps_s``/``eps_t`` None selects in-kernel
    Box-Muller RNG (seeded from the carry's rng_seed/rng_count). ``mask``:
    optional (B, 1) trial-validity column; ``cmask``: optional (B, ydim)
    missing-observation mask (see :func:`step_math`)."""
    carry_leaves, carry_treedef = jax.tree_util.tree_flatten(carry)
    has_u = u is not None and u.shape[-1] > 0
    internal_rng = eps_s is None
    has_mask = mask is not None
    has_cmask = cmask is not None
    b = y.shape[0]
    xd = cfg.xdim
    dtype = qs_m.dtype
    nfp = carry.p_mat.shape[0]

    kernel = _make_kernel(
        cfg, flags, carry_treedef, len(carry_leaves), has_u, internal_rng, xd,
        has_mask=has_mask, has_cmask=has_cmask,
    )
    data = [qs_m, qs_lv, y] + ([u] if has_u else []) + (
        [] if internal_rng else [eps_s, eps_t]
    ) + ([mask] if has_mask else []) + ([cmask] if has_cmask else [])
    n_in = 1 + len(carry_leaves) + len(data)

    out_shape = (
        tuple(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in carry_leaves)
        + (
            jax.ShapeDtypeStruct((2, b, xd), dtype),       # q_pack
            jax.ShapeDtypeStruct((nfp, xd), dtype),        # g_vec
            jax.ShapeDtypeStruct((b, xd), dtype),          # xt
            jax.ShapeDtypeStruct((b, xd), dtype),          # xs
            jax.ShapeDtypeStruct((1, 8), dtype),           # scal
        )
    )
    # carry leaves are both inputs (1..n) and the first n outputs: alias them
    # in place — the scan carry then updates without n fresh allocations.
    aliases = {1 + i: i for i in range(len(carry_leaves))}
    results = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_in - 1),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape),
        input_output_aliases=aliases,
        interpret=interpret,
    )(lr.reshape(1), *carry_leaves, *data)

    n_c = len(carry_leaves)
    new_carry = jax.tree_util.tree_unflatten(carry_treedef, list(results[:n_c]))
    q_pack, g_vec, xt, xs, scal = results[n_c:]
    return PackedStepOut(new_carry, q_pack, g_vec, xt, xs, scal)


# ---------------------------------------------------------------------------
# Padding between TrainState and FusedCarry
# ---------------------------------------------------------------------------


def pad_carry(cfg: VJFConfig, state) -> FusedCarry:
    """TrainState -> FusedCarry (padded once per epoch; ~zero per-step cost).

    Pad contract: centroids +1e6 (padded basis responses underflow to exact
    0), P/V identity pad block, dynamics weights zero pad — padded dims stay
    decoupled through every update.
    """
    from ...models.regression import NSVBLR

    p = state.params
    blr = state.dynamics.blr
    assert isinstance(blr, NSVBLR), "fused step requires the nsv backend"
    nf = blr.w_mean.shape[0]
    nfp = _round_up(nf)
    dtype = blr.w_mean.dtype
    xd, ud, yd = cfg.xdim, cfg.udim, cfg.ydim

    if cfg.dynamics == "sgp":
        dyn = state.dynamics                           # SGPDynamicsState
        cent_full = jnp.full((nfp, xd + ud), 1e6, dtype).at[:nf].set(dyn.inducing)
        # uniform SE lengthscale; pad columns still underflow to exact 0
        # (d2 ~ 1e12 at the +1e6 pad centroids)
        inv_w2 = jnp.full((1, nfp), jnp.exp(-2.0 * dyn.log_lengthscale), dtype)
        scale2_val = jnp.exp(2.0 * dyn.log_scale)
        # w_white = scale^2 * W (the floored symmetric whitener,
        # gp/sgp.py:whiten_matrices — bounded operator norm, so the f32
        # kernel matmul is stable; the hypers and inducing points only
        # move between epochs)
        w_white = (
            jnp.zeros((nfp, nfp), dtype).at[:nf, :nf].set(scale2_val * dyn.whiten)
        )
        scale2 = scale2_val.reshape(1, 1)
    else:
        rbf = state.dynamics.rbf
        cent_full = jnp.full((nfp, xd + ud), 1e6, dtype).at[:nf].set(rbf.centroid)
        inv_w2 = jnp.ones((1, nfp), dtype).at[0, :nf].set(jnp.exp(-2.0 * rbf.logwidth))
        w_white = None
        scale2 = None
    c2 = jnp.sum(cent_full * cent_full, axis=-1).reshape(1, nfp)

    pad_eye = jnp.eye(nfp, dtype=dtype).at[:nf, :nf].set(0.0)
    p_mat = jnp.zeros((nfp, nfp), dtype).at[:nf, :nf].set(blr.precision) + pad_eye
    v_mat = jnp.zeros((nfp, nfp), dtype).at[:nf, :nf].set(blr.cov) + pad_eye
    w_dyn = jnp.zeros((nfp, xd), dtype).at[:nf].set(blr.w_mean)

    w0 = p.recognition.layers[0].w       # (h0, yd + ud + 2 xd)
    lik_lv = (
        p.likelihood.logvar if cfg.likelihood == "gaussian" else jnp.zeros((), dtype)
    )
    return FusedCarry(
        w_in_y=w0[:, :yd],
        w_in_u=w0[:, yd : yd + ud] if ud > 0 else None,
        w_in_m=w0[:, yd + ud : yd + ud + xd],
        w_in_lv=w0[:, yd + ud + xd :],
        w_hidden=tuple(l.w for l in p.recognition.layers[1:]),
        b_hidden=tuple(l.b.reshape(1, -1) for l in p.recognition.layers),
        w_mean=p.recognition.mean.w,
        w_logvar=p.recognition.logvar.w,
        b_logvar=p.recognition.logvar.b.reshape(1, -1),
        w_dec=p.decoder.w,
        b_dec=p.decoder.b.reshape(1, -1),
        cent_x=cent_full[:, :xd],
        cent_u=cent_full[:, xd:] if ud > 0 else None,
        c2=c2,
        inv_w2=inv_w2,
        w_white=w_white,
        scale2=scale2,
        p_mat=p_mat,
        v_mat=v_mat,
        w_dyn=w_dyn,
        state_logvar=state.dynamics.logvar.reshape(1, 1).astype(dtype),
        lik_logvar=jnp.reshape(lik_lv, (1, 1)).astype(dtype),
        dyn_n=state.dynamics.n_sample.astype(dtype).reshape(1, 1),
        lik_n=state.lik_n_sample.astype(dtype).reshape(1, 1),
        rng_seed=jnp.zeros((1, 1), jnp.int32),
        rng_count=jnp.zeros((1, 1), jnp.int32),
    )


def unpad_carry(cfg: VJFConfig, carry: FusedCarry, state_template):
    """FusedCarry -> TrainState (slice off padding, restore counters)."""
    from ...models.dynamics import DynamicsState
    from ...models.likelihoods import GaussianLikParams
    from ...models.rbf import RBFParams
    from ...models.recognition import LinearParams, RecognitionParams
    from ...models.regression import NSVBLR
    from ...models.vjf import Params, TrainState

    nf = state_template.dynamics.blr.w_mean.shape[0]
    tmpl_p = state_template.params

    segs = [carry.w_in_y] + ([carry.w_in_u] if carry.w_in_u is not None else []) + [
        carry.w_in_m, carry.w_in_lv
    ]
    w0 = jnp.concatenate(segs, axis=1)
    layers = (LinearParams(w0, carry.b_hidden[0].reshape(-1)),) + tuple(
        LinearParams(w, b.reshape(-1))
        for w, b in zip(carry.w_hidden, carry.b_hidden[1:])
    )
    rec = RecognitionParams(
        layers=layers,
        mean=LinearParams(carry.w_mean, None),
        logvar=LinearParams(carry.w_logvar, carry.b_logvar.reshape(-1)),
    )
    if cfg.likelihood == "gaussian":
        lik = GaussianLikParams(logvar=carry.lik_logvar.reshape(()))
    else:
        lik = tmpl_p.likelihood
    params = Params(
        recognition=rec,
        decoder=LinearParams(carry.w_dec, carry.b_dec.reshape(-1)),
        likelihood=lik,
        prior=tmpl_p.prior,
    )
    blr_new = NSVBLR(
        w_mean=carry.w_dyn[:nf],
        precision=carry.p_mat[:nf, :nf],
        cov=carry.v_mat[:nf, :nf],
    )
    if cfg.dynamics == "sgp":
        # inducing points / hypers / whitening only move between epochs —
        # restore them from the template
        dynamics = state_template.dynamics._replace(
            blr=blr_new,
            logvar=carry.state_logvar.reshape(()),
            n_sample=carry.dyn_n.reshape(()).astype(jnp.int32),
        )
    else:
        cent_segs = [carry.cent_x] + (
            [carry.cent_u] if carry.cent_u is not None else []
        )
        centroid = jnp.concatenate(cent_segs, axis=1)[:nf]
        dynamics = DynamicsState(
            rbf=RBFParams(centroid, state_template.dynamics.rbf.logwidth),
            blr=blr_new,
            logvar=carry.state_logvar.reshape(()),
            n_sample=carry.dyn_n.reshape(()).astype(jnp.int32),
        )
    return TrainState(
        params=params,
        dynamics=dynamics,
        lik_n_sample=carry.lik_n.reshape(()).astype(
            state_template.lik_n_sample.dtype
        ),
    )


def _exact_inverse_repair(cfg, c, prev_carry, g_vec, b, mse_fn):
    """Shared body of the two exact-inverse fallbacks: Cholesky inverse of
    the current precision, refreshed weights, then the state-noise running
    variance from ``mse_fn(w_new)``. Gated so a non-finite result — an
    f32-defeating cond(P) NaN-ing the plain Cholesky, or an overflowing
    residual MSE — is SKIPPED, never cemented; the gate reads the PRE-clip
    log-variance (clip would launder an inf into the finite +clamp).
    Returns the four updated dynamics fields."""
    from ...ops.linalg import cholesky_f32, tri_inv_newton

    hp = jax.lax.Precision.HIGHEST
    chol = cholesky_f32(c.p_mat)
    x = tri_inv_newton(chol)
    # full f32 on the inverse product: the default bf16-pass multiply
    # leaves |P V - I| ~ 2 at cond(P) ~ 1e4 (see regression.exact_path)
    v_new = jnp.matmul(x.T, x, precision=hp)
    w_new = jnp.matmul(v_new, g_vec, precision=hp)
    mse = mse_fn(w_new)
    dyn_n = jnp.minimum(prev_carry.dyn_n[0, 0], float(cfg.state_var_cap))
    tot = dyn_n + b
    var = (dyn_n / tot) * jnp.exp(prev_carry.state_logvar[0, 0]) + (b / tot) * mse
    slv = jnp.clip(jnp.log(var), -cfg.logvar_clamp, cfg.logvar_clamp)
    # gate on the VARIANCE (inf/NaN skipped; var == 0 floors legitimately)
    ok = jnp.logical_and(
        jnp.isfinite(jnp.sum(v_new) + jnp.sum(w_new)), jnp.isfinite(var)
    )
    return (
        jnp.where(ok, v_new, c.v_mat),
        jnp.where(ok, w_new, c.w_dyn),
        jnp.where(ok, slv, c.state_logvar[0, 0]).reshape(1, 1),
        jnp.where(ok, tot, c.dyn_n[0, 0]).reshape(1, 1),
    )


def exact_v_fallback(
    cfg: VJFConfig, out, prev_carry: FusedCarry, u: Optional[Array] = None,
    mask: Optional[Array] = None,
):
    """Replace the NS-tracked V with the exact Cholesky inverse when the
    kernel's tau says Newton-Schulz hadn't contracted (early steps only).

    The ``lax.cond`` is narrowed to the four affected dynamics fields so
    the common passthrough path copies ~70 KB, not the whole step output;
    features are recomputed inside the rare branch rather than streamed out
    of the kernel every step (128 KB/step of dead HBM traffic otherwise).

    Plain Cholesky, deliberately: P = I + sum F^T F / v is PD by
    construction, and ``safe_cholesky``'s eigh-repair branch nested inside
    this cond measured ~1 ms/step on v5e (TPU conditionals do not reliably
    skip an eigh-heavy untaken branch).

    ``mask``: optional (B, 1) trial-validity column matching the kernel's —
    the residual MSE and the sample count run over the valid rows only
    (a fully-masked step reports tau = 0, so the cond never fires there).
    """
    c = out.carry
    if mask is not None:
        m_col = (mask > 0).astype(out.xt.dtype)
        count = jnp.sum(m_col)
        b = count                               # raw count for the counter
    else:
        b = out.xt.shape[0]

    def exact(_):
        hp = jax.lax.Precision.HIGHEST

        def mse_fn(w_new):
            # recompute features of xs (rare branch only); pinned matmuls —
            # this branch runs as plain XLA on TPU (bf16 default passes
            # would bias the state-noise update at the most delicate steps,
            # and weaken the SGP whitening bound — CLAUDE.md #8/#11)
            x2 = jnp.sum(out.xs * out.xs, axis=-1, keepdims=True)
            cross = jnp.matmul(out.xs, c.cent_x.T, precision=hp)
            if u is not None and u.shape[-1] > 0:
                x2 = x2 + jnp.sum(u * u, axis=-1, keepdims=True)
                cross = cross + jnp.matmul(u, c.cent_u.T, precision=hp)
            d2 = jnp.maximum(x2 + c.c2 - 2.0 * cross, 0.0)
            feat = jnp.exp(-0.5 * d2 * c.inv_w2)
            if c.w_white is not None:
                feat = jnp.matmul(feat, c.w_white, precision=hp)  # SGP whitening
            resid = (out.xt - out.xs) - jnp.matmul(feat, w_new, precision=hp)
            if mask is not None:
                return jnp.sum(resid * resid * m_col) / (
                    jnp.maximum(count, 1.0) * resid.shape[-1]
                )
            return jnp.mean(resid * resid)

        return _exact_inverse_repair(cfg, c, prev_carry, out.g_vec, b, mse_fn)

    def keep(_):
        return c.v_mat, c.w_dyn, c.state_logvar, c.dyn_n

    tau = (
        out.scal.tau[0, 0] if isinstance(out, StepOut) else out.scal[0, 4]
    )
    v_new, w_new, slv, dn = jax.lax.cond(tau < NS_TAU_THRESHOLD, keep, exact, None)
    return out._replace(
        carry=c._replace(v_mat=v_new, w_dyn=w_new, state_logvar=slv, dyn_n=dn)
    )


# ---------------------------------------------------------------------------
# Phase-1 kernel for the sharded path (forward + local sums, no apply)
# ---------------------------------------------------------------------------


def _split_sums(sums: FusedSums):
    """Flatten FusedSums into (scalar leaves, array leaves) with treedef."""
    leaves, treedef = jax.tree_util.tree_flatten(sums)
    scalar_idx = [i for i, l in enumerate(leaves) if l.ndim == 0]
    array_idx = [i for i, l in enumerate(leaves) if l.ndim != 0]
    return leaves, treedef, scalar_idx, array_idx


def forward_sums_call(
    cfg: VJFConfig,
    flags: StepFlags,
    carry: FusedCarry,
    qs_m: Array,
    qs_lv: Array,
    y: Array,
    u: Optional[Array],
    eps_s: Array,
    eps_t: Array,
    inv_b,
    interpret: bool = False,
    mask: Optional[Array] = None,
    cmask: Optional[Array] = None,
) -> Tuple[FusedSums, Array, Array]:
    """Run the per-trial phase as ONE pallas kernel on this device's trial
    shard: forward, hand-written backward, and the trial reductions. Returns
    ``(sums, qt_mean, qt_logvar)`` — everything the cross-device ``psum`` +
    :func:`step_apply` needs. Scalar sums ride one packed (1, 128) row
    (Mosaic cannot store scalars to VMEM).

    ``mask``: optional (B, 1) trial-validity column for this device's local
    shard (ragged trials under sharding). ``inv_b`` must then be the traced
    GLOBAL ``1/max(valid count, 1)`` — it rides into the kernel as a (1, 1)
    operand — so that the masked local sums still psum to the single-device
    values (``local_renorm=False`` mode of :func:`step_forward_sums`).

    ``cmask``: optional (B, ydim) missing-observation mask for the local
    shard. Needs no count plumbing of its own: the per-observed-entry
    statistic ``cm_sum`` is a raw local sum that rides the FusedSums psum,
    and every cm-derived term in :func:`step_apply` (logvar constant,
    obs-mse, fractional count) is computed from the summed value."""
    carry_leaves, carry_treedef = jax.tree_util.tree_flatten(carry)
    has_u = u is not None and u.shape[-1] > 0
    has_mask = mask is not None
    has_cmask = cmask is not None
    b = y.shape[0]
    xd = cfg.xdim
    dtype = qs_m.dtype
    n_data = (
        5 + (1 if has_u else 0) + (2 if has_mask else 0)
        + (1 if has_cmask else 0)
    )

    # probe shapes once (abstract eval) to build the output layout (the
    # masks do not change existing leaf shapes, but a channel mask ADDS
    # the cm_sum scalar leaf — probe with the same arguments)
    sums_shape = jax.eval_shape(
        lambda c, qm, qlv, yy, uu, e1, e2, cmk: step_forward_sums(
            cfg, flags, c, qm, qlv, yy, uu, e1, e2, 1.0 / b, cmask=cmk
        )[0],
        carry, qs_m, qs_lv, y, u if has_u else None, eps_s, eps_t,
        cmask if has_cmask else None,
    )
    leaves_s, treedef_s, scalar_idx, array_idx = _split_sums(sums_shape)

    def kernel(*refs):
        carry_refs = refs[: len(carry_leaves)]
        data_refs = refs[len(carry_leaves) : len(carry_leaves) + n_data]
        out_refs = refs[len(carry_leaves) + n_data :]

        c = jax.tree_util.tree_unflatten(carry_treedef, [r[:] for r in carry_refs])
        it = iter(data_refs)
        qm = next(it)[:]
        qlv = next(it)[:]
        yy = next(it)[:]
        uu = next(it)[:] if has_u else None
        e1 = next(it)[:]
        e2 = next(it)[:]
        if has_mask:
            m = next(it)[:]
            inv_b_k = next(it)[0, 0]
        else:
            m, inv_b_k = None, inv_b
        cmk = next(it)[:] if has_cmask else None

        sums, per = step_forward_sums(
            cfg, flags, c, qm, qlv, yy, uu, e1, e2, inv_b_k,
            mask=m, local_renorm=False, cmask=cmk,
        )
        leaves = jax.tree_util.tree_leaves(sums)
        n_arr = len(array_idx)
        for ref, i in zip(out_refs[:n_arr], array_idx):
            ref[:] = leaves[i]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.zeros((1, 128), dtype)
        for j, i in enumerate(scalar_idx):
            row = row + jnp.where(cols == j, leaves[i], 0.0)
        out_refs[n_arr][:] = row
        out_refs[n_arr + 1][0] = per.qt_m
        out_refs[n_arr + 1][1] = per.qt_lv

    data = [qs_m, qs_lv, y] + ([u] if has_u else []) + [eps_s, eps_t]
    if has_mask:
        data += [mask, jnp.asarray(inv_b, dtype).reshape(1, 1)]
    if has_cmask:
        data += [cmask]
    out_shape = (
        tuple(
            jax.ShapeDtypeStruct(leaves_s[i].shape, leaves_s[i].dtype)
            for i in array_idx
        )
        + (
            jax.ShapeDtypeStruct((1, 128), dtype),
            jax.ShapeDtypeStruct((2, b, xd), dtype),
        )
    )
    results = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(carry_leaves) + len(data)),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape),
        interpret=interpret,
    )(*carry_leaves, *data)

    arr_res = results[: len(array_idx)]
    row = results[len(array_idx)]
    q_pack = results[len(array_idx) + 1]
    leaves_out = list(leaves_s)
    for r, i in zip(arr_res, array_idx):
        leaves_out[i] = r
    for j, i in enumerate(scalar_idx):
        leaves_out[i] = row[0, j]
    sums = jax.tree_util.tree_unflatten(treedef_s, leaves_out)
    return sums, q_pack[0], q_pack[1]


def exact_v_fallback_sums(
    cfg: VJFConfig,
    carry_new: FusedCarry,
    prev_carry: FusedCarry,
    sums: FusedSums,
    g_vec: Array,
    tau: Array,
    b_total,
):
    """Stats-based exact-inverse fallback for the sharded path: identical
    semantics to :func:`exact_v_fallback`, but the post-update residual MSE
    comes from the all-reduced statistics (the per-trial features never
    leave their device).

    ``b_total``: the batch size — a static int, or the traced GLOBAL valid
    count under a trial mask (the masked stats already run over valid rows
    only; a fully-masked step reports tau = 0, so the cond never fires)."""
    c = carry_new
    b = b_total
    b_div = jnp.maximum(jnp.asarray(b_total, c.w_dyn.dtype), 1.0)
    xd = c.w_dyn.shape[-1]
    hp = jax.lax.Precision.HIGHEST

    def exact(_):
        def mse_fn(w_new):
            quad = jnp.sum(w_new * jnp.matmul(sums.ftf_raw, w_new, precision=hp))
            return (
                sums.dx2_sum - 2.0 * jnp.sum(w_new * sums.fxd_raw) + quad
            ) / (b_div * xd)

        return _exact_inverse_repair(cfg, c, prev_carry, g_vec, b, mse_fn)

    def keep(_):
        return c.v_mat, c.w_dyn, c.state_logvar, c.dyn_n

    v_new, w_new, slv, dn = jax.lax.cond(tau < NS_TAU_THRESHOLD, keep, exact, None)
    return c._replace(v_mat=v_new, w_dyn=w_new, state_logvar=slv, dyn_n=dn)


# ---------------------------------------------------------------------------
# Mega kernel: one pallas_call per epoch segment (grid over time)
# ---------------------------------------------------------------------------
#
# The per-step kernel already fused the whole step; what remains per step is
# the harness around it — the scan body's pallas invocation, the fallback
# lax.cond, and the scan input/output streams (~1 us each on v5e). The mega
# kernel removes all of it: the time axis becomes the pallas GRID (TPU grid
# iterations execute sequentially on one core), the training carry lives in
# constant-index output blocks that persist in VMEM across iterations, the
# posterior carry lives in VMEM scratch, and y[t] is streamed in / q[t]
# streamed out by the automatically double-buffered block pipeline. One
# dispatch, zero per-step XLA ops.
#
# The exact-inverse fallback cannot run inside the kernel (a 128-sweep
# in-kernel Cholesky costs ~65 us); instead Newton-Schulz escalates in-kernel
# behind a hardware branch (2 extra iterations when tau >= 0.25, accurate to
# tau^32 < 1.1e-5 up to tau = 0.7) and the rare tau >= 0.7 step skips the
# V/w update and reports tau via the scalar stream. run_epoch_fused therefore
# routes the first cfg.ns_prefix post-warm-up steps (where tau is large by
# construction) through the per-step kernel with the exact cond fallback, and
# only the contracted steady state through the mega kernel.


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda t, _n=nd: (0,) * _n)


def _make_mega_kernel(
    cfg: VJFConfig,
    flags: StepFlags,
    carry_treedef,
    n_carry: int,
    has_u: bool,
    internal_rng: bool,
    xd: int,
    scal_rows: int,
    has_mask: bool = False,
    has_cmask: bool = False,
    ns_base_iters: int = 2,
):
    """One timestep per grid iteration. (A K-substep unroll variant —
    carry loaded/stored once per K steps — was built and measured in
    rounds 2-3: ~1-3% at flagship scale while sitting ~100 KB under the
    16 MB scoped-VMEM limit, OOM when trial-masked; cut in round 4,
    docs/RESULTS.md "K-step mega unroll".)"""
    n_data = (
        1 + (1 if has_u else 0) + (0 if internal_rng else 2)
        + (1 if has_mask else 0) + (1 if has_cmask else 0)
    )

    def kernel(*refs):
        lr_ref = refs[0]
        carry_in = refs[1 : 1 + n_carry]
        q0_m_ref = refs[1 + n_carry]
        q0_lv_ref = refs[2 + n_carry]
        data_refs = refs[3 + n_carry : 3 + n_carry + n_data]
        n_in = 3 + n_carry + n_data
        carry_out = refs[n_in : n_in + n_carry]
        q_ref = refs[n_in + n_carry]
        scal_ref = refs[n_in + n_carry + 1]
        qm_s, qlv_s, ns_s = refs[n_in + n_carry + 2 :]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            for co, ci in zip(carry_out, carry_in):
                co[:] = ci[:]
            qm_s[:] = q0_m_ref[:]
            qlv_s[:] = q0_lv_ref[:]

        carry = jax.tree_util.tree_unflatten(
            carry_treedef, [r[:] for r in carry_out]
        )
        it = iter(data_refs)
        y_blk = next(it)[:]
        u_blk = next(it)[:] if has_u else None
        eps_s_blk = eps_t_blk = None
        if not internal_rng:
            eps_s_blk = next(it)[:]
            eps_t_blk = next(it)[:]
        mask_blk = next(it)[:] if has_mask else None
        cmask_blk = next(it)[:] if has_cmask else None

        def ns_extra(x_ns, p_new, eye2, tau):
            # escalation runs on scalar-unit branches: the common case
            # (contracted tau) costs one scratch round-trip and two
            # predicates; near-threshold tau buys back iterations.
            ns_s[:] = x_ns

            @pl.when(tau >= NS_TAU_ESCALATE)
            def _():
                x = ns_s[:]
                ns_s[:] = jnp.dot(
                    x,
                    eye2 - jnp.dot(p_new, x, preferred_element_type=x.dtype),
                    preferred_element_type=x.dtype,
                )

            @pl.when(tau >= NS_TAU_THRESHOLD)
            def _():
                x = ns_s[:]
                for _ in range(NS_EXTRA_ITERS):
                    x = jnp.dot(
                        x,
                        eye2 - jnp.dot(p_new, x, preferred_element_type=x.dtype),
                        preferred_element_type=x.dtype,
                    )
                ns_s[:] = x

            return ns_s[:]

        y = y_blk
        u = u_blk if has_u else None
        if internal_rng:
            pltpu.prng_seed(carry.rng_seed[0, 0], carry.rng_count[0, 0])
            b = y.shape[0]
            eps_s, eps_t = _box_muller_latents(b, xd, y.dtype)
        else:
            eps_s, eps_t = eps_s_blk, eps_t_blk
        mask = mask_blk if has_mask else None
        cmask = cmask_blk if has_cmask else None

        out = step_math(
            cfg, flags, carry, qm_s[:], qlv_s[:], y, u, eps_s, eps_t,
            lr_ref[0], ns_extra=ns_extra, ns_tau_max=NS_TAU_MAX,
            ns_iters=ns_base_iters, mask=mask, cmask=cmask,
        )
        carry = out.carry._replace(rng_count=out.carry.rng_count + 1)
        q_ref[0] = out.qt_mean
        q_ref[1] = out.qt_logvar

        for ref, val in zip(carry_out, jax.tree_util.tree_leaves(carry)):
            ref[:] = val
        qm_s[:] = out.qt_mean
        qlv_s[:] = out.qt_logvar
        # scalar pack: Mosaic requires (8, 128)-tileable output blocks, so
        # the per-step scalar rows ride a (scal_rows, 128) block covering
        # scal_rows consecutive steps (revisited in VMEM; flushed when the
        # block index advances). This step's row r0 = t % scal_rows is
        # selected by iota mask — no dynamic-index stores, no scalar
        # stores.
        s = out.scal
        cols = jax.lax.broadcasted_iota(jnp.int32, (scal_rows, 128), 1)
        row_of_t = jax.lax.broadcasted_iota(jnp.int32, (scal_rows, 128), 0)
        r0 = t % scal_rows
        vals = (
            jnp.where(cols == 0, s.loss[0, 0], 0.0)
            + jnp.where(cols == 1, s.recon[0, 0], 0.0)
            + jnp.where(cols == 2, s.dyn[0, 0], 0.0)
            + jnp.where(cols == 3, s.ent[0, 0], 0.0)
            + jnp.where(cols == 4, s.tau[0, 0], 0.0)
        )
        scal_ref[:] = jnp.where(
            row_of_t == r0,
            vals,
            jnp.where(row_of_t < r0, scal_ref[:], 0.0),
        )

    return kernel


def mega_epoch_call(
    cfg: VJFConfig,
    flags: StepFlags,
    carry: FusedCarry,
    qs_m: Array,
    qs_lv: Array,
    ys: Array,
    us: Optional[Array],
    eps_s: Optional[Array],
    eps_t: Optional[Array],
    lr: Array,
    interpret: bool = False,
    mask: Optional[Array] = None,
    cmask: Optional[Array] = None,
):
    """Run ``T = ys.shape[0]`` fused steps as ONE grid-over-time pallas_call.

    Returns ``(carry, q_pack (T, 2, B, xd), scal (T, 8))``. ``eps_s=None``
    selects in-kernel Box-Muller RNG (stream index = the carried rng_count,
    so a mega segment continues a per-step prefix bit-identically).
    ``mask``: optional (T, B, 1) trial-validity blocks (ragged trials,
    single-device only — see :func:`step_math`); ``cmask``: optional
    (T, B, ydim) missing-observation blocks (streamed like ``ys``).
    """
    carry_leaves, carry_treedef = jax.tree_util.tree_flatten(carry)
    has_u = us is not None and us.shape[-1] > 0
    internal_rng = eps_s is None
    has_mask = mask is not None
    has_cmask = cmask is not None
    t_total, b, yd = ys.shape
    xd = cfg.xdim
    dtype = qs_m.dtype
    nfp = carry.p_mat.shape[0]

    scal_rows = 8 if t_total >= 8 else t_total
    # batch-adaptive base Newton-Schulz iterations (see NS_TAU_ESCALATE
    # block comment): large batches run 1 (tau provably tiny), small ones
    # keep the round-2 scheme's 2 — cfg.mega_ns_iters != 0 overrides.
    # A trial mask disqualifies the shortcut: the padded B says nothing
    # about the EFFECTIVE per-step valid count (a ragged tail can be
    # B~1 — the regime the 2-iteration banding protects), and the mask is
    # traced here so the count cannot steer a trace-time constant.
    ns_base_iters = int(cfg.mega_ns_iters) or (
        1 if (b >= NS_ONE_ITER_MIN_BATCH and mask is None) else 2
    )
    kernel = _make_mega_kernel(
        cfg, flags, carry_treedef, len(carry_leaves), has_u, internal_rng, xd,
        scal_rows, has_mask=has_mask, has_cmask=has_cmask,
        ns_base_iters=ns_base_iters,
    )
    data = [ys] + ([us] if has_u else []) + (
        [] if internal_rng else [eps_s, eps_t]
    ) + ([mask] if has_mask else []) + ([cmask] if has_cmask else [])
    data_specs = [
        pl.BlockSpec(
            (None,) + d.shape[1:], lambda t, _n=d.ndim - 1: (t,) + (0,) * _n
        )
        for d in data
    ]
    q_spec = pl.BlockSpec((None, 2, b, xd), lambda t: (t, 0, 0, 0))
    scal_spec = pl.BlockSpec(
        (scal_rows, 128), lambda t, _r=scal_rows: (t // _r, 0)
    )
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_const_spec(l.shape) for l in carry_leaves]
        + [_const_spec(qs_m.shape), _const_spec(qs_lv.shape)]
        + data_specs
    )
    out_shape = (
        tuple(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in carry_leaves)
        + (
            jax.ShapeDtypeStruct((t_total, 2, b, xd), dtype),   # q_pack
            jax.ShapeDtypeStruct((t_total, 128), dtype),        # scal rows
        )
    )
    out_specs = (
        tuple(_const_spec(l.shape) for l in carry_leaves)
        + (q_spec, scal_spec)
    )
    aliases = {1 + i: i for i in range(len(carry_leaves))}
    results = pl.pallas_call(
        kernel,
        grid=(t_total,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((b, xd), dtype),
            pltpu.VMEM((b, xd), dtype),
            pltpu.VMEM((nfp, nfp), dtype),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(lr.reshape(1), *carry_leaves, qs_m, qs_lv, *data)

    n_c = len(carry_leaves)
    new_carry = jax.tree_util.tree_unflatten(carry_treedef, list(results[:n_c]))
    q_pack, scal = results[n_c], results[n_c + 1]
    return new_carry, q_pack, scal[:, :8]


# ---------------------------------------------------------------------------
# Fused epoch runner (drop-in for models.vjf.run_epoch)
# ---------------------------------------------------------------------------


def fused_enabled(cfg: VJFConfig, state, n_batch: Optional[int] = None) -> bool:
    from ...models.regression import NSVBLR

    if cfg.fused_step == "off":
        return False
    if cfg.dynamics not in ("rbf", "sgp") or not isinstance(state.dynamics.blr, NSVBLR):
        return False
    if (
        cfg.dynamics == "sgp"
        and cfg.fused_step != "on"
        and n_batch is not None
        and n_batch < cfg.sgp_fused_min_batch
    ):
        # measured on-chip: tiny-batch SGP keeps the per-step NSV trace
        # bound hot (tau >= threshold indefinitely — each whitened-feature
        # rank-B update stays large relative to P), so the mega layout
        # would only demote after a wasted compile; route straight to the
        # XLA epoch with its per-step exact-inverse fallback instead.
        return False
    if cfg.dynamics_update != "rls":
        return False  # the kernel implements the RLS learner only
    if cfg.recognition_activation != "tanh":
        return False  # hand-written backward assumes tanh
    if cfg.fused_step == "on":
        return True
    return cfg.dtype == "float32" and jax.default_backend() == "tpu"


def run_epoch_fused(cfg, flags, state, ys, us, key, lr, noise=None, q0=None,
                    interpret: Optional[bool] = None, mask=None,
                    channel_mask=None):
    """One epoch through the fused kernel — same contract as
    ``models.vjf.run_epoch`` (pad once, run the segments, unpad once).

    Epoch layout (``cfg.fused_epoch``):

    * ``'mega'`` — the first ``cfg.ns_prefix`` RLS-active steps run the
      per-step kernel with the exact-inverse ``lax.cond`` fallback (tau is
      large by construction right after warm-up); the remainder of the epoch
      is ONE grid-over-time pallas_call with no per-step XLA ops at all.
      Warm-up epochs (no RLS) need no prefix and run fully mega.
    * ``'stepwise'`` — the round-1 layout: ``lax.scan`` of per-step kernel
      calls with the fallback cond every step.

    Step I/O is minimized either way: observations are the only per-step
    input in the common case (controls only when udim > 0, eps slices only
    when noise is injected — otherwise the kernel's on-core PRNG generates
    them), and the per-step outputs are two packed buffers (posterior pack +
    scalar pack). Per-step scan streams were measured at ~1 us each on v5e,
    so every dropped stream is real throughput.
    """
    from ...models.vjf import EpochResult, Metrics, prior

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    t_len, n_batch, _ = ys.shape
    if q0 is None:
        q0 = prior(state.params, n_batch)
    internal_rng = noise is None and not interpret
    if noise is None and not internal_rng:
        eps = jax.random.normal(key, (t_len, 2, n_batch, cfg.xdim), ys.dtype)
        noise = (eps[:, 0], eps[:, 1])

    do_fallback = flags.update and flags.update_transition and not flags.warm_up
    # start every RLS-active epoch from a PD (P, V) pair (see
    # maybe_epoch_repair; runs on the unpadded blr by construction here)
    state = maybe_epoch_repair(cfg, flags, state, n_batch)

    carry0 = pad_carry(cfg, state)
    if internal_rng:
        seed = jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        carry0 = carry0._replace(rng_seed=seed)
    has_u = cfg.udim > 0
    has_mask = mask is not None
    if has_mask:
        # (T, B) -> (T, B, 1): the kernels take a per-step (B, 1) column
        # (Mosaic blocks want >= 2-D); sanitize to exact 0/1 once here
        mask3 = (jnp.asarray(mask, ys.dtype) > 0).astype(ys.dtype)[:, :, None]
    has_cmask = channel_mask is not None
    if has_cmask:
        # (T, B, ydim), streamed into the kernels like ys
        cmask3 = (
            jnp.broadcast_to(jnp.asarray(channel_mask, ys.dtype), ys.shape)
            > 0
        ).astype(ys.dtype)

    if cfg.fused_epoch == "mega":
        prefix = min(cfg.ns_prefix, t_len) if do_fallback else 0
    else:
        prefix = t_len

    def body(c, inp):
        carry, qm, qlv = c
        it = iter(inp)
        y = next(it)
        u = next(it) if has_u else None
        e1, e2 = (next(it), next(it)) if not internal_rng else (None, None)
        m = next(it) if has_mask else None
        cm = next(it) if has_cmask else None
        out = fused_step_call(
            cfg, flags, carry, qm, qlv, y, u, e1, e2, lr,
            interpret=interpret, mask=m, cmask=cm,
        )
        if do_fallback:
            out = exact_v_fallback(cfg, out, carry, u, mask=m)
        return (out.carry, out.q_pack[0], out.q_pack[1]), (out.q_pack, out.scal)

    def seg_inputs(lo, hi):
        return (
            (ys[lo:hi],) + ((us[lo:hi],) if has_u else ()) + (
                (noise[0][lo:hi], noise[1][lo:hi]) if not internal_rng else ()
            ) + ((mask3[lo:hi],) if has_mask else ())
            + ((cmask3[lo:hi],) if has_cmask else ())
        )

    q_segs, scal_segs = [], []
    carry_f, qm_f, qlv_f = carry0, q0.mean, q0.logvar
    if prefix > 0:
        (carry_f, qm_f, qlv_f), (q_seq_a, scal_a) = jax.lax.scan(
            body, (carry_f, qm_f, qlv_f), seg_inputs(0, prefix)
        )
        q_segs.append(q_seq_a)
        scal_segs.append(scal_a[:, 0, :])
    if prefix < t_len:
        lo, hi = prefix, t_len
        e1, e2 = (
            (noise[0][lo:hi], noise[1][lo:hi])
            if not internal_rng
            else (None, None)
        )
        carry_f, q_seq_b, scal_b = mega_epoch_call(
            cfg, flags, carry_f, qm_f, qlv_f, ys[lo:hi],
            us[lo:hi] if has_u else None, e1, e2, lr,
            interpret=interpret,
            mask=mask3[lo:hi] if has_mask else None,
            cmask=cmask3[lo:hi] if has_cmask else None,
        )
        qm_f, qlv_f = q_seq_b[-1, 0], q_seq_b[-1, 1]
        q_segs.append(q_seq_b)
        scal_segs.append(scal_b)

    q_seq = q_segs[0] if len(q_segs) == 1 else jnp.concatenate(q_segs, axis=0)
    scal_seq = scal_segs[0] if len(scal_segs) == 1 else jnp.concatenate(scal_segs, axis=0)
    metrics = Metrics(
        loss=scal_seq[:, 0],
        recon=scal_seq[:, 1],
        dynamics=scal_seq[:, 2],
        entropy=scal_seq[:, 3],
        tau=scal_seq[:, 4],
    )
    return EpochResult(
        state=unpad_carry(cfg, carry_f, state),
        q_means=q_seq[:, 0],
        q_logvars=q_seq[:, 1],
        metrics=metrics,
    )
