"""Configuration tree.

The reference buries every tunable in constructor kwargs and inline
constants (gradient clip 1.0 at ``vjf/model.py:210``; Poisson rate clamp 10
at ``vjf/likelihood.py:60``; running-variance caps 1000/500 at
``vjf/util.py:20`` / ``vjf/model.py:375``; lr decay 0.9 at ``vjf/model.py:52``;
warm-up rtol 1e-4 at ``vjf/model.py:224``; RBF centroid init range ±2 at
``vjf/module.py:20``). Here every one of them is an explicit, hashable
dataclass field so configs are static jit arguments and checkpoints are
self-describing.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "float64": jnp.float64,
    "bfloat16": jnp.bfloat16,
}


@dataclass(frozen=True)
class VJFConfig:
    """Static model + training configuration (hashable: safe as a jit static)."""

    # --- architecture (mirrors VJF.make_model, vjf/model.py:309-319) ---
    ydim: int
    xdim: int
    udim: int = 0
    n_rbf: int = 100
    hidden_sizes: Tuple[int, ...] = (20,)
    likelihood: str = "gaussian"          # 'gaussian' | 'poisson'
    dynamics: str = "rbf"                 # 'rbf' | 'sgp'
    # recognition MLP activation (vjf/recognition.py:17, default Tanh);
    # the fused kernel supports tanh only — others run the XLA step.
    recognition_activation: str = "tanh"  # 'tanh'|'relu'|'sigmoid'|'softplus'|'identity'

    # --- optimizer (vjf/model.py:52,69-78) ---
    lr: float = 1e-4
    lr_decay: float = 0.9                 # ExponentialLR gamma
    clip: float = 1.0                     # grad value clip, vjf/model.py:210

    # --- buried constants, made explicit ---
    poisson_clamp: float = 10.0           # vjf/likelihood.py:60
    obs_var_cap: int = 1000               # vjf/util.py:20 default
    state_var_cap: int = 500              # vjf/model.py:375
    centroid_init_range: float = 2.0      # U[-2, 2), vjf/module.py:20
    init_obs_logvar: float = math.log(0.1)  # vjf/likelihood.py:16
    rls_shrink: float = 1.0               # forgetting factor, vjf/model.py:371
    leak: float = 0.0                     # vjf/model.py:334
    # dynamics weight learner: 'rls' (live reference path, vjf/model.py:371)
    # or 'kalman' (the commented weight-diffusion alternative at
    # vjf/model.py:372, w[t] = w[t-1] + N(0, diffusion I))
    dynamics_update: str = "rls"
    kalman_diffusion: float = 0.01        # vjf/model.py:372 default
    # strict-parity replication of the reference's double-S^{-1} gain in
    # joseph_update (vjf/kalman.py:131-139): the innovation, H, and sqrt(R)
    # each get an extra cholesky_solve, so the effective gain is K S^{-1}.
    # Default off = the correct standard Joseph update (deviation #2,
    # docs/ARCHITECTURE.md); mirrors the trace_quirk treatment.
    joseph_quirk: bool = False

    # --- fit loop (vjf/model.py:223-224) ---
    beta: float = 0.1                     # running-loss discount
    rtol: float = 1e-4                    # plateau tolerance
    # warm-up safety cap (no reference counterpart, 0 = reference behavior:
    # warm-up ends ONLY on the loss plateau, vjf/model.py:278-295). On
    # noisy small-batch losses the isclose plateau can fail to fire for an
    # entire fit, which silently never trains the dynamics (the tell:
    # forecast == persistence). With warmup_max = K > 0, fit() forces the
    # phase transition (decoder freeze + dynamics bootstrap) at epoch K if
    # the plateau hasn't fired by then.
    warmup_max: int = 0

    # runaway guard (no reference counterpart — the reference's unclamped
    # running-variance recursion NaN-cascades in f32 once a no-warm-up run
    # destabilizes: logvar -> +inf -> exp -> inf -> log -> nan). +-30 is far
    # outside any sane noise scale, so parity is unaffected.
    logvar_clamp: float = 30.0

    # --- forecast-skill training (DEPRECATED r5; no reference counterpart)
    # The honest A/B is negative (VdP 20-step forecast RMSE 0.257->0.279
    # WORSE, Lorenz ~1% — docs/RESULTS.md "Forecast-skill training");
    # select='forecast' below wins on both systems with zero quality risk.
    # fit()/fit_ensemble() emit a DeprecationWarning when it is enabled;
    # the knob will be removed in a future release. ---
    # The one-step filtering objective optimizes next-step prediction;
    # long-horizon forecasts degrade with extended training (measured —
    # docs/RESULTS.md "Task quality": the plateau stop acts as an
    # accidental regularizer). multistep_refine = K > 0 adds a per-epoch
    # K-step rollout-consistency refinement after each post-warm-up
    # epoch: roll the current velocity field K steps from every posterior
    # mean, regress the telescoped K-step displacement on the
    # path-accumulated features (linear in w given the rolled path), and
    # blend the ridge solution into w_mean with weight multistep_weight
    # (P/V untouched — the uncertainty bookkeeping stays one-step
    # conservative). models/vjf.py:multistep_refine; A/B measured in
    # docs/RESULTS.md "Forecast-skill training".
    multistep_refine: int = 0
    multistep_weight: float = 0.3
    multistep_iters: int = 2

    # --- forecast-gated model selection (opt-in; no reference counterpart) ---
    # The filtering objective is one-step; long-horizon forecast skill
    # peaks BEFORE the loss plateau and degrades with further training
    # (measured three independent ways — docs/RESULTS.md "Task quality",
    # CLAUDE traps 17/23: latent R² stays ~0.99 while the velocity field
    # off the data manifold deteriorates). The paper the reference
    # implements evaluates by forecast error (rollout surface
    # vjf/model.py:342-361), yet fit() selects its returned state by loss
    # plateau alone. select='forecast' computes a device-side
    # select_horizon-step rollout RMSE from select_starts posterior means
    # against the actually-observed future after every post-warm-up epoch
    # (one extra scalar fetch alongside the loss; the selection PRNG chain
    # is folded out of the fit key so the TRAINING trajectory is
    # bit-identical to select='loss') and returns the best-forecast
    # snapshot (state + posteriors) instead of the final one.
    # FitResult.selected_epoch/.selected_metric report the choice. Blocked
    # dispatch modes evaluate at block granularity; fit_ensemble selects
    # per member; the relaxed-sync mesh path (sync_every != 1) COMPOSES —
    # and selection is the measured rescue for its forecast damage (VdP
    # K=8 fc 12.2 -> 0.43, RESULTS "Relaxed-sync"). Not supported with
    # masks (rollout windows have no validity alignment).
    select: str = "loss"                  # 'loss' | 'forecast'
    select_horizon: int = 20
    select_starts: int = 32

    # --- TPU-native knobs (no reference counterpart) ---
    # multi-chip sync cadence (fit(mesh=...) only). 1 = the reference's
    # exact semantics (shared state re-synced EVERY step via one psum of
    # the sufficient statistics/grads — vjf/module.py:94-96). K > 1 is a
    # flag-gated DEVIATION: each chip runs K steps fully locally (per-chip
    # mega kernel, zero collectives) and states merge at segment
    # boundaries (exact RLS-statistics merge + FedAvg'd SGD params —
    # parallel/sharded.py:run_epoch_sync_every). 0 = sync at epoch end
    # only. Quality vs K measured in docs/RESULTS.md "Relaxed-sync".
    sync_every: int = 1
    # trust-region damping of the merged dynamics-weight step at relaxed-
    # sync segment boundaries (sync_every != 1 only): the merged pooled
    # step Δw = w_merged − w_base is rescaled so ‖Δw‖_F ≤ sync_trust ·
    # max(‖w_base‖_F, 1). Root-caused in r4 (docs/RESULTS.md "Relaxed-
    # sync"): each boundary applies an 8×-data pooled natural-gradient
    # step computed from locally-drifted B_local-sized trajectories, and
    # the un-damped recursion amplifies ‖w‖ multiplicatively per merge —
    # the measured Lorenz "K=32 collapse" (and the K=8 silent dynamics
    # death behind a healthy latent R²). With the damping + the B=1
    # conditioning guard (rls_shrink<1 + chol_jitter) every cadence
    # K ∈ {8, 32, epoch} beats persistence on the 20-step forecast.
    # 0 disables (the r3 behavior). Exact-sync (sync_every=1) never
    # consults it.
    sync_trust: float = 0.25
    rls_backend: str = "auto"             # 'precision' | 'covariance' | 'nsv' | 'auto'
    fused_step: str = "auto"              # whole-step pallas kernel: 'on'|'off'|'auto'
    # epoch compilation strategy for the fused path:
    #   'mega'     — exact-inverse prefix of ns_prefix per-step kernel calls
    #                (lax.cond Cholesky fallback while Newton-Schulz hasn't
    #                contracted), then ONE grid-over-time pallas_call for the
    #                cond-free remainder of the epoch;
    #   'stepwise' — the round-1 layout: scan of per-step kernel calls with
    #                the fallback cond every step.
    fused_epoch: str = "mega"
    # length of the exact-inverse prefix segment. tau (the Newton-Schulz
    # residual bound) was measured to fall below threshold within ~400 steps
    # of the first RLS-active epoch on every BASELINE config; the mega
    # segment self-reports its max tau so fit() can warn if this is ever
    # too short for a new regime.
    ns_prefix: int = 512
    # prefix-free CONTINUATION for ensemble fused epochs (r5, VERDICT r4
    # #5): under vmap the prefix segment's exact-inverse lax.cond lowers to
    # select — BOTH branches execute, so every member pays the full
    # Cholesky fallback on all ns_prefix steps regardless of tau (measured
    # on-chip at N=1, B=32, T=2000, K=5 blocks: 14.15 us/member-step with
    # the prefix vs 6.87 without — the entire vmapped-vs-solo gap).
    # fit_ensemble therefore drops the prefix (ns_prefix=0 dispatch) once
    # every member's previous fused epoch ran contracted (max post-prefix
    # tau < 0.05: below the in-kernel escalation threshold, where the
    # per-step and mega kernels compute identically), and restores it if
    # tau re-enters the exact-fallback band (>= 0.25) or hot steps appear.
    # The first post-bootstrap epoch always runs the full prefix (tau is
    # large there BY CONSTRUCTION — the prefix's reason to exist).
    #   'auto' — engage in fit_ensemble fused dispatches (measured 2x)
    #   'off'  — never (every fused epoch runs the full prefix)
    ns_prefix_free: str = "auto"
    # base Newton-Schulz iterations per step in the cond-free mega segment
    # (each f32 128^3 iteration is 2 MXU matmuls ~0.55 us on v5e — the
    # single largest per-step line item at steady state). 0 = auto: 1 when
    # the padded batch is >= 64 trials (measured post-prefix tau < 1e-6
    # there — the single-iteration residual tau^2 is below f32 noise;
    # flagship losses identical at ~8% more throughput), else 2 (the B=1 +
    # shrink regime sits at the tracking scheme's stability margin — see
    # ops/pallas/fused_step.py NS_TAU_ESCALATE). In-kernel escalation adds
    # +1 at tau >= 0.05 and +2 more at tau >= 0.25 regardless.
    mega_ns_iters: int = 0
    # (a mega_unroll knob — K timesteps per mega grid iteration — lived
    # here in rounds 2-3; cut in round 4: measured ~1-3% at flagship
    # scale, VMEM-OOM when trial-masked. docs/RESULTS.md "K-step mega
    # unroll" keeps the measurement record.)
    # bf16 MXU inputs (f32 accumulate) for the fused kernel's activation /
    # gradient / sufficient-statistic matmuls; the error-feedback-critical
    # chain (P w, Newton-Schulz polish, V g) always stays f32. 'float32'
    # disables. f32 matmuls cost 6 MXU passes on v5e — this is ~3x.
    matmul_dtype: str = "bfloat16"
    trace_quirk: bool = True              # replicate vjf/functional.py:64-71
    dtype: str = "float32"
    chol_jitter: float = 0.0              # unconditional PSD jitter on RLS
    # sgp dynamics (BASELINE config #3; API recovered from test_sgp.py)
    n_inducing: int = 50
    sgp_scale: float = 1.0
    sgp_lengthscale: float = 1.0
    # kernel hyperparameter adaptation (gp/sgp.py:adapt_hyperparams): SGD
    # steps on (log_scale, log_lengthscale) against the pooled predictive
    # NLL after each post-warm-up epoch, with the posterior reprojected into
    # the re-whitened basis. 0 disables (hypers frozen at the cfg values).
    sgp_adapt_lr: float = 0.0
    sgp_adapt_steps: int = 5
    # fraction of post-prefix steps hitting the in-kernel Newton-Schulz
    # escalation ceiling (samples skipped, models/vjf.py hot-tau check)
    # above which fit() demotes the epoch to the XLA path and re-runs it.
    # Rare hits are harmless (the skip keeps P and V consistent); >= 1
    # disables demotion entirely (skipped samples are simply dropped).
    demote_hot_frac: float = 0.01
    # hot-tau demotion is a safety net, not a verdict: a SINGLE hot epoch
    # is often a transient (the first post-bootstrap epoch, or a canonical
    # B=1 fit that went 7.7% hot at epoch 63 of 150 and then permanently
    # crawled on the XLA path). After a demotion, fit() re-probes the mega
    # layout once `repromote_after` epochs have passed: if the probe epoch
    # is hot again it is re-run from its pre-epoch state on the XLA path
    # exactly like the original demotion (cost: one wasted fast epoch; no
    # new compile — both executables are already cached), and the probe
    # budget `repromote_max` bounds the total waste for genuinely
    # always-hot regimes. repromote_after=0 restores permanent demotion.
    # Streaming (filter_stream) demotion stays permanent: a stream's
    # hot regime is stationary by construction (no phase transitions).
    # Budget sizing (measured on-chip, canonical 3,183x150 B=1 per-epoch
    # fit whose hot epochs recur every ~3-5 epochs early on): max=2
    # exhausted by epoch 39 and crawled 111 epochs on the XLA path
    # (warm wall 16.2 s); max=8 kept recovering mega and halved the wall
    # (9.4 s, 127x end-to-end) at identical final loss. A failed probe
    # costs ~2 epoch-equivalents (one wasted mega epoch + one cached XLA
    # re-run) and probes are repromote_after epochs apart, so the worst
    # case is self-limiting even for always-hot regimes.
    repromote_after: int = 3
    repromote_max: int = 8
    # post-warm-up early stopping: the reference breaks the fit on the
    # FIRST epoch whose loss lands within rtol of the running EMA
    # (vjf/model.py:293-295) — but a single transient plateau can stop
    # training while forecast skill is still improving (measured on-chip:
    # the Van der Pol bench fit stops at epoch 30 with 20-step forecast
    # RMSE 0.87 when a trajectory perturbation lands one epoch inside
    # rtol; with patience it runs to epoch ~45 and reaches 0.44 — latent
    # R² is 0.990 either way, the classic recognition-masks-the-dynamics
    # tell). stop_patience=N requires N CONSECUTIVE plateau epochs before
    # stopping; 1 = the reference-faithful single-shot stop.
    stop_patience: int = 1
    # epoch-boundary spectral repair of the NSV-tracked (P, V) pair
    # (regression.spectral_repair): at the START of every RLS-active
    # fused/mega epoch with per-step trial count <
    # ops/pallas/fused_step.NS_ONE_ITER_MIN_BATCH, probe P with a cholesky
    # and — ONLY if it went indefinite (a one-time event at the first
    # post-bootstrap boundary on the canonical/VdP B=1 workloads; evmin
    # -7.2/-23.7 measured) — re-factorize through a relative-floored eigh
    # so the next epoch cannot explode (|w| ~ 2e12 unrepaired). Healthy
    # boundaries pass through BIT-UNTOUCHED: unconditional flooring lifts
    # genuine eigenvalues between the jitter floor and the relative floor
    # and measurably degrades the learned dynamics (VdP forecast 0.85 vs
    # 0.51 at matched epochs — see spectral_repair's docstring). 'on'
    # forces the old unconditional floor every boundary at any batch;
    # 'off' disables. XLA-path epochs never need it (per-step exact
    # fallback).
    rls_epoch_repair: str = "auto"
    # below this per-step trial count the SGP fused path is skipped under
    # 'auto' (measured: tiny-batch SGP keeps the NSV trace bound hot
    # forever, so the mega layout only demotes after a wasted compile —
    # ops/pallas/fused_step.py:fused_enabled). fused_step='on' overrides.
    sgp_fused_min_batch: int = 8

    @property
    def jdtype(self):
        return _DTYPES[self.dtype]

    @property
    def feature_dim(self) -> int:
        return self.n_rbf if self.dynamics == "rbf" else self.n_inducing

    @property
    def xudim(self) -> int:
        return self.xdim + self.udim

    def replace(self, **kw) -> "VJFConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class StepFlags:
    """Static per-call flags of ``VJF.filter`` (``vjf/model.py:179-180``).

    ``warm_up`` excludes the dynamics loss and skips the RLS update
    (``vjf/model.py:148-149, 370-371``); ``train_decoder`` is the fit loop's
    post-warm-up decoder freeze (``vjf/model.py:283``) — a separate flag
    because a standalone ``filter`` call never freezes the decoder.
    ``update_likelihood``/``update_transition`` are the per-module toggles
    of ``VJF.update`` (``vjf/model.py:156-177``, kwargs ``likelhood=`` [sic]
    / ``transition=``); both require ``update=True`` to take effect.
    """

    sgd: bool = True
    update: bool = True
    warm_up: bool = False
    train_decoder: bool = True
    update_likelihood: bool = True
    update_transition: bool = True
