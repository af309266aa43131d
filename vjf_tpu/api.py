"""Object-oriented facade mirroring the reference's user-facing API.

A thin stateful wrapper over the pure-functional core in
``vjf_tpu.models.vjf`` so that users of the reference
(``VJF.make_model(...)``, ``.fit(...)``, ``.filter(...)``, ``.forecast(...)``
— ``/root/reference/vjf/model.py:50-324``) can switch with minimal changes.
All heavy lifting is jitted; this class only holds the state pytree and an
RNG key.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .config import StepFlags, VJFConfig
from .models import vjf as core
from .ops.pallas.fused_step import NS_TAU_MAX
from .types import Gaussian

_EXHAUSTED = object()  # filter_stream: marks a mask iterable that ran dry

logger = logging.getLogger("vjf_tpu.api")


class VJF:
    """Stateful convenience wrapper; see module docstring.

    Prefer the functional API (``vjf_tpu.models.vjf``) for sharded /
    multi-device or custom training loops.
    """

    def __init__(
        self,
        cfg: VJFConfig,
        seed: int = 0,
        backend: Optional[str] = None,
        batch_hint: Optional[int] = None,
    ):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.state = core.init_state(
            k_init, cfg, backend=backend, batch_hint=batch_hint
        )
        self._step_fn = jax.jit(core.filter_step, static_argnames=("cfg", "flags"))
        self._lr = cfg.lr
        # epochs the most recent fit() ACTUALLY ran (early plateau
        # convergence stops before max_iter) — 0 until the first fit
        self.epochs_run = 0
        # once fit()'s warm-up phase ends the decoder is frozen permanently
        # (requires_grad_(False) in the reference, vjf/model.py:283)
        self._decoder_frozen = False

    # -- construction -----------------------------------------------------
    @classmethod
    def make_model(
        cls,
        ydim: int,
        xdim: int,
        udim: int = 0,
        n_rbf: int = 100,
        hidden_sizes: Sequence[int] = (20,),
        likelihood: str = "poisson",
        *,
        seed: int = 0,
        **kwargs,
    ) -> "VJF":
        """Factory with the reference's signature (``vjf/model.py:309-319``;
        note the reference's default likelihood is 'poisson')."""
        cfg = VJFConfig(
            ydim=ydim,
            xdim=xdim,
            udim=udim,
            n_rbf=n_rbf,
            hidden_sizes=tuple(hidden_sizes),
            likelihood=likelihood.lower(),
            **kwargs,
        )
        return cls(cfg, seed=seed)

    def forward(
        self,
        y: Array,
        qs: Optional[Gaussian] = None,
        u: Optional[Array] = None,
    ) -> Tuple:
        """Pure forward pass (no learning) — ``VJF.forward``
        (``vjf/model.py:97-122``): returns ``(xs, pt, qt, xt, py)``."""
        cfg = self.cfg
        y = jnp.atleast_2d(jnp.asarray(y, dtype=cfg.jdtype))
        if u is not None:
            u = jnp.atleast_2d(jnp.asarray(u, dtype=cfg.jdtype))
        if qs is None:
            qs = core.prior(self.state.params, y.shape[0])
        self.key, k = jax.random.split(self.key)
        eps = jax.random.normal(k, (2, y.shape[0], cfg.xdim), cfg.jdtype)
        _, (qt, xt, xs, py, _) = core.elbo_terms(
            cfg, self.state.params, self.state.dynamics, qs, y, u, eps[0], eps[1]
        )
        tr = core._transition(cfg)
        pt = tr.transition_gaussian(self.state.dynamics, xs, u, cfg.leak)
        return xs, pt, qt, xt, py

    def loss(
        self,
        y: Array,
        xs: Array,
        pt: Gaussian,
        qt: Gaussian,
        xt: Array,
        py: Array,
        warm_up: bool = False,
    ) -> Array:
        """Negative ELBO from :meth:`forward` outputs — ``VJF.loss``
        (``vjf/model.py:124-154``): recon NLL − entropy (+ dynamics NLL
        unless ``warm_up``), each term zeroed if non-finite exactly like
        the reference's silent-skip guards (``model.py:138-145``).
        ``xs``/``xt`` are accepted for signature parity (the reference
        takes but ignores them too)."""
        from .models.vjf import _likelihood_loss
        from .ops.functional import finite_or_zero, gaussian_entropy

        cfg = self.cfg
        del xs, xt
        y = jnp.atleast_2d(jnp.asarray(y, dtype=cfg.jdtype))
        l_recon = finite_or_zero(
            _likelihood_loss(cfg, self.state.params.likelihood, py, y)
        )
        h = finite_or_zero(gaussian_entropy(qt))
        loss = l_recon - h
        if not warm_up:
            # only evaluated when it contributes (the reference computes it
            # eagerly but discards it during warm-up; skipping saves the
            # SGP kernel work + a dispatch round-trip per un-jitted call)
            loss = loss + finite_or_zero(
                core._transition(cfg).dynamics_loss(
                    self.state.dynamics, pt, qt, trace_quirk=cfg.trace_quirk
                )
            )
        return loss

    # -- streaming filter -------------------------------------------------
    def filter(
        self,
        y: Array,
        u: Optional[Array] = None,
        qs: Optional[Gaussian] = None,
        *,
        sgd: bool = True,
        update: bool = True,
        warm_up: bool = False,
        verbose: bool = False,
        mask: Optional[Array] = None,
        channel_mask: Optional[Array] = None,
    ) -> Tuple:
        """One online filter-then-learn step — ``VJF.filter``
        (``vjf/model.py:179-221``). Call repeatedly with the returned
        posterior for true streaming use. ``verbose=True`` additionally
        returns the ELBO components (recon, dynamics, entropy), mirroring
        the reference's verbose output.

        ``mask``: optional (B,) 0/1 trial-validity mask — absent trials
        (ragged batches) contribute nothing this step and their posterior
        carry freezes. ``channel_mask``: optional (B, ydim) 0/1
        missing-observation mask (electrode dropout): masked entries drop
        out of the likelihood and noise updates and the recognition input
        sees the model's own prediction — a genuine partial-observation
        filter step. Missing ``y`` entries may be NaN.
        """
        cfg = self.cfg
        y = jnp.atleast_2d(jnp.asarray(y, dtype=cfg.jdtype))
        if u is not None:
            u = jnp.atleast_2d(jnp.asarray(u, dtype=cfg.jdtype))
        if qs is None:
            qs = core.prior(self.state.params, y.shape[0])
        if mask is not None:
            mask = jnp.broadcast_to(
                jnp.atleast_1d(jnp.asarray(mask, dtype=cfg.jdtype)),
                y.shape[:1],
            )
        if channel_mask is not None:
            channel_mask = jnp.broadcast_to(
                jnp.atleast_2d(jnp.asarray(channel_mask, dtype=cfg.jdtype)),
                y.shape,
            )
        flags = StepFlags(
            sgd=sgd, update=update, warm_up=warm_up,
            train_decoder=not self._decoder_frozen,
        )
        self.key, k = jax.random.split(self.key)
        eps = jax.random.normal(k, (2, y.shape[0], cfg.xdim), cfg.jdtype)
        self.state, qt, metrics = self._step_fn(
            cfg, flags, self.state, qs, y, u, eps[0], eps[1],
            jnp.asarray(self._lr, cfg.jdtype), mask=mask,
            channel_mask=channel_mask,
        )
        if verbose:
            return qt, metrics.loss, metrics.recon, metrics.dynamics, metrics.entropy
        return qt, metrics.loss

    def update(
        self,
        y: Array,
        xs: Array,
        u: Optional[Array] = None,
        xt: Optional[Array] = None,
        py: Optional[Array] = None,
        *,
        likelhood: bool = True,          # [sic] — the reference's kwarg name
        likelihood: Optional[bool] = None,
        decoder: bool = True,
        transition: bool = True,
        recognition: bool = True,
        warm_up: bool = False,
    ) -> None:
        """Gradient-free update with per-module toggles — ``VJF.update``
        (``vjf/model.py:156-177``). ``likelhood`` replicates the reference's
        misspelled kwarg; ``likelihood=`` is the corrected alias (wins when
        both given). ``decoder``/``recognition`` are accepted and ignored,
        exactly like the reference (no closed-form update exists for them).
        """
        cfg = self.cfg
        lik_on = likelhood if likelihood is None else likelihood
        del decoder, recognition
        y = jnp.atleast_2d(jnp.asarray(y, cfg.jdtype))
        xs = jnp.atleast_2d(jnp.asarray(xs, cfg.jdtype))
        xt = xs if xt is None else jnp.atleast_2d(jnp.asarray(xt, cfg.jdtype))
        if u is not None:
            u = jnp.atleast_2d(jnp.asarray(u, cfg.jdtype))

        state = self.state
        if lik_on and cfg.likelihood == "gaussian":
            from .models.likelihoods import gaussian_lik_update

            if py is None:
                from .models.decoder import decode

                py = decode(state.params.decoder, xt)
            new_lik, lik_n = gaussian_lik_update(
                state.params.likelihood, state.lik_n_sample, py, y,
                size_cap=cfg.obs_var_cap, logvar_clamp=cfg.logvar_clamp,
            )
            state = state._replace(
                params=state.params._replace(likelihood=new_lik),
                lik_n_sample=lik_n,
            )
        if transition:
            dynamics = core._transition(cfg).dynamics_update(
                cfg, state.dynamics, xt, xs, u, warm_up=warm_up
            )
            state = state._replace(dynamics=dynamics)
        self.state = state

    def filter_stream(
        self,
        chunks,
        *,
        warm_up: bool = False,
        valid_fn=None,
        controls=None,
        masks=None,
        channel_masks=None,
        chunks_per_dispatch: int = 1,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        resume_from: Optional[str] = None,
    ):
        """Stream chunks of observations through the fused filter-then-learn
        scan, carrying the posterior across chunk boundaries.

        Each chunk is a (chunk_len, batch, ydim) array (e.g. from
        :class:`vjf_tpu.native.StreamingLoader`); one compiled scan per
        chunk shape, host IO overlapping device compute when combined with
        ``vjf_tpu.native.device_prefetch``. Yields ``EpochResult`` per chunk
        (posterior means/logvars + per-step metrics). ``valid_fn()`` may
        report the number of valid steps in the latest chunk (a final
        partial chunk is truncated to it).

        ``controls``: iterable yielding one (chunk_len, B, udim) control
        array per chunk — REQUIRED when the model has ``udim > 0``
        (``VJF.filter``'s ``u``, chunked).

        ``masks`` / ``channel_masks``: optional iterables yielding one
        trial-validity mask ((chunk_len, B)) / missing-observation mask
        ((chunk_len, B, ydim) or (chunk_len, ydim)) per chunk — live
        electrode dropout or mid-stream trial dropout. Same semantics as
        ``fit(mask=..., channel_mask=...)``; masked ``y`` entries may be
        NaN. Mask presence must be stable across the stream (each
        combination compiles its own chunk trace).

        A chunk item may also be a ``(chunk, n_valid)`` pair — what
        ``device_prefetch(loader, valid_fn=...)`` yields — which carries
        the tail-chunk validity WITH the chunk (a consumer-side
        ``valid_fn()`` lags the producer when prefetching runs ahead).

        ``chunks_per_dispatch = K > 1`` is the production pipeline mode
        (the streaming analog of ``fit``'s ``epochs_per_dispatch``): K
        consecutive full chunks are stacked on device and run as ONE
        ``lax.scan`` dispatch (:func:`vjf_tpu.models.vjf.run_chunks`),
        the posterior carried across chunk boundaries device-side —
        amortizing the per-dispatch round-trip (the dominant cost of
        small-chunk streams over a high-latency link; measured >=2x at
        the streaming bench scale, docs/RESULTS.md). Results still yield
        ONE EpochResult per chunk, but their ``state`` field holds the
        block-FINAL state (intermediate per-chunk states are not
        materialized), and the hot-tau demotion check resolves once per
        K-block instead of once per chunk. A final short block (stream
        end or tail chunk) flushes through the one-chunk path.

        ``checkpoint_path`` + ``checkpoint_every=N``: persist the COMPLETE
        stream loop state (:class:`vjf_tpu.models.vjf.StreamSnapshot`:
        TrainState, PRNG chain, lr, posterior carry, demotion machinery,
        stream position) every >= N consumed chunks — at chunk boundaries
        (block boundaries in the K-block mode), atomically (single-file,
        fsync'd). ``resume_from``: path to such a snapshot; the resumed
        stream is BIT-identical to the uninterrupted one, including the
        K-block ``ns_prefix=0`` continuation contract. The caller
        re-positions ``chunks`` (and the side iterables) at
        ``StreamSnapshot.chunks_done`` — chunks before that index were
        already consumed by the saving run. ``warm_up``,
        ``chunks_per_dispatch``, and the config must match the saving run
        (validated). Snapshots embed a pickled treedef — load only
        trusted files (the ``torch.load`` trust model).
        """
        from itertools import repeat

        from .models import vjf as core

        if checkpoint_path is None and checkpoint_every > 0:
            raise ValueError("checkpoint_every requires checkpoint_path")
        if checkpoint_path is not None and checkpoint_every <= 0:
            raise ValueError(
                "checkpoint_path requires checkpoint_every = N > 0 chunks"
            )
        if chunks_per_dispatch > 1:
            yield from self._filter_stream_blocked(
                chunks, int(chunks_per_dispatch), warm_up=warm_up,
                valid_fn=valid_fn, controls=controls, masks=masks,
                channel_masks=channel_masks,
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every, resume_from=resume_from,
            )
            return

        cfg = self.cfg
        chunks_done = 0
        last_saved = 0
        resume_q = None
        resume_first_checked = False
        resume_pending = None
        resume_demoted = False
        if resume_from is not None:
            # restore BEFORE flags (decoder_frozen feeds them); leaves
            # stay numpy (jnp restore under x64-off rounds f64 host
            # scalars — the FitSnapshot lesson, CLAUDE.md perf notes)
            snap = core._load_stream_snapshot(cfg, resume_from, 1, warm_up)
            chunks_done = last_saved = int(np.asarray(snap.chunks_done))
            self.state = snap.state
            self.key = snap.key
            self._lr = float(np.asarray(snap.lr))
            self._decoder_frozen = bool(np.asarray(snap.decoder_frozen))
            if snap.q_mean is not None:
                resume_q = Gaussian(snap.q_mean, snap.q_logvar)
            resume_first_checked = bool(np.asarray(snap.first_checked))
            ph = float(np.asarray(snap.pending_hot))
            resume_pending = None if ph < 0 else ph
            resume_demoted = bool(np.asarray(snap.demoted))
        flags = StepFlags(
            sgd=True, update=True, warm_up=warm_up,
            train_decoder=not self._decoder_frozen,
        )
        run = jax.jit(core.run_epoch, static_argnames=("cfg", "flags"))
        q = resume_q
        # hot-tau demotion for streams (same policy as fit(): the mega
        # kernel soundly DROPS samples whose NSV trace bound exceeds the
        # escalation ceiling, so a pervasively hot stream regime — measured
        # on a 30k-step drifting-Poisson soak: ~83% of steps dropped —
        # must fall back to the XLA epoch or the dynamics silently stop
        # learning from most of the data)
        mega_guard = cfg.fused_epoch == "mega"
        if resume_demoted:
            # the saving run had demoted the stream to the XLA path —
            # a regime property, carried so resume stays bit-exact
            cfg = cfg.replace(fused_step="off")
            mega_guard = False
        # The first eligible chunk is checked SYNCHRONOUSLY (hot regimes are
        # a physics property of the update size — B=1 SGP is hot from step
        # one — so they show on the first chunk) and re-run on the XLA path
        # if hot. Later chunks resolve their check one chunk LATE: the
        # device-side hot fraction is fetched only after the next chunk has
        # been dispatched, so the ~26 ms tunnel round-trip overlaps device
        # compute instead of serializing the host-IO/compute pipeline. A
        # mid-stream regime change therefore trains up to two chunks on the
        # lossy-but-sound mega path (skipped samples, consistent state)
        # before the demotion sticks — logged when it happens.
        first_checked = resume_first_checked
        pending_hot = resume_pending           # device scalar, prev chunk
        if cfg.udim > 0 and controls is None:
            raise ValueError(
                f"filter_stream: the model has udim={cfg.udim} — pass "
                "`controls=` (one (chunk_len, B, udim) array per chunk)"
            )

        def _maybe_save():
            nonlocal last_saved
            if (checkpoint_path is None
                    or chunks_done - last_saved < checkpoint_every):
                return
            from .utils.checkpoint import save_ensemble_checkpoint

            snap = core._make_stream_snapshot(
                self.cfg, chunks_done, self.state, self.key, self._lr, q,
                warm_up, self._decoder_frozen,
                demoted=(cfg.fused_step == "off"
                         and self.cfg.fused_step != "off"),
                first_checked=first_checked,
                pending_hot=(None if pending_hot is None
                             else float(pending_hot)),
                k_block=1,
            )
            save_ensemble_checkpoint(checkpoint_path, snap)
            last_saved = chunks_done
        u_it = iter(controls) if controls is not None else repeat(None)
        m_it = iter(masks) if masks is not None else repeat(None)
        cm_it = iter(channel_masks) if channel_masks is not None else repeat(None)

        def _final_hot_check(pending):
            # the deferred check resolves one chunk LATE; when the stream
            # ends first, the last mega-path chunk's hot fraction would
            # otherwise never be fetched — pervasive sample-dropping in
            # that chunk must still be reported (nothing left to demote)
            if pending is None:
                return
            hot_frac = float(pending)
            if hot_frac > cfg.demote_hot_frac:
                logger.warning(
                    "streaming filter: %.1f%% of the last mega-path "
                    "chunk's steps exceeded the Newton-Schulz escalation "
                    "ceiling (samples dropped; the stream ended before "
                    "demotion could apply) — re-run that chunk with "
                    "fused_step='off' if its updates matter.",
                    100 * hot_frac,
                )

        for chunk in chunks:
            n_valid_item = None
            if isinstance(chunk, tuple):          # (chunk, n_valid) pair
                chunk, n_valid_item = chunk
            # device_put in the WIRE dtype (uint8 spike counts ride the
            # host->device tunnel at 1/4 the f32 bytes — the dominant cost
            # of streaming through a remote runtime); run_epoch upcasts to
            # cfg.jdtype on device, inside the jitted graph
            chunk = core.wire_put(chunk, cfg.jdtype)
            t_len, n_batch = chunk.shape[0], chunk.shape[1]
            uc, m, cm = self._stream_side_next(
                chunk, u_it, m_it, cm_it, controls, masks, channel_masks
            )
            n_valid = (
                n_valid_item if n_valid_item is not None
                else valid_fn() if valid_fn is not None else t_len
            )
            if n_valid < t_len:
                q, tail_res = self._stream_tail(chunk, uc, m, cm, n_valid,
                                                warm_up, q)
                if tail_res is not None:
                    yield tail_res
                _final_hot_check(pending_hot)
                return
            us = (
                uc if uc is not None
                else jnp.zeros((t_len, n_batch, 0), dtype=cfg.jdtype)
            )
            self.key, k = jax.random.split(self.key)
            result = run(
                cfg, flags, self.state, chunk, us, k,
                jnp.asarray(self._lr, cfg.jdtype), q0=q,
                mask=m, channel_mask=cm,
            )
            if pending_hot is not None:
                # resolve the PREVIOUS chunk's check now that this chunk is
                # already in flight (the fetch overlaps device compute)
                hot_frac, pending_hot = float(pending_hot), None
                if hot_frac > cfg.demote_hot_frac:
                    logger.warning(
                        "streaming filter: %.1f%% of the previous chunk's "
                        "steps exceeded the Newton-Schulz escalation "
                        "ceiling (samples dropped there and possibly in "
                        "the chunk now in flight); demoting subsequent "
                        "chunks to the XLA epoch.", 100 * hot_frac,
                    )
                    cfg = cfg.replace(fused_step="off")
                    mega_guard = False
            if (
                mega_guard
                and not warm_up
                and result.metrics.tau is not None
                and result.metrics.tau.shape[0] > cfg.ns_prefix
            ):
                tau_seg = result.metrics.tau[cfg.ns_prefix:]
                hot = jnp.mean((tau_seg >= NS_TAU_MAX).astype(jnp.float32))
                if first_checked:
                    pending_hot = hot          # fetched next iteration
                else:
                    first_checked = True
                    hot_frac = float(hot)
                    if hot_frac > cfg.demote_hot_frac:
                        logger.warning(
                            "streaming filter: %.1f%% of this chunk's steps "
                            "exceeded the Newton-Schulz escalation ceiling "
                            "(samples dropped); demoting subsequent chunks "
                            "to the XLA epoch and re-running this chunk.",
                            100 * hot_frac,
                        )
                        cfg = cfg.replace(fused_step="off")
                        mega_guard = False
                        result = run(
                            cfg, flags, self.state, chunk, us, k,
                            jnp.asarray(self._lr, cfg.jdtype), q0=q,
                            mask=m, channel_mask=cm,
                        )
            self.state = result.state
            q = Gaussian(result.q_means[-1], result.q_logvars[-1])
            chunks_done += 1
            _maybe_save()
            yield result
        _final_hot_check(pending_hot)

    def _stream_side_next(self, chunk, u_it, m_it, cm_it,
                          controls, masks, channel_masks):
        """Advance the per-chunk side iterables (controls / masks /
        channel_masks) in lockstep with the chunk stream and promote them —
        shared by the one-chunk and K-block streaming paths. Raises if a
        side stream runs out early (silently training the remaining chunks
        without it would also recompile the chunk trace).

        Host (numpy) side arrays are promoted SHAPE-only, staying on the
        host in their WIRE dtype — masks as 0/1 uint8 (1/4-1/8 the f32/f64
        bytes), controls host-downcast to the compute dtype if wider,
        never upcast. They ride to the device inside the jitted call (one
        transfer at wire width; ``run_epoch`` upcasts on device) or, in
        the K-block path, as one stacked block put — per-chunk eager
        ``device_put``s serialize against in-flight compute on a tunneled
        runtime (measured ~5x their idle cost, CLAUDE.md trap 20).
        Already-device arrays promote as before."""
        from .models import vjf as core

        cfg = self.cfg
        t_len, n_batch = chunk.shape[0], chunk.shape[1]
        uc = next(u_it, _EXHAUSTED) if controls is not None else None
        m = next(m_it, _EXHAUSTED) if masks is not None else None
        cm = next(cm_it, _EXHAUSTED) if channel_masks is not None else None
        if uc is _EXHAUSTED or m is _EXHAUSTED or cm is _EXHAUSTED:
            which = (
                "controls" if uc is _EXHAUSTED
                else "masks" if m is _EXHAUSTED else "channel_masks"
            )
            raise ValueError(
                f"filter_stream: the `{which}` iterable ran out before "
                "the chunk stream — provide one item per chunk"
            )
        if uc is not None:
            if isinstance(uc, np.ndarray):
                if uc.dtype.itemsize > np.dtype(cfg.jdtype).itemsize:
                    uc = np.asarray(uc, dtype=cfg.jdtype)
                if uc.ndim == 2:
                    uc = uc[:, None, :]
                if uc.shape[1] != n_batch:
                    uc = np.broadcast_to(
                        uc, (t_len, n_batch, uc.shape[-1])
                    )
            else:
                uc = core._promote_u(uc, t_len, n_batch, cfg.jdtype)
        if m is not None:
            if isinstance(m, np.ndarray):
                # nonzero -> 1 preserves the bool semantics filter_step
                # applies (a plain uint8 cast would turn 0.5 into 0).
                # Fractional values would change meaning on this wire
                # (device arrays keep them as weights) — refuse instead
                # of silently coercing (r4 advisor finding).
                if m.dtype.kind == "f" and not np.isin(
                    m[np.isfinite(m)], (0.0, 1.0)
                ).all():
                    raise ValueError(
                        "filter_stream: numpy masks must be binary 0/1 "
                        "(the uint8 wire format cannot carry fractional "
                        "weights); pass a jax array to use weights"
                    )
                m = np.not_equal(m, 0).astype(np.uint8)
                if m.ndim == 1:
                    m = m[:, None]
                if m.shape != (t_len, n_batch):
                    m = np.broadcast_to(m, (t_len, n_batch))
            else:
                m = core._promote_mask(m, t_len, n_batch, cfg.jdtype)
        if cm is not None:
            if isinstance(cm, np.ndarray):
                if cm.dtype.kind == "f" and not np.isin(
                    cm[np.isfinite(cm)], (0.0, 1.0)
                ).all():
                    raise ValueError(
                        "filter_stream: numpy channel_masks must be "
                        "binary 0/1 (the uint8 wire format cannot carry "
                        "fractional weights); pass a jax array to use "
                        "weights"
                    )
                cm = np.not_equal(cm, 0).astype(np.uint8)
                if cm.ndim == 2:
                    cm = cm[:, None, :]
                if cm.shape != tuple(chunk.shape):
                    cm = np.broadcast_to(cm, tuple(chunk.shape))
            else:
                cm = core._promote_channel_mask(cm, chunk.shape, cfg.jdtype)
        return uc, m, cm

    def _stream_tail(self, chunk, uc, m, cm, n_valid, warm_up, q):
        """Per-step flush of a partial tail chunk (train on the valid
        prefix only, still yield its truncated results — the r1 advisor
        finding) — shared by both streaming paths. Returns ``(q, result
        | None)``."""
        from .models import vjf as core

        if n_valid == 0:
            return q, None
        q_means, q_logvars, per_step = [], [], []
        for t in range(n_valid):
            q, loss, recon, dyn, ent = self.filter(
                chunk[t], u=uc[t] if uc is not None else None,
                qs=q, warm_up=warm_up, verbose=True,
                mask=m[t] if m is not None else None,
                channel_mask=cm[t] if cm is not None else None,
            )
            q_means.append(q.mean)
            q_logvars.append(q.logvar)
            per_step.append((loss, recon, dyn, ent))
        metrics = core.Metrics(
            *(jnp.stack([m_[i] for m_ in per_step]) for i in range(4))
        )
        return q, core.EpochResult(
            state=self.state,
            q_means=jnp.stack(q_means),
            q_logvars=jnp.stack(q_logvars),
            metrics=metrics,
        )

    def _filter_stream_blocked(
        self,
        chunks,
        k_block: int,
        *,
        warm_up: bool,
        valid_fn,
        controls,
        masks,
        channel_masks,
        checkpoint_path=None,
        checkpoint_every: int = 0,
        resume_from=None,
    ):
        """K-chunk pipeline mode of :meth:`filter_stream` (see its
        docstring): stack K full chunks, one ``run_chunks`` scan dispatch,
        posterior carried device-side; leftovers and the tail chunk flush
        through single dispatches / the per-step loop."""
        from itertools import repeat

        from .models import vjf as core

        cfg = self.cfg
        chunks_done = 0
        last_saved = 0
        resume_q = None
        resume_first_checked = False
        resume_pending = None
        resume_demoted = False
        if resume_from is not None:
            snap = core._load_stream_snapshot(cfg, resume_from, k_block,
                                              warm_up)
            chunks_done = last_saved = int(np.asarray(snap.chunks_done))
            self.state = snap.state
            self.key = snap.key
            self._lr = float(np.asarray(snap.lr))
            self._decoder_frozen = bool(np.asarray(snap.decoder_frozen))
            if snap.q_mean is not None:
                resume_q = Gaussian(snap.q_mean, snap.q_logvar)
            resume_first_checked = bool(np.asarray(snap.first_checked))
            ph = float(np.asarray(snap.pending_hot))
            resume_pending = None if ph < 0 else ph
            resume_demoted = bool(np.asarray(snap.demoted))
        flags = StepFlags(
            sgd=True, update=True, warm_up=warm_up,
            train_decoder=not self._decoder_frozen,
        )
        run_blk = jax.jit(core.run_chunks, static_argnames=("cfg", "flags"))
        run_one = jax.jit(core.run_epoch, static_argnames=("cfg", "flags"))
        q = resume_q
        mega_guard = cfg.fused_epoch == "mega"
        if resume_demoted:
            cfg = cfg.replace(fused_step="off")
            mega_guard = False
        first_checked = resume_first_checked
        pending_hot = resume_pending
        if cfg.udim > 0 and controls is None:
            raise ValueError(
                f"filter_stream: the model has udim={cfg.udim} — pass "
                "`controls=` (one (chunk_len, B, udim) array per chunk)"
            )
        u_it = iter(controls) if controls is not None else repeat(None)
        m_it = iter(masks) if masks is not None else repeat(None)
        cm_it = iter(channel_masks) if channel_masks is not None else repeat(None)

        def _resolve_pending():
            nonlocal pending_hot, cfg, mega_guard
            if pending_hot is None:
                return
            hot_frac, pending_hot = float(pending_hot), None
            if hot_frac > cfg.demote_hot_frac:
                logger.warning(
                    "streaming filter (K-block): %.1f%% of the previous "
                    "block's post-prefix steps exceeded the Newton-Schulz "
                    "escalation ceiling (samples dropped); demoting "
                    "subsequent blocks to the XLA epoch.", 100 * hot_frac,
                )
                cfg = cfg.replace(fused_step="off")
                mega_guard = False

        def _maybe_save():
            # block-boundary-only saves (buf empty when called): resume
            # re-forms blocks from the boundary, preserving the key-split
            # and ns_prefix=0 continuation contract exactly
            nonlocal last_saved
            if (checkpoint_path is None
                    or chunks_done - last_saved < checkpoint_every):
                return
            from .utils.checkpoint import save_ensemble_checkpoint

            snap = core._make_stream_snapshot(
                self.cfg, chunks_done, self.state, self.key, self._lr, q,
                warm_up, self._decoder_frozen,
                demoted=(cfg.fused_step == "off"
                         and self.cfg.fused_step != "off"),
                first_checked=first_checked,
                pending_hot=(None if pending_hot is None
                             else float(pending_hot)),
                k_block=k_block,
            )
            save_ensemble_checkpoint(checkpoint_path, snap)
            last_saved = chunks_done

        def _flush_block(buf):
            """One run_chunks dispatch over len(buf) <= k_block chunks.

            Blocks always CONTINUE a stream (the first chunk runs alone,
            below), so the per-step exact-inverse prefix is skipped
            (``ns_prefix=0`` — pure mega): the carried NSV pair is already
            contracted, and the per-block hot-tau check still guards a
            regime change (measured: the prefix cost ~26% of every chunk
            for protection only the stream's FIRST chunk needs)."""
            nonlocal q, first_checked, pending_hot, cfg, mega_guard
            nonlocal chunks_done
            cfg_blk = cfg.replace(ns_prefix=0)
            if all(isinstance(b[0], np.ndarray) for b in buf):
                # host chunks: ONE stacked wire-dtype transfer per block —
                # K small puts contend with in-flight compute for the
                # tunnel (measured: per-chunk puts under load cost ~5x
                # their idle time); one large put amortizes the round-trip
                # and compresses better
                ys_blk = core.wire_put(np.stack([b[0] for b in buf]),
                                       cfg.jdtype)
            else:
                ys_blk = jnp.stack([b[0] for b in buf])
            us_blk = (
                jnp.stack([b[1] for b in buf]) if buf[0][1] is not None
                else jnp.zeros(
                    ys_blk.shape[:3] + (0,), dtype=cfg.jdtype
                )
            )
            m_blk = (
                jnp.stack([b[2] for b in buf]) if buf[0][2] is not None
                else None
            )
            cm_blk = (
                jnp.stack([b[3] for b in buf]) if buf[0][3] is not None
                else None
            )
            self.key, k = jax.random.split(self.key)
            ks = jax.random.split(k, len(buf))
            res = run_blk(
                cfg_blk, flags, self.state, ys_blk, us_blk, ks,
                jnp.asarray(self._lr, cfg.jdtype), q0=q,
                masks=m_blk, channel_masks=cm_blk,
            )
            _resolve_pending()   # previous block's check (overlaps compute)
            if mega_guard and not warm_up and res.metrics.tau is not None:
                pending_hot = res.hot_frac       # fetched next block
            self.state = res.state
            q = Gaussian(res.q_last.mean, res.q_last.logvar)
            # advance + save BEFORE yielding: a consumer that abandons
            # the generator mid-block must still find the boundary
            # snapshot on disk
            chunks_done += len(buf)
            _maybe_save()
            for i in range(len(buf)):
                yield core.EpochResult(
                    state=self.state,
                    q_means=res.q_means[i],
                    q_logvars=res.q_logvars[i],
                    metrics=jax.tree.map(lambda a: a[i], res.metrics),
                )

        buf = []
        tail = None
        for chunk in chunks:
            n_valid_item = None
            if isinstance(chunk, tuple):
                chunk, n_valid_item = chunk
            # NOTE: no eager per-chunk wire_put here — host chunks ride to
            # the device as ONE stacked block transfer in _flush_block
            # (fewer tunnel round-trips; puts during in-flight compute
            # serialize against it); already-device chunks (e.g. from
            # device_prefetch) pass through and stack on device.
            t_len, n_batch = chunk.shape[0], chunk.shape[1]
            uc, m, cm = self._stream_side_next(
                chunk, u_it, m_it, cm_it, controls, masks, channel_masks
            )
            n_valid = (
                n_valid_item if n_valid_item is not None
                else valid_fn() if valid_fn is not None else t_len
            )
            if n_valid < t_len:
                tail = (chunk, uc, m, cm, n_valid)
                break
            if not first_checked:
                # the stream's FIRST chunk runs alone with the full
                # exact-inverse prefix (fresh-state tau is large by
                # construction) and a SYNCHRONOUS hot check — a hot
                # regime is workload physics and shows immediately
                us1 = (
                    uc if uc is not None
                    else jnp.zeros((t_len, n_batch, 0), dtype=cfg.jdtype)
                )
                chunk = core.wire_put(chunk, cfg.jdtype)
                self.key, k = jax.random.split(self.key)
                result = run_one(
                    cfg, flags, self.state, chunk, us1, k,
                    jnp.asarray(self._lr, cfg.jdtype), q0=q, mask=m,
                    channel_mask=cm,
                )
                first_checked = True
                if (
                    mega_guard and not warm_up
                    and result.metrics.tau is not None
                    and t_len > cfg.ns_prefix
                ):
                    tau_seg = result.metrics.tau[cfg.ns_prefix:]
                    hot_frac = float(jnp.mean(
                        (tau_seg >= NS_TAU_MAX).astype(jnp.float32)))
                    if hot_frac > cfg.demote_hot_frac:
                        logger.warning(
                            "streaming filter (K-block): %.1f%% of the "
                            "first chunk's steps exceeded the Newton-Schulz "
                            "escalation ceiling; demoting the stream to the "
                            "XLA epoch and re-running the chunk.",
                            100 * hot_frac,
                        )
                        cfg = cfg.replace(fused_step="off")
                        mega_guard = False
                        result = run_one(
                            cfg, flags, self.state, chunk, us1, k,
                            jnp.asarray(self._lr, cfg.jdtype), q0=q, mask=m,
                            channel_mask=cm,
                        )
                self.state = result.state
                q = Gaussian(result.q_means[-1], result.q_logvars[-1])
                chunks_done += 1
                _maybe_save()
                yield result
                continue
            buf.append((chunk, uc, m, cm))
            if len(buf) == k_block:
                yield from _flush_block(buf)
                buf = []

        # leftover full chunks (stream ended mid-block): one smaller block
        if buf:
            yield from _flush_block(buf)
            buf = []

        # tail chunk: per-step valid prefix (never train on padding)
        if tail is not None:
            chunk, uc, m, cm, n_valid = tail
            q, tail_res = self._stream_tail(chunk, uc, m, cm, n_valid,
                                            warm_up, q)
            if tail_res is not None:
                yield tail_res

        if pending_hot is not None:
            hot_frac = float(pending_hot)
            if hot_frac > cfg.demote_hot_frac:
                logger.warning(
                    "streaming filter (K-block): %.1f%% of the last "
                    "block's post-prefix steps exceeded the Newton-Schulz "
                    "escalation ceiling (samples dropped; the stream ended "
                    "before demotion could apply) — re-run that block with "
                    "fused_step='off' if its updates matter.", 100 * hot_frac,
                )

    # -- batch training ---------------------------------------------------
    def fit(
        self,
        y: Array,
        u: Optional[Array] = None,
        *,
        max_iter: int = 200,
        beta: Optional[float] = None,
        rtol: Optional[float] = None,
        verbose: bool = False,
        callback=None,
        epochs_per_dispatch: int = 1,
        mask: Optional[Array] = None,
        channel_mask: Optional[Array] = None,
        mesh=None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        resume_from: Optional[str] = None,
    ) -> Tuple[Array, Array, float]:
        """Epoch training with warm-up — ``VJF.fit`` (``vjf/model.py:223-307``).

        ``beta``/``rtol`` default to ``cfg.beta``/``cfg.rtol`` when None
        (the cfg defaults match the reference's 0.1 / 1e-4) — so a model
        built with e.g. ``make_model(..., rtol=2e-3)`` keeps its plateau
        tolerance here rather than having it silently shadowed.

        ``epochs_per_dispatch > 1`` enables the block-dispatch production
        mode: K epochs per device round-trip (dispatch-latency-amortized;
        phase transitions at block granularity — see ``models/vjf.py``).

        ``mask``: optional (T,) / (T, B) 0/1 trial-validity mask for
        RAGGED trials (unequal lengths, padded to a common T — beyond the
        reference, which trains only lockstep batches). Masked entries
        contribute nothing (loss / gradients / RLS / noise updates /
        bootstrap), their posterior carry freezes, and padding values are
        ignored entirely.

        ``channel_mask``: optional (T, ydim) / (T, B, ydim) 0/1
        missing-observation mask (electrode dropout): masked entries drop
        out of the likelihood/noise updates, the recognition input sees
        the model's imputation, and missing ``y`` values may be NaN.
        Composes with ``mask``. Both masks ride the fused/mega kernels
        where those are enabled.

        ``mesh``: optional ``jax.sharding.Mesh`` — multi-chip training in
        one call (trials shard over ``dp``; the fused kernel runs inside
        ``shard_map`` with one sufficient-statistics psum; masks
        included). See ``models.vjf.fit``.

        RAGGED CONVENIENCE: ``y`` may be a *list* of (T_i, ydim) trials of
        unequal lengths — they are zero-padded to a common T and the trial
        mask is built automatically (``utils.ragged.pad_trials``). ``u``
        and ``channel_mask`` must then be per-trial lists too (or None),
        and ``mask`` must not be given. List in, list out: the returned
        posterior means/log-variances are per-trial (T_i, xdim) lists.

        :return: (posterior means (T, B, xdim), log-variances, final loss);
            per-trial lists when ``y`` is a list of trials
        """
        lengths = None
        if isinstance(y, (list, tuple)):
            from .utils.ragged import pad_trials, split_trials

            if mask is not None:
                raise ValueError(
                    "fit: pass EITHER a list of trials (mask built "
                    "automatically) OR a padded array + mask, not both"
                )
            for name, v in (("u", u), ("channel_mask", channel_mask)):
                if v is not None and not isinstance(v, (list, tuple)):
                    raise ValueError(
                        f"fit: y is a list of trials, so {name} must be a "
                        "per-trial list (or None)"
                    )
            padded = pad_trials(y, us=u, channel_masks=channel_mask)
            y, u, mask, channel_mask = (
                padded.y, padded.u, padded.mask, padded.channel_mask,
            )
            lengths = padded.lengths
        if callback is None and verbose:
            from .utils import progress_callback

            callback = progress_callback(verbose=True, total=max_iter)
        self.key, k = jax.random.split(self.key)
        result = core.fit(
            self.cfg,
            self.state,
            y,
            u,
            key=k,
            max_iter=max_iter,
            beta=beta,
            rtol=rtol,
            callback=callback,
            epochs_per_dispatch=epochs_per_dispatch,
            mask=mask,
            channel_mask=channel_mask,
            mesh=mesh,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every,
            resume_from=resume_from,
            # continue the ExponentialLR schedule across fit() calls (the
            # reference's scheduler is instance state, vjf/model.py:69-78)
            lr0=self._lr,
        )
        self.state = result.state
        if not result.warm_up:
            self._decoder_frozen = True
        # carry the ExponentialLR schedule position forward so subsequent
        # filter()/fit() calls (and save()) see the decayed lr, not the
        # construction-time cfg.lr
        import math

        if math.isfinite(result.lr):
            self._lr = float(result.lr)
        # epochs ACTUALLY run (early plateau convergence stops before
        # max_iter) — the honest divisor for any steps/s computed around
        # this call (CLAUDE.md: steps/s divides by epochs_run)
        self.epochs_run = int(result.epochs_run)
        # cfg.select='forecast': which epoch's snapshot was adopted (None
        # under select='loss' or if warm-up never ended) and its metric
        self.selected_epoch = result.selected_epoch
        self.selected_metric = result.selected_metric
        if lengths is not None:
            from .utils.ragged import split_trials

            return (
                split_trials(result.mu, lengths),
                split_trials(result.logvar, lengths),
                result.loss,
            )
        return result.mu, result.logvar, result.loss

    def fit_ensemble(
        self,
        y: Array,
        u: Optional[Array] = None,
        *,
        n_models: int,
        max_iter: int = 200,
        beta: Optional[float] = None,
        rtol: Optional[float] = None,
        callback=None,
        mask: Optional[Array] = None,
        channel_mask: Optional[Array] = None,
        mesh=None,
        seed: Optional[int] = None,
        epochs_per_dispatch: int = 1,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        resume_from: Optional[str] = None,
    ):
        """Train ``n_models`` INDEPENDENT models (fresh seeds, this model's
        config) in one dispatch stream — the productized multi-chip regime
        (seed ensembles / per-subject sweeps; docs/ARCHITECTURE.md §4).
        This instance is the config template; its own state is untouched.

        ``epochs_per_dispatch = K > 1``: the blocked production mode — K
        epochs per member per device round-trip, phase transitions at
        block boundaries (the ensemble analog of
        ``fit(epochs_per_dispatch=K)``; dominant win for small-batch
        sweeps, which are dispatch-latency-bound).

        Each member runs the full per-member ``fit`` state machine
        (warm-up plateau, decoder freeze, bootstrap, convergence patience,
        lr schedule — ``vjf/model.py:223-307`` semantics, members
        transitioning independently; see ``parallel.fit_ensemble``).

        ``y``: (T, B, ydim) shared data or (N, T, B, ydim) per member.
        ``mesh``: optional Mesh sharding the MEMBER axis across chips
        (zero collectives). Returns ``(result, members)`` — the
        :class:`~vjf_tpu.parallel.ensemble.EnsembleFitResult` and a list
        of ``n_models`` fitted :class:`VJF` instances ready for
        ``forecast``/``filter``/``evaluate``.
        """
        from .parallel import fit_ensemble as _fit_ensemble
        from .parallel import init_ensemble

        if seed is None:
            self.key, k_base = jax.random.split(self.key)
        else:
            k_base = jax.random.PRNGKey(seed)
        k_init, k_fit = jax.random.split(k_base)
        states = init_ensemble(k_init, self.cfg, n_models)
        result = _fit_ensemble(
            self.cfg, states, y, u, key=k_fit, max_iter=max_iter,
            beta=beta, rtol=rtol, callback=callback, mask=mask,
            channel_mask=channel_mask, mesh=mesh, lr0=self._lr,
            epochs_per_dispatch=epochs_per_dispatch,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, resume_from=resume_from,
        )
        members = []
        for i in range(n_models):
            m = object.__new__(VJF)
            m.cfg = self.cfg
            m.key = jax.random.fold_in(k_base, i + 1)
            m.state = jax.tree.map(lambda x: x[i], result.states)
            m._step_fn = self._step_fn
            m._lr = float(result.lr[i])
            m.epochs_run = int(result.epochs_run[i])
            m._decoder_frozen = not bool(result.warm_up[i])
            members.append(m)
        return result, members

    # -- generation -------------------------------------------------------
    def forecast(
        self,
        x0: Array,
        u: Optional[Array] = None,
        n_step: int = 1,
        *,
        noise: bool = False,
    ) -> Tuple[Array, Array]:
        """Autoregressive rollout + decode — ``VJF.forecast``
        (``vjf/model.py:321-324``)."""
        self.key, k = jax.random.split(self.key)
        x0 = jnp.asarray(x0, dtype=self.cfg.jdtype)
        if u is not None:
            u = jnp.asarray(u, dtype=self.cfg.jdtype)
        return core.forecast(
            self.cfg, self.state, x0, k, n_step=n_step, u=u, noise=noise
        )

    # -- post-hoc smoothing (capability beyond the reference) -------------
    def smooth(self, y: Array, x_ref: Optional[Array] = None,
               channel_mask: Optional[Array] = None, mesh=None,
               u: Optional[Array] = None):
        """Parallel-in-time RTS smoothing under the trained model —
        O(log T) depth via the associative-scan Kalman core
        (``models/smoothing.py``). Gaussian likelihoods use the
        linearized dynamics directly; Poisson dispatches to the
        iterated-Laplace variant. Returns ``(filtered, smoothed)`` result
        pytrees with per-step means/covariances. ``x_ref`` sets the
        dynamics linearization: a single ``(xdim,)`` point (default:
        origin) or a reference trajectory such as the filter's posterior
        means (per-step affine dynamics, transition into step t
        linearized at ``x_ref[t-1]``).

        ``y`` may be one (T, ydim) sequence or a (T, B, ydim) trial batch
        — the batch smooths in ONE vmapped dispatch
        (``smoothing.smooth_batch``; ``x_ref`` then (T, B, xdim), results
        gain a trial axis), optionally sharded over ``mesh`` (trials on
        ``dp``, zero collectives).

        ``u``: control inputs — REQUIRED when the model has ``udim > 0``
        (the velocity features run over ``cat(x, u)``); ``(T, udim)`` for
        one sequence, ``(T, B, udim)`` per-trial (or ``(T, udim)`` shared)
        for a batch. ``u[t]`` drives the transition into step t, matching
        ``filter``'s alignment.

        ``channel_mask``: optional (T, ydim) 0/1 missing-observation mask
        — masked entries drop out of the update exactly (infinite
        observation variance, zero Kalman gain); their stored values may
        be NaN. (T, B, ydim) for per-trial masks on a batch.
        """
        from .models import smoothing

        if not hasattr(y, "ndim"):      # host-side; wire ingest downstream
            y = np.asarray(y)
        if y.ndim == 3:
            return smoothing.smooth_batch(
                self.cfg, self.state, y, x_ref=x_ref,
                channel_mask=channel_mask, mesh=mesh, us=u,
            )
        return smoothing.smooth(
            self.cfg, self.state, y, x_ref=x_ref,  # wire ingest in smooth()
            channel_mask=channel_mask, us=u,
        )

    # -- held-out evaluation (capability beyond the reference) ------------
    def evaluate(self, y: Array, heldout, x_ref: Optional[Array] = None,
                 u: Optional[Array] = None, n_iter: Optional[int] = None,
                 mesh=None, channel_mask: Optional[Array] = None):
        """Co-smoothing evaluation (``models/evaluate.py``): infer latents
        from the observed channels only (``heldout`` masked out of the
        smoother exactly) and score the predictive log-likelihood of the
        held-out channels the model never saw — the standard protocol for
        latent population models on real data, where no true latent exists
        to compare against. Returns a :class:`HeldoutEval` with ``loglik``
        vs the constant-rate null, ``bits_per_spike`` (Poisson), prediction
        ``r2``, the predicted rates/means, and the smoothed latents.

        ``y``: (T, ydim) or a (T, B, ydim) trial batch (one vmapped
        dispatch, optionally sharded over ``mesh``). ``heldout``: int
        channel indices or a boolean (ydim,) mask. ``u`` required when
        ``udim > 0`` (see :meth:`smooth`). ``channel_mask``: optional
        observed-entry 0/1 mask for recordings with electrode dropout —
        composes with ``heldout`` (inference sees observed AND not held
        out; scores run over observed held-out entries only).
        """
        from .models import evaluate as EV

        return EV.heldout_eval(
            self.cfg, self.state, y, heldout, x_ref=x_ref, us=u,
            n_iter=n_iter, mesh=mesh, channel_mask=channel_mask,
        )

    def evaluate_kfold(self, y: Array, n_folds: int = 5, seed: int = 0,
                       **kwargs):
        """Population-level co-smoothing: rotate :meth:`evaluate` over
        ``n_folds`` disjoint channel folds so every channel is scored by a
        smoother that never saw it (``models/evaluate.py:
        kfold_channel_eval``). Returns a :class:`KFoldEval` with per-fold
        results and pooled scores. ``kwargs`` as in :meth:`evaluate`
        (``u`` maps to the core's ``us``)."""
        from .models import evaluate as EV

        if "u" in kwargs:
            kwargs["us"] = kwargs.pop("u")
        return EV.kfold_channel_eval(
            self.cfg, self.state, y, n_folds=n_folds, seed=seed, **kwargs
        )

    # -- persistence (capability beyond the reference) --------------------
    # The reference cannot checkpoint: its regression state and counters are
    # plain attributes invisible to state_dict() (vjf/module.py:46-54,
    # vjf/likelihood.py:17). Here the whole model — device state pytree AND
    # the facade's host-side phase (lr, decoder freeze, RNG key) — round-
    # trips exactly, so a fit() can resume mid-training.
    _BLR_BACKENDS = {
        "PrecisionBLR": "precision",
        "CovarianceBLR": "covariance",
        "NSVBLR": "nsv",
    }

    def save(self, path: str) -> None:
        """Checkpoint the complete model to ``path`` (orbax directory, or
        ``<path>.npz`` + sidecars where orbax is unavailable)."""
        from .utils.checkpoint import FitLoopState, save_checkpoint

        # pin a resolved 'auto' backend so load() rebuilds the same pytree
        # structure regardless of the original batch_hint/backend override
        backend = self._BLR_BACKENDS.get(
            type(self.state.dynamics.blr).__name__, self.cfg.rls_backend
        )
        loop = FitLoopState(
            epoch=0,
            lr=float(self._lr),
            warm_up=not self._decoder_frozen,
            running_loss=float("nan"),
            key=self.key,
        )
        save_checkpoint(
            path, self.state, cfg=self.cfg.replace(rls_backend=backend), loop=loop
        )

    @classmethod
    def load(cls, path: str) -> "VJF":
        """Restore a model saved with :meth:`save`; filtering/fit resume
        bit-identically (state, learning-rate schedule position, decoder
        freeze, RNG key)."""
        from .utils.checkpoint import FitLoopState, load_checkpoint, load_config

        cfg = load_config(path)
        model = cls(cfg)
        loop_template = FitLoopState(
            epoch=0, lr=0.0, warm_up=True, running_loss=0.0, key=model.key
        )
        state, loop = load_checkpoint(path, model.state, loop_template)
        model.state = state
        if loop is not None:
            model._lr = loop.lr
            model._decoder_frozen = not loop.warm_up
            model.key = jnp.asarray(loop.key)
        return model

    # -- velocity field (used by the example's streamplot) ----------------
    def velocity(self, x: Array) -> Array:
        """Mean velocity field at query points — the example script's
        ``model.transition.velocity(grid)`` (``script/example.py:68``)."""
        x = jnp.atleast_2d(jnp.asarray(x, dtype=self.cfg.jdtype))
        g = core._transition(self.cfg).transition_gaussian(self.state.dynamics, x, None, 0.0)
        return g.mean - x
