"""Checkpoint exactness: the whole TrainState pytree round-trips bit-exactly
(fixing the reference's structural inability to checkpoint — SURVEY.md §5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.utils.checkpoint import (
    FitLoopState,
    load_checkpoint,
    load_config,
    save_checkpoint,
)


def _trained_state(key, cfg):
    state = core.init_state(key, cfg)
    T, B = 10, 2
    ys = jax.random.normal(key, (T, B, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((T, B, 0), dtype=jnp.float64)
    out = core.run_epoch(cfg, StepFlags(), state, ys, us, key, jnp.asarray(1e-3))
    return out.state


@pytest.mark.parametrize("backend", ["precision", "nsv"])
def test_roundtrip_exact(tmp_path, key, backend):
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64", rls_backend=backend)
    state = _trained_state(key, cfg)
    loop = FitLoopState(epoch=7, lr=3e-4, warm_up=False, running_loss=1.25, key=key)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, cfg=cfg, loop=loop)
    restored, rloop = load_checkpoint(path, state, loop)

    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert rloop.epoch == 7 and rloop.warm_up is False
    assert rloop.lr == pytest.approx(3e-4)

    cfg2 = load_config(path)
    assert cfg2 == cfg


def test_resume_continues_identically(tmp_path, key):
    """Training 2 epochs straight == training 1, checkpointing, resuming 1."""
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    T, B = 10, 2
    ys = jax.random.normal(key, (T, B, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((T, B, 0), dtype=jnp.float64)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), dtype=jnp.float64)
    flags = StepFlags()
    lr = jnp.asarray(1e-3)

    def epoch(st):
        return core.run_epoch(cfg, flags, st, ys, us, key, lr, noise=(eps[0], eps[1])).state

    straight = epoch(epoch(state))

    mid = epoch(state)
    path = str(tmp_path / "mid")
    save_checkpoint(path, mid)
    mid_restored, _ = load_checkpoint(path, mid)
    resumed = epoch(mid_restored)

    for a, b in zip(jax.tree_util.tree_leaves(straight), jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_facade_save_load_roundtrip(tmp_path):
    """VJF.save/VJF.load round-trips the whole model — device state AND the
    facade's host-side phase (lr schedule position, decoder freeze, RNG
    key) — so filtering continues bit-identically after restore."""
    from vjf_tpu.api import VJF

    rng = np.random.default_rng(0)
    y = rng.normal(size=(30, 2, 6)).astype(np.float64)

    model = VJF.make_model(6, 2, n_rbf=8, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64",
                           rls_backend="auto", fused_step="off")
    model.fit(y, max_iter=6, rtol=1e9)  # plateau fires -> decoder freezes
    assert model._decoder_frozen
    model._lr = 5e-4  # distinguishable schedule position

    path = str(tmp_path / "facade")
    model.save(path)
    loaded = VJF.load(path)

    assert loaded._decoder_frozen is True
    assert loaded._lr == pytest.approx(5e-4)
    # 'auto' backend pinned to the resolved concrete backend
    assert type(loaded.state.dynamics.blr).__name__ == type(model.state.dynamics.blr).__name__
    for a, b in zip(jax.tree_util.tree_leaves(model.state),
                    jax.tree_util.tree_leaves(loaded.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(model.key), np.asarray(loaded.key))

    # identical RNG + state => identical continued filtering
    y_t = rng.normal(size=(2, 6))
    q1, l1 = model.filter(y_t)
    q2, l2 = loaded.filter(y_t)
    np.testing.assert_array_equal(np.asarray(q1.mean), np.asarray(q2.mean))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_facade_save_load_sgp(tmp_path):
    """Facade round-trip with the SGP dynamics variant (different state
    pytree: inducing points, whitener, kernel hypers)."""
    from vjf_tpu.api import VJF

    rng = np.random.default_rng(1)
    y = rng.normal(size=(20, 1, 5)).astype(np.float64)
    model = VJF.make_model(5, 2, dynamics="sgp", n_inducing=8,
                           hidden_sizes=[4], likelihood="gaussian",
                           dtype="float64", fused_step="off")
    model.fit(y, max_iter=3)
    path = str(tmp_path / "sgp")
    model.save(path)
    loaded = VJF.load(path)
    for a, b in zip(jax.tree_util.tree_leaves(model.state),
                    jax.tree_util.tree_leaves(loaded.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    q1, l1 = model.filter(y[-1])
    q2, l2 = loaded.filter(y[-1])
    np.testing.assert_array_equal(np.asarray(q1.mean), np.asarray(q2.mean))


def test_partial_orbax_dir_falls_back_to_npz(tmp_path, key, monkeypatch):
    """A mid-save orbax failure must not strand an unloadable PARTIAL
    directory: save_checkpoint removes it before writing the .npz
    fallback, and load_checkpoint prefers a complete sibling .npz over
    an orbax directory it cannot restore (e.g. truncated by a killed
    process)."""
    import os

    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64")
    state = _trained_state(key, cfg)
    path = str(tmp_path / "ckpt")

    # simulate orbax dying after it created the directory
    import vjf_tpu.utils.checkpoint as ck

    class _BoomCkpt:
        def save(self, p, payload, force=False):
            os.makedirs(p, exist_ok=True)
            with open(os.path.join(p, "partial"), "w") as f:
                f.write("truncated")
            raise RuntimeError("disk full mid-save")

    try:
        import orbax.checkpoint as ocp
        monkeypatch.setattr(ocp, "PyTreeCheckpointer", lambda: _BoomCkpt())
    except ImportError:
        pytest.skip("orbax not installed — fallback is the only path")

    save_checkpoint(path, state, cfg=cfg)
    assert not os.path.isdir(path)            # partial dir removed
    assert os.path.exists(path + ".npz")      # complete fallback written
    restored, _ = load_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load side: a broken dir NEXT TO a valid npz must still load
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "junk"), "w") as f:
        f.write("not a checkpoint")
    restored2, _ = load_checkpoint(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_one_shot_rls_bounded_in_low_precision():
    """one_shot_rls must route EVERY low-precision PrecisionBLR (f32 AND
    bf16) through the eigh-floored solve — the incremental rls's explicit
    triangular inverse blows up ~cond^2 on an ill-conditioned pooled
    bootstrap Gram (|w| ~ 2e23 observed in f32; bf16 is strictly worse)."""
    from vjf_tpu.models import regression

    rng = np.random.default_rng(0)
    n, nf = 400, 32
    base = rng.normal(size=(n, 4))
    feat = (base @ rng.normal(size=(4, nf)) +
            1e-4 * rng.normal(size=(n, nf)))      # rank-4 + tiny noise
    target = rng.normal(size=(n, 3))
    for dt in (jnp.float32, jnp.bfloat16):
        st = regression.init_precision(nf, 3, dtype=dt)
        out = regression.one_shot_rls(
            st, jnp.asarray(feat, dt), jnp.asarray(target, dt),
            jnp.asarray(0.1, dt), jitter=1e-3,
        )
        w = np.asarray(out.w_mean, np.float64)
        assert np.all(np.isfinite(w)), dt
        assert np.max(np.abs(w)) < 1e3, (dt, np.max(np.abs(w)))


# ---------------------------------------------------------------------------
# Ensemble checkpoint / resume (round 4)
# ---------------------------------------------------------------------------


def _ens_setup(select="forecast"):
    from vjf_tpu.parallel import init_ensemble

    rng = np.random.default_rng(3)
    th = np.cumsum(0.15 + 0.01 * rng.normal(size=60))
    x = np.stack([np.cos(th), np.sin(th)], axis=-1)
    C = rng.normal(size=(8, 2))
    y = (x @ C.T)[:, None, :] + 0.1 * rng.normal(size=(60, 2, 8))
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64", rtol=1e-9,
                    warmup_max=3, select=select, select_horizon=8,
                    select_starts=4)
    states = init_ensemble(jax.random.PRNGKey(1), cfg, 3)
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    return cfg, states, y, keys


def _assert_ens_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a.states),
                      jax.tree_util.tree_leaves(b.states)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(a.mu), np.asarray(b.mu))
    np.testing.assert_array_equal(np.asarray(a.logvar), np.asarray(b.logvar))
    np.testing.assert_array_equal(a.loss, b.loss)
    np.testing.assert_array_equal(a.warm_up, b.warm_up)
    np.testing.assert_array_equal(a.lr, b.lr)
    np.testing.assert_array_equal(a.epochs_run, b.epochs_run)
    if a.selected_epoch is not None or b.selected_epoch is not None:
        np.testing.assert_array_equal(a.selected_epoch, b.selected_epoch)
        np.testing.assert_array_equal(a.selected_metric, b.selected_metric)


def test_ensemble_resume_bit_exact(tmp_path):
    """A fit interrupted at epoch 4 and resumed equals the uninterrupted
    fit BIT-exactly, per member — every loop variable (phases, plateau
    counters, lr schedule, member key chains, selection tracker) rides
    the snapshot."""
    from vjf_tpu.parallel import fit_ensemble

    cfg, states, y, keys = _ens_setup()
    full = fit_ensemble(cfg, states, y, keys=keys, max_iter=8)
    p = str(tmp_path / "ens")
    fit_ensemble(cfg, states, y, keys=keys, max_iter=4,
                 checkpoint_path=p, checkpoint_every=4)
    resumed = fit_ensemble(cfg, states, y, keys=keys, max_iter=8,
                           resume_from=p)
    assert full.selected_epoch is not None  # the tracker round-tripped
    _assert_ens_equal(full, resumed)


def test_ensemble_resume_blocked_bit_exact(tmp_path):
    """Blocked-mode resume: snapshots land on block boundaries; resuming
    with the same epochs_per_dispatch replays bit-exactly."""
    from vjf_tpu.parallel import fit_ensemble

    cfg, states, y, keys = _ens_setup(select="loss")
    full = fit_ensemble(cfg, states, y, keys=keys, max_iter=8,
                        epochs_per_dispatch=2)
    p = str(tmp_path / "ensb")
    fit_ensemble(cfg, states, y, keys=keys, max_iter=4,
                 epochs_per_dispatch=2, checkpoint_path=p,
                 checkpoint_every=4)
    resumed = fit_ensemble(cfg, states, y, keys=keys, max_iter=8,
                           epochs_per_dispatch=2, resume_from=p)
    _assert_ens_equal(full, resumed)


def test_ensemble_resume_validates_compatibility(tmp_path):
    """A mismatched resume (different epochs_per_dispatch / member count /
    config) must ERROR, not silently break the bit-exact contract."""
    from vjf_tpu.parallel import fit_ensemble, init_ensemble

    cfg, states, y, keys = _ens_setup(select="loss")
    p = str(tmp_path / "ens")
    fit_ensemble(cfg, states, y, keys=keys, max_iter=4,
                 checkpoint_path=p, checkpoint_every=4)
    with pytest.raises(ValueError, match="epochs_per_dispatch"):
        fit_ensemble(cfg, states, y, keys=keys, max_iter=8,
                     epochs_per_dispatch=2, resume_from=p)
    with pytest.raises(ValueError, match="different .*config"):
        fit_ensemble(cfg.replace(lr=2e-4), states, y, keys=keys,
                     max_iter=8, resume_from=p)
    states3 = init_ensemble(jax.random.PRNGKey(1), cfg, 2)
    with pytest.raises(ValueError, match="members"):
        fit_ensemble(cfg, states3, y, keys=jax.random.split(
            jax.random.PRNGKey(2), 2), max_iter=8, resume_from=p)


def _solo_setup(select="forecast"):
    rng = np.random.default_rng(3)
    th = np.cumsum(0.15 + 0.01 * rng.normal(size=60))
    x = np.stack([np.cos(th), np.sin(th)], axis=-1)
    C = rng.normal(size=(8, 2))
    y = (x @ C.T)[:, None, :] + 0.1 * rng.normal(size=(60, 2, 8))
    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64", rtol=1e-9,
                    warmup_max=3, select=select, select_horizon=8,
                    select_starts=4)
    return cfg, y


def _assert_fit_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a.state),
                      jax.tree_util.tree_leaves(b.state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(a.mu), np.asarray(b.mu))
    np.testing.assert_array_equal(np.asarray(a.logvar), np.asarray(b.logvar))
    assert a.loss == b.loss and a.warm_up == b.warm_up
    np.testing.assert_allclose(a.lr, b.lr, rtol=1e-15)
    assert a.epochs_run == b.epochs_run
    assert a.selected_epoch == b.selected_epoch
    if a.selected_epoch is not None:
        np.testing.assert_allclose(a.selected_metric, b.selected_metric,
                                   rtol=1e-12)


def test_solo_fit_resume_bit_exact(tmp_path, key):
    """The solo mirror of the ensemble resume contract: a fit interrupted
    at epoch 4 and resumed equals the uninterrupted fit bit-exactly —
    phase, plateau machine, lr schedule, PRNG chain, and the
    forecast-selection snapshot all ride the FitSnapshot."""
    cfg, y = _solo_setup()
    state = core.init_state(key, cfg)
    full = core.fit(cfg, state, y, key=key, max_iter=8, donate=False)
    p = str(tmp_path / "solo")
    core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
             checkpoint_path=p, checkpoint_every=4)
    resumed = core.fit(cfg, state, y, key=key, max_iter=8, donate=False,
                       resume_from=p)
    assert full.selected_epoch is not None
    _assert_fit_equal(full, resumed)
    # resume at max_iter: nothing to run, snapshot outputs returned
    done = core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
                    resume_from=p)
    assert done.epochs_run == 4 and np.isfinite(done.loss)


def test_solo_fit_resume_blocked_bit_exact(tmp_path, key):
    cfg, y = _solo_setup(select="loss")
    state = core.init_state(key, cfg)
    full = core.fit(cfg, state, y, key=key, max_iter=8,
                    epochs_per_dispatch=2)
    p = str(tmp_path / "solob")
    core.fit(cfg, state, y, key=key, max_iter=4, epochs_per_dispatch=2,
             checkpoint_path=p, checkpoint_every=4)
    resumed = core.fit(cfg, state, y, key=key, max_iter=8,
                       epochs_per_dispatch=2, resume_from=p)
    _assert_fit_equal(full, resumed)


def test_solo_fit_resume_validates(tmp_path, key):
    cfg, y = _solo_setup(select="loss")
    state = core.init_state(key, cfg)
    p = str(tmp_path / "solo")
    core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
             checkpoint_path=p, checkpoint_every=4)
    with pytest.raises(ValueError, match="different config"):
        core.fit(cfg.replace(lr=5e-4), state, y, key=key, max_iter=8,
                 resume_from=p)
    with pytest.raises(ValueError, match="mutually exclusive"):
        core.fit(cfg, state, y, key=key, max_iter=8, resume_from=p,
                 noise_hook=lambda e: None)
    # an ENSEMBLE snapshot must be rejected, not mis-restored
    from vjf_tpu.parallel import fit_ensemble, init_ensemble

    cfg_e, states, ye, keys_e = _ens_setup(select="loss")
    pe = str(tmp_path / "ens")
    fit_ensemble(cfg_e, states, ye, keys=keys_e, max_iter=4,
                 checkpoint_path=pe, checkpoint_every=4)
    with pytest.raises(ValueError, match="not a solo-fit snapshot"):
        core.fit(cfg, state, y, key=key, max_iter=8, resume_from=pe)


def test_solo_resume_rejects_mismatched_k_block(tmp_path, key):
    cfg, y = _solo_setup(select="loss")
    state = core.init_state(key, cfg)
    p = str(tmp_path / "solo")
    core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
             checkpoint_path=p, checkpoint_every=4)
    with pytest.raises(ValueError, match="epochs_per_dispatch"):
        core.fit(cfg, state, y, key=key, max_iter=8,
                 epochs_per_dispatch=2, resume_from=p)
    # the reverse direction: ensemble rejects a solo snapshot
    from vjf_tpu.parallel import fit_ensemble, init_ensemble

    cfg_e, states, ye, keys_e = _ens_setup(select="loss")
    with pytest.raises(ValueError, match="not a fit_ensemble"):
        fit_ensemble(cfg_e, states, ye, keys=keys_e, max_iter=4,
                     resume_from=p)


def test_solo_resume_masked_sgp_cfg_rewrite(tmp_path, key):
    """The snapshot digests the RESOLVED cfg: a masked small-batch SGP fit
    (whose cfg is rewritten to fused_step='off' inside fit) must be
    resumable with the caller's original cfg — the review-r4 ordering bug
    made this raise 'saved under a different config'."""
    rng = np.random.default_rng(0)
    T, B = 40, 2
    y = rng.normal(size=(T, B, 6)).astype(np.float64)
    mask = np.ones((T, B)); mask[30:, 1] = 0.0
    cfg = VJFConfig(ydim=6, xdim=2, udim=0, dynamics="sgp", n_inducing=8,
                    likelihood="gaussian", dtype="float64",
                    rls_backend="nsv", fused_step="auto", rtol=1e-9,
                    warmup_max=2)
    state = core.init_state(key, cfg)
    p = str(tmp_path / "sgp")
    full = core.fit(cfg, state, y, key=key, max_iter=6, mask=mask,
                    donate=False)
    core.fit(cfg, state, y, key=key, max_iter=3, mask=mask, donate=False,
             checkpoint_path=p, checkpoint_every=3)
    resumed = core.fit(cfg, state, y, key=key, max_iter=6, mask=mask,
                       donate=False, resume_from=p)
    for a, b in zip(jax.tree_util.tree_leaves(full.state),
                    jax.tree_util.tree_leaves(resumed.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_bit_exact_without_x64(tmp_path):
    """Production mode runs with x64 DISABLED — the conftest forces x64,
    so this drives a subprocess: snapshot restore must not round the
    float64 host scalars (lr, running losses, metrics) through f32
    (review-r4 finding: a jnp-based restore did exactly that)."""
    import subprocess
    import sys as _sys

    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from vjf_tpu.config import VJFConfig
from vjf_tpu.models import vjf as core

assert not jax.config.jax_enable_x64
rng = np.random.default_rng(3)
th = np.cumsum(0.15 + 0.01 * rng.normal(size=60))
x = np.stack([np.cos(th), np.sin(th)], axis=-1)
C = rng.normal(size=(8, 2))
y = ((x @ C.T)[:, None, :] + 0.1 * rng.normal(size=(60, 2, 8))).astype(np.float32)
cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                likelihood="gaussian", dtype="float32", rtol=1e-9,
                warmup_max=3, select="forecast", select_horizon=8,
                select_starts=4)
key = jax.random.PRNGKey(0)
state = core.init_state(key, cfg)
full = core.fit(cfg, state, y, key=key, max_iter=8, donate=False)
p = {str(tmp_path / 'f32ck')!r}
core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
         checkpoint_path=p, checkpoint_every=4)
res = core.fit(cfg, state, y, key=key, max_iter=8, donate=False,
               resume_from=p)
for a, b in zip(jax.tree_util.tree_leaves(full.state),
                jax.tree_util.tree_leaves(res.state)):
    assert np.array_equal(np.asarray(a), np.asarray(b)), "state diverged"
assert full.selected_epoch == res.selected_epoch
assert full.selected_metric == res.selected_metric
assert full.lr == res.lr and full.loss == res.loss
print("F32_RESUME_OK")
"""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run([_sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "F32_RESUME_OK" in out.stdout, (out.stdout, out.stderr[-2000:])

