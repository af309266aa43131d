"""Multi-device tests on the virtual 8-device CPU mesh: the sharded epoch
must (a) run with real collectives, and (b) agree numerically with the
single-device epoch — the shared-dynamics invariant (every shard applies
the same RLS update) is exactly what equality checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjf_tpu.config import StepFlags, VJFConfig
from vjf_tpu.models import vjf as core
from vjf_tpu.parallel import make_mesh, make_sharded_epoch, shard_data, shard_state


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis_names=("dp", "tp"))


def _setup(key, B=16, T=12, ydim=8):
    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    ys = jax.random.normal(key, (T, B, ydim), dtype=jnp.float64)
    us = jnp.zeros((T, B, 0), dtype=jnp.float64)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), dtype=jnp.float64)
    return cfg, state, ys, us, eps


def test_sharded_epoch_matches_single_device(key, mesh8):
    cfg, state, ys, us, eps = _setup(key)
    flags = StepFlags()
    lr = jnp.asarray(1e-3)

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr, noise=(eps[0], eps[1]))

    def fn(st, y_, u_, e0, e1):
        return core.run_epoch(cfg, flags, st, y_, u_, key, lr, noise=(e0, e1))

    from vjf_tpu.parallel.sharded import control_sharding, data_sharding, state_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P

    st_sh = state_shardings(cfg, state, mesh8)
    eps_sh = NamedSharding(mesh8, P(None, "dp", None))
    sharded = jax.jit(
        fn,
        in_shardings=(st_sh, data_sharding(mesh8, cfg.ydim),
                      control_sharding(mesh8), eps_sh, eps_sh),
    )
    got = sharded(state, ys, us, eps[0], eps[1])

    np.testing.assert_allclose(
        np.asarray(got.metrics.loss), np.asarray(ref.metrics.loss), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got.q_means), np.asarray(ref.q_means), rtol=1e-8, atol=1e-10
    )
    # dynamics state identical across shards and vs single-device
    np.testing.assert_allclose(
        np.asarray(got.state.dynamics.blr.w_mean),
        np.asarray(ref.state.dynamics.blr.w_mean),
        rtol=1e-8, atol=1e-12,
    )


def test_make_sharded_epoch_runs(key, mesh8):
    cfg, state, ys, us, _ = _setup(key, B=8)
    flags = StepFlags(warm_up=True)
    state = shard_state(cfg, state, mesh8)
    ys, us = shard_data(mesh8, ys, us)
    epoch = make_sharded_epoch(cfg, flags, mesh8, donate=False)
    out = epoch(state, ys, us, key, jnp.asarray(1e-3))
    assert np.all(np.isfinite(np.asarray(out.metrics.loss)))
    # decoder rows sharded over tp
    dec_sh = out.state.params.decoder.w.sharding
    assert "tp" in str(dec_sh.spec) or dec_sh.is_fully_replicated


def test_mesh_construction():
    m = make_mesh(8, axis_names=("dp", "tp"))
    assert m.shape["dp"] * m.shape["tp"] == 8
    m1 = make_mesh(8, axis_names=("dp",))
    assert m1.shape["dp"] == 8


def test_ensemble_vmap_and_shard(key, mesh8):
    """N independent filters as one vmap; model axis sharded across the
    mesh with zero collectives (docs/ARCHITECTURE.md §4 scaling regime b)."""
    from vjf_tpu.parallel import init_ensemble, run_epoch_ensemble, shard_ensemble

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    likelihood="gaussian", dtype="float64")
    N, T, B = 4, 8, 2
    states = init_ensemble(key, cfg, N)
    ys = jax.random.normal(key, (N, T, B, cfg.ydim), dtype=jnp.float64)
    us = jnp.zeros((N, T, B, 0), dtype=jnp.float64)
    keys = jax.random.split(key, N)

    out = run_epoch_ensemble(cfg, StepFlags(), states, ys, us, keys, jnp.asarray(1e-3))
    assert out.metrics.loss.shape == (N, T)
    assert np.all(np.isfinite(np.asarray(out.metrics.loss)))
    # members are genuinely independent: different losses
    losses = np.asarray(out.metrics.loss)
    assert not np.allclose(losses[0], losses[1])

    # member 0 alone == member 0 in the ensemble (pure-function vmap)
    single = core.run_epoch(
        cfg, StepFlags(),
        jax.tree.map(lambda x: x[0], states), ys[0], us[0], keys[0], jnp.asarray(1e-3),
    )
    np.testing.assert_allclose(np.asarray(single.metrics.loss), losses[0],
                               rtol=1e-9, atol=1e-12)

    # shard the model axis over the mesh and run again
    mesh1d = make_mesh(4, axis_names=("dp",))
    sharded_states = shard_ensemble(states, mesh1d)
    out2 = run_epoch_ensemble(cfg, StepFlags(), sharded_states,
                              jax.device_put(ys, jax.sharding.NamedSharding(mesh1d, jax.sharding.PartitionSpec("dp"))),
                              us, keys, jnp.asarray(1e-3))
    np.testing.assert_allclose(np.asarray(out2.metrics.loss), losses, rtol=1e-9)


def test_ensemble_vmap_fused_path(key):
    """f32 ensembles on TPU engage the fused path *inside* the vmap
    (fused_enabled checks dtype/backend only), so the pallas kernels must
    be batchable: vmapped member i == standalone member i, through BOTH
    layouts (per-step prefix kernel AND the grid-over-time mega segment —
    ns_prefix < T forces the mega pallas_call under vmap). Verified on-chip
    (max loss diff 2e-6); this pins the same property in interpret mode."""
    from vjf_tpu.parallel import init_ensemble, run_epoch_ensemble

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    matmul_dtype="float32", fused_step="on", ns_prefix=4)
    N, T, B = 2, 16, 3
    states = init_ensemble(key, cfg, N)
    ys = jax.random.normal(key, (N, T, B, cfg.ydim), dtype=jnp.float32)
    us = jnp.zeros((N, T, B, 0), dtype=jnp.float32)
    keys = jax.random.split(key, N)

    flags = StepFlags(sgd=True, update=True, warm_up=False, train_decoder=False)
    out = run_epoch_ensemble(cfg, flags, states, ys, us, keys, jnp.asarray(1e-2, jnp.float32))
    losses = np.asarray(out.metrics.loss)
    assert losses.shape == (N, T)
    assert np.all(np.isfinite(losses))

    single = core.run_epoch(
        cfg, flags,
        jax.tree.map(lambda x: x[0], states), ys[0], us[0], keys[0],
        jnp.asarray(1e-2, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(single.metrics.loss), losses[0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.map(lambda x: x[0], out.state.dynamics.blr.precision)),
        np.asarray(single.state.dynamics.blr.precision), rtol=2e-4, atol=2e-4)


def test_sharded_fused_epoch_matches_single_device_fused(key, mesh8):
    """VERDICT r1 item 2: the fused kernel under shard_map. Per-device
    phase-1 kernel (forward + local sums) + ONE psum of the FusedSums
    pytree + replicated apply must equal the single-device fused epoch,
    including the stats-based exact-inverse fallback."""
    from vjf_tpu.ops.pallas import fused_step as F
    from vjf_tpu.parallel.sharded import run_epoch_fused_sharded

    cfg = VJFConfig(ydim=12, xdim=3, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 40, 16
    ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    dp_mesh = make_mesh(8, axis_names=("dp",))
    got = run_epoch_fused_sharded(cfg, flags, state, ys, us, key, lr, dp_mesh,
                                  noise=(eps[0], eps[1]), interpret=True)
    ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags, state,
                            ys, us, key, lr, noise=(eps[0], eps[1]),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.q_means), np.asarray(ref.q_means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.cov),
                               np.asarray(ref.state.dynamics.blr.cov),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.logvar),
                               np.asarray(ref.state.dynamics.logvar), rtol=1e-4)


def test_sharded_fused_sgp_epoch_matches_single_device(key, mesh8):
    """SGP dynamics through the shard_map-fused path: the whitened features
    are device-local, only the FusedSums psum crosses devices."""
    from vjf_tpu.ops.pallas import fused_step as F
    from vjf_tpu.parallel.sharded import run_epoch_fused_sharded

    cfg = VJFConfig(ydim=12, xdim=2, udim=0, dynamics="sgp", n_inducing=16,
                    sgp_scale=1.0, sgp_lengthscale=1.0, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 24, 16
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    dp_mesh = make_mesh(8, axis_names=("dp",))
    got = run_epoch_fused_sharded(cfg, flags, state, ys, us, key, lr, dp_mesh,
                                  noise=(eps[0], eps[1]), interpret=True)
    ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags, state,
                            ys, us, key, lr, noise=(eps[0], eps[1]),
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.state.dynamics.inducing),
                                  np.asarray(state.dynamics.inducing))


def test_make_sharded_epoch_routes_to_fused(key, mesh8):
    """make_sharded_epoch must take the shard_map-fused path when the
    kernel is eligible, and produce finite results end-to-end."""
    cfg = VJFConfig(ydim=12, xdim=3, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 12, 16
    ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    us = jnp.zeros((T, B, 0), jnp.float32)
    dp_mesh = make_mesh(8, axis_names=("dp",))
    epoch = make_sharded_epoch(cfg, StepFlags(), dp_mesh, donate=False)
    out = epoch(state, ys, us, key, jnp.asarray(1e-3, jnp.float32))
    assert np.all(np.isfinite(np.asarray(out.metrics.loss)))
    assert out.q_means.shape == (T, B, cfg.xdim)


def test_sharded_masked_epoch_matches_single_device(key, mesh8):
    """Ragged-trial mask under dp sharding: the mask rides the trial axis
    and the masked (renormalized) batch reductions still auto-insert the
    right collectives — sharded == single-device, bit-for-bit tolerance."""
    cfg, state, ys, us, eps = _setup(key)
    T, B = ys.shape[:2]
    # stagger trial lengths across the batch (several end early)
    mask = np.ones((T, B))
    for b in range(B):
        mask[max(4, T - 1 - b % 5):, b] = 0.0
    mask = jnp.asarray(mask, ys.dtype)
    flags = StepFlags()
    lr = jnp.asarray(1e-3)

    ref = core.run_epoch(cfg, flags, state, ys, us, key, lr,
                         noise=(eps[0], eps[1]), mask=mask)

    epoch = make_sharded_epoch(cfg, flags, mesh8, donate=False)
    # make_sharded_epoch draws its own noise from `key` — drive the
    # reference identically by comparing through the same entry instead
    ref2 = core.run_epoch(cfg, flags, state, ys, us, key, lr, mask=mask)
    got = epoch(state, ys, us, key, lr, mask=mask)

    np.testing.assert_allclose(
        np.asarray(got.metrics.loss), np.asarray(ref2.metrics.loss), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got.q_means), np.asarray(ref2.q_means), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(got.state.dynamics.blr.w_mean),
        np.asarray(ref2.state.dynamics.blr.w_mean),
        rtol=1e-8, atol=1e-12,
    )
    # sanity: masking actually changed the trajectory vs the unmasked run
    assert not np.allclose(np.asarray(ref.metrics.loss),
                           np.asarray(core.run_epoch(
                               cfg, flags, state, ys, us, key, lr,
                               noise=(eps[0], eps[1])).metrics.loss))


def test_sharded_channel_mask_matches_single_device(key, mesh8):
    """Missing-observation mask under dp sharding == single-device; also
    composes with the trial mask in the same sharded call."""
    cfg, state, ys, us, eps = _setup(key)
    T, B = ys.shape[:2]
    rng = np.random.default_rng(0)
    cm = jnp.asarray((rng.uniform(size=ys.shape) > 0.25).astype(np.float64))
    mask = np.ones((T, B)); mask[T - 3:, ::2] = 0.0
    mask = jnp.asarray(mask, ys.dtype)
    flags = StepFlags()
    lr = jnp.asarray(1e-3)

    epoch = make_sharded_epoch(cfg, flags, mesh8, donate=False)
    for kwargs in ({"channel_mask": cm}, {"channel_mask": cm, "mask": mask}):
        ref = core.run_epoch(cfg, flags, state, ys, us, key, lr, **kwargs)
        got = epoch(state, ys, us, key, lr, **kwargs)
        np.testing.assert_allclose(
            np.asarray(got.metrics.loss), np.asarray(ref.metrics.loss),
            rtol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(got.q_means), np.asarray(ref.q_means),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(got.state.dynamics.blr.w_mean),
            np.asarray(ref.state.dynamics.blr.w_mean),
            rtol=1e-8, atol=1e-12,
        )


def test_sharded_mask_promotion_matches_core(key, mesh8):
    """(T,) trial masks and (T, ydim) channel masks must get core.fit's
    promotion semantics on the sharded path too (a bare right-aligned
    broadcast_to raised for T != B — and would silently TRANSPOSE a time
    mask into a trial mask at T == B)."""
    cfg, state, ys, us, eps = _setup(key)
    T, B = ys.shape[:2]
    assert T != B  # the regression needs the asymmetric case
    t_mask = jnp.asarray(np.r_[np.ones(T - 4), np.zeros(4)], ys.dtype)  # (T,)
    rng = np.random.default_rng(5)
    ch_mask = jnp.asarray(
        (rng.uniform(size=(T, cfg.ydim)) > 0.3).astype(np.float64)
    )                                                                   # (T, ydim)
    flags = StepFlags()
    lr = jnp.asarray(1e-3)
    epoch = make_sharded_epoch(cfg, flags, mesh8, donate=False)

    full_t = jnp.broadcast_to(t_mask[:, None], (T, B))
    full_ch = jnp.broadcast_to(ch_mask[:, None, :], ys.shape)
    for raw, full in (({"mask": t_mask}, {"mask": full_t}),
                      ({"channel_mask": ch_mask}, {"channel_mask": full_ch})):
        ref = core.run_epoch(cfg, flags, state, ys, us, key, lr, **full)
        got = epoch(state, ys, us, key, lr, **raw)
        np.testing.assert_allclose(
            np.asarray(got.metrics.loss), np.asarray(ref.metrics.loss),
            rtol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(got.q_means), np.asarray(ref.q_means),
            rtol=1e-8, atol=1e-10,
        )


def test_sharded_fused_masked_epoch_matches_single_device(key, mesh8):
    """Ragged trial masks on the SHARDED fused path: each device's phase-1
    kernel renormalizes its masked local sums by the GLOBAL per-step valid
    count (computed outside the shard_map), so the psum + replicated apply
    must reproduce the single-device masked fused epoch — including NaN
    padding, shard-asymmetric valid counts, frozen carries, and
    count-gated RLS/noise counters."""
    from vjf_tpu.ops.pallas import fused_step as F
    from vjf_tpu.parallel.sharded import run_epoch_fused_sharded

    cfg = VJFConfig(ydim=12, xdim=3, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 40, 16
    ys = jax.random.poisson(key, 1.0, (T, B, cfg.ydim)).astype(jnp.float32)
    # ragged ends spread across shards (B=16 over 8 devices -> 2 per shard):
    # trial 1 ends at t=25, trial 9 at t=10, trial 15 at t=32 — local valid
    # counts differ per shard per step, so a local renormalization would
    # diverge from the global one
    mask = jnp.ones((T, B), jnp.float32)
    for trial, t_end in ((1, 25), (9, 10), (15, 32)):
        ys = ys.at[t_end:, trial].set(jnp.nan)
        mask = mask.at[t_end:, trial].set(0.0)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()

    dp_mesh = make_mesh(8, axis_names=("dp",))
    got = run_epoch_fused_sharded(cfg, flags, state, ys, us, key, lr, dp_mesh,
                                  noise=(eps[0], eps[1]), interpret=True,
                                  mask=mask)
    ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags, state,
                            ys, us, key, lr, noise=(eps[0], eps[1]),
                            interpret=True, mask=mask)
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.q_means), np.asarray(ref.q_means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.logvar),
                               np.asarray(ref.state.dynamics.logvar), rtol=1e-3)
    # counters advance by the GLOBAL valid count on both paths
    assert int(got.state.dynamics.n_sample) == int(ref.state.dynamics.n_sample)
    np.testing.assert_allclose(float(got.state.lik_n_sample),
                               float(ref.state.lik_n_sample), rtol=1e-6)
    # frozen carry over a dead trial's padding
    last = np.asarray(got.q_means[25 - 1, 1])
    np.testing.assert_array_equal(np.asarray(got.q_means[-1, 1]), last)


def test_make_sharded_epoch_routes_trial_mask_to_fused(key, mesh8):
    """make_sharded_epoch with a trial mask (no channel mask) on a
    fused-eligible f32 config routes to the sharded fused path and matches
    the single-device masked fused epoch (not just the XLA one)."""
    from vjf_tpu.ops.pallas import fused_step as F

    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 24, 16
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    ys = ys.at[15:, 3].set(jnp.nan)
    mask = jnp.ones((T, B), jnp.float32).at[15:, 3].set(0.0)
    us = jnp.zeros((T, B, 0), jnp.float32)
    flags = StepFlags()
    lr = jnp.asarray(1e-3, jnp.float32)

    dp_mesh = make_mesh(8, axis_names=("dp",))
    epoch = make_sharded_epoch(cfg, flags, dp_mesh, donate=False)
    got = epoch(state, ys, us, key, lr, mask=mask)
    # the sharded path with noise=None draws host threefry eps from `key`
    # (run_epoch_fused_sharded) — hand the identical stream to the
    # single-device reference (whose None default is in-kernel RNG)
    eps = jax.random.normal(key, (T, 2, B, cfg.xdim), jnp.float32)
    ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags, state,
                            ys, us, key, lr, interpret=True, mask=mask,
                            noise=(eps[:, 0], eps[:, 1]))
    np.testing.assert_allclose(np.asarray(got.metrics.loss),
                               np.asarray(ref.metrics.loss),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                               np.asarray(ref.state.dynamics.blr.w_mean),
                               rtol=2e-3, atol=2e-3)
    assert np.all(np.isfinite(np.asarray(got.q_means)))


def test_sharded_fused_channel_masked_epoch_matches_single_device(key, mesh8):
    """Channel masks (electrode dropout) on the SHARDED fused path: the
    (B, ydim) mask shards with the data, its cm_sum statistic rides the
    FusedSums psum, and the replicated apply reproduces the single-device
    channel-masked fused epoch — including the in-kernel imputation
    feedback, the per-observed-entry logvar constant, and the fractional
    obs-noise counts. Also exercises the combined trial+channel case."""
    from vjf_tpu.ops.pallas import fused_step as F
    from vjf_tpu.parallel.sharded import run_epoch_fused_sharded

    cfg = VJFConfig(ydim=12, xdim=3, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T, B = 30, 16
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    rng = np.random.default_rng(11)
    cm = jnp.asarray((rng.uniform(size=(T, B, cfg.ydim)) > 0.3).astype(np.float32))
    ys = jnp.where(cm > 0, ys, jnp.nan)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    flags = StepFlags()
    dp_mesh = make_mesh(8, axis_names=("dp",))

    # trial mask for the combined case: two ragged trials on different shards
    mask = jnp.ones((T, B), jnp.float32)
    ys_m = ys
    for trial, t_end in ((2, 18), (13, 9)):
        ys_m = ys_m.at[t_end:, trial].set(jnp.nan)
        mask = mask.at[t_end:, trial].set(0.0)

    for kw_s, kw_r, y_in in (
        ({"channel_mask": cm}, {"channel_mask": cm}, ys),
        ({"channel_mask": cm, "mask": mask},
         {"channel_mask": cm, "mask": mask}, ys_m),
    ):
        got = run_epoch_fused_sharded(cfg, flags, state, y_in, us, key, lr,
                                      dp_mesh, noise=(eps[0], eps[1]),
                                      interpret=True, **kw_s)
        ref = F.run_epoch_fused(cfg.replace(fused_epoch="stepwise"), flags,
                                state, y_in, us, key, lr,
                                noise=(eps[0], eps[1]), interpret=True,
                                **kw_r)
        label = str(sorted(kw_s))
        np.testing.assert_allclose(np.asarray(got.metrics.loss),
                                   np.asarray(ref.metrics.loss),
                                   rtol=5e-4, atol=5e-4, err_msg=label)
        np.testing.assert_allclose(np.asarray(got.q_means),
                                   np.asarray(ref.q_means),
                                   rtol=1e-3, atol=1e-3, err_msg=label)
        np.testing.assert_allclose(np.asarray(got.state.dynamics.blr.w_mean),
                                   np.asarray(ref.state.dynamics.blr.w_mean),
                                   rtol=2e-3, atol=2e-3, err_msg=label)
        np.testing.assert_allclose(
            np.asarray(got.state.params.likelihood.logvar),
            np.asarray(ref.state.params.likelihood.logvar),
            rtol=1e-4, err_msg=label)
        np.testing.assert_allclose(float(got.state.lik_n_sample),
                                   float(ref.state.lik_n_sample),
                                   rtol=1e-5, err_msg=label)


def test_fit_over_mesh_matches_single_device(key, mesh8):
    """fit(mesh=...): the whole host control loop (warm-up plateau forced
    at warmup_max, bootstrap, RLS epochs) dispatching every epoch through
    the sharded fused path must reproduce the single-device fit — same
    per-epoch keys, same threefry noise draws, one psum per step."""
    rng = np.random.default_rng(17)
    T, B = 60, 16
    t = np.arange(T) * 0.1
    lat = np.stack([np.sin(t[:, None] + rng.uniform(0, 6.3, B)),
                    np.cos(t[:, None] + rng.uniform(0, 6.3, B))], -1)
    C = rng.normal(size=(2, 10))
    y = (lat @ C + 0.1 * rng.normal(size=(T, B, 10))).astype(np.float32)

    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", lr=3e-3, rtol=1e-12,
                    warmup_max=3)
    state = core.init_state(key, cfg)
    dp_mesh = make_mesh(8, axis_names=("dp",))

    ref = core.fit(cfg, state, y, key=key, max_iter=6, donate=False)
    got = core.fit(cfg, state, y, key=key, max_iter=6, donate=False,
                   mesh=dp_mesh)
    assert got.epochs_run == ref.epochs_run
    assert got.warm_up == ref.warm_up
    # Single-EPOCH equivalence is pinned to 5e-4 by the tests above. Over
    # a multi-epoch FIT the co-adapting recognition/dynamics amplify the
    # sharded path's f32 drift (stats-identity MSE is cancellation-prone)
    # into a different — equally good — latent representation (the model
    # is identifiable only up to an affine latent map), so assert the
    # control flow, the loss, and AFFINE-ALIGNED latent agreement.
    from vjf_tpu.utils.evaluation import latent_r2

    np.testing.assert_allclose(got.loss, ref.loss, rtol=1e-2)
    r2 = latent_r2(np.asarray(got.mu).reshape(-1, 2),
                   np.asarray(ref.mu).reshape(-1, 2))
    assert r2 > 0.99, r2


def test_fit_over_mesh_masked(key, mesh8):
    """fit(mesh=...) with a ragged trial mask: the masked sharded fused
    epoch inside the full control loop (masked bootstrap pair weights
    included) trains finitely and freezes the dead trial's carry."""
    rng = np.random.default_rng(23)
    T, B, T2 = 60, 16, 35
    t = np.arange(T) * 0.1
    lat = np.stack([np.sin(t[:, None] + rng.uniform(0, 6.3, B)),
                    np.cos(t[:, None] + rng.uniform(0, 6.3, B))], -1)
    C = rng.normal(size=(2, 10))
    y = (lat @ C + 0.1 * rng.normal(size=(T, B, 10))).astype(np.float32)
    y[T2:, 5] = np.nan
    mask = np.ones((T, B), np.float32)
    mask[T2:, 5] = 0.0

    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", lr=3e-3, rtol=1e-12,
                    warmup_max=3)
    state = core.init_state(key, cfg)
    dp_mesh = make_mesh(8, axis_names=("dp",))
    res = core.fit(cfg, state, y, key=key, max_iter=6, donate=False,
                   mesh=dp_mesh, mask=mask)
    assert not res.warm_up
    assert np.isfinite(res.loss)
    mu = np.asarray(res.mu)
    assert np.all(np.isfinite(mu))
    np.testing.assert_array_equal(mu[-1, 5], mu[T2 - 1, 5])


def test_sharded_fused_2d_channel_mask_promotion_at_t_equals_b(key):
    """A (T, ydim) channel mask through run_epoch_fused_sharded must be
    promoted per-TIME (gain a batch axis), not right-aligned — at T == B a
    bare broadcast_to silently transposes it into a per-trial mask."""
    from vjf_tpu.ops.pallas import fused_step as F
    from vjf_tpu.parallel.sharded import run_epoch_fused_sharded

    cfg = VJFConfig(ydim=12, xdim=3, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="gaussian", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state = core.init_state(key, cfg)
    T = B = 8                                     # the transpose trap
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float32)
    rng = np.random.default_rng(3)
    cm2d = jnp.asarray(
        (rng.uniform(size=(T, cfg.ydim)) > 0.3).astype(np.float32))
    cm3d = jnp.broadcast_to(cm2d[:, None, :], ys.shape)   # correct promotion
    ys = jnp.where(cm3d > 0, ys, jnp.nan)
    us = jnp.zeros((T, B, 0), jnp.float32)
    eps = jax.random.normal(key, (2, T, B, cfg.xdim), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    dp_mesh = make_mesh(8, axis_names=("dp",))

    got = run_epoch_fused_sharded(cfg, StepFlags(), state, ys, us, key, lr,
                                  dp_mesh, noise=(eps[0], eps[1]),
                                  interpret=True, channel_mask=cm2d)
    ref = run_epoch_fused_sharded(cfg, StepFlags(), state, ys, us, key, lr,
                                  dp_mesh, noise=(eps[0], eps[1]),
                                  interpret=True, channel_mask=cm3d)
    np.testing.assert_array_equal(np.asarray(got.metrics.loss),
                                  np.asarray(ref.metrics.loss))
    np.testing.assert_array_equal(np.asarray(got.q_means),
                                  np.asarray(ref.q_means))


def test_sharded_fused_uint8_wire_matches_f32(key):
    """The integer wire-format contract holds on the SHARDED fused path:
    uint8 counts upcast to cfg.jdtype on device, bit-identical to f32
    input (previously jax.random.normal(..., ys.dtype) crashed)."""
    from vjf_tpu.parallel.sharded import make_sharded_epoch

    cfg = VJFConfig(ydim=12, xdim=3, udim=0, n_rbf=20, hidden_sizes=(10,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv",
                    fused_step="on", matmul_dtype="float32")
    state8 = core.init_state(key, cfg)
    state32 = jax.tree.map(jnp.copy, state8)
    T, B = 24, 16
    rng = np.random.default_rng(5)
    counts = rng.poisson(0.7, size=(T, B, cfg.ydim)).astype(np.uint8)
    us = jnp.zeros((T, B, 0), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    dp_mesh = make_mesh(8, axis_names=("dp",))
    epoch = make_sharded_epoch(cfg, StepFlags(), dp_mesh, donate=False)

    r8 = epoch(state8, jnp.asarray(counts), us, key, lr)
    r32 = epoch(state32, jnp.asarray(counts, jnp.float32), us, key, lr)
    np.testing.assert_array_equal(np.asarray(r8.metrics.loss),
                                  np.asarray(r32.metrics.loss))
    np.testing.assert_array_equal(np.asarray(r8.q_means),
                                  np.asarray(r32.q_means))


def _limit_cycle_data(seed=17, T=60, B=16, ydim=10, noise=0.1):
    rng = np.random.default_rng(seed)
    t = np.arange(T) * 0.1
    lat = np.stack([np.sin(t[:, None] + rng.uniform(0, 6.3, B)),
                    np.cos(t[:, None] + rng.uniform(0, 6.3, B))], -1)
    C = rng.normal(size=(2, ydim))
    return (lat @ C + noise * rng.normal(size=(T, B, ydim))).astype(np.float32)


def test_fit_over_mesh_blocked_matches_single_device(key, mesh8):
    """fit(mesh=..., epochs_per_dispatch=K): block dispatch composes with
    multi-chip — each block scans K sharded fused epochs device-side
    (make_sharded_epochs). Same per-block key splits as the single-device
    blocked fit, so control flow must match and latents must agree up to
    the sharded path's f32 reduction drift (affine-aligned R^2)."""
    y = _limit_cycle_data()
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", lr=3e-3, rtol=1e-12,
                    warmup_max=3)
    state = core.init_state(key, cfg)
    dp_mesh = make_mesh(8, axis_names=("dp",))

    ref = core.fit(cfg, state, y, key=key, max_iter=6, donate=False,
                   epochs_per_dispatch=3)
    got = core.fit(cfg, state, y, key=key, max_iter=6, donate=False,
                   epochs_per_dispatch=3, mesh=dp_mesh)
    assert got.epochs_run == ref.epochs_run
    assert got.warm_up == ref.warm_up
    np.testing.assert_allclose(got.loss, ref.loss, rtol=1e-2)
    from vjf_tpu.utils.evaluation import latent_r2

    r2 = latent_r2(np.asarray(got.mu).reshape(-1, 2),
                   np.asarray(ref.mu).reshape(-1, 2))
    assert r2 > 0.99, r2


def test_fit_over_mesh_blocked_xla_path(key, mesh8):
    """The non-fused (GSPMD-annotated run_epochs) arm of
    make_sharded_epochs: fused_step='off' routes the blocked mesh fit
    through jitted core.run_epochs with explicit in/out shardings."""
    y = _limit_cycle_data(seed=23)
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", fused_step="off",
                    matmul_dtype="float32", lr=3e-3, rtol=1e-12,
                    warmup_max=3)
    state = core.init_state(key, cfg)
    dp_mesh = make_mesh(8, axis_names=("dp",))

    ref = core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
                   epochs_per_dispatch=2)
    got = core.fit(cfg, state, y, key=key, max_iter=4, donate=False,
                   epochs_per_dispatch=2, mesh=dp_mesh)
    assert got.epochs_run == ref.epochs_run
    np.testing.assert_allclose(got.loss, ref.loss, rtol=1e-2)


def test_fit_over_mesh_blocked_masked(key, mesh8):
    """Ragged trial mask through the blocked mesh fit: the masked sharded
    fused epoch scans device-side, the dead trial's carry freezes, and the
    masked bootstrap still runs at the block boundary."""
    T, B, T2 = 60, 16, 35
    y = _limit_cycle_data(seed=29, T=T, B=B)
    y[T2:, 5] = np.nan
    mask = np.ones((T, B), np.float32)
    mask[T2:, 5] = 0.0
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", lr=3e-3, rtol=1e-12,
                    warmup_max=3)
    state = core.init_state(key, cfg)
    dp_mesh = make_mesh(8, axis_names=("dp",))

    res = core.fit(cfg, state, y, key=key, max_iter=6, donate=False,
                   epochs_per_dispatch=3, mesh=dp_mesh, mask=mask)
    assert not res.warm_up
    assert np.isfinite(res.loss)
    mu = np.asarray(res.mu)
    assert np.all(np.isfinite(mu))
    np.testing.assert_array_equal(mu[-1, 5], mu[T2 - 1, 5])


def test_fit_over_mesh_blocked_sgp(key, mesh8):
    """SGP dynamics through the blocked mesh fit: the sharded fused SGP
    epoch scans device-side and the slow-timescale hyperparameter adapt
    step consumes the block's dp-sharded posterior means."""
    y = _limit_cycle_data(seed=31, T=40, B=16)
    cfg = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=16, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32", dynamics="sgp",
                    rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", lr=3e-3, rtol=1e-12,
                    warmup_max=2, sgp_adapt_lr=0.05)
    state = core.init_state(key, cfg)
    dp_mesh = make_mesh(8, axis_names=("dp",))
    res = core.fit(cfg, state, y, key=key, max_iter=6, donate=False,
                   mesh=dp_mesh, epochs_per_dispatch=3)
    assert not res.warm_up
    assert np.isfinite(res.loss)
    assert np.all(np.isfinite(np.asarray(res.mu)))


def test_sync_every_single_device_identity(key):
    """Relaxed sync on a 1-device mesh is (numerically) the plain epoch:
    the merge reduces to re-deriving V from P — exact on the f64
    precision backend."""
    from vjf_tpu.parallel import make_mesh, run_epoch_sync_every

    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64",
                    rls_backend="precision")
    T, B = 32, 4
    state = core.init_state(key, cfg)
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float64)
    us = jnp.zeros((T, B, 0), jnp.float64)
    flags = StepFlags(warm_up=False, train_decoder=False)
    lr = jnp.asarray(1e-3, jnp.float64)
    mesh1 = make_mesh(1, axis_names=("dp",))

    # reference: plain epoch, but with the segment key schedule the
    # relaxed path uses (split per segment, fold_in(device=0))
    seg_keys = jax.random.split(jax.random.PRNGKey(3), 4)
    st, q = state, None
    for i in range(4):
        res = core.run_epoch(cfg, flags, st, ys[i * 8:(i + 1) * 8],
                             us[i * 8:(i + 1) * 8],
                             jax.random.fold_in(seg_keys[i], 0), lr, q0=q)
        st = res.state
        from vjf_tpu.types import Gaussian
        q = Gaussian(res.q_means[-1], res.q_logvars[-1])

    out = run_epoch_sync_every(cfg, flags, state, ys, us,
                               jax.random.PRNGKey(3), lr, mesh1,
                               sync_every=8)
    np.testing.assert_allclose(
        np.asarray(out.state.dynamics.blr.w_mean),
        np.asarray(st.dynamics.blr.w_mean), rtol=1e-9, atol=1e-11)
    for a, b in zip(jax.tree_util.tree_leaves(out.state.params),
                    jax.tree_util.tree_leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_sync_every_validation(key):
    from vjf_tpu.parallel import make_mesh, run_epoch_sync_every

    cfg = VJFConfig(ydim=6, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(key, cfg)
    ys = jnp.zeros((30, 4, 6))
    us = jnp.zeros((30, 4, 0))
    mesh1 = make_mesh(1, axis_names=("dp",))
    with pytest.raises(ValueError, match="divide the epoch"):
        run_epoch_sync_every(cfg, StepFlags(), state, ys, us,
                             jax.random.PRNGKey(0), jnp.asarray(1e-3),
                             mesh1, sync_every=7)


def test_sync_every_8dev_trains(key):
    """Epoch-end sync (sync_every=0) over 8 devices still trains a ring
    system: loss decreases and the fit plumbing (cfg.sync_every via
    fit(mesh=...)) runs end-to-end."""
    from vjf_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    T, B, ydim = 64, 8, 10
    th = np.cumsum(np.full(T, 0.2)) + rng.normal(scale=0.02, size=T)
    x = np.stack([np.cos(th), np.sin(th)], -1)
    C = rng.normal(size=(ydim, 2))
    y = (x @ C.T)[:, None, :] + 0.1 * rng.normal(size=(T, B, ydim))

    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                    likelihood="gaussian", dtype="float32",
                    rls_backend="nsv", sync_every=0, warmup_max=2)
    state = core.init_state(key, cfg)
    mesh = make_mesh(8, axis_names=("dp",))
    res = core.fit(cfg, state, y.astype(np.float32), key=jax.random.PRNGKey(1),
                   max_iter=6, mesh=mesh)
    assert np.isfinite(res.loss)
    assert not res.warm_up

    with pytest.raises(ValueError, match="masks"):
        core.fit(cfg, state, y.astype(np.float32), key=key, max_iter=2,
                 mesh=mesh, mask=np.ones((T, B)))


def test_sync_every_warmup_merge_is_identity(key):
    """r3 review fix: with the RLS frozen (warm-up) every device ends a
    segment at exactly P0, so the merge must subtract the UNDECAYED base —
    the shrink/jitter-advanced base drained (n_dev-1)*jacc*I per boundary
    and pushed P indefinite within one epoch."""
    from vjf_tpu.parallel import make_mesh, run_epoch_sync_every

    cfg = VJFConfig(ydim=8, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64",
                    rls_backend="precision", rls_shrink=0.999,
                    chol_jitter=1e-3)
    T, B = 64, 8
    state = core.init_state(key, cfg)
    ys = jax.random.normal(key, (T, B, cfg.ydim), jnp.float64)
    us = jnp.zeros((T, B, 0), jnp.float64)
    mesh = make_mesh(8, axis_names=("dp",))
    flags = StepFlags(sgd=True, update=True, warm_up=True,
                      train_decoder=True)
    out = run_epoch_sync_every(cfg, flags, state, ys, us,
                               jax.random.PRNGKey(2),
                               jnp.asarray(1e-3, jnp.float64), mesh,
                               sync_every=8)
    np.testing.assert_allclose(
        np.asarray(out.state.dynamics.blr.precision),
        np.asarray(state.dynamics.blr.precision), rtol=1e-9, atol=1e-11)


def test_sync_trust_damps_merged_weight_step(key):
    """cfg.sync_trust (r4): the relaxed-sync boundary merge rescales the
    merged weight step to ||dw||_F <= sync_trust * max(||w0||_F, 1); P/V
    are untouched; sync_trust=0 restores the undamped r3 merge. Driven
    through run_epoch_sync_every on the 8-device mesh with a hot lr so
    the un-damped step is large."""
    from vjf_tpu.parallel import make_mesh, run_epoch_sync_every

    cfg0 = VJFConfig(ydim=10, xdim=2, udim=0, n_rbf=12, hidden_sizes=(8,),
                     likelihood="gaussian", dtype="float64",
                     rls_backend="precision", rls_shrink=0.999,
                     chol_jitter=1e-3)
    T, B = 32, 8
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.normal(size=(T, B, cfg0.ydim)) * 5.0)
    us = jnp.zeros((T, B, 0), jnp.float64)
    state = core.init_state(key, cfg0)
    flags = StepFlags(warm_up=False, train_decoder=False)
    lr = jnp.asarray(1e-2, jnp.float64)
    mesh = make_mesh(8, axis_names=("dp",))
    w0 = np.asarray(state.dynamics.blr.w_mean)

    # one epoch-end merge (sync_every=0): both runs traverse IDENTICAL
    # local segments, so the merged statistics match exactly and the
    # damping's geometry is pinned exactly
    outs = {}
    for trust in (0.0, 0.05):
        cfg = cfg0.replace(sync_every=0, sync_trust=trust)
        out = run_epoch_sync_every(cfg, flags, state, ys, us,
                                   jax.random.PRNGKey(3), lr, mesh,
                                   sync_every=0)
        outs[trust] = out
    radius = 0.05 * max(np.linalg.norm(w0), 1.0)
    d_un = np.linalg.norm(
        np.asarray(outs[0.0].state.dynamics.blr.w_mean) - w0)
    # the un-damped merge step must exceed the tight radius or the test
    # exercises nothing
    assert d_un > radius
    # damped: the step lands exactly ON the trust sphere, along the same
    # direction
    dw_tr = np.asarray(outs[0.05].state.dynamics.blr.w_mean) - w0
    dw_un = np.asarray(outs[0.0].state.dynamics.blr.w_mean) - w0
    np.testing.assert_allclose(np.linalg.norm(dw_tr), radius, rtol=1e-9)
    np.testing.assert_allclose(dw_tr, (radius / d_un) * dw_un,
                               rtol=1e-9, atol=1e-12)
    # precision statistics identical (damping touches only w)
    np.testing.assert_allclose(
        np.asarray(outs[0.05].state.dynamics.blr.precision),
        np.asarray(outs[0.0].state.dynamics.blr.precision),
        rtol=1e-12, atol=1e-14)


def test_sync_every_unconditioned_warns(key, caplog):
    """fit(mesh=..., sync_every!=1) with rls_shrink=1.0 must warn loudly:
    the per-chip RLS between merges is an unpooled pure accumulation —
    the r4-root-caused Lorenz collapse (docs/RESULTS.md 'Relaxed-sync')."""
    import logging

    from vjf_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    T, B, ydim = 16, 8, 6
    y = rng.normal(size=(T, B, ydim)).astype(np.float32)
    mesh = make_mesh(8, axis_names=("dp",))
    base = dict(ydim=ydim, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                likelihood="gaussian", dtype="float32", rls_backend="nsv",
                sync_every=8, warmup_max=1)
    cfg = VJFConfig(**base)
    state = core.init_state(key, cfg)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        core.fit(cfg, state, y, key=key, max_iter=2, mesh=mesh)
    assert any("pure accumulation" in r.message for r in caplog.records)

    caplog.clear()
    cfg2 = VJFConfig(**base, rls_shrink=0.999, chol_jitter=1e-3)
    state2 = core.init_state(key, cfg2)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        core.fit(cfg2, state2, y, key=key, max_iter=2, mesh=mesh)
    assert not any("pure accumulation" in r.message for r in caplog.records)


def test_sync_every_without_forecast_select_warns(key, caplog):
    """fit(mesh=..., sync_every!=1) without select='forecast' must warn
    that merges can destroy forecast skill while latents look healthy
    (r4 VERDICT #6; measured VdP K=8 rollout 12.2 vs 0.91 persistence)."""
    import logging

    from vjf_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    T, B, ydim = 16, 8, 6
    y = rng.normal(size=(T, B, ydim)).astype(np.float32)
    mesh = make_mesh(8, axis_names=("dp",))
    base = dict(ydim=ydim, xdim=2, udim=0, n_rbf=8, hidden_sizes=(5,),
                likelihood="gaussian", dtype="float32", rls_backend="nsv",
                sync_every=8, warmup_max=1, rls_shrink=0.999,
                chol_jitter=1e-3)
    cfg = VJFConfig(**base)
    state = core.init_state(key, cfg)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        core.fit(cfg, state, y, key=key, max_iter=2, mesh=mesh)
    assert any("forecast" in r.message for r in caplog.records)

    caplog.clear()
    cfg2 = VJFConfig(**base, select="forecast", select_horizon=3,
                     select_starts=4)
    state2 = core.init_state(key, cfg2)
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        core.fit(cfg2, state2, y, key=key, max_iter=2, mesh=mesh)
    assert not any("destroy forecast skill" in r.message
                   for r in caplog.records)
