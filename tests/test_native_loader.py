"""Native streaming loader: build, ring-buffer semantics, Python fallback
equivalence, device prefetch, and end-to-end chunked streaming filtering."""
import numpy as np
import pytest

from vjf_tpu.native import StreamingLoader, device_prefetch
from vjf_tpu.native.loader import _load_native


@pytest.fixture
def stream_file(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1000, 2, 6)).astype(np.float32)
    path = tmp_path / "stream.bin"
    data.tofile(path)
    return str(path), data


def _drain(loader):
    chunks, valids = [], []
    for c in loader:
        chunks.append(c.copy())
        valids.append(loader.last_valid)
    return chunks, valids


def test_python_fallback_roundtrip(stream_file):
    path, data = stream_file
    loader = StreamingLoader(path, ydim=6, batch=2, chunk=256, native=False)
    chunks, valids = _drain(loader)
    got = np.concatenate(
        [c[:v] for c, v in zip(chunks, valids)], axis=0
    )
    np.testing.assert_array_equal(got, data)
    assert valids[-1] == 1000 - 3 * 256


def test_native_roundtrip(stream_file):
    path, data = stream_file
    if _load_native() is None:
        pytest.skip("native toolchain unavailable")
    loader = StreamingLoader(path, ydim=6, batch=2, chunk=256, native=True)
    assert loader.is_native
    chunks, valids = _drain(loader)
    got = np.concatenate([c[:v] for c, v in zip(chunks, valids)], axis=0)
    np.testing.assert_array_equal(got, data)


def test_device_prefetch(stream_file):
    path, data = stream_file
    loader = StreamingLoader(path, ydim=6, batch=2, chunk=500, native=False)
    chunks = list(device_prefetch(loader))
    assert len(chunks) == 2
    np.testing.assert_array_equal(np.asarray(chunks[0]), data[:500])


def test_streaming_filter_end_to_end(tmp_path):
    """Chunked streaming == offline epoch on the same data (the posterior
    carries across chunk boundaries via q0)."""
    import jax
    import jax.numpy as jnp

    from vjf_tpu import VJF
    from vjf_tpu.config import StepFlags
    from vjf_tpu.models import vjf as core

    rng = np.random.default_rng(1)
    T, B, ydim = 96, 1, 8
    data = rng.normal(size=(T, B, ydim)).astype(np.float64)
    path = tmp_path / "y.bin"
    data.astype(np.float64).tofile(path)

    model = VJF.make_model(ydim, 2, 0, n_rbf=10, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64")
    loader = StreamingLoader(str(path), ydim=ydim, batch=B, chunk=32,
                             dtype=np.float64, native=False)
    results = list(model.filter_stream(loader, valid_fn=lambda: loader.last_valid))
    assert len(results) == 3
    losses = np.concatenate([np.asarray(r.metrics.loss) for r in results])
    assert losses.shape == (96,)
    assert np.all(np.isfinite(losses))

    # equivalence with one offline epoch (same init, same noise path is not
    # injected here, so compare only counter/step bookkeeping)
    assert int(model.state.dynamics.n_sample) > 0


def test_streaming_filter_partial_tail(tmp_path):
    """T % chunk != 0: the tail chunk must train on the valid prefix only
    AND yield its (truncated) results (r1 advisor finding)."""
    import numpy as np

    from vjf_tpu import VJF

    rng = np.random.default_rng(2)
    T, B, ydim, chunk = 90, 1, 8, 32           # 32 + 32 + 26
    data = rng.normal(size=(T, B, ydim)).astype(np.float64)
    path = tmp_path / "y.bin"
    data.tofile(path)

    model = VJF.make_model(ydim, 2, 0, n_rbf=10, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64")
    loader = StreamingLoader(str(path), ydim=ydim, batch=B, chunk=chunk,
                             dtype=np.float64, native=False)
    results = list(model.filter_stream(loader, valid_fn=lambda: loader.last_valid))
    assert len(results) == 3
    assert results[-1].q_means.shape[0] == T - 2 * chunk   # truncated, not dropped
    losses = np.concatenate([np.asarray(r.metrics.loss) for r in results])
    assert losses.shape == (T,)
    assert np.all(np.isfinite(losses))


def test_run_chunks_matches_sequential_epochs():
    """core.run_chunks (the K-chunk device-side pipeline) == K sequential
    run_epoch dispatches with the posterior carried, same keys — exact."""
    import jax
    import jax.numpy as jnp

    from vjf_tpu.config import StepFlags, VJFConfig
    from vjf_tpu.models import vjf as core

    rng = np.random.default_rng(3)
    K, L, B, ydim = 3, 24, 2, 8
    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="gaussian", dtype="float64")
    state = core.init_state(jax.random.PRNGKey(0), cfg)
    ys = jnp.asarray(rng.normal(size=(K, L, B, ydim)))
    us = jnp.zeros((K, L, B, 0))
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    lr = jnp.asarray(cfg.lr)
    flags = StepFlags(warm_up=False, train_decoder=False)

    blk = core.run_chunks(cfg, flags, state, ys, us, keys, lr)

    st, q = state, None
    seq_means, seq_losses = [], []
    for i in range(K):
        r = core.run_epoch(cfg, flags, st, ys[i], us[i], keys[i], lr, q0=q)
        st = r.state
        from vjf_tpu.types import Gaussian
        q = Gaussian(r.q_means[-1], r.q_logvars[-1])
        seq_means.append(np.asarray(r.q_means))
        seq_losses.append(np.asarray(r.metrics.loss))

    np.testing.assert_allclose(np.asarray(blk.q_means),
                               np.stack(seq_means), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(blk.metrics.loss),
                               np.stack(seq_losses), rtol=1e-12, atol=1e-13)
    for a, b in zip(jax.tree_util.tree_leaves(blk.state),
                    jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(blk.q_last.mean),
                               np.asarray(q.mean), rtol=1e-12)


def test_streaming_blocked_end_to_end(tmp_path):
    """chunks_per_dispatch=K: one yield per chunk, posterior carried across
    block boundaries, leftover full chunks AND the partial tail flushed."""
    from vjf_tpu import VJF

    rng = np.random.default_rng(4)
    chunk, B, ydim = 32, 1, 8
    T = 5 * chunk + 20                       # 5 full chunks + partial tail
    data = rng.normal(size=(T, B, ydim)).astype(np.float64)
    path = tmp_path / "y.bin"
    data.tofile(path)

    model = VJF.make_model(ydim, 2, 0, n_rbf=10, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64")
    loader = StreamingLoader(str(path), ydim=ydim, batch=B, chunk=chunk,
                             dtype=np.float64, native=False)
    results = list(model.filter_stream(
        loader, valid_fn=lambda: loader.last_valid, chunks_per_dispatch=2,
    ))
    # 2 blocks of 2 + 1 leftover + 1 tail = 6 yields (one per chunk)
    assert len(results) == 6
    assert results[-1].q_means.shape[0] == 20    # truncated tail
    losses = np.concatenate([np.asarray(r.metrics.loss) for r in results])
    assert losses.shape == (T,)
    assert np.all(np.isfinite(losses))
    assert int(model.state.dynamics.n_sample) > 0

    # the posterior genuinely carries across block boundaries: chunk 2's
    # first posterior differs from a fresh-prior filter of the same data
    fresh = VJF.make_model(ydim, 2, 0, n_rbf=10, hidden_sizes=[6],
                           likelihood="gaussian", dtype="float64")
    r_fresh = list(fresh.filter_stream(
        iter([data[2 * chunk: 3 * chunk]]), chunks_per_dispatch=1))
    assert not np.allclose(np.asarray(results[2].q_means[0]),
                           np.asarray(r_fresh[0].q_means[0]))


def test_streaming_blocked_with_masks(tmp_path):
    """Blocked mode composes with controls-free masks/channel_masks."""
    from vjf_tpu import VJF

    rng = np.random.default_rng(5)
    chunk, B, ydim = 16, 2, 6
    n_chunks = 4
    T = n_chunks * chunk
    data = rng.normal(size=(T, B, ydim)).astype(np.float64)

    model = VJF.make_model(ydim, 2, 0, n_rbf=8, hidden_sizes=[5],
                           likelihood="gaussian", dtype="float64")
    chunks = [data[i * chunk: (i + 1) * chunk] for i in range(n_chunks)]
    ms = [np.ones((chunk, B)) for _ in range(n_chunks)]
    ms[1][:, 1] = 0.0
    cms = [np.ones((chunk, B, ydim)) for _ in range(n_chunks)]
    cms[2][:, 0, :2] = 0.0
    results = list(model.filter_stream(
        iter(chunks), masks=iter(ms), channel_masks=iter(cms),
        chunks_per_dispatch=2,
    ))
    assert len(results) == n_chunks
    losses = np.concatenate([np.asarray(r.metrics.loss) for r in results])
    assert np.all(np.isfinite(losses))


def test_streaming_demotes_mega_on_hot_tau(caplog):
    """filter_stream applies fit()'s hot-tau demotion policy (api.py): a
    pervasively hot NSV regime (B=1 SGP keeps the trace bound above the mega
    kernel's escalation ceiling, so the kernel soundly DROPS the updates)
    must demote the stream to the XLA epoch, re-run the offending chunk,
    and keep yielding one finite EpochResult per chunk."""
    import logging

    import jax.numpy as jnp

    from vjf_tpu import VJF
    from vjf_tpu.config import VJFConfig

    from vjf_tpu.datasets import linear_gaussian_observations, ring_attractor

    x = ring_attractor(T=80)
    y, _, _ = linear_gaussian_observations(x, 10, obs_noise=0.1,
                                           intercept=False, seed=7)
    y = y.astype(np.float32)[:, None, :]               # (T, B=1, ydim)

    cfg = VJFConfig(ydim=10, xdim=2, udim=0, dynamics="sgp", n_inducing=16,
                    sgp_scale=1.0, sgp_lengthscale=1.0, likelihood="gaussian",
                    dtype="float32", rls_backend="nsv", fused_step="on",
                    matmul_dtype="float32", ns_prefix=8, lr=1e-3)
    model = VJF(cfg)
    chunks = [y[:40], y[40:]]
    with caplog.at_level(logging.WARNING, logger="vjf_tpu"):
        results = list(model.filter_stream(iter(chunks)))
    assert len(results) == 2
    for r in results:
        assert np.all(np.isfinite(np.asarray(r.metrics.loss)))
    assert np.all(np.isfinite(np.asarray(model.state.dynamics.blr.precision)))
    assert any("demoting" in r.message for r in caplog.records), (
        "expected the streaming hot-tau demotion to fire for B=1 SGP"
    )


def test_native_fifo_no_hang(tmp_path):
    """Closing a loader whose FIFO has no writer must not hang (the r1
    advisor finding: fread blocked forever in the reader thread). Also:
    a writer attaching AFTER the open must be picked up (not treated as
    instant EOF)."""
    import os
    import threading
    import time

    if _load_native() is None:
        pytest.skip("native toolchain unavailable")

    fifo = str(tmp_path / "stream.fifo")
    os.mkfifo(fifo)
    loader = StreamingLoader(fifo, ydim=4, batch=1, chunk=8, native=True)
    assert loader.is_native

    done = threading.Event()

    def closer():
        loader.close()
        done.set()

    t = threading.Thread(target=closer, daemon=True)
    t.start()
    assert done.wait(timeout=10.0), "close() hung on an idle FIFO"

    # late writer: open loader first, write afterwards, data must arrive
    fifo2 = str(tmp_path / "late.fifo")
    os.mkfifo(fifo2)
    loader2 = StreamingLoader(fifo2, ydim=4, batch=1, chunk=8, native=True)
    data = np.arange(8 * 4, dtype=np.float32).reshape(8, 1, 4)

    def writer():
        time.sleep(0.2)
        with open(fifo2, "wb") as f:
            f.write(data.tobytes())

    w = threading.Thread(target=writer, daemon=True)
    w.start()
    chunk = next(iter(loader2))
    np.testing.assert_array_equal(chunk, data)
    w.join()
    loader2.close()


def test_native_fifo_writer_came_and_went_is_eof(tmp_path):
    """A FIFO writer that attaches and closes WITHOUT delivering a full
    chunk must still signal EOF to the consumer (review finding: it was
    treated as 'no writer yet' forever and the read hung). Covers both the
    partial-step writer and the zero-byte writer (detected by the
    writer-presence sampling as long as the attach outlives one 20 ms poll
    window)."""
    import os
    import threading
    import time

    if _load_native() is None:
        pytest.skip("native toolchain unavailable")

    # partial data: one full step + a torn half-step, then writer leaves
    fifo = str(tmp_path / "partial.fifo")
    os.mkfifo(fifo)
    loader = StreamingLoader(fifo, ydim=4, batch=1, chunk=8, native=True)

    def partial_writer():
        time.sleep(0.2)
        with open(fifo, "wb") as f:
            f.write(np.arange(6, dtype=np.float32).tobytes())  # 1.5 steps

    out, done = [], threading.Event()

    def consume():
        for c in loader:
            out.append(c)
        done.set()

    threading.Thread(target=partial_writer, daemon=True).start()
    threading.Thread(target=consume, daemon=True).start()
    assert done.wait(timeout=15.0), "EOF never reached after writer left"
    # the torn trailing half-step is dropped; the one full step arrives in
    # a zero-padded fixed-shape chunk with last_valid reporting the truth
    assert len(out) == 1 and loader.last_valid == 1
    np.testing.assert_array_equal(
        out[0][0, 0], np.arange(4, dtype=np.float32)
    )
    loader.close()

    # zero-byte writer: attach, linger past a poll window, write nothing
    fifo2 = str(tmp_path / "empty.fifo")
    os.mkfifo(fifo2)
    loader2 = StreamingLoader(fifo2, ydim=4, batch=1, chunk=8, native=True)

    def empty_writer():
        time.sleep(0.2)
        fd = os.open(fifo2, os.O_WRONLY)
        time.sleep(0.3)          # outlive at least one 20 ms sample window
        os.close(fd)

    out2, done2 = [], threading.Event()

    def consume2():
        for c in loader2:
            out2.append(c)
        done2.set()

    threading.Thread(target=empty_writer, daemon=True).start()
    threading.Thread(target=consume2, daemon=True).start()
    assert done2.wait(timeout=15.0), "EOF never reached after 0-byte writer"
    assert out2 == []
    loader2.close()


def test_native_fifo_wait_does_not_spin(tmp_path):
    """While a FIFO has no writer the reader thread must sleep, not
    busy-poll: poll() on a writer-less FIFO read end returns POLLHUP
    immediately, so polling that fd turns the wait into a 100%-CPU spin
    (observed pre-fix). The wait loop now polls only the wake pipe."""
    import os
    import threading
    import time

    if _load_native() is None:
        pytest.skip("native toolchain unavailable")

    fifo = str(tmp_path / "spin.fifo")
    os.mkfifo(fifo)
    loader = StreamingLoader(fifo, ydim=4, batch=1, chunk=4, native=True)
    t_cpu = time.process_time()
    t_wall = time.time()
    time.sleep(1.5)
    frac = (time.process_time() - t_cpu) / (time.time() - t_wall)
    # generous bound: the whole process (incl. pytest) should be idle;
    # the pre-fix spin pegged this at ~1.0
    assert frac < 0.5, f"reader thread busy-spinning (CPU fraction {frac:.2f})"

    # and data written after the wait still arrives
    data = np.arange(4 * 4, dtype=np.float32).reshape(4, 1, 4)

    def writer():
        with open(fifo, "wb") as f:
            f.write(data.tobytes())

    w = threading.Thread(target=writer, daemon=True)
    w.start()
    chunk = next(iter(loader))
    np.testing.assert_array_equal(chunk, data)
    w.join()
    loader.close()


def test_native_build_failure_cached(tmp_path, monkeypatch):
    """A failed build writes a marker and later loads skip the compiler
    subprocess (r1 advisor finding)."""
    from vjf_tpu.native import loader as L

    marker = tmp_path / ".build_failed"
    src = tmp_path / "stream_loader.cpp"
    src.write_text("// src")
    monkeypatch.setattr(L, "_FAIL_MARKER", str(marker))
    monkeypatch.setattr(L, "_SRC_PATH", str(src))
    monkeypatch.setattr(L, "_SO_PATH", str(tmp_path / "nope.so"))
    monkeypatch.setattr(L, "_lib", None)
    monkeypatch.setattr(L, "_lib_tried", False)

    calls = []

    def fake_run(*a, **k):
        calls.append(a)
        raise RuntimeError("no compiler")

    monkeypatch.setattr(L.subprocess, "run", fake_run)
    assert L._load_native() is None
    assert marker.exists()
    assert len(calls) == 1

    # a fresh process (simulated by resetting the module cache) must NOT
    # re-invoke the compiler: the on-disk marker short-circuits
    monkeypatch.setattr(L, "_lib_tried", False)
    assert L._load_native() is None
    assert len(calls) == 1

    # touching the source invalidates the marker -> one more attempt
    import os as _os
    _os.utime(str(src), (src.stat().st_atime, src.stat().st_mtime + 10))
    monkeypatch.setattr(L, "_lib_tried", False)
    assert L._load_native() is None
    assert len(calls) == 2


def test_uint8_wire_dtype_matches_f32(tmp_path):
    """Integer ingest (uint8 spike counts, 1/4 the f32 bytes over the
    host->device link) must be bit-identical to shipping f32: run_epoch /
    fit / filter_stream upcast to cfg.jdtype ON DEVICE, so the post-cast
    computation is the same graph."""
    import jax
    import jax.numpy as jnp

    from vjf_tpu import VJF
    from vjf_tpu.config import VJFConfig
    from vjf_tpu.models import vjf as core

    rng = np.random.default_rng(3)
    T, B, ydim = 64, 2, 8
    counts = rng.poisson(0.5, size=(T, B, ydim)).astype(np.uint8)
    cfg = VJFConfig(ydim=ydim, xdim=2, udim=0, n_rbf=10, hidden_sizes=(6,),
                    likelihood="poisson", dtype="float32", rls_backend="nsv")

    # streaming path (jitted run_epoch receives the wire dtype)
    m8, m32 = VJF(cfg, seed=5), VJF(cfg, seed=5)
    outs8 = list(m8.filter_stream(iter(np.split(counts, 2))))
    outs32 = list(m32.filter_stream(iter(np.split(counts.astype(np.float32), 2))))
    for a, b in zip(outs8, outs32):
        np.testing.assert_array_equal(np.asarray(a.q_means), np.asarray(b.q_means))
        np.testing.assert_array_equal(np.asarray(a.metrics.loss),
                                      np.asarray(b.metrics.loss))

    # fit path (host-level two-step ingest)
    key = jax.random.PRNGKey(0)
    # fresh state per fit: fit() donates its state buffers
    r8 = core.fit(cfg, core.init_state(key, cfg), counts, key=key, max_iter=3)
    r32 = core.fit(cfg, core.init_state(key, cfg),
                   counts.astype(np.float32), key=key, max_iter=3)
    np.testing.assert_array_equal(np.asarray(r8.mu), np.asarray(r32.mu))
    assert r8.loss == r32.loss

    # block-dispatch path: run_epochs must build its scan carry / tau
    # stats in cfg.jdtype, not the uint8 wire dtype (regression: a uint8
    # q-carry mismatched the f32 epoch outputs at the scan boundary)
    b8 = core.fit(cfg, core.init_state(key, cfg), counts, key=key,
                  max_iter=4, epochs_per_dispatch=2)
    b32 = core.fit(cfg, core.init_state(key, cfg),
                   counts.astype(np.float32), key=key, max_iter=4,
                   epochs_per_dispatch=2)
    np.testing.assert_array_equal(np.asarray(b8.mu), np.asarray(b32.mu))
    assert b8.loss == b32.loss


def test_device_prefetch_valid_pairs_tail(tmp_path):
    """device_prefetch(valid_fn=...) yields (chunk, n_valid) pairs whose
    validity was sampled at PRODUCE time; filter_stream consumes them and
    reproduces the non-prefetched stream exactly, including the truncated
    tail (a consumer-side valid_fn would see the prefetcher's LATER count
    and wrongly truncate an earlier full chunk)."""
    from vjf_tpu import VJF

    rng = np.random.default_rng(4)
    T, B, ydim, chunk = 90, 1, 8, 32           # 32 + 32 + 26
    data = rng.normal(size=(T, B, ydim)).astype(np.float64)
    path = tmp_path / "y.bin"
    data.tofile(path)

    def run(prefetched):
        model = VJF.make_model(ydim, 2, 0, n_rbf=10, hidden_sizes=[6],
                               likelihood="gaussian", dtype="float64")
        loader = StreamingLoader(str(path), ydim=ydim, batch=B, chunk=chunk,
                                 dtype=np.float64, native=False)
        if prefetched:
            stream = device_prefetch(loader, depth=3,
                                     valid_fn=lambda: loader.last_valid)
            return list(model.filter_stream(stream))
        return list(model.filter_stream(
            loader, valid_fn=lambda: loader.last_valid))

    plain, pre = run(False), run(True)
    assert len(plain) == len(pre) == 3
    assert pre[-1].q_means.shape[0] == T - 2 * chunk
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(np.asarray(a.q_means),
                                      np.asarray(b.q_means))
        np.testing.assert_array_equal(np.asarray(a.metrics.loss),
                                      np.asarray(b.metrics.loss))


def test_filter_stream_controls():
    """udim > 0 streaming: `controls=` chunks ride the epoch scan (and the
    tail path); omitting them fails loudly, a short iterable fails loudly,
    and the control values actually reach the model."""
    import numpy as np
    import pytest

    from vjf_tpu import VJF

    rng = np.random.default_rng(11)
    T, B, ydim, udim, chunk = 90, 2, 8, 3, 32      # 32 + 32 + 26 (tail)
    y = rng.normal(size=(T, B, ydim)).astype(np.float32)
    u = rng.normal(size=(T, B, udim)).astype(np.float32)

    def make():
        return VJF.make_model(ydim, 2, udim, n_rbf=10, hidden_sizes=[6],
                              likelihood="gaussian", dtype="float32", seed=9)

    splits = [0, 32, 64, T]
    chunks = [y[a:b] for a, b in zip(splits, splits[1:])]
    us = [u[a:b] for a, b in zip(splits, splits[1:])]
    valid = iter([32, 32, 26])

    outs = list(make().filter_stream(
        iter(chunks), controls=iter(us), valid_fn=lambda: next(valid),
    ))
    assert len(outs) == 3
    assert outs[-1].q_means.shape[0] == 26          # tail truncated, yielded
    mu = np.concatenate([np.asarray(o.q_means) for o in outs])
    assert np.all(np.isfinite(mu))

    # controls reach the model: different u -> different posteriors
    valid2 = iter([32, 32, 26])
    outs0 = list(make().filter_stream(
        iter(chunks), controls=iter([np.zeros_like(c) for c in us]),
        valid_fn=lambda: next(valid2),
    ))
    mu0 = np.concatenate([np.asarray(o.q_means) for o in outs0])
    assert not np.allclose(mu, mu0)

    with pytest.raises(ValueError, match="udim=3"):
        list(make().filter_stream(iter(chunks)))
    with pytest.raises(ValueError, match="controls.*ran out"):
        list(make().filter_stream(iter(chunks), controls=iter(us[:1])))


def test_device_prefetch_propagates_producer_error():
    """A producer-side exception (iterator, user valid_fn, device_put) must
    reach the consumer — swallowed on the worker thread, it would end the
    stream cleanly and the model would silently train on a truncated
    stream (the hazard filter_stream's short-iterable check exists for)."""
    def chunks():
        yield np.ones((4, 1, 3), np.float32)
        raise OSError("disk pulled mid-stream")

    got = []
    with pytest.raises(OSError, match="disk pulled"):
        for c in device_prefetch(chunks()):
            got.append(c)
    assert len(got) == 1                      # prefix delivered, then raise

    def boom():
        raise RuntimeError("valid_fn failed")

    with pytest.raises(RuntimeError, match="valid_fn failed"):
        list(device_prefetch(iter([np.zeros((2, 1, 3), np.float32)]),
                             valid_fn=boom))


def test_wire_put_downcasts_wide_floats():
    """wire_put ships the NARROWEST dtype: float64 numpy input under x64
    is host-cast to the compute dtype (f64 on the wire would double the
    bytes); integer inputs stay native (the consumer upcasts on device);
    wire_ingest lands on cfg.jdtype either way."""
    import jax.numpy as jnp

    from vjf_tpu.models.vjf import wire_ingest, wire_put

    y64 = np.linspace(0.0, 1.0, 24, dtype=np.float64).reshape(4, 6)
    put = wire_put(y64, jnp.float32)
    assert put.dtype == jnp.float32           # downcast BEFORE device_put
    y8 = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert wire_put(y8, jnp.float32).dtype == jnp.uint8   # native wire dtype
    assert wire_ingest(y8, jnp.float32).dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(wire_ingest(y64, jnp.float32)),
        y64.astype(np.float32),
    )
    # already-on-device arrays are never host-cast (no transfer to undo)
    dev = jnp.asarray(y64, jnp.float64)
    assert wire_ingest(dev, jnp.float32).dtype == jnp.float32


def test_torch_tensor_ingest():
    """Array-likes with foreign dtypes (torch tensors) must still ingest:
    the wire host-downcast is numpy-only (np.dtype(torch.float32) raises),
    everything else rides plain jnp.asarray as before."""
    import jax.numpy as jnp

    torch = pytest.importorskip("torch")
    from vjf_tpu import VJF
    from vjf_tpu.models.vjf import wire_ingest, wire_put

    y_t = torch.randn(16, 2, 6, dtype=torch.float32)
    assert wire_put(y_t, jnp.float32).dtype == jnp.float32
    assert wire_ingest(y_t, jnp.float32).shape == (16, 2, 6)

    m = VJF.make_model(6, 2, 0, n_rbf=8, hidden_sizes=[4],
                       likelihood="gaussian", dtype="float32")
    _, _, loss = m.fit(y_t, max_iter=3)
    assert np.isfinite(float(loss))
    outs = list(m.filter_stream(iter([torch.randn(8, 2, 6)])))
    assert len(outs) == 1


def test_native_close_while_consumer_blocked(tmp_path):
    """Closing a stream while another thread is BLOCKED inside the native
    read (idle FIFO, no data) must neither crash nor hang: the stream map
    holds shared ownership, close() wakes the waiter, and destruction
    waits for the in-flight read to return (previously a raw delete freed
    the mutex/condvar under the blocked consumer — use-after-free)."""
    import os
    import threading
    import time

    if _load_native() is None:
        pytest.skip("native loader unavailable")
    fifo = str(tmp_path / "idle.fifo")
    os.mkfifo(fifo)
    loader = StreamingLoader(fifo, ydim=4, batch=1, chunk=8, native=True)

    got = []

    def consume():
        # blocks in vjf_stream_read -> RingStream::read cv wait
        got.append(list(loader))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.5)                  # let the consumer reach the cv wait
    loader.close()                   # must wake + not free under the waiter
    t.join(timeout=10.0)
    assert not t.is_alive(), "consumer never woke after close()"
    assert got == [[]]               # clean empty stream, no crash


def test_device_prefetch_abandoned_consumer_stops_worker():
    """Abandoning the prefetch generator (break / exception in the consumer)
    must stop the producer thread: a plain q.put on the bounded queue would
    block forever once full, leaking the thread and pinning the source
    loader open."""
    import threading
    import time

    before = threading.active_count()

    def chunks():
        while True:
            yield np.zeros((4, 1, 3), np.float32)

    gen = device_prefetch(chunks(), depth=2)
    next(gen)
    gen.close()                      # consumer walks away mid-stream

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_streaming_blocked_with_controls(tmp_path):
    """Blocked mode stacks per-chunk controls into the block dispatch
    (udim > 0) — and the controls iterable stays in lockstep."""
    from vjf_tpu import VJF

    rng = np.random.default_rng(6)
    chunk, B, ydim, udim = 16, 2, 6, 2
    n_chunks = 5
    T = n_chunks * chunk
    data = rng.normal(size=(T, B, ydim)).astype(np.float64)
    u = rng.normal(size=(T, B, udim)).astype(np.float64)

    model = VJF.make_model(ydim, 2, udim, n_rbf=8, hidden_sizes=[5],
                           likelihood="gaussian", dtype="float64")
    chunks = [data[i*chunk:(i+1)*chunk] for i in range(n_chunks)]
    ucs = [u[i*chunk:(i+1)*chunk] for i in range(n_chunks)]
    results = list(model.filter_stream(
        iter(chunks), controls=iter(ucs), chunks_per_dispatch=2))
    assert len(results) == n_chunks
    losses = np.concatenate([np.asarray(r.metrics.loss) for r in results])
    assert losses.shape == (T,)
    assert np.all(np.isfinite(losses))

    # missing controls raise (same contract as the one-chunk path)
    m2 = VJF.make_model(ydim, 2, udim, n_rbf=8, hidden_sizes=[5],
                        likelihood="gaussian", dtype="float64")
    with pytest.raises(ValueError, match="controls"):
        list(m2.filter_stream(iter(chunks), chunks_per_dispatch=2))
