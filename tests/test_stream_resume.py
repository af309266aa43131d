"""Mid-stream checkpoint/resume for ``VJF.filter_stream`` (r5, VERDICT
r4 #3): an interrupted unbounded stream resumes BIT-exactly — same
posterior carry, PRNG chain, lr, demotion machinery, and (K-block mode)
the ns_prefix=0 continuation contract.
"""
import itertools

import numpy as np
import pytest

from vjf_tpu import VJF


def _chunks(rng, n, t, b, ydim):
    return [rng.normal(size=(t, b, ydim)).astype(np.float32)
            for _ in range(n)]


def _make(seed=3):
    return VJF.make_model(6, 2, 0, n_rbf=8, hidden_sizes=[5],
                          likelihood="gaussian", dtype="float32", seed=seed)


def _state_leaves(model):
    import jax

    return [np.asarray(l) for l in jax.tree.leaves(model.state)]


def test_stream_resume_bitexact_single(tmp_path):
    rng = np.random.default_rng(0)
    chunks = _chunks(rng, 5, 16, 2, 6)
    ckpt = str(tmp_path / "stream_ckpt")

    # uninterrupted reference
    ref = _make()
    ref_out = list(ref.filter_stream(iter(chunks)))

    # interrupted: consume 2 chunks with checkpointing, abandon the rest
    part = _make()
    gen = part.filter_stream(iter(chunks), checkpoint_path=ckpt,
                             checkpoint_every=2)
    _ = list(itertools.islice(gen, 2))
    gen.close()

    # resume from the snapshot (saved at chunks_done=2) on a FRESH model
    # whose seed is irrelevant (the snapshot carries the PRNG chain)
    res = _make(seed=99)
    res_out = list(res.filter_stream(iter(chunks[2:]), resume_from=ckpt))

    assert len(res_out) == 3
    for got, want in zip(res_out, ref_out[2:]):
        np.testing.assert_array_equal(np.asarray(got.q_means),
                                      np.asarray(want.q_means))
        np.testing.assert_array_equal(np.asarray(got.q_logvars),
                                      np.asarray(want.q_logvars))
    for a, b in zip(_state_leaves(res), _state_leaves(ref)):
        np.testing.assert_array_equal(a, b)


def test_stream_resume_bitexact_blocked(tmp_path):
    """K-block mode: the first chunk runs alone (full prefix), blocks of
    K=2 continue prefix-free; saves land only at block boundaries and
    resume re-forms blocks identically."""
    rng = np.random.default_rng(1)
    chunks = _chunks(rng, 7, 12, 2, 6)
    ckpt = str(tmp_path / "stream_blk_ckpt")

    ref = _make()
    ref_out = list(ref.filter_stream(iter(chunks), chunks_per_dispatch=2))

    part = _make()
    gen = part.filter_stream(iter(chunks), chunks_per_dispatch=2,
                             checkpoint_path=ckpt, checkpoint_every=2)
    # first chunk alone (boundary 1, no save: 1 < 2), then block [1:3]
    # (boundary 3 -> save); consume 3 yielded results then abandon
    _ = list(itertools.islice(gen, 3))
    gen.close()

    from vjf_tpu.utils.checkpoint import load_ensemble_checkpoint

    snap = load_ensemble_checkpoint(ckpt)
    assert int(np.asarray(snap.chunks_done)) == 3

    res = _make(seed=77)
    res_out = list(res.filter_stream(iter(chunks[3:]),
                                     chunks_per_dispatch=2,
                                     resume_from=ckpt))
    assert len(res_out) == 4
    for got, want in zip(res_out, ref_out[3:]):
        np.testing.assert_array_equal(np.asarray(got.q_means),
                                      np.asarray(want.q_means))
    for a, b in zip(_state_leaves(res), _state_leaves(ref)):
        np.testing.assert_array_equal(a, b)


def test_stream_resume_validation(tmp_path):
    rng = np.random.default_rng(2)
    chunks = _chunks(rng, 3, 10, 2, 6)
    ckpt = str(tmp_path / "stream_val_ckpt")

    m = _make()
    gen = m.filter_stream(iter(chunks), checkpoint_path=ckpt,
                          checkpoint_every=1)
    _ = list(itertools.islice(gen, 1))
    gen.close()

    # k_block mismatch
    with pytest.raises(ValueError, match="chunks_per_dispatch"):
        list(_make().filter_stream(iter(chunks[1:]), resume_from=ckpt,
                                   chunks_per_dispatch=2))
    # warm_up mismatch
    with pytest.raises(ValueError, match="warm_up"):
        list(_make().filter_stream(iter(chunks[1:]), resume_from=ckpt,
                                   warm_up=True))
    # config mismatch
    other = VJF.make_model(6, 3, 0, n_rbf=8, hidden_sizes=[5],
                           likelihood="gaussian", dtype="float32", seed=3)
    with pytest.raises(ValueError, match="different config"):
        list(other.filter_stream(iter(chunks[1:]), resume_from=ckpt))
    # checkpoint arg validation
    with pytest.raises(ValueError, match="checkpoint_path"):
        list(_make().filter_stream(iter(chunks), checkpoint_every=2))
    with pytest.raises(ValueError, match="checkpoint_every"):
        list(_make().filter_stream(iter(chunks), checkpoint_path=ckpt))
