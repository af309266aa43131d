"""Checkpoint / resume.

The reference cannot checkpoint at all: the Bayesian regression state and
sample counters are plain Python attributes invisible to ``state_dict()``
(``vjf/module.py:46-54``, ``vjf/likelihood.py:17``, ``vjf/model.py:332`` —
SURVEY.md §5). Here ALL of it — params, RLS sufficient statistics, noise
estimates, counters, fit-loop progress, RNG key — lives in one pytree, so
save/restore is exact and resume is bit-identical.

Primary backend: orbax; fallback: a flat ``.npz`` written via pytree
flatten (keeps checkpoints working even where orbax is unavailable).
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VJFConfig


class FitLoopState(NamedTuple):
    """Host-side fit-loop progress for exact resume of ``fit``."""

    epoch: int
    lr: float
    warm_up: bool
    running_loss: float
    key: Any   # PRNG key array


def _tree_to_flat(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return flat, treedef


def _flat_to_tree(flat: dict, treedef, n: int):
    leaves = [jnp.asarray(flat[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    state,
    cfg: Optional[VJFConfig] = None,
    loop: Optional[FitLoopState] = None,
) -> None:
    """Save a TrainState (+ optional config and fit-loop progress) to ``path``
    (a directory for orbax, or ``<path>.npz`` for the fallback)."""
    payload = {"state": state}
    if loop is not None:
        payload["loop"] = loop._replace(key=jnp.asarray(loop.key))
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, jax.tree.map(np.asarray, payload), force=True)
        meta_path = os.path.join(path, "vjf_meta.json")
    except Exception:
        # A mid-save orbax failure can leave a PARTIAL directory, which
        # load_checkpoint's isdir dispatch would prefer over the complete
        # .npz written below — remove it so the fallback is loadable.
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        flat, treedef = _tree_to_flat(payload)
        np.savez(path + ".npz", **flat)
        with open(path + ".treedef.pkl", "wb") as f:
            pickle.dump((treedef, len(flat)), f)
        meta_path = path + ".meta.json"
    if cfg is not None:
        with open(meta_path, "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_checkpoint(
    path: str,
    state_template,
    loop_template: Optional[FitLoopState] = None,
):
    """Restore; templates supply the pytree structure (and dtypes).

    :return: (state, loop_or_None)
    """
    payload_template = {"state": state_template}
    if loop_template is not None:
        payload_template["loop"] = loop_template._replace(
            key=jnp.asarray(loop_template.key)
        )
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        try:
            restored = ckpt.restore(
                os.path.abspath(path),
                item=jax.tree.map(np.asarray, payload_template),
            )
        except Exception:
            # a directory truncated by a killed process is unreadable by
            # orbax; prefer a complete sibling .npz over failing outright
            if not os.path.exists(path + ".npz"):
                raise
            with open(path + ".treedef.pkl", "rb") as f:
                treedef, n = pickle.load(f)
            with np.load(path + ".npz") as data:
                restored = _flat_to_tree(dict(data), treedef, n)
        else:
            restored = jax.tree.map(jnp.asarray, restored)
    else:
        with open(path + ".treedef.pkl", "rb") as f:
            treedef, n = pickle.load(f)
        with np.load(path + ".npz") as data:
            restored = _flat_to_tree(dict(data), treedef, n)
    state = restored["state"]
    loop = restored.get("loop")
    if loop is not None and loop_template is not None:
        loop = FitLoopState(
            epoch=int(loop.epoch),
            lr=float(loop.lr),
            warm_up=bool(loop.warm_up),
            running_loss=float(loop.running_loss),
            key=jnp.asarray(loop.key),
        )
    return state, loop


def config_digest(cfg: VJFConfig) -> np.ndarray:
    """Process-stable config fingerprint (Python ``hash`` is salted per
    process) — stored in fit/ensemble snapshots and validated on resume."""
    import hashlib

    blob = json.dumps(dataclasses.asdict(cfg), sort_keys=True).encode()
    return np.frombuffer(hashlib.md5(blob).digest(), dtype=np.uint8).copy()


def save_ensemble_checkpoint(path: str, snapshot) -> None:
    """Persist a ``parallel.ensemble.EnsembleSnapshot`` (the per-member fit
    state machine: stacked states, warm/done/running/plateau_hits/lr/
    epochs_run, member keys, demotion + selection machinery) for exact
    mid-fit resume of ``fit_ensemble``.

    Flat-npz format with the pickled treedef embedded as a uint8 entry —
    ONE file, atomically replaced, so a kill at any instant leaves either
    the previous complete snapshot or the new one, never a torn pair
    (a sidecar treedef file could desynchronize from the npz: the
    snapshot's structure legitimately changes between saves, e.g. the
    selection tracker's leaves flip from None to full pytrees). The
    structure is self-describing — the snapshot's optional leaves vary
    per run, so a fixed restore template cannot be supplied the way the
    orbax path requires."""
    flat, treedef = _tree_to_flat(snapshot)
    flat["__treedef__"] = np.frombuffer(
        pickle.dumps((treedef, len(flat))), dtype=np.uint8
    )
    tmp = path + ".npz.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
        # flush+fsync before the rename: os.replace alone is atomic vs
        # process kills, but on power loss some filesystems persist the
        # rename with truncated content — fsync makes the data durable
        # before it can become the checkpoint
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path + ".npz")  # atomic: never a torn checkpoint
    # fsync the directory so the rename itself is durable
    try:
        dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # best-effort (some filesystems disallow directory fsync)


def load_ensemble_checkpoint(path: str):
    """Restore an :func:`save_ensemble_checkpoint` snapshot.

    .. warning:: Snapshot files embed a pickled pytree treedef, and
       unpickling executes arbitrary code (the same trust model as
       ``torch.load``): only load snapshots you (or a process you trust)
       wrote. ``fit``/``fit_ensemble`` ``resume_from=`` inherit this
       requirement.

    Leaves come back as NUMPY arrays in their stored dtypes — NOT
    ``jnp.asarray``'d: under disabled x64 (production f32 mode) that
    would silently round the snapshot's float64 host scalars (lr,
    running losses, selection metrics) to f32 and break the bit-exact
    resume contract the drivers promise. Device-bound leaves (states,
    posteriors, keys) convert on first use inside the jitted dispatches,
    preserving their stored dtypes."""
    with np.load(path + ".npz") as data:
        flat = dict(data)
    treedef, n = pickle.loads(flat.pop("__treedef__").tobytes())
    leaves = [flat[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_config(path: str) -> VJFConfig:
    meta = os.path.join(path, "vjf_meta.json") if os.path.isdir(path) else path + ".meta.json"
    with open(meta) as f:
        d = json.load(f)
    d["hidden_sizes"] = tuple(d["hidden_sizes"])
    # forward compatibility: a checkpoint written by a build with a since-
    # retired knob (e.g. mega_unroll, cut in r4) must stay loadable —
    # unknown keys are dropped with a warning rather than TypeError-ing
    fields = {f.name for f in dataclasses.fields(VJFConfig)}
    unknown = sorted(set(d) - fields)
    if unknown:
        import warnings

        warnings.warn(
            f"checkpoint config carries retired/unknown fields {unknown}; "
            "ignoring them"
        )
        d = {k: v for k, v in d.items() if k in fields}
    return VJFConfig(**d)
