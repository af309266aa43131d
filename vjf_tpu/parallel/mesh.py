"""Device-mesh construction.

The reference has no distributed code at all (SURVEY.md §2.4); the rebuild's
parallel axes are the ones the algorithm actually has:

* ``dp`` — trials. Each timestep processes all trials in lockstep; trials
  shard across chips, and the one genuine cross-device reduction in VJF is
  the all-reduce of the RLS sufficient statistics (``F^T F``, ``F^T dx``)
  and of gradient/metric means, which XLA inserts automatically from the
  sharding annotations (GSPMD).
* ``tp`` — observation channels. For wide populations (hundreds of Poisson
  channels) the decoder/likelihood and the recognition input matmul shard
  over channels.

Time is never parallelized: the filter is sequential by construction
(each step's SGD/RLS updates feed the next step's parameters).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("dp", "tp"),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    Default layout with the default 2-axis ``axis_names``: a small fixed
    model-parallel factor ``tp=2`` when the device count is even (so
    ``dp = n/2``), else everything on ``dp``. Pass ``shape=`` for an
    explicit layout, or ``axis_names=("dp",)`` for all-data-parallel.
    Note: ``tp`` only shards channels when ``ydim`` is even (see
    :func:`data_sharding`) — for odd ``ydim`` prefer a 1-axis mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            # put a small model-parallel factor on tp when it divides evenly
            tp = 2 if (len(axis_names) > 1 and n % 2 == 0 and n > 1) else 1
            shape = (n // tp, tp) + (1,) * (len(axis_names) - 2)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])
