"""Linear decoder (observation model).

Functional counterpart of ``/root/reference/vjf/model.py:21-42``
(``LinearDecoder``): a point decode for sampled latents, and a moment-match
push of a diagonal Gaussian through the linear map. The reference builds the
full ``C S S^T C^T`` matrix and takes its diagonal with a symmetry assert;
the diagonal is just ``sum_i C_ji^2 exp(logvar_i)`` — same math, one fused
elementwise-matmul on TPU, no (ydim, ydim) intermediate.

Note: the filter loop always decodes a *sample* (``vjf/model.py:120``, "NOTE:
closed-form did not work well"); the Gaussian path exists for API parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..types import Gaussian
from .recognition import LinearParams, apply_linear, init_linear


def init_decoder(key: jax.Array, xdim: int, ydim: int, dtype=jnp.float32) -> LinearParams:
    return init_linear(key, xdim, ydim, bias=True, dtype=dtype)


def decode(params: LinearParams, x: Array) -> Array:
    """Point decode of a latent sample."""
    return apply_linear(params, x)


def decode_gaussian(params: LinearParams, q: Gaussian) -> Gaussian:
    """Push a diagonal Gaussian through the linear map, keeping the diagonal
    of the output covariance — behavior of ``vjf/model.py:31-40``."""
    mean = apply_linear(params, q.mean)
    var = jnp.exp(q.logvar) @ (params.w.T * params.w.T)   # (B,x) @ (x,y): C_ji^2
    return Gaussian(mean, jnp.log(var))
