"""Sparse Gaussian-process dynamics (the ``vjf.gp`` variant).

The reference snapshot references this module from ``test/test_sgp.py`` but
does not contain it; the API surface is rebuilt from that test (see
SURVEY.md §2.3). Implemented in :mod:`vjf_tpu.gp.sgp` / :mod:`vjf_tpu.gp.covfun`.
"""
from . import covfun
from .sgp import SGP

__all__ = ["SGP", "covfun"]
