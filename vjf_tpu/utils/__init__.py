from . import checkpoint, debugging, metrics
from .checkpoint import FitLoopState, load_checkpoint, load_config, save_checkpoint
from .debugging import assert_all_finite, enable_nan_debugging
from .metrics import MetricsWriter, StepTimer, multiplex, profiler_trace, progress_callback

__all__ = [
    "checkpoint",
    "metrics",
    "FitLoopState",
    "save_checkpoint",
    "load_checkpoint",
    "load_config",
    "MetricsWriter",
    "StepTimer",
    "multiplex",
    "profiler_trace",
    "progress_callback",
]
