from . import checkpoint, compile_cache, debugging, metrics, ragged
from .checkpoint import FitLoopState, load_checkpoint, load_config, save_checkpoint
from .compile_cache import enable_compilation_cache
from .debugging import assert_all_finite, enable_nan_debugging
from .metrics import MetricsWriter, StepTimer, multiplex, profiler_trace, progress_callback
from .ragged import PaddedTrials, pad_trials, split_trials

__all__ = [
    "checkpoint",
    "compile_cache",
    "enable_compilation_cache",
    "metrics",
    "ragged",
    "PaddedTrials",
    "pad_trials",
    "split_trials",
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
