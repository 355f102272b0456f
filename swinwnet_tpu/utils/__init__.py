from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from .profiling import trace_context, StageTimer
from .logging import MetricsLogger
from .debug import nan_check, assert_finite_pytree
from .compilation_cache import enable_persistent_cache

__all__ = [
    "enable_persistent_cache",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "trace_context",
    "StageTimer",
    "MetricsLogger",
    "nan_check",
    "assert_finite_pytree",
]
