from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint
from .profiling import trace_context, StageTimer

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "trace_context",
    "StageTimer",
]
