from .cache import enable_compilation_cache, configure_runtime, tpu_responsive
from .checkpoint import CheckpointManager
from .profiling import StageTimer, FpsCounter, trace

__all__ = [
    "CheckpointManager",
    "StageTimer",
    "FpsCounter",
    "trace",
    "enable_compilation_cache",
    "configure_runtime",
    "tpu_responsive",
]
