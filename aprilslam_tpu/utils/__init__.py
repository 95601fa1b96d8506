from .checkpoint import CheckpointManager
from .profiling import StageTimer, FpsCounter, trace

__all__ = ["CheckpointManager", "StageTimer", "FpsCounter", "trace"]
