from dreamer_tpu.utils.checkpoint import CheckpointManager
from dreamer_tpu.utils.metrics import MetricsLogger

__all__ = ["CheckpointManager", "MetricsLogger"]
