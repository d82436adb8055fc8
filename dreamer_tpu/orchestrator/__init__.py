from dreamer_tpu.orchestrator.dreamer import Dreamer

__all__ = ["Dreamer"]
