from dreamer_tpu.replay.buffer import ReplayBuffer, ReplayState

__all__ = ["ReplayBuffer", "ReplayState"]
