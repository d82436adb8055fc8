from dreamer_tpu.train.state import WMTrainState, ACTrainState, DreamerState
from dreamer_tpu.train.step import Trainer

__all__ = ["WMTrainState", "ACTrainState", "DreamerState", "Trainer"]
