from dreamer_tpu.envs.adaptors import (ActionRepeat, CarRacerAdaptor, CropObservation,
                                       DroneAdaptor, PixelObservation,
                                       RenderSkippingActionRepeat, make_env)
from dreamer_tpu.envs.fake import FakeEnv
from dreamer_tpu.envs.vector import AsyncEnvFarm, EnvFarm

__all__ = [
    "ActionRepeat",
    "RenderSkippingActionRepeat",
    "CarRacerAdaptor",
    "CropObservation",
    "DroneAdaptor",
    "make_env",
    "PixelObservation",
    "FakeEnv",
    "EnvFarm",
    "AsyncEnvFarm",
]
