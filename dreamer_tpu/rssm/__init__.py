from dreamer_tpu.rssm.rssm import RSSM, ImaginedTrajectory, ObservedSequence

__all__ = ["RSSM", "ImaginedTrajectory", "ObservedSequence"]
