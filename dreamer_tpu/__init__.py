"""dreamer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) DreamerV3 actor-learner framework.

Re-implements the full capability surface of the reference PyTorch implementation
(youngers2006/Dreamer) with a TPU-first architecture:

- RSSM recurrence (GRU + categorical stochastic latents) as jitted ``lax.scan``
  with an optional fused Pallas GRU cell (``dreamer_tpu.ops.gru_pallas``).
- Conv VAE encoder/decoder batched over (batch, time) in single MXU-friendly calls.
- The H-step imagination rollout and actor-critic update compile into ONE
  on-device XLA program (``dreamer_tpu.train.agent.ac_update``).
- Replay buffer lives in device HBM with donated in-place ring writes
  (``dreamer_tpu.replay.buffer``).
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding over a ``data``
  axis (``dreamer_tpu.parallel``); gradients sync via XLA collectives on ICI.

Loss semantics (symlog/twohot, KL balancing, free bits, lambda-returns, return
normalisation) match the reference exactly — see docstring citations of the
form ``<File>.py:<line>`` which refer to files of the reference repo.
"""

__version__ = "0.1.0"

from dreamer_tpu.config import DreamerConfig  # noqa: F401
