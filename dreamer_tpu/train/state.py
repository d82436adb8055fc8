"""Training-state pytrees.

Everything that evolves during training is an explicit pytree so the whole
step is a pure jitted function and a checkpoint is exactly one pytree
(params + optimizer states + return-scale EMA + RNG + iteration), enabling
the full resume the reference lacks (SURVEY §5: save-only checkpoints).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp


class WMTrainState(NamedTuple):
    params: Any          # WMNets params pytree
    opt_state: Any       # optax AdamW state


class ACTrainState(NamedTuple):
    actor_params: Any
    critic_params: Any
    target_critic_params: Any   # soft-updated copy (Agent.py:50-53)
    actor_opt: Any
    critic_opt: Any
    s_scale: jnp.ndarray        # () f32 return-normalisation EMA (Agent.py:60)


class DreamerState(NamedTuple):
    wm: WMTrainState
    ac: ACTrainState
    step: jnp.ndarray           # () int32 — global training iteration
