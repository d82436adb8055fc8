"""Actor and critic networks (reference: Agent.py:174-241).

Both consume the concatenated [h ‖ flat(z)] state.  The actor's mu head is
zero-initialised (weights AND bias, Agent.py:188-189) so the initial policy
is centred at tanh(0) = 0 with sigma ≈ softplus(log_sig_head(x)) + 1e-3.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreamer_tpu.core.dists import actor_mu_sigma, tanh_normal_sample
from dreamer_tpu.nets.mlp import ln_silu_trunk


class Actor(nn.Module):
    action_dim: int
    hidden_1: int = 200
    hidden_2: int = 200
    min_std: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, z_flat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mu, sigma), each (..., action_dim), in float32."""
        # Reference concat order is [h ‖ flat(z)] (Agent.py:193).
        x = jnp.concatenate([h, z_flat], axis=-1).astype(self.dtype)
        x = ln_silu_trunk(x, (self.hidden_1, self.hidden_2), self.dtype)
        mu_raw = nn.Dense(self.action_dim, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, name="mu_head")(x)
        log_sig_raw = nn.Dense(self.action_dim, dtype=self.dtype, name="log_sig_head")(x)
        return actor_mu_sigma(mu_raw.astype(jnp.float32),
                              log_sig_raw.astype(jnp.float32),
                              min_std=self.min_std)


def act(mu: jnp.ndarray, sigma: jnp.ndarray, key: jax.Array | None,
        deterministic: bool = False) -> jnp.ndarray:
    """Action from (mu, sigma): tanh(mu) if deterministic else reparameterised
    tanh-Normal sample (Agent.py:202-210)."""
    if deterministic:
        return jnp.tanh(mu)
    return tanh_normal_sample(mu, sigma, key)


class Critic(nn.Module):
    num_buckets: int = 255
    hidden_1: int = 200
    hidden_2: int = 200
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, z_flat: jnp.ndarray) -> jnp.ndarray:
        """Returns twohot value logits (..., num_buckets) in float32."""
        x = jnp.concatenate([h, z_flat], axis=-1).astype(self.dtype)
        x = ln_silu_trunk(x, (self.hidden_1, self.hidden_2), self.dtype)
        return nn.Dense(self.num_buckets, dtype=self.dtype)(x).astype(jnp.float32)
