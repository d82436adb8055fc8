"""Device-resident (HBM) circular replay buffer.

TPU-native redesign of the reference's host-RAM numpy buffer (Buffer.py:5-63):
the arrays are jnp device buffers; writes are donated in-place batched scatters
(one device call per rollout round, not one per transition); sequence sampling
is a batched gather that feeds the jitted update without any host round-trip.

Semantics preserved from the reference:
- obs stored uint8 (Buffer.py:7), rewards stored pre-symlogged (Buffer.py:24-26),
  continues as float {0,1}.
- Uniform random contiguous-sequence sampling over [0, size - T + 1) with a
  single re-roll for windows that straddle the write head when the buffer is
  full (Buffer.py:39-48).  Like the reference, the re-roll is not guaranteed
  collision-free — a re-rolled window may itself straddle the head.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dreamer_tpu.core.math import symlog


class ReplayState(NamedTuple):
    """Pytree of device arrays; pass through jitted fns, donate on write."""

    obs: jnp.ndarray       # (capacity, H, W, 3) uint8
    action: jnp.ndarray    # (capacity, A) float32
    reward: jnp.ndarray    # (capacity,) float32 — symlog applied at write
    cont: jnp.ndarray      # (capacity,) float32
    next_idx: jnp.ndarray  # () int32
    size: jnp.ndarray      # () int32


class ReplayBuffer:
    """Static-shape wrapper; all methods are jitted with donation on writes."""

    def __init__(self, capacity: int, sequence_length: int, action_dim: int,
                 obs_size: Tuple[int, int]):
        self.capacity = capacity
        self.sequence_length = sequence_length
        self.action_dim = action_dim
        self.obs_size = obs_size
        self._add = jax.jit(self._add_impl, donate_argnums=0)
        self._sample = jax.jit(self._sample_impl, static_argnums=2)

    def init_state(self) -> ReplayState:
        h, w = self.obs_size
        return ReplayState(
            obs=jnp.zeros((self.capacity, h, w, 3), jnp.uint8),
            action=jnp.zeros((self.capacity, self.action_dim), jnp.float32),
            reward=jnp.zeros((self.capacity,), jnp.float32),
            cont=jnp.zeros((self.capacity,), jnp.float32),
            next_idx=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ #
    # Write
    # ------------------------------------------------------------------ #

    def add_batch(self, state: ReplayState, obs: jnp.ndarray, action: jnp.ndarray,
                  reward: jnp.ndarray, cont: jnp.ndarray) -> ReplayState:
        """Append N transitions (ring write).  ``reward`` is RAW — symlog is
        applied here, matching the reference's symlog-at-write (Buffer.py:24-26).

        obs: (N, H, W, 3) uint8; action: (N, A); reward, cont: (N,).
        The input state is donated — do not reuse it after this call.
        """
        return self._add(state, obs, action, reward, cont)

    def _add_impl(self, state: ReplayState, obs, action, reward, cont) -> ReplayState:
        n = obs.shape[0]
        idx = (state.next_idx + jnp.arange(n, dtype=jnp.int32)) % self.capacity
        return ReplayState(
            obs=state.obs.at[idx].set(obs.astype(jnp.uint8)),
            action=state.action.at[idx].set(action.astype(jnp.float32)),
            reward=state.reward.at[idx].set(symlog(reward.astype(jnp.float32))),
            cont=state.cont.at[idx].set(cont.astype(jnp.float32)),
            next_idx=(state.next_idx + n) % self.capacity,
            size=jnp.minimum(state.size + n, self.capacity),
        )

    # ------------------------------------------------------------------ #
    # Sample
    # ------------------------------------------------------------------ #

    def sample(self, state: ReplayState, key: jax.Array, batch_size: int):
        """Sample (obs_u8 (B,T,H,W,3), action (B,T,A), reward (B,T), cont (B,T)).

        Caller must ensure size >= sequence_length (the reference raises a
        ValueError, Buffer.py:33-34; here the host-side orchestrator checks).
        """
        return self._sample(state, key, batch_size)

    def _sample_impl(self, state: ReplayState, key: jax.Array, batch_size: int):
        T = self.sequence_length
        valid_starts = jnp.maximum(state.size - T + 1, 1)
        k1, k2 = jax.random.split(key)
        starts = jax.random.randint(k1, (batch_size,), 0, valid_starts)
        # Re-roll windows that strictly contain the write head (only possible
        # when the buffer has wrapped): Buffer.py:39-48.
        full = state.size == self.capacity
        collide = (starts < state.next_idx) & (state.next_idx < starts + T)
        reroll = jax.random.randint(k2, (batch_size,), 0, valid_starts)
        starts = jnp.where(full & collide, reroll, starts)
        idx = (starts[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]) % self.capacity
        return (
            state.obs[idx],
            state.action[idx],
            state.reward[idx],
            state.cont[idx],
        )
