"""Deterministic fake pixel environment for fast integration tests and CPU
benchmarks — the test double the reference lacks (SURVEY §4: "a fake
deterministic environment (no Box2D) for fast integration tests").

Dynamics: a dot moves on a 2D plane under the (first two dims of the) action;
the observation renders the dot position as a bright square on a gradient
background.  Reward is higher near the centre, so a learnable policy exists.
Episodes truncate after ``episode_len`` steps.  Fully deterministic given the
reset seed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import gymnasium as gym
import numpy as np


class FakeEnv(gym.Env):
    metadata = {"render_modes": []}

    def __init__(self, obs_size: Tuple[int, int] = (64, 64), action_dim: int = 3,
                 episode_len: int = 100):
        self.obs_size = obs_size
        self.action_dim = action_dim
        self.episode_len = episode_len
        self.observation_space = gym.spaces.Box(
            low=0, high=255, shape=(obs_size[0], obs_size[1], 3), dtype=np.uint8)
        self.action_space = gym.spaces.Box(low=-1, high=1, shape=(action_dim,),
                                           dtype=np.float32)
        self._pos = np.zeros(2, np.float32)
        self._t = 0
        self._rng = np.random.RandomState(0)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._rng = np.random.RandomState(seed)
        self._pos = self._rng.uniform(-0.8, 0.8, size=2).astype(np.float32)
        self._t = 0
        return self._render_obs(), {}

    def step(self, action):
        a = np.asarray(action, np.float32)[:2]
        self._pos = np.clip(self._pos + 0.1 * a, -1.0, 1.0)
        self._t += 1
        reward = float(1.0 - np.linalg.norm(self._pos))
        terminated = False
        truncated = self._t >= self.episode_len
        return self._render_obs(), reward, terminated, truncated, {}

    def _render_obs(self) -> np.ndarray:
        h, w = self.obs_size
        ramp = np.linspace(0, 80, w, dtype=np.float32)
        obs = np.broadcast_to(ramp[None, :, None], (h, w, 3)).copy()
        cy = int((self._pos[1] + 1) / 2 * (h - 9))
        cx = int((self._pos[0] + 1) / 2 * (w - 9))
        obs[cy:cy + 8, cx:cx + 8, :] = 255.0
        obs[:, :, 2] += self._t % 50  # faint time signal for the dynamics model
        return np.clip(obs, 0, 255).astype(np.uint8)
