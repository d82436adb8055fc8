"""Host-side vectorized env farm.

The reference steps ONE env inline with training (Dreamer.py:193-226).  Here N
envs run per host, stepped synchronously (Box2D releases the GIL poorly, so a
simple loop ~= SyncVectorEnv; an async/process pool can slot in behind the
same interface later).

Two auto-reset modes, selected by ``next_step`` (cfg.env.next_step_autoreset):

- SAME-STEP (default, reference parity — Dreamer.py:214-223): the terminal
  observation is DISCARDED; ``step`` returns the reset obs for finished envs
  together with ``done=True``.
- NEXT-STEP: the terminal observation IS returned (with ``done=True``); the
  reset happens on the FOLLOWING ``step`` call, which ignores the action and
  returns the reset obs with ``reward=0, done=False, first=True``.  This is
  what lets the world model train on terminal transitions (the crash frame +
  its +-100 reward + continue=0) — see config.EnvConfig.next_step_autoreset.

``step`` returns ``(obs, reward, done, first)`` in both modes; in same-step
mode ``first == done`` (the returned obs for a done env IS a reset frame).
Each reset consumes the next seed from a monotonically increasing per-farm
counter (the reference does ``self.seed += 1`` per reset).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np


class EnvFarm:
    def __init__(self, env_fns: Sequence[Callable], seed: int,
                 next_step: bool = False):
        self.envs = [fn() for fn in env_fns]
        self.num_envs = len(self.envs)
        self.seed = seed
        self.next_step = next_step
        self._needs_reset = np.zeros(self.num_envs, bool)
        # Seed the action spaces so random-policy rollouts are reproducible
        # (the reference samples from an unseeded space, Dreamer.py:195).
        for i, env in enumerate(self.envs):
            env.action_space.seed(seed + i)
        self._action_space = self.envs[0].action_space

    def reset_all(self) -> np.ndarray:
        """Reset every env (seed, seed+1, ...) and return stacked obs (N, H, W, 3)."""
        obs = []
        self._needs_reset[:] = False
        for env in self.envs:
            o, _ = env.reset(seed=self.seed)
            self.seed += 1
            obs.append(o)
        return np.stack(obs).astype(np.uint8)

    def step(self, actions: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Step all envs.  Returns (obs (N,H,W,3) uint8, reward (N,),
        done (N,), first (N,)) — see the module docstring for the two
        auto-reset modes."""
        obs_out, rew_out, done_out, first_out = [], [], [], []
        for i, (env, action) in enumerate(zip(self.envs, actions)):
            if self.next_step and self._needs_reset[i]:
                # Delayed reset step: the action is IGNORED (the env is
                # between episodes); reward 0, not done, obs = reset frame.
                o, _ = env.reset(seed=self.seed)
                self.seed += 1
                self._needs_reset[i] = False
                r, done, first = 0.0, False, True
            else:
                o, r, term, trunc, _ = env.step(np.asarray(action))
                done = bool(term or trunc)
                first = False
                if done:
                    if self.next_step:
                        # Keep the terminal obs; reset on the NEXT call.
                        self._needs_reset[i] = True
                    else:
                        o, _ = env.reset(seed=self.seed)
                        self.seed += 1
                        first = True   # returned obs is the reset frame
            obs_out.append(o)
            rew_out.append(r)
            done_out.append(done)
            first_out.append(first)
        return (np.stack(obs_out).astype(np.uint8),
                np.asarray(rew_out, np.float32),
                np.asarray(done_out, bool),
                np.asarray(first_out, bool))

    def sample_actions(self) -> np.ndarray:
        return np.stack([self._action_space.sample() for _ in range(self.num_envs)])

    def close(self):
        for env in self.envs:
            env.close()


class AsyncEnvFarm:
    """Subprocess-parallel env farm on gymnasium's AsyncVectorEnv, with the
    same interface and auto-reset semantics as EnvFarm: SAME_STEP mode
    discards terminal obs (reference parity); NEXT_STEP mode returns the
    terminal obs and resets one step later (gymnasium AutoresetMode.NEXT_STEP
    ignores the resetting envs' actions and returns reward 0 for them).

    Use for many-env configs on multicore hosts (BASELINE configs 3-5:
    64-512 envs/host); EnvFarm's in-process loop is fine for 1-16 envs.
    Seeding: one spawned seed sequence per env from the initial farm seed
    (gymnasium reseeds internally on auto-reset, unlike EnvFarm's
    seed-counter — reproducible per farm seed either way).
    """

    def __init__(self, env_fns: Sequence[Callable], seed: int,
                 next_step: bool = False):
        import gymnasium as gym
        from gymnasium.vector import AutoresetMode

        self.vec = gym.vector.AsyncVectorEnv(
            list(env_fns),
            autoreset_mode=(AutoresetMode.NEXT_STEP if next_step
                            else AutoresetMode.SAME_STEP))
        self.num_envs = len(env_fns)
        self.seed = seed
        self.next_step = next_step
        self._prev_done = np.zeros(self.num_envs, bool)
        self.vec.action_space.seed(seed)
        self._single_action_space = self.vec.single_action_space

    def reset_all(self) -> np.ndarray:
        obs, _ = self.vec.reset(seed=self.seed)
        # Advance the counter so a later reset (e.g. after checkpoint resume)
        # does not replay episode seeds already stored in the replay buffer.
        # (Internal per-episode auto-resets reseed from gymnasium's spawned
        # sequence and are not counted — documented approximation.)
        self.seed += self.num_envs
        self._prev_done[:] = False
        return np.asarray(obs, np.uint8)

    def step(self, actions: np.ndarray):
        obs, rew, term, trunc, _ = self.vec.step(np.asarray(actions))
        done = np.logical_or(term, trunc)
        if self.next_step:
            # The envs that reported done LAST step were reset on this one
            # (their obs is the reset frame, reward 0, done False).
            first = self._prev_done.copy()
            self._prev_done = np.asarray(done, bool)
        else:
            first = np.asarray(done, bool)   # same-step: reset obs arrives now
        return (np.asarray(obs, np.uint8), np.asarray(rew, np.float32),
                np.asarray(done, bool), first)

    def sample_actions(self) -> np.ndarray:
        return np.asarray(self.vec.action_space.sample())

    def close(self):
        self.vec.close()
