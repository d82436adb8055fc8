"""Gymnasium wrappers mirroring the reference's Adaptors.py, plus the env
factory assembling the reference's wrapper stack (train_car_racer.py:29-36):

    Crop(84 rows) -> Resize(64x64) -> CarRacerAdaptor -> ActionRepeat(4)

Observations stay HWC uint8 end to end (the TPU pipeline is NHWC; the
reference transposes to CHW for torch, which we deliberately do not).
"""

from __future__ import annotations

from typing import Optional

import gymnasium as gym
import numpy as np


class CarRacerAdaptor(gym.ActionWrapper):
    """[-1,1]^3 agent actions -> CarRacing (steer, gas, brake)
    (reference: Adaptors.py:24-33): gas/brake rescaled from [-1,1] to [0,1]."""

    def __init__(self, env):
        super().__init__(env)
        self.action_space = gym.spaces.Box(low=-1, high=1, shape=(3,), dtype=np.float32)

    def action(self, action):
        steering = action[0]
        gas = (action[1] + 1) / 2
        brake = (action[2] + 1) / 2
        return np.array([steering, gas, brake], dtype=np.float64)


class DroneAdaptor(gym.ActionWrapper):
    """[-1,1]^4 -> PyFlyt (vx, vy, vz, yaw-rate) (reference: Adaptors.py:6-22).
    PyFlyt is optional — the wrapper itself has no hard dependency."""

    def __init__(self, env):
        super().__init__(env)
        self.action_space = gym.spaces.Box(low=-1, high=1, shape=(4,), dtype=np.float32)

    def action(self, action):
        return np.array([action[0], action[1], action[2], action[3]], dtype=np.float32)


class CropObservation(gym.ObservationWrapper):
    """Crop CarRacing's 96x96 frame to the top ``rows`` rows, removing the
    dashboard (reference: Adaptors.py:35-46, rows=84)."""

    def __init__(self, env, rows: int = 84):
        super().__init__(env)
        h, w, c = env.observation_space.shape
        self.rows = rows
        self.observation_space = gym.spaces.Box(low=0, high=255, shape=(rows, w, c),
                                                dtype=np.uint8)

    def observation(self, obs):
        return obs[: self.rows, :, :]


class ResizeObservation(gym.ObservationWrapper):
    """Area-resize to (size, size) uint8.  Uses cv2.INTER_AREA when present,
    else a numpy area-average fallback with equivalent semantics so the
    dependency stays optional (the reference's gymnasium ResizeObservation
    hard-requires cv2)."""

    def __init__(self, env, size):
        super().__init__(env)
        self.size = tuple(size)
        c = env.observation_space.shape[2]
        self.observation_space = gym.spaces.Box(
            low=0, high=255, shape=(self.size[0], self.size[1], c), dtype=np.uint8)
        try:
            import cv2

            self._cv2 = cv2
        except Exception:  # pragma: no cover - cv2 is present in CI
            self._cv2 = None

    def observation(self, obs):
        if self._cv2 is not None:
            out = self._cv2.resize(obs, (self.size[1], self.size[0]),
                                   interpolation=self._cv2.INTER_AREA)
            return out.astype(np.uint8)
        return _resize_area_numpy(obs, self.size)


def _resize_area_numpy(obs: np.ndarray, size) -> np.ndarray:
    """Area-average fallback resize (no external deps): each output pixel is
    the mean of its (nearest-partitioned) source box — matching
    cv2.INTER_AREA up to box-boundary rounding.  Upscaled dimensions fall
    back to nearest-neighbour (a box partition would have zero-width boxes)."""
    h, w = obs.shape[:2]
    oh, ow = size
    x = obs.astype(np.float32)
    if oh < h:
        y_edges = (np.arange(oh + 1) * h / oh).round().astype(np.int32)
        rows = (y_edges[1:] - y_edges[:-1]).astype(np.float32)[:, None, None]
        x = np.add.reduceat(x, y_edges[:-1], axis=0) / rows
    else:
        x = x[(np.linspace(0, h - 1, oh)).astype(np.int32)]
    if ow < w:
        x_edges = (np.arange(ow + 1) * w / ow).round().astype(np.int32)
        cols = (x_edges[1:] - x_edges[:-1]).astype(np.float32)[None, :, None]
        x = np.add.reduceat(x, x_edges[:-1], axis=1) / cols
    else:
        x = x[:, (np.linspace(0, w - 1, ow)).astype(np.int32)]
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


class PixelObservation(gym.ObservationWrapper):
    """Replace a state-vector observation with the rendered RGB frame, for
    learning state-based envs (LunarLander, BipedalWalker, PyFlyt) from
    pixels (BASELINE configs 2, 4, 5).  Requires the env to be constructed
    with ``render_mode="rgb_array"``.  RGBA renders (e.g. pybullet) are
    sliced to RGB.  Wrap OUTSIDE ActionRepeat so only one frame per agent
    step is rendered."""

    def __init__(self, env):
        super().__init__(env)
        frame = self._frame_shape(env)
        self.observation_space = gym.spaces.Box(low=0, high=255, shape=frame,
                                                dtype=np.uint8)

    @staticmethod
    def _frame_shape(env):
        env.reset(seed=0)
        frame = np.asarray(env.render())
        return frame.shape[:2] + (3,)

    def observation(self, obs):
        return np.asarray(self.env.render(), dtype=np.uint8)[..., :3]


class RenderSkippingActionRepeat(gym.Wrapper):
    """Action repeat placed INNERMOST (directly on the raw env) for envs that
    render their pixel observation inside ``step()`` every physics frame
    (CarRacing-v3: ``self.state = self._render("state_pixels")``).

    CarRacing's rewards and termination are physics-only (tile contacts /
    playfield bounds), and ActionRepeat discards every observation except the
    last (reference: Adaptors.py:48-68) — so the intermediate frames need not
    be rendered at all.  ``_render`` is stubbed for the first repeat-1 frames
    and restored for the observed one, with a real re-render if the episode
    ends early.  Behavior-identical to ``ActionRepeat`` (verified by
    tests/test_envs.py trajectory equivalence) at ~1/repeat the render cost;
    placing it innermost also runs the outer Crop/Resize once per agent step
    instead of once per frame.  On a 2-core host this takes CarRacing rollout
    from ~42 ms to ~13 ms per agent step."""

    def __init__(self, env, repeat: int = 4):
        super().__init__(env)
        self.repeat = repeat
        # CarRacing sets ``.state`` lazily on first reset; only ``._render``
        # is checkable at construction time.
        assert hasattr(env.unwrapped, "_render"), (
            "RenderSkippingActionRepeat needs a raw env that renders its "
            "observation via ._render into .state (e.g. CarRacing); use "
            "ActionRepeat otherwise")

    def step(self, action):
        raw = self.env.unwrapped
        real_render = raw._render
        total_reward = 0.0
        done = truncated = False
        obs, info = None, {}
        rendered = False
        try:
            for i in range(self.repeat):
                last = i == self.repeat - 1
                raw._render = real_render if last else (lambda mode: raw.state)
                obs, reward, d, t, info = self.env.step(action)
                total_reward += float(reward)
                done, truncated = done or d, truncated or t
                rendered = last
                if done or truncated:
                    break
        finally:
            raw._render = real_render
        if not rendered:
            obs = raw.state = real_render("state_pixels")
        return obs, total_reward, done, truncated, info


class ActionRepeat(gym.Wrapper):
    """Repeat each action N times, summing rewards, early-breaking on done
    (reference: Adaptors.py:48-68)."""

    def __init__(self, env, repeat: int = 4):
        super().__init__(env)
        self.repeat = repeat

    def step(self, action):
        total_reward = 0.0
        done = truncated = False
        last_obs, last_info = None, {}
        for _ in range(self.repeat):
            obs, reward, d, t, info = self.env.step(action)
            total_reward += reward
            done = done or d
            truncated = truncated or t
            last_obs, last_info = obs, info
            if done or truncated:
                break
        return last_obs, total_reward, done, truncated, last_info


def make_env(env_id: str, obs_size=(64, 64), action_repeat: int = 4,
             crop_rows: Optional[int] = 84, render_mode: Optional[str] = None,
             max_episode_steps: Optional[int] = None,
             fast_repeat: bool = True) -> gym.Env:
    """Build a pixel env with the reference wrapper stack.

    ``env_id == "fake"`` returns the deterministic test env (no Box2D).
    ``fast_repeat=False`` forces the reference's literal wrapper order
    (Crop -> Resize -> Adaptor -> ActionRepeat) instead of the
    behavior-identical render-skipping fast path for CarRacing.
    """
    if env_id == "fake":
        from dreamer_tpu.envs.fake import FakeEnv

        return FakeEnv(obs_size=obs_size,
                       episode_len=max_episode_steps or 100)

    if env_id.startswith("PyFlyt"):
        # Drone stretch goal (README.md:7 of the reference): optional dep.
        try:
            import PyFlyt.gym_envs  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "PyFlyt is not installed; the drone configs need the optional "
                "PyFlyt dependency (pip install PyFlyt)") from e
        env = gym.make(env_id, render_mode=render_mode or "rgb_array",
                       max_episode_steps=max_episode_steps)
        # ActionRepeat INSIDE PixelObservation: one render per agent step.
        env = ActionRepeat(env, repeat=action_repeat)
        env = PixelObservation(env)
        env = ResizeObservation(env, obs_size)
        return DroneAdaptor(env)

    kwargs = {}
    # State-vector Box2D envs learned FROM PIXELS (BASELINE configs 2/4):
    # render to rgb_array and substitute the frame for the state observation.
    pixels_from_render = env_id.startswith(("LunarLander", "BipedalWalker"))
    if env_id.startswith("CarRacing"):
        kwargs["continuous"] = True
    if env_id.startswith("LunarLander"):
        kwargs["continuous"] = True
    if pixels_from_render and render_mode is None:
        render_mode = "rgb_array"
    env = gym.make(env_id, render_mode=render_mode,
                   max_episode_steps=max_episode_steps, **kwargs)
    if pixels_from_render:
        # ActionRepeat first so intermediate frames are never rendered.
        env = ActionRepeat(env, repeat=action_repeat)
        env = PixelObservation(env)
        return ResizeObservation(env, obs_size)
    if env_id.startswith("CarRacing") and fast_repeat and render_mode is None:
        # Fast path: repeat innermost with intermediate renders skipped; the
        # observation wrappers then run once per agent step.  Trajectories are
        # identical to the reference order below (tests/test_envs.py).
        env = RenderSkippingActionRepeat(env, repeat=action_repeat)
        if crop_rows:
            env = CropObservation(env, crop_rows)
        env = ResizeObservation(env, obs_size)
        return CarRacerAdaptor(env)
    if crop_rows:
        env = CropObservation(env, crop_rows)
    env = ResizeObservation(env, obs_size)
    if env_id.startswith("CarRacing"):
        env = CarRacerAdaptor(env)
    env = ActionRepeat(env, repeat=action_repeat)
    return env
