"""Drone path smoke tests (reference: Adaptors.py:6-22, README.md:7 stretch
goal).  PyFlyt itself is an optional dependency that is NOT installed in this
image; everything testable without it is tested here, and the gated import
error is asserted to be actionable."""

import numpy as np
import pytest

from dreamer_tpu.envs import make_env
from dreamer_tpu.envs.adaptors import DroneAdaptor
from dreamer_tpu.envs.fake import FakeEnv


def _has_pyflyt() -> bool:
    try:
        import PyFlyt.gym_envs  # noqa: F401

        return True
    except ImportError:
        return False


class TestDroneAdaptor:
    def test_action_mapping(self):
        """The reference maps [-1,1]^4 identically onto (vx, vy, vz,
        yaw-rate) (Adaptors.py:11-22); the wrapper must preserve values,
        order, and emit float32."""
        env = DroneAdaptor(FakeEnv(obs_size=(16, 16), action_dim=4))
        a = np.array([0.5, -0.25, 1.0, -1.0], dtype=np.float32)
        mapped = env.action(a)
        np.testing.assert_array_equal(mapped, a)
        assert mapped.dtype == np.float32
        assert env.action_space.shape == (4,)
        assert float(env.action_space.low[0]) == -1.0

    def test_wrapped_env_steps(self):
        env = DroneAdaptor(FakeEnv(obs_size=(16, 16), action_dim=4))
        obs, _ = env.reset(seed=0)
        obs2, reward, term, trunc, _ = env.step(env.action_space.sample())
        assert obs2.shape == obs.shape
        assert np.isfinite(reward)


@pytest.mark.skipif(_has_pyflyt(), reason="PyFlyt installed: gate not active")
def test_pyflyt_gate_is_actionable():
    """Without PyFlyt, the drone configs must fail fast with an install
    hint — not an opaque AttributeError mid-run (the reference imports
    PyFlyt unconditionally at module scope, Adaptors.py:4, breaking every
    env for users without it)."""
    with pytest.raises(ImportError, match="PyFlyt"):
        make_env("PyFlyt/QuadX-Hover-v2", obs_size=(64, 64))


@pytest.mark.skipif(not _has_pyflyt(), reason="PyFlyt not installed")
@pytest.mark.slow
def test_pyflyt_env_builds():
    env = make_env("PyFlyt/QuadX-Hover-v2", obs_size=(64, 64))
    obs, _ = env.reset(seed=0)
    assert obs.shape == (64, 64, 3)


# --------------------------------------------------------------------- #
# PyFlyt-shaped stub: everything of the drone path EXCEPT the physics.
# The build image has no network egress, so the optional PyFlyt package
# cannot be installed here; this stub reproduces its interface surface —
# state-vector observation, velocity-mode [-1,1]^4 action space, and an
# RGBA rgb_array render (pybullet renders RGBA, which PixelObservation
# must slice to RGB) — so the full wrapper stack and the shipped
# configs/drone.yaml train end-to-end against it.
# --------------------------------------------------------------------- #

import gymnasium as gym


class PyFlytLikeQuadX(gym.Env):
    """Interface stand-in for PyFlyt/QuadX-Waypoints-v4 (state obs Box,
    action Box(-1,1,(4,)), render_mode='rgb_array' returning RGBA)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 30}

    def __init__(self, render_size=(48, 48)):
        self.observation_space = gym.spaces.Box(-np.inf, np.inf, (21,),
                                                dtype=np.float64)
        self.action_space = gym.spaces.Box(-1.0, 1.0, (4,), dtype=np.float32)
        self.render_mode = "rgb_array"
        self._render_size = render_size
        self._state = np.zeros(21)
        self._t = 0

    def reset(self, *, seed=None, options=None):
        super().reset(seed=seed)
        self._state = self.np_random.standard_normal(21)
        self._t = 0
        return self._state.copy(), {}

    def step(self, action):
        self._t += 1
        self._state[:4] += 0.1 * np.asarray(action, np.float64)
        reward = float(-np.abs(self._state[:3]).sum())
        term = self._t >= 60
        return self._state.copy(), reward, term, False, {}

    def render(self):
        h, w = self._render_size
        # RGBA on purpose: pybullet-backed renders carry an alpha channel.
        frame = np.zeros((h, w, 4), np.uint8)
        x = int((np.tanh(self._state[0]) * 0.5 + 0.5) * (w - 8))
        frame[h // 2 - 4:h // 2 + 4, x:x + 8, :3] = 255
        frame[..., 3] = 255
        return frame


def _drone_stack(repeat=2, obs_size=(64, 64)):
    """Mirror make_env's PyFlyt branch (adaptors.py:223-237) over the stub."""
    from dreamer_tpu.envs.adaptors import (ActionRepeat, PixelObservation,
                                           ResizeObservation)

    env = ActionRepeat(PyFlytLikeQuadX(), repeat=repeat)
    env = PixelObservation(env)
    env = ResizeObservation(env, obs_size)
    return DroneAdaptor(env)


class TestDroneStack:
    def test_wrapper_stack_shapes_and_rgba_slice(self):
        env = _drone_stack()
        obs, _ = env.reset(seed=0)
        assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
        obs2, reward, term, trunc, _ = env.step(
            np.array([0.5, -0.5, 1.0, 0.0], np.float32))
        assert obs2.shape == (64, 64, 3)
        assert np.isfinite(reward)

    @pytest.mark.slow
    def test_drone_config_trains_end_to_end(self, tmp_path):
        """The SHIPPED configs/drone.yaml (scaled to test size) must run the
        whole pipeline — rollout over the drone wrapper stack, replay, WM+AC
        updates, eval, checkpoint — with action_dim=4 and finite losses."""
        from dreamer_tpu.config import DreamerConfig
        from dreamer_tpu.orchestrator import Dreamer

        cfg = DreamerConfig.from_yaml("configs/drone.yaml", overrides=[
            "wm.hidden_dim=32", "wm.latent_rows=4", "wm.latent_classes=4",
            "wm.obs_size=[32, 32]",
            "wm.encoder_filters_1=4", "wm.encoder_filters_2=8",
            "wm.encoder_hidden=16", "wm.decoder_filters_1=4",
            "wm.decoder_filters_2=8", "wm.decoder_hidden=16",
            "wm.dyn_hidden_1=16", "wm.dyn_hidden_2=16",
            "wm.rew_hidden_1=16", "wm.rew_hidden_2=16",
            "wm.cont_hidden_1=16", "wm.cont_hidden_2=16",
            "wm.reward_buckets=31",
            "agent.actor_hidden_1=16", "agent.actor_hidden_2=16",
            "agent.critic_hidden_1=16", "agent.critic_hidden_2=16",
            "agent.critic_buckets=31",
            "train.horizon=5", "train.batch_size=4",
            "train.sequence_length=8", "train.buffer_size=512",
            "train.training_iterations=2", "train.random_iterations=1",
            "train.eval_every=2", "train.eval_episodes=1",
            "train.final_eval_episodes=1", "train.checkpoint_every=2",
            "env.num_envs=2", "env.async_envs=false",
            "runtime.mesh_shape=null", "runtime.compute_dtype=float32",
            f"runtime.checkpoint_dir={tmp_path}/models",
            f"runtime.log_dir={tmp_path}/logs",
        ])
        assert cfg.env.action_dim == 4 and cfg.env.action_repeat == 2
        dreamer = Dreamer(
            cfg, env_factory=lambda: _drone_stack(repeat=2, obs_size=(32, 32)))
        reward = dreamer.train(progress=False)
        assert np.isfinite(reward)
        import os

        assert os.path.exists(f"{tmp_path}/models/ckpt_2")
