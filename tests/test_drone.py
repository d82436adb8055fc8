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
