"""Env wrapper + farm tests (reference semantics: Adaptors.py, Dreamer.py rollout)."""

import numpy as np
import pytest

from dreamer_tpu.envs import (ActionRepeat, CarRacerAdaptor, CropObservation,
                              EnvFarm, FakeEnv, make_env)


class TestFakeEnv:
    def test_deterministic(self):
        e1, e2 = FakeEnv(), FakeEnv()
        o1, _ = e1.reset(seed=7)
        o2, _ = e2.reset(seed=7)
        np.testing.assert_array_equal(o1, o2)
        a = np.array([0.5, -0.3, 0.0], np.float32)
        s1 = e1.step(a)
        s2 = e2.step(a)
        np.testing.assert_array_equal(s1[0], s2[0])
        assert s1[1] == s2[1]

    def test_truncates(self):
        env = FakeEnv(episode_len=5)
        env.reset(seed=0)
        for i in range(5):
            _, _, term, trunc, _ = env.step(np.zeros(3))
        assert trunc and not term

    def test_obs_space(self):
        env = FakeEnv(obs_size=(48, 48))
        obs, _ = env.reset(seed=0)
        assert obs.shape == (48, 48, 3) and obs.dtype == np.uint8


class TestAdaptors:
    def test_car_racer_action_mapping(self):
        # (steer, gas, brake): gas/brake mapped [-1,1] -> [0,1] (Adaptors.py:29-33)
        wrapper = CarRacerAdaptor.__new__(CarRacerAdaptor)
        out = CarRacerAdaptor.action(wrapper, np.array([0.5, 1.0, -1.0]))
        np.testing.assert_allclose(out, [0.5, 1.0, 0.0])

    def test_crop(self):
        env = CropObservation.__new__(CropObservation)
        obs = np.arange(96 * 96 * 3, dtype=np.uint8).reshape(96, 96, 3)
        env.rows = 84
        assert CropObservation.observation(env, obs).shape == (84, 96, 3)

    def test_action_repeat_sums_rewards(self):
        env = ActionRepeat(FakeEnv(episode_len=100), repeat=4)
        env.reset(seed=0)
        _, r, _, _, _ = env.step(np.zeros(3))
        single = FakeEnv(episode_len=100)
        single.reset(seed=0)
        total = sum(single.step(np.zeros(3))[1] for _ in range(4))
        assert r == pytest.approx(total)

    def test_action_repeat_early_break(self):
        env = ActionRepeat(FakeEnv(episode_len=2), repeat=4)
        env.reset(seed=0)
        _, _, term, trunc, _ = env.step(np.zeros(3))
        assert trunc  # stopped at episode end inside the repeat loop

    def test_make_env_fake(self):
        env = make_env("fake", obs_size=(32, 32))
        obs, _ = env.reset(seed=0)
        assert obs.shape == (32, 32, 3)

    def test_fast_repeat_early_termination_rerenders(self):
        """When the episode ends mid-repeat, RenderSkippingActionRepeat must
        return a REAL render of the terminal frame, not the stale stubbed one
        — and must only render frames that are actually observed."""
        import gymnasium as gym
        from dreamer_tpu.envs import RenderSkippingActionRepeat

        class RenderCountingEnv(gym.Env):
            """Mimics CarRacing's obs-from-render step() structure."""
            observation_space = gym.spaces.Box(0, 255, (8, 8, 3), np.uint8)
            action_space = gym.spaces.Box(-1, 1, (1,), np.float32)

            def __init__(self, terminate_at):
                self.renders = 0
                self.frames = 0
                self.state = None
                self.terminate_at = terminate_at

            def _render(self, mode):
                self.renders += 1
                return np.full((8, 8, 3), self.frames, np.uint8)

            def reset(self, seed=None, options=None):
                self.frames = 0
                self.state = self._render("state_pixels")
                return self.state, {}

            def step(self, action):
                self.frames += 1
                self.state = self._render("state_pixels")
                return (self.state, 1.0, self.frames >= self.terminate_at,
                        False, {})

        # Early termination at frame 2 of a 4-repeat: re-render fires.
        env = RenderSkippingActionRepeat(RenderCountingEnv(terminate_at=2), repeat=4)
        env.reset()
        obs, reward, done, trunc, _ = env.step(np.zeros(1, np.float32))
        assert done and reward == 2.0
        assert obs[0, 0, 0] == 2, "terminal obs must show the terminal frame"
        assert env.unwrapped.renders == 2  # reset + terminal re-render only

        # No termination: exactly one render per agent step, of the last frame.
        env = RenderSkippingActionRepeat(RenderCountingEnv(terminate_at=100), repeat=4)
        env.reset()
        obs, reward, done, trunc, _ = env.step(np.zeros(1, np.float32))
        assert not done and reward == 4.0
        assert obs[0, 0, 0] == 4
        assert env.unwrapped.renders == 2  # reset + final frame only


class TestEnvFarm:
    def test_lockstep_and_autoreset(self):
        farm = EnvFarm([lambda: FakeEnv(episode_len=3)] * 2, seed=0)
        obs = farm.reset_all()
        assert obs.shape == (2, 64, 64, 3)
        seeds_before = farm.seed
        for i in range(3):
            obs, rew, done, first = farm.step(np.zeros((2, 3)))
        assert done.all()  # both truncate at step 3
        assert first.all()  # same-step mode: the returned obs IS a reset frame
        assert farm.seed == seeds_before + 2  # one reset seed consumed per env
        # returned obs is the RESET obs (fresh episode), not terminal
        obs2, _, done2, first2 = farm.step(np.zeros((2, 3)))
        assert not done2.any() and not first2.any()

    def test_distinct_seeds_give_distinct_obs(self):
        farm = EnvFarm([lambda: FakeEnv()] * 3, seed=5)
        obs = farm.reset_all()
        assert not np.array_equal(obs[0], obs[1])


@pytest.mark.slow
class TestCarRacingStack:
    def test_full_wrapper_stack(self):
        env = make_env("CarRacing-v3")
        obs, _ = env.reset(seed=0)
        assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
        obs, r, term, trunc, _ = env.step(np.array([0.0, 0.5, -1.0]))
        assert obs.shape == (64, 64, 3)
        env.close()

    def test_fast_repeat_trajectory_identical(self):
        """The render-skipping fast path must produce EXACTLY the reference
        wrapper stack's trajectory: same obs, rewards, and termination for
        the same seed and action sequence."""
        fast = make_env("CarRacing-v3", fast_repeat=True)
        ref = make_env("CarRacing-v3", fast_repeat=False)
        obs_f, _ = fast.reset(seed=7)
        obs_r, _ = ref.reset(seed=7)
        np.testing.assert_array_equal(obs_f, obs_r)
        rng = np.random.default_rng(0)
        for _ in range(40):
            a = rng.uniform(-1, 1, size=3).astype(np.float32)
            of, rf, tf, cf, _ = fast.step(a)
            orr, rr, tr, cr, _ = ref.step(a)
            assert (tf, cf) == (tr, cr)
            assert rf == pytest.approx(rr, abs=1e-9)
            np.testing.assert_array_equal(of, orr)
            if tf or cf:
                break
        fast.close()
        ref.close()


class TestPixelObservation:
    def test_lunar_lander_pixels(self):
        env = make_env("LunarLander-v3", obs_size=(64, 64), action_repeat=2,
                       crop_rows=None)
        obs, _ = env.reset(seed=0)
        assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
        obs, r, term, trunc, _ = env.step(np.array([0.0, 0.0]))
        assert obs.shape == (64, 64, 3)
        env.close()

    def test_bipedal_walker_pixels(self):
        env = make_env("BipedalWalker-v3", obs_size=(64, 64), action_repeat=2,
                       crop_rows=None)
        obs, _ = env.reset(seed=0)
        assert obs.shape == (64, 64, 3) and obs.dtype == np.uint8
        env.close()

    def test_pyflyt_missing_gives_clear_error(self):
        with pytest.raises(ImportError, match="PyFlyt"):
            make_env("PyFlyt/QuadX-Waypoints-v4")


class TestAsyncEnvFarm:
    def test_same_interface_and_autoreset(self):
        from dreamer_tpu.envs import AsyncEnvFarm, FakeEnv

        farm = AsyncEnvFarm([lambda: FakeEnv(episode_len=3)] * 2, seed=0)
        try:
            obs = farm.reset_all()
            assert obs.shape == (2, 64, 64, 3) and obs.dtype == np.uint8
            for _ in range(3):
                obs, rew, done, first = farm.step(np.zeros((2, 3)))
            assert done.all()
            assert first.all()
            assert obs.shape == (2, 64, 64, 3)  # reset obs, not terminal
            obs2, _, done2, first2 = farm.step(np.zeros((2, 3)))
            assert not done2.any() and not first2.any()
            a = farm.sample_actions()
            assert a.shape == (2, 3)
        finally:
            farm.close()

    def test_orchestrator_with_async_farm(self, tmp_path):
        from dreamer_tpu.orchestrator import Dreamer
        from tests.test_orchestrator import smoke_cfg

        cfg = smoke_cfg(tmp_path, **{"env.async_envs": True,
                                     "train.training_iterations": 2,
                                     "train.random_iterations": 1})
        d = Dreamer(cfg)
        d.rollout_policy(random_policy=True)
        assert int(d.buf.size) == cfg.train.sequence_length
        d.farm.close()


class TestResizeFallback:
    def test_numpy_area_matches_cv2(self):
        import cv2

        from dreamer_tpu.envs.adaptors import _resize_area_numpy

        # smooth image: area methods agree up to box-boundary rounding
        yy, xx = np.mgrid[0:84, 0:96]
        obs = np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256], -1).astype(np.uint8)
        ours = _resize_area_numpy(obs, (64, 64))
        ref = cv2.resize(obs, (64, 64), interpolation=cv2.INTER_AREA)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # modular wrap creates a few sharp seams; bulk must agree closely
        assert np.median(diff) <= 3
        assert (diff <= 10).mean() > 0.9

    def test_downscale_smooths_not_subsamples(self):
        from dreamer_tpu.envs.adaptors import _resize_area_numpy

        # checkerboard: area-average gives mid-gray, subsampling gives 0 or 255
        obs = np.indices((96, 96)).sum(0) % 2 * 255
        obs = np.repeat(obs[..., None], 3, axis=2).astype(np.uint8)
        out = _resize_area_numpy(obs, (48, 48))
        assert 100 < out.mean() < 160
        assert out.std() < 64  # mostly uniform gray, not binary


class TestResizeUpscale:
    def test_upscale_no_inf(self):
        from dreamer_tpu.envs.adaptors import _resize_area_numpy

        obs = np.arange(32 * 24 * 3, dtype=np.uint8).reshape(32, 24, 3)
        out = _resize_area_numpy(obs, (64, 64))
        assert out.shape == (64, 64, 3)
        assert np.isfinite(out.astype(np.float64)).all()
        assert out.max() <= 255 and out.min() >= 0


class TestPickleableFactory:
    def test_default_factory_pickles(self, tmp_path):
        import pickle

        from dreamer_tpu.orchestrator import Dreamer
        from tests.test_orchestrator import smoke_cfg

        d = Dreamer(smoke_cfg(tmp_path))
        pickle.dumps(d._env_factory)  # must not raise (spawn-safe)
