"""env.next_step_autoreset: the terminal-transition learning path.

The reference discards terminal observations (same-step autoreset,
Dreamer.py:214-223) and masks the WM likelihoods by the continue targets
themselves (WorldModel.py:170-173) — so in ANY terminating env the continue
head never sees a continue=0 example and the reward head never sees the
terminal reward (LunarLander/Bipedal +-100).  Diagnosed round 5 as the
remaining terminating-env blocker: dreams never terminate
(imag_cont_mean ~= 1.0) and crashing is free in imagination.

These tests pin the flag-gated fix end to end: farm semantics, replay ring
firsts channel + alignment invariant, and the corrected loss mask.
"""

import gymnasium as gym
import numpy as np
import pytest

from dreamer_tpu.envs import EnvFarm, FakeEnv


class ScriptedTerminalEnv(gym.Env):
    """obs[0, 0, 0] = step index; terminates at step 3 with reward -100."""

    def __init__(self, episode_len: int = 3):
        self.episode_len = episode_len
        self.observation_space = gym.spaces.Box(0, 255, (8, 8, 3), np.uint8)
        self.action_space = gym.spaces.Box(-1, 1, (2,), np.float32)
        self._t = 0

    def _obs(self):
        o = np.zeros((8, 8, 3), np.uint8)
        o[0, 0, 0] = self._t
        return o

    def reset(self, *, seed=None, options=None):
        self._t = 0
        return self._obs(), {}

    def step(self, action):
        self._t += 1
        term = self._t >= self.episode_len
        reward = -100.0 if term else 1.0
        return self._obs(), reward, term, False, {}


class TestEnvFarmNextStep:
    def test_terminal_obs_returned_then_delayed_reset(self):
        farm = EnvFarm([ScriptedTerminalEnv] * 2, seed=0, next_step=True)
        obs = farm.reset_all()
        assert (obs[:, 0, 0, 0] == 0).all()
        a = np.zeros((2, 2), np.float32)
        for t in (1, 2):
            obs, rew, done, first = farm.step(a)
            assert (obs[:, 0, 0, 0] == t).all()
            assert not done.any() and not first.any() and (rew == 1.0).all()
        # Terminal step: the TERMINAL frame comes back (not a reset frame).
        obs, rew, done, first = farm.step(a)
        assert done.all() and not first.any()
        assert (obs[:, 0, 0, 0] == 3).all(), "terminal obs must be returned"
        assert (rew == -100.0).all()
        # Next step: the delayed reset — action ignored, reward 0, first=True.
        obs, rew, done, first = farm.step(a)
        assert first.all() and not done.any()
        assert (obs[:, 0, 0, 0] == 0).all() and (rew == 0.0).all()
        # Normal stepping resumes in the fresh episode.
        obs, rew, done, first = farm.step(a)
        assert (obs[:, 0, 0, 0] == 1).all()
        assert not done.any() and not first.any()

    def test_same_step_mode_unchanged(self):
        farm = EnvFarm([ScriptedTerminalEnv] * 1, seed=0, next_step=False)
        farm.reset_all()
        a = np.zeros((1, 2), np.float32)
        farm.step(a)
        farm.step(a)
        obs, rew, done, first = farm.step(a)
        # Reference parity: terminal frame discarded, reset obs arrives NOW.
        assert done.all() and first.all()
        assert (obs[:, 0, 0, 0] == 0).all() and (rew == -100.0).all()


@pytest.mark.slow
class TestAsyncFarmNextStep:
    def test_next_step_semantics(self):
        from dreamer_tpu.envs import AsyncEnvFarm

        farm = AsyncEnvFarm([lambda: FakeEnv(episode_len=3)] * 2, seed=0,
                            next_step=True)
        try:
            farm.reset_all()
            a = np.zeros((2, 3), np.float32)
            for _ in range(3):
                obs, rew, done, first = farm.step(a)
            assert done.all() and not first.any()
            # FakeEnv encodes t in the blue channel at (0,0); terminal t=3.
            assert (obs[:, 0, 0, 2] == 3).all(), "terminal obs must be returned"
            obs, rew, done, first = farm.step(a)
            assert first.all() and not done.any()
            assert (rew == 0.0).all()
            assert (obs[:, 0, 0, 2] == 0).all()  # reset frame
        finally:
            farm.close()


class TestRingFirstsChannel:
    def test_rollout_writes_aligned_firsts(self, tmp_path):
        """The stored ring must satisfy: terminal slot t (cont=0) -> slot t+1
        holds the terminal frame as its obs (fake reset transition) -> slot
        t+2 is flagged first (the reset frame)."""
        from tests.test_orchestrator import smoke_cfg
        from dreamer_tpu.orchestrator import Dreamer

        d = Dreamer(smoke_cfg(tmp_path, **{
            "env.next_step_autoreset": "true",
            "env.max_episode_steps": "5"}))
        d.rollout_policy(random_policy=True)
        d.rollout_policy(random_policy=True)
        assert d.buf.first is not None
        n = int(d.buf.size)
        cont = np.asarray(d.buf.cont[:, :n])
        first = np.asarray(d.buf.first[:, :n])
        assert (cont == 0).any(), "no terminals collected (episode_len=5)"
        assert (first == 1).any()
        e_idx, t_idx = np.nonzero(cont == 0)
        for e, t in zip(e_idx, t_idx):
            if t + 2 < n:
                assert first[e, t + 2] == 1.0, (
                    f"reset frame not flagged two slots after terminal "
                    f"(env {e}, t {t})")
        # firsts only ever appear two slots after a terminal (or at slot 0,
        # the stream head's reset_all frame).
        for e, t in zip(*np.nonzero(first == 1)):
            assert t == 0 or (t >= 2 and cont[e, t - 2] == 0.0)

    def test_parity_mode_has_no_firsts_ring(self, tmp_path):
        from tests.test_orchestrator import smoke_cfg
        from dreamer_tpu.orchestrator import Dreamer

        d = Dreamer(smoke_cfg(tmp_path))
        d.rollout_policy(random_policy=True)
        assert d.buf.first is None


class TestNextStepTraining:
    def test_short_train_run_end_to_end(self, tmp_path):
        """Full train loop (rollout -> firsts ring -> WM/AC updates with the
        terminal-inclusive mask -> eval) under env.next_step_autoreset."""
        import csv
        import os

        from tests.test_orchestrator import smoke_cfg
        from dreamer_tpu.orchestrator import Dreamer

        d = Dreamer(smoke_cfg(tmp_path, **{
            "env.next_step_autoreset": "true",
            "env.max_episode_steps": "5"}))
        final = d.train(progress=False)
        assert np.isfinite(final)
        assert d.iteration == d.cfg.train.training_iterations
        with open(os.path.join(str(tmp_path), "logs", "metrics.csv")) as f:
            recs = [r for r in csv.DictReader(f) if r.get("wm/cont_ce")]
        assert recs and all(np.isfinite(float(r["wm/cont_ce"])) for r in recs)
        assert any(float(r["rollout/done_frac"]) > 0 for r in recs)


class TestTerminalLossMask:
    def _terms(self, conts, valid_mask, cont_logit_val=8.0,
               terminal_weight=1.0):
        """wm_loss_terms on controlled inputs: cont head strongly predicts
        'continue'; only unmasked continue=0 targets can produce loss."""
        import jax.numpy as jnp
        from dreamer_tpu.config import DreamerConfig
        from dreamer_tpu.core.math import bucket_values
        from dreamer_tpu.train.world_model import wm_loss_terms
        import dataclasses

        cfg = DreamerConfig()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, horizon=6),
            wm=dataclasses.replace(cfg.wm,
                                   terminal_loss_weight=terminal_weight))
        B, H = 1, 6
        R, C = cfg.wm.latent_rows, cfg.wm.latent_classes
        post = jnp.zeros((B, H, R, C))
        prior = jnp.zeros((B, H, R, C))
        obs = jnp.zeros((B, H, 4, 4, 3))
        dec = jnp.zeros((B, H, 4, 4, 3))
        rew_logits = jnp.zeros((B, H - 1, cfg.wm.reward_buckets))
        cont_logits = jnp.full((B, H - 1), cont_logit_val)
        rewards = jnp.zeros((B, H))
        buckets = bucket_values(cfg.wm.reward_buckets)
        _, m = wm_loss_terms(post, prior, dec, rew_logits, cont_logits, obs,
                             rewards, jnp.asarray(conts), buckets, cfg,
                             valid_mask=valid_mask)
        return float(m["wm/cont_ce"])

    def test_parity_mask_hides_every_terminal(self):
        # Terminal at target index 2: parity mask (= cont targets) zeroes it.
        conts = [[1, 1, 0, 1, 1, 1]]
        ce = self._terms(conts, valid_mask=None)
        # Residual ~3e-4 = the unmasked continue=1 steps' log(1 + e^-8); the
        # terminal example (NLL ~8/denom ~= 2) contributes nothing.
        assert ce < 0.01, (
            "reference-parity masking must (quirk) hide the terminal example")

    def test_shifted_mask_trains_the_terminal(self):
        import jax.numpy as jnp

        # next_step layout: terminal at 2, fake slot 3, reset frame at 4.
        conts = [[1, 1, 0, 1, 1, 1]]
        firsts = jnp.asarray([[0, 0, 0, 0, 1, 0]], jnp.float32)
        valid = 1.0 - firsts[:, 1:]
        ce = self._terms(conts, valid_mask=valid)
        # cont head predicts 'continue' with logit 8 at a true terminal:
        # NLL ~= 8 over a denominator of ~4 unmasked steps.
        assert ce > 1.0, "terminal continue=0 example must now produce loss"

    def test_terminal_loss_weight_scales_terminal_examples(self):
        import jax.numpy as jnp

        conts = [[1, 1, 0, 1, 1, 1]]
        firsts = jnp.asarray([[0, 0, 0, 0, 1, 0]], jnp.float32)
        valid = 1.0 - firsts[:, 1:]
        ce1 = self._terms(conts, valid_mask=valid, terminal_weight=1.0)
        ce20 = self._terms(conts, valid_mask=valid, terminal_weight=20.0)
        # The terminal NLL (~8/denom) dominates the continue-1 residual
        # (~3e-4 each), so the metric scales ~x20.
        assert ce20 == pytest.approx(20 * ce1, rel=0.01)
