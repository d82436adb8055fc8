"""Training-step tests: single-update behavior, NaN-skip, target soft update,
and the fused train iteration (SURVEY §4: single-update numerical checks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.config import (AgentConfig, DreamerConfig, EnvConfig,
                                RuntimeConfig, TrainConfig, WorldModelConfig)
from dreamer_tpu.train import Trainer


def small_config(**train_kw):
    wm = WorldModelConfig(
        hidden_dim=32, latent_rows=4, latent_classes=4, obs_size=(32, 32),
        encoder_filters_1=4, encoder_filters_2=4, encoder_hidden=16,
        decoder_filters_1=4, decoder_filters_2=4, decoder_hidden=16,
        dyn_hidden_1=16, dyn_hidden_2=16, rew_hidden_1=16, rew_hidden_2=16,
        cont_hidden_1=16, cont_hidden_2=16, reward_buckets=31,
    )
    agent = AgentConfig(actor_hidden_1=16, actor_hidden_2=16,
                        critic_hidden_1=16, critic_hidden_2=16, critic_buckets=31)
    train = TrainConfig(horizon=6, batch_size=4, sequence_length=10,
                        buffer_size=64, wm_epochs=1, ac_epochs=1, **train_kw)
    env = EnvConfig(action_dim=2, num_envs=1)
    runtime = RuntimeConfig(compute_dtype="float32")
    return DreamerConfig(wm=wm, agent=agent, train=train, env=env, runtime=runtime)


@pytest.fixture(scope="module")
def trainer_and_state():
    cfg = small_config()
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    buf = trainer.buffer.init_state()
    # Fill with a LEARNABLE synthetic trajectory: smooth per-step images
    # (uniform noise would leave the decoder with nothing to learn).
    n = 40
    ramp = jnp.linspace(0, 1, 32)
    pattern = ramp[:, None, None] * ramp[None, :, None] * jnp.ones((1, 1, 3))
    phase = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.2)[:, None, None, None]
    obs = ((pattern[None] * (0.5 + 0.5 * phase)) * 255).astype(jnp.uint8)
    act = jax.random.uniform(key, (n, 2), minval=-1, maxval=1)
    rew = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.3)
    cont = jnp.ones((n,)).at[19].set(0.0)
    buf = trainer.buffer.add_batch(buf, obs[None], act[None], rew[None], cont[None])
    return cfg, trainer, state, buf


class TestWMUpdate:
    @pytest.mark.heavy
    def test_loss_finite_and_params_change(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        new_state, metrics = trainer.wm_step(state, buf, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["wm/loss"]))
        assert float(metrics["wm/update_skipped"]) == 0.0
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.wm.params, new_state.wm.params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_free_bits_floor(self, trainer_and_state):
        # At random init the KLs are tiny -> loss_dyn/rep floored at 1
        cfg, trainer, state, buf = trainer_and_state
        _, metrics = trainer.wm_step(state, buf, jax.random.PRNGKey(2))
        assert float(metrics["wm/kl_dyn"]) >= 0.0
        assert float(metrics["wm/kl_rep"]) >= 0.0

    def test_loss_decreases_over_updates(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        losses = []
        s = state
        for i in range(30):
            s, m = trainer.wm_step(s, buf, jax.random.PRNGKey(100 + i))
            losses.append(float(m["wm/loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    @pytest.mark.heavy
    def test_nan_batch_skips_update(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        from dreamer_tpu.train.world_model import wm_update
        obs, act, rew, cont = trainer.buffer.sample(buf, jax.random.PRNGKey(3), 4)
        bad_act = act.at[0, 0, 0].set(jnp.nan)
        new_wm, metrics = jax.jit(
            lambda st, b, k: wm_update(trainer.rssm, trainer.wm_opt, st, b, k, cfg)
        )(state.wm, (obs, bad_act, rew, cont), jax.random.PRNGKey(4))
        assert float(metrics["wm/update_skipped"]) == 1.0
        same = jax.tree.map(lambda a, b: bool((a == b).all()),
                            state.wm.params, new_wm.params)
        assert all(jax.tree.leaves(same))


class TestACUpdate:
    @pytest.mark.heavy
    def test_runs_and_updates(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        new_state, metrics = trainer.ac_step(state, buf, jax.random.PRNGKey(5))
        assert np.isfinite(float(metrics["ac/loss_actor"]))
        assert np.isfinite(float(metrics["ac/loss_critic"]))
        assert float(metrics["ac/update_skipped"]) == 0.0
        # actor params move
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.ac.actor_params, new_state.ac.actor_params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_target_soft_update(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        new_state, _ = trainer.ac_step(state, buf, jax.random.PRNGKey(6))
        tau = cfg.agent.target_tau
        expect = jax.tree.map(lambda t, c: (1 - tau) * t + tau * c,
                              state.ac.target_critic_params, new_state.ac.critic_params)
        close = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b, atol=1e-6)),
                             new_state.ac.target_critic_params, expect)
        assert all(jax.tree.leaves(close))

    def test_s_scale_updates(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        new_state, metrics = trainer.ac_step(state, buf, jax.random.PRNGKey(7))
        assert float(new_state.ac.s_scale) == pytest.approx(
            float(metrics["ac/return_scale"]), rel=1e-5)

    def test_entropy_is_minus_logprob(self, trainer_and_state):
        # single-sample entropy estimate (Agent.py:117): at init mu=0 the
        # entropy should be near the analytic value for sigma ~ softplus(b)
        cfg, trainer, state, buf = trainer_and_state
        _, metrics = trainer.ac_step(state, buf, jax.random.PRNGKey(8))
        assert np.isfinite(float(metrics["ac/entropy"]))

    def test_analytic_entropy_flag(self):
        """agent.analytic_entropy=True regularises the base-Normal's analytic
        entropy (sigma-only, no tanh-saturation bias).  At init the actor's
        sigma is ~softplus(0)+min_std everywhere, so the reported entropy
        must equal the closed form, and the update must still run."""
        from dreamer_tpu.core.dists import normal_entropy

        cfg = small_config()
        cfg.agent.analytic_entropy = True
        cfg.agent.min_std = 0.1
        trainer = Trainer(cfg)
        key = jax.random.PRNGKey(0)
        state = trainer.init_state(key)
        buf = trainer.buffer.init_state()
        n = 40
        obs = (jax.random.uniform(key, (n, 32, 32, 3)) * 255).astype(jnp.uint8)
        act = jax.random.uniform(key, (n, 2), minval=-1, maxval=1)
        buf = trainer.buffer.add_batch(
            buf, obs[None], act[None], jnp.zeros((1, n)), jnp.ones((1, n)))
        new_state, metrics = trainer.ac_step(state, buf, jax.random.PRNGKey(5))
        assert float(metrics["ac/update_skipped"]) == 0.0
        ent = float(metrics["ac/entropy"])
        # The analytic entropy depends only on sigma, which at init lives in
        # a narrow band around softplus(~0) + min_std: the value must fall
        # between the closed forms at sigma = min_std and sigma = 2.
        lo = float(normal_entropy(jnp.full((2,), cfg.agent.min_std)))
        hi = float(normal_entropy(jnp.full((2,), 2.0)))
        assert lo < ent < hi, (lo, ent, hi)
        # And it is NOT the sample-based estimate the parity path reports
        # (identical config/keys, only the flag differs).
        cfg2 = small_config()
        cfg2.agent.min_std = 0.1
        trainer2 = Trainer(cfg2)
        state2 = trainer2.init_state(jax.random.PRNGKey(0))
        _, m2 = trainer2.ac_step(state2, buf, jax.random.PRNGKey(5))
        assert ent != pytest.approx(float(m2["ac/entropy"]), abs=1e-6)


class TestTrainIteration:
    @pytest.mark.heavy
    def test_combined_step(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        new_state, metrics = trainer.train_iteration(state, buf, jax.random.PRNGKey(9))
        assert int(new_state.step) == int(state.step) + 1
        for k in ("wm/loss", "ac/loss_actor", "ac/loss_critic"):
            assert np.isfinite(float(metrics[k])), k

    def test_traced_nu_matches_baked_constant(self, trainer_and_state):
        """runtime.traced_nu path: passing agent.nu as a TRACED scalar must
        produce the same update as baking it (the whole point is recompile-free
        dose changes with unchanged math), and a different dose must actually
        change the actor loss."""
        cfg, trainer, state, buf = trainer_and_state
        key = jax.random.PRNGKey(11)
        baked, m_baked = trainer.train_iteration(state, buf, key)
        traced, m_traced = trainer.train_iteration(
            state, buf, key, jnp.asarray(cfg.agent.nu, jnp.float32))
        assert float(m_baked["ac/loss_actor"]) == pytest.approx(
            float(m_traced["ac/loss_actor"]), rel=1e-6)
        same = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b, atol=1e-7)),
                            baked.ac.actor_params, traced.ac.actor_params)
        assert all(jax.tree.leaves(same))
        # A 100x dose through the SAME compiled program changes the loss.
        _, m_dosed = trainer.train_iteration(
            state, buf, key, jnp.asarray(cfg.agent.nu * 100.0, jnp.float32))
        assert float(m_dosed["ac/loss_actor"]) != pytest.approx(
            float(m_traced["ac/loss_actor"]), rel=1e-6)


class TestPolicy:
    def test_reset_act_observe_cycle(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        N = 3
        key = jax.random.PRNGKey(10)
        obs = (jax.random.uniform(key, (N, 32, 32, 3)) * 255).astype(jnp.uint8)
        h, z = trainer.policy_reset(state.wm.params, obs, key)
        assert h.shape == (N, cfg.wm.hidden_dim)
        a = trainer.policy_act(state.ac.actor_params, h, z, key)
        assert a.shape == (N, 2) and (np.abs(np.asarray(a)) < 1).all()
        a_det = trainer.policy_act(state.ac.actor_params, h, z, key, deterministic=True)
        np.testing.assert_allclose(a_det, np.zeros((N, 2)), atol=1e-6)  # zero-init mu
        z2, h2 = trainer.policy_observe(state.wm.params, z, h, a, obs, key)
        assert z2.shape == z.shape and h2.shape == h.shape

    def test_fused_act_observe_with_reset_mask(self, trainer_and_state):
        cfg, trainer, state, buf = trainer_and_state
        N = 4
        key = jax.random.PRNGKey(11)
        obs = (jax.random.uniform(key, (N, 32, 32, 3)) * 255).astype(jnp.uint8)
        h, z = trainer.policy_reset(state.wm.params, obs, key)
        a = trainer.policy_act(state.ac.actor_params, h, z, key)
        done = jnp.array([False, True, False, True])
        h2, z2, a2 = trainer.policy_act_observe(
            state.wm.params, state.ac.actor_params, h, z, a, obs, done, key)
        # done rows: h reset to zero
        np.testing.assert_allclose(np.asarray(h2[1]), np.zeros(cfg.wm.hidden_dim), atol=1e-6)
        np.testing.assert_allclose(np.asarray(h2[3]), np.zeros(cfg.wm.hidden_dim), atol=1e-6)
        assert float(jnp.abs(h2[0]).max()) > 0


class TestFreeBitsVariants:
    def test_per_sample_free_bits_differs_and_is_paper_rule(self):
        """wm.free_bits_per_sample=True clips each (b,t) KL at the floor
        BEFORE the mean (DreamerV3 eq. 5); the reference floors AFTER the
        mean.  With KLs straddling the floor the two must differ, and the
        per-sample value must equal the hand computation."""
        import dataclasses

        from dreamer_tpu.train.world_model import wm_loss_terms  # noqa: F401

        cfg = small_config()
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        buf = trainer.buffer.init_state()
        n = 40
        obs = (jax.random.uniform(jax.random.PRNGKey(1), (n, 32, 32, 3)) * 255
               ).astype(jnp.uint8)
        act = jax.random.uniform(jax.random.PRNGKey(2), (n, 2),
                                 minval=-1.0, maxval=1.0)
        buf = trainer.buffer.add_batch(
            buf, obs[None], act[None], jnp.zeros((1, n)), jnp.ones((1, n)))

        from dreamer_tpu.train.world_model import wm_loss

        batch = trainer.buffer.sample(buf, jax.random.PRNGKey(3), 4)
        key = jax.random.PRNGKey(4)
        _, m_ref = wm_loss(trainer.rssm, state.wm.params, *batch, key, cfg)

        cfg2 = dataclasses.replace(
            cfg, wm=dataclasses.replace(cfg.wm, free_bits_per_sample=True))
        _, m_ps = wm_loss(trainer.rssm, state.wm.params, *batch, key, cfg2)
        # Same raw KLs either way; the loss composition differs whenever any
        # individual KL is below the floor while others are above.
        assert float(m_ref["wm/kl_dyn"]) == pytest.approx(
            float(m_ps["wm/kl_dyn"]), rel=1e-6)
        assert float(m_ps["wm/loss"]) != pytest.approx(
            float(m_ref["wm/loss"]), rel=1e-6)
