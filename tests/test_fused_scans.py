"""Equivalence of the deferred-weight-gradient scans (ops/fused_scans.py)
against autodiff through the module-based scans.

The fused path promises IDENTICAL forward values (same ops, same RNG
stream) and matching gradients (same formulas; only the weight-gradient
reduction order differs), for both observe_sequence and imagine.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.config import DreamerConfig, WorldModelConfig
from dreamer_tpu.rssm import RSSM
from dreamer_tpu.train.agent import AgentTrainer


SMALL = dict(hidden_dim=64, latent_rows=8, latent_classes=8, obs_size=(16, 16),
             encoder_filters_1=4, encoder_filters_2=8, encoder_hidden=32,
             decoder_filters_1=4, decoder_filters_2=8, decoder_hidden=32,
             dyn_hidden_1=24, dyn_hidden_2=24, rew_hidden_1=16, rew_hidden_2=16,
             cont_hidden_1=16, cont_hidden_2=16, reward_buckets=31)


def make_rssms(dtype=jnp.float32):
    wm_cfg = WorldModelConfig(**SMALL)
    base = RSSM(wm_cfg, action_dim=3, dtype=dtype, fused_scan_grads=False)
    fused = RSSM(wm_cfg, action_dim=3, dtype=dtype, fused_scan_grads=True)
    params = base.init_params(jax.random.PRNGKey(0))
    return base, fused, params, wm_cfg


def _batch(key, wm_cfg, B=4, T=6):
    h, w = wm_cfg.obs_size
    k1, k2 = jax.random.split(key)
    obs = jax.random.uniform(k1, (B, T, h, w, 3), minval=-0.5, maxval=0.5)
    actions = jax.random.uniform(k2, (B, T, 3), minval=-1, maxval=1)
    return obs, actions


class TestObserveFused:
    @pytest.mark.heavy
    def test_forward_identical(self, rng):
        base, fused, params, wm_cfg = make_rssms()
        obs, actions = _batch(rng, wm_cfg)
        key = jax.random.PRNGKey(7)
        a = base.observe_sequence(params, obs, actions, key)
        b = fused.observe_sequence(params, obs, actions, key)
        np.testing.assert_allclose(a.h, b.h, rtol=0, atol=0)
        np.testing.assert_allclose(a.z, b.z, rtol=0, atol=0)
        np.testing.assert_allclose(a.post_logits, b.post_logits, rtol=0, atol=0)

    @pytest.mark.heavy
    def test_grads_match(self, rng):
        base, fused, params, wm_cfg = make_rssms()
        obs, actions = _batch(rng, wm_cfg)
        key = jax.random.PRNGKey(7)

        def loss(rssm, p):
            seq = rssm.observe_sequence(p, obs, actions, key)
            # touch every output with distinct nonlinear weights
            return (jnp.sum(seq.h ** 2) + 2.0 * jnp.sum(seq.z ** 3)
                    + jnp.sum(jnp.sin(seq.post_logits)))

        ga = jax.grad(lambda p: loss(base, p))(params)
        gb = jax.grad(lambda p: loss(fused, p))(params)
        flat_a, _ = jax.flatten_util.ravel_pytree(ga)
        flat_b, _ = jax.flatten_util.ravel_pytree(gb)
        np.testing.assert_allclose(flat_a, flat_b, rtol=2e-4, atol=2e-5)

    @pytest.mark.heavy
    def test_grads_match_bf16(self, rng):
        base, fused, params, wm_cfg = make_rssms(dtype=jnp.bfloat16)
        obs, actions = _batch(rng, wm_cfg)
        key = jax.random.PRNGKey(3)

        def loss(rssm, p):
            seq = rssm.observe_sequence(p, obs, actions, key)
            return jnp.sum(seq.h.astype(jnp.float32) ** 2) + jnp.sum(
                seq.post_logits.astype(jnp.float32) ** 2)

        a = loss(base, params)
        b = loss(fused, params)
        np.testing.assert_allclose(a, b, rtol=1e-6)
        ga = jax.grad(lambda p: loss(base, p))(params)
        gb = jax.grad(lambda p: loss(fused, p))(params)
        flat_a, _ = jax.flatten_util.ravel_pytree(ga)
        flat_b, _ = jax.flatten_util.ravel_pytree(gb)
        # bf16 products are rounded per step on the autodiff path but summed
        # at full precision on the fused path, so compare gradient DIRECTION
        # and magnitude rather than elementwise bits.
        na, nb = np.linalg.norm(flat_a), np.linalg.norm(flat_b)
        assert np.linalg.norm(flat_a - flat_b) / na < 0.02
        assert abs(na - nb) / na < 0.01


class TestObserveFusedReset:
    """observe_scan_reset: the deferred-dW path with episode-boundary resets
    (wm.reset_on_episode_start) must match the plain autodiff reset scan
    bit-for-bit forward and allclose in gradients."""

    def _flags(self, obs):
        B, T = obs.shape[:2]
        return jnp.zeros((B, T)).at[:, T // 2].set(1.0)

    def test_forward_identical(self, rng):
        base, fused, params, wm_cfg = make_rssms()
        obs, actions = _batch(rng, wm_cfg)
        key = jax.random.PRNGKey(7)
        is_first = self._flags(obs)
        a = base.observe_sequence(params, obs, actions, key, is_first=is_first)
        b = fused.observe_sequence(params, obs, actions, key, is_first=is_first)
        np.testing.assert_allclose(a.h, b.h, rtol=0, atol=0)
        np.testing.assert_allclose(a.z, b.z, rtol=0, atol=0)
        np.testing.assert_allclose(a.post_logits, b.post_logits, rtol=0, atol=0)

    def test_grads_match(self, rng):
        base, fused, params, wm_cfg = make_rssms()
        obs, actions = _batch(rng, wm_cfg)
        key = jax.random.PRNGKey(7)
        is_first = self._flags(obs)

        def loss(rssm, p):
            seq = rssm.observe_sequence(p, obs, actions, key,
                                        is_first=is_first)
            return (jnp.sum(seq.h ** 2) + 2.0 * jnp.sum(seq.z ** 3)
                    + jnp.sum(jnp.sin(seq.post_logits)))

        ga = jax.grad(lambda p: loss(base, p))(params)
        gb = jax.grad(lambda p: loss(fused, p))(params)
        flat_a, _ = jax.flatten_util.ravel_pytree(ga)
        flat_b, _ = jax.flatten_util.ravel_pytree(gb)
        np.testing.assert_allclose(flat_a, flat_b, rtol=2e-4, atol=2e-5)

    def test_fused_post_boundary_independent_of_prefix(self, rng):
        """The boundary-cut property holds on the fused path too."""
        _, fused, params, wm_cfg = make_rssms()
        obs, actions = _batch(rng, wm_cfg)
        key = jax.random.PRNGKey(9)
        B, T = obs.shape[:2]
        t_b = T // 2
        is_first = jnp.zeros((B, T)).at[:, t_b].set(1.0)
        obs2 = obs.at[:, :t_b].add(0.123)
        act2 = actions.at[:, :t_b].add(-0.5)
        s1 = fused.observe_sequence(params, obs, actions, key,
                                    is_first=is_first)
        s2 = fused.observe_sequence(params, obs2, act2, key,
                                    is_first=is_first)
        np.testing.assert_allclose(np.asarray(s1.h[:, t_b:]),
                                   np.asarray(s2.h[:, t_b:]), atol=1e-6)


class TestImagineFused:
    def _setup(self, dtype=jnp.float32):
        base, fused, params, wm_cfg = make_rssms(dtype)
        cfg = DreamerConfig()
        cfg = dataclasses.replace(
            cfg, wm=wm_cfg,
            agent=dataclasses.replace(cfg.agent, actor_hidden_1=24,
                                      actor_hidden_2=24, critic_buckets=31))
        agent = AgentTrainer(cfg, dtype=dtype)
        actor_params, _ = agent.init_params(jax.random.PRNGKey(1),
                                            wm_cfg.hidden_dim, wm_cfg.latent_dim)
        B = 4
        h0 = jax.random.normal(jax.random.PRNGKey(2), (B, wm_cfg.hidden_dim))
        z0 = jax.random.normal(jax.random.PRNGKey(3), (B, wm_cfg.latent_dim))
        return base, fused, params, agent, actor_params, h0, z0

    def test_forward_identical(self):
        base, fused, params, agent, actor_params, h0, z0 = self._setup()
        key = jax.random.PRNGKey(9)
        ta = base.imagine(params, agent.actor_fn(actor_params), z0, h0, 5, key)
        tb = fused.imagine(params, agent.actor_fn(actor_params), z0, h0, 5, key)
        for name in ta._fields:
            np.testing.assert_allclose(
                getattr(ta, name), getattr(tb, name), rtol=0, atol=0,
                err_msg=f"mismatch in {name}")

    def test_actor_grads_match(self):
        base, fused, params, agent, actor_params, h0, z0 = self._setup()
        key = jax.random.PRNGKey(9)

        def loss(rssm, ap):
            traj = rssm.imagine(params, agent.actor_fn(ap), z0, h0, 5, key)
            # mu/sigma path (the real actor-loss path) plus the state path.
            return (jnp.sum(jnp.sin(traj.mu) * traj.sigma)
                    + jnp.sum(traj.h ** 2) * 1e-3
                    + jnp.sum(traj.reward ** 2) * 1e-2)

        ga = jax.grad(lambda p: loss(base, p))(actor_params)
        gb = jax.grad(lambda p: loss(fused, p))(actor_params)
        flat_a, _ = jax.flatten_util.ravel_pytree(ga)
        flat_b, _ = jax.flatten_util.ravel_pytree(gb)
        np.testing.assert_allclose(flat_a, flat_b, rtol=2e-4, atol=2e-5)

    @pytest.mark.heavy
    def test_wm_grads_match(self):
        """Gradients w.r.t. the (frozen-in-training) WM params also agree —
        guards the full chain through GRU + prior head."""
        base, fused, params, agent, actor_params, h0, z0 = self._setup()
        key = jax.random.PRNGKey(11)

        def loss(rssm, p):
            traj = rssm.imagine(p, agent.actor_fn(actor_params), z0, h0, 4, key)
            return jnp.sum(traj.mu ** 2) + jnp.sum(traj.h ** 2) * 1e-3

        ga = jax.grad(lambda p: loss(base, p))(params)
        gb = jax.grad(lambda p: loss(fused, p))(params)
        flat_a, _ = jax.flatten_util.ravel_pytree(ga)
        flat_b, _ = jax.flatten_util.ravel_pytree(gb)
        np.testing.assert_allclose(flat_a, flat_b, rtol=2e-4, atol=2e-5)


class TestTrainerFused:
    @pytest.mark.heavy
    def test_full_update_close(self, rng):
        """One full train_iteration under fused vs autodiff scans produces
        near-identical new parameters (f32, CPU)."""
        from dreamer_tpu.train import Trainer

        def mk(fused):
            cfg = DreamerConfig()
            cfg = dataclasses.replace(
                cfg,
                wm=WorldModelConfig(**SMALL),
                agent=dataclasses.replace(cfg.agent, actor_hidden_1=24,
                                          actor_hidden_2=24,
                                          critic_hidden_1=24, critic_hidden_2=24,
                                          critic_buckets=31),
                train=dataclasses.replace(cfg.train, horizon=5, batch_size=4,
                                          sequence_length=8, buffer_size=64),
                runtime=dataclasses.replace(cfg.runtime,
                                            compute_dtype="float32",
                                            fused_scan_grads=fused))
            return cfg

        outs = []
        for fused in (False, True):
            cfg = mk(fused)
            t = Trainer(cfg, jit=True, donate=False)
            key = jax.random.PRNGKey(0)
            state = t.init_state(key)
            buf = t.buffer.init_state()
            n = 20
            h, w = cfg.wm.obs_size
            obs = (jax.random.uniform(jax.random.PRNGKey(5), (1, n, h, w, 3))
                   * 255).astype(jnp.uint8)
            buf = t.buffer.add_batch(
                buf, obs,
                jax.random.uniform(jax.random.PRNGKey(6), (1, n, 3),
                                   minval=-1, maxval=1),
                jnp.sin(jnp.arange(n, dtype=jnp.float32))[None],
                jnp.ones((1, n), jnp.float32))
            new_state, metrics = t.train_iteration(state, buf, jax.random.PRNGKey(9))
            outs.append((new_state, metrics))

        (sa, ma), (sb, mb) = outs
        fa, _ = jax.flatten_util.ravel_pytree(
            (sa.wm.params, sa.ac.actor_params, sa.ac.critic_params))
        fb, _ = jax.flatten_util.ravel_pytree(
            (sb.wm.params, sb.ac.actor_params, sb.ac.critic_params))
        np.testing.assert_allclose(fa, fb, rtol=1e-3, atol=1e-5)
        for k in ma:
            np.testing.assert_allclose(ma[k], mb[k], rtol=1e-3, atol=1e-4,
                                       err_msg=k)


class TestMinStdThreading:
    """agent.min_std must reach BOTH actor implementations: the flax Actor
    module and the raw-jnp fused imagine scan (they must stay bit-identical
    at non-default floors)."""

    def test_fused_imagine_matches_module_at_min_std(self):
        wm_cfg = WorldModelConfig(**SMALL)
        base = RSSM(wm_cfg, action_dim=3, fused_scan_grads=False,
                    actor_min_std=0.1)
        fused = RSSM(wm_cfg, action_dim=3, fused_scan_grads=True,
                     actor_min_std=0.1)
        params = base.init_params(jax.random.PRNGKey(0))
        cfg = DreamerConfig()
        cfg = dataclasses.replace(
            cfg, wm=wm_cfg,
            agent=dataclasses.replace(cfg.agent, actor_hidden_1=24,
                                      actor_hidden_2=24, critic_buckets=31,
                                      min_std=0.1))
        agent = AgentTrainer(cfg)
        actor_params, _ = agent.init_params(jax.random.PRNGKey(1),
                                            wm_cfg.hidden_dim, wm_cfg.latent_dim)
        B = 4
        h0 = jax.random.normal(jax.random.PRNGKey(2), (B, wm_cfg.hidden_dim))
        z0 = jax.random.normal(jax.random.PRNGKey(3), (B, wm_cfg.latent_dim))
        key = jax.random.PRNGKey(9)
        ta = base.imagine(params, agent.actor_fn(actor_params), z0, h0, 5, key)
        tb = fused.imagine(params, agent.actor_fn(actor_params), z0, h0, 5, key)
        for name in ta._fields:
            np.testing.assert_allclose(
                getattr(ta, name), getattr(tb, name), rtol=0, atol=0,
                err_msg=f"mismatch in {name}")
        # The floor actually binds: no sigma below it anywhere in the rollout.
        assert float(jnp.min(ta.sigma)) >= 0.1
