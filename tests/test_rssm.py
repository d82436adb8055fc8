"""RSSM scan tests: scan-vs-step equivalence, warm-start semantics,
imagination shapes, STE gradient flow (SURVEY §4 test pyramid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.rssm import RSSM
from tests.test_nets import small_cfg


@pytest.fixture(scope="module")
def rssm_small():
    cfg = small_cfg()
    rssm = RSSM(cfg)
    params = rssm.init_params(jax.random.PRNGKey(0))
    return cfg, rssm, params


def _rand_obs(key, B, T, size=32):
    return jax.random.uniform(key, (B, T, size, size, 3), minval=-0.5, maxval=0.5)


class TestObserveSequence:
    def test_shapes(self, rssm_small):
        cfg, rssm, params = rssm_small
        B, T = 3, 6
        obs = _rand_obs(jax.random.PRNGKey(1), B, T)
        actions = jax.random.normal(jax.random.PRNGKey(2), (B, T, 3))
        seq = rssm.observe_sequence(params, obs, actions, jax.random.PRNGKey(3))
        assert seq.h.shape == (B, T, cfg.hidden_dim)
        assert seq.z.shape == (B, T, cfg.latent_dim)
        assert seq.post_logits.shape == (B, T, cfg.latent_rows, cfg.latent_classes)

    @pytest.mark.heavy
    def test_scan_matches_stepwise_loop(self, rssm_small):
        """The lax.scan unroll must equal the reference's python loop of
        observe_step calls (WorldModel.py:91-107) given the same keys."""
        cfg, rssm, params = rssm_small
        B, T = 2, 5
        obs = _rand_obs(jax.random.PRNGKey(4), B, T)
        actions = jax.random.normal(jax.random.PRNGKey(5), (B, T, 3))
        key = jax.random.PRNGKey(6)

        seq = rssm.observe_sequence(params, obs, actions, key)

        # Hand loop with identical per-step keys.
        keys = jax.random.split(key, T)
        h, z = rssm.initial_state(B)
        hs, zs, lg = [], [], []
        for t in range(T):
            a_prev = actions[:, t - 1] if t > 0 else jnp.zeros((B, 3))
            z, h, logits = rssm.observe_step(params, z, h, a_prev, obs[:, t], keys[t])
            hs.append(h); zs.append(z); lg.append(logits)

        np.testing.assert_allclose(seq.h, jnp.stack(hs, 1), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(seq.z, jnp.stack(zs, 1), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(seq.post_logits, jnp.stack(lg, 1), rtol=2e-5, atol=2e-5)

    def test_latents_are_onehot_forward(self, rssm_small):
        cfg, rssm, params = rssm_small
        obs = _rand_obs(jax.random.PRNGKey(7), 2, 4)
        seq = rssm.observe_sequence(params, obs, jnp.zeros((2, 4, 3)), jax.random.PRNGKey(8))
        z = np.asarray(seq.z).reshape(2, 4, cfg.latent_rows, cfg.latent_classes)
        np.testing.assert_allclose(z.sum(-1), np.ones((2, 4, cfg.latent_rows)), atol=1e-5)

    @pytest.mark.heavy
    def test_gradient_flows_to_encoder(self, rssm_small):
        cfg, rssm, params = rssm_small
        obs = _rand_obs(jax.random.PRNGKey(9), 2, 3)

        def loss(p):
            seq = rssm.observe_sequence(p, obs, jnp.zeros((2, 3, 3)), jax.random.PRNGKey(10))
            return jnp.sum(seq.z ** 2)  # through the STE

        g = jax.grad(loss)(params)
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["enc_conv0"]))
        assert gnorm > 0.0


class TestWarmStart:
    def test_differs_from_observe_at_t0(self, rssm_small):
        """Warm start encodes z0 from (h=0, obs0) WITHOUT a GRU step
        (Dreamer.py:252-253) — unlike observe_sequence which GRU-steps at t=0."""
        cfg, rssm, params = rssm_small
        obs = _rand_obs(jax.random.PRNGKey(11), 2, 4)
        actions = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 3))
        key = jax.random.PRNGKey(13)

        z_fin, h_fin = rssm.warm_start(params, obs, actions, key)
        assert z_fin.shape == (2, cfg.latent_dim)
        assert h_fin.shape == (2, cfg.hidden_dim)

        # Python re-implementation of Dreamer.py:244-262
        key0, key_scan = jax.random.split(key)
        keys = jax.random.split(key_scan, 3)
        h = jnp.zeros((2, cfg.hidden_dim))
        feat0 = rssm.encode_obs(params, obs[:, 0])
        z = rssm._sample(rssm.posterior_logits(params, feat0, h), key0)
        for t in range(1, 4):
            z, h, _ = rssm.observe_step(params, z, h, actions[:, t - 1], obs[:, t], keys[t - 1])
        np.testing.assert_allclose(z_fin, z, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(h_fin, h, rtol=2e-5, atol=2e-5)


class TestImagine:
    def test_shapes_and_reward_alignment(self, rssm_small):
        cfg, rssm, params = rssm_small
        B, H = 3, 5

        def actor_fn(h, z):
            return jnp.zeros((h.shape[0], 3)), jnp.ones((h.shape[0], 3)) * 0.5

        h0 = jnp.zeros((B, cfg.hidden_dim))
        z0 = jnp.zeros((B, cfg.latent_dim))
        traj = rssm.imagine(params, actor_fn, z0, h0, H, jax.random.PRNGKey(14))
        assert traj.h.shape == (B, H + 1, cfg.hidden_dim)
        assert traj.z.shape == (B, H + 1, cfg.latent_dim)
        assert traj.action.shape == (B, H, 3)
        assert traj.reward.shape == (B, H)
        assert traj.cont.shape == (B, H)
        assert (np.asarray(traj.cont) >= 0).all() and (np.asarray(traj.cont) <= 1).all()
        assert (np.abs(np.asarray(traj.action)) < 1).all()

    def test_reward_matches_per_step_predict(self, rssm_small):
        """Post-scan batched reward head == the reference's per-step
        imagine_step reward (WorldModel.py:72-77): reward[t] is the head at
        state t+1."""
        cfg, rssm, params = rssm_small
        B, H = 2, 4

        def actor_fn(h, z):
            return jnp.tanh(h[:, :3]) * 0.1, jnp.ones((h.shape[0], 3)) * 0.3

        h0 = jax.random.normal(jax.random.PRNGKey(15), (B, cfg.hidden_dim)) * 0.1
        z0 = jnp.zeros((B, cfg.latent_dim))
        traj = rssm.imagine(params, actor_fn, z0, h0, H, jax.random.PRNGKey(16))
        for t in range(H):
            r = rssm.reward_pred(params, traj.h[:, t + 1], traj.z[:, t + 1])
            np.testing.assert_allclose(traj.reward[:, t], r, rtol=1e-4, atol=1e-5)

    def test_actor_gradients_flow_through_dynamics(self, rssm_small):
        """Actor params must receive gradient through the imagined dynamics
        (the reference's dream runs outside no_grad — SURVEY §3.4)."""
        cfg, rssm, params = rssm_small
        from dreamer_tpu.nets import Actor

        actor = Actor(action_dim=3)
        h0 = jnp.zeros((2, cfg.hidden_dim))
        z0 = jnp.ones((2, cfg.latent_dim)) / cfg.latent_classes
        a_params = actor.init(jax.random.PRNGKey(17), h0, z0)["params"]

        def loss(ap):
            traj = rssm.imagine(
                params, lambda h, z: actor.apply({"params": ap}, h, z),
                z0, h0, 3, jax.random.PRNGKey(18))
            return jnp.sum(traj.h[:, -1] ** 2)  # depends on actions via dynamics

        g = jax.grad(loss)(a_params)
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert gnorm > 0.0


class TestEpisodeBoundaryReset:
    """wm.reset_on_episode_start: is_first flags zero the recurrent carry
    (h, z) and incoming action mid-scan, making every post-boundary step
    independent of pre-boundary data — the property the reference lacks
    (its per-step loss mask, WorldModel.py:170-173, still carries state
    across env auto-resets; diagnosed as the LunarLander failure)."""

    @pytest.mark.heavy
    def test_post_boundary_independent_of_prefix(self, rssm_small):
        cfg, rssm, params = rssm_small
        B, T, t_b = 2, 8, 4
        key = jax.random.PRNGKey(11)
        obs = _rand_obs(jax.random.PRNGKey(12), B, T)
        actions = jax.random.normal(jax.random.PRNGKey(13), (B, T, 3))
        # Same suffix, scrambled prefix.
        obs2 = obs.at[:, :t_b].set(_rand_obs(jax.random.PRNGKey(14), B, t_b))
        act2 = actions.at[:, :t_b].set(
            jax.random.normal(jax.random.PRNGKey(15), (B, t_b, 3)))
        is_first = jnp.zeros((B, T)).at[:, t_b].set(1.0)

        s1 = rssm.observe_sequence(params, obs, actions, key, is_first=is_first)
        s2 = rssm.observe_sequence(params, obs2, act2, key, is_first=is_first)
        # From the boundary on, identical (the reset cut all dependence).
        np.testing.assert_allclose(np.asarray(s1.h[:, t_b:]),
                                   np.asarray(s2.h[:, t_b:]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.z[:, t_b:]),
                                   np.asarray(s2.z[:, t_b:]), atol=1e-6)
        # Sanity: WITHOUT the flags the prefix does leak through.
        s3 = rssm.observe_sequence(params, obs, actions, key)
        s4 = rssm.observe_sequence(params, obs2, act2, key)
        assert not np.allclose(np.asarray(s3.h[:, t_b:]),
                               np.asarray(s4.h[:, t_b:]), atol=1e-6)

    def test_no_flags_matches_default_path(self, rssm_small):
        """is_first of all zeros must reproduce the default (fused or plain)
        scan exactly — the reset path is a strict superset."""
        cfg, rssm, params = rssm_small
        B, T = 2, 5
        obs = _rand_obs(jax.random.PRNGKey(16), B, T)
        actions = jax.random.normal(jax.random.PRNGKey(17), (B, T, 3))
        key = jax.random.PRNGKey(18)
        s_plain = rssm.observe_sequence(params, obs, actions, key)
        s_reset = rssm.observe_sequence(params, obs, actions, key,
                                        is_first=jnp.zeros((B, T)))
        np.testing.assert_allclose(np.asarray(s_plain.h), np.asarray(s_reset.h),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_plain.z), np.asarray(s_reset.z),
                                   atol=1e-5)

    def test_warm_start_boundary_reset(self, rssm_small):
        cfg, rssm, params = rssm_small
        B, Tw, t_b = 2, 6, 3
        key = jax.random.PRNGKey(19)
        obs = _rand_obs(jax.random.PRNGKey(20), B, Tw)
        actions = jax.random.normal(jax.random.PRNGKey(21), (B, Tw, 3))
        obs2 = obs.at[:, :t_b].set(_rand_obs(jax.random.PRNGKey(22), B, t_b))
        act2 = actions.at[:, :t_b].set(
            jax.random.normal(jax.random.PRNGKey(23), (B, t_b, 3)))
        is_first = jnp.zeros((B, Tw)).at[:, t_b].set(1.0)
        z1, h1 = rssm.warm_start(params, obs, actions, key, is_first=is_first)
        z2, h2 = rssm.warm_start(params, obs2, act2, key, is_first=is_first)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)

    @pytest.mark.heavy
    def test_gradients_flow_with_resets(self, rssm_small):
        cfg, rssm, params = rssm_small
        B, T = 2, 6
        obs = _rand_obs(jax.random.PRNGKey(24), B, T)
        actions = jax.random.normal(jax.random.PRNGKey(25), (B, T, 3))
        is_first = jnp.zeros((B, T)).at[:, 3].set(1.0)

        def loss(p):
            seq = rssm.observe_sequence(p, obs, actions, jax.random.PRNGKey(26),
                                        is_first=is_first)
            return jnp.sum(seq.h ** 2) + jnp.sum(seq.post_logits ** 2)

        grads = jax.grad(loss)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0
