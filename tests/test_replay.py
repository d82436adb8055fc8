"""Replay buffer tests: ring semantics, symlog-at-write, head-collision
re-roll, env-axis separation, and sampled-window contiguity (reference
semantics: Buffer.py:5-63)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamer_tpu.core.math import symlog
from dreamer_tpu.replay import ReplayBuffer


def make_buffer(capacity=32, T=8, num_envs=1):
    return ReplayBuffer(capacity=capacity, sequence_length=T, action_dim=2,
                        obs_size=(8, 8), num_envs=num_envs)


def add_n(buf, state, n, start_val=0):
    """Add n transitions per env; reward encodes env*1000 + global index."""
    E = buf.num_envs
    base = jnp.arange(E, dtype=jnp.float32)[:, None] * 1000.0
    vals = base + jnp.arange(start_val, start_val + n, dtype=jnp.float32)[None, :]
    obs = jnp.ones((E, n, 8, 8, 3), jnp.uint8)
    action = jnp.ones((E, n, 2), jnp.float32)
    cont = jnp.ones((E, n), jnp.float32)
    return buf.add_batch(state, obs, action, vals, cont)


def symexp_np(x):
    return np.expm1(np.abs(np.asarray(x))) * np.sign(np.asarray(x))


class TestWrite:
    def test_size_and_head(self):
        buf = make_buffer()
        s = buf.init_state()
        s = add_n(buf, s, 10)
        assert int(s.size) == 10 and int(s.next_idx) == 10
        s = add_n(buf, s, 30, 10)  # wraps: 40 > 32
        assert int(s.size) == 32 and int(s.next_idx) == 8

    def test_rewards_symlogged_at_write(self):
        buf = make_buffer()
        s = add_n(buf, buf.init_state(), 5)
        np.testing.assert_allclose(
            np.asarray(s.reward[0, :5]), np.asarray(symlog(jnp.arange(5.0))), rtol=1e-6)

    def test_ring_overwrite(self):
        buf = make_buffer()
        s = add_n(buf, buf.init_state(), 32)
        s = add_n(buf, s, 4, 100)  # overwrites slots 0..3
        np.testing.assert_allclose(np.asarray(s.reward[0, :4]),
                                   np.asarray(symlog(jnp.arange(100.0, 104.0))), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.reward[0, 4]),
                                   float(symlog(jnp.asarray(4.0))), rtol=1e-6)

    def test_obs_stays_uint8(self):
        buf = make_buffer()
        s = add_n(buf, buf.init_state(), 3)
        assert s.obs.dtype == jnp.uint8


class TestSample:
    def test_shapes(self):
        buf = make_buffer()
        s = add_n(buf, buf.init_state(), 20)
        obs, act, rew, cont = buf.sample(s, jax.random.PRNGKey(0), 6)
        assert obs.shape == (6, 8, 8, 8, 3) and obs.dtype == jnp.uint8
        assert act.shape == (6, 8, 2)
        assert rew.shape == (6, 8) and cont.shape == (6, 8)

    def test_windows_contiguous(self):
        # reward encodes the write index -> sampled windows must be consecutive
        buf = make_buffer()
        s = add_n(buf, buf.init_state(), 20)
        _, _, rew, _ = buf.sample(s, jax.random.PRNGKey(1), 16)
        diffs = np.diff(np.round(symexp_np(rew)), axis=1)
        np.testing.assert_allclose(diffs, np.ones_like(diffs), atol=1e-3)

    def test_multi_env_windows_never_mix_streams(self):
        buf = make_buffer(capacity=64, T=8, num_envs=4)  # 16 slots per env
        s = add_n(buf, buf.init_state(), 16)
        _, _, rew, _ = buf.sample(s, jax.random.PRNGKey(2), 32)
        raw = np.round(symexp_np(rew))
        env_of = raw // 1000
        # every window stays within one env stream and is consecutive
        assert (env_of == env_of[:, :1]).all()
        diffs = np.diff(raw % 1000, axis=1)
        np.testing.assert_allclose(diffs, np.ones_like(diffs), atol=1e-3)

    def test_no_window_straddles_head_when_full(self):
        buf = make_buffer(capacity=32, T=8)
        s = add_n(buf, buf.init_state(), 32)
        s = add_n(buf, s, 5, 32)  # next_idx = 5
        collisions = 0
        for seed in range(200):
            _, _, rew, _ = buf.sample(s, jax.random.PRNGKey(seed), 8)
            raw = np.round(symexp_np(rew))
            # Window straddles the head iff its raw indices are non-consecutive.
            diffs = np.diff(raw, axis=1)
            collisions += int((np.abs(diffs - 1) > 1e-3).any(axis=1).sum())
        # The reference re-rolls once; collisions should be rare (reroll can
        # itself collide with prob (T-1)/valid ~ 0.28 per colliding draw).
        assert collisions < 200 * 8 * 0.12

    def test_sampling_uniform_over_starts(self):
        buf = make_buffer(capacity=64, T=4)
        s = add_n(buf, buf.init_state(), 40)
        starts = []
        for seed in range(100):
            _, _, rew, _ = buf.sample(s, jax.random.PRNGKey(seed), 10)
            starts.extend(np.round(symexp_np(rew[:, 0])).tolist())
        starts = np.array(starts)
        assert starts.min() >= 0 and starts.max() <= 36  # valid_starts = 40-4+1
        assert starts.std() > 5  # spread over the range


class TestWindowedSample:
    """_sample_impl(t_out, with_scalars) must be a pure PREFIX of the full
    sample under the same key — identical start distribution and RNG stream
    (the learner relies on this for bit-equal batches after the windowed-
    gather optimization)."""

    def test_t_out_is_prefix_of_full_sample(self):
        buf = make_buffer(capacity=32, T=8)
        state = add_n(buf, buf.init_state(), 20)
        key = jax.random.PRNGKey(3)
        full = buf._sample_impl(state, key, 6)
        win = buf._sample_impl(state, key, 6, t_out=5)
        for a, b in zip(full, win):
            np.testing.assert_array_equal(np.asarray(a[:, :5]), np.asarray(b))

    def test_with_scalars_false_matches(self):
        buf = make_buffer(capacity=32, T=8)
        state = add_n(buf, buf.init_state(), 20)
        key = jax.random.PRNGKey(4)
        full = buf._sample_impl(state, key, 6)
        ow, aw = buf._sample_impl(state, key, 6, t_out=4, with_scalars=False)
        np.testing.assert_array_equal(np.asarray(full[0][:, :4]), np.asarray(ow))
        np.testing.assert_array_equal(np.asarray(full[1][:, :4]), np.asarray(aw))

    def test_windowed_reroll_consistent_when_full(self):
        """Head-collision re-roll must use the FULL sequence_length even for
        narrow windows, so the start distribution never depends on t_out."""
        buf = make_buffer(capacity=16, T=8)
        state = add_n(buf, buf.init_state(), 24)  # wrapped: head mid-ring
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            full = buf._sample_impl(state, key, 8)
            win = buf._sample_impl(state, key, 8, t_out=3)
            np.testing.assert_array_equal(np.asarray(full[2][:, :3]),
                                          np.asarray(win[2]))
