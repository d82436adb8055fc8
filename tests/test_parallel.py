"""Mesh/sharding tests on the 8-device virtual CPU platform (SURVEY §4:
multi-host logic exercised via forced host platform device count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.parallel import MeshPlan, make_mesh


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
        mesh2 = make_mesh(n_data=4, n_model=2)
        assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


class TestShardedTraining:
    @pytest.mark.heavy
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    @pytest.mark.heavy
    def test_sharded_matches_single_device(self):
        """DP over 4 devices must produce the same update as 1 device (same
        keys, same data): the psum'd sharded gradient == the full-batch
        gradient."""
        import __graft_entry__ as ge
        from dreamer_tpu.train import Trainer

        cfg = ge._flagship_cfg(tiny=True)
        key = jax.random.PRNGKey(0)

        def build():
            trainer = Trainer(cfg, jit=False)
            state = trainer.init_state(key)
            buf = trainer.buffer.init_state()
            E, n = cfg.env.num_envs, cfg.train.sequence_length + 4
            obs = (jax.random.uniform(key, (E, n, 32, 32, 3)) * 255).astype(jnp.uint8)
            buf = trainer.buffer.add_batch(
                buf, obs, jnp.zeros((E, n, 3)), jnp.ones((E, n)), jnp.ones((E, n)))
            return trainer, state, buf

        # single device — with the SAME shard-block env-draw structure the
        # 4-shard plan uses (sample_shards alone switches the draw formula;
        # the mesh only changes where the gather runs)
        trainer1, state1, buf1 = build()
        trainer1.sample_shards = 4
        new1, m1 = jax.jit(trainer1._train_iteration)(state1, buf1, key)

        # 4-device data-parallel
        mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
        trainer2, state2, buf2 = build()
        plan = MeshPlan(mesh)
        state2 = plan.place_state(state2)
        buf2 = plan.place_buffer(buf2)
        step = plan.shard_train_iteration(trainer2, state2, buf2)
        new2, m2 = step(state2, buf2, key)

        np.testing.assert_allclose(float(m1["wm/loss"]), float(m2["wm/loss"]),
                                   rtol=1e-4)
        leaves1 = jax.tree.leaves(new1.wm.params)
        leaves2 = jax.tree.leaves(new2.wm.params)
        for a, b in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        # reduce further for CPU test speed: just check it traces/lowls
        lowered = jax.jit(fn).lower(*args)
        assert lowered is not None


@pytest.mark.heavy
class TestTensorParallel:
    def test_flagship_widths_shard_and_match_single_device(self):
        """TP at REAL widths (VERDICT r1 item 3): the (1027,1800)/(600,1800)
        GRU kernels, the 1024-wide latent heads and the (200,4096) decoder
        upscaler split over model=2, and the sharded WM update matches the
        single-device update."""
        import dataclasses

        from dreamer_tpu.config import DreamerConfig
        from dreamer_tpu.train import Trainer

        cfg = DreamerConfig()
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, horizon=3, batch_size=4,
                                      sequence_length=8, buffer_size=64,
                                      wm_epochs=1, ac_epochs=1),
            runtime=dataclasses.replace(cfg.runtime, compute_dtype="float32"))
        key = jax.random.PRNGKey(0)

        def build():
            t = Trainer(cfg, jit=False)
            s = t.init_state(key)
            b = t.buffer.init_state()
            n = cfg.train.sequence_length + 2
            obs = (jax.random.uniform(key, (1, n, 64, 64, 3)) * 255).astype(jnp.uint8)
            b = t.buffer.add_batch(b, obs, jnp.zeros((1, n, 3)),
                                   jnp.ones((1, n)), jnp.ones((1, n)))
            return t, s, b

        t1, s1, b1 = build()
        new1, m1 = jax.jit(t1._wm_step)(s1, b1, key)

        mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
        plan = MeshPlan(mesh)
        t2, s2, b2 = build()
        s2 = plan.place_state(s2)
        b2 = plan.place_buffer(b2)

        def uses_model(leaf):
            spec = getattr(leaf.sharding, "spec", None) or ()
            flat = [a for ax in spec
                    for a in (ax if isinstance(ax, tuple) else (ax,))]
            return "model" in flat

        tp_leaves = [l for l in jax.tree.leaves(s2.wm.params) if uses_model(l)]
        assert len(tp_leaves) >= 4, len(tp_leaves)
        assert any(l.shape == (1027, 1800) for l in tp_leaves)  # GRU kernel_i

        step = jax.jit(
            t2._wm_step,
            in_shardings=(plan.state_shardings(s2), plan.buffer_shardings(b2),
                          plan.replicated()),
            out_shardings=(plan.state_shardings(s2), plan.replicated()))
        new2, m2 = step(s2, b2, key)
        np.testing.assert_allclose(float(m1["wm/loss"]), float(m2["wm/loss"]),
                                   rtol=1e-4)
        for a, b in zip(jax.tree.leaves(new1.wm.params),
                        jax.tree.leaves(new2.wm.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


class TestShardLocalSampling:
    """Locality-aware replay sampling: with the ring env axis sharded over
    data, every shard gathers ONLY its own env streams (VERDICT r1 item 8)."""

    def _make(self, num_envs=8, T=8):
        from dreamer_tpu.replay import ReplayBuffer

        buffer = ReplayBuffer(num_envs * 32, T, 3, (16, 16), num_envs=num_envs)
        state = buffer.init_state()
        key = jax.random.PRNGKey(7)
        n = 20
        obs = (jax.random.uniform(key, (num_envs, n, 16, 16, 3)) * 255).astype(jnp.uint8)
        act = jax.random.normal(key, (num_envs, n, 3))
        rew = jax.random.normal(key, (num_envs, n))
        cont = jnp.ones((num_envs, n))
        state = buffer.add_batch(state, obs, act, rew, cont)
        return buffer, state

    @pytest.mark.heavy
    def test_matches_global_n_shards_math(self):
        buffer, state = self._make()
        mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
        placed = jax.device_put(state, MeshPlan(mesh).buffer_shardings(state))
        key = jax.random.PRNGKey(3)
        local = buffer.sample_shard_local(mesh, "data", placed, key, 8, t_out=8)
        ref = buffer._sample_impl(state, key, 8, t_out=8, n_shards=4)
        for a, b in zip(local, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_n_shards_one_is_original_sampler(self):
        buffer, state = self._make()
        key = jax.random.PRNGKey(5)
        a = buffer._sample_impl(state, key, 8, t_out=8)
        b = buffer._sample_impl(state, key, 8, t_out=8, n_shards=1)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_env_draws_stay_in_shard_block(self):
        buffer, state = self._make()
        env_idx, _ = buffer._draw_indices(state, jax.random.PRNGKey(0), 16,
                                          n_shards=4)
        env_idx = np.asarray(env_idx)
        for row, e in enumerate(env_idx):
            s = row // 4
            assert s * 2 <= e < (s + 1) * 2, (row, e)

    def test_no_all_gather_in_compiled_sample(self):
        buffer, state = self._make()
        mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
        plan = MeshPlan(mesh)

        fn = jax.jit(
            lambda s, k: buffer.sample_shard_local(mesh, "data", s, k, 8, t_out=8),
            in_shardings=(plan.buffer_shardings(state), plan.replicated()))
        text = fn.lower(state, jax.random.PRNGKey(0)).compile().as_text()
        assert "all-gather" not in text and "all-to-all" not in text, text[:2000]


@pytest.mark.heavy
class TestMeshFromConfig:
    def test_orchestrated_training_on_mesh(self, tmp_path):
        """Full orchestrator lifecycle with runtime.mesh_shape on the virtual
        8-CPU platform: rollout -> sharded wm/train steps -> eval."""
        import numpy as np

        from dreamer_tpu.orchestrator import Dreamer
        from tests.test_orchestrator import smoke_cfg

        cfg = smoke_cfg(tmp_path, **{"runtime.mesh_shape": "[2,1]",
                                     "train.batch_size": 8})
        d = Dreamer(cfg)
        final = d.train(progress=False)
        assert np.isfinite(final)
        assert d.iteration == 4


@pytest.mark.heavy
class TestMeshResume:
    def test_restore_under_mesh_is_sharded_and_trains(self, tmp_path):
        """Saving from a mesh run and resuming into a fresh mesh-bound
        orchestrator must re-place state/buffer on the plan shardings and
        continue training (VERDICT r1: mesh-aware checkpoint restore)."""
        from dreamer_tpu.orchestrator import Dreamer
        from tests.test_orchestrator import smoke_cfg

        kw = {"runtime.mesh_shape": "[2,1]", "train.batch_size": 8,
              "train.training_iterations": 2}
        d = Dreamer(smoke_cfg(tmp_path, **kw))
        d.train(progress=False)
        assert d.iteration == 2

        d2 = Dreamer(smoke_cfg(tmp_path, **kw))
        assert d2.restore_latest()
        assert d2.iteration == 2
        # every state leaf landed on exactly its plan sharding
        sh_tree = d2._plan.state_shardings(d2.state)
        for leaf, sh in zip(jax.tree.leaves(d2.state), jax.tree.leaves(sh_tree)):
            assert leaf.sharding.is_equivalent_to(sh, leaf.ndim), (leaf.shape, sh)
        # buffer ring re-placed with its env sharding
        buf_sh = d2._plan.buffer_shardings(d2.buf)
        assert d2.buf.obs.sharding.is_equivalent_to(buf_sh.obs, d2.buf.obs.ndim)
        # one more sharded iteration runs
        d2.state, m = d2._sharded_iteration(d2.state, d2.buf,
                                            d2._learner_key())
        assert np.isfinite(float(m["wm/loss"]))


@pytest.mark.heavy
class TestDryrunDeviceCounts:
    @pytest.mark.parametrize("n", [1, 2, 4])
    def test_dryrun_various_counts(self, n):
        import __graft_entry__ as ge

        ge.dryrun_multichip(n)
