"""Orchestrator integration tests on the fake env: rollout -> replay -> train,
eval, checkpoint/resume round-trip (SURVEY §4 integration tier)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.config import DreamerConfig
from dreamer_tpu.orchestrator import Dreamer

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "fake_smoke.yaml")


def smoke_cfg(tmp_path, **overrides):
    ov = [f"runtime.checkpoint_dir={tmp_path}/models",
          f"runtime.log_dir={tmp_path}/logs",
          "train.training_iterations=4", "train.random_iterations=2",
          "train.eval_every=100", "train.checkpoint_every=100"]
    ov += [f"{k}={v}" for k, v in overrides.items()]
    return DreamerConfig.from_yaml(CFG_PATH, overrides=ov)


class TestRollout:
    def test_rollout_fills_buffer(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        d.rollout_policy(random_policy=True)
        assert int(d.buf.size) == d.cfg.train.sequence_length
        d.rollout_policy(random_policy=False)
        assert int(d.buf.size) == 2 * d.cfg.train.sequence_length
        # rewards in buffer are symlogged copies of env rewards
        assert np.isfinite(np.asarray(d.buf.reward[:, : int(d.buf.size)])).all()

    def test_persistent_state_across_rollouts(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        d.rollout_policy(random_policy=True)
        h1 = np.asarray(d._h)
        d.rollout_policy(random_policy=True)
        h2 = np.asarray(d._h)
        assert not np.allclose(h1, h2)  # state carried and evolved, not reset


@pytest.mark.heavy
class TestTrainLoop:
    def test_short_training_run(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        final = d.train(progress=False)
        assert np.isfinite(final)
        assert d.iteration == 4
        assert len(d.metrics.wm_losses) == 4
        assert os.path.exists(d.metrics.save_npz())
        data = np.load(os.path.join(str(tmp_path), "logs", "training_logs.npz"))
        # reference-compatible keys (Dreamer.py:356-364)
        assert set(data.files) == {"world_model_loss", "actor_loss", "critic_loss", "rewards"}
        assert data["world_model_loss"].shape[0] == 4

    def test_throughput_counters_logged(self, tmp_path):
        """SURVEY §5 tracing plan: per-phase wall-clock counters (env-steps/s,
        grad-updates/s — the BASELINE metrics) land in the metrics CSV."""
        import csv

        d = Dreamer(smoke_cfg(tmp_path))
        d.train(progress=False)
        d.metrics.close()
        with open(os.path.join(str(tmp_path), "logs", "metrics.csv")) as f:
            rows = [r for r in csv.DictReader(f) if r.get("perf/env_steps_per_s")]
        assert rows, "no perf counters logged"
        r = rows[-1]
        steps_per_iter = d.cfg.train.sequence_length * d.cfg.env.num_envs
        # optimizer steps per iteration: 1 per WM epoch + 2 per AC epoch
        # (actor and critic step separately, train/agent.py)
        updates_per_iter = d.cfg.train.wm_epochs + 2 * d.cfg.train.ac_epochs
        ratio = (float(r["perf/env_steps_per_s"]) /
                 float(r["perf/grad_updates_per_s"]))
        assert ratio == pytest.approx(steps_per_iter / updates_per_iter)
        assert float(r["perf/rollout_s"]) > 0
        assert float(r["perf/learner_s"]) > 0

    def test_evaluate_agent(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        reward = d.evaluate_agent(2, max_steps=20)
        assert np.isfinite(reward)


@pytest.mark.heavy
class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        d.rollout_policy(random_policy=True)
        d.state, _ = d.trainer.wm_step(d.state, d.buf, jax.random.PRNGKey(0))
        d.iteration = 7
        d.save_checkpoint()

        d2 = Dreamer(smoke_cfg(tmp_path))
        assert d2.restore_latest()
        assert d2.iteration == 7
        assert int(d2.buf.size) == int(d.buf.size)
        same = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)),
                            d.state.wm.params, d2.state.wm.params)
        assert all(jax.tree.leaves(same))
        # optimizer state restored too (full resume, unlike the reference)
        same_opt = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)),
                                d.state.wm.opt_state, d2.state.wm.opt_state)
        assert all(jax.tree.leaves(same_opt))

    def test_restore_without_checkpoint_returns_false(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        assert not d.restore_latest()

    def test_checkpoint_without_replay(self, tmp_path):
        """runtime.checkpoint_replay=False: params/opt/counters round-trip,
        the replay ring is excluded, and the resumed trainer re-primes it."""
        cfg_kw = {"runtime.checkpoint_replay": "false"}
        d = Dreamer(smoke_cfg(tmp_path, **cfg_kw))
        d.rollout_policy(random_policy=True)
        d.state, _ = d.trainer.wm_step(d.state, d.buf, jax.random.PRNGKey(0))
        d.iteration = 2
        d.save_checkpoint()

        d2 = Dreamer(smoke_cfg(tmp_path, **cfg_kw))
        assert d2.restore_latest()
        assert d2.iteration == 2
        assert int(d2.buf.size) == 0  # fresh ring, not restored
        same = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)),
                            d.state.wm.params, d2.state.wm.params)
        assert all(jax.tree.leaves(same))
        # train() primes the fresh buffer and continues to completion (the
        # smoke config stops at training_iterations=4).
        d2.train(resume=False, progress=False)
        assert d2.iteration == d2.cfg.train.training_iterations

    def test_replay_toggle_mismatch_tolerated(self, tmp_path):
        """A checkpoint saved without the replay ring must restore under
        checkpoint_replay=true (fresh ring), and one saved WITH the ring must
        restore its ring under checkpoint_replay=false (free diversity)."""
        off = {"runtime.checkpoint_replay": "false"}
        on = {"runtime.checkpoint_replay": "true"}
        # Saved ring-less -> resumed ring-ful.
        d = Dreamer(smoke_cfg(tmp_path, **off))
        d.rollout_policy(random_policy=True)
        d.iteration = 2
        d.save_checkpoint()
        d2 = Dreamer(smoke_cfg(tmp_path, **on))
        assert d2.restore_latest()
        assert d2.iteration == 2 and int(d2.buf.size) == 0
        # Saved ring-ful -> resumed ring-less: the ring comes back anyway.
        d2.buf = d.buf
        d2.iteration = 3
        d2.save_checkpoint()
        d3 = Dreamer(smoke_cfg(tmp_path, **off))
        assert d3.restore_latest()
        assert d3.iteration == 3
        assert int(d3.buf.size) == d3.cfg.train.sequence_length

    def test_resume_prime_refills_empty_ring(self, tmp_path):
        """train.resume_prime_iterations: a resume that restores NO replay
        ring re-primes it with random rollouts before training continues
        (the resume-crater fix); a ring that already holds enough data is
        left alone."""
        cfg_kw = {"runtime.checkpoint_replay": "false",
                  "train.resume_prime_iterations": "3"}
        d = Dreamer(smoke_cfg(tmp_path, **cfg_kw))
        d.rollout_policy(random_policy=True)
        d.iteration = 4   # == training_iterations: the train loop is a no-op
        d.save_checkpoint()

        d2 = Dreamer(smoke_cfg(tmp_path, **cfg_kw))
        d2.train(resume=True, progress=False)
        assert int(d2.buf.size) >= 3 * d2.cfg.train.sequence_length  # re-primed
        # Idempotent: a second resume sees a ring already at target and adds
        # nothing (restore_latest keeps the in-memory ring when the
        # checkpoint holds none).
        before = int(d2.buf.size)
        d2.train(resume=True, progress=False)
        assert int(d2.buf.size) == before

    def test_stop_during_kickstart_resumes_remaining_rounds(self, tmp_path):
        """A SIGTERM-style stop request arriving DURING the random kickstart
        must be honored between kickstart rounds (not deferred past the first
        training iteration, which can sit behind a ~20-min cold compile on a
        remote-compile tunnel).  The kickstart.json sidecar records how many
        rounds actually completed, so resume runs exactly the REMAINDER —
        neither redoing completed rounds nor (the old bug) silently dropping
        all of them from the parity schedule (reference Dreamer.py kickstart
        always runs in full)."""
        d = Dreamer(smoke_cfg(tmp_path, **{"train.random_iterations": "6"}))
        # Stop after 2 kickstart rounds: flip the flag from inside rollout.
        orig1 = d.rollout_policy
        seen = {"n": 0}

        def stop_after_two(*a, **k):
            seen["n"] += 1
            if seen["n"] == 2:
                d.request_stop()
            return orig1(*a, **k)

        d.rollout_policy = stop_after_two
        d.train(progress=False)
        assert d.stopped and d.iteration == 0
        assert d.ckpt.latest_step() == 0
        import json
        with open(os.path.join(str(tmp_path), "models", "kickstart.json")) as f:
            assert json.load(f)["rounds_done"] == 2

        d2 = Dreamer(smoke_cfg(tmp_path, **{"train.random_iterations": "6"}))
        calls = {"n": 0}
        orig = d2.rollout_policy

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        d2.rollout_policy = counted
        d2.train(resume=True, progress=False)
        assert d2.iteration == d2.cfg.train.training_iterations
        # Exactly the 4 remaining kickstart rounds + one rollout per training
        # iteration — neither 0 nor 6 kickstart rounds.
        assert calls["n"] == 4 + d2.cfg.train.training_iterations
        # Completion recorded: a further resume redoes nothing.
        with open(os.path.join(str(tmp_path), "models", "kickstart.json")) as f:
            assert json.load(f)["rounds_done"] == 6

    def test_legacy_iteration0_checkpoint_skips_kickstart(self, tmp_path):
        """Checkpoints from before the kickstart.json sidecar keep the old
        semantics: restored at iteration 0 without a sidecar => kickstart
        treated as spent (never double-run the schedule)."""
        d = Dreamer(smoke_cfg(tmp_path, **{"train.random_iterations": "5"}))
        d.rollout_policy(random_policy=True)
        d.save_checkpoint()  # iteration-0 checkpoint, no sidecar
        d.ckpt.wait_until_finished()
        sidecar = os.path.join(str(tmp_path), "models", "kickstart.json")
        if os.path.exists(sidecar):
            os.remove(sidecar)

        d2 = Dreamer(smoke_cfg(tmp_path, **{"train.random_iterations": "5"}))
        calls = {"n": 0}
        orig = d2.rollout_policy

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        d2.rollout_policy = counted
        d2.train(resume=True, progress=False)
        assert d2.iteration == d2.cfg.train.training_iterations
        # No kickstart rounds re-run; ring-less resume with prime=0 defaults
        # to random_iterations rounds of re-priming (the crater guard), plus
        # one rollout per training iteration.
        assert calls["n"] <= 5 + d2.cfg.train.training_iterations

    def test_ringless_resume_defaults_reprime_to_kickstart_budget(self, tmp_path):
        """Resuming a ring-less checkpoint with resume_prime_iterations=0
        (the supervisor crash-restart default) must NOT start training on a
        buffer primed only to sequence_length — it defaults the re-prime
        target to random_iterations rounds (the documented eval-crater fix)."""
        cfg_kw = {"runtime.checkpoint_replay": "false",
                  "train.resume_prime_iterations": "0",
                  "train.random_iterations": "3"}
        d = Dreamer(smoke_cfg(tmp_path, **cfg_kw))
        d.rollout_policy(random_policy=True)
        d.iteration = 4   # == training_iterations: the train loop is a no-op
        d.save_checkpoint()
        d.ckpt.wait_until_finished()

        d2 = Dreamer(smoke_cfg(tmp_path, **cfg_kw))
        d2.train(resume=True, progress=False)
        assert int(d2.buf.size) >= 3 * d2.cfg.train.sequence_length

    def test_fresh_start_ignores_and_removes_stale_sidecar(self, tmp_path):
        """A FRESH (non-resumed) run into a reused checkpoint_dir with a
        leftover kickstart.json must not skip the kickstart for freshly
        initialized weights (ADVICE r4): the stale sidecar is deleted and the
        full random_iterations kickstart runs."""
        import json

        models = tmp_path / "models"
        models.mkdir(parents=True, exist_ok=True)
        with open(models / "kickstart.json", "w") as f:
            json.dump({"rounds_done": 999}, f)
        d = Dreamer(smoke_cfg(tmp_path, **{"train.random_iterations": "3",
                                           "train.training_iterations": "1"}))
        calls = {"n": 0}
        orig = d.rollout_policy

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        d.rollout_policy = counted
        d.train(progress=False)
        # All 3 kickstart rounds ran + 1 training-iteration rollout.
        assert calls["n"] == 3 + 1
        with open(models / "kickstart.json") as f:
            assert json.load(f)["rounds_done"] == 3

    def test_nu_override_file_updates_dose(self, tmp_path):
        """runtime.traced_nu live dosing: writing <log_dir>/nu_override
        changes the entropy coefficient applied from the next iteration,
        with no recompile (the round-4 anti-collapse intervention as a
        runtime input)."""
        d = Dreamer(smoke_cfg(tmp_path, **{"runtime.traced_nu": "true"}))
        assert d._nu == d.cfg.agent.nu
        log_dir = tmp_path / "logs"
        log_dir.mkdir(parents=True, exist_ok=True)
        with open(log_dir / "nu_override", "w") as f:
            f.write("1e-2\n")
        d._maybe_update_nu(lambda *a, **k: None)
        assert d._nu == pytest.approx(1e-2)
        # Unchanged mtime: no re-read; garbage content: dose keeps its value.
        d._maybe_update_nu(lambda *a, **k: None)
        assert d._nu == pytest.approx(1e-2)
        import time as _time

        with open(log_dir / "nu_override", "w") as f:
            f.write("not a float")
        os.utime(log_dir / "nu_override", (0, _time.time() + 10))
        d._maybe_update_nu(lambda *a, **k: None)
        assert d._nu == pytest.approx(1e-2)
        # End-to-end: the traced-nu train loop runs with the live dose.
        d.train(progress=False)
        assert d.iteration == d.cfg.train.training_iterations

    def test_heartbeat_is_per_process(self, tmp_path):
        """Non-zero processes beat their own heartbeat.procN file so a
        per-host supervisor can watch its own child (ADVICE r4)."""
        d = Dreamer(smoke_cfg(tmp_path))
        d._touch_heartbeat()
        assert os.path.exists(os.path.join(str(tmp_path), "logs", "heartbeat"))
        d._proc = 2
        d._touch_heartbeat()
        assert os.path.exists(
            os.path.join(str(tmp_path), "logs", "heartbeat.proc2"))
        d._proc = 0

    def test_kickstart_completion_is_checkpointed(self, tmp_path):
        """Completing the kickstart writes an iteration-0 checkpoint, so a
        crash before the first periodic checkpoint does not redo all
        random_iterations rollout+WM rounds."""
        d = Dreamer(smoke_cfg(tmp_path, **{"train.training_iterations": "1"}))
        d.train(progress=False)
        assert os.path.exists(os.path.join(str(tmp_path), "models", "ckpt_0"))
        assert d.ckpt.latest_step() == 1  # final save still wins LATEST


@pytest.mark.heavy
class TestEpisodeBoundaryTraining:
    def test_short_run_with_boundary_resets(self, tmp_path):
        """End-to-end train with wm.reset_on_episode_start=true on a fake env
        whose episodes (7 steps) are SHORTER than the replay window (16) —
        every sampled sequence straddles multiple auto-resets.  Exercises the
        reset observe/warm-start scans and the AC path's cont gathers."""
        d = Dreamer(smoke_cfg(tmp_path, **{
            "wm.reset_on_episode_start": "true",
            "env.max_episode_steps": "7"}))
        final = d.train(progress=False)
        assert np.isfinite(final)
        assert d.iteration == d.cfg.train.training_iterations
        # Boundaries really occurred in the collected data.
        rows = open(os.path.join(str(tmp_path), "logs", "metrics.csv")).read()
        import csv as _csv
        recs = list(_csv.DictReader(rows.splitlines()))
        assert any(float(r["rollout/done_frac"]) > 0 for r in recs
                   if r.get("rollout/done_frac"))


class TestBatchedEval:
    def test_batched_matches_sequential_episode_count(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        r_batched = d.evaluate_agent(3, max_steps=25, batched=True)
        assert np.isfinite(r_batched)
        r_seq = d.evaluate_agent(2, max_steps=25, batched=False)
        assert np.isfinite(r_seq)

    def test_batched_eval_respects_episode_end(self, tmp_path):
        # fake env truncates at episode_len=100; max_steps larger is fine
        d = Dreamer(smoke_cfg(tmp_path))
        r = d.evaluate_agent(2, max_steps=300, batched=True)
        assert np.isfinite(r)

    def test_batched_eval_compacts_mixed_lengths(self, tmp_path):
        """Episodes ending at different times are compacted out of the device
        step (power-of-two buckets) instead of being stepped until max_steps;
        per-episode returns must still be complete."""
        from dreamer_tpu.envs import EnvFarm
        from dreamer_tpu.envs.fake import FakeEnv

        d = Dreamer(smoke_cfg(tmp_path))
        lens = [6, 20, 41]
        d._eval_farm = EnvFarm(
            [lambda l=l: FakeEnv(obs_size=(32, 32), episode_len=l) for l in lens],
            seed=0)
        r = d.evaluate_agent(3, max_steps=60)
        assert np.isfinite(r)
        # every episode ran to its own truncation (reward ~1/step scale, all
        # three lengths contribute -> mean over 3 episodes of len-sum rewards)
        assert r != 0.0


class TestWeightBroadcast:
    """The learner->actor weight broadcast rides one flattened device buffer
    (per-leaf device_put costs a device round-trip per leaf over a remote-chip
    tunnel).  The flatten/unflatten pair must reconstruct the param tree."""

    def test_flat_broadcast_roundtrip_f32(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path, **{"runtime.rollout_device": "cpu"}))
        params = (d.state.wm.params, d.state.ac.actor_params)
        flatten, unflatten = d._make_broadcast_fns(params)
        out = unflatten(np.asarray(flatten(params)))
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), params, out)

    def test_flat_broadcast_roundtrip_bf16(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path, **{
            "runtime.rollout_device": "cpu",
            "runtime.broadcast_dtype": "bfloat16"}))
        params = (d.state.wm.params, d.state.ac.actor_params)
        flatten, unflatten = d._make_broadcast_fns(params)
        out = unflatten(np.asarray(flatten(params)))
        # bf16 wire dtype: values land back in f32 within bf16 rounding.
        def close(a, b):
            assert b.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=8e-3, atol=8e-3)
        jax.tree.map(close, params, out)

    def test_rng_key_is_host_committed(self, tmp_path):
        d = Dreamer(smoke_cfg(tmp_path))
        cpu = jax.devices("cpu")[0]
        assert cpu in d.rng.devices()
        assert cpu in d.rollout_rng.devices()
        # Both streams split host-side (no accelerator round-trip per split).
        with d._rng_lock:
            _, k = __import__("jax").random.split(d.rollout_rng)
        assert cpu in k.devices()


@pytest.mark.heavy
class TestDeterminism:
    def test_same_seed_same_metrics(self, tmp_path):
        cfg1 = smoke_cfg(tmp_path / "a")
        cfg2 = smoke_cfg(tmp_path / "b")
        d1, d2 = Dreamer(cfg1), Dreamer(cfg2)
        d1.rollout_policy(random_policy=True)
        d2.rollout_policy(random_policy=True)
        s1, m1 = d1.trainer.train_iteration(d1.state, d1.buf, jax.random.PRNGKey(3))
        s2, m2 = d2.trainer.train_iteration(d2.state, d2.buf, jax.random.PRNGKey(3))
        assert float(m1["wm/loss"]) == float(m2["wm/loss"])
        assert float(m1["ac/loss_actor"]) == float(m2["ac/loss_actor"])
