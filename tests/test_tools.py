"""Tests for aux tooling: results plotting, weights-only export/import,
distributed init helper."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_orchestrator import smoke_cfg


class TestMetricsRotation:
    def test_resume_rotates_to_legs_fresh_archives_to_stale(self, tmp_path):
        """A supervised restart (resuming=True) rotates pre-existing metrics
        into .legN files that harvest concatenates; a FRESH run reusing the
        log_dir (resuming=False) archives them to .staleN files that harvest
        ignores — so an unrelated previous run cannot pollute the new curves
        (ADVICE r4)."""
        from dreamer_tpu.utils import MetricsLogger

        d = str(tmp_path)
        m1 = MetricsLogger(d)
        m1.log_iteration(1, {"wm/loss": 1.0})
        m1.save_npz()
        m1.close()
        # Restart into the same dir: previous files become leg1.
        m2 = MetricsLogger(d, resuming=True)
        m2.log_iteration(2, {"wm/loss": 2.0})
        m2.save_npz()
        m2.close()
        assert os.path.exists(os.path.join(d, "metrics.leg1.csv"))
        assert os.path.exists(os.path.join(d, "training_logs.leg1.npz"))
        # Fresh run into the same dir: current files become stale1, legs of
        # the old run remain untouched (still ignored by the new run's story).
        m3 = MetricsLogger(d, resuming=False)
        m3.log_iteration(1, {"wm/loss": 3.0})
        m3.close()
        assert os.path.exists(os.path.join(d, "metrics.stale1.csv"))
        assert not os.path.exists(os.path.join(d, "metrics.leg2.csv"))


class TestPlotResults:
    def test_plot_curves_from_npz(self, tmp_path):
        from tools.plot_results import plot_curves

        npz = tmp_path / "training_logs.npz"
        np.savez(npz,
                 world_model_loss=np.random.rand(20, 2).astype(np.float32),
                 actor_loss=np.random.rand(20).astype(np.float32),
                 critic_loss=np.random.rand(20).astype(np.float32),
                 rewards=np.random.rand(5).astype(np.float32))
        out = tmp_path / "curves.png"
        plot_curves(str(npz), str(out))
        assert out.exists() and out.stat().st_size > 1000


class TestAgentExport:
    def test_save_load_agent_roundtrip(self, tmp_path):
        from dreamer_tpu.orchestrator import Dreamer

        d = Dreamer(smoke_cfg(tmp_path))
        path = str(tmp_path / "agent_export")
        d.save_agent(path)

        d2 = Dreamer(smoke_cfg(tmp_path))
        # different init -> params differ before load
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            d.state.ac.critic_params, d2.state.ac.critic_params)
        # (same seed config gives same init, so force a perturbation)
        d2.state = d2.state._replace(ac=d2.state.ac._replace(
            critic_params=jax.tree.map(lambda x: x + 1.0, d2.state.ac.critic_params)))
        d2.load_agent(path)
        same = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)),
                            d.state.ac.critic_params, d2.state.ac.critic_params)
        assert all(jax.tree.leaves(same))
        same_wm = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)),
                               d.state.wm.params, d2.state.wm.params)
        assert all(jax.tree.leaves(same_wm))


class TestDistributed:
    def test_single_process_noop(self):
        from dreamer_tpu.parallel.distributed import init_distributed, is_primary

        assert init_distributed() is False  # no coordinator configured
        assert is_primary()


class TestCheckpointPruning:
    def test_keep_last(self, tmp_path):
        import os

        from dreamer_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path), keep_last=2)
        for step in (1, 2, 3, 4):
            mgr.save(step, {"x": np.arange(3)})
        names = sorted(os.listdir(tmp_path))
        assert "ckpt_3" in names and "ckpt_4" in names
        assert "ckpt_1" not in names and "ckpt_2" not in names
        assert mgr.latest_step() == 4
        restored = mgr.restore(4, {"x": np.zeros(3, np.int64)})
        np.testing.assert_array_equal(np.asarray(restored["x"]), np.arange(3))


class TestTopologyIndependentRestore:
    def test_restore_without_sharding_file(self, tmp_path):
        """Single-process restore must not depend on the checkpoint's saved
        device/sharding metadata: a run checkpointed with leaves on one
        topology (e.g. rollout RNG on TFRT_CPU_0 under rollout_device='cpu')
        must resume on a different one (axon TPU, where that device name does
        not resolve).  Deleting orbax's _sharding file proves the restore
        path never consults it."""
        import os

        import jax

        from dreamer_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path), keep_last=2)
        tree = {"x": jax.numpy.arange(5, dtype=jax.numpy.float32),
                "k": jax.random.PRNGKey(7)}
        mgr.save(1, tree)
        sharding_file = os.path.join(str(tmp_path), "ckpt_1", "_sharding")
        if os.path.exists(sharding_file):
            os.remove(sharding_file)
        target = {"x": jax.numpy.zeros(5, jax.numpy.float32),
                  "k": jax.random.PRNGKey(0)}
        restored = mgr.restore(1, target)
        np.testing.assert_array_equal(np.asarray(restored["x"]),
                                      np.arange(5, dtype=np.float32))
        np.testing.assert_array_equal(np.asarray(restored["k"]),
                                      np.asarray(jax.random.PRNGKey(7)))


@pytest.mark.heavy
class TestGracefulShutdown:
    def test_sigterm_checkpoints_and_exits_tempfail(self, tmp_path):
        """SIGTERM must finish the current iteration, write a checkpoint, and
        exit 75 (EX_TEMPFAIL — preempted, not completed; a supervisor resumes
        on it immediately) — zero lost progress on preemption (vs up to
        checkpoint_every iterations with a hard kill)."""
        import os
        import signal
        import subprocess
        import sys
        import time

        ckpt_dir = tmp_path / "models"
        proc = subprocess.Popen(
            [sys.executable, "-m", "dreamer_tpu.cli.train",
             "--config", "configs/fake_smoke.yaml", "--platform", "cpu",
             "--overrides",
             "train.training_iterations=100000",
             "train.checkpoint_every=100000",
             "train.eval_every=100000",
             "train.random_iterations=2",
             f"runtime.log_dir={tmp_path / 'logs'}",
             f"runtime.checkpoint_dir={ckpt_dir}",
             "runtime.rollout_device=cpu"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        try:
            # Wait until the training loop has made some iterations (the
            # metrics csv is appended once per iteration).
            csv_path = tmp_path / "logs" / "metrics.csv"
            deadline = time.time() + 300   # jax import + CPU compile under load
            while time.time() < deadline:
                if csv_path.exists() and len(csv_path.read_text().splitlines()) > 3:
                    break
                time.sleep(1.0)
            else:
                raise AssertionError("trainer never started iterating")
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert rc == 75, "graceful preemption must exit EX_TEMPFAIL, not 0"
        latest = ckpt_dir / "LATEST"
        assert latest.exists(), "graceful stop must leave a checkpoint"
        step = int(latest.read_text().strip())
        # Only the SIGTERM path can have saved (cadences are 100000) and the
        # run cannot have finished.
        assert 0 < step < 100000


class TestHangWatchdog:
    """tools/run_supervised.py hang detection: a child whose device call hangs
    never exits, so exit-code supervision alone cannot recover it (observed
    round 4: a dropped accelerator tunnel silently stalled the flagship run
    for 1h+).  The trainer touches <log_dir>/heartbeat from its main work
    loop; a stale mtime past --hang-timeout gets the child SIGKILLed."""

    def test_stale_heartbeat_kills_child(self, tmp_path):
        import subprocess
        import sys
        import time

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
        from run_supervised import _wait_with_watchdog

        hb = tmp_path / "heartbeat"
        hb.write_text("")  # pre-existing (stale) file from a prior attempt
        os.utime(hb, (time.time() - 3600, time.time() - 3600))
        proc = subprocess.Popen([sys.executable, "-c",
                                 "import time; time.sleep(120)"])
        t0 = time.monotonic()
        rc = _wait_with_watchdog(proc, str(hb), 3.0, time.monotonic(),
                                 {"requested": False})
        assert rc is None                      # hang verdict, not an exit code
        assert proc.poll() is not None         # child actually dead
        assert time.monotonic() - t0 < 30      # detected promptly
        # The pre-existing stale mtime did NOT count against the fresh child:
        # detection took at least the full timeout from child start.
        assert time.monotonic() - t0 >= 3.0

    def test_live_child_exits_normally(self, tmp_path):
        import subprocess
        import sys
        import time

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
        from run_supervised import _wait_with_watchdog

        hb = tmp_path / "heartbeat"
        # Child touches the heartbeat, outlives the timeout, exits 7.  The
        # timeout (15s) leaves production-like margin over interpreter
        # startup — in real use it is 30 min vs seconds of startup.
        proc = subprocess.Popen([sys.executable, "-c", (
            "import os, sys, time\n"
            "p = sys.argv[1]\n"
            "for _ in range(8):\n"
            "    open(p, 'a').close()\n"
            "    os.utime(p, None)\n"
            "    time.sleep(0.5)\n"
            "sys.exit(7)\n"), str(hb)])
        rc = _wait_with_watchdog(proc, str(hb), 15.0, time.monotonic(),
                                 {"requested": False})
        assert rc == 7


class TestAsyncCheckpoint:
    def test_async_save_restore(self, tmp_path):
        from dreamer_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path), keep_last=2, use_async=True)
        for step in (1, 2, 3):
            mgr.save(step, {"x": np.full(4, step)})
        mgr.wait_until_finished()
        assert mgr.latest_step() == 3
        restored = mgr.restore(3, {"x": np.zeros(4)})
        np.testing.assert_array_equal(np.asarray(restored["x"]), np.full(4, 3))
        import os
        assert "ckpt_1" not in os.listdir(tmp_path)

    @pytest.mark.heavy
    def test_orchestrator_async_checkpoint(self, tmp_path):
        from dreamer_tpu.orchestrator import Dreamer
        from tests.test_orchestrator import smoke_cfg

        cfg = smoke_cfg(tmp_path, **{"runtime.async_checkpoint": True,
                                     "train.checkpoint_every": 2})
        d = Dreamer(cfg)
        final = d.train(progress=False)
        assert np.isfinite(final)
        d2 = Dreamer(cfg)
        assert d2.restore_latest()
        assert d2.iteration == 4
