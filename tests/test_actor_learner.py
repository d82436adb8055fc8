"""Actor-learner split tests: host-local policy device, weight broadcast
caching, async rollout/learner overlap."""

import jax
import numpy as np
import pytest

from dreamer_tpu.orchestrator import Dreamer
from tests.test_orchestrator import smoke_cfg


class TestRolloutDeviceCPU:
    @pytest.mark.heavy
    def test_cpu_rollout_trains(self, tmp_path):
        cfg = smoke_cfg(tmp_path, **{"runtime.rollout_device": "cpu"})
        d = Dreamer(cfg)
        final = d.train(progress=False)
        assert np.isfinite(final)
        assert d.iteration == 4

    @pytest.mark.heavy
    def test_policy_params_cached_per_state(self, tmp_path):
        cfg = smoke_cfg(tmp_path, **{"runtime.rollout_device": "cpu"})
        d = Dreamer(cfg)
        p1 = d._policy_params()
        p2 = d._policy_params()
        assert p1 is p2  # no re-broadcast while state unchanged
        d.rollout_policy(random_policy=True)
        d.state, _ = d.trainer.wm_step(d.state, d.buf, jax.random.PRNGKey(0))
        p3 = d._policy_params()
        assert p3 is not p1  # state changed -> fresh broadcast


class TestAsyncRollout:
    def test_async_requires_cpu_rollout(self, tmp_path):
        with pytest.raises(ValueError):
            Dreamer(smoke_cfg(tmp_path, **{"runtime.async_rollout": True}))

    @pytest.mark.heavy
    def test_async_training_runs(self, tmp_path):
        cfg = smoke_cfg(tmp_path, **{"runtime.rollout_device": "cpu",
                                     "runtime.async_rollout": True})
        d = Dreamer(cfg)
        final = d.train(progress=False)
        assert np.isfinite(final)
        assert d.iteration == 4
        assert len(d.metrics.wm_losses) == 4
        # buffer received all rollout rounds (2 kickstart + 4 training)
        assert int(d.buf.size) == 6 * cfg.train.sequence_length
