"""Worker for the 2-process jax.distributed CPU test (run by
tests/test_distributed.py, one subprocess per simulated host).

Environment (set by the parent):
  JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2,
  JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID.

Each process = one "host" with 2 CPU devices and a 2-env local farm; the
global mesh is (data=4, model=1) over 4 devices / 4 env streams.  The worker
trains 2 iterations (collective learner, process-local rollout/eval),
checkpoints, then RESUMES into a third iteration from a fresh orchestrator —
the multi-host analogue of the reference's save/load cycle (Dreamer.py:289-293)
which the reference cannot do at all (no torch.distributed, SURVEY §2.3).

Prints ``CHECKSUM <value>`` at the end; the parent asserts both processes
computed the identical post-resume parameter checksum (the learner streams
must stay in lockstep across hosts).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

# The host image's sitecustomize registers a TPU ('axon') backend in every
# process and wins over the JAX_PLATFORMS env var (jax is already imported);
# force the CPU platform through jax.config like tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")

from dreamer_tpu.parallel.distributed import init_distributed, is_primary

assert init_distributed(), "expected a multi-process setup"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.devices()

import numpy as np  # noqa: E402

from dreamer_tpu.config import DreamerConfig  # noqa: E402
from dreamer_tpu.orchestrator import Dreamer  # noqa: E402

out_dir = sys.argv[1]
CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "fake_smoke.yaml")


def make_cfg(iters: int) -> DreamerConfig:
    return DreamerConfig.from_yaml(CFG, overrides=[
        "runtime.mesh_shape=[4,1]",
        "runtime.rollout_device=cpu",
        "env.num_envs=2",            # per process -> 4 global env streams
        "train.batch_size=8",
        "train.sequence_length=16",
        f"train.training_iterations={iters}",
        "train.random_iterations=1",
        "train.eval_every=2",
        "train.eval_episodes=2",
        "train.checkpoint_every=2",
        f"runtime.log_dir={out_dir}/logs",
        f"runtime.checkpoint_dir={out_dir}/models",
    ])


d = Dreamer(make_cfg(2))
assert d.trainer.cfg.env.num_envs == 4, "learner must span the global farm"
d.train(progress=is_primary())
assert d.iteration == 2

# Fresh orchestrator; resume from the step-2 checkpoint and run 1 more iter.
d2 = Dreamer(make_cfg(3))
d2.train(resume=True, progress=is_primary())
assert d2.iteration == 3, d2.iteration

leaves = jax.tree.leaves((d2.state.wm.params, d2.state.ac.actor_params,
                          d2.state.ac.critic_params))
full = np.concatenate(
    [np.asarray(leaf.addressable_data(0), np.float64).ravel()
     for leaf in leaves])
print(f"CHECKSUM {np.sum(np.abs(full)):.10e}", flush=True)
