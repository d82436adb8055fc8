"""Sharding plan: how the Dreamer state, replay buffer, and batches lay out
over the (data, model) mesh.

Strategy (SURVEY §2.3):
- batch dims (replay batch B, env axis E) shard over ``data``; XLA inserts the
  gradient psum over ICI automatically when replicated params meet sharded
  batches under jit.
- params replicate over ``data``.  Over ``model`` (tensor parallelism,
  reserved for the big-VAE configs) 2-D kernels whose output column dim
  divides the axis size shard as P(None, "model"); everything else replicates.
- the replay rings shard their env axis over ``data`` when divisible (each
  data shard owns its local env streams — the actor-learner layout where
  host-local envs feed the local shard), else replicate.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dreamer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from dreamer_tpu.replay import ReplayState


class MeshPlan:
    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.n_data = mesh.shape[DATA_AXIS]
        self.n_model = mesh.shape[MODEL_AXIS]

    # ------------------------------------------------------------------ #
    # Specs
    # ------------------------------------------------------------------ #

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def batch_spec(self) -> NamedSharding:
        """Leading dim (batch/env) over data."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def param_spec(self, param: jnp.ndarray) -> NamedSharding:
        """Tensor-parallel spec for one param: shard the output column dim of
        big 2-D kernels over ``model``; replicate the rest."""
        if (self.n_model > 1 and param.ndim == 2
                and param.shape[1] % self.n_model == 0 and param.shape[1] >= 256):
            return NamedSharding(self.mesh, P(None, MODEL_AXIS))
        return self.replicated()

    def state_shardings(self, state: Any) -> Any:
        """Shardings for a DreamerState-shaped pytree: params/opt get
        param_spec, scalars replicate."""
        return jax.tree.map(
            lambda leaf: self.param_spec(leaf) if hasattr(leaf, "ndim") else self.replicated(),
            state)

    def buffer_shardings(self, buf: ReplayState) -> ReplayState:
        num_envs = buf.obs.shape[0]
        env_spec = (NamedSharding(self.mesh, P(DATA_AXIS))
                    if num_envs % self.n_data == 0 and num_envs >= self.n_data
                    else self.replicated())
        return ReplayState(
            obs=env_spec, action=env_spec, reward=env_spec, cont=env_spec,
            next_idx=self.replicated(), size=self.replicated(),
        )

    # ------------------------------------------------------------------ #
    # Placement + sharded programs
    # ------------------------------------------------------------------ #

    def place_state(self, state: Any) -> Any:
        shardings = self.state_shardings(state)
        if jax.process_count() == 1:
            return jax.device_put(state, shardings)
        # Multi-host: every process holds identical full host values (same
        # init seed); assemble global arrays shard-by-shard.
        return jax.tree.map(self._global_from_full, state, shardings)

    @staticmethod
    def _global_from_full(x, sharding):
        """Build a (possibly cross-process) global array from a full host copy
        present on every process."""
        import numpy as np

        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    def place_buffer(self, buf: ReplayState) -> ReplayState:
        shardings = self.buffer_shardings(buf)
        if jax.process_count() == 1:
            return jax.device_put(buf, shardings)
        return jax.tree.map(self._global_from_full, buf, shardings)

    def make_buffer(self, buffer) -> ReplayState:
        """Build the replay ring DIRECTLY on its mesh layout: jit of init
        with out_shardings allocates each shard on its own device — no
        multi-GB host staging array, and multi-host processes allocate only
        their addressable shards."""
        spec = jax.eval_shape(buffer.init_state)
        shardings = self.buffer_shardings(spec)
        return jax.jit(buffer.init_state, out_shardings=shardings)()

    def shard_train_iteration(self, trainer, state_exemplar, buffer_exemplar):
        """jit the Trainer's full iteration over the mesh.

        Params replicate (data) / optionally shard (model); the buffer's env
        axis shards over data; the sampled batch inherits a data-sharded
        layout via an internal with_sharding_constraint, so per-shard grads
        psum over ICI.
        """
        state_sh = self.state_shardings(state_exemplar)
        buf_sh = self.buffer_shardings(buffer_exemplar)
        # The trainer consults this attribute at trace time (Trainer._constrain
        # in _wm_step/_ac_step): each sampled batch's leading dim lands on the
        # data axis so downstream grads are shard-local and psum'd by XLA.
        # A mesh-bound trainer keeps the constraint for its lifetime.
        trainer.batch_constraint = NamedSharding(self.mesh, P(DATA_AXIS))
        # Shard-local replay sampling: when the ring's env axis shards over
        # data AND the batch divides evenly, each data shard samples its rows
        # from its OWN env streams (replay.sample_shard_local) — uniform
        # overall, but no cross-shard gather of the ring.
        num_envs = buffer_exemplar.obs.shape[0]
        batch = trainer.cfg.train.batch_size
        if (self.n_data > 1 and num_envs % self.n_data == 0
                and num_envs >= self.n_data and batch % self.n_data == 0):
            trainer.sample_mesh = self.mesh
            trainer.sample_axis = DATA_AXIS
            trainer.sample_shards = self.n_data
        else:
            trainer.sample_mesh = None
            trainer.sample_axis = None
            trainer.sample_shards = 1

        # nu (entropy coefficient) is always a traced, replicated scalar on
        # the sharded path so mid-run dose changes never recompile the mesh
        # program; callers that omit it get cfg.agent.nu.
        jitted = jax.jit(
            trainer._train_iteration,
            in_shardings=(state_sh, buf_sh, self.replicated(),
                          self.replicated()),
            out_shardings=(state_sh, self.replicated()),
        )

        def step(state, buf, key, nu=None):
            if nu is None:
                nu = jnp.asarray(trainer.cfg.agent.nu, jnp.float32)
            return jitted(state, buf, key, nu)

        return step
