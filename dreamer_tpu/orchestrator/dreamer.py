"""Dreamer orchestrator — the train/eval/run lifecycle (reference:
Dreamer.py:13-401, SURVEY §3.1).

Host responsibilities only: env stepping, buffer write scheduling, eval
cadence, checkpointing, metrics.  All compute is in the Trainer's jitted
programs; the per-env-step device work is ONE fused act+observe call
(policy_act_observe) instead of the reference's two crossings per step.

Lifecycle (train):
  phase 1 — random kickstart x random_iterations: random-policy rollout +
            WM updates (Dreamer.py:331-334)
  phase 2 — x training_iterations: policy rollout + WM updates + AC updates,
            checkpoint/log every 1000, eval every 500 (Dreamer.py:338-368)
  final   — 10-episode eval (Dreamer.py:370)

Rollout keeps persistent recurrent agent state ACROSS iterations (only reset
on episode end), matching Dreamer.py:139-141,177-226.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamer_tpu.config import DreamerConfig
from dreamer_tpu.envs import EnvFarm, make_env
from dreamer_tpu.train import Trainer
from dreamer_tpu.utils import CheckpointManager, MetricsLogger


class Dreamer:
    def __init__(self, cfg: DreamerConfig, env_factory: Optional[Callable] = None,
                 jit: bool = True, resuming: bool = False):
        """``resuming`` is a construction-time hint that this run intends to
        ``--resume``: it decides whether pre-existing metrics files in the
        log_dir are continuation legs (kept) or an unrelated previous run's
        output (archived) — see MetricsLogger."""
        self.cfg = cfg
        # Under multi-host, cfg.env.num_envs is the PER-PROCESS env-farm size;
        # the learner (and its replay ring env axis) spans the global farm.
        learner_cfg = cfg
        if jax.process_count() > 1:
            import dataclasses

            learner_cfg = dataclasses.replace(
                cfg, env=dataclasses.replace(
                    cfg.env, num_envs=cfg.env.num_envs * jax.process_count()))
        self.trainer = Trainer(learner_cfg, jit=jit, donate=jit)
        # The rollout/eval policy runs in float32 regardless of the learner's
        # compute dtype: the reference's autocast wraps only training_step
        # (WorldModel.py:162) — rollout_policy/evaluate_agent run fp32.  On a
        # host-local (CPU) actor this is also ~5x faster than emulated bf16.
        self._policy_trainer = self.trainer
        if cfg.runtime.compute_dtype != "float32":
            import dataclasses

            pol_cfg = dataclasses.replace(
                cfg, runtime=dataclasses.replace(cfg.runtime,
                                                 compute_dtype="float32"))
            self._policy_trainer = Trainer(pol_cfg, jit=jit)
        import threading

        self._rng_lock = threading.Lock()
        # RNG keys live host-side (CPU-committed): key splits happen dozens of
        # times per rollout round, and splitting on a remote accelerator costs
        # a device round-trip each (~30 ms over a tunnel).  Keys destined for
        # learner programs are device_put explicitly (32 bytes, async).
        # local_devices, not devices: under multi-host JAX the global device
        # list leads with process 0's devices, which other processes cannot
        # device_put to.
        self._cpu_device = jax.local_devices(backend="cpu")[0]
        self._learner_device = jax.local_devices()[0]
        self._plan = None
        # Multi-host: one process per host (jax.distributed initialised by the
        # CLI).  Collective programs (learner updates, buffer writes, ckpt)
        # run SPMD on every process; rollout/eval are process-local.
        self._proc = jax.process_index()
        self._nproc = jax.process_count()
        if self._nproc > 1 and cfg.runtime.rollout_device != "cpu":
            raise ValueError(
                "multi-process runs require runtime.rollout_device='cpu': the "
                "rollout/eval policy must be host-local so only the learner "
                "programs are collective")
        # TWO RNG streams: the learner stream MUST advance identically on
        # every process (its keys feed collective SPMD programs — inconsistent
        # 'replicated' inputs are undefined behavior), while the rollout/eval
        # stream is deliberately process-distinct (exploration diversity).
        self.rng = jax.device_put(jax.random.PRNGKey(cfg.train.seed),
                                  self._cpu_device)
        rollout_rng = jax.random.PRNGKey(cfg.train.seed + 1)
        if self._proc > 0:
            rollout_rng = jax.random.fold_in(rollout_rng, self._proc)
        self.rollout_rng = jax.device_put(rollout_rng, self._cpu_device)
        self.state = self.trainer.init_state(self._learner_key())
        self.buf = None   # built below (globally, under a mesh plan)
        self.iteration = 0
        # Graceful-preemption flag (set by request_stop, e.g. from a SIGTERM
        # handler): the train loop finishes the current iteration, writes a
        # checkpoint, and returns cleanly — so an externally stopped run
        # loses zero progress instead of up to checkpoint_every iterations.
        # ``stopped`` records that the last train() exited via this path
        # (a preemption, not a completed schedule).
        self._stop_requested = False
        self.stopped = False

        import functools

        # functools.partial of the module-level make_env stays picklable for
        # AsyncEnvFarm's worker processes under spawn start methods.
        factory = env_factory or functools.partial(
            make_env, cfg.env.env_id, obs_size=cfg.wm.obs_size,
            action_repeat=cfg.env.action_repeat, crop_rows=cfg.env.crop_rows,
            max_episode_steps=cfg.env.max_episode_steps)
        self._env_factory = factory
        farm_cls = EnvFarm
        if cfg.env.async_envs:
            from dreamer_tpu.envs import AsyncEnvFarm

            farm_cls = AsyncEnvFarm
        # Per-process env seeds: each host's farm explores distinct episodes.
        self._env_seed_offset = self._proc * 100_003
        self.farm = farm_cls([factory] * cfg.env.num_envs,
                             seed=cfg.train.seed + self._env_seed_offset,
                             next_step=cfg.env.next_step_autoreset)
        self.eval_env = factory()
        self._eval_farm = None
        self._eval_seed = cfg.train.seed + 10_000

        # Optional multi-device mesh (runtime.mesh_shape = [n_data, n_model]):
        # state/buffer are placed with the MeshPlan shardings and the learner
        # programs run sharded (gradient psum over ICI).  Call
        # parallel.distributed.init_distributed() first for multi-host.
        self._sharded_iteration = None
        self._sharded_wm_step = None
        if self._nproc > 1 and not cfg.runtime.mesh_shape:
            raise ValueError("multi-process runs require runtime.mesh_shape "
                             "(the CLI defaults it to [n_devices, 1])")
        if cfg.runtime.mesh_shape:
            from dreamer_tpu.parallel import MeshPlan, make_mesh

            mesh = make_mesh(cfg.runtime.mesh_shape[0], cfg.runtime.mesh_shape[1])
            self._plan = MeshPlan(mesh)
            if self._nproc > 1:
                n_data = self._plan.n_data
                n_envs_global = cfg.env.num_envs * self._nproc
                if n_data % self._nproc or n_envs_global % n_data:
                    raise ValueError(
                        f"multi-host layout needs data axis ({n_data}) "
                        f"divisible by processes ({self._nproc}) and global "
                        f"envs ({n_envs_global}) divisible by the data axis "
                        "(each host's env rows must land on its own shards)")
            self.state = self._plan.place_state(self.state)
            # Build the replay ring DIRECTLY on its mesh layout (jit with
            # out_shardings): no multi-GB host staging array, and each process
            # allocates only its addressable shards under multi-host.
            self.buf = self._plan.make_buffer(self.trainer.buffer)
            self._sharded_iteration = self._plan.shard_train_iteration(
                self.trainer, self.state, self.buf)
            self._sharded_wm_step = jax.jit(
                self.trainer._wm_step,
                in_shardings=(self._plan.state_shardings(self.state),
                              self._plan.buffer_shardings(self.buf),
                              self._plan.replicated()),
                out_shardings=(self._plan.state_shardings(self.state),
                               self._plan.replicated()))
        else:
            self.buf = self.trainer.buffer.init_state()

        # Persistent rollout state: (h, z) device, current action, current obs.
        self._h = None
        self._z = None
        self._action = None   # device (N, A) — the action to apply next
        self._obs = None      # host uint8 (N, H, W, 3) — obs BEFORE that action
        self._first = None    # host bool (N,) — self._obs is a reset frame
        self._policy_cache = None       # (state identity, broadcast params)
        self._broadcast_fns = None      # lazy (flatten, unflatten) pair
        if cfg.runtime.async_rollout and cfg.runtime.rollout_device != "cpu":
            raise ValueError("runtime.async_rollout requires runtime.rollout_device='cpu' "
                             "(the actor must not read donated learner buffers)")

        # Only the primary process writes metrics files; checkpoint saves stay
        # collective (orbax coordinates the shard writes across processes).
        self.metrics = MetricsLogger(cfg.runtime.log_dir,
                                     enabled=self._proc == 0,
                                     resuming=resuming)
        if self._proc == 0:
            self._write_run_meta()
        self.ckpt = CheckpointManager(cfg.runtime.checkpoint_dir,
                                      use_async=cfg.runtime.async_checkpoint)
        # Best-eval policy retention: the round-1 long run's peak checkpoint
        # was pruned away after the policy later collapsed; keep a weights-only
        # "agent_best" export (never pruned) updated whenever eval improves.
        self.best_eval = float("-inf")
        # Set by restore_latest(): whether the restored checkpoint carried the
        # replay ring.  Drives the ring-less-resume re-prime default in train().
        self._ring_restored = False
        # Live entropy-coefficient dose (runtime.traced_nu): current value +
        # the nu_override file's last-seen mtime (see _maybe_update_nu).
        self._nu = float(cfg.agent.nu)
        self._nu_mtime: Optional[float] = None

    # ------------------------------------------------------------------ #
    # Kickstart progress sidecar: a mid-kickstart graceful stop checkpoints
    # at iteration 0, which previously marked ALL cfg.random_iterations
    # rollout+WM-pretrain rounds as spent — resume silently dropped the rest
    # of the parity schedule (reference Dreamer.py:331-340 always runs the
    # full kickstart).  A tiny JSON next to best.json records rounds actually
    # completed so resume continues from there.  Old checkpoints without the
    # sidecar keep the old semantics (restored => spent).
    # ------------------------------------------------------------------ #

    def _kickstart_path(self) -> str:
        return os.path.join(self.cfg.runtime.checkpoint_dir, "kickstart.json")

    def _kickstart_rounds_done(self, restored: bool) -> int:
        import json

        path = self._kickstart_path()
        if not restored:
            # Fresh (non-resumed) start: a leftover sidecar from a previous
            # run in a reused checkpoint_dir must NOT skip the kickstart for
            # freshly initialized weights.  Remove it so this run's progress
            # writes start clean (ADVICE r4).
            if self._proc == 0 and os.path.exists(path):
                os.remove(path)
            return 0
        if os.path.exists(path):
            with open(path) as f:
                return int(json.load(f)["rounds_done"])
        return self.cfg.train.random_iterations

    def _write_kickstart_progress(self, rounds_done: int):
        if self._proc != 0:
            return
        import json

        os.makedirs(self.cfg.runtime.checkpoint_dir, exist_ok=True)
        with open(self._kickstart_path(), "w") as f:
            json.dump({"rounds_done": rounds_done}, f)

    # ------------------------------------------------------------------ #

    def _write_run_meta(self):
        """Reproducibility record (SURVEY §5 observability): the RESOLVED
        config (post-overrides), git SHA/dirty flag, argv, backend, and device
        list, written to <log_dir>/run_meta.json at construction so every run
        directory states exactly what produced it."""
        import json
        import subprocess
        import sys

        meta = {
            "config": self.cfg.to_dict(),
            "argv": list(sys.argv),
            "time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "jax_backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "processes": self._nproc,
            "git_sha": None,
            "git_dirty": None,
        }
        try:
            repo = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            sha = subprocess.run(["git", "-C", repo, "rev-parse", "HEAD"],
                                 capture_output=True, text=True, timeout=10)
            if sha.returncode == 0:
                meta["git_sha"] = sha.stdout.strip()
                meta["git_dirty"] = bool(subprocess.run(
                    ["git", "-C", repo, "status", "--porcelain"],
                    capture_output=True, text=True,
                    timeout=10).stdout.strip())
        except Exception:
            pass
        os.makedirs(self.metrics.log_dir, exist_ok=True)
        path = os.path.join(self.metrics.log_dir, "run_meta.json")
        # A resumed/restarted run appends an attempt record instead of
        # overwriting: the provenance of the iterations produced by EARLIER
        # attempts (their git SHA / argv) must survive the restart.
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prev = json.load(f)
                meta = {**prev,
                        "attempts": prev.get("attempts", []) + [{
                            k: meta[k] for k in
                            ("argv", "time_utc", "git_sha", "git_dirty")
                            if k in meta}]}
            except Exception:
                pass
        with open(path, "w") as f:
            json.dump(meta, f, indent=1, default=str)

    def _learner_key(self) -> jax.Array:
        """A fresh key placed where the learner programs run (async copy).

        Drawn from the learner stream (self.rng), which advances identically
        on every process — its keys feed collective SPMD programs.  The lock
        guards against the async rollout thread (which draws from the rollout
        stream but shares the lock for simplicity)."""
        with self._rng_lock:
            self.rng, key = jax.random.split(self.rng)
        if self._plan is not None:
            if self._nproc > 1:
                # device_put cannot place a host value onto a cross-process
                # sharding; assemble the (identical-everywhere) key shard-wise.
                arr = np.asarray(key)
                return jax.make_array_from_callback(
                    arr.shape, self._plan.replicated(), lambda idx: arr[idx])
            return jax.device_put(key, self._plan.replicated())
        return jax.device_put(key, self._learner_device)

    # ------------------------------------------------------------------ #
    # Rollout (Dreamer.py:177-226)
    # ------------------------------------------------------------------ #

    def _policy_params(self):
        """Per-round actor weight broadcast (the north star's "actor params
        broadcast back each rollout round").

        With runtime.rollout_device="cpu" the policy runs host-local: params
        are copied device->host once per round and every env step is a local
        CPU program instead of an accelerator round-trip (which dominates
        wall-clock when the chip is remote — one fused policy call per step).
        The copy rides ONE flattened buffer: per-leaf device_put pays a
        device round-trip per leaf (74 leaves ~ seconds over a tunnel), while
        concat-on-device + one fetch moves the same 32 MB in ~0.2 s.
        """
        if self._policy_cache is not None and self._policy_cache[0] is self.state:
            return self._policy_cache[1]
        params = (self.state.wm.params, self.state.ac.actor_params)
        if self.cfg.runtime.rollout_device == "cpu":
            cpu = self._cpu_device
            if (self._nproc == 1 and self._plan is None
                    and any(cpu in leaf.devices()
                            for leaf in jax.tree.leaves(params)[:1])):
                # Learner already lives on this CPU device (CPU test platform):
                # device_put would alias the learner buffers, which are later
                # DONATED by train_iteration — force a real copy.
                params = jax.tree.map(jnp.copy, params)
            else:
                if self._broadcast_fns is None:
                    self._broadcast_fns = self._make_broadcast_fns(params)
                flatten, unflatten = self._broadcast_fns
                if flatten is not None:
                    flat = flatten(params)
                    if not flat.is_fully_addressable:
                        # Multi-host: the jit's replicated out_sharding has
                        # already allgathered any model-sharded leaves; every
                        # process holds a full local replica.
                        flat = flat.addressable_data(0)
                    params = unflatten(np.asarray(flat))
                else:  # non-f32 leaves (never in practice): per-leaf fallback
                    params = jax.device_put(params, cpu)
        self._policy_cache = (self.state, params)
        return params

    def _make_broadcast_fns(self, params):
        """Build (device-flatten, host-unflatten) for the policy param tree."""
        leaves, treedef = jax.tree.flatten(params)
        if not all(l.dtype == jnp.float32 for l in leaves):
            return (None, None)
        shapes = [l.shape for l in leaves]
        sizes = [int(np.prod(s)) for s in shapes]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        wire_dtype = jnp.dtype(self.cfg.runtime.broadcast_dtype)

        # Cast per-leaf BEFORE the concat so the flat staging buffer is
        # allocated at the wire dtype (half the peak HBM for bf16), not f32.
        # Under a mesh plan the output is pinned replicated so every process
        # can read a full local copy (allgathers TP-sharded leaves on-device).
        out_sh = self._plan.replicated() if self._plan is not None else None
        flatten = jax.jit(
            lambda p: jnp.concatenate(
                [jnp.ravel(x).astype(wire_dtype) for x in jax.tree.leaves(p)]),
            out_shardings=out_sh)

        def unflatten(host_flat: np.ndarray):
            ls = [jax.device_put(
                      np.ascontiguousarray(
                          host_flat[offsets[i]:offsets[i + 1]]
                          .astype(np.float32, copy=False).reshape(shapes[i])),
                      self._cpu_device)
                  for i in range(len(shapes))]
            return jax.tree.unflatten(treedef, ls)

        return (flatten, unflatten)

    def _rollout_key(self) -> jax.Array:
        # Rollout/eval stream: process-distinct (exploration diversity), never
        # fed into collective programs.
        with self._rng_lock:
            self.rollout_rng, key = jax.random.split(self.rollout_rng)
        if self.cfg.runtime.rollout_device != "cpu":
            # Policy runs where the learner params live; ship the host key
            # there (async, 32 bytes).
            if self._plan is not None:
                return jax.device_put(key, self._plan.replicated())
            return jax.device_put(key, self._learner_device)
        return key

    def _touch_heartbeat(self):
        """Liveness signal for the supervisor's hang watchdog
        (tools/run_supervised.py --watch-file): touched from the MAIN work
        loop only — a device-call hang (e.g. a dropped accelerator tunnel,
        observed round 4: 1h+ silent stall) blocks the main thread, so a
        stale mtime is a reliable hang signal where a thread-based heartbeat
        would keep beating.

        Every process beats its own file — ``heartbeat`` on process 0,
        ``heartbeat.proc{N}`` otherwise — so a per-host supervisor in the
        multi-host setup can watch its own child (a proc-0-only beat would
        make ``--watch-file`` SIGKILL a healthy non-zero-proc trainer every
        hang-timeout; ADVICE r4).  Pass the proc-suffixed path to
        ``run_supervised.py --watch-file`` on non-zero-rank hosts."""
        fname = ("heartbeat" if self._proc == 0
                 else f"heartbeat.proc{self._proc}")
        path = os.path.join(self.cfg.runtime.log_dir, fname)
        try:
            os.makedirs(self.cfg.runtime.log_dir, exist_ok=True)
            with open(path, "a"):
                os.utime(path, None)
        except OSError:
            pass

    def _maybe_update_nu(self, log):
        """Live entropy-dose control (runtime.traced_nu): if
        ``<log_dir>/nu_override`` exists and its mtime changed, parse a float
        from it and apply it from the next iteration — the round-4 flagship
        collapse was countered by exactly this kind of mid-run dose change,
        which then cost a graceful restart + recompile each time.  One stat()
        per iteration; unparseable content is ignored.  Multi-host: each
        process polls its OWN log_dir, so write the file on every host."""
        path = os.path.join(self.cfg.runtime.log_dir, "nu_override")
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            return
        if mtime == self._nu_mtime:
            return
        self._nu_mtime = mtime
        try:
            with open(path) as f:
                val = float(f.read().strip())
        except (OSError, ValueError):
            return
        if val != self._nu:
            log(f"nu_override: entropy coefficient {self._nu:g} -> {val:g}")
            self._nu = val

    def rollout_policy(self, random_policy: bool = False) -> Dict[str, float]:
        """Collect sequence_length transitions per env into the replay buffer."""
        self._touch_heartbeat()
        wm_p, actor_p = self._policy_params()
        chunks, metrics = self._collect_chunk(random_policy, wm_p, actor_p)
        self._write_chunk(chunks)
        return metrics

    def _collect_chunk(self, random_policy, wm_params, actor_params):
        """Step the env farm for one round; returns host-side chunk arrays.
        Does NOT touch the replay buffer (async mode writes after the learner
        step so donated buffers are never read concurrently)."""
        t = self._policy_trainer
        # Host np arrays are passed straight into the jitted policy programs:
        # jit places them next to the (committed) params, so a host-local
        # actor never bounces observations through the accelerator.
        if self._obs is None:
            self._obs = self.farm.reset_all()
            # Episode-start flag for the CURRENT self._obs (stream head):
            # reset_all returns reset frames.
            self._first = np.ones(self._obs.shape[0], bool)
            self._h, self._z = t.policy_reset(
                wm_params, self._obs, self._rollout_key())
            self._action = (np.asarray(self.farm.sample_actions(), np.float32)
                            if random_policy else
                            t.policy_act(actor_params, self._h, self._z,
                                         self._rollout_key()))

        obs_chunk, act_chunk, rew_chunk, cont_chunk, first_chunk = [], [], [], [], []
        for _ in range(self.cfg.train.sequence_length):
            action_np = np.asarray(self._action)
            obs_next, reward, done, first_next = self.farm.step(action_np)

            obs_chunk.append(self._obs)
            act_chunk.append(action_np)
            rew_chunk.append(reward)
            cont_chunk.append(1.0 - done.astype(np.float32))
            first_chunk.append(self._first.astype(np.float32))

            # Fused device step: posterior update (+ episode-reset rows) + next
            # action.  For random policy the sampled action is replaced below
            # but the state update uses the ACTUALLY APPLIED action.
            # Reset rows = rows whose obs_next is a reset frame (``first``):
            # identical to ``done`` under same-step autoreset; one step later
            # under env.next_step_autoreset (the terminal frame is observed
            # normally first — it carries the crash context).
            self._h, self._z, next_action = t.policy_act_observe(
                wm_params, actor_params,
                self._h, self._z, action_np, obs_next,
                first_next, self._rollout_key())
            self._action = (np.asarray(self.farm.sample_actions(), np.float32)
                            if random_policy else next_action)
            self._obs = obs_next
            self._first = first_next

        chunks = (np.stack(obs_chunk, axis=1), np.stack(act_chunk, axis=1),
                  np.stack(rew_chunk, axis=1), np.stack(cont_chunk, axis=1),
                  (np.stack(first_chunk, axis=1)
                   if self.cfg.env.next_step_autoreset else None))
        metrics = {
            "rollout/reward_mean": float(np.mean(rew_chunk)),
            "rollout/done_frac": float(1.0 - np.mean(cont_chunk)),
        }
        return chunks, metrics

    def _write_chunk(self, chunks):
        """One donated device write per rollout round: (E, T, ...) chunk."""
        obs, act, rew, cont, first = chunks
        if self._nproc > 1:
            # Each process contributes its local farm's env rows; the global
            # chunk is assembled shard-wise (no cross-host data movement —
            # local rows land on local devices) and the ring write is one
            # collective donated scatter.
            from jax.sharding import NamedSharding, PartitionSpec as P

            env_sh = NamedSharding(self._plan.mesh, P(self._plan.mesh.axis_names[0]))

            def glob(x, dtype):
                x = np.asarray(x, dtype)
                return jax.make_array_from_process_local_data(
                    env_sh, x, (x.shape[0] * self._nproc,) + x.shape[1:])

            self.buf = self.trainer.buffer.add_batch(
                self.buf, glob(obs, np.uint8), glob(act, np.float32),
                glob(rew, np.float32), glob(cont, np.float32),
                first=(None if first is None else glob(first, np.float32)))
            return
        self.buf = self.trainer.buffer.add_batch(
            self.buf,
            jnp.asarray(obs),
            jnp.asarray(act, jnp.float32),
            jnp.asarray(rew, jnp.float32),
            jnp.asarray(cont, jnp.float32),
            first=(None if first is None else jnp.asarray(first, jnp.float32)),
        )

    # ------------------------------------------------------------------ #
    # Evaluation (Dreamer.py:295-322) and Run (Dreamer.py:374-401)
    # ------------------------------------------------------------------ #

    def evaluate_agent(self, eval_episodes: int, max_steps: int = 2000,
                       batched: bool = True) -> float:
        """Deterministic-policy episodes on the eval env; returns mean total
        reward.  Unlike the reference (which builds and discards an autodiff
        graph every eval step — SURVEY §3.5 note), this uses the jitted
        inference programs; by default all episodes run BATCHED over an eval
        farm, so each step is one policy call for every episode at once."""
        if not batched:
            totals = []
            for _ in range(eval_episodes):
                self._eval_seed += 1
                totals.append(self._run_episode(self.eval_env, self._eval_seed, max_steps))
            return float(np.mean(totals))
        return self._evaluate_batched(eval_episodes, max_steps)

    def _evaluate_batched(self, eval_episodes: int, max_steps: int) -> float:
        t = self._policy_trainer
        wm_p, actor_p = self._policy_params()
        if self._eval_farm is None or self._eval_farm.num_envs != eval_episodes:
            if self._eval_farm is not None:
                self._eval_farm.close()
            self._eval_farm = EnvFarm([self._env_factory] * eval_episodes,
                                      seed=self._eval_seed)
        farm = self._eval_farm
        farm.seed = self._eval_seed
        obs = farm.reset_all()
        self._eval_seed += eval_episodes
        h, z = t.policy_reset(wm_p, obs, self._rollout_key())
        totals = np.zeros(eval_episodes)
        alive = np.ones(eval_episodes, bool)
        # Device rows <-> episodes.  Episodes end at different times; rather
        # than keep stepping dead rows through the policy programs forever,
        # the live rows are COMPACTED into power-of-two buckets as episodes
        # finish (each bucket size compiles once; -1 rows are padding).
        rows_ep = np.arange(eval_episodes)
        for _ in range(max_steps):
            action = t.policy_act(actor_p, h, z, self._rollout_key(),
                                  deterministic=True)
            action_np = np.asarray(action)
            obs_rows = np.empty((len(rows_ep),) + obs.shape[1:], np.uint8)
            for r, ep in enumerate(rows_ep):
                if ep < 0 or not alive[ep]:
                    obs_rows[r] = obs[r]
                    continue
                # DELIBERATE farm bypass: eval episodes must NOT auto-reset
                # on termination (each env runs exactly one episode), so the
                # raw env objects are stepped directly and the farm's
                # auto-reset bookkeeping is left untouched.  Contract: the
                # farm is used here only as an env container + seeder, and
                # the next eval's reset_all() re-synchronizes its state — if
                # EnvFarm ever grows per-step internal state beyond
                # auto-reset, this loop must switch to a farm-level API.
                o, rwd, term, trunc, _ = farm.envs[ep].step(action_np[r])
                totals[ep] += rwd
                if term or trunc:
                    alive[ep] = False
                obs_rows[r] = np.asarray(o, np.uint8)
            if not alive.any():
                break
            obs = obs_rows
            z, h = t.policy_observe(wm_p, z, h, action, obs,
                                    self._rollout_key())
            n_alive = int(alive.sum())
            bucket = 1 << max(0, n_alive - 1).bit_length()
            if bucket < len(rows_ep):
                keep = [r for r, ep in enumerate(rows_ep)
                        if ep >= 0 and alive[ep]]
                sel = np.asarray(keep + [keep[0]] * (bucket - len(keep)))
                h, z = h[sel], z[sel]
                obs = obs[sel]
                rows_ep = np.concatenate(
                    [rows_ep[keep], np.full(bucket - len(keep), -1)])
        return float(np.mean(totals))

    def _run_episode(self, env, seed: int, max_steps: int, render: bool = False,
                     frames: Optional[List] = None) -> float:
        t = self._policy_trainer
        wm_p, actor_p = self._policy_params()
        obs, _ = env.reset(seed=seed)
        obs = np.asarray(obs, np.uint8)[None]
        h, z = t.policy_reset(wm_p, obs, self._rollout_key())
        total = 0.0
        for _ in range(max_steps):
            if render or frames is not None:
                frame = env.render()
                if frames is not None and frame is not None:
                    frames.append(np.asarray(frame))
            action = t.policy_act(actor_p, h, z,
                                  self._rollout_key(), deterministic=True)
            obs_next, reward, term, trunc, _ = env.step(np.asarray(action)[0])
            total += float(reward)
            if term or trunc:
                break
            obs = np.asarray(obs_next, np.uint8)[None]
            z, h = t.policy_observe(wm_p, z, h, action,
                                    obs, self._rollout_key())
        return total

    def run(self, env=None, env_seed: int = 0, render: bool = True,
            max_steps: int = 10_000, frames: Optional[List] = None) -> float:
        """Single rendered episode with the deterministic policy
        (reference Dreamer.Run, Dreamer.py:374-401).  Pass ``frames=[]`` to
        capture the rendered RGB frames (tools/render_demo.py)."""
        env = env or self.eval_env
        return self._run_episode(env, env_seed, max_steps, render=render,
                                 frames=frames)

    # ------------------------------------------------------------------ #
    # Checkpointing — full resume (SURVEY §5)
    # ------------------------------------------------------------------ #

    def _replicated_global(self, x):
        """Wrap a process-consistent host value as a replicated GLOBAL array
        (orbax refuses host-local arrays in multi-host saves)."""
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, self._plan.replicated(),
                                            lambda idx: arr[idx])

    def _checkpoint_tree(self):
        # Scalar leaves must be PROCESS-CONSISTENT under multi-host (orbax
        # writes them once): env_seed stores the base (per-process offsets are
        # re-applied on restore) and rollout_rng stores process 0's stream
        # (other processes re-fold their index in on restore).
        tree = {
            "state": self.state,
            "rng": self.rng,
            "rollout_rng": (self.rollout_rng if self._proc == 0 else
                            jax.device_put(jnp.zeros_like(self.rollout_rng),
                                           self._cpu_device)),
            "iteration": jnp.asarray(self.iteration, jnp.int32),
            "env_seed": jnp.asarray(self.farm.seed - self._env_seed_offset,
                                    jnp.int32),
            "eval_seed": jnp.asarray(self._eval_seed, jnp.int32),
        }
        if self._nproc > 1:
            # rollout_rng is NOT process-consistent by design; checkpoint
            # process 0's stream.  broadcast_one_to_all makes the replicated
            # global leaf well-defined.
            from jax.experimental import multihost_utils

            tree["rollout_rng"] = self._replicated_global(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(tree["rollout_rng"])))
            for k in ("rng", "iteration", "env_seed", "eval_seed"):
                tree[k] = self._replicated_global(tree[k])
        if self.cfg.runtime.checkpoint_replay:
            tree["buffer"] = self.buf
        return tree

    def save_checkpoint(self):
        return self.ckpt.save(self.iteration, self._checkpoint_tree())

    def _maybe_save_best(self, reward: float):
        """Persist a weights-only agent export + marker whenever eval improves
        (outside the pruned ckpt_* set, so the peak policy always survives)."""
        if reward <= self.best_eval:
            return
        self.best_eval = reward
        import json

        base = self.cfg.runtime.checkpoint_dir
        os.makedirs(base, exist_ok=True)
        self.save_agent(os.path.join(base, "agent_best"))
        with open(os.path.join(base, "best.json"), "w") as f:
            json.dump({"iteration": self.iteration, "eval_reward": reward}, f)

    def save_agent(self, path: str):
        """Weights-only export (the reference's save_trained_Dreamer /
        agent.pth, Dreamer.py:292-293): all module params, no optimizer or
        replay state."""
        self.ckpt._ckptr.save(os.path.abspath(path), self._agent_params_tree(),
                              force=True)

    def load_agent(self, path: str):
        """Weights-only import (the reference's load_pretrained_dreamer,
        Dreamer.py:289-290).  Restores as host numpy then re-places onto this
        process's devices — the export may come from a different platform
        (e.g. TPU-trained weights loaded into a CPU-only demo process), where
        the saved shardings cannot be reconstructed."""
        target = self._agent_params_tree()
        tree = self.ckpt.restore_numpy(path, target)
        tree = jax.tree.map(
            lambda ex, v: jnp.asarray(v, dtype=ex.dtype), target, tree)
        self.state = self.state._replace(
            wm=self.state.wm._replace(params=tree["wm"]),
            ac=self.state.ac._replace(
                actor_params=tree["actor"],
                critic_params=tree["critic"],
                target_critic_params=tree["target_critic"],
            ))

    def _agent_params_tree(self):
        return {
            "wm": self.state.wm.params,
            "actor": self.state.ac.actor_params,
            "critic": self.state.ac.critic_params,
            "target_critic": self.state.ac.target_critic_params,
        }

    def _checkpoint_shardings(self):
        """Shardings mirroring _checkpoint_tree under a mesh plan (None on
        single device): resume re-places params/opt on their param_spec
        shardings and the replay ring on its env-sharded layout instead of
        restoring everything unsharded."""
        if self._plan is None:
            return None
        rep = self._plan.replicated()
        tree = {
            "state": self._plan.state_shardings(self.state),
            "rng": rep, "rollout_rng": rep, "iteration": rep,
            "env_seed": rep, "eval_seed": rep,
        }
        if self.cfg.runtime.checkpoint_replay:
            tree["buffer"] = self._plan.buffer_shardings(self.buf)
        return tree

    def restore_latest(self) -> bool:
        """Resume from the newest checkpoint; returns True if one was found.

        Tolerates a replay-ring presence mismatch between the checkpoint and
        the current runtime.checkpoint_replay setting (either direction):
        a run toggled to ring-checkpointing resumes from a ring-less
        checkpoint (fresh ring + optional re-priming), and a ring-bearing
        checkpoint restores its ring even when the setting is now off
        (free diversity — dropping it would recreate the resume crater)."""
        target = self._checkpoint_tree()
        shardings = self._checkpoint_shardings()
        try:
            result = self.ckpt.restore_latest(target, shardings=shardings)
        except ValueError:
            if "buffer" in target:
                target.pop("buffer")
                if shardings is not None:
                    shardings.pop("buffer", None)
            else:
                target["buffer"] = self.buf
                if shardings is not None:
                    shardings["buffer"] = self._plan.buffer_shardings(self.buf)
            result = self.ckpt.restore_latest(target, shardings=shardings)
        if result is None:
            return False
        _, tree = result
        self.state = tree["state"]
        self._ring_restored = "buffer" in tree
        if "buffer" in tree:
            self.buf = tree["buffer"]
        # else: checkpoint_replay=False — keep the fresh buffer; train()'s
        # priming loop refills it before the next gradient step.
        self.rng = jax.device_put(self._host_value(tree["rng"]),
                                  self._cpu_device)
        rollout_rng = jax.device_put(self._host_value(tree["rollout_rng"]),
                                     self._cpu_device)
        if self._proc > 0:
            # The checkpoint stores process 0's rollout stream; re-diversify.
            rollout_rng = jax.random.fold_in(rollout_rng, self._proc)
        self.rollout_rng = rollout_rng
        self.iteration = self._host_int(tree["iteration"])
        self.farm.seed = self._host_int(tree["env_seed"]) + self._env_seed_offset
        self._eval_seed = self._host_int(tree["eval_seed"])
        # Recurrent rollout state is not checkpointed (episode boundary is a
        # safe reset point); force re-init on next rollout.
        self._obs = None
        # Re-read the best-eval marker so a resumed run never overwrites
        # agent_best with a worse policy.
        best_path = os.path.join(self.cfg.runtime.checkpoint_dir, "best.json")
        if os.path.exists(best_path):
            import json

            with open(best_path) as f:
                self.best_eval = float(json.load(f)["eval_reward"])
        return True

    def request_stop(self):
        """Ask the train loop to checkpoint and exit after the current
        iteration (signal-safe: only flips a flag).  Under multi-host, call
        on the primary process — the flag is broadcast so every process takes
        the same (collective) checkpoint-and-exit path."""
        self._stop_requested = True

    def _should_stop(self) -> bool:
        if self._nproc == 1:
            return self._stop_requested
        # Processes must agree (save_checkpoint is collective): process 0 is
        # the stop authority.  One tiny host broadcast per iteration — noise
        # next to the collective learner step.
        from jax.experimental import multihost_utils

        return bool(multihost_utils.broadcast_one_to_all(
            np.asarray(self._stop_requested if self._proc == 0 else False)))

    # ------------------------------------------------------------------ #
    # Multi-host helpers
    # ------------------------------------------------------------------ #

    @staticmethod
    def _host_value(x):
        """Host copy of a (possibly cross-process replicated) array."""
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    @classmethod
    def _host_int(cls, x) -> int:
        return int(cls._host_value(x))

    def _eval_and_sync(self, episodes: int) -> float:
        """Eval on the primary process only; broadcast the mean reward so
        every process takes identical best-checkpoint decisions (the
        subsequent orbax save is collective)."""
        if self._nproc == 1:
            return self.evaluate_agent(episodes)
        from jax.experimental import multihost_utils

        if self._proc == 0:
            reward = self.evaluate_agent(episodes)
        else:
            reward = 0.0
            # Mirror _evaluate_batched's _eval_seed advance so the counter in
            # every process's checkpoint tree stays identical (the orbax save
            # is collective).  Only _eval_seed needs mirroring: non-primary
            # processes never construct an eval farm (evaluate_agent runs on
            # proc 0 only), so there is no farm-internal seed state here to
            # keep in sync — revisit if eval is ever spread across processes.
            assert self._eval_farm is None, (
                "non-primary process unexpectedly built an eval farm; its "
                "internal seed state is not mirrored by _eval_and_sync")
            self._eval_seed += episodes
        return float(multihost_utils.broadcast_one_to_all(
            np.asarray(reward, np.float32)))

    # ------------------------------------------------------------------ #
    # Master loop (Dreamer.py:324-372)
    # ------------------------------------------------------------------ #

    def train(self, resume: bool = False, progress: bool = True):
        cfg = self.cfg.train
        self.stopped = False
        restored = False
        self._touch_heartbeat()
        if resume:
            restored = self.restore_latest()
            # The restore itself can take ~10 min through a slow checkpoint
            # tunnel with no intermediate liveness signal; bracket it with
            # touches so the supervisor watchdog measures the NEXT phase
            # from here, not from process start.
            self._touch_heartbeat()

        log = print if progress else (lambda *a, **k: None)
        log("Starting Training...")
        rounds_done = self._kickstart_rounds_done(restored)
        kickstart_pending = (self.iteration == 0
                             and rounds_done < cfg.random_iterations)
        if restored:
            prime_rounds = cfg.resume_prime_iterations
            if (prime_rounds == 0 and not self._ring_restored
                    and not kickstart_pending):
                # Ring-less resume with no explicit re-prime target: training
                # would otherwise start on a buffer primed only to
                # sequence_length (the line-~900 guard) — the documented
                # low-diversity eval-crater failure (RUNBOOK: 352 -> -38).
                # Default to the kickstart's own diversity budget.
                prime_rounds = cfg.random_iterations
                log(f"WARNING: checkpoint carried no replay ring and "
                    f"train.resume_prime_iterations=0; defaulting re-prime "
                    f"to random_iterations={prime_rounds} rounds.")
            if prime_rounds > 0:
                # Re-prime an empty/thin restored replay ring with random-policy
                # diversity (see TrainConfig.resume_prime_iterations).  The
                # while-loop makes repeated restarts idempotent and a no-op when
                # the ring was checkpointed.
                # buf.size counts per-env ring positions: one rollout round adds
                # sequence_length of them (x num_envs transitions).
                target = min(prime_rounds * cfg.sequence_length,
                             cfg.buffer_size // max(1, self.cfg.env.num_envs))
                if self._host_int(self.buf.size) < target:
                    log(f"Re-priming replay ring to {target} transitions "
                        "with random rollouts...")
                    while self._host_int(self.buf.size) < target:
                        self.rollout_policy(random_policy=True)
                    log("Re-priming done.")
        if kickstart_pending:
            # Run the kickstart rounds not yet completed (all of them on a
            # fresh start; the remainder after a graceful mid-kickstart stop,
            # tracked via the kickstart.json sidecar — a plain iteration-0
            # checkpoint no longer silently marks the whole phase as spent).
            log(f"Starting Random Kickstart "
                f"({rounds_done}/{cfg.random_iterations} rounds done).")
            wm_step = self._sharded_wm_step or self.trainer.wm_step
            for r in range(rounds_done, cfg.random_iterations):
                if self._should_stop():
                    # Honor SIGTERM between kickstart rounds: without this
                    # check a stop request is only seen AFTER the first full
                    # training iteration — which sits behind the fused
                    # train-program compile (~20 min cold on a remote-compile
                    # tunnel; observed round 3).
                    log("Stop requested during kickstart; checkpointing and "
                        "exiting cleanly.")
                    self._write_kickstart_progress(r)
                    self.save_checkpoint()
                    self.ckpt.wait_until_finished()
                    self.metrics.save_npz()
                    self.stopped = True
                    return self.best_eval
                self.rollout_policy(random_policy=True)
                if self._host_int(self.buf.size) >= cfg.sequence_length:
                    self.state, wm_metrics = wm_step(
                        self.state, self.buf, self._learner_key())
            log("Kickstart done.")
            self._write_kickstart_progress(cfg.random_iterations)
            reward = self._eval_and_sync(cfg.eval_episodes)
            self.metrics.log_eval(0, reward)
            self._maybe_save_best(reward)
            log(f"Initial eval reward: {reward:.2f}")
            # Persist the completed kickstart (WM params + rings if
            # checkpointed): a crash/preemption before the first periodic
            # checkpoint would otherwise redo all random_iterations rounds.
            self.save_checkpoint()
            self.metrics.save_npz()

        # Guard against learning from unwritten buffer slots (the reference
        # raises ValueError, Buffer.py:33-34): prime the buffer synchronously
        # if the kickstart phase was skipped/short.
        while self._host_int(self.buf.size) < cfg.sequence_length:
            self.rollout_policy(random_policy=True)

        executor = None
        if self.cfg.runtime.async_rollout:
            from concurrent.futures import ThreadPoolExecutor

            executor = ThreadPoolExecutor(max_workers=1)

        profiling = False
        while self.iteration < cfg.training_iterations:
            self._touch_heartbeat()
            # Optional jax.profiler window over iterations 5..10 (SURVEY §5
            # tracing subsystem; the reference has none).
            if self.cfg.runtime.profile and self.iteration == 5 and not profiling:
                jax.profiler.start_trace(os.path.join(self.cfg.runtime.log_dir, "profile"))
                profiling = True
            if profiling and self.iteration >= 10:
                jax.profiler.stop_trace()
                profiling = False

            train_iteration = self._sharded_iteration or self.trainer.train_iteration
            # Traced entropy dose: with runtime.traced_nu the coefficient
            # rides in as a scalar argument (live-updatable via the
            # nu_override file, warm-cache-stable across dose changes);
            # without it the call signature — and so the compiled program
            # hash — is unchanged from the baked-constant path.
            nu_arg = ()
            t_iter = time.perf_counter()
            phase_s = {}
            if self.cfg.runtime.traced_nu:
                self._maybe_update_nu(log)
                nu_arg = (jnp.asarray(self._nu, jnp.float32),)
                phase_s["ac/nu"] = self._nu   # dose visible in the curves
            if executor is not None:
                # Actor-learner overlap: the host-local (CPU) actor collects
                # the next round while the TPU learner updates on data through
                # the previous round — one-round staleness, per the north star.
                wm_p, actor_p = self._policy_params()
                future = executor.submit(self._collect_chunk, False, wm_p, actor_p)
                self.state, step_metrics = train_iteration(
                    self.state, self.buf, self._learner_key(), *nu_arg)
                chunks, roll_metrics = future.result()
                self._write_chunk(chunks)
            else:
                roll_metrics = self.rollout_policy(random_policy=False)
                phase_s["perf/rollout_s"] = time.perf_counter() - t_iter
                t_learn = time.perf_counter()
                self.state, step_metrics = train_iteration(
                    self.state, self.buf, self._learner_key(), *nu_arg)
            self.iteration += 1
            # ONE host transfer for the whole metrics dict (float() per scalar
            # would cost a device round-trip each — ~26 per iteration).
            if self._nproc > 1:
                # device_get rejects non-fully-addressable (cross-process
                # replicated) arrays; read each local replica instead.
                step_metrics = jax.tree.map(self._host_value, step_metrics)
            else:
                step_metrics = jax.device_get(step_metrics)
            # Per-phase wall-clock throughput counters (SURVEY §5 tracing plan:
            # env-steps/s and grad-updates/s, the BASELINE metrics).  device_get
            # above blocks on the learner, so the timings cover real work; in
            # async mode the phases overlap and only end-to-end rates apply.
            dt = time.perf_counter() - t_iter
            if executor is None:
                phase_s["perf/learner_s"] = time.perf_counter() - t_learn
            # One "update" = one optimizer step: each WM epoch steps the WM
            # optimizer once; each AC epoch steps BOTH the actor and critic
            # optimizers (train/agent.py).  In async mode env_steps_per_s
            # assumes one rollout round per overlapped iteration (exact in
            # steady state — the executor joins the round before the next
            # iteration starts).
            n_updates = self.cfg.train.wm_epochs + 2 * self.cfg.train.ac_epochs
            n_steps = self.cfg.train.sequence_length * self.cfg.env.num_envs
            phase_s["perf/env_steps_per_s"] = n_steps / dt
            phase_s["perf/grad_updates_per_s"] = n_updates / dt
            self.metrics.log_iteration(
                self.iteration, {**roll_metrics, **step_metrics, **phase_s})

            if self._should_stop():
                log(f"Stop requested; checkpointing at iter {self.iteration} "
                    "and exiting cleanly.")
                self.save_checkpoint()
                self.ckpt.wait_until_finished()
                self.metrics.save_npz()
                self.stopped = True
                return self.best_eval
            if self.iteration % cfg.checkpoint_every == 0:
                self.save_checkpoint()
                self.metrics.save_npz()
            if self.iteration % cfg.eval_every == 0:
                reward = self._eval_and_sync(cfg.eval_episodes)
                self.metrics.log_eval(self.iteration, reward)
                self._maybe_save_best(reward)
                # Policy-health on the eval line: entropy at the sigma floor
                # (log min_std * action_dim-ish) with falling eval is the
                # collapse signature (round-1 post-mortem; round-3 fade).
                ent = step_metrics.get("ac/entropy")
                ent_s = f", entropy {float(ent):.2f}" if ent is not None else ""
                log(f"iter {self.iteration}: eval reward {reward:.2f}, "
                    f"wm loss {float(step_metrics['wm/loss']):.3f}{ent_s}")

        log("Training Complete.")
        reward = self._eval_and_sync(cfg.final_eval_episodes)
        self.metrics.log_eval(self.iteration, reward)
        self._maybe_save_best(reward)
        self.save_checkpoint()
        self.ckpt.wait_until_finished()
        self.metrics.save_npz()
        return reward
