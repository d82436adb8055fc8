"""Trainer: wires RSSM + actor-critic + optimizers + replay into jitted
on-device programs.

The reference interleaves host-side loops of small device calls
(Dreamer.py:228-287); here each of the following is ONE compiled XLA program:

- ``wm_step``:  sample + WM_epochs gradient steps (lax.scan over epochs)
- ``ac_step``:  sample + AC_epochs fused warmstart+dream+update steps
- ``train_iteration``: both of the above back to back (used by bench and the
  orchestrator fast path)
- ``policy_*``: the per-env-step act/observe programs for rollout and eval.

All functions are mesh-ready: pure pytree-in/pytree-out with no Python-side
state, so the same code jits under a sharded Mesh (dreamer_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dreamer_tpu.config import DreamerConfig
from dreamer_tpu.replay import ReplayBuffer, ReplayState
from dreamer_tpu.rssm import RSSM
from dreamer_tpu.train.agent import (AgentTrainer, make_actor_optimizer,
                                     make_critic_optimizer)
from dreamer_tpu.train.state import ACTrainState, DreamerState, WMTrainState
from dreamer_tpu.train.world_model import make_wm_optimizer, wm_update


class Trainer:
    def __init__(self, cfg: DreamerConfig, jit: bool = True, donate: bool = False):
        self.cfg = cfg
        dtype = jnp.dtype(cfg.runtime.compute_dtype)
        self.rssm = RSSM(cfg.wm, action_dim=cfg.env.action_dim, dtype=dtype,
                         use_pallas_gru=cfg.runtime.use_pallas_gru,
                         remat=cfg.runtime.remat_decoder,
                         scan_unroll=cfg.runtime.scan_unroll,
                         fused_scan_grads=cfg.runtime.fused_scan_grads,
                         actor_min_std=cfg.agent.min_std)
        if cfg.runtime.use_pallas_imagine:
            assert cfg.runtime.fused_scan_grads, (
                "use_pallas_imagine shares the fused scans' deferred-dW "
                "backward; enable runtime.fused_scan_grads")
            self.rssm.use_pallas_imagine = True
        self.agent = AgentTrainer(cfg, dtype=dtype)
        self.buffer = ReplayBuffer(cfg.train.buffer_size, cfg.train.sequence_length,
                                   cfg.env.action_dim, cfg.wm.obs_size,
                                   num_envs=cfg.env.num_envs,
                                   store_firsts=cfg.env.next_step_autoreset)
        self.wm_opt = make_wm_optimizer(cfg)
        self.actor_opt = make_actor_optimizer(cfg)
        self.critic_opt = make_critic_optimizer(cfg)
        # Set by parallel.MeshPlan.shard_train_iteration: a NamedSharding that
        # pins sampled batches' leading dim to the mesh data axis, plus the
        # shard-local sampling plan (mesh + shard count) used when the replay
        # ring's env axis is itself sharded over data.
        self.batch_constraint = None
        self.sample_mesh = None
        self.sample_axis = None
        self.sample_shards = 1

        maybe_jit = jax.jit if jit else (lambda f, **kw: f)
        # With donate=True training states are updated in place (the caller
        # must always replace its state with the returned one, as the
        # orchestrator does); tests keep donate=False so they can compare
        # old-vs-new states.
        dn = {"donate_argnums": (0,)} if (jit and donate) else {}
        self.wm_step = maybe_jit(self._wm_step, **dn)
        self.ac_step = maybe_jit(self._ac_step, **dn)
        self.train_iteration = maybe_jit(self._train_iteration, **dn)
        self.policy_act = maybe_jit(self._policy_act, static_argnames=("deterministic",))
        self.policy_observe = maybe_jit(self._policy_observe)
        self.policy_reset = maybe_jit(self._policy_reset)
        self.policy_act_observe = maybe_jit(self._policy_act_observe,
                                            static_argnames=("deterministic",))

    # ------------------------------------------------------------------ #
    # Init
    # ------------------------------------------------------------------ #

    def init_state(self, key: jax.Array) -> DreamerState:
        k_wm, k_ac = jax.random.split(key)
        wm_params = self.rssm.init_params(k_wm)
        actor_params, critic_params = self.agent.init_params(
            k_ac, self.cfg.wm.hidden_dim, self.cfg.wm.latent_dim)
        # Target critic starts as an exact copy (Agent.py:50).
        target = jax.tree.map(jnp.copy, critic_params)
        return DreamerState(
            wm=WMTrainState(params=wm_params,
                            opt_state=self.wm_opt.init(wm_params)),
            ac=ACTrainState(
                actor_params=actor_params,
                critic_params=critic_params,
                target_critic_params=target,
                actor_opt=self.actor_opt.init(actor_params),
                critic_opt=self.critic_opt.init(critic_params),
                s_scale=jnp.asarray(1.0, jnp.float32),
            ),
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ #
    # Jitted training programs
    # ------------------------------------------------------------------ #

    def _constrain(self, batch):
        """Pin a sampled batch onto the mesh data axis when mesh-bound."""
        if self.batch_constraint is None:
            return batch
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, self.batch_constraint), batch)

    def _sample_batch(self, buf: ReplayState, key: jax.Array, t_out: int,
                      with_scalars: bool = True):
        """Sample a training batch, shard-locally when the ring's env axis is
        sharded over the mesh data axis (no cross-device ring gathers)."""
        B = self.cfg.train.batch_size
        if self.sample_mesh is not None and self.sample_shards > 1:
            return self.buffer.sample_shard_local(
                self.sample_mesh, self.sample_axis, buf, key, B,
                t_out=t_out, with_scalars=with_scalars)
        batch = self.buffer._sample_impl(buf, key, B, t_out=t_out,
                                         with_scalars=with_scalars,
                                         n_shards=self.sample_shards)
        return self._constrain(batch)

    def _wm_step(self, state: DreamerState, buf: ReplayState, key: jax.Array
                 ) -> Tuple[DreamerState, Dict[str, jnp.ndarray]]:
        """WM_epochs gradient steps, each on a fresh sample (Dreamer.py:228-242)."""
        def epoch(wm_state, k):
            k_s, k_u = jax.random.split(k)
            # Gather only the horizon window — same starts/RNG, 40% fewer
            # obs bytes (the loss uses steps [:horizon], WorldModel.py:156-160).
            batch = self._sample_batch(buf, k_s, t_out=self.cfg.train.horizon)
            new_state, metrics = wm_update(self.rssm, self.wm_opt, wm_state, batch, k_u, self.cfg)
            return new_state, metrics

        keys = jax.random.split(key, self.cfg.train.wm_epochs)
        wm_state, metrics = jax.lax.scan(epoch, state.wm, keys)
        per_epoch_loss = metrics["wm/loss"]               # (wm_epochs,)
        metrics = jax.tree.map(lambda x: x[-1], metrics)  # scalars: last epoch
        # The reference appends EVERY WM epoch's loss to its log list
        # (Dreamer.py:240); keep the per-epoch vector so the npz matches.
        metrics["wm/loss_epochs"] = per_epoch_loss
        return state._replace(wm=wm_state), metrics

    def _ac_step(self, state: DreamerState, buf: ReplayState, key: jax.Array,
                 nu: jnp.ndarray | None = None
                 ) -> Tuple[DreamerState, Dict[str, jnp.ndarray]]:
        """AC_epochs fused dream+update steps (Dreamer.py:264-287).

        ``nu``: optional traced entropy coefficient (see AgentTrainer.ac_loss);
        ``None`` bakes cfg.agent.nu into the compiled program."""
        def epoch(ac_state, k):
            k_s, k_u = jax.random.split(k)
            # The AC update consumes only the warm-start window (obs/actions
            # [:T//2], Dreamer.py:254) and never reads rewards/conts (the
            # dream generates its own) — gather just that.  Under
            # wm.reset_on_episode_start / env.next_step_autoreset the warm
            # start DOES need the boundary-reset flags (cont bits or the
            # firsts channel), so the scalar gathers come back.
            batch = self._sample_batch(
                buf, k_s, t_out=self.cfg.train.sequence_length // 2,
                with_scalars=(self.cfg.wm.reset_on_episode_start
                              or self.cfg.env.next_step_autoreset))
            new_state, metrics = self.agent.ac_update(
                self.actor_opt, self.critic_opt, ac_state, state.wm.params,
                self.rssm, batch, k_u, nu=nu)
            return new_state, metrics

        keys = jax.random.split(key, self.cfg.train.ac_epochs)
        ac_state, metrics = jax.lax.scan(epoch, state.ac, keys)
        metrics = jax.tree.map(lambda x: jnp.mean(x), metrics)  # reference averages (Dreamer.py:285-287)
        return state._replace(ac=ac_state), metrics

    def _train_iteration(self, state: DreamerState, buf: ReplayState, key: jax.Array,
                         nu: jnp.ndarray | None = None
                         ) -> Tuple[DreamerState, Dict[str, jnp.ndarray]]:
        """One full learner iteration: WM epochs then AC epochs (Dreamer.py:338-341)."""
        k_wm, k_ac = jax.random.split(key)
        state, wm_metrics = self._wm_step(state, buf, k_wm)
        state, ac_metrics = self._ac_step(state, buf, k_ac, nu)
        state = state._replace(step=state.step + 1)
        return state, {**wm_metrics, **ac_metrics}

    # ------------------------------------------------------------------ #
    # Policy programs (rollout / eval) — batched over N envs
    # ------------------------------------------------------------------ #

    def _policy_reset(self, wm_params, obs_u8: jnp.ndarray, key: jax.Array):
        """Episode-start state: h = 0, z = encode(h=0, obs) (Dreamer.py:189-191).

        obs_u8: (N, H, W, 3) uint8. Returns (h, z)."""
        obs = obs_u8.astype(jnp.float32) / 255.0 - 0.5
        h = jnp.zeros((obs.shape[0], self.cfg.wm.hidden_dim), jnp.float32)
        z = self.rssm.encode_initial(wm_params, obs, key, h)
        return h, z

    def _policy_act(self, actor_params, h, z, key, deterministic: bool = False):
        """Sample (or take tanh(mu)) action from the current state (Agent.py:202-210)."""
        mu, sigma = self.agent.actor.apply({"params": actor_params}, h, z)
        if deterministic:
            return jnp.tanh(mu)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        return jnp.tanh(mu + sigma * eps)

    def _policy_observe(self, wm_params, z, h, action, obs_u8, key):
        """Posterior step after an env transition (WorldModel.py:79-82)."""
        obs = obs_u8.astype(jnp.float32) / 255.0 - 0.5
        z2, h2, _ = self.rssm.observe_step(wm_params, z, h, action, obs, key)
        return z2, h2

    def _policy_act_observe(self, wm_params, actor_params, h, z, action_prev,
                            obs_u8, done, key, deterministic: bool = False):
        """Fused per-env-step program for vectorized rollout: one device call
        per env step instead of the reference's two (Dreamer.py:194-226).

        Given the PREVIOUS action and the NEW observation (plus a reset-row
        mask), computes the posterior update — with episode-reset rows
        re-encoded from h=0 (Dreamer.py:214-223) — then samples the next
        action.

        done: (N,) bool — rows whose obs_u8 is a RESET frame (the farm's
        ``first`` flags: == done under same-step autoreset; one step after
        done under env.next_step_autoreset, where the terminal frame is
        first observed normally).  Returns (h', z', action').
        """
        k_obs, k_reset, k_act = jax.random.split(key, 3)
        obs = obs_u8.astype(jnp.float32) / 255.0 - 0.5
        # One conv-encoder pass serves both branches (normal observe vs
        # episode-reset re-encode) — only the cheap posterior MLP runs twice.
        feat = self.rssm.encode_obs(wm_params, obs)
        h_step = self.rssm.gru_step(wm_params, z, action_prev, h)
        z_step = self.rssm._sample(
            self.rssm.posterior_logits(wm_params, feat, h_step), k_obs)
        h0 = jnp.zeros_like(h)
        z_reset = self.rssm._sample(
            self.rssm.posterior_logits(wm_params, feat, h0), k_reset)
        d = done[:, None].astype(jnp.float32)
        h_next = (1.0 - d) * h_step + d * h0
        z_next = (1.0 - d) * z_step + d * z_reset
        action = self._policy_act(actor_params, h_next, z_next, k_act, deterministic)
        return h_next, z_next, action
