"""Actor-critic update: warm start + H-step imagination + REINFORCE/critic
losses fused into ONE jitted on-device program (the BASELINE north star).

Replicates Agent.train_step / Dreamer.train_Agent semantics exactly
(Agent.py:96-172, Dreamer.py:244-287 / SURVEY §3.4):

- warm start: encode obs[0] at h=0, then sequence_length//2 - 1 teacher-forced
  observe steps (Dreamer.py:244-262).
- dream H steps with reparameterised tanh-Normal actions; the rollout is
  differentiated w.r.t. actor params THROUGH the frozen world-model dynamics
  (the reference runs the dream outside no_grad; WM params simply never
  receive an optimizer step — here the WM params are a non-differentiated
  argument, which is the same gradient).
- lambda-returns from the TARGET critic over all H+1 states (Agent.py:156-172).
- advantage = sg(R_lambda - critic.value[:, :-1]) (Agent.py:105-108).
- log pi of the sg'd, clamped action; single-sample entropy = -log pi
  (Agent.py:110-117).
- return scale S: EMA(0.99) of P95-P05 range (floored at 1), updated BEFORE
  normalisation; normaliser = sg(max(S, 1)) (Agent.py:78-88,119-121).
- actor loss = mean(-logpi * adv/norm - nu * entropy); critic loss =
  twohot(symlog(sg(R))) cross-entropy on logits[:, :-1] (Agent.py:123-135).
- critic consumes sg(h), sg(z) (Agent.py:105,127) — no critic gradient into
  the dream; separate AdamW optimizers + separate clip-100 (Agent.py:63-76,147).
- NaN/Inf in either loss skips BOTH optimizer steps and the target soft
  update, but S was already updated (Agent.py:119,137-153 ordering).
- target critic soft update tau=0.02 after a successful step (Agent.py:90-94).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dreamer_tpu.config import DreamerConfig
from dreamer_tpu.core.dists import normal_entropy, tanh_normal_logprob
from dreamer_tpu.core.math import bucket_values, symlog, twohot, twohot_expectation
from dreamer_tpu.core.returns import lambda_returns, update_return_scale
from dreamer_tpu.nets import Actor, Critic
from dreamer_tpu.rssm import RSSM
from dreamer_tpu.train.state import ACTrainState

sg = jax.lax.stop_gradient


def make_actor_optimizer(cfg: DreamerConfig) -> optax.GradientTransformation:
    a = cfg.agent
    return optax.chain(
        optax.clip_by_global_norm(a.grad_clip),
        optax.adamw(a.actor_lr, b1=a.actor_betas[0], b2=a.actor_betas[1],
                    eps=a.actor_eps, weight_decay=a.weight_decay),
    )


def make_critic_optimizer(cfg: DreamerConfig) -> optax.GradientTransformation:
    a = cfg.agent
    return optax.chain(
        optax.clip_by_global_norm(a.grad_clip),
        optax.adamw(a.critic_lr, b1=a.critic_betas[0], b2=a.critic_betas[1],
                    eps=a.critic_eps, weight_decay=a.weight_decay),
    )


class AgentTrainer:
    """Holds the actor/critic module instances + bucket constants."""

    def __init__(self, cfg: DreamerConfig, dtype=jnp.float32):
        a = cfg.agent
        self.cfg = cfg
        self.actor = Actor(action_dim=cfg.env.action_dim, hidden_1=a.actor_hidden_1,
                           hidden_2=a.actor_hidden_2, min_std=a.min_std,
                           dtype=dtype)
        self.critic = Critic(num_buckets=a.critic_buckets, hidden_1=a.critic_hidden_1,
                             hidden_2=a.critic_hidden_2, dtype=dtype)
        self.buckets = bucket_values(a.critic_buckets)

    def init_params(self, key: jax.Array, hidden_dim: int, latent_dim: int):
        k1, k2 = jax.random.split(key)
        h = jnp.zeros((1, hidden_dim), jnp.float32)
        z = jnp.zeros((1, latent_dim), jnp.float32)
        actor_params = self.actor.init(k1, h, z)["params"]
        critic_params = self.critic.init(k2, h, z)["params"]
        return actor_params, critic_params

    def actor_fn(self, params):
        fn = lambda h, z: self.actor.apply({"params": params}, h, z)
        # Expose the raw param tree so RSSM.imagine can route through the
        # deferred-weight-gradient fused scan (rssm._imagine_fused).
        fn.actor_params = params
        return fn

    def critic_value(self, params, h, z):
        """symexp(E[twohot]) value (Agent.py:237-241), (..., 1) squeezed."""
        logits = self.critic.apply({"params": params}, h, z)
        return twohot_expectation(logits, self.buckets).squeeze(-1)

    def critic_logits(self, params, h, z):
        return self.critic.apply({"params": params}, h, z)

    # ------------------------------------------------------------------ #

    def ac_loss(self, ac_params: Dict[str, Any], wm_params: Any, rssm: RSSM,
                obs_u8: jnp.ndarray, actions: jnp.ndarray,
                target_critic_params: Any, s_scale: jnp.ndarray, key: jax.Array,
                conts: jnp.ndarray | None = None,
                nu: jnp.ndarray | None = None,
                firsts: jnp.ndarray | None = None):
        """Combined actor+critic loss on one replay batch.

        ``ac_params`` = {"actor": ..., "critic": ...} (the differentiated
        pytree); wm_params/target params are frozen inputs.  ``conts`` is
        consumed only under wm.reset_on_episode_start (boundary flags for the
        teacher-forced warm start; see rssm.observe_sequence).  ``nu``, when
        given, is a TRACED entropy coefficient (runtime.traced_nu): dose
        changes — the round-4 anti-collapse intervention — then swap a scalar
        instead of recompiling the fused program (~20 min on a remote-compile
        tunnel); ``None`` bakes cfg.agent.nu as a constant (strict parity).
        """
        cfg = self.cfg
        Tw = cfg.train.sequence_length // 2   # warmup_length (Dreamer.py:254)
        H = cfg.train.horizon
        k_warm, k_dream = jax.random.split(key)

        # Slice to the warmup window BEFORE normalizing (only Tw of T steps
        # are consumed) and normalize straight into the compute dtype — the
        # encoder is the only consumer (see the same pattern in wm_loss).
        obs = obs_u8[:, :Tw].astype(rssm.dtype) / 255.0 - 0.5
        is_first = None
        if firsts is not None:
            # env.next_step_autoreset: explicit episode-start channel (the
            # cont-derived shift below would reset one step early there —
            # at the stored terminal frame instead of the reset frame).
            is_first = firsts[:, :Tw].at[:, 0].set(0.0)
        elif cfg.wm.reset_on_episode_start and conts is not None:
            c = conts[:, :Tw]
            is_first = jnp.concatenate(
                [jnp.zeros_like(c[:, :1]), 1.0 - c[:, :-1]], axis=1)
        z0, h0 = rssm.warm_start(wm_params, obs, actions[:, :Tw], k_warm,
                                 is_first=is_first)
        # The dream differentiates w.r.t. the actor only; the warm start is
        # actor-independent, stop its (unused) graph explicitly for clarity.
        z0, h0 = sg(z0), sg(h0)

        traj = rssm.imagine(wm_params, self.actor_fn(ac_params["actor"]),
                            z0, h0, H, k_dream)

        # lambda-returns from the target critic (no grad path: R is sg'd at
        # every consumer, matching the reference's .detach() usage).
        values_t = self.critic_value(target_critic_params, traj.h, traj.z)  # (B, H+1)
        R = sg(lambda_returns(values_t, traj.reward, traj.cont,
                              cfg.agent.gamma, cfg.agent.lambda_))          # (B, H)

        # --- actor ---------------------------------------------------- #
        v = self.critic_value(ac_params["critic"], sg(traj.h), sg(traj.z))  # (B, H+1)
        advantage = sg(R - v[:, :-1])
        logp = tanh_normal_logprob(sg(traj.action), traj.mu, traj.sigma)    # (B, H)
        if cfg.agent.analytic_entropy:
            # Analytic base-Normal entropy (DreamerV3 form): a direct pull on
            # sigma, immune to the sample estimate's tanh-saturation bias.
            entropy = normal_entropy(traj.sigma)
        else:
            entropy = -logp                  # reference parity (Agent.py:124)

        s_new = update_return_scale(s_scale, R, cfg.agent.s_ema)
        norm = sg(jnp.maximum(s_new, 1.0))
        nu_val = cfg.agent.nu if nu is None else nu
        loss_actor = jnp.mean(-logp * (advantage / norm) - nu_val * entropy)

        # --- critic --------------------------------------------------- #
        logits = self.critic_logits(ac_params["critic"], sg(traj.h), sg(traj.z))[:, :-1]
        target_th = twohot(symlog(R), self.buckets)                         # (B, H, K)
        logp_v = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        loss_critic = jnp.mean(-jnp.sum(target_th * logp_v, axis=-1))

        total = loss_actor + loss_critic
        aux = {
            "ac/loss_actor": loss_actor,
            "ac/loss_critic": loss_critic,
            "ac/entropy": jnp.mean(entropy),
            "ac/return_mean": jnp.mean(R),
            "ac/return_scale": s_new,
            "ac/value_mean": jnp.mean(v),
            "ac/adv_std": jnp.std(advantage),
            "ac/imag_reward_mean": jnp.mean(traj.reward),
            "ac/imag_cont_mean": jnp.mean(traj.cont),
            "_s_new": s_new,
        }
        return total, aux

    def ac_update(self, actor_opt: optax.GradientTransformation,
                  critic_opt: optax.GradientTransformation,
                  state: ACTrainState, wm_params: Any, rssm: RSSM,
                  batch, key: jax.Array, nu: jnp.ndarray | None = None
                  ) -> Tuple[ACTrainState, Dict[str, jnp.ndarray]]:
        obs, actions = batch[0], batch[1]   # rewards unused (dreamed)
        # conts feed the warm start's boundary resets when the batch carries
        # them and wm.reset_on_episode_start is set; the firsts channel
        # (position 5, env.next_step_autoreset rings) takes precedence.
        conts = batch[3] if len(batch) > 3 else None
        firsts = batch[4] if len(batch) > 4 else None
        ac_params = {"actor": state.actor_params, "critic": state.critic_params}

        def loss_fn(p):
            return self.ac_loss(p, wm_params, rssm, obs, actions,
                                state.target_critic_params, state.s_scale, key,
                                conts=conts, nu=nu, firsts=firsts)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(ac_params)
        s_new = aux.pop("_s_new")
        finite = jnp.isfinite(aux["ac/loss_actor"]) & jnp.isfinite(aux["ac/loss_critic"])

        a_updates, a_opt = actor_opt.update(grads["actor"], state.actor_opt,
                                            state.actor_params)
        c_updates, c_opt = critic_opt.update(grads["critic"], state.critic_opt,
                                             state.critic_params)
        new_actor = optax.apply_updates(state.actor_params, a_updates)
        new_critic = optax.apply_updates(state.critic_params, c_updates)
        tau = self.cfg.agent.target_tau
        new_target = jax.tree.map(lambda t, c: (1.0 - tau) * t + tau * c,
                                  state.target_critic_params, new_critic)

        sel = lambda new, old: jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)
        aux["ac/grad_norm_actor"] = optax.global_norm(grads["actor"])
        aux["ac/grad_norm_critic"] = optax.global_norm(grads["critic"])
        aux["ac/update_skipped"] = (~finite).astype(jnp.float32)
        new_state = ACTrainState(
            actor_params=sel(new_actor, state.actor_params),
            critic_params=sel(new_critic, state.critic_params),
            target_critic_params=sel(new_target, state.target_critic_params),
            actor_opt=sel(a_opt, state.actor_opt),
            critic_opt=sel(c_opt, state.critic_opt),
            s_scale=s_new,  # updated even when the step is skipped (Agent.py:119)
        )
        return new_state, aux
