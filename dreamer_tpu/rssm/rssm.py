"""RSSM recurrence as jitted ``lax.scan``s — the TPU replacement for the
reference's per-step Python loops (WorldModel.py:97-107, Dreamer.py:158-164,
Dreamer.py:255-261).

Design notes (TPU-first):
- The conv encoder tower is hoisted OUT of the time scan: it has no recurrent
  dependence, so all (B*T) frames go through the MXU in one batched call.
  Only the cheap GRU + posterior MLP + categorical sample live in the scan.
- Reward/continue/decoder heads are likewise applied to full (B, T) sequences
  after the scan (identical math to the reference's per-step calls — they are
  pure functions of (h, z)).
- PRNG keys are threaded explicitly: one key per scan step via
  ``jax.random.split`` (the reference uses torch global RNG).

State convention: ``h`` is the GRU deterministic state (B, hidden_dim);
``z`` is the flattened straight-through one-hot latent (B, rows*classes).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dreamer_tpu.config import WorldModelConfig
from dreamer_tpu.core.dists import sample_onehot_ste, unimix_probs
from dreamer_tpu.core.math import bucket_values, twohot_expectation
from dreamer_tpu.nets.wm_nets import WMNets


class ObservedSequence(NamedTuple):
    """Posterior unroll outputs, time-major content transposed to (B, T, ...)."""

    h: jnp.ndarray            # (B, T, hidden)
    z: jnp.ndarray            # (B, T, rows*classes) STE one-hot samples
    post_logits: jnp.ndarray  # (B, T, rows, classes)


class ImaginedTrajectory(NamedTuple):
    """Imagination rollout: H+1 states, H actions/rewards/continues.

    Matches dream_episodes' output convention (Dreamer.py:143-175):
    ``reward[t]`` / ``cont[t]`` are the predictions at state t+1.
    """

    h: jnp.ndarray        # (B, H+1, hidden)
    z: jnp.ndarray        # (B, H+1, rows*classes)
    action: jnp.ndarray   # (B, H, action_dim)
    reward: jnp.ndarray   # (B, H)   symexp'd reward prediction
    cont: jnp.ndarray     # (B, H)   continue probability
    mu: jnp.ndarray       # (B, H, action_dim)
    sigma: jnp.ndarray    # (B, H, action_dim)


class RSSM:
    """Functional wrapper around WMNets: owns the module instance, exposes
    pure functions over an explicit params pytree."""

    def __init__(self, cfg: WorldModelConfig, action_dim: int = 3,
                 dtype: Any = jnp.float32, use_pallas_gru: bool = False,
                 remat: bool = False, scan_unroll: int = 1,
                 fused_scan_grads: bool = False, actor_min_std: float = 1e-3):
        self.cfg = cfg
        self.action_dim = action_dim
        self.scan_unroll = scan_unroll
        # Sigma floor of the actor evaluated inside imagine (must match
        # Actor.min_std so the fused scan reproduces the flax module exactly).
        self.actor_min_std = actor_min_std
        # Whole-rollout Pallas imagination forward (ops/imagine_pallas):
        # requires fused_scan_grads (shares its backward) and a TPU backend.
        self.use_pallas_imagine = False
        self.dtype = dtype
        # Deferred-weight-gradient custom-VJP scans (ops/fused_scans.py):
        # same math + same RNG stream, but the backward pass computes every
        # weight gradient as one (T*B)-batched MXU contraction instead of
        # per-step accumulators in the scan carry.  Mutually exclusive with
        # the Pallas GRU cell (the fused path has its own raw-jnp GRU).
        self.fused_scan_grads = fused_scan_grads and not use_pallas_gru
        self.nets = WMNets(cfg, dtype=dtype, use_pallas_gru=use_pallas_gru)
        self.buckets = bucket_values(cfg.reward_buckets)
        if remat:
            # The learner is HBM-bandwidth-bound (~70% of bw at 12x compute
            # headroom, see bench roofline): recompute the conv tower
            # activations in the backward pass instead of storing them.
            self.decode = jax.checkpoint(self.decode)
            self.encode_obs = jax.checkpoint(self.encode_obs)

    # ------------------------------------------------------------------ #
    # Init
    # ------------------------------------------------------------------ #

    def init_params(self, key: jax.Array) -> Any:
        c = self.cfg
        obs = jnp.zeros((1, c.obs_size[0], c.obs_size[1], 3), jnp.float32)
        action = jnp.zeros((1, self.action_dim), jnp.float32)
        h = jnp.zeros((1, c.hidden_dim), jnp.float32)
        z = jnp.zeros((1, c.latent_dim), jnp.float32)
        return self.nets.init(key, obs, action, h, z)["params"]

    def initial_state(self, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        return (jnp.zeros((batch, c.hidden_dim), jnp.float32),
                jnp.zeros((batch, c.latent_dim), jnp.float32))

    # Low-level applies ------------------------------------------------- #

    def _apply(self, params, method, *args):
        return self.nets.apply({"params": params}, *args, method=method)

    def encode_obs(self, params, obs_norm):
        return self._apply(params, WMNets.encode_obs, obs_norm)

    def posterior_logits(self, params, feat, h):
        return self._apply(params, WMNets.posterior_logits, feat, h)

    def gru_step(self, params, z_flat, action, h):
        # RSSM state convention: (h, z) are float32 at module boundaries —
        # compute happens in the nets' dtype (bf16 on TPU), but the carried
        # recurrent state keeps full precision (and a stable scan carry type).
        return self._apply(params, WMNets.gru_step, z_flat, action, h).astype(jnp.float32)

    def prior_logits(self, params, h):
        return self._apply(params, WMNets.prior_logits, h)

    def reward_logits(self, params, h, z_flat):
        return self._apply(params, WMNets.reward_logits, h, z_flat)

    def cont_logit(self, params, h, z_flat):
        return self._apply(params, WMNets.cont_logit, h, z_flat)

    def decode(self, params, h, z_flat):
        return self._apply(params, WMNets.decode, h, z_flat)

    def reward_pred(self, params, h, z_flat):
        """symexp(E[twohot]) reward prediction (DynamicsPredictors.py:70-74)."""
        logits = self.reward_logits(params, h, z_flat)
        return twohot_expectation(logits, self.buckets).squeeze(-1)

    def cont_pred(self, params, h, z_flat):
        """Continue probability (not thresholded — DynamicsPredictors.py:102-105)."""
        return jax.nn.sigmoid(self.cont_logit(params, h, z_flat).astype(jnp.float32)).squeeze(-1)

    def _sample(self, logits: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """Unimix + STE one-hot sample, flattened to (..., rows*classes)."""
        z = sample_onehot_ste(unimix_probs(logits, self.cfg.unimix), key)
        return z.reshape(z.shape[:-2] + (self.cfg.latent_dim,))

    def encode_initial(self, params, obs_norm: jnp.ndarray, key: jax.Array,
                       h: jnp.ndarray | None = None) -> jnp.ndarray:
        """Posterior sample from an observation with (default zero) hidden —
        the episode-start encode (Dreamer.py:189-191: h=0, z = encode(h, obs))."""
        if h is None:
            h = jnp.zeros(obs_norm.shape[:-3] + (self.cfg.hidden_dim,), jnp.float32)
        feat = self.encode_obs(params, obs_norm)
        logits = self.posterior_logits(params, feat, h)
        return self._sample(logits, key)

    # ------------------------------------------------------------------ #
    # Single-step (rollout / eval path)
    # ------------------------------------------------------------------ #

    def observe_step(self, params, z_flat, h, action, obs_norm, key):
        """One posterior step: h' = GRU([z‖a], h); z' ~ q(.|h', obs').

        Reference: WorldModel.observe_step (WorldModel.py:79-82).
        Returns (z', h', posterior_logits).
        """
        h_next = self.gru_step(params, z_flat, action, h)
        feat = self.encode_obs(params, obs_norm)
        logits = self.posterior_logits(params, feat, h_next)
        z_next = self._sample(logits, key)
        return z_next, h_next, logits

    def imagine_step(self, params, h, z_flat, action, key):
        """One prior step (WorldModel.imagine_step, WorldModel.py:72-77).

        Returns (h', z', reward, cont_prob)."""
        h_next = self.gru_step(params, z_flat, action, h)
        z_next = self._sample(self.prior_logits(params, h_next), key)
        reward = self.reward_pred(params, h_next, z_next)
        cont = self.cont_pred(params, h_next, z_next)
        return h_next, z_next, reward, cont

    # ------------------------------------------------------------------ #
    # Sequence scans
    # ------------------------------------------------------------------ #

    def observe_sequence(self, params, obs_norm: jnp.ndarray, actions: jnp.ndarray,
                         key: jax.Array,
                         is_first: jnp.ndarray | None = None) -> ObservedSequence:
        """Open-loop posterior unroll over T steps from zero state.

        Mirrors unroll_model's t-loop (WorldModel.py:91-107): step t consumes
        action[t-1] (zeros at t=0) and obs[t]; the GRU runs at EVERY step
        including t=0 (from zero h, z, a).

        obs_norm: (B, T, H, W, 3) normalised to [-0.5, 0.5]; actions: (B, T, A).

        ``is_first`` (B, T) in {0, 1}: optional episode-boundary flags for
        replay windows that straddle env auto-resets.  Where is_first[t]=1 the
        recurrent carry (h, z) AND the incoming action are zeroed before the
        step — exactly the episode-start condition the t=0 step already uses —
        so the model never learns transitions across a reset.  The reference
        has no equivalent (WorldModel.py:170-173 only per-step-masks the loss,
        which leaves every post-reset step training on state carried across
        the boundary); with CarRacing's fixed 1000-step episodes that flaw is
        nearly invisible, but on early-terminating envs (LunarLander,
        BipedalWalker) most windows straddle a boundary and the world model
        is systematically poisoned — the round-1..3 LunarLander curve
        (-136 -> -411) was this.  Enabled via wm.reset_on_episode_start.
        """
        B, T = obs_norm.shape[0], obs_norm.shape[1]
        feats = self.encode_obs(params, obs_norm)                      # (B, T, F)
        a_in = jnp.concatenate(
            [jnp.zeros_like(actions[:, :1]), actions[:, :-1]], axis=1)  # a_{t-1}
        h0, z0 = self.initial_state(B)
        keys = jax.random.split(key, T)

        if is_first is not None and self.fused_scan_grads:
            # Deferred-dW path with the reset mask threaded through
            # (observe_scan_reset — a separate entry point so
            # non-terminating configs keep the unchanged observe_scan trace
            # and its compile-cache entries).
            from dreamer_tpu.ops.fused_scans import (_ObserveCfg,
                                                     observe_scan_reset)

            c = self.cfg
            gum = jax.vmap(lambda k: jax.random.gumbel(
                k, (B, c.latent_rows, c.latent_classes), jnp.float32))(keys)
            ocfg = _ObserveCfg(unimix=c.unimix, latent_dim=c.latent_dim,
                               rows=c.latent_rows, classes=c.latent_classes,
                               dtype=self.dtype, unroll=self.scan_unroll)
            sub = {"gru": params["gru"], "post": params["posterior_head"]}
            h_seq, z_seq, logit_seq = observe_scan_reset(
                ocfg, sub, h0, z0, feats.swapaxes(0, 1),
                a_in.swapaxes(0, 1), gum,
                is_first.astype(jnp.float32).swapaxes(0, 1))
            return ObservedSequence(h=h_seq.swapaxes(0, 1),
                                    z=z_seq.swapaxes(0, 1),
                                    post_logits=logit_seq.swapaxes(0, 1))

        if is_first is not None:
            # Boundary resets on the plain autodiff scan (fused_scan_grads
            # off / Pallas-GRU configs).
            def step_reset(carry, xs):
                h, z = carry
                feat_t, a_t, k_t, f_t = xs
                m = (1.0 - f_t)[:, None]
                h = h * m
                z = z * m
                a_t = a_t * m.astype(a_t.dtype)
                h_next = self.gru_step(params, z, a_t, h)
                logits = self.posterior_logits(params, feat_t, h_next)
                z_next = self._sample(logits, k_t)
                return (h_next, z_next), (h_next, z_next, logits)

            xs = (feats.swapaxes(0, 1), a_in.swapaxes(0, 1), keys,
                  is_first.astype(jnp.float32).swapaxes(0, 1))
            _, (h_seq, z_seq, logit_seq) = jax.lax.scan(
                step_reset, (h0, z0), xs, unroll=self.scan_unroll)
            return ObservedSequence(h=h_seq.swapaxes(0, 1),
                                    z=z_seq.swapaxes(0, 1),
                                    post_logits=logit_seq.swapaxes(0, 1))

        if self.fused_scan_grads:
            from dreamer_tpu.ops.fused_scans import _ObserveCfg, observe_scan

            c = self.cfg
            # Identical draws to jax.random.categorical(keys[t], log probs).
            gum = jax.vmap(lambda k: jax.random.gumbel(
                k, (B, c.latent_rows, c.latent_classes), jnp.float32))(keys)
            ocfg = _ObserveCfg(unimix=c.unimix, latent_dim=c.latent_dim,
                               rows=c.latent_rows, classes=c.latent_classes,
                               dtype=self.dtype, unroll=self.scan_unroll)
            sub = {"gru": params["gru"], "post": params["posterior_head"]}
            h_seq, z_seq, logit_seq = observe_scan(
                ocfg, sub, h0, z0, feats.swapaxes(0, 1),
                a_in.swapaxes(0, 1), gum)
            return ObservedSequence(h=h_seq.swapaxes(0, 1),
                                    z=z_seq.swapaxes(0, 1),
                                    post_logits=logit_seq.swapaxes(0, 1))

        def step(carry, xs):
            h, z = carry
            feat_t, a_t, k_t = xs
            h_next = self.gru_step(params, z, a_t, h)
            logits = self.posterior_logits(params, feat_t, h_next)
            z_next = self._sample(logits, k_t)
            return (h_next, z_next), (h_next, z_next, logits)

        xs = (feats.swapaxes(0, 1), a_in.swapaxes(0, 1), keys)
        _, (h_seq, z_seq, logit_seq) = jax.lax.scan(step, (h0, z0), xs,
                                                    unroll=self.scan_unroll)
        return ObservedSequence(
            h=h_seq.swapaxes(0, 1),
            z=z_seq.swapaxes(0, 1),
            post_logits=logit_seq.swapaxes(0, 1),
        )

    def warm_start(self, params, obs_norm: jnp.ndarray, actions: jnp.ndarray,
                   key: jax.Array,
                   is_first: jnp.ndarray | None = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher-forced warm start for imagination (Dreamer.py:244-262).

        Differs from observe_sequence at t=0: z0 is encoded directly from
        (h=0, obs[0]) with NO GRU step (Dreamer.py:252-253); then
        t = 1..Tw-1 observe steps with action[t-1], obs[t].

        ``is_first`` (B, Tw): same episode-boundary reset semantics as
        observe_sequence (zero h/z/a where the window crosses an env
        auto-reset) so imagination never starts from state carried across a
        boundary.  Returns the final (z, h) after consuming obs[Tw-1].
        """
        B, Tw = obs_norm.shape[0], obs_norm.shape[1]
        feats = self.encode_obs(params, obs_norm)
        key0, key_scan = jax.random.split(key)
        h0 = jnp.zeros((B, self.cfg.hidden_dim), jnp.float32)
        z0 = self._sample(self.posterior_logits(params, feats[:, 0], h0), key0)
        keys = jax.random.split(key_scan, Tw - 1)

        if is_first is not None:
            def step_reset(carry, xs):
                h, z = carry
                feat_t, a_prev, k_t, f_t = xs
                m = (1.0 - f_t)[:, None]
                h = h * m
                z = z * m
                a_prev = a_prev * m.astype(a_prev.dtype)
                h_next = self.gru_step(params, z, a_prev, h)
                logits = self.posterior_logits(params, feat_t, h_next)
                z_next = self._sample(logits, k_t)
                return (h_next, z_next), None

            xs = (feats[:, 1:].swapaxes(0, 1),
                  actions[:, : Tw - 1].swapaxes(0, 1), keys,
                  is_first[:, 1:].astype(jnp.float32).swapaxes(0, 1))
            (h_fin, z_fin), _ = jax.lax.scan(step_reset, (h0, z0), xs,
                                             unroll=self.scan_unroll)
            return z_fin, h_fin

        def step(carry, xs):
            h, z = carry
            feat_t, a_prev, k_t = xs
            h_next = self.gru_step(params, z, a_prev, h)
            logits = self.posterior_logits(params, feat_t, h_next)
            z_next = self._sample(logits, k_t)
            return (h_next, z_next), None

        xs = (feats[:, 1:].swapaxes(0, 1), actions[:, : Tw - 1].swapaxes(0, 1), keys)
        (h_fin, z_fin), _ = jax.lax.scan(step, (h0, z0), xs,
                                         unroll=self.scan_unroll)
        return z_fin, h_fin

    def imagine(self, params, actor_fn: Callable, z0: jnp.ndarray, h0: jnp.ndarray,
                horizon: int, key: jax.Array) -> ImaginedTrajectory:
        """H-step imagination with the policy in the loop (Dreamer.py:143-175).

        ``actor_fn(h, z) -> (mu, sigma)`` closes over the actor params, so the
        whole rollout is differentiable w.r.t. them (the reference's dream runs
        outside no_grad — actor gradients flow through the frozen WM dynamics).

        Reward/continue heads are applied AFTER the scan to the full (B, H)
        state batch — same math as the reference's per-step predict calls.
        """
        keys = jax.random.split(key, horizon)

        if self.fused_scan_grads and getattr(actor_fn, "actor_params", None) is not None:
            traj = self._imagine_fused(params, actor_fn.actor_params, z0, h0,
                                       horizon, keys)
            return traj

        def step(carry, k_t):
            h, z = carry
            k_act, k_lat = jax.random.split(k_t)
            mu, sigma = actor_fn(h, z)
            eps = jax.random.normal(k_act, mu.shape, mu.dtype)
            action = jnp.tanh(mu + sigma * eps)     # rsample (Agent.py:207-209)
            h_next = self.gru_step(params, z, action, h)
            z_next = self._sample(self.prior_logits(params, h_next), k_lat)
            return (h_next, z_next), (h, z, action, mu, sigma)

        (h_fin, z_fin), (h_seq, z_seq, a_seq, mu_seq, sig_seq) = jax.lax.scan(
            step, (h0, z0), keys, unroll=self.scan_unroll)
        return self._assemble_trajectory(params, h_fin, z_fin, h_seq, z_seq,
                                         a_seq, mu_seq, sig_seq)

    def _assemble_trajectory(self, params, h_fin, z_fin, h_seq, z_seq,
                             a_seq, mu_seq, sig_seq) -> ImaginedTrajectory:
        """Shared tail of both imagine paths: (H, B, ...) time-major scan
        outputs -> batch-major trajectory with H+1 states and batched
        reward/continue heads on states 1..H (reward[t] = pred at t+1)."""
        h_all = jnp.concatenate([h_seq.swapaxes(0, 1), h_fin[:, None]], axis=1)
        z_all = jnp.concatenate([z_seq.swapaxes(0, 1), z_fin[:, None]], axis=1)
        reward = self.reward_pred(params, h_all[:, 1:], z_all[:, 1:])
        cont = self.cont_pred(params, h_all[:, 1:], z_all[:, 1:])
        return ImaginedTrajectory(
            h=h_all,
            z=z_all,
            action=a_seq.swapaxes(0, 1),
            reward=reward,
            cont=cont,
            mu=mu_seq.swapaxes(0, 1),
            sigma=sig_seq.swapaxes(0, 1),
        )

    def _imagine_fused(self, params, actor_params, z0, h0, horizon: int,
                       keys) -> ImaginedTrajectory:
        """Deferred-weight-gradient imagination (ops/fused_scans.imagine_scan).

        Reproduces the non-fused scan's RNG stream exactly: per step
        k_act, k_lat = split(keys[t]); eps = normal(k_act); the categorical
        draw is argmax(log probs + gumbel(k_lat)) — identical to
        jax.random.categorical(k_lat, log probs).
        """
        from dreamer_tpu.ops.fused_scans import (_ImagineCfg, imagine_scan,
                                                 imagine_scan_pallas)

        c = self.cfg
        B = h0.shape[0]
        pairs = jax.vmap(jax.random.split)(keys)           # (H, 2) keys
        eps = jax.vmap(lambda k: jax.random.normal(
            k, (B, self.action_dim), jnp.float32))(pairs[:, 0])
        gum = jax.vmap(lambda k: jax.random.gumbel(
            k, (B, c.latent_rows, c.latent_classes), jnp.float32))(pairs[:, 1])

        icfg = _ImagineCfg(horizon=horizon, unimix=c.unimix,
                           latent_dim=c.latent_dim, rows=c.latent_rows,
                           classes=c.latent_classes, dtype=self.dtype,
                           unroll=self.scan_unroll,
                           min_std=self.actor_min_std)
        sub = {"gru": params["gru"], "dyn": params["dyn_head"],
               "actor": actor_params}
        scan_fn = (imagine_scan_pallas if self.use_pallas_imagine
                   else imagine_scan)
        h_fin, z_fin, h_seq, z_seq, a_seq, mu_seq, sig_seq = scan_fn(
            icfg, sub, h0, z0, eps, gum)
        return self._assemble_trajectory(params, h_fin, z_fin, h_seq, z_seq,
                                         a_seq, mu_seq, sig_seq)
