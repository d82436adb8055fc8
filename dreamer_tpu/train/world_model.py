"""World-model loss and update — one jitted program per gradient step.

Replicates the reference's loss semantics bit-for-bit in scan/batched form
(WorldModel.py:84-202 / SURVEY §3.3), including its deliberate quirks:

- obs likelihood is an UNWEIGHTED negative SSE over pixels (unit-variance
  Gaussian up to constants, WorldModel.py:129), applied to steps 1..H-1.
- reward/continue heads run on steps 1..H-1 with targets r[0..H-2]/c[0..H-2]
  (WorldModel.py:113-123); rewards are already symlog (symlog-at-write).
- all likelihoods masked by continue flags c[0..H-2] (WorldModel.py:170-173).
  NOTE this self-masking starves the cont/reward heads of every terminal
  example; under env.next_step_autoreset the mask is replaced by the
  firsts-derived validity mask (see wm_loss_terms) so terminals train.
- KL balancing: KL(sg(post)‖prior) and KL(post‖sg(prior)) on steps 1..H-1,
  each a masked MEAN over B*(H-1) elements (denominator unmasked —
  WorldModel.py:180-183).
- free bits applied AFTER the mean: max(1, E[KL]) (WorldModel.py:187-188).
- loss_pred normalised by mask.sum() + 1e-5 (WorldModel.py:185-186).
- NaN/Inf loss skips the update entirely (WorldModel.py:191-193).
- global-norm clip 100 + AdamW(wd=1e-6) (WorldModel.py:63-69,198).

TPU deviation: bf16 compute via module dtype instead of fp16 GradScaler
(bf16 needs no loss scaling); losses are reduced in f32.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dreamer_tpu.config import DreamerConfig
from dreamer_tpu.core.dists import categorical_kl
from dreamer_tpu.core.math import bucket_values, twohot
from dreamer_tpu.rssm import RSSM
from dreamer_tpu.train.state import WMTrainState


def make_wm_optimizer(cfg: DreamerConfig) -> optax.GradientTransformation:
    w = cfg.wm
    return optax.chain(
        optax.clip_by_global_norm(w.grad_clip),
        optax.adamw(w.lr, b1=w.betas[0], b2=w.betas[1], eps=w.eps,
                    weight_decay=w.weight_decay),
    )


def wm_loss_terms(post_logits: jnp.ndarray, prior_logits: jnp.ndarray,
                  dec_mu: jnp.ndarray, rew_logits: jnp.ndarray,
                  cont_logits: jnp.ndarray, obs: jnp.ndarray,
                  rewards: jnp.ndarray, conts: jnp.ndarray,
                  buckets: jnp.ndarray, cfg: DreamerConfig,
                  valid_mask: jnp.ndarray | None = None
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Pure loss combination from precomputed head outputs — the exact
    formulas of WorldModel.py:109-189, independently unit-testable against a
    torch port of the reference math (tests/test_loss_parity.py).

    Shapes: post/prior logits (B, H, R, C); dec_mu, obs (B, H, h, w, 3);
    rew_logits (B, H-1, K); cont_logits (B, H-1); rewards/conts (B, H).

    ``valid_mask`` (B, H-1) or None: override for the likelihood/KL mask.
    None = reference parity: mask by the cont TARGETS themselves
    (WorldModel.py:170-173) — correct under same-step autoreset (the terminal
    obs was discarded, so the terminal example's latent/target pairing is
    broken there) but it starves the cont/reward heads of every terminal
    example.  Under env.next_step_autoreset the caller passes
    ``1 - firsts[:, 1:H]``: the terminal example (paired with the now-stored
    crash-frame latent) trains, and only the fake reset transition is masked.
    """
    w = cfg.wm
    H = cfg.train.horizon

    # --- likelihoods (reduced in f32) -------------------------------- #
    # The pixel error is taken in the COMPUTE dtype (obs arrives already in
    # it): under f32 this is the reference math exactly; under bf16 it lets
    # XLA fuse subtract+square+reduce into the decoder's conv layout instead
    # of materialising a transposed f32 copy of the (B*H, h, w, 3) recon
    # (%copy.3334, 0.26 ms/update).  obs is bf16-rounded (≤ half an 8-bit
    # pixel step) — the same tier of rounding the bf16 decoder output has.
    err = dec_mu - obs.astype(dec_mu.dtype)
    obs_sse = jnp.sum(jnp.square(err.astype(jnp.float32)),
                      axis=(-3, -2, -1))                     # (B, H)
    obs_log_lh = -obs_sse[:, 1:]                             # steps 1..H-1

    rew_targets = rewards[:, : H - 1]                        # symlog already
    rew_th = twohot(rew_targets, buckets)                    # (B, H-1, K)
    rew_logp = jax.nn.log_softmax(rew_logits.astype(jnp.float32), axis=-1)
    rew_log_lh = jnp.sum(rew_th * rew_logp, axis=-1)         # (B, H-1)

    cont_targets = conts[:, : H - 1]
    x = cont_logits.astype(jnp.float32)
    cont_nll = -(cont_targets * jax.nn.log_sigmoid(x)
                 + (1.0 - cont_targets) * jax.nn.log_sigmoid(-x))  # positive NLL

    if w.terminal_loss_weight != 1.0:
        # Class-imbalance boost for the rare continue=0 examples (the +-100
        # terminal rewards): see WorldModelConfig.terminal_loss_weight.
        # Static Python comparison — at the parity value 1.0 this block does
        # not trace and the HLO is unchanged.
        tw = 1.0 + (w.terminal_loss_weight - 1.0) * (1.0 - cont_targets)
        rew_log_lh = rew_log_lh * tw
        cont_nll = cont_nll * tw

    mask = conts[:, : H - 1] if valid_mask is None else valid_mask  # (B, H-1)
    obs_log_lh = obs_log_lh * mask
    rew_log_lh = rew_log_lh * mask
    cont_nll = cont_nll * mask

    denom = jnp.sum(mask) + 1e-5
    loss_pred = (-jnp.sum(obs_log_lh) - jnp.sum(rew_log_lh) + jnp.sum(cont_nll)) / denom

    # --- KL balancing on steps 1..H-1 ------------------------------- #
    post = post_logits[:, 1:]
    prior = prior_logits[:, 1:]
    kl_dyn = categorical_kl(jax.lax.stop_gradient(post), prior).sum(-1)   # (B, H-1)
    kl_rep = categorical_kl(post, jax.lax.stop_gradient(prior)).sum(-1)
    dkl_dyn = jnp.mean(kl_dyn * mask)
    dkl_rep = jnp.mean(kl_rep * mask)
    if w.free_bits_per_sample:
        # Paper-correct free bits (DreamerV3 eq. 5): clip each (b, t) KL at
        # the floor BEFORE averaging — below-floor states stop contributing
        # gradient individually, above-floor states always do.
        loss_dyn = jnp.mean(jnp.maximum(w.free_bits, kl_dyn) * mask)
        loss_rep = jnp.mean(jnp.maximum(w.free_bits, kl_rep) * mask)
    else:
        # Reference parity (WorldModel.py:187-188): floor applied AFTER the
        # mean — the whole KL term has zero gradient whenever the MEAN KL is
        # under the floor.
        loss_dyn = jnp.maximum(w.free_bits, dkl_dyn)
        loss_rep = jnp.maximum(w.free_bits, dkl_rep)

    total = w.beta_pred * loss_pred + w.beta_dyn * loss_dyn + w.beta_rep * loss_rep
    metrics = {
        "wm/loss": total,
        "wm/loss_pred": loss_pred,
        "wm/kl_dyn": dkl_dyn,
        "wm/kl_rep": dkl_rep,
        "wm/obs_sse": jnp.sum(obs_sse[:, 1:] * mask) / denom,
        "wm/reward_ce": -jnp.sum(rew_log_lh) / denom,
        "wm/cont_ce": jnp.sum(cont_nll) / denom,
    }
    return total, metrics


def wm_loss(rssm: RSSM, params: Any, obs_u8: jnp.ndarray, actions: jnp.ndarray,
            rewards: jnp.ndarray, conts: jnp.ndarray, key: jax.Array,
            cfg: DreamerConfig, firsts: jnp.ndarray | None = None
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total WM loss + metrics on one sampled batch.

    obs_u8: (B, T, H, W, 3) uint8; actions (B, T, A); rewards (B, T) symlog;
    conts (B, T).  Only the first ``horizon`` steps are used
    (WorldModel.py:156-160).

    ``firsts`` (B, T) — the replay ring's episode-start channel, present iff
    env.next_step_autoreset: drives both the in-scan state resets and the
    terminal-inclusive likelihood mask (see wm_loss_terms).  None = parity.
    """
    H = cfg.train.horizon
    # Slice to the horizon BEFORE normalizing: otherwise XLA materialises the
    # normalized full (B, T) sequence and discards 40% of it (measured
    # 0.76 ms/update on a (50,50) batch — tools/xprof_summary.py).  Normalize
    # straight into the COMPUTE dtype: both consumers (encoder, recon-loss
    # target) take it, and the f32 (B, H, h, w, 3) intermediate costs
    # ~0.3 ms/update of pure HBM traffic under bf16.
    obs = obs_u8[:, :H].astype(rssm.dtype) / 255.0 - 0.5
    actions = actions[:, :H]
    rewards, conts = rewards[:, :H], conts[:, :H]

    is_first = None
    valid_mask = None
    if firsts is not None:
        # env.next_step_autoreset: explicit episode-start channel.  State
        # resets exactly where a reset frame sits in the window (window
        # start is state-zero anyway, so position 0 is forced off), and the
        # likelihood/KL mask excludes only the FAKE reset transition (the
        # one step whose target pairs with a reset-frame latent) — the
        # terminal example itself now trains.
        f = firsts[:, :H]
        is_first = f.at[:, 0].set(0.0)
        valid_mask = 1.0 - f[:, 1:]
    elif cfg.wm.reset_on_episode_start:
        # Episode-boundary flags from the stored continue bits: step t starts
        # a new episode iff step t-1 ended one.  Window start is state-zero
        # anyway, so is_first[0] = 0.
        is_first = jnp.concatenate(
            [jnp.zeros_like(conts[:, :1]), 1.0 - conts[:, :-1]], axis=1)
    seq = rssm.observe_sequence(params, obs, actions, key, is_first=is_first)

    prior_logits = rssm.prior_logits(params, seq.h)          # (B, H, R, C)
    dec_mu = rssm.decode(params, seq.h, seq.z)               # (B, H, h, w, 3)
    rew_logits = rssm.reward_logits(params, seq.h[:, 1:], seq.z[:, 1:])
    cont_logits = rssm.cont_logit(params, seq.h[:, 1:], seq.z[:, 1:]).squeeze(-1)

    return wm_loss_terms(seq.post_logits, prior_logits, dec_mu, rew_logits,
                         cont_logits, obs, rewards, conts, rssm.buckets, cfg,
                         valid_mask=valid_mask)


def wm_update(rssm: RSSM, optimizer: optax.GradientTransformation,
              state: WMTrainState, batch, key: jax.Array,
              cfg: DreamerConfig) -> Tuple[WMTrainState, Dict[str, jnp.ndarray]]:
    """One gradient step.  NaN/Inf total loss skips the update
    (WorldModel.py:191-193) via a tree-wide where."""
    obs, actions, rewards, conts = batch[:4]
    firsts = batch[4] if len(batch) > 4 else None

    def loss_fn(p):
        return wm_loss(rssm, p, obs, actions, rewards, conts, key, cfg,
                       firsts=firsts)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    finite = jnp.isfinite(loss)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    sel = lambda new, old: jax.tree.map(lambda a, b: jnp.where(finite, a, b), new, old)
    metrics["wm/grad_norm"] = optax.global_norm(grads)
    metrics["wm/update_skipped"] = (~finite).astype(jnp.float32)
    return WMTrainState(params=sel(new_params, state.params),
                        opt_state=sel(new_opt, state.opt_state)), metrics
