"""World-model networks as ONE flax module with method-based apply.

Components (shapes at the reference's default config in parentheses):

- conv encoder: 4x stride-2 Conv(k4, p1) + SiLU, channels 3 -> f1 -> f2 ->
  2*f2 -> 4*f2, NHWC (VariationalAutoEncoder.py:33-42).  TPU-first deviation
  from the reference: the conv tower is applied to ALL (B*T) frames in one
  batched call *outside* the RSSM time scan — it does not depend on the
  recurrent state, only the posterior MLP does.
- posterior head ("latent_mapper"): Dense(enc_hidden)+LN+SiLU -> Dense(32*32)
  on [conv features ‖ h] (VariationalAutoEncoder.py:50-55,73).
- GRU sequence model: h' = GRU([flat(z) ‖ a], h) (SequenceModel.py:13-24).
- dynamics (prior) head: MLP h -> 32x32 logits (DynamicsPredictors.py:15-23).
- reward head: MLP [h ‖ flat(z)] -> 255 twohot logits (DynamicsPredictors.py:52-60).
- continue head: MLP [h ‖ flat(z)] -> 1 logit (DynamicsPredictors.py:85-93).
- decoder: Dense+LN+SiLU -> Dense(4*f2*H/16*W/16)+SiLU on [h ‖ flat(z)],
  then 4x stride-2 ConvTranspose(k4, p1)+SiLU with final Tanh
  (VariationalAutoEncoder.py:119-137).

All heads take *flattened* hidden/latent of shape (..., D): callers may pass
any leading batch/time dims.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dreamer_tpu.config import WorldModelConfig
from dreamer_tpu.nets.gru import GRUCell
from dreamer_tpu.nets.mlp import MLP


class WMNets(nn.Module):
    cfg: WorldModelConfig
    dtype: Any = jnp.float32
    use_pallas_gru: bool = False

    def setup(self):
        c = self.cfg
        f1, f2 = c.encoder_filters_1, c.encoder_filters_2
        self.enc_convs = [
            nn.Conv(feat, (4, 4), strides=2, padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=f"enc_conv{i}")
            for i, feat in enumerate([f1, f2, 2 * f2, 4 * f2])
        ]
        self.posterior_head = MLP([c.encoder_hidden], c.latent_dim, dtype=self.dtype,
                                  name="posterior_head")
        self.gru = GRUCell(c.hidden_dim, dtype=self.dtype, use_pallas=self.use_pallas_gru,
                           name="gru")
        self.dyn_head = MLP([c.dyn_hidden_1, c.dyn_hidden_2], c.latent_dim,
                            dtype=self.dtype, name="dyn_head")
        self.reward_head = MLP([c.rew_hidden_1, c.rew_hidden_2], c.reward_buckets,
                               dtype=self.dtype, name="reward_head")
        self.cont_head = MLP([c.cont_hidden_1, c.cont_hidden_2], 1, dtype=self.dtype,
                             name="cont_head")

        df1, df2 = c.decoder_filters_1, c.decoder_filters_2
        h16, w16 = c.obs_size[0] // 16, c.obs_size[1] // 16
        self.dec_start = (h16, w16, 4 * df2)
        self.upscaler_1 = nn.Dense(c.decoder_hidden, dtype=self.dtype, name="upscaler_1")
        self.upscaler_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="upscaler_ln")
        self.upscaler_2 = nn.Dense(4 * df2 * h16 * w16, dtype=self.dtype, name="upscaler_2")
        self.dec_convs = [
            nn.ConvTranspose(feat, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype,
                             name=f"dec_conv{i}")
            for i, feat in enumerate([2 * df2, df2, df1, 3])
        ]

    # ------------------------------------------------------------------ #
    # Encoder
    # ------------------------------------------------------------------ #

    def encode_obs(self, obs: jnp.ndarray) -> jnp.ndarray:
        """Conv tower over normalised obs (..., H, W, 3) -> flat features (..., F).

        Recurrence-independent, so callers batch it over (B*T) frames in one
        MXU-friendly call (the reference re-runs it per step inside its
        python-t loop, WorldModel.py:97-107).
        """
        lead = obs.shape[:-3]
        x = obs.reshape((-1,) + obs.shape[-3:]).astype(self.dtype)
        for conv in self.enc_convs:
            x = nn.silu(conv(x))
        return x.reshape(lead + (-1,))

    def posterior_logits(self, feat: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        """[conv features ‖ h] -> (..., rows, classes) latent logits."""
        x = jnp.concatenate([feat, h.astype(self.dtype)], axis=-1)
        logits = self.posterior_head(x)
        return logits.reshape(logits.shape[:-1] + (self.cfg.latent_rows, self.cfg.latent_classes))

    # ------------------------------------------------------------------ #
    # Recurrence + heads
    # ------------------------------------------------------------------ #

    def gru_step(self, z_flat: jnp.ndarray, action: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        """h' = GRU([flat(z) ‖ a], h); inputs (..., D) with matching leading dims."""
        x = jnp.concatenate([z_flat, action], axis=-1)
        lead = x.shape[:-1]
        out = self.gru(x.reshape((-1, x.shape[-1])), h.reshape((-1, h.shape[-1])))
        return out.reshape(lead + (self.cfg.hidden_dim,))

    def prior_logits(self, h: jnp.ndarray) -> jnp.ndarray:
        logits = self.dyn_head(h.astype(self.dtype))
        return logits.reshape(logits.shape[:-1] + (self.cfg.latent_rows, self.cfg.latent_classes))

    def reward_logits(self, h: jnp.ndarray, z_flat: jnp.ndarray) -> jnp.ndarray:
        return self.reward_head(jnp.concatenate([h, z_flat], axis=-1).astype(self.dtype))

    def cont_logit(self, h: jnp.ndarray, z_flat: jnp.ndarray) -> jnp.ndarray:
        return self.cont_head(jnp.concatenate([h, z_flat], axis=-1).astype(self.dtype))

    # ------------------------------------------------------------------ #
    # Decoder
    # ------------------------------------------------------------------ #

    def decode(self, h: jnp.ndarray, z_flat: jnp.ndarray) -> jnp.ndarray:
        """(h, z) -> reconstructed obs mean in [-1, 1], (..., H, W, 3)."""
        x = jnp.concatenate([h, z_flat], axis=-1).astype(self.dtype)
        lead = x.shape[:-1]
        x = nn.silu(self.upscaler_ln(self.upscaler_1(x)))
        x = nn.silu(self.upscaler_2(x))
        x = x.reshape((-1,) + self.dec_start)
        for conv in self.dec_convs[:-1]:
            x = nn.silu(conv(x))
        x = jnp.tanh(self.dec_convs[-1](x))
        return x.reshape(lead + x.shape[-3:])

    def __call__(self, obs, action, h, z_flat):
        """Init-only pass touching every submodule (never used in training)."""
        feat = self.encode_obs(obs)
        post = self.posterior_logits(feat, h)
        h2 = self.gru_step(z_flat, action, h)
        prior = self.prior_logits(h2)
        rew = self.reward_logits(h2, z_flat)
        cont = self.cont_logit(h2, z_flat)
        dec = self.decode(h2, z_flat)
        return post, prior, rew, cont, dec
