"""Fused Pallas conv-tower kernels: equivalence with the flax/XLA path
(interpret mode on CPU; the compiled path is A/B'd on TPU by tools/ab_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.config import WorldModelConfig
from dreamer_tpu.nets.wm_nets import WMNets


def _small_cfg():
    return WorldModelConfig(
        hidden_dim=32, latent_rows=4, latent_classes=4, obs_size=(32, 32),
        encoder_filters_1=8, encoder_filters_2=8, encoder_hidden=16,
        decoder_filters_1=8, decoder_filters_2=8, decoder_hidden=16,
        dyn_hidden_1=16, dyn_hidden_2=16, rew_hidden_1=16, rew_hidden_2=16,
        cont_hidden_1=16, cont_hidden_2=16, reward_buckets=15)


def _init(cfg, key):
    nets = WMNets(cfg, dtype=jnp.float32)
    h, w = cfg.obs_size
    params = nets.init(key, jnp.zeros((1, h, w, 3)), jnp.zeros((1, 3)),
                       jnp.zeros((1, cfg.hidden_dim)),
                       jnp.zeros((1, cfg.latent_dim)))["params"]
    return nets, params


def _enc_wb(params):
    ws = [params[f"enc_conv{i}"]["kernel"] for i in range(4)]
    bs = [params[f"enc_conv{i}"]["bias"] for i in range(4)]
    return ws, bs


class TestEncoderForward:
    @pytest.mark.parametrize("n,block", [(7, 4), (8, 8), (3, 8)])
    def test_matches_flax(self, rng, n, block):
        from dreamer_tpu.ops.conv_pallas import encoder_forward

        cfg = _small_cfg()
        nets, params = _init(cfg, rng)
        h, w = cfg.obs_size
        obs = (jax.random.uniform(jax.random.fold_in(rng, 1), (n, h, w, 3))
               * 255).astype(jnp.uint8)
        ref = nets.apply({"params": params},
                         obs.astype(jnp.float32) / 255.0 - 0.5,
                         method=WMNets.encode_obs)
        ws, bs = _enc_wb(params)
        out = encoder_forward(obs, ws, bs, dtype=jnp.float32, block=block,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
