"""Equivalence of the whole-rollout Pallas imagination (ops/imagine_pallas +
fused_scans.imagine_scan_pallas) against the XLA fused scan.

Interpret mode on CPU checks the MATH (same ops, same RNG stream -> f32
agreement to reduction-order noise); the compiled Mosaic path is exercised on
the real chip by tools/try_imagine_pallas (single-step parity there is exact;
whole-rollout outputs drift through the chaotic recurrence and may flip a
sampled category — documented in fused_scans.imagine_scan_pallas).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from dreamer_tpu.config import DreamerConfig, WorldModelConfig
from dreamer_tpu.rssm import RSSM
from dreamer_tpu.train.agent import AgentTrainer
from dreamer_tpu.ops.fused_scans import (_ImagineCfg, imagine_scan,
                                         imagine_scan_pallas)

# Latent rows*classes must be a lane multiple (128) for the flat (B, Z)
# operands; 8x16 = 128 is the smallest CPU-fast config.
SMALL = dict(hidden_dim=64, latent_rows=8, latent_classes=16, obs_size=(16, 16),
             encoder_filters_1=4, encoder_filters_2=8, encoder_hidden=32,
             decoder_filters_1=4, decoder_filters_2=8, decoder_hidden=32,
             dyn_hidden_1=24, dyn_hidden_2=24, rew_hidden_1=16, rew_hidden_2=16,
             cont_hidden_1=16, cont_hidden_2=16, reward_buckets=31)


@pytest.fixture(scope="module")
def setup():
    wm = WorldModelConfig(**SMALL)
    cfg = DreamerConfig()
    cfg = dataclasses.replace(
        cfg, wm=wm,
        agent=dataclasses.replace(cfg.agent, actor_hidden_1=24,
                                  actor_hidden_2=24, critic_buckets=31,
                                  min_std=0.1))
    rssm = RSSM(wm, action_dim=3, fused_scan_grads=True, actor_min_std=0.1)
    params = rssm.init_params(jax.random.PRNGKey(0))
    agent = AgentTrainer(cfg)
    ap, _ = agent.init_params(jax.random.PRNGKey(1), wm.hidden_dim, wm.latent_dim)
    B, T = 4, 6
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, wm.hidden_dim), jnp.float32)
    z0 = jax.random.normal(jax.random.PRNGKey(3), (B, wm.latent_dim), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(4), (T, B, 3), jnp.float32)
    gum = jax.random.gumbel(jax.random.PRNGKey(5),
                            (T, B, wm.latent_rows, wm.latent_classes), jnp.float32)
    icfg = _ImagineCfg(horizon=T, unimix=wm.unimix, latent_dim=wm.latent_dim,
                       rows=wm.latent_rows, classes=wm.latent_classes,
                       dtype=jnp.float32, unroll=1, min_std=0.1)
    sub = {"gru": params["gru"], "dyn": params["dyn_head"], "actor": ap}
    return icfg, sub, h0, z0, eps, gum


NAMES = ["h_fin", "z_fin", "h_seq", "z_seq", "a_seq", "mu_seq", "sig_seq"]


def test_forward_matches_xla_scan(setup):
    icfg, sub, h0, z0, eps, gum = setup
    a = imagine_scan(icfg, sub, h0, z0, eps, gum)
    with pltpu.force_tpu_interpret_mode():
        b = imagine_scan_pallas(icfg, sub, h0, z0, eps, gum)
    # Sampled categories must agree EXACTLY (a flip would mean the sampler
    # diverged, not just rounding); the STE values (onehot + probs - probs)
    # carry ~1e-8 float fuzz and are covered by the allclose below.  z_fin is
    # a pure post-step sample; z_seq[0] is the (continuous) fixture z0.
    rows, classes = 8, 16
    za = np.asarray(a[1]).reshape(-1, rows, classes).argmax(-1)
    zb = np.asarray(b[1]).reshape(-1, rows, classes).argmax(-1)
    np.testing.assert_array_equal(za, zb)
    sa = np.asarray(a[3])[1:].reshape(-1, rows, classes).argmax(-1)
    sb = np.asarray(b[3])[1:].reshape(-1, rows, classes).argmax(-1)
    np.testing.assert_array_equal(sa, sb)
    for name, x, y in zip(NAMES, a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-6, err_msg=name)


@pytest.mark.heavy
def test_grads_match_xla_scan(setup):
    """The backward is SHARED (fused_scans._imagine_bwd); with matching
    forward values the gradients must agree to f32 noise."""
    icfg, sub, h0, z0, eps, gum = setup

    def loss(fn, p):
        out = fn(icfg, p, h0, z0, eps, gum)
        h_fin, z_fin, h_seq, z_seq, a_seq, mu_seq, sig_seq = out
        return (jnp.sum(jnp.sin(mu_seq) * sig_seq) + jnp.sum(h_seq ** 2) * 1e-3
                + jnp.sum(a_seq ** 2) * 1e-2 + jnp.sum(h_fin ** 2) * 1e-3)

    ga = jax.grad(lambda p: loss(imagine_scan, p))(sub)
    with pltpu.force_tpu_interpret_mode():
        gb = jax.grad(lambda p: loss(imagine_scan_pallas, p))(sub)
    fa, _ = jax.flatten_util.ravel_pytree(ga)
    fb, _ = jax.flatten_util.ravel_pytree(gb)
    np.testing.assert_allclose(fa, fb, rtol=5e-4, atol=5e-6)
