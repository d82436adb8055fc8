"""Shape/param-count/golden tests for the network modules (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.config import WorldModelConfig
from dreamer_tpu.nets import WMNets, GRUCell, Actor, Critic
from dreamer_tpu.nets.gru import gru_cell_core


def small_cfg():
    return WorldModelConfig(
        hidden_dim=32,
        latent_rows=8,
        latent_classes=8,
        obs_size=(32, 32),
        encoder_filters_1=4,
        encoder_filters_2=8,
        encoder_hidden=16,
        decoder_filters_1=4,
        decoder_filters_2=8,
        decoder_hidden=16,
        dyn_hidden_1=16, dyn_hidden_2=16,
        rew_hidden_1=16, rew_hidden_2=16,
        cont_hidden_1=16, cont_hidden_2=16,
        reward_buckets=31,
    )


@pytest.fixture(scope="module")
def wm_small():
    cfg = small_cfg()
    nets = WMNets(cfg)
    key = jax.random.PRNGKey(0)
    obs = jnp.zeros((2, 32, 32, 3))
    params = nets.init(key, obs, jnp.zeros((2, 3)), jnp.zeros((2, 32)),
                       jnp.zeros((2, 64)))["params"]
    return cfg, nets, params


class TestWMNets:
    def test_encoder_feature_size(self, wm_small):
        cfg, nets, params = wm_small
        obs = jnp.ones((3, 5, 32, 32, 3)) * 0.1
        feat = nets.apply({"params": params}, obs, method=WMNets.encode_obs)
        # 4 stride-2 convs: 32 -> 2; channels 4*f2=32 -> 2*2*32 = 128
        assert feat.shape == (3, 5, 2 * 2 * 4 * cfg.encoder_filters_2)

    def test_posterior_shape(self, wm_small):
        cfg, nets, params = wm_small
        feat = jnp.ones((4, 128))
        h = jnp.ones((4, cfg.hidden_dim))
        logits = nets.apply({"params": params}, feat, h, method=WMNets.posterior_logits)
        assert logits.shape == (4, cfg.latent_rows, cfg.latent_classes)

    def test_decoder_shape_and_range(self, wm_small):
        cfg, nets, params = wm_small
        h = jnp.ones((2, 7, cfg.hidden_dim))
        z = jnp.ones((2, 7, cfg.latent_dim))
        dec = nets.apply({"params": params}, h, z, method=WMNets.decode)
        assert dec.shape == (2, 7, 32, 32, 3)
        assert float(jnp.abs(dec).max()) <= 1.0  # Tanh output (VariationalAutoEncoder.py:136)

    def test_heads_shapes(self, wm_small):
        cfg, nets, params = wm_small
        h = jnp.ones((2, 4, cfg.hidden_dim))
        z = jnp.ones((2, 4, cfg.latent_dim))
        prior = nets.apply({"params": params}, h, method=WMNets.prior_logits)
        rew = nets.apply({"params": params}, h, z, method=WMNets.reward_logits)
        cont = nets.apply({"params": params}, h, z, method=WMNets.cont_logit)
        assert prior.shape == (2, 4, cfg.latent_rows, cfg.latent_classes)
        assert rew.shape == (2, 4, cfg.reward_buckets)
        assert cont.shape == (2, 4, 1)

    @pytest.mark.heavy
    def test_full_size_param_count(self):
        # SURVEY §2.1: ~9M params total at the reference config; GRU alone
        # = 3*600*(1027+600) + 2*3*600 = 2,932,200.
        cfg = WorldModelConfig()
        nets = WMNets(cfg)
        params = nets.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 3)), jnp.zeros((1, 600)),
                           jnp.zeros((1, 1024)))["params"]
        gru_count = sum(np.prod(v.shape) for v in jax.tree.leaves(params["gru"]))
        assert gru_count == 3 * 600 * (1024 + 3 + 600) + 2 * 3 * 600
        total = sum(np.prod(v.shape) for v in jax.tree.leaves(params))
        assert 7.5e6 < total < 9.5e6  # WM portion of the ~9M total


class TestGRUCell:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        in_dim, hid, B = 19, 23, 7
        cell = GRUCell(hidden_dim=hid)
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (B, in_dim))
        h = jax.random.normal(jax.random.PRNGKey(2), (B, hid))
        params = cell.init(key, x, h)["params"]

        tcell = torch.nn.GRUCell(in_dim, hid)
        with torch.no_grad():
            tcell.weight_ih.copy_(torch.tensor(np.asarray(params["kernel_i"]).T))
            tcell.weight_hh.copy_(torch.tensor(np.asarray(params["kernel_h"]).T))
            tcell.bias_ih.copy_(torch.tensor(np.asarray(params["bias_i"])))
            tcell.bias_hh.copy_(torch.tensor(np.asarray(params["bias_h"])))
            ref = tcell(torch.tensor(np.asarray(x)), torch.tensor(np.asarray(h))).numpy()

        ours = np.asarray(cell.apply({"params": params}, x, h))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_core_function_pure(self, rng):
        x = jax.random.normal(rng, (4, 10))
        h = jax.random.normal(rng, (4, 6))
        wi = jax.random.normal(rng, (10, 18)) * 0.1
        wh = jax.random.normal(rng, (6, 18)) * 0.1
        bi = jnp.zeros(18)
        bh = jnp.zeros(18)
        out = gru_cell_core(x, h, wi, wh, bi, bh)
        assert out.shape == (4, 6)
        assert np.isfinite(np.asarray(out)).all()


class TestActorCritic:
    def test_actor_zero_init_mu(self, rng):
        actor = Actor(action_dim=3)
        h, z = jnp.ones((5, 600)), jnp.ones((5, 1024))
        params = actor.init(rng, h, z)["params"]
        mu, sigma = actor.apply({"params": params}, h, z)
        # mu head zero-initialised (Agent.py:188-189) -> mu == 0 at init
        np.testing.assert_allclose(mu, np.zeros((5, 3)), atol=1e-7)
        assert (np.asarray(sigma) > 1e-3).all()

    def test_critic_logits_shape(self, rng):
        critic = Critic(num_buckets=255)
        h, z = jnp.ones((2, 7, 600)), jnp.ones((2, 7, 1024))
        params = critic.init(rng, h, z)["params"]
        logits = critic.apply({"params": params}, h, z)
        assert logits.shape == (2, 7, 255)
        assert logits.dtype == jnp.float32

    def test_bf16_compute_f32_params(self, rng):
        actor = Actor(action_dim=3, dtype=jnp.bfloat16)
        h, z = jnp.ones((5, 32)), jnp.ones((5, 64))
        params = actor.init(rng, h, z)["params"]
        for leaf in jax.tree.leaves(params):
            assert leaf.dtype == jnp.float32  # params stay f32
        mu, sigma = actor.apply({"params": params}, h, z)
        assert mu.dtype == jnp.float32  # outputs cast back to f32
