"""Unit tests for dreamer_tpu.core — math, distributions, returns.

Golden values are checked against hand computations and, where noted, against
the reference formulas (SURVEY §3.3/§3.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer_tpu.core import (
    symlog,
    symexp,
    twohot,
    bucket_values,
    twohot_expectation,
    unimix_probs,
    sample_onehot_ste,
    categorical_kl,
    tanh_normal_logprob,
    tanh_normal_sample,
    actor_mu_sigma,
    lambda_returns,
    update_return_scale,
)


class TestSymlog:
    def test_roundtrip(self):
        x = jnp.array([-100.0, -1.0, -1e-4, 0.0, 1e-4, 1.0, 100.0])
        np.testing.assert_allclose(symexp(symlog(x)), x, rtol=1e-4, atol=1e-6)

    def test_symexp_clamp(self):
        # symexp clamps input to +/-20 (DreamerUtils.py:36)
        assert float(symexp(jnp.array(25.0))) == pytest.approx(np.expm1(20.0), rel=1e-6)

    def test_values(self):
        assert float(symlog(jnp.array(np.e - 1.0))) == pytest.approx(1.0, rel=1e-6)
        assert float(symlog(jnp.array(-(np.e - 1.0)))) == pytest.approx(-1.0, rel=1e-6)


class TestTwohot:
    def test_exact_bucket(self):
        buckets = bucket_values(5, -2.0, 2.0)  # [-2,-1,0,1,2]
        th = twohot(jnp.array(1.0), buckets)
        np.testing.assert_allclose(th, [0, 0, 0, 1, 0], atol=1e-6)

    def test_between_buckets(self):
        buckets = bucket_values(5, -2.0, 2.0)
        th = twohot(jnp.array(0.25), buckets)
        np.testing.assert_allclose(th, [0, 0, 0.75, 0.25, 0], atol=1e-6)

    def test_clipping(self):
        buckets = bucket_values(5, -2.0, 2.0)
        np.testing.assert_allclose(twohot(jnp.array(10.0), buckets), [0, 0, 0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(twohot(jnp.array(-10.0), buckets), [1, 0, 0, 0, 0], atol=1e-6)

    def test_mass_sums_to_one(self):
        buckets = bucket_values(255)
        vals = jnp.linspace(-25, 25, 97)
        th = twohot(vals, buckets)
        np.testing.assert_allclose(th.sum(-1), np.ones(97), atol=1e-5)

    def test_expectation_inverts(self):
        # E[twohot] recovers the (clipped) value: logits = log(twohot + tiny)
        buckets = bucket_values(255)
        vals = jnp.array([-15.0, -1.3, 0.0, 0.77, 18.0])
        th = twohot(vals, buckets)
        logits = jnp.log(th + 1e-12)
        dec = twohot_expectation(logits, buckets).squeeze(-1)
        np.testing.assert_allclose(dec, symexp(vals), rtol=1e-3, atol=1e-3)

    def test_matches_reference_torch(self):
        torch = pytest.importorskip("torch")

        def to_twohot_ref(value, buckets):
            # Verbatim semantics of DreamerUtils.py:39-50
            clipped = torch.clamp(value, min=buckets.min(), max=buckets.max())
            lower = torch.searchsorted(buckets, clipped, right=True) - 1
            lower = torch.clamp(lower, max=len(buckets) - 2)
            lo_v, hi_v = buckets[lower], buckets[lower + 1]
            w = (clipped - lo_v) / (hi_v - lo_v + 1e-8)
            out = torch.zeros(value.shape[:-1] + (len(buckets),))
            out = torch.scatter(out, -1, lower, 1.0 - w)
            out = torch.scatter(out, -1, lower + 1, w)
            return out

        vals = np.random.RandomState(0).uniform(-22, 22, size=(4, 7, 1)).astype(np.float32)
        buckets_t = torch.linspace(-20.0, 20.0, 255)
        ref = to_twohot_ref(torch.tensor(vals), buckets_t).numpy()
        ours = np.asarray(twohot(jnp.asarray(vals[..., 0]), bucket_values(255)))
        np.testing.assert_allclose(ours, ref, atol=5e-5)


class TestUnimixCategorical:
    def test_unimix_mixture(self):
        logits = jnp.array([[10.0, 0.0, 0.0, 0.0]])
        p = unimix_probs(logits, 0.01)
        assert float(p.min()) >= 0.01 / 4 * 0.99  # floor from the uniform mix
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-6)

    def test_ste_forward_is_onehot(self, rng):
        logits = jax.random.normal(rng, (8, 32, 32))
        p = unimix_probs(logits)
        z = sample_onehot_ste(p, rng)
        np.testing.assert_allclose(z.sum(-1), np.ones((8, 32)), atol=1e-6)
        assert set(np.unique(np.round(np.asarray(z), 5))) <= {0.0, 1.0} or True
        # forward value == exact one-hot
        onehot = np.isclose(np.asarray(z), np.round(np.asarray(z)))
        assert onehot.all()

    def test_ste_gradient_flows(self, rng):
        # Gradient of sum(sample) w.r.t. logits equals gradient of sum(probs):
        # the straight-through estimator passes the probs gradient.
        logits = jax.random.normal(rng, (4, 8))

        def f(lg):
            p = unimix_probs(lg)
            z = sample_onehot_ste(p, rng)
            return jnp.sum(z * jnp.arange(8.0))

        g = jax.grad(f)(logits)
        assert np.abs(np.asarray(g)).sum() > 0  # nonzero grad through STE

    def test_sampling_distribution(self, rng):
        logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
        p = unimix_probs(jnp.broadcast_to(logits, (20000, 3)), 0.01)
        z = sample_onehot_ste(p, rng)
        freq = np.asarray(z).mean(0)
        expect = 0.99 * np.array([0.7, 0.2, 0.1]) + 0.01 / 3
        np.testing.assert_allclose(freq, expect, atol=0.02)


class TestCategoricalKL:
    def test_zero_for_identical(self, rng):
        logits = jax.random.normal(rng, (5, 32))
        np.testing.assert_allclose(categorical_kl(logits, logits), np.zeros(5), atol=1e-6)

    def test_against_torch(self, rng):
        torch = pytest.importorskip("torch")
        lp = np.random.RandomState(1).normal(size=(6, 32)).astype(np.float32)
        lq = np.random.RandomState(2).normal(size=(6, 32)).astype(np.float32)
        ref = torch.distributions.kl.kl_divergence(
            torch.distributions.Categorical(logits=torch.tensor(lp)),
            torch.distributions.Categorical(logits=torch.tensor(lq)),
        ).numpy()
        ours = np.asarray(categorical_kl(jnp.asarray(lp), jnp.asarray(lq)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestTanhNormal:
    def test_logprob_against_torch(self):
        torch = pytest.importorskip("torch")
        rs = np.random.RandomState(3)
        mu = rs.normal(size=(10, 3)).astype(np.float32)
        sig = rs.uniform(0.1, 1.0, size=(10, 3)).astype(np.float32)
        act = np.tanh(rs.normal(size=(10, 3))).astype(np.float32)

        base = torch.distributions.Normal(torch.tensor(mu), torch.tensor(sig))
        dist = torch.distributions.TransformedDistribution(
            base, [torch.distributions.TanhTransform()]
        )
        a_cl = torch.clamp(torch.tensor(act), -1 + 1e-6, 1 - 1e-6)
        ref = dist.log_prob(a_cl).sum(-1).numpy()
        ours = np.asarray(tanh_normal_logprob(jnp.asarray(act), jnp.asarray(mu), jnp.asarray(sig)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_sigma_mapping(self):
        mu, sig = actor_mu_sigma(jnp.zeros(3), jnp.array([-10.0, 0.0, 10.0]))
        # clamp [-5, 2] then softplus + 1e-3 (Agent.py:198-199)
        expected = np.log1p(np.exp(np.array([-5.0, 0.0, 2.0]))) + 1e-3
        np.testing.assert_allclose(sig, expected, rtol=1e-5)

    def test_sample_in_range(self, rng):
        a = tanh_normal_sample(jnp.zeros((100, 3)), jnp.ones((100, 3)), rng)
        assert float(jnp.abs(a).max()) < 1.0


class TestLambdaReturns:
    def test_hand_computed(self):
        # T=3 with V = [v0 v1 v2 v3], hand recursion per Agent.py:156-172
        gamma, lam = 0.9, 0.8
        values = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        rewards = jnp.array([[0.5, -0.5, 1.0]])
        conts = jnp.array([[1.0, 1.0, 0.5]])
        r2 = 1.0 + gamma * 0.5 * 4.0
        r1 = -0.5 + gamma * 1.0 * ((1 - lam) * 3.0 + lam * r2)
        r0 = 0.5 + gamma * 1.0 * ((1 - lam) * 2.0 + lam * r1)
        out = lambda_returns(values, rewards, conts, gamma, lam)
        np.testing.assert_allclose(out, [[r0, r1, r2]], rtol=1e-6)

    def test_against_reference_loop(self):
        # Vectorised scan == the reference's python list recursion
        rs = np.random.RandomState(4)
        B, T = 5, 12
        values = rs.normal(size=(B, T + 1)).astype(np.float32)
        rewards = rs.normal(size=(B, T)).astype(np.float32)
        conts = rs.uniform(0, 1, size=(B, T)).astype(np.float32)
        gamma, lam = 0.99, 0.95

        next_ret = rewards[:, -1] + gamma * conts[:, -1] * values[:, -1]
        rets = [next_ret]
        for t in reversed(range(T - 1)):
            r = rewards[:, t] + gamma * conts[:, t] * (
                (1 - lam) * values[:, t + 1] + lam * next_ret
            )
            rets.insert(0, r)
            next_ret = r
        ref = np.stack(rets, axis=1)

        ours = np.asarray(
            lambda_returns(jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(conts), gamma, lam)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_gamma_zero(self):
        values = jnp.ones((2, 4))
        rewards = jnp.arange(6.0).reshape(2, 3)
        conts = jnp.ones((2, 3))
        out = lambda_returns(values, rewards, conts, 0.0, 0.95)
        np.testing.assert_allclose(out, rewards, atol=1e-6)


class TestReturnScale:
    def test_ema_update(self):
        returns = jnp.linspace(0.0, 100.0, 1000).reshape(10, 100)
        s = update_return_scale(jnp.asarray(1.0), returns, smoothing=0.99)
        rng_ = np.quantile(np.asarray(returns).ravel(), 0.95) - np.quantile(
            np.asarray(returns).ravel(), 0.05
        )
        assert float(s) == pytest.approx(0.99 * 1.0 + 0.01 * rng_, rel=1e-4)

    def test_floor_at_one(self):
        returns = jnp.zeros((4, 4))  # range 0 -> floored to 1
        s = update_return_scale(jnp.asarray(5.0), returns)
        assert float(s) == pytest.approx(0.99 * 5.0 + 0.01 * 1.0, rel=1e-5)

    def test_nan_skips(self):
        returns = jnp.full((2, 2), jnp.nan)
        s = update_return_scale(jnp.asarray(3.0), returns)
        assert float(s) == 3.0


class TestUnusedReferencePorts:
    """The reference ships three unused helpers (DreamerUtils.py:4-27); we
    port them for API completeness and verify against torch."""

    def test_gaussian_log_probability(self):
        import torch

        from dreamer_tpu.core import gaussian_log_probability

        rng = np.random.RandomState(0)
        x, mu = rng.randn(5, 3), rng.randn(5, 3)
        sigma = rng.rand(5, 3) + 0.1
        ref = torch.distributions.Normal(
            torch.as_tensor(mu), torch.as_tensor(sigma)
        ).log_prob(torch.as_tensor(x)).numpy()
        ours = gaussian_log_probability(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(sigma))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)

    def test_bernoulli_log_probability(self):
        from dreamer_tpu.core import bernoulli_log_probability

        p = jnp.asarray([0.0, 0.25, 0.9, 1.0])
        k = jnp.asarray([0.0, 1.0, 1.0, 0.0])
        out = np.asarray(bernoulli_log_probability(p, k))
        expected = np.array([0.0, np.log(0.25), np.log(0.9), np.log(1e-8)])
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_gaussian_kl(self):
        import torch

        from dreamer_tpu.core import gaussian_kl

        rng = np.random.RandomState(1)
        mu1, mu2 = rng.randn(4), rng.randn(4)
        s1, s2 = rng.rand(4) + 0.1, rng.rand(4) + 0.1
        ref = torch.distributions.kl_divergence(
            torch.distributions.Normal(torch.as_tensor(mu1), torch.as_tensor(s1)),
            torch.distributions.Normal(torch.as_tensor(mu2), torch.as_tensor(s2)),
        ).numpy()
        ours = gaussian_kl(jnp.asarray(mu1), jnp.asarray(s1), jnp.asarray(mu2), jnp.asarray(s2))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)

    def test_same_gaussian_zero_kl(self):
        from dreamer_tpu.core import gaussian_kl

        out = gaussian_kl(jnp.asarray(1.0), jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(0.5))
        assert float(out) == pytest.approx(0.0, abs=1e-7)
