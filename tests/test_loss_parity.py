"""Numerical parity of the loss math against a direct torch port of the
reference formulas, on shared synthetic head outputs (SURVEY §4:
"single-update numerical parity tests against the loss formulas in §3.3/§3.4").

The torch side below is written from the reference's formulas
(WorldModel.py:109-189, Agent.py:96-135) — same slicing, masking, KL
balancing, free bits, twohot targets — evaluated on identical inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dreamer_tpu.config import DreamerConfig  # noqa: E402
from dreamer_tpu.core.math import bucket_values  # noqa: E402
from dreamer_tpu.train.world_model import wm_loss_terms  # noqa: E402


def torch_to_twohot(value, buckets):
    # DreamerUtils.py:39-50 verbatim semantics
    clipped = torch.clamp(value, min=buckets.min(), max=buckets.max())
    lower = torch.searchsorted(buckets, clipped, right=True) - 1
    lower = torch.clamp(lower, max=len(buckets) - 2)
    lo_v, hi_v = buckets[lower], buckets[lower + 1]
    w = (clipped - lo_v) / (hi_v - lo_v + 1e-8)
    out = torch.zeros(value.shape[:-1] + (len(buckets),))
    out = torch.scatter(out, -1, lower, 1.0 - w)
    out = torch.scatter(out, -1, lower + 1, w)
    return out


def torch_wm_loss(post_logits, prior_logits, dec_mu, rew_logits, cont_logits,
                  obs, rewards, conts, buckets, betas, horizon):
    """WorldModel.py:109-189 math on precomputed head outputs."""
    H = horizon
    t = torch.tensor
    post, prior = t(post_logits), t(prior_logits)
    mask = t(conts)[:, : H - 1]

    obs_log_lh = -(t(dec_mu) - t(obs)).pow(2).sum(dim=[-3, -2, -1])[:, 1:]

    rew_targets = t(rewards)[:, : H - 1].unsqueeze(-1)
    rew_th = torch_to_twohot(rew_targets, t(np.asarray(buckets)))
    rew_logp = torch.nn.functional.log_softmax(t(rew_logits), dim=-1)
    rew_log_lh = torch.sum(rew_th * rew_logp, dim=-1)

    cont_log_lh = torch.nn.functional.binary_cross_entropy_with_logits(
        t(cont_logits), t(conts)[:, : H - 1], reduction="none")

    obs_log_lh = obs_log_lh * mask
    rew_log_lh = rew_log_lh * mask
    cont_log_lh = cont_log_lh * mask

    denom = mask.sum() + 1e-5
    loss_pred = (-obs_log_lh.sum() - rew_log_lh.sum() + cont_log_lh.sum()) / denom

    prior_d = torch.distributions.Categorical(logits=prior[:, 1:])
    post_d = torch.distributions.Categorical(logits=post[:, 1:])
    dkl_dyn = torch.distributions.kl.kl_divergence(post_d, prior_d).sum(-1)
    dkl_rep = dkl_dyn  # same value on fixed inputs; grads differ, values equal
    dkl_dyn = torch.mean(dkl_dyn * mask)
    dkl_rep = torch.mean(dkl_rep * mask)
    loss_dyn = torch.clamp(dkl_dyn, min=1.0)
    loss_rep = torch.clamp(dkl_rep, min=1.0)

    beta_pred, beta_dyn, beta_rep = betas
    return (beta_pred * loss_pred + beta_dyn * loss_dyn + beta_rep * loss_rep,
            loss_pred, dkl_dyn)


class TestWMLossParity:
    def test_total_loss_matches_torch_port(self):
        rs = np.random.RandomState(0)
        B, H, R, C, K = 3, 7, 4, 5, 31
        h, w = 8, 8
        cfg = DreamerConfig()
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            wm=dataclasses.replace(cfg.wm, latent_rows=R, latent_classes=C,
                                   reward_buckets=K, obs_size=(h, w)),
            train=dataclasses.replace(cfg.train, horizon=H))

        post = rs.normal(size=(B, H, R, C)).astype(np.float32)
        prior = rs.normal(size=(B, H, R, C)).astype(np.float32)
        dec_mu = rs.uniform(-0.5, 0.5, size=(B, H, h, w, 3)).astype(np.float32)
        obs = rs.uniform(-0.5, 0.5, size=(B, H, h, w, 3)).astype(np.float32)
        rew_logits = rs.normal(size=(B, H - 1, K)).astype(np.float32)
        cont_logits = rs.normal(size=(B, H - 1)).astype(np.float32)
        rewards = rs.normal(size=(B, H)).astype(np.float32)
        conts = (rs.uniform(size=(B, H)) > 0.2).astype(np.float32)

        buckets = bucket_values(K)
        ours, metrics = wm_loss_terms(
            jnp.asarray(post), jnp.asarray(prior), jnp.asarray(dec_mu),
            jnp.asarray(rew_logits), jnp.asarray(cont_logits), jnp.asarray(obs),
            jnp.asarray(rewards), jnp.asarray(conts), buckets, cfg)

        ref_total, ref_pred, ref_kl = torch_wm_loss(
            post, prior, dec_mu, rew_logits, cont_logits, obs, rewards, conts,
            np.asarray(buckets), (cfg.wm.beta_pred, cfg.wm.beta_dyn, cfg.wm.beta_rep), H)

        assert float(ours) == pytest.approx(float(ref_total), rel=1e-4)
        assert float(metrics["wm/loss_pred"]) == pytest.approx(float(ref_pred), rel=1e-4)
        assert float(metrics["wm/kl_dyn"]) == pytest.approx(float(ref_kl), rel=1e-4)

    def test_all_masked_out(self):
        # conts all zero -> mask kills prediction terms; denom ~ 1e-5 guard
        B, H, R, C, K = 2, 4, 3, 3, 15
        import dataclasses

        cfg = DreamerConfig()
        cfg = dataclasses.replace(
            cfg,
            wm=dataclasses.replace(cfg.wm, latent_rows=R, latent_classes=C,
                                   reward_buckets=K, obs_size=(4, 4)),
            train=dataclasses.replace(cfg.train, horizon=H))
        z = np.zeros
        total, metrics = wm_loss_terms(
            jnp.asarray(z((B, H, R, C), np.float32)),
            jnp.asarray(z((B, H, R, C), np.float32)),
            jnp.asarray(z((B, H, 4, 4, 3), np.float32)),
            jnp.asarray(z((B, H - 1, K), np.float32)),
            jnp.asarray(z((B, H - 1), np.float32)),
            jnp.asarray(z((B, H, 4, 4, 3), np.float32)),
            jnp.asarray(z((B, H), np.float32)),
            jnp.asarray(z((B, H), np.float32)),
            bucket_values(K), cfg)
        # prediction loss 0/1e-5 = 0; KLs 0 -> floored at free_bits=1
        assert float(total) == pytest.approx(
            cfg.wm.beta_dyn * 1.0 + cfg.wm.beta_rep * 1.0, rel=1e-5)


class TestACLossParity:
    def test_actor_critic_formulas_match_torch(self):
        """Agent.py:96-135 actor/critic loss math on shared synthetic
        trajectories (log-prob, advantage scaling, entropy, twohot critic CE)."""
        rs = np.random.RandomState(1)
        B, H, A, K = 4, 6, 3, 31
        mu = rs.normal(scale=0.5, size=(B, H, A)).astype(np.float32)
        sigma = rs.uniform(0.2, 1.0, size=(B, H, A)).astype(np.float32)
        actions = np.tanh(rs.normal(size=(B, H, A))).astype(np.float32)
        R_lambda = rs.normal(scale=2.0, size=(B, H)).astype(np.float32)
        baseline_v = rs.normal(scale=2.0, size=(B, H)).astype(np.float32)
        critic_logits = rs.normal(size=(B, H, K)).astype(np.float32)
        S = 2.5
        nu = 3e-4

        # ---- ours (same ops as AgentTrainer.ac_loss) ----
        from dreamer_tpu.core.dists import tanh_normal_logprob
        from dreamer_tpu.core.math import symlog, twohot

        logp = tanh_normal_logprob(jnp.asarray(actions), jnp.asarray(mu),
                                   jnp.asarray(sigma))
        adv = jnp.asarray(R_lambda - baseline_v)
        norm = max(S, 1.0)
        entropy = -logp
        loss_actor = jnp.mean(-logp * (adv / norm) - nu * entropy)

        buckets = bucket_values(K)
        th = twohot(symlog(jnp.asarray(R_lambda)), buckets)
        import jax

        logp_v = jax.nn.log_softmax(jnp.asarray(critic_logits), axis=-1)
        loss_critic = jnp.mean(-jnp.sum(th * logp_v, axis=-1))

        # ---- torch port of Agent.py:110-135 ----
        base = torch.distributions.Normal(torch.tensor(mu), torch.tensor(sigma))
        dist = torch.distributions.TransformedDistribution(
            base, [torch.distributions.TanhTransform()])
        a_cl = torch.clamp(torch.tensor(actions), -1 + 1e-6, 1 - 1e-6)
        t_logp = dist.log_prob(a_cl).sum(-1)
        t_entropy = -t_logp
        t_adv = torch.tensor(R_lambda - baseline_v) / norm
        t_loss_actor = torch.mean(-t_logp * t_adv - nu * t_entropy)

        t_sym = torch.sign(torch.tensor(R_lambda)) * torch.log1p(
            torch.abs(torch.tensor(R_lambda)))
        t_th = torch_to_twohot(t_sym.unsqueeze(-1), torch.linspace(-20, 20, K))
        t_logp_v = torch.nn.functional.log_softmax(torch.tensor(critic_logits), dim=-1)
        t_loss_critic = torch.mean(-torch.sum(t_th * t_logp_v, dim=-1))

        assert float(loss_actor) == pytest.approx(float(t_loss_actor), rel=1e-4)
        assert float(loss_critic) == pytest.approx(float(t_loss_critic), rel=1e-4)
