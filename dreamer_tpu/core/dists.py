"""Distribution primitives: unimix categorical with straight-through sampling,
categorical KL, and the tanh-squashed Gaussian policy head.

Semantics mirror the reference exactly:
- 1% uniform mix + STE one-hot sample: VariationalAutoEncoder.py:88-98 and
  DynamicsPredictors.py:31-40.
- KL between categoricals from raw (pre-unimix) logits: WorldModel.py:175-183.
- tanh(Normal) policy with clamped log-sigma and softplus: Agent.py:191-210,
  log-prob with action clamped to +/-(1-1e-6): Agent.py:113-115.

All functions are pure and rely on explicit PRNG keys (the reference relies on
the torch global RNG; JAX requires key plumbing through every scan).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def unimix_probs(logits: jnp.ndarray, unimix: float = 0.01) -> jnp.ndarray:
    """softmax then mix 1% uniform to keep the categorical from collapsing.

    Reference: VariationalAutoEncoder.py:88-92 (and DynamicsPredictors.py:33-35).
    Computed in float32 regardless of input dtype (reference casts logits.float()).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    k = logits.shape[-1]
    return (1.0 - unimix) * probs + unimix / k


def sample_onehot_ste(probs: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Sample a one-hot from per-row categorical probs with the straight-through
    estimator: ``one_hot + probs - stop_grad(probs)``.

    Reference: VariationalAutoEncoder.py:94-98.  Gradient flows through the
    (unimixed) probs; the forward value is the exact one-hot sample.
    """
    idx = jax.random.categorical(key, jnp.log(probs), axis=-1)
    onehot = jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)
    return onehot + probs - jax.lax.stop_gradient(probs)


def categorical_kl(logits_p: jnp.ndarray, logits_q: jnp.ndarray) -> jnp.ndarray:
    """KL(P || Q) over the last axis from raw logits, in float32.

    Matches torch.distributions.kl_divergence(Categorical(logits=p),
    Categorical(logits=q)) used at WorldModel.py:175-181 — note the reference
    computes KL on the raw logits, NOT the unimixed probs.
    """
    lp = jax.nn.log_softmax(logits_p.astype(jnp.float32), axis=-1)
    lq = jax.nn.log_softmax(logits_q.astype(jnp.float32), axis=-1)
    return jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)


# --------------------------------------------------------------------------- #
# Tanh-squashed Gaussian policy
# --------------------------------------------------------------------------- #

_LOG_SIG_MIN = -5.0
_LOG_SIG_MAX = 2.0
_SIG_FLOOR = 1e-3
_ACTION_EPS = 1e-6


def actor_mu_sigma(mu_raw: jnp.ndarray, log_sig_raw: jnp.ndarray,
                   min_std: float = _SIG_FLOOR) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map raw actor head outputs to (mu, sigma).

    Reference: Agent.py:196-200 — log_sig clamped to [-5, 2], then
    sigma = softplus(log_sig) + 1e-3.  ``min_std`` generalises the reference's
    hard-coded 1e-3 floor: at the default the semantics are identical, while a
    larger floor (e.g. 0.1) guards against entropy collapse — with the 1e-3
    floor the stochastic policy can go near-deterministic and stop exploring
    permanently (observed in the round-1 long CarRacing run: single-sample
    entropy fell from +0.6 to -7 and the 308-peak policy collapsed to -70).
    """
    log_sig = jnp.clip(log_sig_raw, _LOG_SIG_MIN, _LOG_SIG_MAX)
    sigma = jax.nn.softplus(log_sig) + min_std
    return mu_raw, sigma


def tanh_normal_sample(mu: jnp.ndarray, sigma: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Reparameterised sample tanh(mu + sigma * eps) (Agent.py:207-209).

    Reparameterised exactly like torch's ``rsample`` so that pathwise
    gradients flow through the imagined dynamics (see SURVEY §3.4 note: the
    reference's dream runs outside no_grad, so actor backward passes through
    the frozen world model).
    """
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return jnp.tanh(mu + sigma * eps)


def tanh_normal_logprob(action: jnp.ndarray, mu: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """log pi(action) for the tanh-transformed Normal, summed over action dim.

    Matches torch TransformedDistribution(Normal, TanhTransform).log_prob with
    the action clamped to +/-(1 - 1e-6) first (Agent.py:113-115).  Uses torch's
    numerically-stable log|det J| = 2*(log 2 - x - softplus(-2x)) with
    x = atanh(action).
    """
    a = jnp.clip(action, -1.0 + _ACTION_EPS, 1.0 - _ACTION_EPS)
    x = jnp.arctanh(a)
    base_logprob = (
        -0.5 * jnp.square((x - mu) / sigma)
        - jnp.log(sigma)
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    log_det = 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))
    return jnp.sum(base_logprob - log_det, axis=-1)


def normal_entropy(sigma: jnp.ndarray) -> jnp.ndarray:
    """Analytic entropy of the UNSQUASHED diagonal Normal, summed over the
    action dim: sum_d 0.5*log(2*pi*e) + log(sigma_d).

    The reference's entropy bonus is the single-sample estimate
    -log pi(a) of the tanh-squashed density (Agent.py:124), whose value
    EXPLODES toward +inf as |a| -> 1 (the log|det J| term) — so near-saturated
    actions get a huge spurious bonus while sigma itself collapses.  DreamerV3
    (arXiv:2301.04104, eq. 6) regularises the base distribution's analytic
    entropy instead, which depends only on sigma and pulls it up directly.
    Used under agent.analytic_entropy (default off for reference parity).
    """
    return jnp.sum(0.5 * jnp.log(2.0 * jnp.pi * jnp.e) + jnp.log(sigma),
                   axis=-1)
