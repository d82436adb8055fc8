"""Scalar transforms and twohot encoding (reference: DreamerUtils.py:29-50).

All functions are pure jnp, shape-polymorphic and jit/vmap-safe.  ``twohot``
exploits the uniform bucket spacing to avoid ``searchsorted`` entirely — one
fused clip/floor plus two one-hots — which lowers to pure VPU code on TPU
instead of a gather-heavy binary search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def symlog(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * log(1 + |x|)  (reference: DreamerUtils.py:29-30)."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of symlog with input clamped to ±20 (reference: DreamerUtils.py:35-37)."""
    x = jnp.clip(x, -20.0, 20.0)
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def bucket_values(num_buckets: int, low: float = -20.0, high: float = 20.0) -> jnp.ndarray:
    """Uniform bucket centres, linspace(-20, 20, K) (reference: DynamicsPredictors.py:61)."""
    return jnp.linspace(low, high, num_buckets, dtype=jnp.float32)


def twohot(value: jnp.ndarray, buckets: jnp.ndarray) -> jnp.ndarray:
    """Twohot-encode ``value`` (shape ``(...,)``) over uniform ``buckets`` (K,).

    Returns shape ``(..., K)``.  Semantics match the reference
    (DreamerUtils.py:39-50): value clipped to bucket range, mass split between
    the two neighbouring buckets proportionally to distance.  Uses the uniform
    spacing to compute the lower index with a single floor instead of
    searchsorted.
    """
    k = buckets.shape[0]
    lo = buckets[0]
    step = (buckets[-1] - buckets[0]) / (k - 1)
    clipped = jnp.clip(value, buckets[0], buckets[-1])
    pos = (clipped - lo) / step
    lower = jnp.clip(jnp.floor(pos), 0, k - 2).astype(jnp.int32)
    lower_val = lo + lower.astype(clipped.dtype) * step
    # Same 1e-8 regulariser as the reference's (upper-lower+1e-8) denominator.
    weight = (clipped - lower_val) / (step + 1e-8)
    oh_lower = _one_hot_weighted(lower, 1.0 - weight, k)
    oh_upper = _one_hot_weighted(lower + 1, weight, k)
    return oh_lower + oh_upper


def _one_hot_weighted(idx: jnp.ndarray, weight: jnp.ndarray, k: int) -> jnp.ndarray:
    oh = jnp.eye(k, dtype=jnp.float32)[idx]
    return oh * weight[..., None].astype(jnp.float32)


def gaussian_log_probability(x: jnp.ndarray, mu: jnp.ndarray,
                             sigma: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Normal(mu, sigma) log-density of x.

    API-completeness port of the reference's unused helper
    (DreamerUtils.py:4-10); not used by the training path.
    """
    var = jnp.square(sigma)
    return -0.5 * (jnp.log(2.0 * jnp.pi * var) + jnp.square(x - mu) / var)


def bernoulli_log_probability(p: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Bernoulli(p) log-likelihood of outcome k, probabilities
    clamped away from 0 by 1e-8 (reference: DreamerUtils.py:12-16; unused
    there).  The clamp is applied to each log argument — in float32 the
    reference's ``p <= 1 - 1e-8`` clamp rounds back to 1.0 and still yields
    -inf at p=1, which we avoid."""
    eps = 1e-8
    return (k * jnp.log(jnp.clip(p, eps, 1.0))
            + (1.0 - k) * jnp.log(jnp.clip(1.0 - p, eps, 1.0)))


def gaussian_kl(mu_1: jnp.ndarray, sigma_1: jnp.ndarray,
                mu_2: jnp.ndarray, sigma_2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise KL(N(mu_1, sigma_1) || N(mu_2, sigma_2))
    (reference: DreamerUtils.py:18-27, its
    kullback_leibler_divergence_between_gaussians; unused there)."""
    var_1, var_2 = jnp.square(sigma_1), jnp.square(sigma_2)
    return (jnp.log(sigma_2 / sigma_1)
            + (var_1 + jnp.square(mu_1 - mu_2)) / (2.0 * var_2) - 0.5)


def twohot_expectation(logits: jnp.ndarray, buckets: jnp.ndarray) -> jnp.ndarray:
    """symexp(sum softmax(logits) * buckets) — decode a twohot head to a scalar.

    Matches RewardPredictor.predict (DynamicsPredictors.py:70-74) and
    Critic.value (Agent.py:237-241).  Keeps a trailing singleton dim like the
    reference's ``keepdim=True``.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    sym = jnp.sum(probs * buckets, axis=-1, keepdims=True)
    return symexp(sym)
