"""Lambda-returns and the percentile return-scale EMA.

- ``lambda_returns``: the backward recursion of Agent.py:156-172, vectorised
  as a single reversed ``lax.scan`` over time (the reference runs a Python
  loop building a list).
- ``update_return_scale``: EMA of the 5th-95th percentile range used to
  normalise advantages (Agent.py:78-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lambda_returns(
    values: jnp.ndarray,     # (B, T+1)  critic values for states 0..T
    rewards: jnp.ndarray,    # (B, T)    reward on transition t -> t+1
    continues: jnp.ndarray,  # (B, T)    continue prob/flag at step t
    gamma: float,
    lambda_: float,
) -> jnp.ndarray:
    """R_lambda over T steps; returns (B, T).

    Recursion (Agent.py:158-170):
      R_{T-1} = r_{T-1} + gamma * c_{T-1} * V_T
      R_t     = r_t + gamma * c_t * ((1-lambda) * V_{t+1} + lambda * R_{t+1})
    """
    v_next = values[:, 1:]                      # (B, T): V_{t+1}
    bootstrap = rewards[:, -1] + gamma * continues[:, -1] * values[:, -1]

    def step(carry, inputs):
        r_t, c_t, v_tp1 = inputs
        ret = r_t + gamma * c_t * ((1.0 - lambda_) * v_tp1 + lambda_ * carry)
        return ret, ret

    # Scan backwards over t = T-2 .. 0; the last step's return is the bootstrap.
    xs = (
        rewards[:, :-1].T,     # (T-1, B)
        continues[:, :-1].T,
        v_next[:, :-1].T,      # V_{t+1} for t = 0..T-2
    )
    _, rets_rev = jax.lax.scan(step, bootstrap, xs, reverse=True)
    return jnp.concatenate([rets_rev.T, bootstrap[:, None]], axis=1)


def update_return_scale(s: jnp.ndarray, returns: jnp.ndarray, smoothing: float = 0.99) -> jnp.ndarray:
    """EMA of max(P95 - P05, 1) over the flattened lambda-returns.

    Reference: Agent.py:78-88.  If the returns contain NaN/Inf the update is
    skipped (the reference early-returns); implemented with jnp.where so it
    stays jittable.
    """
    flat = jax.lax.stop_gradient(returns).reshape(-1).astype(jnp.float32)
    finite = jnp.all(jnp.isfinite(flat))
    p95 = jnp.quantile(flat, 0.95)
    p05 = jnp.quantile(flat, 0.05)
    rng = jnp.maximum(p95 - p05, 1.0)
    alpha = 1.0 - smoothing
    new_s = (1.0 - alpha) * s + alpha * rng
    return jnp.where(finite, new_s, s)
