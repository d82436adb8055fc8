"""GRU cell with torch ``nn.GRUCell`` gate semantics (SequenceModel.py:13-24).

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh  (W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

Note this differs from flax's built-in GRUCell (which applies the candidate
bias differently), so we implement our own.  Parameters are stored as two
fused kernels — ``(in, 3H)`` and ``(H, 3H)`` with gate order (r, z, n) — so a
single MXU matmul computes all three gates, and the fused Pallas kernel
(dreamer_tpu.ops.gru_pallas) can consume them directly.

Init matches torch GRUCell: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_gru_init(hidden_dim: int):
    bound = 1.0 / (hidden_dim ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gru_cell_core(
    x: jnp.ndarray,
    h: jnp.ndarray,
    wi: jnp.ndarray,
    wh: jnp.ndarray,
    bi: jnp.ndarray,
    bh: jnp.ndarray,
) -> jnp.ndarray:
    """Pure functional GRU step (shared by the XLA path and as the Pallas
    reference for equivalence tests).  x: (B, in), h: (B, H) -> (B, H)."""
    gi = x @ wi + bi
    gh = h @ wh + bh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class GRUCell(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        init = _torch_gru_init(self.hidden_dim)
        wi = self.param("kernel_i", init, (in_dim, 3 * self.hidden_dim))
        wh = self.param("kernel_h", init, (self.hidden_dim, 3 * self.hidden_dim))
        bi = self.param("bias_i", init, (3 * self.hidden_dim,))
        bh = self.param("bias_h", init, (3 * self.hidden_dim,))
        x = x.astype(self.dtype)
        h = h.astype(self.dtype)
        wi, wh, bi, bh = (p.astype(self.dtype) for p in (wi, wh, bi, bh))
        if self.use_pallas:
            from dreamer_tpu.ops.gru_pallas import gru_cell_pallas

            out = gru_cell_pallas(x, h, wi, wh, bi, bh)
        else:
            out = gru_cell_core(x, h, wi, wh, bi, bh)
        return out.astype(self.dtype)
