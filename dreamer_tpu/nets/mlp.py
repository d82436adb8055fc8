"""The LayerNorm-SiLU MLP block used by every head in the reference.

Pattern (e.g. DynamicsPredictors.py:15-23): [Dense -> LayerNorm -> SiLU] per
hidden layer, then a final Dense with no norm/activation.  LayerNorm epsilon
matches torch's default 1e-5.

``ln_silu_trunk`` is the shared hidden-layer stack; calling it inside a
module's ``@nn.compact`` scope registers the Dense/LayerNorm params under the
caller with the standard auto-names, so Actor/Critic/MLP all share one
definition without changing parameter-tree layouts.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def ln_silu_trunk(x: jnp.ndarray, widths: Sequence[int], dtype: Any) -> jnp.ndarray:
    """[Dense -> LayerNorm(eps=1e-5) -> SiLU] per width, in the caller's scope."""
    for width in widths:
        x = nn.Dense(width, dtype=dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dtype)(x)
        x = nn.silu(x)
    return x


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    dtype: Any = jnp.float32
    out_kernel_init: Any = None  # override for e.g. the zero-init actor mu head

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ln_silu_trunk(x, self.hidden, self.dtype)
        kwargs = {}
        if self.out_kernel_init is not None:
            kwargs["kernel_init"] = self.out_kernel_init
        return nn.Dense(self.out, dtype=self.dtype, **kwargs)(x)
