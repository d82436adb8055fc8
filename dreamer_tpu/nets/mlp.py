"""The LayerNorm-SiLU MLP block used by every head in the reference.

Pattern (e.g. DynamicsPredictors.py:15-23): [Dense -> LayerNorm -> SiLU] per
hidden layer, then a final Dense with no norm/activation.  LayerNorm epsilon
matches torch's default 1e-5.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    dtype: Any = jnp.float32
    out_kernel_init: Any = None  # override for e.g. the zero-init actor mu head

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for width in self.hidden:
            x = nn.Dense(width, dtype=self.dtype, name=None)(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.silu(x)
        kwargs = {}
        if self.out_kernel_init is not None:
            kwargs["kernel_init"] = self.out_kernel_init
        return nn.Dense(self.out, dtype=self.dtype, **kwargs)(x)
