"""MLP projection stack (reference ``avssl/module/projections.py:6-29``):
Linear/ReLU/Dropout repeated, with the trailing activation+dropout removed."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .dropout import FastDropout
import jax.numpy as jnp

__all__ = ["MLPLayers"]


class MLPLayers(nn.Module):
    units: Sequence[int]
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n = len(self.units) - 1
        for i in range(n):
            x = nn.Dense(self.units[i + 1], dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1:  # reference drops the trailing ReLU+Dropout
                x = nn.relu(x)
                x = FastDropout(self.dropout)(x, deterministic=deterministic)
        return x
