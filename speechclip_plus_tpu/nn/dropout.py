"""Dropout on narrow-bit keep masks (`ops/random.keep_mask`).

Measured motivation in ops/random.py: mask generation was ~13% of the
hybrid+ train step with 32-bit bernoulli draws; masks default to 8 random
bits per element with a dithered threshold (exact marginal keep prob).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.random import keep_mask

__all__ = ["FastDropout"]


class FastDropout(nn.Module):
    """`nn.Dropout` drop-in: param-free, same "dropout" rng collection."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = keep_mask(self.make_rng("dropout"), 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros((), x.dtype))
