"""Cheap dropout masks for the training hot path.

`jax.random.bernoulli` draws 32 random bits per element and converts to
float before comparing. Dropout needs far less entropy: `keep_mask` draws
16 bits per element and compares against `round(keep_prob * 65536)` as
integers. At the reference step shapes (~2.6G draws/step — train-mode
dropout runs inside the frozen towers, reference-effective behavior) mask
generation measures 62 ms (threefry/bernoulli) / 36 ms (rbg/bernoulli) on
v5e; halving the generated bits roughly halves the rbg cost.

The effective keep probability is quantized to 1/65536 (e.g. 0.9 ->
58982/65536 = 0.89999390) — a 7e-6 absolute deviation, orders of magnitude
below any statistically observable effect and below torch-vs-jax RNG
differences that exist anyway (no bitwise dropout parity is possible
across frameworks; only the distribution matters).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["keep_mask"]


def keep_mask(rng: jax.Array, keep_prob: float, shape) -> jnp.ndarray:
    """Boolean keep mask ~ Bernoulli(keep_prob), 16 random bits/element."""
    thresh = int(round(float(keep_prob) * 65536.0))
    if thresh >= 65536:
        return jnp.ones(shape, bool)
    if thresh <= 0:
        return jnp.zeros(shape, bool)
    bits = jax.random.bits(rng, shape, dtype=jnp.uint16)
    return bits < jnp.uint16(thresh)
