"""Cheap dropout masks for the training hot path.

`jax.random.bernoulli` draws 32 random bits per element and converts to
float before comparing. Dropout needs far less entropy. At the reference
step shapes (~2.6G draws/step — train-mode dropout runs inside the frozen
towers, reference-effective behavior) mask generation measures 62 ms
(threefry/bernoulli) / 36 ms (rbg/bernoulli) on v5e, and the generated
random buffer itself round-trips through HBM; the RBG cost scales with the
bytes generated, so narrower draws are proportionally cheaper.

`keep_mask` therefore draws **8 bits per element** (default) and compares
against an integer threshold. A fixed 8-bit threshold would quantize the
keep probability to 1/256 (0.9 -> 230/256 = 0.898, a 1.6e-3 systematic
deviation), so the threshold is **dithered**: with `t = keep_prob * 256`,
the mask uses `floor(t)+1` with probability `frac(t)` (one scalar uint32
draw per call) and `floor(t)` otherwise, making the *marginal* keep
probability exactly `keep_prob` — tighter than the previous 16-bit fixed
threshold (0.9 -> 58982/65536 = 0.89999390). The only residual artifact is
an exchangeable within-call correlation of `frac(1-frac)/256^2 <= 3.8e-6`
between mask elements (they share the dithered scalar), orders of
magnitude below any statistically observable training effect and below
torch-vs-jax RNG differences that exist anyway (no bitwise dropout parity
is possible across frameworks; only the distribution matters).

`set_mask_bits(16)` restores the round-2 16-bit fixed-threshold masks
(config: `trainer.dropout_mask_bits`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["keep_mask", "set_mask_bits", "get_mask_bits"]

_mask_bits = 8


def set_mask_bits(bits: int) -> None:
    """Set the module-wide random-bit width for dropout masks (8 or 16).

    Read at trace time; configured from `trainer.dropout_mask_bits`.
    """
    global _mask_bits
    if bits not in (8, 16):
        raise ValueError(f"dropout_mask_bits must be 8 or 16, got {bits}")
    _mask_bits = bits


def get_mask_bits() -> int:
    return _mask_bits


def keep_mask(rng: jax.Array, keep_prob: float, shape, bits=None) -> jnp.ndarray:
    """Boolean keep mask ~ Bernoulli(keep_prob) (exact marginal at 8 bits)."""
    kp = float(keep_prob)
    if kp >= 1.0:
        return jnp.ones(shape, bool)
    if kp <= 0.0:
        return jnp.zeros(shape, bool)
    bits = _mask_bits if bits is None else bits
    t = kp * 256.0
    if bits == 8 and t <= 254.0:
        lo = math.floor(t)
        frac = t - lo
        if frac < 1e-12:
            draws = jax.random.bits(rng, shape, dtype=jnp.uint8)
            return draws < jnp.uint8(lo)
        r_dither, r_mask = jax.random.split(rng)
        # dithered threshold: lo+1 w.p. frac, lo otherwise -> E[thresh]/256
        # = keep_prob exactly (frac quantized to 1/2^32: deviation < 1e-12)
        u = jax.random.bits(r_dither, (), dtype=jnp.uint32)
        bump = (u < jnp.uint32(int(round(frac * 4294967296.0)))).astype(jnp.uint8)
        thresh = jnp.uint8(lo) + bump
        draws = jax.random.bits(r_mask, shape, dtype=jnp.uint8)
        return draws < thresh
    # 16-bit fixed threshold (also the fallback for keep_prob > 254/256,
    # where the dithered 8-bit threshold could overflow uint8)
    thresh16 = int(round(kp * 65536.0))
    if thresh16 >= 65536:
        return jnp.ones(shape, bool)
    if thresh16 <= 0:
        return jnp.zeros(shape, bool)
    draws = jax.random.bits(rng, shape, dtype=jnp.uint16)
    return draws < jnp.uint16(thresh16)
