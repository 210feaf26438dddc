"""Length/padding mask utilities (pure jnp; jit-safe, static shapes).

Reference semantics: ``avssl/util/data_utils.py:6-22`` and
``avssl/module/cif.py:14-21`` — boolean key-padding mask with True = PAD.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["key_padding_mask", "valid_mask", "lengths_from_mask"]


def key_padding_mask(max_length: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """Boolean (B, max_length) mask, True at padded positions (i >= length)."""
    pos = jnp.arange(max_length, dtype=jnp.int32)[None, :]
    return pos >= lengths.astype(jnp.int32)[:, None]


def valid_mask(max_length: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """Boolean (B, max_length) mask, True at valid positions (i < length)."""
    return ~key_padding_mask(max_length, lengths)


def lengths_from_mask(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """Recover lengths from a key-padding mask (True = pad)."""
    return (~pad_mask).sum(axis=-1).astype(jnp.int32)
