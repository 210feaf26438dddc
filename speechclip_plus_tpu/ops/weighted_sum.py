"""Learnable softmax-weighted sum over encoder hidden layers.

Reference semantics: ``avssl/module/weighted_sum.py:10-45`` — softmax over N
layer weights, optional pre-layernorm of features. TPU-native: one stacked
(L, B, T, D) tensor, a single fused einsum (no Python loop over layers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["weighted_sum", "layer_norm"]


def layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free layer norm over the last axis (torch F.layer_norm)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def weighted_sum(
    hidden_states: jnp.ndarray,
    weights: jnp.ndarray,
    normalize_features: bool = False,
) -> jnp.ndarray:
    """Softmax-weighted sum of stacked hidden states.

    Args:
      hidden_states: (L, ...) stacked layer activations (layer axis first).
      weights: (L,) learnable logits.
      normalize_features: layer-norm each feature vector before summing.

    Returns:
      (...) weighted sum over the layer axis.
    """
    assert hidden_states.shape[0] == weights.shape[0], (
        hidden_states.shape,
        weights.shape,
    )
    w = jax.nn.softmax(weights.astype(jnp.float32), axis=0)
    x = hidden_states
    if normalize_features:
        x = layer_norm(x)
    # einsum contracts the layer axis in one fused op on the VPU/MXU.
    w = w.astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    return (w * x).sum(axis=0)
