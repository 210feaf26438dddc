"""Branch transformer blocks.

Reference semantics: ``avssl/module/kw_modules/TransformerModels.py``:
  - ``TransformerEncoder`` (:47-97): a stack of torch nn.TransformerEncoderLayer
    (post-norm by default, gelu FFN) plus a final LayerNorm, with
    ``extract_hidden_states`` returning the input and every layer output
    (pre-final-norm).
  - ``MultiheadAttentionAndNorm`` (:100-136): one MHA block + residual + LN,
    with ``extract_attention_map``.

Parameters mirror torch layouts so Lightning checkpoints import directly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiheadAttention
from ..ops.gelu import fast_gelu
from .dropout import FastDropout

__all__ = ["TransformerEncoderLayer", "TransformerEncoder", "MultiheadAttentionAndNorm"]

_ACT = {
    "relu": nn.relu,
    # exact erf gelu profile (torch F.gelu default, not the tanh
    # approximation); bf16 inputs take the polynomial fast path (ops/gelu)
    "gelu": fast_gelu,
}


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer parity (batch_first)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 3072
    dropout: float = 0.1
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_block_vjp: bool = False

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            fused_block_vjp=self.fused_block_vjp, name="self_attn"
        )
        norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")
        linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")
        linear2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        drop = lambda x: FastDropout(self.dropout)(x, deterministic=deterministic)
        act = _ACT[self.activation]

        def sa(x):
            return drop(
                attn(
                    x,
                    x,
                    x,
                    key_padding_mask=key_padding_mask,
                    attn_mask=attn_mask,
                    deterministic=deterministic,
                )
            )

        def ff(x):
            return drop(linear2(FastDropout(self.dropout)(act(linear1(x)), deterministic=deterministic)))

        if self.norm_first:
            src = src + sa(norm1(src))
            src = src + ff(norm2(src))
        else:
            src = norm1(src + sa(src))
            src = norm2(src + ff(src))
        return src


class TransformerEncoder(nn.Module):
    """Stack of encoder layers + final LayerNorm (reference TransformerModels.py:47-97)."""

    n_layers: int = 1
    d_model: int = 768
    nhead: int = 8
    dim_feedforward: int = 3072
    dropout: float = 0.1
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_block_vjp: bool = False

    def setup(self):
        self.layers = [
            TransformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                activation=self.activation,
                layer_norm_eps=self.layer_norm_eps,
                norm_first=self.norm_first,
                dtype=self.dtype,
                fused_block_vjp=self.fused_block_vjp,
                name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]
        # reference wraps the stack with LayerNorm(d_model, eps=1e-5)
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")

    def __call__(
        self,
        src: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = src
        for layer in self.layers:
            x = layer(x, key_padding_mask=key_padding_mask, deterministic=deterministic)
        return self.final_norm(x)

    def extract_hidden_states(
        self,
        src: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ...]:
        """All hidden states: (input, after layer 1, ..., after layer N),
        pre-final-norm (reference ``nnTransformerEncoder.extract_hidden_states``)."""
        hidden = [src]
        x = src
        for layer in self.layers:
            x = layer(x, key_padding_mask=key_padding_mask, deterministic=deterministic)
            hidden.append(x)
        return tuple(hidden)


class MultiheadAttentionAndNorm(nn.Module):
    """One MHA + residual + LayerNorm (reference TransformerModels.py:100-136)."""

    d_model: int = 768
    nhead: int = 8
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    fused_block_vjp: bool = False

    def setup(self):
        self.multihead_attn_layer = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, dtype=self.dtype,
            fused_block_vjp=self.fused_block_vjp,
        )
        self.attentionBlock_Norm = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype
        )

    def __call__(
        self,
        src: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        out = self.multihead_attn_layer(
            src, src, src, key_padding_mask=key_padding_mask, deterministic=deterministic
        )
        return self.attentionBlock_Norm(out + src)

    def extract_hidden_states(
        self,
        src: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, ...]:
        return (src, self(src, key_padding_mask, deterministic))

    def extract_attention_map(
        self,
        src: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        out, weights = self.multihead_attn_layer(
            src,
            src,
            src,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic,
            return_weights=True,
        )
        return self.attentionBlock_Norm(out + src), weights
