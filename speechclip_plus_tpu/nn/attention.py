"""Multi-head attention core with torch-parity parameterization.

Used by the branch transformers (reference
``avssl/module/kw_modules/TransformerModels.py``) and the HuBERT / CLIP
towers. Parameters mirror torch's nn.MultiheadAttention packed-QKV layout so
released checkpoints import 1:1.

The attention math runs through a single fused XLA path by default (softmax
over the scaled score matrix, all shapes static, key-padding handled as an
additive bias so there is no data-dependent control flow). A Pallas
flash-attention kernel can be enabled for long sequences via
``speechclip_plus_tpu.nn.flash`` (falls back automatically off-TPU).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MultiheadAttention", "dot_product_attention"]

_MASK_VALUE = -1e30


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    return_weights: bool = False,
):
    """Scaled dot-product attention.

    Args:
      q, k, v: (B, H, T, Dh).
      bias: additive attention bias broadcastable to (B, H, Tq, Tk)
        (e.g. -inf at padded keys, causal mask).
    """
    dh = q.shape[-1]
    # scale q before the matmul (torch MultiheadAttention does the same);
    # avoids an elementwise pass over the (B,H,Tq,Tk) score tensor
    q = q * jnp.asarray(1.0 / jnp.sqrt(jnp.float32(dh)), q.dtype)
    # bf16 towers: keep the score buffer bf16 — it is the largest
    # activation of the layer ((B,H,T,T): 630 MB/layer fp32 at the
    # reference shapes) and fp32 materialization makes the stack
    # bandwidth-bound. The MXU still accumulates fp32 internally and the
    # softmax runs fp32 (fused upcast); only the HBM round trip narrows.
    # Matches the reference's effective precision: torch fp16 autocast
    # produces fp16 score matrices. fp32 inputs keep fp32 scores, so
    # torch-parity oracles are bit-comparable.
    score_t = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=score_t)
    scores = scores.astype(jnp.float32)
    if bias is not None:
        scores = scores + bias
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        from ..ops.random import keep_mask

        keep = keep_mask(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights_d = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    else:
        weights_d = weights
    out = jnp.einsum("bhqk,bhkd->bhqd", weights_d, v)
    if return_weights:
        return out, weights
    return out


class _ProjParams(nn.Module):
    """kernel/bias pair with nn.Dense's exact tree and init (param holder:
    both the XLA and fused-kernel paths read the same parameters)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.in_features, self.features),
            ),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention parity (packed in_proj + out_proj).

    Parameter shapes (transposed to JAX (in, out) kernel convention):
      in_proj/kernel (D, 3D), in_proj/bias (3D,),
      out_proj/kernel (D, D), out_proj/bias (D,).

    `fused_block_vjp` routes self-attention through the differentiable
    fused block kernel (nn/fused_attention_block_vjp.py) — identical math,
    full gradients, no (B,H,T,T) HBM tensors; falls back to the XLA path
    off-TPU, for cross-attention, and for attention-map extraction.
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    fused_block_vjp: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        D, H = self.d_model, self.nhead
        assert D % H == 0
        dh = D // H
        w3, b3 = _ProjParams(D, 3 * D, name="in_proj")()
        wo3, bo3 = _ProjParams(D, D, name="out_proj")()
        dt = self.dtype

        B, Tq, _ = query.shape
        Tk = key.shape[1]

        use_fused = (
            self.fused_block_vjp
            and query is key and key is value
            and not return_weights
            and (attn_mask is None or attn_mask.ndim == 2)
        )
        if use_fused:
            from .fused_attention_block_vjp import fused_attention_block_vjp

            kp_bias = None
            if key_padding_mask is not None:
                kp_bias = jnp.where(
                    key_padding_mask, _MASK_VALUE, 0.0
                ).astype(jnp.float32)
            dropout_rng = None
            if self.dropout > 0.0 and not deterministic:
                dropout_rng = self.make_rng("dropout")
            return fused_attention_block_vjp(
                query,
                w3[:, :D], b3[:D], w3[:, D:2 * D], b3[D:2 * D],
                w3[:, 2 * D:], b3[2 * D:], wo3, bo3,
                kp_bias,
                n_heads=H,
                dropout_rate=self.dropout,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
                dtype=dt,
                attn_bias=attn_mask,
            )

        # nn.Dense-equivalent promotion: params and inputs cast to dtype
        w3c, b3c = w3.astype(dt), b3.astype(dt)
        if query is key and key is value:
            qkv = query.astype(dt) @ w3c + b3c
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            wq, wk, wv = jnp.split(w3c, 3, axis=1)
            bq, bk, bv = jnp.split(b3c, 3, axis=0)
            q = query.astype(dt) @ wq + bq
            k = key.astype(dt) @ wk + bk
            v = value.astype(dt) @ wv + bv

        def split_heads(x, T):
            return x.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q, Tq), split_heads(k, Tk), split_heads(v, Tk)

        bias = None
        if key_padding_mask is not None:
            # True = pad -> -inf at those keys
            bias = jnp.where(
                key_padding_mask[:, None, None, :], _MASK_VALUE, 0.0
            ).astype(jnp.float32)
        if attn_mask is not None:
            am = attn_mask.astype(jnp.float32)
            am = am.reshape((1,) * (4 - am.ndim) + am.shape)
            bias = am if bias is None else bias + am

        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        out = dot_product_attention(
            q,
            k,
            v,
            bias=bias,
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            return_weights=return_weights,
        )
        if return_weights:
            out, weights = out
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
        out = out @ wo3.astype(dt) + bo3.astype(dt)
        if return_weights:
            return out, weights
        return out
