"""Pooling layers kept for API/checkpoint compatibility.

Reference: ``avssl/module/pooling.py`` — `MeanPoolingLayer` (:8-61,
length-aware mean with optional pre/post linear projections) and
`AttentivePoolingLayer` (:64-390, learnable-U bilinear alignment with
max+softmax pooling; paired, batched-cross and gallery variants). Exported by
the reference's module package but unused on the current KWClip path — kept
so users migrating code that relies on them find equivalents.

Layout note: the reference uses (B, D, T); here everything is (B, T, D)
(TPU-native channel-last). The math is identical.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["MeanPoolingLayer", "AttentivePoolingLayer"]

_NEG_INF = -1e30


class MeanPoolingLayer(nn.Module):
    """Length-aware mean pooling with optional pre/post projections."""

    in_dim: int = 0
    out_dim: int = 0
    bias: bool = True
    pre_proj: bool = True
    post_proj: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_len: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if self.in_dim > 0 and self.out_dim > 0 and self.pre_proj:
            x = nn.Dense(self.out_dim, use_bias=self.bias, name="pre_proj")(x)
        if x_len is not None:
            t = jnp.arange(x.shape[1])[None, :, None]
            m = (t < x_len[:, None, None]).astype(x.dtype)
            x = (x * m).sum(axis=1) / jnp.maximum(
                x_len.astype(x.dtype)[:, None], 1.0
            )
        else:
            x = x.mean(axis=1)
        if self.in_dim > 0 and self.out_dim > 0 and self.post_proj:
            x = nn.Dense(self.out_dim, use_bias=self.bias, name="post_proj")(x)
        return x


class AttentivePoolingLayer(nn.Module):
    """Bilinear attentive pooling between two modalities.

    `__call__` pools paired batches; `batch_forward` crosses every A with
    every B; `cal_batch_embedding` pools A against a (N, D) gallery."""

    dim_A: int
    dim_B: int
    degraded: bool = False

    def setup(self):
        if self.degraded:
            assert self.dim_A == self.dim_B
            self.U = jnp.eye(self.dim_A)  # fixed identity, not a param
        else:
            self.U = self.param(
                "U", nn.initializers.normal(1.0), (self.dim_A, self.dim_B)
            )

    @staticmethod
    def generate_input_msk(
        input_A_lens: Optional[jnp.ndarray] = None,
        input_B_lens: Optional[jnp.ndarray] = None,
        max_Alen: int = 1,
        max_Blen: int = 1,
    ) -> jnp.ndarray:
        """(B, max_Alen, max_Blen) additive mask, -inf at padding."""
        assert input_A_lens is not None or input_B_lens is not None
        bsz = (input_A_lens if input_A_lens is not None else input_B_lens).shape[0]
        msk = jnp.zeros((bsz, max_Alen, max_Blen))
        if input_A_lens is not None:
            pa = jnp.arange(max_Alen)[None, :, None] >= input_A_lens[:, None, None]
            msk = jnp.where(pa, _NEG_INF, msk)
        if input_B_lens is not None:
            pb = jnp.arange(max_Blen)[None, None, :] >= input_B_lens[:, None, None]
            msk = jnp.where(pb, _NEG_INF, msk)
        return msk

    def __call__(
        self,
        input_A: jnp.ndarray,  # (B, Ta, Da)
        input_B: jnp.ndarray,  # (B, Tb, Db)
        input_msk: Optional[jnp.ndarray] = None,  # (B, Ta, Tb) additive
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        align = jnp.tanh(
            jnp.einsum("btd,de,bse->bts", input_A, self.U, input_B)
        )
        if input_msk is not None:
            align = align + input_msk
        score_A = nn.softmax(align.max(axis=2), axis=-1)  # (B, Ta)
        score_B = nn.softmax(align.max(axis=1), axis=-1)  # (B, Tb)
        out_A = jnp.einsum("btd,bt->bd", input_A, score_A)
        out_B = jnp.einsum("bsd,bs->bd", input_B, score_B)
        return out_A, out_B

    def batch_forward(
        self,
        input_A: jnp.ndarray,  # (Na, Ta, Da)
        input_B: jnp.ndarray,  # (Nb, Tb, Db)
        input_msk: Optional[jnp.ndarray] = None,  # (Na, Ta, Tb)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        align = jnp.tanh(
            jnp.einsum("atd,de,bse->abts", input_A, self.U, input_B)
        )
        if input_msk is not None:
            align = align + input_msk[:, None, :, :]
        score_A = nn.softmax(align.max(axis=3), axis=-1)  # (Na, Nb, Ta)
        score_B = nn.softmax(align.max(axis=2), axis=-1)  # (Na, Nb, Tb)
        out_A = jnp.einsum("atd,abt->abd", input_A, score_A)
        out_B = jnp.einsum("bsd,abs->abd", input_B, score_B)
        return out_A, out_B

    def cal_batch_embedding(
        self,
        input_A: jnp.ndarray,  # (B, Ta, Da)
        input_B: jnp.ndarray,  # (N, Db) gallery vectors
        input_msk: Optional[jnp.ndarray] = None,  # (B, Ta, 1)
    ) -> jnp.ndarray:
        align = jnp.tanh(
            jnp.einsum("btd,de,ne->btn", input_A, self.U, input_B)
        )
        if input_msk is not None:
            align = align + input_msk
        score = nn.softmax(align, axis=1)  # over Ta
        return jnp.einsum("btd,btn->bdn", input_A, score)
