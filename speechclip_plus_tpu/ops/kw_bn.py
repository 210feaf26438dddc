"""Keyword BatchNorm: pull keyword embeddings into CLIP's token-embedding
distribution.

Reference semantics: ``avssl/module/speechclip_c_modules/kw_bn.py``:
  - ``Kw_BatchNorm`` (fixed K keywords): per-keyword BN (``eachKw``, optionally
    fused as one BN over K*D channels), or one shared BN over D (``same``),
    plus a length-aware flattened path.
  - ``Kw_BatchNorm_dynamic``: a single BatchNorm1d over D applied across all
    (batch, time) positions (including padding - mirrored deliberately).
  - gamma initialized to std(token_embedding) * std_scale, beta to
    mean(token_embedding) (``kw_bn.py:69-95``).

Implemented as pure functions with explicit (params, state) so they compose
with pjit; torch BatchNorm1d semantics: train-time batch stats (biased var in
the normalizer, unbiased var into the running average, momentum 0.1, eps 1e-5).
Under a global-view pjit step the batch statistics are computed over the
global batch automatically, matching the reference's DP behaviour.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "init_bn_params",
    "init_bn_state",
    "batch_norm_apply",
    "kw_bn_fixed",
    "kw_bn_dynamic",
]

BNParams = Dict[str, jnp.ndarray]  # {"scale", "bias"}
BNState = Dict[str, jnp.ndarray]  # {"mean", "var"}


def init_bn_params(init_bias: jnp.ndarray, init_scale: jnp.ndarray, std_scale: float = 1.0) -> BNParams:
    """gamma = init_scale * std_scale, beta = init_bias (reference init_bn)."""
    return {
        "scale": jnp.asarray(init_scale, jnp.float32) * std_scale,
        "bias": jnp.asarray(init_bias, jnp.float32),
    }


def init_bn_state(num_channels: int) -> BNState:
    return {
        "mean": jnp.zeros((num_channels,), jnp.float32),
        "var": jnp.ones((num_channels,), jnp.float32),
    }


def batch_norm_apply(
    x: jnp.ndarray,
    params: BNParams,
    state: BNState,
    *,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, BNState]:
    """torch BatchNorm1d over a (N, C) batch.

    ``sample_mask``: optional (N,) bool selecting which rows contribute to
    the statistics (length-aware flattened path, ``kw_bn.py:140-158``).
    """
    assert x.ndim == 2
    xf = x.astype(jnp.float32)
    if training:
        if sample_mask is not None:
            m = sample_mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(axis=0) / n
            var = (((xf - mean) ** 2) * m).sum(axis=0) / n
        else:
            n = jnp.float32(x.shape[0])
            mean = xf.mean(axis=0)
            var = xf.var(axis=0)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


def kw_bn_fixed(
    keywords: jnp.ndarray,
    params: BNParams,
    state: BNState,
    *,
    batchnorm_type: str = "eachKw",
    parallel: bool = True,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
    seq_lens: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, BNState]:
    """Fixed-K keyword BatchNorm (reference ``Kw_BatchNorm.forward``).

    Args:
      keywords: (B, K, D).
      params/state: channel layout depends on the variant:
        eachKw+parallel -> C = D*K (channel = d*K + k, the (B, D, K)-reshape
          layout; gamma init should tile std over K per channel - the
          reference initializes in a mismatched K*D layout, a quirk we fix
          while keeping the learnable semantics);
        eachKw (non-parallel) -> C = (K, D) leading axis per keyword;
        same -> C = D.
    """
    B, K, D = keywords.shape
    if batchnorm_type == "eachKw":
        if parallel:
            flat = keywords.transpose(0, 2, 1).reshape(B, D * K)
            y, new_state = batch_norm_apply(
                flat, params, state, training=training, momentum=momentum, eps=eps
            )
            y = y.reshape(B, D, K).transpose(0, 2, 1)
            return y, new_state
        # per-keyword BN: vmap over the keyword axis (params/state shaped (K, D))
        def one_kw(x_k, p_scale, p_bias, s_mean, s_var):
            return batch_norm_apply(
                x_k,
                {"scale": p_scale, "bias": p_bias},
                {"mean": s_mean, "var": s_var},
                training=training,
                momentum=momentum,
                eps=eps,
            )

        y, new_state = jax.vmap(one_kw, in_axes=(1, 0, 0, 0, 0), out_axes=(1, 0))(
            keywords,
            params["scale"],
            params["bias"],
            state["mean"],
            state["var"],
        )
        return y, new_state
    if batchnorm_type == "same":
        if seq_lens is None:
            flat = keywords.reshape(B * K, D)
            y, new_state = batch_norm_apply(
                flat, params, state, training=training, momentum=momentum, eps=eps
            )
            return y.reshape(B, K, D), new_state
        # length-aware: only valid positions contribute to stats and are
        # written back; padded positions keep their pre-BN values
        # (reference ``kw_bn.py:140-158``).
        pos = jnp.arange(K)[None, :]
        valid = pos < seq_lens[:, None]
        flat = keywords.reshape(B * K, D)
        y, new_state = batch_norm_apply(
            flat,
            params,
            state,
            training=training,
            momentum=momentum,
            eps=eps,
            sample_mask=valid.reshape(B * K),
        )
        y = jnp.where(valid.reshape(B * K, 1), y, flat).reshape(B, K, D)
        return y, new_state
    raise NotImplementedError(batchnorm_type)


def kw_bn_dynamic(
    keywords: jnp.ndarray,
    params: BNParams,
    state: BNState,
    *,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, BNState]:
    """Dynamic-keyword BatchNorm over D channels across all (B, T) positions
    (reference ``Kw_BatchNorm_dynamic.forward`` - deliberately unmasked)."""
    B, T, D = keywords.shape
    flat = keywords.reshape(B * T, D)
    y, new_state = batch_norm_apply(
        flat, params, state, training=training, momentum=momentum, eps=eps
    )
    return y.reshape(B, T, D), new_state
