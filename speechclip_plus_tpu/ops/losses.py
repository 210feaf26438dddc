"""Contrastive objectives as pure, jit-safe functions.

Reference semantics: ``avssl/module/losses.py``:
  - MaskedContrastiveLoss (``losses.py:129-245``): symmetric InfoNCE over the
    B x B similarity matrix with an id-aware negative mask (captions of the
    same image are not negatives), optional margin / decoupled (DCL) variant,
    temperature either fixed (multiplier = 1/T) or trainable as log(1/T).
  - SupConLoss (``losses.py:8-123``).

TPU-native differences: pure functions over arrays (parameters passed in,
suitable for pjit/shard_map), and numerically-stable log-sum-exp (identical
value in exact arithmetic; the reference exponentiates raw logits).

For multi-chip data parallelism, call these on features/ids that were
all-gathered across the batch axis so in-batch negatives span all devices
(the reference realizes this with the Lightning-DP training_step/step_end
split, ``avssl/model/kwClip.py:145-193``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "masked_contrastive_loss",
    "contrastive_temperature",
    "supcon_loss",
    "quantity_l1_loss",
]

_NEG_INF = -1e30


def contrastive_temperature(
    log_inv_temp: Optional[jnp.ndarray],
    temperature: float = 0.07,
    trainable: bool = True,
) -> jnp.ndarray:
    """Logit multiplier: exp(log(1/T)) if trainable else 1/T."""
    if trainable:
        assert log_inv_temp is not None
        return jnp.exp(log_inv_temp)
    return jnp.asarray(1.0 / temperature, dtype=jnp.float32)


def _masked_logsumexp(logits: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """log(sum(exp(logits) * mask)) along ``axis`` with max-subtraction."""
    masked = jnp.where(mask, logits, _NEG_INF)
    m = jax.lax.stop_gradient(jnp.max(masked, axis=axis, keepdims=True))
    out = jnp.log(jnp.sum(jnp.exp(masked - m), axis=axis)) + jnp.squeeze(m, axis=axis)
    return out


def masked_contrastive_loss(
    feat_a: jnp.ndarray,
    feat_b: jnp.ndarray,
    ids: Optional[jnp.ndarray] = None,
    *,
    logit_scale: jnp.ndarray,
    margin: float = 0.0,
    dcl: bool = False,
    a2b: bool = True,
    b2a: bool = True,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric InfoNCE with id-aware negative masking.

    Args:
      feat_a: (B, D) L2-normalized features of modality A (e.g. audio).
      feat_b: (B, D) L2-normalized features of modality B (e.g. image).
      ids: (B,) pair ids; entries with equal id are never used as negatives
        (reference ``losses.py:203-216``). None -> only the diagonal excluded.
      logit_scale: scalar multiplier on the similarity matrix.
      margin: subtracted from positive logits.
      dcl: decoupled contrastive learning (positives left out of denominator).
      a2b / b2a: which classification directions to include.
      valid: optional (B,) bool; False rows/cols are excluded entirely (for
        padded final batches - a TPU static-shape addition, None = reference).

    Returns:
      Scalar loss (float32).
    """
    assert feat_a.shape == feat_b.shape, (feat_a.shape, feat_b.shape)
    assert a2b or b2a, "Cannot set both a2b and b2a to False."
    B = feat_a.shape[0]

    eye = jnp.eye(B, dtype=bool)
    if ids is not None:
        idx = ids.reshape(B, 1)
        neg_mask = idx != idx.T
    else:
        neg_mask = ~eye
    if not dcl:
        neg_mask = neg_mask | eye
    neg_mask = jax.lax.stop_gradient(neg_mask)

    if valid is not None:
        pair_valid = valid[:, None] & valid[None, :]
        neg_mask = neg_mask & pair_valid
        denom = jnp.maximum(valid.sum(), 1).astype(jnp.float32)
    else:
        denom = jnp.float32(B)

    logits = (
        jnp.matmul(
            feat_a.astype(jnp.float32),
            feat_b.astype(jnp.float32).T,
            precision=jax.lax.Precision.HIGHEST,
        )
        * logit_scale
    )
    if margin > 0.0:
        logits = logits - margin * eye.astype(logits.dtype)

    pos_logits = jnp.diagonal(logits)
    loss = jnp.float32(0.0)
    n_terms = 0
    if a2b:
        neg_a2b = _masked_logsumexp(logits, neg_mask, axis=1)
        per_row = -pos_logits + neg_a2b
        if valid is not None:
            per_row = jnp.where(valid, per_row, 0.0)
        loss = loss + per_row.sum() / denom
        n_terms += 1
    if b2a:
        neg_b2a = _masked_logsumexp(logits, neg_mask, axis=0)
        per_col = -pos_logits + neg_b2a
        if valid is not None:
            per_col = jnp.where(valid, per_col, 0.0)
        loss = loss + per_col.sum() / denom
        n_terms += 1
    return loss / n_terms


def supcon_loss(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    *,
    temperature: jnp.ndarray,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Supervised contrastive loss (reference ``losses.py:46-123``).

    Args:
      features: (B, n_views, D).
      labels: (B,) class labels (mutually exclusive with ``mask``).
      mask: (B, B) float, 1 where samples share a class.
      temperature: scalar divisor of logits (learnable in the reference).
      valid: (B,) bool; padded rows are excluded both as anchors and as
        contrasts (zero rows from static-shape collate / mesh-divisibility
        padding would otherwise enter as id-0 positives).
    """
    assert features.ndim == 3, "features must be [bsz, n_views, ...]"
    B, n_views = features.shape[:2]

    if labels is not None and mask is not None:
        raise ValueError("Cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(B, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast_feature = features.transpose(1, 0, 2).reshape(B * n_views, -1)
    if contrast_mode == "one":
        anchor_feature = features[:, 0]
        anchor_count = 1
    elif contrast_mode == "all":
        anchor_feature = contrast_feature
        anchor_count = n_views
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = (
        jnp.matmul(
            anchor_feature, contrast_feature.T, precision=jax.lax.Precision.HIGHEST
        )
        / temperature
    )
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    logits_mask = 1.0 - jnp.eye(B * anchor_count, B * n_views, dtype=jnp.float32)
    if valid is not None:
        v_contrast = jnp.tile(valid.astype(jnp.float32), n_views)
        logits_mask = logits_mask * v_contrast[None, :]
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(
        jnp.maximum(exp_logits.sum(axis=1, keepdims=True), 1e-12)
    )
    mean_log_prob_pos = (mask * log_prob).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1e-12)

    loss = -(1.0 / base_temperature) * mean_log_prob_pos
    per_anchor = loss.reshape(anchor_count, B)
    if valid is None:
        return per_anchor.mean()
    v = valid.astype(jnp.float32)
    return (per_anchor * v[None, :]).sum() / jnp.maximum(
        anchor_count * v.sum(), 1.0
    )


def quantity_l1_loss(
    quantity_out: jnp.ndarray,
    target_len: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CIF quantity loss: mean |sum(alpha) - target_len| (torch nn.L1Loss).

    `valid` (B,) restricts the mean to real rows so zero-padded batch rows
    (static-shape collate / mesh-divisibility padding) don't dilute it.
    """
    err = jnp.abs(quantity_out - target_len.astype(quantity_out.dtype))
    if valid is None:
        return err.mean()
    v = valid.astype(err.dtype)
    return (err * v).sum() / jnp.maximum(v.sum(), 1.0)
