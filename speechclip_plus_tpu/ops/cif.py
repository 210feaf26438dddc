"""Continuous Integrate-and-Fire (CIF) downsampling, TPU-native.

Reference semantics: ``avssl/module/cif.py:24-311`` (CIF.integrate_and_fire):
accumulate per-frame alpha weights; every time the accumulator crosses the
threshold, "fire" an output vector that integrates the frames covered since
the previous fire, splitting boundary frames proportionally. The reference
implements this with cumsum + three scatter_add passes plus a Python loop for
multi-fire frames.

TPU-native formulation: firing bins are intervals [t*threshold, (t+1)*threshold)
on the alpha-cumsum axis, so the weight with which source frame s contributes
to output bin t is the overlap of [csum[s-1], csum[s]] with bin t:

    W[b, t, s] = clip(min(csum[s], (t+1)*thr) - max(csum[s-1], t*thr), 0, ...)

and the entire integrate-and-fire is one batched matmul ``W @ input`` on the
MXU - no scatter, no sequential loop, exact same result (incl. multi-fire
frames and the reference's right-index clipping, realized by giving the last
bin an open upper edge). Output length is statically MAX_FEAT_LEN (+1 tail
bin), the reference's own cap (``cif.py:11``), with explicit length masks.

Gradients flow through csum into W exactly as the reference's right/left
weights do (bin indices have zero gradient a.e.).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["MAX_FEAT_LEN", "integrate_and_fire", "scale_alpha"]

MAX_FEAT_LEN = 75  # reference avssl/module/cif.py:11


def scale_alpha(
    alpha: jnp.ndarray,
    target_lengths: Optional[jnp.ndarray],
    threshold: float = 1.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Train-time scaling so that sum(alpha) == threshold * target_len + eps
    (reference ``cif.py:127-129``)."""
    if target_lengths is None:
        return alpha
    alpha_sum = alpha.sum(axis=1, keepdims=True)
    desired = threshold * target_lengths.astype(alpha.dtype)[:, None] + eps
    return alpha * desired / jnp.maximum(alpha_sum, 1e-12)


def integrate_and_fire(
    inputs: jnp.ndarray,
    alpha: jnp.ndarray,
    *,
    threshold: float = 1.0,
    max_feat_len: int = MAX_FEAT_LEN,
    is_inference: bool = False,
    apply_tail_handling: bool = True,
    tail_handling_firing_threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Integrate-and-fire with static (B, max_feat_len, D) output.

    Args:
      inputs: (B, S, D) features.
      alpha: (B, S) nonnegative firing weights (already masked and, during
        training, scaled toward the target length).
      is_inference: apply the reference's inference tail handling (extend one
        fire if the residual mass >= tail threshold, upscale it to a full
        fire, zero everything past the final length). Training keeps the raw
        integrated bins like the reference's training path.

    Returns dict:
      dsample_feats: (B, max_feat_len, D)
      dsample_feats_length: (B,) int32
      dsample_feats_pad_mask: (B, max_feat_len) bool, True = pad
      fired_marks: (B, S) bool - source frames on which a fire completed
      alpha: the alpha actually integrated
    """
    B, S, D = inputs.shape
    assert alpha.shape == (B, S), (alpha.shape, (B, S))
    af = alpha.astype(jnp.float32)

    feat_lengths = jnp.clip(
        jnp.floor(af.sum(axis=1) / threshold).astype(jnp.int32), 1, max_feat_len
    )

    csum = jnp.cumsum(af, axis=1)  # (B, S)
    csum_prev = csum - af

    T = max_feat_len + 1  # extra bin mirrors the reference's tail slot
    t = jnp.arange(T, dtype=jnp.float32)
    lower = t * threshold  # (T,)
    upper = jnp.where(t == T - 1, jnp.inf, (t + 1.0) * threshold)

    # Overlap of the frame's mass interval with each firing bin: (B, T, S).
    # The zero-overlap clamp is a `where(hi >= lo, ...)`, NOT clip/maximum:
    # a zero-alpha frame (padding, or a genuinely zero weight) has
    # csum == csum_prev, so its containing bin ties at hi - lo == 0, and
    # jnp.maximum splits the gradient 0.5/0.5 at ties — while the
    # reference's left_weight = alpha - ... path carries subgradient 1
    # there (cif.py:220-227, verified by tests/test_reference_oracle.py
    # gradient parity; the >= keeps the selected branch's full gradient).
    hi = jnp.minimum(csum[:, None, :], upper[None, :, None])
    lo = jnp.maximum(csum_prev[:, None, :], lower[None, :, None])
    W = jnp.where(hi >= lo, hi - lo, 0.0)

    # small (T x S) @ (S x D) batched matmul; full f32 MXU passes - the split
    # weights are parity-critical and the op is tiny next to the towers
    output = jnp.einsum(
        "bts,bsd->btd",
        W,
        inputs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # fire completes on frame s iff csum crosses a bin edge there
    right_idx = jnp.clip(
        jnp.floor(csum / threshold).astype(jnp.int32), 0, max_feat_len
    )
    left_idx = jnp.clip(
        jnp.floor(csum_prev / threshold).astype(jnp.int32), 0, max_feat_len
    )
    fired_marks = right_idx > left_idx

    if is_inference and apply_tail_handling:
        # mass accumulated in the partial bin right after the last full fire
        lens_f = feat_lengths.astype(jnp.float32)
        tail_weights = jnp.take_along_axis(
            W.sum(axis=2), feat_lengths[:, None], axis=1
        )[:, 0]
        extend = tail_weights >= tail_handling_firing_threshold
        upscale = jnp.where(
            extend, threshold / jnp.maximum(tail_weights, 1e-12), 1.0
        )
        onehot_tail = (
            jnp.arange(T)[None, :] == feat_lengths[:, None]
        ).astype(jnp.float32)
        factor = 1.0 + onehot_tail * (upscale[:, None] - 1.0)
        output = output * jax.lax.stop_gradient(factor)[:, :, None]
        feat_lengths = jnp.clip(
            feat_lengths + extend.astype(jnp.int32), 1, max_feat_len
        )
        # zero everything at/after the final length (reference cif.py:292-296)
        pos = jnp.arange(max_feat_len)[None, :]
        keep = pos < feat_lengths[:, None]
        output = output[:, :max_feat_len] * keep[:, :, None]
    else:
        output = output[:, :max_feat_len]

    pad_mask = jnp.arange(max_feat_len)[None, :] >= feat_lengths[:, None]
    return {
        "dsample_feats": output.astype(inputs.dtype),
        "dsample_feats_length": feat_lengths,
        "dsample_feats_pad_mask": pad_mask,
        "fired_marks": fired_marks,
        "alpha": alpha,
    }
