"""CIF downsampler module: alpha prediction net + integrate-and-fire.

Reference semantics: ``avssl/module/cif.py:24-155`` — a conv (or dense) stack
followed by a dropout+linear+sigmoid alpha head; alphas are zeroed at padding,
optionally scaled so their sum hits the target length while training
(`apply_scaling` until `scaling_step`), then integrated-and-fired into at most
MAX_FEAT_LEN keyword slots. The integrate-and-fire itself is the bin-overlap
matmul kernel in ``ops/cif.py`` (one MXU einsum instead of the reference's
cumsum + 3 scatter_add passes + Python extra-fire loop).

Deviation from the reference (intent implemented, quirk dropped): when
`cif_output_dim != encoder_embed_dim` the reference multiplies the projected
output by the *pad* mask, zeroing valid frames (`cif.py:151-153`); we zero the
padded frames instead. No released config hits this path (both dims are 768).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.dropout import FastDropout
from ..ops.cif import MAX_FEAT_LEN, integrate_and_fire, scale_alpha

__all__ = ["CifConfig", "CIF"]


@dataclasses.dataclass(frozen=True)
class CifConfig:
    cif_threshold: float = 1.0
    cif_output_dim: int = 768
    encoder_embed_dim: int = 768
    produce_weight_type: str = "conv"  # "conv" | "dense"
    num_layer: int = 1  # conv_cif_layer_num
    conv_cif_width: int = 3
    conv_cif_dropout: float = 0.1
    apply_scaling: bool = True
    scaling_step: int = -1  # stop scaling after this global step (-1 = never stop)
    apply_tail_handling: bool = True
    tail_handling_firing_threshold: float = 0.5
    quantity_loss_weight: float = 1.0
    using_gt_len: bool = False
    max_feat_len: int = MAX_FEAT_LEN
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_config(node) -> "CifConfig":
        """Build from a reference-format YAML node
        (``model_settings.cascaded_branch.downsampling.cif``)."""
        d = node.to_dict() if hasattr(node, "to_dict") else dict(node)
        return CifConfig(
            cif_threshold=float(d.get("cif_threshold", 1.0)),
            cif_output_dim=int(d.get("cif_output_dim", 768)),
            encoder_embed_dim=int(d.get("encoder_embed_dim", 768)),
            produce_weight_type=d.get("produce_weight_type", "conv"),
            num_layer=int(d.get("conv_cif_layer_num", d.get("num_layer", 1))),
            conv_cif_width=int(d.get("conv_cif_width", 3)),
            conv_cif_dropout=float(d.get("conv_cif_dropout", 0.1)),
            apply_scaling=bool(d.get("apply_scaling", True)),
            scaling_step=int(d.get("scaling_step", -1)),
            apply_tail_handling=bool(d.get("apply_tail_handling", True)),
            tail_handling_firing_threshold=float(
                d.get("tail_handling_firing_threshold", 0.5)
            ),
            quantity_loss_weight=float(d.get("quantity_loss_weight", 1.0)),
            using_gt_len=bool(d.get("using_gt_len", False)),
            max_feat_len=int(d.get("max_feat_len", MAX_FEAT_LEN)),
        )


class CIF(nn.Module):
    """Alpha net + integrate-and-fire with static (B, max_feat_len, D) output."""

    cfg: CifConfig

    @nn.compact
    def __call__(
        self,
        audio_feat: jnp.ndarray,          # (B, S, D)
        audio_feat_pad_mask: jnp.ndarray,  # (B, S) bool, True = pad
        target_lengths: Optional[jnp.ndarray] = None,  # (B,) int, None at eval
        global_step: Optional[jnp.ndarray] = None,
        *,
        training: bool = False,
        deterministic: bool = True,
        eps: float = 1e-5,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        x = audio_feat.astype(c.dtype)

        if c.produce_weight_type == "dense":
            x = nn.Dense(c.encoder_embed_dim, dtype=c.dtype, name="dense_proj")(x)
            x = nn.relu(x)
        elif c.produce_weight_type == "conv":
            for i in range(c.num_layer):
                x = nn.Conv(
                    features=c.encoder_embed_dim,
                    kernel_size=(c.conv_cif_width,),
                    padding=[(c.conv_cif_width // 2, c.conv_cif_width // 2)],
                    dtype=c.dtype,
                    name=f"conv_{i}",
                )(x)
                # dithered 8-bit keep masks (ops/random.keep_mask) — exact
                # marginal keep probability at half the RNG draws of
                # jax.random.bernoulli (same convention as the branch
                # transformers, nn/dropout.py)
                x = FastDropout(0.5)(x, deterministic=deterministic)
                x = nn.relu(x)
        else:
            raise NotImplementedError(c.produce_weight_type)

        # alpha head: Dropout -> Linear(1) -> Sigmoid (reference cif.py:84-86)
        x = FastDropout(0.5)(x, deterministic=deterministic)
        alpha = nn.sigmoid(
            nn.Dense(1, dtype=jnp.float32, name="weight_proj")(x)
        )[..., 0].astype(jnp.float32)  # (B, S)
        alpha = jnp.where(audio_feat_pad_mask, 0.0, alpha)

        quantity_out = alpha.sum(axis=1)  # pre-scaling sum for the L1 loss
        orig_alpha = alpha

        if training and c.apply_scaling and target_lengths is not None:
            scaled = scale_alpha(alpha, target_lengths, c.cif_threshold, eps)
            if c.scaling_step >= 0 and global_step is not None:
                # scaling is switched off once global_step passes scaling_step
                # (reference cif.py:102-104); traced predicate keeps one graph
                on = (global_step < c.scaling_step)[..., None]
                alpha = jnp.where(on, scaled, alpha)
            else:
                alpha = scaled

        result: Dict[str, jnp.ndarray] = {
            "quantity_out": quantity_out,
            "orig_alpha": orig_alpha,
            "original_length": (~audio_feat_pad_mask).sum(axis=-1).astype(jnp.int32),
            "target_len": target_lengths,
        }
        result.update(
            integrate_and_fire(
                audio_feat,
                alpha,
                threshold=c.cif_threshold,
                max_feat_len=c.max_feat_len,
                is_inference=not training,
                apply_tail_handling=c.apply_tail_handling,
                tail_handling_firing_threshold=c.tail_handling_firing_threshold,
            )
        )
        result["input_feats_pad_mask"] = audio_feat_pad_mask

        if c.cif_output_dim != c.encoder_embed_dim:
            proj = nn.Dense(
                c.cif_output_dim, use_bias=False, dtype=c.dtype, name="cif_output_proj"
            )(result["dsample_feats"])
            result["dsample_feats"] = jnp.where(
                result["dsample_feats_pad_mask"][:, :, None], 0.0, proj
            )

        if target_lengths is not None:
            result["dsample_len_diff"] = (
                jnp.abs(
                    result["dsample_feats_length"].astype(jnp.float32)
                    - target_lengths.astype(jnp.float32)
                )
            ).mean()

        return result
