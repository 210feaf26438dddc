"""Frozen CLIP tower (Flax, TPU-first).

Architecture parity with OpenAI CLIP as wrapped by the reference
(`avssl/module/clip_official.py`): ViT image encoder + causal text
transformer, quick-GELU MLPs, packed-QKV attention, learned `logit_scale`.

Reduced-vocabulary support (`clip_official.py:63-107`): at import time the
token-embedding table may be sliced to a usage-ranked id subset; the model
itself only sees the (possibly reduced) table plus the reduced SOT/EOT ids —
all id remapping lives in `data/tokenizer.py` + `checkpoint/` converters, so
the jitted graph is vocabulary-size-static.

`encode_keywords` (`clip_official.py:222-279`) is re-formulated without the
per-row Python loop: the pseudo-token sequence
``[SOT, kw_1..kw_n, EOT, pad-id-0 ...]`` is assembled with branch-free
`jnp.where` selects over a static 77-slot grid, supporting per-example
dynamic keyword counts as data (not shape) — exactly what XLA wants.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import MultiheadAttention

__all__ = ["ClipConfig", "ClipModel", "VisionTransformer", "TextTransformer"]


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_patch_size: int = 32
    # text
    context_length: int = 77
    vocab_size: int = 49408  # reduced at import time when applicable
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # reduced-vocab special ids (identity mapping when vocab is full)
    sot_id: int = 49406
    eot_id: int = 49407
    # compile each tower's block stack as one lax.scan over stacked params
    # (param tree: transformer/blocks/block/... with a leading layer axis)
    scan_layers: bool = True
    remat: bool = False
    # fused QKV->attention->out-proj Pallas kernel for the VISION tower
    # (nn/fused_attention_block.py): forward-only, so legal exactly for
    # the frozen ViT (the text tower needs input gradients for the
    # cascaded branch and keeps the XLA path). Enabled by
    # KWClipConfig.from_config on TPU when the image encoder is frozen.
    fused_attention_block: bool = False
    # differentiable fused attention kernel for the TEXT tower
    # (nn/fused_attention_block_vjp.py): frozen params, trainable keyword
    # INPUTS — the backward computes dx in-kernel (weight-grad einsums are
    # DCE'd under the frozen tower's stop_gradient). When on, the text
    # scan runs remat-OFF: the kernel saves only per-layer inputs instead
    # of the fp32 (B,H,77,77) probabilities that made remat win in XLA.
    # Measured round 5: LOSES in-model at base (166.0 vs 158.8 ms ABA) —
    # at T=77 attention is ~2% of the text FLOPs and the per-(layer,row)
    # kernel grain costs more than it saves. Kept for A/B; default OFF.
    text_fused_attention_vjp: bool = False
    # text-tower remat granularity: "full" reruns the whole layer forward
    # in the backward (round-3/4 default; recomputes the FFN matmuls),
    # "attn" wraps ONLY the attention sub-block in remat — the fp32
    # (B,H,77,77) softmax residuals (the reason full remat won over
    # no-remat) are recomputed from the tiny (B,77,W) layer input, while
    # the FFN forward runs ONCE and saves its bf16 buffers. "none"
    # disables remat entirely.
    text_remat_mode: str = 'full'
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def vit_b32() -> "ClipConfig":
        return ClipConfig()

    @staticmethod
    def vit_l14() -> "ClipConfig":
        return ClipConfig(
            embed_dim=768,
            vision_width=1024,
            vision_layers=24,
            vision_heads=16,
            vision_patch_size=14,
            text_width=768,
            text_heads=12,
            text_layers=12,
        )

    @staticmethod
    def tiny(**kw) -> "ClipConfig":
        defaults = dict(
            embed_dim=16,
            image_resolution=32,
            vision_width=24,
            vision_layers=2,
            vision_heads=2,
            vision_patch_size=16,
            context_length=16,
            vocab_size=64,
            text_width=32,
            text_heads=4,
            text_layers=2,
            sot_id=62,
            eot_id=63,
        )
        defaults.update(kw)
        return ClipConfig(**defaults)


class _RawDense(nn.Module):
    """kernel/bias pair shaped like nn.Dense (same init, same tree)."""

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


class _AttnParams(nn.Module):
    """in_proj/out_proj params with MultiheadAttention's exact tree
    (attn/in_proj/{kernel,bias}, attn/out_proj/{kernel,bias}) — the
    fused-kernel path owns checkpoint-identical parameters."""

    d_model: int

    @nn.compact
    def __call__(self):
        w3, b3 = _RawDense(self.d_model, 3 * self.d_model, name="in_proj")()
        wo, bo = _RawDense(self.d_model, self.d_model, name="out_proj")()
        return w3, b3, wo, bo


class ResidualAttentionBlock(nn.Module):
    """CLIP pre-norm transformer block (attn + quick-GELU MLP).

    `fused_attention` routes the (bias-free, forward-only) attention
    through the fused block kernel — vision tower only; the parameter
    tree is identical to the MultiheadAttention path."""

    d_model: int
    n_head: int
    fused_attention: bool = False
    fused_attention_vjp: bool = False
    remat_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray] = None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        if self.fused_attention:
            from ..nn.fused_attention_block import fused_attention_block

            d = self.d_model
            w3, b3, wo, bo = _AttnParams(d, name="attn")()
            attn_out = fused_attention_block(
                h, w3[:, :d], b3[:d], w3[:, d:2 * d], b3[d:2 * d],
                w3[:, 2 * d:], b3[2 * d:], wo, bo, None,
                n_heads=self.n_head, deterministic=True, dtype=self.dtype,
            )
            x = x + attn_out
        elif self.fused_attention_vjp:
            from ..nn.fused_attention_block_vjp import (
                fused_attention_block_vjp,
            )

            d = self.d_model
            ab = attn_bias
            if ab is not None and ab.ndim == 4:
                ab = ab[0, 0]                      # (T,T) causal / dummy
            if ab is not None and ab.shape[-1] != x.shape[1]:
                ab = None                          # scan's (1,1,1,1) dummy
            w3, b3, wo, bo = _AttnParams(d, name="attn")()
            attn_out = fused_attention_block_vjp(
                h, w3[:, :d], b3[:d], w3[:, d:2 * d], b3[d:2 * d],
                w3[:, 2 * d:], b3[2 * d:], wo, bo, None,
                n_heads=self.n_head, deterministic=True, dtype=self.dtype,
                attn_bias=ab,
            )
            x = x + attn_out
        elif self.remat_attn:
            # recompute qkv/scores/softmax in the backward from the saved
            # (B, T, W) input instead of saving fp32 (B, H, T, T) probs
            def _attn_fn(mdl, h, ab):
                return mdl(h, h, h, attn_mask=ab)

            attn_mod = MultiheadAttention(
                self.d_model, self.n_head, dtype=self.dtype, name="attn"
            )
            x = x + nn.remat(_attn_fn, prevent_cse=False)(
                attn_mod, h, attn_bias
            )
        else:
            x = x + MultiheadAttention(
                self.d_model, self.n_head, dtype=self.dtype, name="attn"
            )(h, h, h, attn_mask=attn_bias)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.d_model, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.d_model, dtype=self.dtype, name="c_proj")(h)
        return x


class _ScanBlock(nn.Module):
    width: int
    heads: int
    fused_attention: bool = False
    fused_attention_vjp: bool = False
    remat_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, attn_bias):
        y = ResidualAttentionBlock(
            self.width, self.heads, fused_attention=self.fused_attention,
            fused_attention_vjp=self.fused_attention_vjp,
            remat_attn=self.remat_attn,
            dtype=self.dtype, name="block"
        )(carry, attn_bias)
        return y, None


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    scan_layers: bool = True
    remat: bool = False
    fused_attention: bool = False
    fused_attention_vjp: bool = False
    remat_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray] = None):
        if self.scan_layers:
            body = _ScanBlock
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.layers,
            )(self.width, self.heads, self.fused_attention,
              self.fused_attention_vjp, self.remat_attn,
              dtype=self.dtype, name="blocks")
            if attn_bias is None:
                attn_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
            x, _ = scanned(x, attn_bias)
            return x
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads,
                fused_attention=self.fused_attention,
                fused_attention_vjp=self.fused_attention_vjp,
                remat_attn=self.remat_attn,
                dtype=self.dtype,
                name=f"resblocks_{i}"
            )(x, attn_bias)
        return x


class VisionTransformer(nn.Module):
    """CLIP ViT: patch conv -> [CLS; patches] + pos -> pre-LN transformer ->
    ln_post(CLS) @ proj."""

    cfg: ClipConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        # image: (B, H, W, 3) channel-last (TPU-native). conv1 has no bias.
        x = nn.Conv(
            features=c.vision_width,
            kernel_size=(c.vision_patch_size, c.vision_patch_size),
            strides=(c.vision_patch_size, c.vision_patch_size),
            padding="VALID",
            use_bias=False,
            dtype=c.dtype,
            name="conv1",
        )(image.astype(c.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c.vision_width)  # (B, P, W)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        ).astype(c.dtype)
        x = jnp.concatenate([jnp.tile(cls[None, None, :], (b, 1, 1)), x], axis=1)
        n_pos = (c.image_resolution // c.vision_patch_size) ** 2 + 1
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (n_pos, c.vision_width),
        )
        x = x + pos.astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="ln_pre")(x)
        x = Transformer(
            c.vision_width, c.vision_layers, c.vision_heads,
            scan_layers=c.scan_layers, remat=c.remat,
            fused_attention=getattr(c, "fused_attention_block", False),
            dtype=c.dtype,
            name="transformer",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            nn.initializers.normal(c.vision_width ** -0.5),
            (c.vision_width, c.embed_dim),
        )
        return x @ proj.astype(x.dtype)


class TextTransformer(nn.Module):
    """CLIP text tower over embedded token sequences (causal)."""

    cfg: ClipConfig

    def setup(self):
        c = self.cfg
        self.token_embedding = nn.Embed(
            c.vocab_size, c.text_width, dtype=c.dtype, name="token_embedding"
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.text_width),
        )
        text_vjp = bool(getattr(c, "text_fused_attention_vjp", False))
        mode = str(getattr(c, "text_remat_mode", "full"))
        self.transformer = Transformer(
            c.text_width, c.text_layers, c.text_heads,
            scan_layers=c.scan_layers,
            # the vjp kernel / attn-only remat replace remat's
            # recompute-everything with a save-only-layer-inputs attention
            # backward; running full remat on top would re-run the whole
            # forward for no residual savings
            remat=c.remat and not text_vjp and mode == "full",
            remat_attn=not text_vjp and mode == "attn",
            fused_attention_vjp=text_vjp,
            dtype=c.dtype,
            name="transformer",
        )
        self.ln_final = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(c.text_width ** -0.5),
            (c.text_width, c.embed_dim),
        )

    def _causal_bias(self) -> jnp.ndarray:
        t = self.cfg.context_length
        return jnp.where(
            jnp.tril(jnp.ones((t, t), dtype=bool)), 0.0, -1e30
        ).astype(jnp.float32)

    def run(self, x: jnp.ndarray, eot_index: jnp.ndarray) -> jnp.ndarray:
        """Embedded sequence (B, 77, W) -> pooled text feature (B, E)."""
        x = x + self.positional_embedding.astype(x.dtype)
        x = self.transformer(x, self._causal_bias())
        x = self.ln_final(x)
        pooled = jnp.take_along_axis(x, eot_index[:, None, None], axis=1)[:, 0, :]
        return pooled @ self.text_projection.astype(pooled.dtype)

    def __call__(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        """Token ids (B, 77) -> text feature, pooled at the EOT slot.

        OpenAI CLIP pools at `argmax(text_ids)` — correct only because EOT
        is the highest id in the FULL vocabulary. Under a usage-ranked
        reduced vocabulary (`clip_official.py:63-107`) EOT's reduced id can
        be small (it is 3 in `*_byfreq.npy`), so the reference quirk pools a
        wrong token. Intent-over-quirk (PARITY.md): pool at the first
        position whose id == the known `eot_id`; fall back to argmax only
        when EOT is absent from the row."""
        c = self.cfg
        is_eot = text_ids == c.eot_id
        eot_index = jnp.where(
            is_eot.any(axis=-1),
            jnp.argmax(is_eot, axis=-1),
            jnp.argmax(text_ids, axis=-1),
        )
        x = self.token_embedding(text_ids)
        return self.run(x, eot_index)

    def encode_keywords(
        self, keywords: jnp.ndarray, keyword_num
    ) -> jnp.ndarray:
        """Pseudo-token sequence through the frozen text tower.

        Reference `clip_official.py:222-279`: ids = [SOT, 0...0] with EOT
        scattered at `keyword_num+1`; keyword vectors overwrite embedding
        slots 1..keyword_num. `keyword_num` may be a python int (fixed-K
        branches) or an int array (B,) (dynamic/plus branches).
        """
        c = self.cfg
        b, kmax, _ = keywords.shape
        if not hasattr(keyword_num, "shape") or keyword_num.ndim == 0:
            keyword_num = jnp.full((b,), int(keyword_num), dtype=jnp.int32)
        # the EOT slot must fit the context: at most context_length-2 keywords
        # (= the reference's invariant 75 + SOT + EOT = 77; enforced here so
        # mismatched configs clamp instead of producing OOB-gather NaNs)
        keyword_num = jnp.clip(
            keyword_num.astype(jnp.int32), 1, c.context_length - 2
        )
        eot_index = keyword_num + 1  # (B,)

        positions = jnp.arange(c.context_length, dtype=jnp.int32)[None, :]  # (1,77)
        ids = jnp.where(positions == 0, c.sot_id, 0)
        ids = jnp.where(positions == eot_index[:, None], c.eot_id, ids)
        x = self.token_embedding(ids)  # (B, 77, W)

        # overwrite slots [1, eot) with keyword vectors (branch-free select)
        kw_slot = jnp.clip(positions - 1, 0, kmax - 1)  # (1,77)
        kw_at_pos = jnp.take_along_axis(
            keywords, jnp.broadcast_to(kw_slot, (b, c.context_length))[:, :, None],
            axis=1,
        )
        is_kw = (positions >= 1) & (positions < eot_index[:, None])
        x = jnp.where(is_kw[:, :, None], kw_at_pos.astype(x.dtype), x)
        return self.run(x, eot_index)


class ClipModel(nn.Module):
    """Both towers + logit scale; method-style access via `nn.apply` or the
    wrapper in `models/kwclip.py`."""

    cfg: ClipConfig

    def setup(self):
        self.visual = VisionTransformer(self.cfg, name="visual")
        self.text = TextTransformer(self.cfg, name="text")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
        )

    def encode_image(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.visual(image)

    def encode_text(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text(text_ids)

    def encode_keywords(self, keywords: jnp.ndarray, keyword_num) -> jnp.ndarray:
        return self.text.encode_keywords(keywords, keyword_num)

    def __call__(self, image: jnp.ndarray, text_ids: jnp.ndarray) -> Tuple:
        """CLIP similarity logits, matching reference `get_scores`."""
        img = self.encode_image(image)
        txt = self.encode_text(text_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T
