"""Analytic per-step FLOP accounting for the KWClip training step.

Why this exists: the driver bench's MFU number divided XLA's
`compiled.cost_analysis()["flops"]` by the chip peak. On the TPU backend
that counter is NOT "2 FLOPs per multiply-add over all dots and convs" —
at the reference bench shapes it reports 6.85e12 for a step whose matmul
math alone is ~16.8e12 FLOPs (2/MAC), a ~2.5x undercount that made the
product path look like 14% MFU when the arithmetic says ~3x that. This
module counts the dominant matrix work (dots + convs, 2 FLOPs per MAC)
directly from the model config and batch shapes, so the bench can report
an `mfu_analytic` whose derivation is checkable line by line.

Counting conventions (standard MFU accounting, e.g. the PaLM appendix /
jax-ml scaling-book):
  - 2 FLOPs per multiply-add; only matmuls and convs are counted
    (softmax, norms, GELU, dropout RNG, VQ statistics are O(N*D)
    elementwise — <1% of the total at these shapes; they cost bandwidth,
    not FLOPs).
  - backward through a frozen-parameter module that only needs INPUT
    gradients (the CLIP text tower fed by trainable keywords; frozen
    towers under `stop_gradient` skip backward entirely) costs 1x the
    forward (dX = dY @ W^T per matmul); full backward for trainable
    modules costs 2x the forward (dX + dW). Hence the fwd+bwd
    multipliers: frozen = 1, frozen-but-input-grads = 2, trainable = 3.
  - attention score/context matmuls count 2 * B * H * Tq * Tk * dh each.

Reference for the step structure: SURVEY.md section 3.2 (hot loops 1-5).
"""
from __future__ import annotations

from typing import Dict, Optional

__all__ = ["train_step_flops", "conv_out_len"]


def conv_out_len(wav_len: int, conv_layers) -> int:
    t = wav_len
    for (_c, k, s) in conv_layers:
        t = (t - k) // s + 1
    return t


def _conv_stack_flops(B: int, wav_len: int, conv_layers) -> float:
    t, cin, total = wav_len, 1, 0.0
    for (c, k, s) in conv_layers:
        t = (t - k) // s + 1
        total += 2.0 * B * t * c * cin * k
        cin = c
    return total


def _transformer_flops(
    tokens: int, d: int, ffn: int, n_layers: int, seq: int,
    *, has_ffn: bool = True,
) -> float:
    """Forward FLOPs of a standard post/pre-norm encoder stack.

    tokens = B * seq. Attention scores + context each cost
    2 * tokens * seq * d (summing over heads restores the full d)."""
    per = 2.0 * tokens * d * (3 * d)          # QKV projection
    per += 2.0 * tokens * d * d               # output projection
    per += 2.0 * 2.0 * tokens * seq * d       # scores + context
    if has_ffn:
        per += 2.0 * 2.0 * tokens * d * ffn   # two FFN matmuls
    return per * n_layers


def _mlp_flops(tokens: int, dims, d_in: int) -> float:
    total, prev = 0.0, d_in
    for d in dims or ():
        total += 2.0 * tokens * prev * d
        prev = d
    return total


def train_step_flops(
    cfg,
    batch_size: int,
    wav_len: int,
    *,
    cached_image: bool = False,
) -> Dict[str, float]:
    """Per-component analytic FLOPs of one training step.

    `cfg` is a KWClipConfig. Returns a dict of component -> FLOPs plus
    "total". `cached_image=True` drops the image tower (the product
    default for frozen towers caches image embeddings,
    tasks/base_task.py)."""
    B = batch_size
    out: Dict[str, float] = {}
    audio = cfg.audio

    # fwd+bwd multipliers
    audio_mult = 3.0 if cfg.audio_trainable else 1.0
    image_mult = 3.0 if cfg.image_encoder_trainable else 1.0
    # keywords are trainable inputs to the frozen text tower -> input grads
    text_mult = 3.0 if cfg.text_encoder_trainable else 2.0

    conv_layers = getattr(audio, "conv_layers", None)
    if conv_layers:
        frames = conv_out_len(wav_len, conv_layers)
        out["hubert_conv_frontend"] = audio_mult * _conv_stack_flops(
            B, wav_len, conv_layers
        )
        # positional conv: depthwise-grouped (d, k=conv_pos, groups)
        out["hubert_pos_conv"] = audio_mult * 2.0 * B * frames * audio.d_model * (
            audio.d_model // audio.conv_pos_groups
        ) * audio.conv_pos
        out["hubert_stack"] = audio_mult * _transformer_flops(
            B * frames, audio.d_model, audio.ffn_dim, audio.n_layers, frames
        )
    else:  # mel upstreams: mel frontend matmul is negligible; count stack
        # frame count matches ops/mel.py: (n - win)//hop + 1
        win = getattr(audio, "win", 400)
        hop = getattr(audio, "hop", 160)
        frames = max(0, (wav_len - win) // hop + 1)
        d = getattr(audio, "d_model", 768)
        n_layers = getattr(audio, "n_layers", 12)
        if getattr(audio, "arch", "transformer") == "lstm":
            # APC/VQ-APC LSTM: 4 gates of (in + H) x H per token per layer
            # (no attention, no FFN) — layer 0 takes n_mels inputs
            n_mels = getattr(audio, "n_mels", 80)
            per_token = 0.0
            for i in range(n_layers):
                in_dim = n_mels if i == 0 else d
                per_token += 2.0 * 4.0 * d * (in_dim + d)
            out["upstream_stack"] = audio_mult * B * frames * per_token
        else:
            out["upstream_stack"] = audio_mult * _transformer_flops(
                B * frames, d, getattr(audio, "ffn_dim", 4 * d),
                n_layers, frames,
            )

    clip = cfg.clip
    if not cached_image:
        patches = (clip.image_resolution // clip.vision_patch_size) ** 2
        out["clip_image_tower"] = image_mult * (
            _transformer_flops(
                B * (patches + 1), clip.vision_width,
                4 * clip.vision_width, clip.vision_layers, patches + 1,
            )
            # patch-embedding conv = one matmul over 3*P^2 inputs
            + 2.0 * B * patches * clip.vision_width
            * 3 * clip.vision_patch_size ** 2
            + 2.0 * B * clip.vision_width * clip.embed_dim  # CLS projection
        )

    has_cascaded = cfg.cascaded_objective_weight > 0 and cfg.branch_type
    if has_cascaded:
        out["clip_text_tower"] = text_mult * (
            _transformer_flops(
                B * clip.context_length, clip.text_width,
                4 * clip.text_width, clip.text_layers, clip.context_length,
            )
            + 2.0 * B * clip.text_width * clip.embed_dim  # text projection
        )

    # branch transformer(s): hybrid shares ONE self_att; separate
    # parallel/cascaded branches each own one (branches.py:351-628)
    is_plus = "plus" in (cfg.branch_type or "")
    K = cfg.head.keyword_num
    kmax = cfg.cif.max_feat_len if (is_plus and cfg.cif) else K
    frames_cls = frames + 1 + (0 if is_plus else K)  # +parallel CLS (+kw CLS)
    branch_mult = 3.0

    def ta_flops(ta, seq):
        return branch_mult * _transformer_flops(
            B * seq, ta.d_model, ta.dim_feedforward, ta.n_layers, seq,
            has_ffn=(ta.type == "TransformerEncoder"),
        )

    if "Hybrid" in (cfg.branch_type or ""):
        out["branch_self_att"] = ta_flops(cfg.cascaded_ta, frames_cls)
    else:
        if has_cascaded:
            out["branch_self_att"] = ta_flops(cfg.cascaded_ta, frames_cls)
        if cfg.parallel_objective_weight > 0:
            out["parallel_self_att"] = ta_flops(cfg.parallel_ta, frames + 1)

    if has_cascaded:
        # keyword projection MLP on K (or <=75) keyword slots
        out["kw_projection"] = branch_mult * _mlp_flops(
            B * kmax, cfg.head.kw_proj_dims or (cfg.head.text_dim,),
            cfg.head.d_model,
        )
        # cosine scores vs the (frozen) token table + codebook matmul:
        # input grads only (the embedding table gets no dW)
        V = clip.vocab_size
        out["keyword_head"] = 2.0 * (
            2.0 * B * kmax * cfg.head.text_dim * V      # scores
            + 2.0 * B * kmax * V * cfg.head.text_dim    # prob @ table
        )
        if is_plus and cfg.cif is not None:
            c = cfg.cif
            if c.produce_weight_type == "conv":
                out["cif_alpha"] = branch_mult * 2.0 * B * frames * (
                    c.encoder_embed_dim * c.conv_cif_width * c.cif_output_dim
                ) * c.num_layer
            else:
                out["cif_alpha"] = branch_mult * 2.0 * B * frames * (
                    c.encoder_embed_dim * c.cif_output_dim
                )
            # integrate-and-fire bin-overlap matmul (ops/cif.py):
            # (B, 75, T) @ (B, T, D)
            out["cif_fire"] = branch_mult * 2.0 * B * kmax * frames * c.cif_output_dim

    # post projections (parallel/cascaded/image MLPs), loss similarity:
    # each O(B*D^2) or O(B^2*D) -> well under 1% at reference shapes; count
    # the two loss similarity matmuls for completeness
    out["loss_similarity"] = 3.0 * 2.0 * 2.0 * B * B * clip.embed_dim

    out["total"] = float(sum(out.values()))
    return out
