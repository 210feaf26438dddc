"""KWClip: the full SpeechCLIP / SpeechCLIP+ model as one Flax module.

Reference semantics: ``avssl/model/kwClip.py`` (KWClipBase +
KWClip_GeneralTransformer):
  - frozen HuBERT tower -> learnable weighted sum over all hidden states
    (`kwClip.py:851`, `speech_encoder_plus.py:619-621`);
  - frozen CLIP image tower (+ optional projection) -> L2 normalize
    (`kwClip.py:854-857`);
  - one of five branches (parallel / cascaded / hybrid / +plus variants,
    `kwClip.py:677-807`), keyword branches feed CLIP's frozen text tower via
    `encode_keywords`;
  - outputs (loss_feats, log_metrics, others) exactly like the reference
    forward (`kwClip.py:839-963`), with `compute_loss` as a separate pure
    function (`kwClip.py:999-1040`).

TPU-first: the whole forward is one jittable function with static shapes;
frozen towers are wrapped in `stop_gradient` (backward pass skips them
entirely); under pjit with batch-sharded inputs the contrastive loss sees the
global batch, reproducing the reference's Lightning-DP gather
(`kwClip.py:145-193`) with XLA-inserted collectives over ICI.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import masked_contrastive_loss, quantity_l1_loss, supcon_loss
from ..ops.weighted_sum import weighted_sum
from .branches import (
    CascadedBranch,
    CascadedBranchPlus,
    HybridBranch,
    HybridBranchPlus,
    KeywordHeadConfig,
    KwBnConfig,
    ParallelBranch,
    TransformerArgs,
    VQConfig,
)
from .cif import CifConfig
from .clip import ClipConfig, ClipModel
from .hubert import HubertConfig, HubertModel, hubert_feat_lengths
from .mel_upstreams import MelUpstream, MelUpstreamConfig

__all__ = ["ClLossConfig", "KWClipConfig", "KWClip", "compute_loss",
           "init_kw_bn_from_token_embedding"]


@dataclasses.dataclass(frozen=True)
class ClLossConfig:
    type: str = "MaskedContrastiveLoss"  # or "SupConLoss"
    temperature: float = 0.07
    temperature_trainable: bool = True
    margin: float = 0.0
    dcl: bool = False
    a2b: bool = True
    b2a: bool = True
    # SupConLoss extras (reference losses.py:8-123 / config comment block)
    base_temperature: float = 0.07
    contrast_mode: str = "all"

    @staticmethod
    def from_config(node) -> "ClLossConfig":
        d = node.to_dict() if hasattr(node, "to_dict") else dict(node)
        args = d.get("args", {})
        return ClLossConfig(
            type=d.get("type", "MaskedContrastiveLoss"),
            temperature=float(args.get("temperature", 0.07)),
            temperature_trainable=bool(
                args.get("temperature_trainable",
                         args.get("learnable_temperature", True))
            ),
            margin=float(args.get("margin", 0.0)),
            dcl=bool(args.get("dcl", False)),
            a2b=bool(args.get("a2b", True)),
            b2a=bool(args.get("b2a", True)),
            base_temperature=float(args.get("base_temperature", 0.07)),
            contrast_mode=args.get("contrast_mode", "all"),
        )


@dataclasses.dataclass(frozen=True)
class KWClipConfig:
    """Typed model config, built from the reference YAML schema."""

    audio: HubertConfig = HubertConfig()
    clip: ClipConfig = ClipConfig()
    branch_type: str = "HybridBranch_plus"  # normalized alias, "" = parallel-only
    parallel_ta: TransformerArgs = TransformerArgs()
    cascaded_ta: TransformerArgs = TransformerArgs(
        type="MultiheadAttentionAndNorm", nhead=8
    )
    head: KeywordHeadConfig = KeywordHeadConfig()
    cif: Optional[CifConfig] = CifConfig()
    cl_loss: ClLossConfig = ClLossConfig()
    cascaded_objective_weight: float = 1.0
    parallel_objective_weight: float = 1.0
    audio_trainable: bool = False
    image_encoder_trainable: bool = False
    text_encoder_trainable: bool = False
    # str ("weighted_sum"/"last_hidden_state") or tuple of layer indices
    # (reference speech_encoder_plus.py:612-634 accepts an int list)
    feat_select_idx: Any = "weighted_sum"
    # trainable-encoder subset policies (reference speech_encoder_plus.py:
    # 418-449): mutually exclusive; both imply audio_trainable and freeze
    # everything in the tower except the listed layers (+ the post-norm
    # final encoder LayerNorm, per `trainable_params`, :478-494)
    reinit_layers: Tuple[int, ...] = ()
    unfreeze_layers: Tuple[int, ...] = ()
    normalize_hiddenstates: bool = False
    normalize_type: str = "s3prl"
    need_projection: bool = True  # parallel branch projection
    img_proj_dims: Optional[Tuple[int, ...]] = None
    img_proj_dropout: float = 0.1
    p_proj_dims: Optional[Tuple[int, ...]] = None
    p_proj_dropout: float = 0.1
    # branch-internal parallel projection (HybridBranch `projection_config`,
    # reference kw_branches.py:492-505) - distinct from p_branch_proj_net
    pbranch_proj_dims: Optional[Tuple[int, ...]] = None
    pbranch_proj_dropout: float = 0.1
    c_proj_dims: Optional[Tuple[int, ...]] = None
    c_proj_dropout: float = 0.1
    using_gt_len: bool = False
    retrieval_audio_feat_src: str = "parallel"
    recall_at: Tuple[int, ...] = (1, 5, 10)
    max_audio_len: int = 102400
    original_eot_id: int = 49407  # for gt target_len from original-id text

    @property
    def keyword_num(self) -> Optional[int]:
        """None for dynamic (plus) branches, K for fixed keyword branches."""
        if self.branch_type in ("CascadedBranch", "HybridBranch"):
            return self.head.keyword_num
        return None

    @property
    def has_parallel(self) -> bool:
        return self.parallel_objective_weight > 0

    @property
    def has_cascaded(self) -> bool:
        return self.cascaded_objective_weight > 0 and self.branch_type != ""

    @staticmethod
    def from_config(cfg, *, vocab_size: Optional[int] = None,
                    sot_id: Optional[int] = None, eot_id: Optional[int] = None
                    ) -> "KWClipConfig":
        """Build from a reference-format ConfigNode (YAML loads verbatim).

        `vocab_size`/`sot_id`/`eot_id` override the CLIP text vocabulary when
        a reduced subword embedding is in use (`clip_official.py:63-107`)."""
        ms = cfg.model_settings
        c_w = float(getattr(ms, "cascaded_objective_weight", 0.0))
        p_w = float(getattr(ms, "parallel_objective_weight", 0.0))

        clip_name = cfg.clip.name
        if getattr(cfg.clip, "tiny", False):
            # development/testing escape hatch: tiny towers, same wiring
            clip_cfg = ClipConfig.tiny(
                text_width=int(getattr(cfg.clip, "tiny_width", 32)),
                embed_dim=int(getattr(cfg.clip, "tiny_width", 32)),
            )
        elif "L/14" in clip_name:
            clip_cfg = ClipConfig.vit_l14()
        else:
            clip_cfg = ClipConfig.vit_b32()
        if vocab_size is not None:
            clip_cfg = dataclasses.replace(
                clip_cfg, vocab_size=vocab_size, sot_id=sot_id, eot_id=eot_id
            )

        # optional additive key (not in the reference schema): `clip.remat`
        # rematerializes the CLIP tower scan bodies in the backward pass.
        # Auto policy: ON. The cascaded branch differentiates through the
        # text tower to its keyword INPUTS, so the 12-layer scan saves
        # per-layer residuals — fp32 attention probs + bf16 FFN buffers +
        # fp32 pre-norm tensors. For the 768-wide large text tower those
        # residuals OOMed v5e HBM (measured 18.03G > 15.75G); remat trades
        # them for one extra text forward and *wins the step-time ABA on
        # both families* (large: 680.3/688.7/679.6 ms on/off/on; base:
        # 196.1/200.9/196.0 — writing+re-reading the residuals costs more
        # than recomputing the forward). The frozen ViT and audio towers
        # keep no residuals (no input grads), so this changes nothing for
        # them. `clip.remat: false` in YAML reverts.
        clip_remat = getattr(cfg.clip, "remat", None)
        if clip_remat is None:
            clip_remat = True
        clip_cfg = dataclasses.replace(clip_cfg, remat=bool(clip_remat))

        # optional additive key: `clip.fused_attention_block` routes the
        # VISION tower's attention through the fused block kernel
        # (nn/fused_attention_block.py). Legal exactly when the image
        # encoder is frozen (forward-only kernel; the text tower needs
        # input gradients for the cascaded branch and always keeps XLA).
        # Auto: ON on TPU for a frozen image tower — the kernel lifted
        # the ViT-L forward from 51% of peak in the round-4 breakdown
        # (live-towers path only: the product default caches image
        # embeddings and never runs the ViT in a training step).
        clip_fused = getattr(cfg.clip, "fused_attention_block", None)
        image_trainable = bool(
            getattr(cfg.clip, "image_encoder_trainable", False)
        )
        if clip_fused and image_trainable:
            raise ValueError(
                "clip.fused_attention_block requires a frozen image tower "
                "(forward-only kernel, nn/fused_attention_block.py)"
            )
        if clip_fused is None:
            import jax as _jax

            clip_fused = (
                not image_trainable and _jax.default_backend() == "tpu"
            )
        clip_cfg = dataclasses.replace(
            clip_cfg, fused_attention_block=bool(clip_fused)
        )

        # optional additive key: `clip.text_fused_attention_vjp` routes the
        # TEXT tower's attention through the differentiable fused kernel
        # (nn/fused_attention_block_vjp.py). Measured round 5: LOSES
        # in-model at base (166.0 vs 158.8 ms ABA — at T=77 attention is
        # ~2% of the text FLOPs and the per-(layer,row) kernel grain costs
        # more than it saves), so the default is OFF; the knob remains for
        # A/B measurement.
        text_vjp = getattr(cfg.clip, "text_fused_attention_vjp", None)
        text_trainable = bool(
            getattr(cfg.clip, "text_encoder_trainable", False)
        )
        if text_vjp and text_trainable:
            raise ValueError(
                "clip.text_fused_attention_vjp assumes a frozen text tower "
                "(dx-only backward; weight grads are DCE'd)"
            )
        clip_cfg = dataclasses.replace(
            clip_cfg, text_fused_attention_vjp=bool(text_vjp)
        )

        # optional additive key: `clip.text_remat` selects the text-tower
        # remat granularity: "full" (default), "attn" (remat only the
        # attention sub-block: fp32 (B,H,77,77) softmax residuals
        # recomputed from the (B,77,W) layer input while the FFN matmuls
        # run once), or "none". Round-5 3-way ABA at base: full 158.8 ms,
        # attn-only 161.4/161.3, fused-vjp-kernel 166.0 — FULL remat wins;
        # on this HBM-bound step recomputing the whole text forward is
        # cheaper than writing+re-reading even the bf16 FFN residuals.
        # The knob remains for A/B.
        text_remat = getattr(cfg.clip, "text_remat", None)
        if text_remat is None:
            text_remat = "full"
        if text_remat in (True, False):
            text_remat = "full" if text_remat else "none"
        clip_cfg = dataclasses.replace(
            clip_cfg, text_remat_mode=str(text_remat)
        )

        audio_name = getattr(cfg.audio_encoder, "name", "hubert_base")
        if getattr(cfg.audio_encoder, "tiny", False):
            audio_cfg = HubertConfig.tiny(
                d_model=int(getattr(cfg.audio_encoder, "tiny_width", 32))
            )
        else:
            # s3prl-style upstream name -> tower config: wav2vec2/HuBERT
            # family (native conv-transformer tower, hubert.py), else the
            # mel-input families (APC/VQ-APC LSTMs, TERA/Mockingjay/DeCoAR2
            # mel transformers, mel_upstreams.py); truly exotic upstreams
            # still raise with a clear message.
            try:
                audio_cfg = HubertConfig.from_upstream_name(audio_name)
            except NotImplementedError:
                audio_cfg = MelUpstreamConfig.from_upstream_name(audio_name)

        # trainer.precision drives the tower compute dtype: the reference
        # trains fp16 via Lightning (`spchclip_h+.yaml:141`, `base_task.py:197`);
        # on TPU 16/bf16 map to bfloat16 towers (losses/BN/VQ stats stay fp32
        # inside ops/*). fp32 only when the config asks for it explicitly.
        precision = str(
            getattr(getattr(cfg, "trainer", None), "precision", 32) or 32
        ).lower()
        half = precision in ("16", "16-mixed", "bf16", "bf16-mixed", "bfloat16")
        if half:
            audio_cfg = dataclasses.replace(audio_cfg, dtype=jnp.bfloat16)
            clip_cfg = dataclasses.replace(clip_cfg, dtype=jnp.bfloat16)

        # optional additive key: `trainer.dropout_mask_bits` (8 or 16) sets
        # the random-bit width for every dropout mask (ops/random.py). The
        # 8-bit default draws half the RBG bytes of round 2's 16-bit masks
        # and is *more* exact in distribution (dithered threshold: marginal
        # keep prob exact instead of quantized to 1/65536).
        mask_bits = getattr(getattr(cfg, "trainer", None),
                            "dropout_mask_bits", None)
        if mask_bits is not None:
            from ..ops.random import set_mask_bits

            set_mask_bits(int(mask_bits))

        # LayerDrop: float rate, or "original" = keep the pretrained model's
        # rate (0.05 for fairseq hubert base/large; reference passes the raw
        # value into `encoder.encoder.layerdrop`, speech_encoder_plus.py:407)
        layer_drop = getattr(cfg.audio_encoder, "layer_drop", 0.0)
        if layer_drop == "original":
            layer_drop = 0.05
        audio_cfg = dataclasses.replace(audio_cfg, layer_drop=float(layer_drop))

        # optional additive key (not in the reference schema): chunked conv
        # frontend for large-batch memory headroom (hubert.py docstring).
        # Unset: auto-chunk in units of <=256 samples. History: at the
        # reference base recipe (batch 256, 6.4 s crops) the unchunked
        # step OOMed v5e HBM (17.35G > 15.75G) until the fused
        # straight-through VQ (ops/vq.st_codebook_matmul) removed the
        # (B*75, V) fp32 materializations; remeasured after: unchunked
        # B=256 fits AND is faster (564.7 vs 558.1 pairs/s), so the
        # auto threshold moved from 192 to 256.
        chunks = getattr(cfg.audio_encoder, "frontend_chunks", None)
        if chunks is None:
            batch_size = int(
                getattr(getattr(cfg, "data", None), "batch_size", 0) or 0
            )
            chunks = max(1, -(-batch_size // 256))
        chunks = int(chunks or 1)
        if chunks > 1:
            audio_cfg = dataclasses.replace(audio_cfg, frontend_chunks=chunks)

        feat_select_idx = getattr(
            cfg.audio_encoder, "feat_select_idx", "weighted_sum"
        )
        if isinstance(feat_select_idx, (list, tuple)):
            feat_select_idx = tuple(int(i) for i in feat_select_idx)

        reinit_layers = tuple(
            int(i) for i in (getattr(cfg.audio_encoder, "reinit_layers", []) or [])
        )
        unfreeze_layers = tuple(
            int(i) for i in (getattr(cfg.audio_encoder, "unfreeze_layers", []) or [])
        )
        assert not (reinit_layers and unfreeze_layers), (
            "reinit_layers and unfreeze_layers are mutually exclusive "
            "(reference speech_encoder_plus.py:418)"
        )
        if (reinit_layers or unfreeze_layers) and isinstance(
            audio_cfg, MelUpstreamConfig
        ):
            raise NotImplementedError(
                "reinit_layers/unfreeze_layers subset policies are "
                "implemented for the HuBERT/wav2vec2 tower only "
                "(optim/optimizer.py:audio_subset_mask)"
            )

        # Reference-effective behavior: the frozen encoder's eval() at init
        # (`speech_encoder_plus.py:402`) is undone by Lightning's recursive
        # .train() at fit time (no train() override exists), so reference
        # training runs dropout inside the frozen tower. That costs real
        # time on TPU (~35 ms/step of dropout-mask RNG at B=128);
        # `audio_encoder.frozen_dropout: false` opts out (default keeps
        # parity).
        audio_is_trainable = (
            bool(getattr(cfg.audio_encoder, "trainable", False))
            or bool(reinit_layers) or bool(unfreeze_layers)
        )
        frozen_dropout = bool(
            getattr(cfg.audio_encoder, "frozen_dropout", True)
        )
        if not audio_is_trainable and not frozen_dropout:
            audio_cfg = dataclasses.replace(
                audio_cfg, dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0, layer_drop=0.0,
            )

        # optional additive key: `audio_encoder.fused_attention` selects the
        # forward-only Pallas attention kernel with in-kernel dropout for
        # the tower (nn/fused_attention.py). Only legal when the tower is
        # frozen (the kernel has no backward). Default OFF: the kernel wins
        # 2.7x on a standalone 12-layer dropout chain but LOSES in the
        # tower (151.0 vs 138.9 ms train-mode fwd) and in the product step
        # (228.5 vs 219.4 ms) — in-tower XLA fuses the QKV layouts and
        # overlaps mask RNG, while the Pallas call forces materialized
        # (B,H,T,dh) transposes and pads T 320->384. Measured 3x on
        # hardware; see PERF.md §3.
        fused_attn = getattr(cfg.audio_encoder, "fused_attention", None)
        if fused_attn and audio_is_trainable:
            raise ValueError(
                "audio_encoder.fused_attention requires a frozen tower "
                "(forward-only kernel, nn/fused_attention.py)"
            )
        if fused_attn is not None and hasattr(
            audio_cfg, "fused_attention_dropout"
        ):
            audio_cfg = dataclasses.replace(
                audio_cfg, fused_attention_dropout=bool(fused_attn)
            )

        # optional additive key: `audio_encoder.fused_attention_block`
        # selects the round-4 fused QKV->attention->out-proj kernel
        # (nn/fused_attention_block.py) that consumes the residual stream
        # in native (B, T, D) layout — no transposes at any HBM boundary.
        # Frozen towers only (forward-only kernel). Default: ON for a
        # frozen HuBERT tower on TPU. Under a multi-device mesh the
        # kernel registers its own SPMD partitioning (batch-shard
        # x/bias/out, replicate weights — the DP decomposition; tested on
        # the 8-device virtual mesh), so the DP step keeps it. YAML
        # `false` forces off.
        fused_blk = getattr(
            cfg.audio_encoder, "fused_attention_block", None
        )
        if fused_blk and audio_is_trainable:
            raise ValueError(
                "audio_encoder.fused_attention_block requires a frozen "
                "tower (forward-only kernel, nn/fused_attention_block.py)"
            )
        if hasattr(audio_cfg, "fused_attention_block"):
            if fused_blk is None:
                import jax as _jax

                fused_blk = (
                    not audio_is_trainable
                    and _jax.default_backend() == "tpu"
                )
            audio_cfg = dataclasses.replace(
                audio_cfg, fused_attention_block=bool(fused_blk)
            )

        # optional additive key: `audio_encoder.fused_qkv` computes the
        # tower's q/k/v with one (D, 3D) matmul via a trace-time kernel
        # concat — bitwise-identical outputs and the same param tree
        # (hubert.py). Default OFF (measured slower in-model on v5e);
        # the knob exists for A/B measurement.
        fused_qkv = getattr(cfg.audio_encoder, "fused_qkv", None)
        if fused_qkv is not None and hasattr(audio_cfg, "fused_qkv"):
            audio_cfg = dataclasses.replace(
                audio_cfg, fused_qkv=bool(fused_qkv)
            )

        # optional additive key (not in the reference schema):
        # `audio_encoder.remat: true` rematerializes each scanned tower
        # layer in the backward pass. Only meaningful when tower layers
        # are trainable (frozen towers run under stop_gradient and keep no
        # backward residuals); auto-on for a trainable large tower
        # (24x1024), where per-layer residuals would not fit v5e HBM at
        # the reference recipe.
        remat = getattr(cfg.audio_encoder, "remat", None)
        if hasattr(audio_cfg, "remat"):
            if remat is None:
                remat = audio_is_trainable and audio_cfg.d_model >= 1024
            audio_cfg = dataclasses.replace(audio_cfg, remat=bool(remat))

        def _branch_ta(branch_node) -> TransformerArgs:
            """Parse transformer_args; the original-SpeechCLIP config family
            puts the block type in a sibling `transformer_type` key
            (`config/speechCLIP/model_base/spchclp_p.yaml`) instead of
            `transformer_args.type`."""
            args_node = branch_node.transformer_args
            ta = TransformerArgs.from_config(args_node)
            sibling = getattr(branch_node, "transformer_type", None)
            d = args_node.to_dict() if hasattr(args_node, "to_dict") else dict(args_node)
            if sibling and "type" not in d:
                ta = dataclasses.replace(ta, type=sibling)
            return ta

        branch_type = ""
        cascaded_ta = TransformerArgs(type="MultiheadAttentionAndNorm")
        head = KeywordHeadConfig()
        cif = None
        using_gt_len = False
        if c_w > 0:
            cb = ms.cascaded_branch
            branch_type = cb.type.replace("KW_", "").replace("dynamic", "plus")
            cascaded_ta = _branch_ta(cb)
            kw = getattr(cb, "keyword", None)
            kw_num = int(getattr(kw, "number", 8)) if kw is not None else 8
            kwp = getattr(kw, "kw_projection", None) if kw is not None else None
            bn_node = getattr(kw, "batchnorms", None) if kw is not None else None
            head = KeywordHeadConfig(
                d_model=cascaded_ta.d_model,
                text_dim=clip_cfg.text_width,
                kw_proj_dims=(
                    tuple(kwp.dimensions) if kwp is not None else None
                ),
                kw_proj_dropout=(
                    float(kwp.dropout) if kwp is not None else 0.1
                ),
                vq=VQConfig.from_config(cb.vq.args),
                bn=KwBnConfig.from_config(bn_node),
                keyword_num=kw_num,
            )
            ds = getattr(cb, "downsampling", None)
            if ds is not None and getattr(ds, "type", None) == "cif":
                cif = CifConfig.from_config(ds.cif)
                # keyword slots + SOT + EOT must fit the text context
                # (75 + 2 = 77 in the reference; clamp for smaller contexts)
                cif = dataclasses.replace(
                    cif,
                    max_feat_len=min(
                        cif.max_feat_len, clip_cfg.context_length - 2
                    ),
                )
                using_gt_len = cif.using_gt_len

        parallel_ta = (
            _branch_ta(ms.parallel_branch)
            if p_w > 0 and hasattr(ms, "parallel_branch")
            else TransformerArgs()
        )
        pb = getattr(ms, "parallel_branch", None)
        p_proj_cfg = getattr(pb, "projection_config", None) if pb is not None else None

        # 16-bit training runs the branch transformers and the two
        # (B*K, V)-sized keyword-head matmuls in bf16 too — the reference's
        # fp16 autocast covers the branches exactly like the towers
        # (`base_task.py:197`). VQ softmax/statistics and BN stay fp32
        # inside ops/* regardless of this flag.
        if half:
            cascaded_ta = dataclasses.replace(cascaded_ta, dtype=jnp.bfloat16)
            parallel_ta = dataclasses.replace(parallel_ta, dtype=jnp.bfloat16)
            head = dataclasses.replace(head, dtype=jnp.bfloat16)
            if cif is not None:
                # the reference's fp16 autocast covers the CIF alpha conv
                # like every other trainable submodule (base_task.py:197);
                # round 1-4 left it fp32 (a 4x-slower MXU path for the
                # 768x768x3 conv). The alpha HEAD (weight_proj -> sigmoid
                # -> cumsum chain) stays fp32 inside models/cif.py.
                cif = dataclasses.replace(cif, dtype=jnp.bfloat16)

        # optional additive key: `model_settings.fused_score_kernel` routes
        # the keyword head's cosine-score + VQ through the fused Pallas
        # kernel (ops/fused_keyword.py): VMEM-resident codebook, no
        # (B*K, V) score/softmax buffers in HBM in either pass. Legal only
        # with a frozen token embedding (the kernel emits no codebook
        # gradient); auto: ON on TPU when the text tower is frozen. The
        # kernel itself falls back when the table does not fit VMEM.
        fused_score = getattr(ms, "fused_score_kernel", None)
        if fused_score is None:
            import jax as _jax

            fused_score = (
                not text_trainable and _jax.default_backend() == "tpu"
            )
        elif fused_score and text_trainable:
            raise ValueError(
                "model_settings.fused_score_kernel requires a frozen text "
                "tower (no codebook gradient, ops/fused_keyword.py)"
            )
        head = dataclasses.replace(
            head, fused_score_kernel=bool(fused_score)
        )

        # optional additive key: `model_settings.fused_attention_vjp` routes
        # the TRAINABLE branch self-attention through the differentiable
        # fused block kernel (nn/fused_attention_block_vjp.py): full
        # fwd+bwd gradients (custom_vjp, dropout masks regenerated
        # in-kernel), no (B,H,T,T) HBM tensors in either pass. Round-5
        # standalone A/B at branch shapes (B=128, T=321, p=0.1):
        # 19.1 -> 9.5 ms (D=768), 22.3 -> 12.7 ms (D=1024), fwd+bwd incl.
        # weight grads. Auto: ON on TPU (falls back to the XLA path
        # off-TPU and for attention-map extraction). YAML `false` reverts.
        fused_vjp = getattr(ms, "fused_attention_vjp", None)
        if fused_vjp is None:
            import jax as _jax

            fused_vjp = _jax.default_backend() == "tpu"
        cascaded_ta = dataclasses.replace(
            cascaded_ta, fused_block_vjp=bool(fused_vjp)
        )
        parallel_ta = dataclasses.replace(
            parallel_ta, fused_block_vjp=bool(fused_vjp)
        )

        def _proj(name):
            node = ms.get(name, None) if hasattr(ms, "get") else None
            if node is None:
                return None, 0.1
            return tuple(node.dimensions), float(node.dropout)

        img_dims, img_drop = _proj("image_encoder_projection")
        pb_dims, pb_drop = _proj("parallel_branch_projection")
        cb_dims, cb_drop = _proj("cascaded_branch_projection")

        return KWClipConfig(
            audio=audio_cfg,
            clip=clip_cfg,
            branch_type=branch_type,
            parallel_ta=parallel_ta,
            cascaded_ta=cascaded_ta,
            head=head,
            cif=cif,
            cl_loss=ClLossConfig.from_config(cfg.cl_loss),
            cascaded_objective_weight=c_w,
            parallel_objective_weight=p_w,
            audio_trainable=audio_is_trainable,
            reinit_layers=reinit_layers,
            unfreeze_layers=unfreeze_layers,
            image_encoder_trainable=bool(
                getattr(cfg.clip, "image_encoder_trainable", False)
            ),
            text_encoder_trainable=bool(
                getattr(cfg.clip, "text_encoder_trainable", False)
            ),
            feat_select_idx=feat_select_idx,
            normalize_hiddenstates=bool(
                getattr(cfg.audio_encoder, "normalize_hiddenstates", False)
            ),
            normalize_type=getattr(cfg.audio_encoder, "normalize_type", "s3prl"),
            need_projection=bool(getattr(pb, "need_projection", True))
            if pb is not None
            else True,
            img_proj_dims=img_dims,
            img_proj_dropout=img_drop,
            p_proj_dims=pb_dims,
            p_proj_dropout=pb_drop,
            pbranch_proj_dims=(
                tuple(p_proj_cfg.dimensions) if p_proj_cfg is not None else None
            ),
            pbranch_proj_dropout=(
                float(p_proj_cfg.dropout) if p_proj_cfg is not None else 0.1
            ),
            c_proj_dims=cb_dims,
            c_proj_dropout=cb_drop,
            using_gt_len=using_gt_len,
            retrieval_audio_feat_src=getattr(
                cfg.retrieval, "audio_feat_src", "parallel"
            ),
            recall_at=tuple(getattr(cfg.retrieval, "recall_at", [1, 5, 10])),
            max_audio_len=int(getattr(cfg.audio_encoder, "max_audio_len", 102400)),
        )


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class KWClip(nn.Module):
    """The full model. `__call__` = reference `forward(batch)`."""

    cfg: KWClipConfig

    def setup(self):
        c = self.cfg
        if isinstance(c.audio, MelUpstreamConfig):
            self.audio_encoder = MelUpstream(c.audio, name="audio_encoder")
        else:
            self.audio_encoder = HubertModel(c.audio, name="audio_encoder")
        n_weights = c.audio.num_hidden_states
        self.hidden_weights = self.param(
            "weightedsum", nn.initializers.zeros, (n_weights,)
        )
        self.clip = ClipModel(c.clip, name="clip")

        self.cascaded_branch = None
        self.parallel_branch = None
        if c.has_cascaded:
            common = dict(
                ta=c.cascaded_ta, head=c.head, audio_dim=c.cascaded_ta.d_model
            )
            if c.branch_type == "CascadedBranch":
                self.cascaded_branch = CascadedBranch(**common, name="cascaded_branch")
            elif c.branch_type == "CascadedBranch_plus":
                self.cascaded_branch = CascadedBranchPlus(
                    **common, cif=c.cif, name="cascaded_branch"
                )
            elif c.branch_type == "HybridBranch":
                self.cascaded_branch = HybridBranch(
                    **common,
                    out_dim=c.clip.text_width,
                    need_projection=c.need_projection,
                    parallel_proj_dims=c.pbranch_proj_dims,
                    parallel_proj_dropout=c.pbranch_proj_dropout,
                    name="cascaded_branch",
                )
            elif c.branch_type == "HybridBranch_plus":
                self.cascaded_branch = HybridBranchPlus(
                    **common, cif=c.cif, out_dim=c.clip.text_width,
                    name="cascaded_branch",
                )
            else:
                raise NotImplementedError(c.branch_type)
        if c.has_parallel and not c.has_cascaded:
            self.parallel_branch = ParallelBranch(
                ta=c.parallel_ta,
                audio_dim=c.parallel_ta.d_model,
                out_dim=c.clip.text_width,
                need_projection=c.need_projection,
                name="parallel_branch",
            )

        from ..nn.mlp import MLPLayers  # local import avoids cycle

        self.img_enc_proj_net = (
            MLPLayers(units=c.img_proj_dims, dropout=c.img_proj_dropout,
                      name="img_enc_proj_net")
            if c.img_proj_dims is not None else None
        )
        self.p_branch_proj_net = (
            MLPLayers(units=c.p_proj_dims, dropout=c.p_proj_dropout,
                      name="p_branch_proj_net")
            if c.p_proj_dims is not None else None
        )
        self.c_branch_proj_net = (
            MLPLayers(units=c.c_proj_dims, dropout=c.c_proj_dropout,
                      name="c_branch_proj_net")
            if c.c_proj_dims is not None else None
        )

        if c.cl_loss.temperature_trainable:
            # learnable log(1/T) (reference losses.py:160-163)
            self.log_inv_temp = self.param(
                "criterion_log_inv_temp",
                nn.initializers.constant(float(np.log(1.0 / c.cl_loss.temperature))),
                (),
            )

    # ---------------------------------------------------------- towers ----

    def forward_audio(
        self,
        wav: jnp.ndarray,
        wav_len: jnp.ndarray,
        wav_padding_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        return_hidden_states: bool = False,
    ):
        """Frozen HuBERT + learnable weighted sum
        (reference `speech_encoder_plus.py:520-634`)."""
        c = self.cfg
        if wav_padding_mask is None:
            wav_padding_mask = (
                jnp.arange(wav.shape[1])[None, :] >= wav_len[:, None]
            )
        fused_ws = (
            c.feat_select_idx == "weighted_sum"
            and not return_hidden_states
            and c.audio.scan_layers
            and not (c.normalize_hiddenstates and c.normalize_type.startswith("method"))
        )
        if fused_ws:
            # weighted sum accumulated inside the layer scan: the (L+1,B,T,D)
            # hidden stack never materializes (HBM win at large batch)
            w = jax.nn.softmax(self.hidden_weights.astype(jnp.float32))
            out = self.audio_encoder(
                wav,
                wav_padding_mask,
                deterministic=deterministic,
                layer_weights=w,
                normalize_contrib=c.normalize_hiddenstates
                and c.normalize_type == "s3prl",
                stop_contrib_gradient=not c.audio_trainable,
            )
            feat = out["weighted_sum"]
            feat_len = jnp.minimum(
                jnp.round(
                    wav_len.astype(jnp.float32) / c.audio.downsample_rate
                ).astype(jnp.int32),
                feat.shape[1],
            )
            return feat, feat_len
        out = self.audio_encoder(
            wav, wav_padding_mask, deterministic=deterministic
        )
        hidden = out["hidden_states"]  # (L+1, B, T, D)
        if not c.audio_trainable:
            hidden = jax.lax.stop_gradient(hidden)
        if c.normalize_hiddenstates and c.normalize_type.startswith("method"):
            if c.normalize_type == "method1":
                hidden = hidden / (
                    jnp.linalg.norm(hidden, axis=-1, keepdims=True) + 1e-8
                )
            elif c.normalize_type == "method2":
                hidden = hidden / jnp.linalg.norm(hidden, axis=-1).mean(
                    axis=-1
                )[:, :, None, None]

        if isinstance(c.feat_select_idx, tuple):
            # int-list layer selection (reference speech_encoder_plus.py:
            # 624-626 returns the chosen hidden states as a list). A single
            # index yields the usual (B, T, D) feature; multiple indices
            # stack to (n, B, T, D) — a feature-extraction surface, not a
            # trainable-branch input (the reference would equally fail to
            # feed a list into a branch).
            sel = hidden[jnp.asarray(c.feat_select_idx)]
            feat = sel[0] if len(c.feat_select_idx) == 1 else sel
        elif c.feat_select_idx == "weighted_sum":
            feat = weighted_sum(
                hidden,
                self.hidden_weights,
                normalize_features=c.normalize_hiddenstates
                and c.normalize_type == "s3prl",
            )
        elif c.feat_select_idx == "last_hidden_state":
            feat = hidden[-1]
        else:
            raise KeyError(c.feat_select_idx)

        feat_len = jnp.minimum(
            jnp.round(wav_len.astype(jnp.float32) / c.audio.downsample_rate).astype(
                jnp.int32
            ),
            feat.shape[1],
        )
        if return_hidden_states:
            return feat, feat_len, hidden
        return feat, feat_len

    def encode_image_raw(self, image: jnp.ndarray) -> jnp.ndarray:
        """Frozen CLIP image features before projection/normalization —
        the cacheable quantity (the tower is frozen, so these are constant
        across training; see `tasks/trainer.py` image-embedding cache)."""
        feat = self.clip.encode_image(image)
        if not self.cfg.image_encoder_trainable:
            feat = jax.lax.stop_gradient(feat)
        return feat

    def project_image_feat(
        self, feat: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        if self.img_enc_proj_net is not None:
            feat = self.img_enc_proj_net(feat, deterministic=deterministic)
        return _l2norm(feat)

    def encode_image(self, image: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.project_image_feat(
            self.encode_image_raw(image), deterministic=deterministic
        )

    # --------------------------------------------------------- forward ----

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        *,
        training: bool = False,
        global_step: Optional[jnp.ndarray] = None,
        deterministic: Optional[bool] = None,
    ) -> Tuple[Dict, Dict, Dict]:
        """Returns (loss_feats, log_metrics, others), reference
        `KWClip_GeneralTransformer.forward` (`kwClip.py:839-963`)."""
        c = self.cfg
        if deterministic is None:
            deterministic = not training
        if isinstance(c.feat_select_idx, tuple) and len(c.feat_select_idx) > 1:
            raise NotImplementedError(
                "multi-layer feat_select_idx is a feature-extraction surface "
                "(use forward_audio / feature_extractor); branches need one "
                "(B, T, D) feature tensor — same constraint as the reference"
            )
        wav, wav_len = batch["wav"], batch["wav_len"]

        audio_feat, audio_feat_len = self.forward_audio(
            wav, wav_len, batch.get("wav_padding_mask"), deterministic=deterministic
        )
        return self.forward_from_audio(
            audio_feat, audio_feat_len, batch,
            training=training, global_step=global_step,
            deterministic=deterministic,
        )

    def forward_from_audio(
        self,
        audio_feat: jnp.ndarray,
        audio_feat_len: jnp.ndarray,
        batch: Dict[str, jnp.ndarray],
        *,
        training: bool = False,
        global_step: Optional[jnp.ndarray] = None,
        deterministic: Optional[bool] = None,
    ) -> Tuple[Dict, Dict, Dict]:
        """Everything downstream of the acoustic tower: image projection,
        branches, VQ/CIF, keyword text encoding, loss features. Split out of
        `__call__` so the post-tower compute can be driven (and profiled)
        from precomputed audio features."""
        c = self.cfg
        if deterministic is None:
            deterministic = not training
        image = batch.get("image")
        ids = batch["id"]

        if "image_feat" in batch and batch["image_feat"] is not None:
            # precomputed frozen image-tower output (trainer-side cache);
            # the trainable projection + normalize still run in-step
            image_feat = self.project_image_feat(
                jax.lax.stop_gradient(batch["image_feat"]),
                deterministic=deterministic,
            )
        else:
            image_feat = self.encode_image(image, deterministic=deterministic)

        target_len = None
        if c.branch_type.endswith("_plus"):
            if c.using_gt_len and "text" in batch:
                # caption length = EOT position - 1 in original-id space
                # (reference kwClip.py:861-869 uses argmax; EOT=49407 is the
                # max id in the full vocab — locate it explicitly instead)
                text = batch["text"]
                is_eot = text == c.original_eot_id
                eot_pos = jnp.where(
                    is_eot.any(axis=-1),
                    jnp.argmax(is_eot, axis=-1),
                    jnp.argmax(text, axis=-1),
                )
                target_len = (eot_pos - 1).astype(jnp.int32)
            else:
                target_len = jnp.round(audio_feat_len.astype(jnp.float32) / 20.0).astype(
                    jnp.int32
                )

        token_emb = self.clip.text.token_embedding.embedding
        if not c.text_encoder_trainable:
            token_emb = jax.lax.stop_gradient(token_emb)

        output: Dict[str, Any] = {}
        if self.cascaded_branch is not None:
            kwargs = dict(
                training=training,
                num_updates=global_step,
                deterministic=deterministic,
            )
            if c.branch_type.endswith("_plus"):
                kwargs.update(target_len=target_len, global_step=global_step)
            output = self.cascaded_branch(
                audio_feat, audio_feat_len, token_emb, **kwargs
            )
        if self.parallel_branch is not None:
            output = self.parallel_branch(
                audio_feat, audio_feat_len, deterministic=deterministic
            )

        parallel_audio_feat = output.get("parallel_audio_feat")
        keywords = output.get("keywords")
        vq_results = output.get("vq_results")
        dsample_results = output.get("dsample_results")

        cascaded_audio_feat = None
        if keywords is not None:
            keyword_num = (
                output.get("keywords_len")
                if output.get("keywords_len") is not None
                else output["keyword_num"]
            )
            # when the text tower is frozen, grads still flow through its
            # activations into the keywords; the tower's own params are
            # excluded by stop_gradient + the optimizer mask
            cascaded_audio_feat = self.clip.encode_keywords(keywords, keyword_num)

        loss_feats: Dict[str, Any] = {"id": ids, "image_feat": image_feat}
        others: Dict[str, Any] = {"id": ids, "image_feat": image_feat}

        if cascaded_audio_feat is not None:
            if self.c_branch_proj_net is not None:
                cascaded_audio_feat = self.c_branch_proj_net(
                    cascaded_audio_feat, deterministic=deterministic
                )
            cascaded_audio_feat = _l2norm(cascaded_audio_feat)
            loss_feats["cascaded_audio_feat"] = cascaded_audio_feat
        if parallel_audio_feat is not None:
            if self.p_branch_proj_net is not None:
                parallel_audio_feat = self.p_branch_proj_net(
                    parallel_audio_feat, deterministic=deterministic
                )
            parallel_audio_feat = _l2norm(parallel_audio_feat)
            loss_feats["parallel_audio_feat"] = parallel_audio_feat

        if dsample_results is not None and c.cif is not None:
            loss_feats["cif_quantity_out"] = dsample_results["quantity_out"]
            loss_feats["cif_target_len"] = (
                dsample_results.get("target_len")
                if dsample_results.get("target_len") is not None
                else target_len
            )

        log_metrics: Dict[str, Any] = {"cl_temp": self.current_temperature()}
        if vq_results is not None:
            log_metrics["softmax_temp"] = vq_results["temp"]
            log_metrics["temp"] = vq_results["temp"]
            log_metrics["code_perplexity"] = vq_results["code_perplexity"]
            log_metrics["prob_perplexity"] = vq_results["prob_perplexity"]
            log_metrics["ent_per_t"] = vq_results["ent_per_t"].mean()
        if dsample_results is not None and "dsample_len_diff" in dsample_results:
            log_metrics["dsample_len_diff"] = dsample_results["dsample_len_diff"]

        others.update(
            {
                "parallel_audio_feat": parallel_audio_feat,
                "cascaded_audio_feat": cascaded_audio_feat,
                "vq_results": vq_results,
                "keywords": keywords,
                "dsample_results": dsample_results,
                "keywords_len": output.get("keywords_len"),
            }
        )
        return loss_feats, log_metrics, others

    def current_temperature(self) -> jnp.ndarray:
        c = self.cfg
        if c.cl_loss.temperature_trainable:
            return 1.0 / jnp.exp(self.log_inv_temp)
        return jnp.asarray(c.cl_loss.temperature, jnp.float32)

    def logit_multiplier(self) -> jnp.ndarray:
        c = self.cfg
        if c.cl_loss.temperature_trainable:
            return jnp.exp(self.log_inv_temp)
        return jnp.asarray(1.0 / c.cl_loss.temperature, jnp.float32)

    def compute_loss(self, loss_feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Reference `compute_loss` (`kwClip.py:999-1040`). Call on
        *global-batch* features (under pjit this is automatic)."""
        c = self.cfg
        scale = self.logit_multiplier()
        image_feat = loss_feats["image_feat"].astype(jnp.float32)
        ids = loss_feats["id"]
        valid = loss_feats.get("valid")
        losses: Dict[str, jnp.ndarray] = {}
        total = jnp.float32(0.0)
        for key, weight, short in (
            ("cascaded_audio_feat", c.cascaded_objective_weight, "c_cl_loss"),
            ("parallel_audio_feat", c.parallel_objective_weight, "p_cl_loss"),
        ):
            if weight > 0.0 and key in loss_feats:
                if c.cl_loss.type == "SupConLoss":
                    # audio/image as two views of the pair (same-id samples
                    # are positives, reference losses.py:8-123)
                    feats = jnp.stack(
                        [loss_feats[key].astype(jnp.float32), image_feat],
                        axis=1,
                    )
                    l = supcon_loss(
                        feats,
                        labels=ids,
                        temperature=1.0 / scale,
                        base_temperature=c.cl_loss.base_temperature,
                        contrast_mode=c.cl_loss.contrast_mode,
                        valid=valid,
                    )
                else:
                    l = masked_contrastive_loss(
                        loss_feats[key].astype(jnp.float32),
                        image_feat,
                        ids,
                        logit_scale=scale,
                        margin=c.cl_loss.margin,
                        dcl=c.cl_loss.dcl,
                        a2b=c.cl_loss.a2b,
                        b2a=c.cl_loss.b2a,
                        valid=valid,
                    )
                losses[short] = l
                total = total + weight * l
        if (
            c.cif is not None
            and "cif_quantity_out" in loss_feats
            and loss_feats.get("cif_target_len") is not None
        ):
            q = quantity_l1_loss(
                loss_feats["cif_quantity_out"],
                loss_feats["cif_target_len"],
                valid=valid,
            )
            losses["quantity_loss"] = q
            total = total + c.cif.quantity_loss_weight * q
        losses["loss"] = total
        return losses

    # ----------------------------------------------------- library API ----

    def encode_speech(
        self, wav: jnp.ndarray, wav_len: jnp.ndarray
    ) -> Dict[str, Any]:
        """Reference `encode_speech` (`kwClip.py:1042-1091`)."""
        audio_feat, audio_feat_len = self.forward_audio(wav, wav_len)
        token_emb = self.clip.text.token_embedding.embedding
        output: Dict[str, Any] = {}
        if self.cascaded_branch is not None:
            output = self.cascaded_branch(audio_feat, audio_feat_len, token_emb)
        if self.parallel_branch is not None:
            output = self.parallel_branch(audio_feat, audio_feat_len)
        cascaded_audio_feat = None
        if output.get("keywords") is not None:
            keyword_num = (
                output.get("keywords_len")
                if output.get("keywords_len") is not None
                else output["keyword_num"]
            )
            cascaded_audio_feat = self.clip.encode_keywords(
                output["keywords"], keyword_num
            )
        parallel_audio_feat = output.get("parallel_audio_feat")
        if parallel_audio_feat is not None and self.p_branch_proj_net is not None:
            parallel_audio_feat = self.p_branch_proj_net(parallel_audio_feat)
        return {
            "cascaded_audio_feat": cascaded_audio_feat,
            "parallel_audio_feat": parallel_audio_feat,
            "vq_results": output.get("vq_results"),
            "keywords": output.get("keywords"),
            "dsample_results": output.get("dsample_results"),
        }

    def forward_text(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        """Frozen CLIP text features from (reduced-id) token sequences
        (reference `forward_text`, `kwClip.py:509-527`; the original->reduced
        id mapping is host-side, `data.tokenizer.ClipTextProcessor`)."""
        return self.clip.encode_text(text_ids)

    def get_attention_map(
        self, wav: jnp.ndarray, wav_len: jnp.ndarray
    ) -> jnp.ndarray:
        """Keyword-CLS attention weights over the audio frames for
        visualization (reference `getAttentionMap`,
        `kw_branches.py:384-447`; fixed-K cascaded branch only)."""
        audio_feat, audio_feat_len = self.forward_audio(wav, wav_len)
        if self.cascaded_branch is None or not hasattr(
            self.cascaded_branch, "get_attention_map"
        ):
            raise NotImplementedError(
                "attention maps require a fixed-K cascaded branch"
            )
        return self.cascaded_branch.get_attention_map(audio_feat, audio_feat_len)

    def feature_extractor(
        self, wav: jnp.ndarray, wav_len: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        """Reference `feature_extractor_s3prl` (`kwClip.py:965-997`):
        (last_hidden, all hidden states incl. branch layers)."""
        audio_feat, audio_feat_len, hidden = self.forward_audio(
            wav, wav_len, return_hidden_states=True
        )
        hidden_states = tuple(hidden[i] for i in range(hidden.shape[0]))
        if self.cascaded_branch is not None:
            hs = self.cascaded_branch.extract_hidden_states(audio_feat, audio_feat_len)
            hidden_states = hidden_states + tuple(hs[1:])
        if self.parallel_branch is not None:
            hs = self.parallel_branch.extract_hidden_states(audio_feat, audio_feat_len)
            hidden_states = hidden_states + tuple(hs[1:])
        return hidden_states[-1], hidden_states


def compute_loss(
    model: KWClip, variables, loss_feats: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Functional wrapper for the loss (usable without a live module)."""
    return model.apply(variables, loss_feats, method=KWClip.compute_loss)


def init_kw_bn_from_token_embedding(
    params: Dict, token_embedding: np.ndarray, cfg: KWClipConfig
) -> Dict:
    """Overwrite keyword-BN scale/bias with CLIP token-embedding statistics
    (reference `kw_branches.py:93-118`: gamma = std(emb) * std_scale,
    beta = mean(emb)). Returns updated params (pure)."""
    if not (cfg.has_cascaded and cfg.head.bn.enabled):
        return params
    emb = np.asarray(token_embedding, np.float32)
    mean = emb.mean(axis=0)
    # torch.std default: unbiased
    std = emb.std(axis=0, ddof=1) * cfg.head.bn.std_scale
    variant = "dynamic" if cfg.branch_type.endswith("_plus") else "fixed"
    if variant == "fixed" and cfg.head.bn.type == "eachKw":
        k = cfg.head.keyword_num
        if cfg.head.bn.parallel:
            # channel layout (D*K): channel index = d*K + k
            scale = np.repeat(std, k)
            bias = np.repeat(mean, k)
        else:
            scale = np.tile(std[None, :], (k, 1))
            bias = np.tile(mean[None, :], (k, 1))
    else:
        scale, bias = std, mean

    import copy

    out = copy.deepcopy(params)
    node = out["cascaded_branch"]["head"]["bn_layer"]
    node["scale"] = jnp.asarray(scale)
    node["bias"] = jnp.asarray(bias)
    return out
