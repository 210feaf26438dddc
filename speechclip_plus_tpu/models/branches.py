"""SpeechCLIP(+) branch family as Flax modules.

Reference semantics: ``avssl/model/kw_branches.py``:
  - ParallelBranch    (:200-282)  — 1 CLS over HuBERT frames -> utterance vec.
  - CascadedBranch    (:285-447)  — K keyword CLS -> proj -> BN -> cosine-vs-
    vocab -> VQ -> keyword embeddings (the frozen CLIP text tower is applied
    by the parent model, keeping the branch a pure audio->keywords function).
  - HybridBranch      (:450-577)  — one shared transformer with
    [parallel CLS; K keyword CLS; frames].
  - CascadedBranchPlus (:580-777) — transformer, then CIF downsampling to a
    dynamic number of keywords, dynamic BN + VQ.
  - HybridBranchPlus  (:780-891)  — plus variant with a prepended parallel CLS.

TPU-first notes: CLS prepending is a static concat; per-keyword cosine scores
are one (B*K, D) x (D, V) matmul on the MXU (the reference loops per keyword,
``kw_branches.py:158-179``); all padding handled via boolean masks; the VQ
codebook (CLIP token embedding) is passed in as a frozen array argument so
branches stay independent of the CLIP module tree.
"""
from __future__ import annotations

import ast
import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.mlp import MLPLayers
from ..nn.transformer import MultiheadAttentionAndNorm, TransformerEncoder
from ..ops import kw_bn as kw_bn_ops
from ..ops.masks import key_padding_mask as get_keypadding_mask
from ..ops.vq import simple_vector_quantizer
from .cif import CIF, CifConfig

__all__ = [
    "TransformerArgs",
    "VQConfig",
    "KwBnConfig",
    "SimpleVectorQuantizer",
    "KwBatchNorm",
    "KeywordHead",
    "ParallelBranch",
    "CascadedBranch",
    "HybridBranch",
    "CascadedBranchPlus",
    "HybridBranchPlus",
]


# ------------------------------------------------------------- configs ----


@dataclasses.dataclass(frozen=True)
class TransformerArgs:
    type: str = "TransformerEncoder"
    n_layers: int = 1
    d_model: int = 768
    nhead: int = 8
    dim_feedforward: int = 3072
    dropout: float = 0.1
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5
    norm_first: bool = False
    # compute dtype; set to bfloat16 by KWClipConfig.from_config when
    # trainer.precision asks for 16-bit (the reference trains the branches
    # under the same fp16 autocast as the towers, `base_task.py:197`).
    # Never parsed from YAML (not part of the reference schema).
    dtype: Any = jnp.float32
    # differentiable fused attention block kernel for the branch MHA
    # (nn/fused_attention_block_vjp.py); set by KWClipConfig.from_config
    # (auto-on on TPU, model_settings.fused_attention_vjp: false reverts)
    fused_block_vjp: bool = False

    @staticmethod
    def from_config(node) -> "TransformerArgs":
        d = node.to_dict() if hasattr(node, "to_dict") else dict(node)
        d.pop("batch_first", None)  # always batch-first here
        d.pop("dtype", None)  # compute dtype comes from trainer.precision
        d.pop("fused_block_vjp", None)  # set by KWClipConfig.from_config
        allowed = {f.name for f in dataclasses.fields(TransformerArgs)}
        return TransformerArgs(**{k: v for k, v in d.items() if k in allowed})


def make_self_att(args: TransformerArgs, dtype=None, name: str = "self_att"):
    """Branch transformer factory (reference ``kw_branches.py:31-42``)."""
    dtype = args.dtype if dtype is None else dtype
    if args.type == "TransformerEncoder":
        return TransformerEncoder(
            n_layers=args.n_layers,
            d_model=args.d_model,
            nhead=args.nhead,
            dim_feedforward=args.dim_feedforward,
            dropout=args.dropout,
            activation=args.activation,
            layer_norm_eps=args.layer_norm_eps,
            norm_first=args.norm_first,
            dtype=dtype,
            fused_block_vjp=args.fused_block_vjp,
            name=name,
        )
    if args.type == "MultiheadAttentionAndNorm":
        return MultiheadAttentionAndNorm(
            d_model=args.d_model,
            nhead=args.nhead,
            dropout=args.dropout,
            layer_norm_eps=args.layer_norm_eps,
            dtype=dtype,
            fused_block_vjp=args.fused_block_vjp,
            name=name,
        )
    raise NotImplementedError(args.type)


@dataclasses.dataclass(frozen=True)
class VQConfig:
    """Parsed `model_settings.cascaded_branch.vq.args`
    (reference ``my_vector_quantizer.py:15-62``)."""

    temp_type: str = "fixed"  # fixed | learnable | scheduled
    temp_init: float = 0.1
    temp_schedule: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    use_gumbel: bool = False
    hard: bool = True
    time_first: bool = True
    prob_msk: Tuple[int, ...] = (0, 2, 3)
    ground_truth_perplexity: Optional[float] = None
    # fused straight-through quantize+reconstruct (gather forward /
    # analytic custom_vjp backward, `ops.vq.st_codebook_matmul`) — value-
    # and gradient-equivalent to the materialized form; flag kept for A/B
    fused_st: bool = True

    @staticmethod
    def from_config(node) -> "VQConfig":
        d = node.to_dict() if hasattr(node, "to_dict") else dict(node)
        temp = d.get("temp", "fixed=0.1")
        temp_type, temp_init, sched = "fixed", 0.1, (2.0, 0.5, 0.999995)
        if isinstance(temp, str):
            if temp.startswith("learnable="):
                temp_type = "learnable"
                temp_init = float(ast.literal_eval(temp[len("learnable="):]))
            elif temp.startswith("fixed="):
                temp_type = "fixed"
                temp_init = float(ast.literal_eval(temp[len("fixed="):]))
            else:
                temp_type = "scheduled"
                sched = tuple(float(v) for v in ast.literal_eval(temp))
        elif isinstance(temp, (list, tuple)):
            temp_type, sched = "scheduled", tuple(float(v) for v in temp)
        else:
            temp_type, temp_init = "fixed", float(temp)
        return VQConfig(
            temp_type=temp_type,
            temp_init=temp_init,
            temp_schedule=sched,
            use_gumbel=bool(d.get("use_gumbel", False)),
            hard=bool(d.get("hard", True)),
            time_first=bool(d.get("time_first", True)),
            ground_truth_perplexity=d.get("groundTruthPerplexity", None),
            fused_st=bool(d.get("fused_st", True)),
        )


@dataclasses.dataclass(frozen=True)
class KwBnConfig:
    """`keyword.batchnorms` (reference ``kw_branches.py:93-118``)."""

    enabled: bool = True
    type: str = "eachKw"  # eachKw | same
    std_scale: float = 1.0
    learnable: bool = True
    parallel: bool = True

    @staticmethod
    def from_config(node) -> "KwBnConfig":
        if node is None:
            return KwBnConfig(enabled=False)
        d = node.to_dict() if hasattr(node, "to_dict") else dict(node)
        return KwBnConfig(
            enabled=True,
            type=d.get("type", "eachKw"),
            std_scale=float(d.get("std_scale", 1.0)),
            learnable=bool(d.get("learnable", True)),
            parallel=bool(d.get("parallel", True)),
        )


# ------------------------------------------------------------- modules ----


class SimpleVectorQuantizer(nn.Module):
    """Flax wrapper over ``ops.vq.simple_vector_quantizer`` carrying the
    temperature parameter/schedule."""

    cfg: VQConfig

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray] = None,
        *,
        training: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
        codebook: Optional[jnp.ndarray] = None,
        xn: Optional[jnp.ndarray] = None,
        emb: Optional[jnp.ndarray] = None,
        compute_dtype: Any = jnp.bfloat16,
        use_fused_kernel: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Quantize scores `x` — or, when `xn`/`emb` are given instead,
        own the cosine-score computation too: the fused Pallas kernel
        (ops/fused_keyword.py) streams keyword rows past the VMEM-resident
        codebook so no (B*T, V) score buffer ever reaches HBM; the
        fallback builds the same einsum the reference computes."""
        c = self.cfg
        if c.temp_type == "learnable":
            temp = self.param(
                "curr_temp", nn.initializers.constant(c.temp_init), ()
            )
        elif c.temp_type == "fixed":
            temp = jnp.asarray(c.temp_init, jnp.float32)
        else:
            mx, mn, decay = c.temp_schedule
            steps = jnp.asarray(0 if num_updates is None else num_updates)
            temp = jnp.maximum(mx * decay ** steps.astype(jnp.float32), mn)
        rng = None
        if training and c.use_gumbel:
            rng = self.make_rng("vq")

        if x is None:
            assert xn is not None and emb is not None
            st_compatible = (not training) or (c.hard and not c.use_gumbel)
            if use_fused_kernel and st_compatible and c.time_first:
                from ..ops.fused_keyword import fused_cosine_vq

                res = fused_cosine_vq(
                    xn, emb, temp, prob_msk=c.prob_msk, training=training,
                    dtype=compute_dtype,
                )
                if res is not None:
                    gt = c.ground_truth_perplexity
                    if gt is not None:
                        nv = jnp.float32(res["num_vars"])
                        res["diversity_loss"] = (
                            (res["prob_perplexity"] - gt) ** 2
                        ) / (nv - gt) ** 2
                    return res
            # fallback: materialized cosine scores (reference einsum form)
            embf = jnp.asarray(emb, jnp.float32)
            en = embf / jnp.maximum(
                jnp.linalg.norm(embf, axis=-1, keepdims=True), 1e-8
            )
            x = jnp.einsum(
                "bkd,vd->bkv",
                xn.astype(compute_dtype), en.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            codebook = embf
        return simple_vector_quantizer(
            x,
            temp=temp,
            prob_msk=c.prob_msk,
            training=training,
            use_gumbel=c.use_gumbel,
            hard=c.hard,
            rng=rng,
            ground_truth_perplexity=c.ground_truth_perplexity,
            time_first=c.time_first,
            codebook=codebook,
            fused_st=c.fused_st,
        )


class KwBatchNorm(nn.Module):
    """Keyword BatchNorm (fixed-K or dynamic), flax-variable wrapper over
    ``ops.kw_bn``. Params are initialized to (1, 0) and overwritten with
    CLIP token-embedding statistics by the model builder
    (see ``models.kwclip.init_kw_bn_from_token_embedding``), mirroring the
    reference init at ``kw_branches.py:93-118,628-642``."""

    cfg: KwBnConfig
    variant: str  # "fixed" | "dynamic"
    kw_num: int = 8
    kw_dim: int = 512
    momentum: float = 0.1

    @nn.compact
    def __call__(self, keywords: jnp.ndarray, *, training: bool = False) -> jnp.ndarray:
        c = self.cfg
        if self.variant == "fixed" and c.type == "eachKw" and not c.parallel:
            shape = (self.kw_num, self.kw_dim)
        elif self.variant == "fixed" and c.type == "eachKw" and c.parallel:
            shape = (self.kw_dim * self.kw_num,)
        else:
            shape = (self.kw_dim,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.variable("batch_stats", "mean", jnp.zeros, shape)
        var = self.variable("batch_stats", "var", jnp.ones, shape)
        params = {"scale": scale, "bias": bias}
        state = {"mean": mean.value, "var": var.value}
        if self.variant == "fixed":
            y, new_state = kw_bn_ops.kw_bn_fixed(
                keywords,
                params,
                state,
                batchnorm_type=c.type,
                parallel=c.parallel,
                training=training,
                momentum=self.momentum,
            )
        else:
            y, new_state = kw_bn_ops.kw_bn_dynamic(
                keywords, params, state, training=training, momentum=self.momentum
            )
        if training and not self.is_initializing():
            mean.value = new_state["mean"]
            var.value = new_state["var"]
        return y


@dataclasses.dataclass(frozen=True)
class KeywordHeadConfig:
    d_model: int = 768
    text_dim: int = 512
    kw_proj_dims: Optional[Tuple[int, ...]] = None  # None -> single Linear
    kw_proj_dropout: float = 0.1
    vq: VQConfig = VQConfig()
    bn: KwBnConfig = KwBnConfig()
    keyword_num: int = 8
    # fused cosine-score+VQ Pallas kernel (ops/fused_keyword.py): VMEM-
    # resident codebook, no (B*K, V) HBM buffers in either pass. Set by
    # KWClipConfig.from_config (TPU + frozen token embedding only — the
    # kernel does not produce a codebook gradient).
    fused_score_kernel: bool = False
    # compute dtype for the projection and the two (B*K, V)-sized matmuls;
    # bfloat16 under trainer.precision 16 (VQ softmax/statistics stay fp32
    # inside ops/vq.py regardless — only storage of the score/prob buffers
    # narrows, matching the reference's fp16-autocast effective precision)
    dtype: Any = jnp.float32


class KeywordHead(nn.Module):
    """proj -> BN -> cosine-vs-codebook -> VQ -> keyword embeddings.

    Reference ``GeneralBranch.vq_audio_features`` (``kw_branches.py:181-197``)
    plus ``get_keyword_cosine_score`` (:158-179) as a single fused matmul.
    """

    cfg: KeywordHeadConfig
    variant: str = "fixed"  # fixed | dynamic

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # (B, K, d_model)
        token_embedding: jnp.ndarray,  # (V, text_dim), frozen
        *,
        training: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        c = self.cfg
        if c.kw_proj_dims is None:
            x = nn.Dense(c.text_dim, dtype=c.dtype, name="linear_proj")(feats)
        else:
            x = MLPLayers(
                units=c.kw_proj_dims, dropout=c.kw_proj_dropout,
                dtype=c.dtype, name="linear_proj"
            )(feats, deterministic=deterministic)

        if c.bn.enabled:
            x = KwBatchNorm(
                cfg=c.bn,
                variant=self.variant,
                kw_num=c.keyword_num,
                kw_dim=c.text_dim,
                name="bn_layer",
            )(x, training=training)

        # cosine score against the codebook: normalize (fp32 for a stable
        # norm), then one matmul on the MXU with bf16 operands and an fp32
        # score buffer. The buffer must NOT be downcast to bf16: the VQ
        # argmax ranks ~8k cosines packed into [-1, 1], and bf16's 7
        # mantissa bits (resolution ~2^-8 near 1) create exact ties that
        # argmax resolves toward low token ids, skewing codeword selection.
        # The reference's fp16 autocast keeps 10 bits (~8x finer) there
        # (`kw_branches.py:158-179` under `precision: 16`). The score
        # computation itself lives in SimpleVectorQuantizer: the fused
        # kernel path never materializes it to HBM, the fallback builds
        # exactly the einsum above.
        emb = jnp.asarray(token_embedding, jnp.float32)
        xn = x.astype(jnp.float32)
        xn = xn / jnp.maximum(jnp.linalg.norm(xn, axis=-1, keepdims=True), 1e-8)

        vq_results = SimpleVectorQuantizer(cfg=c.vq, name="vector_quantizer")(
            training=training,
            num_updates=num_updates,
            xn=xn,
            emb=emb,
            compute_dtype=c.dtype,
            use_fused_kernel=c.fused_score_kernel,
        )
        keywords = vq_results.pop("keywords")
        return vq_results, keywords


# ------------------------------------------------------------- branches ----


class ParallelBranch(nn.Module):
    """Reference KW_ParallelBranch (``kw_branches.py:200-282``)."""

    ta: TransformerArgs
    audio_dim: int = 768
    out_dim: int = 512
    need_projection: bool = True

    def setup(self):
        self.cls = self.param(
            "cls", nn.initializers.normal(1.0), (1, 1, self.ta.d_model)
        )
        self.self_att = make_self_att(self.ta, name="self_att")
        if self.need_projection:
            self.linear_proj = nn.Dense(self.out_dim, name="linear_proj")

    def _with_cls(self, audio_feat, audio_len):
        b, t = audio_feat.shape[:2]
        src = jnp.concatenate(
            [jnp.tile(self.cls.astype(audio_feat.dtype), (b, 1, 1)), audio_feat], axis=1
        )
        mask = get_keypadding_mask(t + 1, audio_len + 1)
        return src, mask

    def __call__(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        src, mask = self._with_cls(audio_feat, audio_len)
        out = self.self_att(src, key_padding_mask=mask, deterministic=deterministic)
        out = out[:, 0, :]
        if self.need_projection:
            out = self.linear_proj(out)
        return {"parallel_audio_feat": out}

    def extract_hidden_states(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        src, mask = self._with_cls(audio_feat, audio_len)
        hs = self.self_att.extract_hidden_states(
            src, key_padding_mask=mask, deterministic=deterministic
        )
        return tuple(h[:, 1:, :] for h in hs)


class CascadedBranch(nn.Module):
    """Reference KW_CascadedBranch (``kw_branches.py:285-447``), fixed K.

    Returns keywords + vq stats; the parent runs CLIP `encode_keywords`."""

    ta: TransformerArgs
    head: KeywordHeadConfig
    audio_dim: int = 768

    def setup(self):
        self.cls = self.param(
            "cls", nn.initializers.normal(1.0), (1, self.head.keyword_num, self.ta.d_model)
        )
        self.self_att = make_self_att(self.ta, name="self_att")
        self.keyword_head = KeywordHead(cfg=self.head, variant="fixed", name="head")

    def _with_cls(self, audio_feat, audio_len):
        b, t = audio_feat.shape[:2]
        k = self.head.keyword_num
        src = jnp.concatenate(
            [jnp.tile(self.cls.astype(audio_feat.dtype), (b, 1, 1)), audio_feat], axis=1
        )
        mask = get_keypadding_mask(t + k, audio_len + k)
        return src, mask

    def __call__(
        self,
        audio_feat: jnp.ndarray,
        audio_len: jnp.ndarray,
        token_embedding: jnp.ndarray,
        *,
        training: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        k = self.head.keyword_num
        src, mask = self._with_cls(audio_feat, audio_len)
        out = self.self_att(src, key_padding_mask=mask, deterministic=deterministic)
        kw_feats = out[:, :k, :]
        vq_results, keywords = self.keyword_head(
            kw_feats,
            token_embedding,
            training=training,
            num_updates=num_updates,
            deterministic=deterministic,
        )
        return {
            "vq_results": vq_results,
            "keywords": keywords,
            "keyword_num": k,
        }

    def extract_hidden_states(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        k = self.head.keyword_num
        src, mask = self._with_cls(audio_feat, audio_len)
        hs = self.self_att.extract_hidden_states(
            src, key_padding_mask=mask, deterministic=deterministic
        )
        return tuple(h[:, k:, :] for h in hs)

    def get_attention_map(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray
    ) -> jnp.ndarray:
        """Keyword-CLS attention weights for visualization
        (reference ``getAttentionMap``, ``kw_branches.py:384-447``)."""
        src, mask = self._with_cls(audio_feat, audio_len)
        _, weights = self.self_att.extract_attention_map(src, key_padding_mask=mask)
        return weights[:, :, : self.head.keyword_num, :]


class HybridBranch(nn.Module):
    """Reference KW_HybridBranch (``kw_branches.py:450-577``): one shared
    transformer over [parallel CLS; K keyword CLS; frames]."""

    ta: TransformerArgs
    head: KeywordHeadConfig
    audio_dim: int = 768
    out_dim: int = 512
    need_projection: bool = True
    parallel_proj_dims: Optional[Tuple[int, ...]] = None
    parallel_proj_dropout: float = 0.1

    def setup(self):
        self.parallel_cls = self.param(
            "parallel_cls", nn.initializers.normal(1.0), (1, 1, self.ta.d_model)
        )
        self.cascaded_cls = self.param(
            "cascaded_cls",
            nn.initializers.normal(1.0),
            (1, self.head.keyword_num, self.ta.d_model),
        )
        self.self_att = make_self_att(self.ta, name="self_att")
        self.keyword_head = KeywordHead(cfg=self.head, variant="fixed", name="head")
        if self.need_projection:
            if self.parallel_proj_dims is not None:
                self.parallel_proj = MLPLayers(
                    units=self.parallel_proj_dims,
                    dropout=self.parallel_proj_dropout,
                    name="parallel_proj",
                )
            else:
                self.parallel_proj = nn.Dense(self.out_dim, name="parallel_proj")

    def _with_cls(self, audio_feat, audio_len):
        b, t = audio_feat.shape[:2]
        k = self.head.keyword_num + 1
        cls = jnp.concatenate(
            [self.parallel_cls, self.cascaded_cls], axis=1
        ).astype(audio_feat.dtype)
        src = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), audio_feat], axis=1)
        mask = get_keypadding_mask(t + k, audio_len + k)
        return src, mask, k

    def __call__(
        self,
        audio_feat: jnp.ndarray,
        audio_len: jnp.ndarray,
        token_embedding: jnp.ndarray,
        *,
        training: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        kw = self.head.keyword_num
        src, mask, _ = self._with_cls(audio_feat, audio_len)
        out = self.self_att(src, key_padding_mask=mask, deterministic=deterministic)
        parallel_feat = out[:, 0, :]
        if self.need_projection:
            parallel_feat = self.parallel_proj(parallel_feat)
        kw_feats = out[:, 1 : 1 + kw, :]
        vq_results, keywords = self.keyword_head(
            kw_feats,
            token_embedding,
            training=training,
            num_updates=num_updates,
            deterministic=deterministic,
        )
        return {
            "parallel_audio_feat": parallel_feat,
            "vq_results": vq_results,
            "keywords": keywords,
            "keyword_num": kw,
        }

    def extract_hidden_states(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        src, mask, k = self._with_cls(audio_feat, audio_len)
        hs = self.self_att.extract_hidden_states(
            src, key_padding_mask=mask, deterministic=deterministic
        )
        return tuple(h[:, k:, :] for h in hs)


class CascadedBranchPlus(nn.Module):
    """Reference KW_CascadedBranchPlus (``kw_branches.py:580-777``):
    transformer -> CIF downsampling -> dynamic keyword head."""

    ta: TransformerArgs
    head: KeywordHeadConfig
    cif: CifConfig
    audio_dim: int = 768

    def setup(self):
        self.self_att = make_self_att(self.ta, name="self_att")
        self.downsampling = CIF(cfg=self.cif, name="downsampling")
        self.keyword_head = KeywordHead(cfg=self.head, variant="dynamic", name="head")

    def __call__(
        self,
        audio_feat: jnp.ndarray,
        audio_len: jnp.ndarray,
        token_embedding: jnp.ndarray,
        *,
        target_len: Optional[jnp.ndarray] = None,
        global_step: Optional[jnp.ndarray] = None,
        training: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        b, t = audio_feat.shape[:2]
        pad_mask = get_keypadding_mask(t, audio_len)
        x = self.self_att(audio_feat, key_padding_mask=pad_mask, deterministic=deterministic)
        dsample = self.downsampling(
            x,
            pad_mask,
            target_lengths=target_len if training else None,
            global_step=global_step,
            training=training,
            deterministic=deterministic,
        )
        if target_len is not None:
            dsample["target_len"] = target_len
        vq_results, keywords = self.keyword_head(
            dsample["dsample_feats"],
            token_embedding,
            training=training,
            num_updates=num_updates,
            deterministic=deterministic,
        )
        return {
            "vq_results": vq_results,
            "keywords": keywords,
            "dsample_results": dsample,
            "keywords_len": dsample["dsample_feats_length"],
        }

    def extract_hidden_states(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        pad_mask = get_keypadding_mask(audio_feat.shape[1], audio_len)
        return tuple(
            self.self_att.extract_hidden_states(
                audio_feat, key_padding_mask=pad_mask, deterministic=deterministic
            )
        )


class HybridBranchPlus(nn.Module):
    """Reference KW_HybridBranchPlus (``kw_branches.py:780-891``)."""

    ta: TransformerArgs
    head: KeywordHeadConfig
    cif: CifConfig
    audio_dim: int = 768
    out_dim: int = 512

    def setup(self):
        self.cls = self.param(
            "cls", nn.initializers.normal(1.0), (1, 1, self.ta.d_model)
        )
        self.self_att = make_self_att(self.ta, name="self_att")
        self.downsampling = CIF(cfg=self.cif, name="downsampling")
        self.keyword_head = KeywordHead(cfg=self.head, variant="dynamic", name="head")
        self.parallel_proj = nn.Dense(self.out_dim, name="parallel_proj")

    def __call__(
        self,
        audio_feat: jnp.ndarray,
        audio_len: jnp.ndarray,
        token_embedding: jnp.ndarray,
        *,
        target_len: Optional[jnp.ndarray] = None,
        global_step: Optional[jnp.ndarray] = None,
        training: bool = False,
        num_updates: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        b, t = audio_feat.shape[:2]
        src = jnp.concatenate(
            [jnp.tile(self.cls.astype(audio_feat.dtype), (b, 1, 1)), audio_feat], axis=1
        )
        mask = get_keypadding_mask(t + 1, audio_len + 1)
        out = self.self_att(src, key_padding_mask=mask, deterministic=deterministic)
        parallel_feat = self.parallel_proj(out[:, 0, :])
        frames = out[:, 1:, :]
        dsample = self.downsampling(
            frames,
            mask[:, 1:],
            target_lengths=target_len if training else None,
            global_step=global_step,
            training=training,
            deterministic=deterministic,
        )
        if target_len is not None:
            dsample["target_len"] = target_len
        vq_results, keywords = self.keyword_head(
            dsample["dsample_feats"],
            token_embedding,
            training=training,
            num_updates=num_updates,
            deterministic=deterministic,
        )
        return {
            "parallel_audio_feat": parallel_feat,
            "vq_results": vq_results,
            "keywords": keywords,
            "dsample_results": dsample,
            "keywords_len": dsample["dsample_feats_length"],
        }

    def extract_hidden_states(
        self, audio_feat: jnp.ndarray, audio_len: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        b, t = audio_feat.shape[:2]
        src = jnp.concatenate(
            [jnp.tile(self.cls.astype(audio_feat.dtype), (b, 1, 1)), audio_feat], axis=1
        )
        mask = get_keypadding_mask(t + 1, audio_len + 1)
        hs = self.self_att.extract_hidden_states(
            src, key_padding_mask=mask, deterministic=deterministic
        )
        return tuple(h[:, 1:, :] for h in hs)
