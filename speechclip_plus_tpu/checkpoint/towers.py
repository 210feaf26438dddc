"""Frozen-tower weight importers: torch state dicts -> Flax pytrees.

Covers the three serialization families the reference ecosystem uses
(reference SURVEY §3.5 / `avssl/module/speech_encoder_plus.py:382-388`,
`avssl/module/clip_official.py:52`):

  - fairseq HuBERT checkpoints (`hubert_base_ls960.pt`, naming
    `feature_extractor.conv_layers.{i}.0.*`, `encoder.layers.{i}.self_attn.*`),
    also embedded inside Lightning ckpts under `audio_encoder.encoder.`;
  - HuggingFace `transformers` Hubert state dicts (used as the local test
    oracle; same math, different names);
  - OpenAI CLIP model state dicts (`visual.transformer.resblocks.{i}.*`),
    also embedded inside Lightning ckpts under `clip.model.`;
  - HuggingFace CLIPModel state dicts (test oracle).

All converters take flat `{name: np.ndarray}` dicts (see
`torch_import.load_torch_state_dict`) and emit nested Flax param dicts.
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

from .torch_import import _np, t2j_dense, t2j_layernorm, t2j_mha

__all__ = [
    "materialize_weight_norm",
    "fairseq_hubert_to_flax",
    "hf_hubert_to_flax",
    "hf_wavlm_to_flax",
    "hf_data2vec_audio_to_flax",
    "openai_clip_to_flax",
    "hf_clip_to_flax",
    "reduce_token_embedding",
    "hubert_config_from_fairseq_sd",
    "clip_config_from_openai_sd",
]


def stack_layer_params(per_layer: list) -> Dict:
    """List of per-layer param trees -> one tree with a leading layer axis
    (the layout `nn.scan(variable_axes={"params": 0})` expects)."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *per_layer)


def materialize_weight_norm(g: np.ndarray, v: np.ndarray, dim: int = 2) -> np.ndarray:
    """torch weight_norm(w, dim): w = g * v / ||v|| with the norm taken over
    every axis except `dim` (fairseq pos_conv uses dim=2 = kernel axis)."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (v * (g / np.maximum(norm, 1e-12))).astype(v.dtype)


def _conv1d(sd: Mapping, w_key: str, b_key: str = None) -> Dict:
    out = {"kernel": _np(sd[w_key]).transpose(2, 1, 0)}  # (Cout,Cin,K)->(K,Cin,Cout)
    if b_key is not None and b_key in sd:
        out["bias"] = _np(sd[b_key])
    return out


def _pos_conv_kernel(sd: Mapping, prefix: str) -> Dict:
    """Handle plain weight, classic weight_norm (weight_g/weight_v) and the
    torch>=2 parametrizations layout."""
    if f"{prefix}weight" in sd:
        w = _np(sd[f"{prefix}weight"])
    elif f"{prefix}weight_g" in sd:
        w = materialize_weight_norm(_np(sd[f"{prefix}weight_g"]), _np(sd[f"{prefix}weight_v"]))
    else:
        w = materialize_weight_norm(
            _np(sd[f"{prefix}parametrizations.weight.original0"]),
            _np(sd[f"{prefix}parametrizations.weight.original1"]),
        )
    return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[f"{prefix}bias"])}


# ---------------------------------------------------------------- HuBERT ----


def fairseq_hubert_to_flax(sd: Mapping, cfg, prefix: str = "") -> Dict:
    """fairseq HubertModel state dict -> models/hubert.HubertModel params.

    `prefix` allows extraction out of a Lightning checkpoint
    (`audio_encoder.encoder.`)."""
    p = prefix
    fe = {}
    for i in range(len(cfg.conv_layers)):
        fe[f"conv_{i}"] = _conv1d(
            sd, f"{p}feature_extractor.conv_layers.{i}.0.weight",
            f"{p}feature_extractor.conv_layers.{i}.0.bias",
        )
        if cfg.extractor_mode == "group_norm" and i == 0:
            fe["gn_0"] = t2j_layernorm(sd, f"{p}feature_extractor.conv_layers.0.2.")
        elif cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = t2j_layernorm(sd, f"{p}feature_extractor.conv_layers.{i}.2.1.")

    params = {
        "feature_extractor": fe,
        "layer_norm": t2j_layernorm(sd, f"{p}layer_norm."),
        "pos_conv": {"conv": _pos_conv_kernel(sd, f"{p}encoder.pos_conv.0.")},
        "encoder_layer_norm": t2j_layernorm(sd, f"{p}encoder.layer_norm."),
    }
    if f"{p}post_extract_proj.weight" in sd:
        params["post_extract_proj"] = t2j_dense(sd, f"{p}post_extract_proj.")
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "q_proj": t2j_dense(sd, f"{lp}self_attn.q_proj."),
            "k_proj": t2j_dense(sd, f"{lp}self_attn.k_proj."),
            "v_proj": t2j_dense(sd, f"{lp}self_attn.v_proj."),
            "out_proj": t2j_dense(sd, f"{lp}self_attn.out_proj."),
            "self_attn_layer_norm": t2j_layernorm(sd, f"{lp}self_attn_layer_norm."),
            "fc1": t2j_dense(sd, f"{lp}fc1."),
            "fc2": t2j_dense(sd, f"{lp}fc2."),
            "final_layer_norm": t2j_layernorm(sd, f"{lp}final_layer_norm."),
        })
    if getattr(cfg, "scan_layers", False):
        params["layers"] = {"layer": stack_layer_params(layers)}
    else:
        for i, l in enumerate(layers):
            params[f"layers_{i}"] = l
    return params


def hf_hubert_to_flax(sd: Mapping, cfg, prefix: str = "") -> Dict:
    """HuggingFace transformers HubertModel state dict -> our params."""
    p = prefix
    fe = {}
    for i in range(len(cfg.conv_layers)):
        fe[f"conv_{i}"] = _conv1d(
            sd, f"{p}feature_extractor.conv_layers.{i}.conv.weight",
            f"{p}feature_extractor.conv_layers.{i}.conv.bias",
        )
        if cfg.extractor_mode == "group_norm" and i == 0:
            fe["gn_0"] = t2j_layernorm(sd, f"{p}feature_extractor.conv_layers.0.layer_norm.")
        elif cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = t2j_layernorm(sd, f"{p}feature_extractor.conv_layers.{i}.layer_norm.")

    params = {
        "feature_extractor": fe,
        "layer_norm": t2j_layernorm(sd, f"{p}feature_projection.layer_norm."),
        "post_extract_proj": t2j_dense(sd, f"{p}feature_projection.projection."),
        "pos_conv": {"conv": _pos_conv_kernel(sd, f"{p}encoder.pos_conv_embed.conv.")},
        "encoder_layer_norm": t2j_layernorm(sd, f"{p}encoder.layer_norm."),
    }
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "q_proj": t2j_dense(sd, f"{lp}attention.q_proj."),
            "k_proj": t2j_dense(sd, f"{lp}attention.k_proj."),
            "v_proj": t2j_dense(sd, f"{lp}attention.v_proj."),
            "out_proj": t2j_dense(sd, f"{lp}attention.out_proj."),
            "self_attn_layer_norm": t2j_layernorm(sd, f"{lp}layer_norm."),
            "fc1": t2j_dense(sd, f"{lp}feed_forward.intermediate_dense."),
            "fc2": t2j_dense(sd, f"{lp}feed_forward.output_dense."),
            "final_layer_norm": t2j_layernorm(sd, f"{lp}final_layer_norm."),
        })
    if getattr(cfg, "scan_layers", False):
        params["layers"] = {"layer": stack_layer_params(layers)}
    else:
        for i, l in enumerate(layers):
            params[f"layers_{i}"] = l
    return params


def hf_wavlm_to_flax(sd: Mapping, cfg, prefix: str = "") -> Dict:
    """HuggingFace WavLMModel state dict -> our params.

    Same tree as the HuBERT family plus: per-layer gated-rel-pos params
    (`gru_rel_pos_linear`, `gru_rel_pos_const`) and the bucketed
    relative-position table, which HF keeps in layer 0's attention and a
    scanned homogeneous stack hoists to the model (`rel_attn_embed`)."""
    p = prefix
    fe = {}
    for i in range(len(cfg.conv_layers)):
        fe[f"conv_{i}"] = _conv1d(
            sd, f"{p}feature_extractor.conv_layers.{i}.conv.weight",
            f"{p}feature_extractor.conv_layers.{i}.conv.bias",
        )
        if cfg.extractor_mode == "group_norm" and i == 0:
            fe["gn_0"] = t2j_layernorm(
                sd, f"{p}feature_extractor.conv_layers.0.layer_norm.")
        elif cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = t2j_layernorm(
                sd, f"{p}feature_extractor.conv_layers.{i}.layer_norm.")

    params = {
        "feature_extractor": fe,
        "layer_norm": t2j_layernorm(sd, f"{p}feature_projection.layer_norm."),
        "post_extract_proj": t2j_dense(sd, f"{p}feature_projection.projection."),
        "pos_conv": {"conv": _pos_conv_kernel(
            sd, f"{p}encoder.pos_conv_embed.conv.")},
        "encoder_layer_norm": t2j_layernorm(sd, f"{p}encoder.layer_norm."),
        "rel_attn_embed": _np(
            sd[f"{p}encoder.layers.0.attention.rel_attn_embed.weight"]
        ),
    }
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "q_proj": t2j_dense(sd, f"{lp}attention.q_proj."),
            "k_proj": t2j_dense(sd, f"{lp}attention.k_proj."),
            "v_proj": t2j_dense(sd, f"{lp}attention.v_proj."),
            "out_proj": t2j_dense(sd, f"{lp}attention.out_proj."),
            "gru_rel_pos_linear": t2j_dense(
                sd, f"{lp}attention.gru_rel_pos_linear."),
            "gru_rel_pos_const": _np(sd[f"{lp}attention.gru_rel_pos_const"]),
            "self_attn_layer_norm": t2j_layernorm(sd, f"{lp}layer_norm."),
            "fc1": t2j_dense(sd, f"{lp}feed_forward.intermediate_dense."),
            "fc2": t2j_dense(sd, f"{lp}feed_forward.output_dense."),
            "final_layer_norm": t2j_layernorm(sd, f"{lp}final_layer_norm."),
        })
    if getattr(cfg, "scan_layers", False):
        params["layers"] = {"layer": stack_layer_params(layers)}
    else:
        for i, l in enumerate(layers):
            params[f"layers_{i}"] = l
    return params


def hf_data2vec_audio_to_flax(sd: Mapping, cfg, prefix: str = "") -> Dict:
    """HuggingFace Data2VecAudioModel state dict -> our params.

    wav2vec2-architecture tower with a layer-norm conv frontend and the
    5-layer stacked positional conv (`pos_conv_depth`, plain weights)."""
    p = prefix
    fe = {}
    for i in range(len(cfg.conv_layers)):
        fe[f"conv_{i}"] = _conv1d(
            sd, f"{p}feature_extractor.conv_layers.{i}.conv.weight",
            f"{p}feature_extractor.conv_layers.{i}.conv.bias",
        )
        fe[f"ln_{i}"] = t2j_layernorm(
            sd, f"{p}feature_extractor.conv_layers.{i}.layer_norm.")

    pos = {}
    for j in range(int(getattr(cfg, "pos_conv_depth", 1) or 1)):
        pos[f"conv_{j}"] = _conv1d(
            sd, f"{p}encoder.pos_conv_embed.layers.{j}.conv.weight",
            f"{p}encoder.pos_conv_embed.layers.{j}.conv.bias",
        )
    params = {
        "feature_extractor": fe,
        "layer_norm": t2j_layernorm(sd, f"{p}feature_projection.layer_norm."),
        "post_extract_proj": t2j_dense(sd, f"{p}feature_projection.projection."),
        "pos_conv": pos,
        "encoder_layer_norm": t2j_layernorm(sd, f"{p}encoder.layer_norm."),
    }
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "q_proj": t2j_dense(sd, f"{lp}attention.q_proj."),
            "k_proj": t2j_dense(sd, f"{lp}attention.k_proj."),
            "v_proj": t2j_dense(sd, f"{lp}attention.v_proj."),
            "out_proj": t2j_dense(sd, f"{lp}attention.out_proj."),
            "self_attn_layer_norm": t2j_layernorm(sd, f"{lp}layer_norm."),
            "fc1": t2j_dense(sd, f"{lp}feed_forward.intermediate_dense."),
            "fc2": t2j_dense(sd, f"{lp}feed_forward.output_dense."),
            "final_layer_norm": t2j_layernorm(sd, f"{lp}final_layer_norm."),
        })
    if getattr(cfg, "scan_layers", False):
        params["layers"] = {"layer": stack_layer_params(layers)}
    else:
        for i, l in enumerate(layers):
            params[f"layers_{i}"] = l
    return params


def hubert_config_from_fairseq_sd(sd: Mapping, prefix: str = ""):
    """Infer base-vs-large from tensor shapes in a fairseq/Lightning dict."""
    from ..models.hubert import HubertConfig

    d_model = _np(sd[f"{prefix}encoder.layers.0.fc1.weight"]).shape[1]
    return HubertConfig.large() if d_model == 1024 else HubertConfig.base()


# ------------------------------------------------------------------ CLIP ----


def _pack_clip_blocks(blocks: list, scan_layers: bool) -> Dict:
    if scan_layers:
        return {"blocks": {"block": stack_layer_params(blocks)}}
    return {f"resblocks_{i}": b for i, b in enumerate(blocks)}


def _clip_blocks(sd: Mapping, prefix: str, n_layers: int, scan_layers: bool) -> Dict:
    blocks = []
    for i in range(n_layers):
        bp = f"{prefix}resblocks.{i}."
        blocks.append({
            "attn": t2j_mha(sd, f"{bp}attn."),
            "ln_1": t2j_layernorm(sd, f"{bp}ln_1."),
            "ln_2": t2j_layernorm(sd, f"{bp}ln_2."),
            "c_fc": t2j_dense(sd, f"{bp}mlp.c_fc."),
            "c_proj": t2j_dense(sd, f"{bp}mlp.c_proj."),
        })
    return _pack_clip_blocks(blocks, scan_layers)


def openai_clip_to_flax(sd: Mapping, cfg, prefix: str = "") -> Dict:
    """OpenAI CLIP state dict (`visual.*` / `transformer.*` / text params at
    top level) -> models/clip.ClipModel params. `prefix` handles Lightning
    embedding (`clip.model.`)."""
    p = prefix
    visual = {
        "conv1": {"kernel": _np(sd[f"{p}visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd[f"{p}visual.class_embedding"]),
        "positional_embedding": _np(sd[f"{p}visual.positional_embedding"]),
        "ln_pre": t2j_layernorm(sd, f"{p}visual.ln_pre."),
        "transformer": _clip_blocks(
            sd, f"{p}visual.transformer.", cfg.vision_layers, cfg.scan_layers
        ),
        "ln_post": t2j_layernorm(sd, f"{p}visual.ln_post."),
        "proj": _np(sd[f"{p}visual.proj"]),
    }
    text = {
        "token_embedding": {"embedding": _np(sd[f"{p}token_embedding.weight"])},
        "positional_embedding": _np(sd[f"{p}positional_embedding"]),
        "transformer": _clip_blocks(
            sd, f"{p}transformer.", cfg.text_layers, cfg.scan_layers
        ),
        "ln_final": t2j_layernorm(sd, f"{p}ln_final."),
        "text_projection": _np(sd[f"{p}text_projection"]),
    }
    return {"visual": visual, "text": text, "logit_scale": _np(sd[f"{p}logit_scale"])}


def _hf_clip_blocks(sd: Mapping, prefix: str, n_layers: int, scan_layers: bool) -> Dict:
    blocks = []
    for i in range(n_layers):
        bp = f"{prefix}layers.{i}."
        qw = _np(sd[f"{bp}self_attn.q_proj.weight"])
        kw = _np(sd[f"{bp}self_attn.k_proj.weight"])
        vw = _np(sd[f"{bp}self_attn.v_proj.weight"])
        qb = _np(sd[f"{bp}self_attn.q_proj.bias"])
        kb = _np(sd[f"{bp}self_attn.k_proj.bias"])
        vb = _np(sd[f"{bp}self_attn.v_proj.bias"])
        blocks.append({
            "attn": {
                "in_proj": {
                    "kernel": np.concatenate([qw, kw, vw], axis=0).T,
                    "bias": np.concatenate([qb, kb, vb], axis=0),
                },
                "out_proj": t2j_dense(sd, f"{bp}self_attn.out_proj."),
            },
            "ln_1": t2j_layernorm(sd, f"{bp}layer_norm1."),
            "ln_2": t2j_layernorm(sd, f"{bp}layer_norm2."),
            "c_fc": t2j_dense(sd, f"{bp}mlp.fc1."),
            "c_proj": t2j_dense(sd, f"{bp}mlp.fc2."),
        })
    return _pack_clip_blocks(blocks, scan_layers)


def hf_clip_to_flax(sd: Mapping, cfg) -> Dict:
    """HuggingFace CLIPModel state dict -> our params (test oracle path)."""
    visual = {
        "conv1": {
            "kernel": _np(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": t2j_layernorm(sd, "vision_model.pre_layrnorm."),
        "transformer": _hf_clip_blocks(
            sd, "vision_model.encoder.", cfg.vision_layers, cfg.scan_layers
        ),
        "ln_post": t2j_layernorm(sd, "vision_model.post_layernorm."),
        "proj": _np(sd["visual_projection.weight"]).T,
    }
    text = {
        "token_embedding": {"embedding": _np(sd["text_model.embeddings.token_embedding.weight"])},
        "positional_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "transformer": _hf_clip_blocks(
            sd, "text_model.encoder.", cfg.text_layers, cfg.scan_layers
        ),
        "ln_final": t2j_layernorm(sd, "text_model.final_layer_norm."),
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    return {"visual": visual, "text": text, "logit_scale": _np(sd["logit_scale"])}


def clip_config_from_openai_sd(sd: Mapping, prefix: str = ""):
    """Infer a ClipConfig from an OpenAI-format state dict (ViT variants)."""
    from ..models.clip import ClipConfig

    p = prefix
    vision_width = _np(sd[f"{p}visual.conv1.weight"]).shape[0]
    patch = _np(sd[f"{p}visual.conv1.weight"]).shape[-1]
    n_pos = _np(sd[f"{p}visual.positional_embedding"]).shape[0]
    grid = int(round((n_pos - 1) ** 0.5))
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith(f"{p}visual.transformer.resblocks.")}
    ) if prefix == "" else len(
        {k[len(p):].split(".")[3] for k in sd if k.startswith(f"{p}visual.transformer.resblocks.")}
    )
    text_width = _np(sd[f"{p}ln_final.weight"]).shape[0]
    text_layers = len(
        {k[len(p):].split(".")[2] for k in sd
         if k.startswith(f"{p}transformer.resblocks.")}
    )
    vocab, _ = _np(sd[f"{p}token_embedding.weight"]).shape
    embed_dim = _np(sd[f"{p}text_projection"]).shape[1]
    return ClipConfig(
        embed_dim=embed_dim,
        image_resolution=grid * patch,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_heads=vision_width // 64,
        vision_patch_size=patch,
        context_length=_np(sd[f"{p}positional_embedding"]).shape[0],
        vocab_size=vocab,
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=text_layers,
        sot_id=vocab - 2,
        eot_id=vocab - 1,
    )


def reduce_token_embedding(params: Dict, selected_ids: Sequence[int]) -> Dict:
    """Slice the text token-embedding table to a usage-ranked id subset
    (reference `clip_official.py:63-107`). Returns new params; callers update
    `ClipConfig.vocab_size/sot_id/eot_id` via the original->reduced map from
    `data.tokenizer.ReducedVocab`."""
    ids = np.asarray(selected_ids)
    emb = params["text"]["token_embedding"]["embedding"][ids]
    out = dict(params)
    out["text"] = dict(params["text"])
    out["text"]["token_embedding"] = {"embedding": emb}
    return out
