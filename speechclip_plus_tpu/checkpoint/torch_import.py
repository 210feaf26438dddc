"""torch state_dict -> Flax parameter pytree converters.

Needed to load the reference's released artifacts (reference ``SURVEY`` §3.5):
  - fairseq HuBERT ensembles (hubert_base_ls960.pt / hubert_large_ll60k.pt),
  - OpenAI CLIP JIT archives,
  - PyTorch-Lightning SpeechCLIP(+) .ckpt files (full state_dict + config).

All converters work on plain ``{name: np.ndarray}`` dicts so they run without
torch at inference time; ``torch.load`` shims are separated out.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = [
    "t2j_dense",
    "t2j_layernorm",
    "t2j_mha",
    "t2j_transformer_encoder_layer",
    "t2j_transformer_encoder",
    "t2j_mha_and_norm",
    "t2j_mlp_layers",
    "t2j_batchnorm",
    "load_torch_state_dict",
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def t2j_dense(sd: Mapping, prefix: str) -> Dict:
    """torch nn.Linear -> flax nn.Dense (kernel transposed to (in, out))."""
    out = {"kernel": _np(sd[f"{prefix}weight"]).T}
    if f"{prefix}bias" in sd:
        out["bias"] = _np(sd[f"{prefix}bias"])
    return out


def t2j_layernorm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _np(sd[f"{prefix}weight"]), "bias": _np(sd[f"{prefix}bias"])}


def t2j_batchnorm(sd: Mapping, prefix: str):
    """torch BatchNorm1d -> (params, state) for ops.kw_bn."""
    params = {"scale": _np(sd[f"{prefix}weight"]), "bias": _np(sd[f"{prefix}bias"])}
    state = {
        "mean": _np(sd[f"{prefix}running_mean"]),
        "var": _np(sd[f"{prefix}running_var"]),
    }
    return params, state


def t2j_mha(sd: Mapping, prefix: str) -> Dict:
    """torch nn.MultiheadAttention -> nn.MultiheadAttention (ours).

    torch packs q,k,v as in_proj_weight (3D, D); our Dense kernel is (D, 3D).
    """
    return {
        "in_proj": {
            "kernel": _np(sd[f"{prefix}in_proj_weight"]).T,
            "bias": _np(sd[f"{prefix}in_proj_bias"]),
        },
        "out_proj": t2j_dense(sd, f"{prefix}out_proj."),
    }


def t2j_transformer_encoder_layer(sd: Mapping, prefix: str) -> Dict:
    return {
        "self_attn": t2j_mha(sd, f"{prefix}self_attn."),
        "linear1": t2j_dense(sd, f"{prefix}linear1."),
        "linear2": t2j_dense(sd, f"{prefix}linear2."),
        "norm1": t2j_layernorm(sd, f"{prefix}norm1."),
        "norm2": t2j_layernorm(sd, f"{prefix}norm2."),
    }


def t2j_transformer_encoder(sd: Mapping, prefix: str, n_layers: int) -> Dict:
    """Reference branch TransformerEncoder (``TransformerModels.py:47-97``):
    torch names ``model.layers.{i}.*`` and ``model.norm.*``."""
    out = {
        f"layer_{i}": t2j_transformer_encoder_layer(sd, f"{prefix}model.layers.{i}.")
        for i in range(n_layers)
    }
    out["norm"] = t2j_layernorm(sd, f"{prefix}model.norm.")
    return out


def t2j_mha_and_norm(sd: Mapping, prefix: str) -> Dict:
    """Reference MultiheadAttentionAndNorm (``TransformerModels.py:100-136``)."""
    return {
        "multihead_attn_layer": t2j_mha(sd, f"{prefix}multihead_attn_layer."),
        "attentionBlock_Norm": t2j_layernorm(sd, f"{prefix}attentionBlock_Norm."),
    }


def t2j_mlp_layers(sd: Mapping, prefix: str, n_dense: int) -> Dict:
    """Reference MLPLayers: torch Sequential indices 0, 3, 6, ... are Linear."""
    out = {}
    for i in range(n_dense):
        out[f"dense_{i}"] = t2j_dense(sd, f"{prefix}sequential.{3 * i}.")
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load any torch checkpoint into a flat numpy state dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "detach") or isinstance(v, np.ndarray)}
