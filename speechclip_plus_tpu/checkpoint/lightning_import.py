"""PyTorch-Lightning SpeechCLIP(+) checkpoint importer.

The reference distributes nine trained `.ckpt` files (`download_ckpts.sh`)
containing a full `state_dict` (frozen HuBERT + CLIP + branch weights + BN
stats + loss temperature), the model config inside `hyper_parameters`
(persisted by `save_hyperparameters()`, `avssl/model/base_model.py:14`), and
PL loop state. This module maps one of those files onto our Flax model:

  - config: unpickled without the `avssl` package via a shim class and
    converted to our ConfigNode -> KWClipConfig;
  - `audio_encoder.encoder.*`   -> models/hubert (fairseq naming);
  - `clip.model.*`              -> models/clip (OpenAI naming; reduced
    token-embedding table comes through as-is, with special-token ids from
    the vocab-usage asset);
  - branch/projection weights   -> models/branches naming;
  - `criterion.temperature`     -> `criterion_log_inv_temp`;
  - BatchNorm running stats     -> the `batch_stats` collection.
"""
from __future__ import annotations

import io
import pickle
from collections import OrderedDict
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import ConfigNode
from .torch_import import _np, t2j_dense, t2j_layernorm, t2j_mha_and_norm, \
    t2j_transformer_encoder, t2j_batchnorm
from .towers import fairseq_hubert_to_flax, openai_clip_to_flax

__all__ = ["load_lightning_checkpoint", "lightning_to_kwclip"]


class _NamespaceShim:
    """Stand-in for avssl's OrderedNamespace during unpickling."""

    def __setstate__(self, state):
        self.state = state


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "OrderedNamespace":
            return _NamespaceShim
        return super().find_class(module, name)


def _to_plain(obj):
    if isinstance(obj, _NamespaceShim):
        return _to_plain(obj.state)
    if isinstance(obj, (dict, OrderedDict)):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_plain(v) for v in obj)
    return obj


def load_lightning_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], ConfigNode, Dict]:
    """Returns (flat numpy state dict, reference ConfigNode, meta)."""
    import torch

    with open(path, "rb") as f:
        data = f.read()
    try:
        ckpt = torch.load(io.BytesIO(data), map_location="cpu", weights_only=False,
                          pickle_module=_ShimPickleModule)
    except TypeError:  # older torch without pickle_module kw on this path
        ckpt = torch.load(io.BytesIO(data), map_location="cpu", weights_only=False)

    sd = {k: _np(v) for k, v in ckpt["state_dict"].items()}
    hp = _to_plain(ckpt.get("hyper_parameters", ckpt.get("hparams", {})))
    cfg_node = ConfigNode(hp.get("config", hp) or {})
    meta = {
        "epoch": ckpt.get("epoch"),
        "global_step": ckpt.get("global_step"),
    }
    return sd, cfg_node, meta


class _ShimPickleModule:
    """pickle module facade whose Unpickler substitutes OrderedNamespace."""

    Unpickler = _ShimUnpickler
    load = staticmethod(lambda f, **kw: _ShimUnpickler(f, **kw).load())
    loads = staticmethod(lambda b, **kw: _ShimUnpickler(io.BytesIO(b), **kw).load())


def _import_branch_transformer(sd: Dict, prefix: str, ta) -> Dict:
    """self_att of a branch: TransformerEncoder or MultiheadAttentionAndNorm."""
    if ta.type == "TransformerEncoder":
        return t2j_transformer_encoder(sd, f"{prefix}self_att.", ta.n_layers)
    return t2j_mha_and_norm(sd, f"{prefix}self_att.")


def _import_mlp_or_linear(sd: Dict, prefix: str) -> Dict:
    """linear_proj is either a single nn.Linear or MLPLayers."""
    if f"{prefix}weight" in sd:
        return t2j_dense(sd, prefix)
    # MLPLayers: sequential indices 0,3,6,... are Linear
    out = {}
    i = 0
    while f"{prefix}sequential.{3 * i}.weight" in sd:
        out[f"dense_{i}"] = t2j_dense(sd, f"{prefix}sequential.{3 * i}.")
        i += 1
    if not out:
        raise KeyError(f"No linear/MLP weights under {prefix}")
    return out


def _import_cif(sd: Dict, prefix: str, cif_cfg) -> Dict:
    out = {}
    for i in range(cif_cfg.num_layer):
        w = _np(sd[f"{prefix}conv.{3 * i}.weight"])  # (Cout, Cin, K)
        out[f"conv_{i}"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": _np(sd[f"{prefix}conv.{3 * i}.bias"]),
        }
    out["weight_proj"] = t2j_dense(sd, f"{prefix}weight_proj.1.")
    if f"{prefix}cif_output_proj.weight" in sd:
        out["cif_output_proj"] = t2j_dense(sd, f"{prefix}cif_output_proj.")
    return out


def _import_kw_bn(sd: Dict, prefix: str, head_cfg, dynamic: bool):
    """Returns (params, stats) for the keyword BatchNorm."""
    if dynamic or head_cfg.bn.type == "same" or head_cfg.bn.parallel:
        params, stats = t2j_batchnorm(sd, f"{prefix}bn_layer.")
        return params, stats
    # per-keyword ModuleList -> stacked (K, D)
    k = head_cfg.keyword_num
    ws, bs, ms, vs = [], [], [], []
    for i in range(k):
        p, s = t2j_batchnorm(sd, f"{prefix}bn_layers.{i}.")
        ws.append(p["scale"]); bs.append(p["bias"])
        ms.append(s["mean"]); vs.append(s["var"])
    return (
        {"scale": np.stack(ws), "bias": np.stack(bs)},
        {"mean": np.stack(ms), "var": np.stack(vs)},
    )


def _import_keyword_head(sd: Dict, prefix: str, head_cfg, dynamic: bool):
    params: Dict = {"linear_proj": _import_mlp_or_linear(sd, f"{prefix}linear_proj.")}
    stats: Dict = {}
    if f"{prefix}bn_layer.bn_layer.weight" in sd or f"{prefix}bn_layer.bn_layers.0.weight" in sd:
        bn_params, bn_stats = _import_kw_bn(sd, f"{prefix}bn_layer.", head_cfg, dynamic)
        params["bn_layer"] = bn_params
        stats["bn_layer"] = bn_stats
    if f"{prefix}vector_quantizer.curr_temp" in sd:
        t = _np(sd[f"{prefix}vector_quantizer.curr_temp"]).reshape(())
        if head_cfg.vq.temp_type == "learnable":
            params["vector_quantizer"] = {"curr_temp": t}
    return params, stats


def lightning_to_kwclip(
    sd: Dict[str, np.ndarray], model_cfg, *, hubert_cfg=None
) -> Tuple[Dict, Dict]:
    """Flat Lightning state dict -> (params, batch_stats) for models.KWClip."""
    from ..models.hubert import HubertConfig

    c = model_cfg
    params: Dict = {}
    batch_stats: Dict = {}

    hubert_cfg = hubert_cfg or c.audio
    params["audio_encoder"] = fairseq_hubert_to_flax(
        sd, hubert_cfg, prefix="audio_encoder.encoder."
    )
    if "audio_encoder.weightedsum_layer.weights" in sd:
        params["weightedsum"] = _np(sd["audio_encoder.weightedsum_layer.weights"])
    else:
        params["weightedsum"] = np.zeros((hubert_cfg.n_layers + 1,), np.float32)

    params["clip"] = openai_clip_to_flax(sd, c.clip, prefix="clip.model.")

    if "criterion.temperature" in sd and c.cl_loss.temperature_trainable:
        params["criterion_log_inv_temp"] = _np(sd["criterion.temperature"]).reshape(())

    dynamic = c.branch_type.endswith("_plus")
    if c.has_cascaded:
        bp = "cascaded_branch."
        branch: Dict = {"self_att": _import_branch_transformer(sd, bp, c.cascaded_ta)}
        bstats: Dict = {}
        head_params, head_stats = _import_keyword_head(sd, bp, c.head, dynamic)
        branch["head"] = head_params
        if head_stats:
            bstats["head"] = head_stats
        if c.branch_type == "CascadedBranch":
            branch["cls"] = _np(sd[f"{bp}cls"])
        elif c.branch_type == "HybridBranch":
            branch["parallel_cls"] = _np(sd[f"{bp}parallel_cls"])
            branch["cascaded_cls"] = _np(sd[f"{bp}cascaded_cls"])
            branch["parallel_proj"] = _import_mlp_or_linear(sd, f"{bp}parallel_proj.")
        elif c.branch_type == "CascadedBranch_plus":
            branch["downsampling"] = _import_cif(sd, f"{bp}downsampling.", c.cif)
        elif c.branch_type == "HybridBranch_plus":
            branch["cls"] = _np(sd[f"{bp}cls"])
            branch["downsampling"] = _import_cif(sd, f"{bp}downsampling.", c.cif)
            branch["parallel_proj"] = _import_mlp_or_linear(sd, f"{bp}parallel_proj.")
        params["cascaded_branch"] = branch
        if bstats:
            batch_stats["cascaded_branch"] = bstats

    if c.has_parallel and not c.has_cascaded:
        bp = "parallel_branch."
        branch = {
            "cls": _np(sd[f"{bp}cls"]),
            "self_att": _import_branch_transformer(sd, bp, c.parallel_ta),
        }
        if f"{bp}linear_proj.weight" in sd:
            branch["linear_proj"] = t2j_dense(sd, f"{bp}linear_proj.")
        params["parallel_branch"] = branch

    for name in ("img_enc_proj_net", "p_branch_proj_net", "c_branch_proj_net"):
        if f"{name}.sequential.0.weight" in sd:
            params[name] = _import_mlp_or_linear(sd, f"{name}.")

    return params, batch_stats
