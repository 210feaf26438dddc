"""Model construction from a reference-format YAML config.

Mirrors the reference's checkpoint-or-config build
(`avssl/task/base_task.py:63-82` + `avssl/model/kwClip.py:55-91`):
  - resolve the reduced subword vocabulary (usage .npy path in
    `config.clip.reduce_subword_embbedding`, `clip_official.py:63-107`);
  - build the typed KWClipConfig and the Flax KWClip module;
  - initialize parameters, then (when weight files are available locally)
    import the frozen towers: fairseq HuBERT (`audio_encoder.ckpt_path` or
    the standard fairseq download cache) and OpenAI CLIP
    (`clip.ckpt_path`), and keyword-BN params from CLIP token-embedding
    statistics (`kw_branches.py:93-118`).

No-network policy: missing weight files leave the towers randomly
initialized (logged loudly) instead of downloading.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..config import ConfigNode
from ..data.tokenizer import ReducedVocab
from ..models import KWClip, KWClipConfig, init_kw_bn_from_token_embedding
from ..checkpoint import (
    fairseq_hubert_to_flax,
    openai_clip_to_flax,
    load_torch_state_dict,
    reduce_token_embedding,
)

logger = logging.getLogger(__name__)

__all__ = [
    "build_model_from_config",
    "resolve_reduced_vocab",
    "reinit_hubert_layers",
]


def reinit_hubert_layers(imported: dict, random_tree: dict, layer_ids) -> dict:
    """Replace the selected transformer-layer slices of an imported HuBERT
    tree with freshly-initialized values (reference `reinit_layers`,
    `speech_encoder_plus.py:418-431`). Works for both the scanned layout
    (`layers/...` leaves stacked (L, ...)) and the unrolled `layers_{i}`
    layout."""
    import jax.numpy as jnp

    ids = sorted(int(i) for i in layer_ids)
    out = dict(imported)
    if "layers" in imported:  # scanned
        def swap(imp, rnd):
            imp = jnp.asarray(imp)
            for i in ids:
                imp = imp.at[i].set(jnp.asarray(rnd)[i])
            return imp

        out["layers"] = jax.tree_util.tree_map(
            swap, imported["layers"], random_tree["layers"]
        )
        return out
    for i in ids:  # unrolled
        out[f"layers_{i}"] = random_tree[f"layers_{i}"]
    return out


def resolve_reduced_vocab(cfg: ConfigNode) -> Optional[ReducedVocab]:
    path = getattr(cfg.clip, "reduce_subword_embbedding", None)
    if not path:
        return None
    if not os.path.exists(path):
        # map reference-layout paths (./avssl/data/<ds>_stat/<file>.npy) and
        # bare config paths (assets/<ds>_stat/<file>.npy) onto this repo's
        # assets/ directory
        parent = os.path.basename(os.path.dirname(path))
        repo_root = os.path.join(os.path.dirname(__file__), "..", "..")
        for alt in (
            os.path.join(repo_root, "assets", parent, os.path.basename(path)),
            os.path.join(repo_root, path),
        ):
            if os.path.exists(alt):
                path = alt
                break
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"reduce_subword_embbedding file not found: {path}"
        )
    return ReducedVocab.from_npy(
        path,
        sot_original=int(getattr(cfg.clip, "sot_original", 49406)),
        eot_original=int(getattr(cfg.clip, "eot_original", 49407)),
    )


def build_model_from_config(
    cfg: ConfigNode,
    *,
    example_batch: Optional[dict] = None,
    seed: int = 0,
) -> Tuple[KWClip, dict, KWClipConfig, Optional[ReducedVocab]]:
    """Returns (model, variables, model_cfg, reduced_vocab)."""
    vocab = resolve_reduced_vocab(cfg)
    if vocab is not None:
        model_cfg = KWClipConfig.from_config(
            cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
            eot_id=int(vocab.eot_reduced),
        )
    else:
        model_cfg = KWClipConfig.from_config(cfg)

    model = KWClip(model_cfg)

    if example_batch is None:
        rng = np.random.RandomState(0)
        b, t = 2, 3200
        import jax.numpy as jnp

        example_batch = {
            "wav": jnp.asarray(rng.randn(b, t).astype(np.float32)),
            "wav_len": jnp.asarray([t, t - 320]),
            "image": jnp.asarray(
                rng.randn(b, model_cfg.clip.image_resolution,
                          model_cfg.clip.image_resolution, 3).astype(np.float32)
            ),
            "id": jnp.asarray([0, 1]),
            "text": jnp.zeros((b, model_cfg.clip.context_length), jnp.int32),
        }
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, example_batch, training=False
    )
    variables = dict(variables)
    params = dict(variables["params"])

    # ---- frozen tower weights (local files only; no downloads) ----
    from ..models.mel_upstreams import MelUpstreamConfig

    hubert_path = getattr(cfg.audio_encoder, "ckpt_path", None)
    if isinstance(model_cfg.audio, MelUpstreamConfig):
        if hubert_path:
            logger.warning(
                "audio_encoder.ckpt_path is only importable for the "
                "HuBERT/wav2vec2 tower (fairseq format); the %s mel "
                "upstream stays randomly initialized "
                "(import_torch_lstm_state covers the LSTM family)",
                model_cfg.audio.kind,
            )
    elif hubert_path and os.path.exists(hubert_path):
        sd = load_torch_state_dict(hubert_path)
        random_audio = params["audio_encoder"]  # keep for reinit_layers
        params["audio_encoder"] = fairseq_hubert_to_flax(sd, model_cfg.audio)
        if model_cfg.reinit_layers:
            params["audio_encoder"] = reinit_hubert_layers(
                params["audio_encoder"], random_audio, model_cfg.reinit_layers
            )
            logger.warning(
                "Reinitialized encoder layers %s (reference "
                "speech_encoder_plus.py:420-422)", model_cfg.reinit_layers,
            )
        logger.info("Loaded HuBERT weights from %s", hubert_path)
    else:
        logger.warning(
            "HuBERT weights not found (audio_encoder.ckpt_path=%s); tower is "
            "randomly initialized", hubert_path,
        )

    clip_path = getattr(cfg.clip, "ckpt_path", None)
    if clip_path and os.path.exists(clip_path):
        sd = load_torch_state_dict(clip_path)
        full_cfg = model_cfg.clip
        if vocab is not None:
            import dataclasses as _dc

            full_cfg = _dc.replace(model_cfg.clip, vocab_size=49408)
        clip_params = openai_clip_to_flax(sd, full_cfg)
        if vocab is not None:
            clip_params = reduce_token_embedding(clip_params, vocab.selected_ids)
        params["clip"] = clip_params
        logger.info("Loaded CLIP weights from %s", clip_path)
    else:
        logger.warning(
            "CLIP weights not found (clip.ckpt_path=%s); tower is randomly "
            "initialized", clip_path,
        )

    # keyword BN init from (possibly reduced) token-embedding statistics
    token_emb = np.asarray(params["clip"]["text"]["token_embedding"]["embedding"])
    params = init_kw_bn_from_token_embedding(params, token_emb, model_cfg)

    variables["params"] = params
    return model, variables, model_cfg, vocab
