"""High-level library API.

The reference's library usage (`example.py:10-33`) is:

    model = KWClip_GeneralTransformer.load_from_checkpoint(path)
    feat, hidden_states = model.feature_extractor_s3prl(wav=[tensor...])
    out = model.encode_speech(wav=[tensor...])

This module provides the same surface for the Flax rebuild: ragged host-side
waveform lists are padded/bucketed here, model weights come from either a
PyTorch-Lightning `.ckpt` (released SpeechCLIP+ artifacts) or an orbax
checkpoint directory saved by the Trainer, and the jitted methods run on
whatever devices JAX sees.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import ConfigNode, load_config
from .models import KWClip
from .models.kwclip import KWClipConfig

__all__ = ["SpeechCLIP", "load_from_checkpoint"]

_BUCKETS = (16000, 32000, 48000, 64000, 80000, 102400, 160000, 240000)

# int16 PCM -> float in [-1, 1): the scale soundfile/librosa apply when
# decoding 16-bit audio to float32. Applied ON DEVICE so int16 waveforms
# cross the host->device link at half the bytes of float32 (the link is
# the measured serving bottleneck through the axon tunnel, PERF.md §5).
_PCM16_SCALE = 1.0 / 32768.0


def _wav_to_f32(wav: jnp.ndarray) -> jnp.ndarray:
    """Device-side dtype gate: accept float waveforms as-is, int16 PCM via
    the exact decoder scale. Trace-time branch — jit specializes per dtype."""
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) * _PCM16_SCALE
    return wav


def _pad_wavs(wavs: Sequence[np.ndarray], buckets=_BUCKETS):
    """Pad a ragged waveform list to a bucketed (B, T) batch + lengths.

    If every input is int16 (native PCM), the batch stays int16 and the
    float conversion happens on device (`_wav_to_f32`) — half the transfer
    bytes for the same numerics (int16 is the lossless source format).
    """
    lens = np.array([len(w) for w in wavs], np.int32)
    t = int(lens.max())
    for b in buckets:
        if t <= b:
            t = b
            break
    dt = np.int16 if all(
        np.asarray(w).dtype == np.int16 for w in wavs
    ) else np.float32
    out = np.zeros((len(wavs), t), dt)
    for i, w in enumerate(wavs):
        out[i, : len(w)] = np.asarray(w, dt)
    return jnp.asarray(out), jnp.asarray(lens)


class SpeechCLIP:
    """Inference-oriented wrapper around a KWClip model + variables."""

    def __init__(self, model: KWClip, variables: dict,
                 tokenizer=None, vocab=None):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.vocab = vocab
        self._encode_speech = jax.jit(
            lambda v, w, l: model.apply(
                v, _wav_to_f32(w), l, method=KWClip.encode_speech
            )
        )
        self._feature_extractor = jax.jit(
            lambda v, w, l: model.apply(
                v, _wav_to_f32(w), l, method=KWClip.feature_extractor
            )
        )

    @property
    def cfg(self) -> KWClipConfig:
        return self.model.cfg

    def encode_speech(self, wav: Sequence[np.ndarray]) -> dict:
        """Reference `encode_speech` (`kwClip.py:1042-1091`) over a ragged
        list of waveforms."""
        w, l = _pad_wavs(wav)
        return self._encode_speech(self.variables, w, l)

    def feature_extractor_s3prl(
        self, wav: Sequence[np.ndarray]
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        """Reference `feature_extractor_s3prl` (`kwClip.py:965-997`)."""
        w, l = _pad_wavs(wav)
        return self._feature_extractor(self.variables, w, l)

    def extract_keywords(self, wav: Sequence[np.ndarray]) -> dict:
        """Reference `extract_keywords` intent (`kwClip.py:1093-1103`):
        VQ targets mapped back to original CLIP subword ids."""
        out = self.encode_speech(wav)
        vq = dict(out["vq_results"]) if out.get("vq_results") else None
        if vq is not None and self.vocab is not None:
            targets = np.asarray(vq["targets"]).reshape(len(wav), -1)
            vq["targets_original"] = self.vocab.to_original(targets)
        return {"vq_results": vq, "dsample_results": out.get("dsample_results")}


def load_from_checkpoint(
    path: str,
    config: Optional[str] = None,
    monitor: Optional[str] = None,
) -> SpeechCLIP:
    """Build a SpeechCLIP wrapper from a Lightning `.ckpt` file or an orbax
    checkpoint directory (argument-free restore: the config rides inside,
    reference `base_model.py:10-27` / `base_task.py:64`)."""
    from .tasks.builder import build_model_from_config

    if path.endswith(".ckpt"):
        from .checkpoint import lightning_to_kwclip, load_lightning_checkpoint

        sd, cfg_node, _ = load_lightning_checkpoint(path)
        if config:
            cfg_node.deep_update(load_config(config))
        model, _, model_cfg, vocab = build_model_from_config(cfg_node)
        params, batch_stats = lightning_to_kwclip(sd, model_cfg)
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        from .checkpoint import CheckpointManager
        from .optim import build_optimizer
        from .parallel import create_train_state

        cfg_node = ConfigNode(CheckpointManager.load_config(path))
        model, variables, model_cfg, vocab = build_model_from_config(cfg_node)
        # the optimizer-state TREE must match what trained this checkpoint
        # (grad accumulation wraps MultiSteps state inside the 'train' slot)
        # or orbax refuses the restore — build it from the embedded config
        try:
            from .optim.optimizer import build_optimizer_from_config

            tx = build_optimizer_from_config(
                variables["params"], model_cfg, cfg_node
            )
        except AttributeError:  # minimal config without optim/trainer nodes
            tx = build_optimizer(variables["params"], model_cfg)
        state = create_train_state(model, variables, tx)
        mgr = CheckpointManager(path)
        state = mgr.restore(state, monitor=monitor)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    tokenizer = None
    bpe = getattr(cfg_node.data.dataset, "bpe_path", None) if "data" in cfg_node else None
    if bpe:
        import os

        if os.path.exists(bpe):
            from .data.tokenizer import SimpleTokenizer

            tokenizer = SimpleTokenizer(bpe)
    return SpeechCLIP(model, variables, tokenizer=tokenizer, vocab=vocab)
