"""Mel-input s3prl upstream family: APC / VQ-APC / TERA / Mockingjay / DeCoAR2.

The reference's `S3prlSpeechEncoderPlus` wraps any `s3prl.hub` upstream
(`avssl/module/speech_encoder_plus.py:110-146`); beyond the wav2vec2/HuBERT
family (implemented natively in `models/hubert.py`), the upstreams the s3prl
hub actually serves are mel-spectrogram models in two architectural
families:

- **LSTM predictive coding** (APC, VQ-APC — Chung et al.): 80-d log-mel ->
  N stacked unidirectional LSTM layers (H=512). Hidden states = each LSTM
  layer's output sequence (s3prl returns exactly the layer outputs for
  these models, no embedding state).
- **Mel transformers** (TERA, Mockingjay, DeCoAR 2.0): 80-d log-mel ->
  input projection + LayerNorm + sinusoidal positions -> N post-norm
  transformer layers (D=768). Hidden states = [embedding, layer 1..N]
  (same convention as our HuBERT stack).

Both families plug into `KWClip.forward_audio` through the same contract as
`HubertModel`: `__call__(wav, wav_padding_mask, deterministic)` returns
`{"x", "hidden_states" (L', B, T', D), "padding_mask"}`; the config
duck-types every field `KWClipConfig.from_config` touches on the audio
tower (dtype, dropout knobs, layer_drop, frontend_chunks, scan_layers).

Scope note (PARITY.md): architectures follow the published papers; exact
kaldi-fbank numerics and pretrained-weight import are only meaningful with
real s3prl checkpoints, which need egress. `import_torch_lstm_state`
provides the 1:1 torch->flax LSTM mapping, oracle-tested against
`torch.nn.LSTM` in `tests/test_mel_upstreams.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.lstm import LSTMStack
from ..nn.transformer import TransformerEncoderLayer
from ..ops.mel import log_mel_spectrogram, mel_frame_count
from .hubert import downsample_padding_mask

__all__ = ["MelUpstreamConfig", "MelUpstream", "import_torch_lstm_state"]


@dataclasses.dataclass(frozen=True)
class MelUpstreamConfig:
    """Config for a mel-input upstream. Duck-types the `HubertConfig`
    fields that `KWClipConfig.from_config` manipulates."""

    kind: str = "apc"  # apc | vq_apc | tera | mockingjay | decoar2
    arch: str = "lstm"  # lstm | transformer
    d_model: int = 512
    n_layers: int = 3
    n_heads: int = 12
    ffn_dim: int = 3072
    n_mels: int = 80
    win: int = 400
    hop: int = 160
    n_fft: int = 512
    # duck-typed knobs (same semantics as HubertConfig where meaningful)
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    layer_drop: float = 0.0  # accepted, not used (no fairseq LayerDrop here)
    scan_layers: bool = False  # disables KWClip's fused weighted-sum path
    frontend_chunks: int = 1  # no conv frontend to chunk
    layer_norm_first: bool = False
    normalize_waveform: bool = False
    dtype: Any = jnp.float32

    @property
    def downsample_rate(self) -> int:
        return self.hop

    @property
    def num_hidden_states(self) -> int:
        # LSTM family: s3prl returns exactly the layer outputs; transformer
        # family: embedding + layer outputs (HuBERT-stack convention)
        return self.n_layers if self.arch == "lstm" else self.n_layers + 1

    @staticmethod
    def from_upstream_name(name: str) -> "MelUpstreamConfig":
        n = name.lower()
        if "apc" in n:  # apc, apc_360hr, apc_960hr, vq_apc, ...
            return MelUpstreamConfig(
                kind="vq_apc" if "vq" in n else "apc",
                arch="lstm", d_model=512, n_layers=3, dropout=0.0,
            )
        if "tera" in n:
            return MelUpstreamConfig(
                kind="tera", arch="transformer", d_model=768, n_layers=3,
                n_heads=12, ffn_dim=3072,
            )
        if "mockingjay" in n:
            return MelUpstreamConfig(
                kind="mockingjay", arch="transformer", d_model=768,
                n_layers=12, n_heads=12, ffn_dim=3072,
            )
        if "decoar" in n:
            return MelUpstreamConfig(
                kind="decoar2", arch="transformer", d_model=768, n_layers=12,
                n_heads=12, ffn_dim=3072,
            )
        raise NotImplementedError(
            f"audio_encoder.name={name!r}: supported upstream families are "
            "wav2vec2/HuBERT (native conv-transformer tower), APC/VQ-APC "
            "(mel LSTM), TERA/Mockingjay/DeCoAR2 (mel transformer); other "
            "s3prl upstreams (npc, pase, ...) are out of scope (reference "
            "speech_encoder_plus.py:110-146 delegates to s3prl.hub)"
        )


def _sinusoidal_positions(n: int, d: int) -> np.ndarray:
    pos = np.arange(n)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * (-np.log(10000.0) / d))
    pe = np.zeros((n, d), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)[:, : d // 2]
    return pe.astype(np.float32)


class MelUpstream(nn.Module):
    """Mel-frontend upstream tower, `HubertModel`-compatible interface."""

    cfg: MelUpstreamConfig

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        wav_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        **unused,
    ) -> dict:
        c = self.cfg
        mel = log_mel_spectrogram(
            wav, n_mels=c.n_mels, win=c.win, hop=c.hop, n_fft=c.n_fft
        )  # (B, T', n_mels)
        n_frames = mel.shape[1]
        feat_padding_mask = None
        if wav_padding_mask is not None:
            feat_padding_mask = downsample_padding_mask(
                wav_padding_mask, n_frames
            )
            mel = jnp.where(feat_padding_mask[:, :, None], 0.0, mel)

        if c.arch == "lstm":
            outs = LSTMStack(
                features=c.d_model, n_layers=c.n_layers, dropout=c.dropout,
                name="lstm",
            )(mel, deterministic=deterministic)
            hidden_states = jnp.stack(
                [o.astype(c.dtype) for o in outs], axis=0
            )  # (L, B, T', D)
            x = hidden_states[-1]
        elif c.arch == "transformer":
            x = nn.Dense(c.d_model, dtype=c.dtype, name="input_proj")(mel)
            x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="input_norm")(x)
            pe = jnp.asarray(_sinusoidal_positions(n_frames, c.d_model))
            x = x + pe[None].astype(x.dtype)
            x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
            key_padding_mask = feat_padding_mask
            hidden = [x]
            for i in range(c.n_layers):
                x = TransformerEncoderLayer(
                    d_model=c.d_model,
                    nhead=c.n_heads,
                    dim_feedforward=c.ffn_dim,
                    dropout=c.dropout,
                    activation="gelu",
                    layer_norm_eps=1e-12,
                    norm_first=False,
                    dtype=c.dtype,
                    name=f"layer_{i}",
                )(x, key_padding_mask=key_padding_mask,
                  deterministic=deterministic)
                hidden.append(x)
            hidden_states = jnp.stack(hidden, axis=0)  # (L+1, B, T', D)
        else:
            raise NotImplementedError(c.arch)

        return {
            "x": x,
            "hidden_states": hidden_states,
            "padding_mask": feat_padding_mask,
        }


def import_torch_lstm_state(state_dict: dict, n_layers: int, prefix: str = "") -> dict:
    """Map `torch.nn.LSTM(num_layers=N)` (or N stacked single-layer LSTMs
    named `weight_ih_l0...`) state-dict tensors onto the `LSTMStack` tree."""
    tree: dict = {}
    for i in range(n_layers):
        tree[f"layer_{i}"] = {
            "w_ih": jnp.asarray(
                np.asarray(state_dict[f"{prefix}weight_ih_l{i}"])
            ),
            "w_hh": jnp.asarray(
                np.asarray(state_dict[f"{prefix}weight_hh_l{i}"])
            ),
            "b_ih": jnp.asarray(np.asarray(state_dict[f"{prefix}bias_ih_l{i}"])),
            "b_hh": jnp.asarray(np.asarray(state_dict[f"{prefix}bias_hh_l{i}"])),
        }
    return tree
