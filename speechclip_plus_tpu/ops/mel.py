"""Log-mel filterbank frontend for the mel-input s3prl upstream family.

The reference's s3prl wrapper (`avssl/module/speech_encoder_plus.py:110-146`)
accepts any `s3prl.hub` upstream; the non-wav2vec2 ones (APC, VQ-APC, TERA,
Mockingjay, DeCoAR 2.0, ...) all consume 80-dim log-mel features at a 10 ms
hop instead of raw waveforms. This module is their shared frontend.

TPU-first formulation: framing is one static gather, the window/FFT run as
batched dense ops, and the mel projection is a single (n_bins, n_mels)
matmul on the MXU. All shapes are static — the frame count is a function of
the padded waveform length only; padded frames produce garbage features that
downstream consumers mask via the feature-level padding mask (same contract
as the conv frontend in `models/hubert.py`).

Parameterization: 25 ms Hann window / 10 ms hop at 16 kHz (win=400,
hop=160, n_fft=512), HTK mel scale (2595 * log10(1 + f/700)), natural-log
compression with a 1e-10 floor. This matches the standard s3prl
preprocessing *architecture*; bit-exact kaldi-fbank parity (dithering,
preemphasis, energy floors) is only needed when importing real s3prl
checkpoints and is documented as out of scope in PARITY.md.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["log_mel_spectrogram", "mel_filterbank", "mel_frame_count"]


def mel_frame_count(n_samples: int, win: int = 400, hop: int = 160) -> int:
    """Frames produced by snip-edges framing (no centering)."""
    return max(0, (int(n_samples) - win) // hop + 1)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = 512,
    sample_rate: int = 16000,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular HTK-mel filterbank (numpy, cached)."""
    fmax = sample_rate / 2.0 if fmax is None else fmax
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    lower, center, upper = hz_pts[:-2], hz_pts[1:-1], hz_pts[2:]
    up = (fft_freqs[:, None] - lower[None, :]) / np.maximum(
        center - lower, 1e-8
    )[None, :]
    down = (upper[None, :] - fft_freqs[:, None]) / np.maximum(
        upper - center, 1e-8
    )[None, :]
    fb = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def log_mel_spectrogram(
    wav: jnp.ndarray,
    *,
    n_mels: int = 80,
    win: int = 400,
    hop: int = 160,
    n_fft: int = 512,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """(B, T) waveform -> (B, n_frames, n_mels) log-mel features.

    Pure function of the padded batch; jit-safe, static shapes.
    """
    b, t = wav.shape
    nf = mel_frame_count(t, win, hop)
    if nf == 0:
        raise ValueError(f"waveform too short for one {win}-sample frame: {t}")
    idx = np.arange(nf)[:, None] * hop + np.arange(win)[None, :]  # (nf, win)
    frames = wav[:, jnp.asarray(idx)]  # (B, nf, win) one static gather
    window = jnp.asarray(np.hanning(win).astype(np.float32))
    frames = frames.astype(jnp.float32) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (B, nf, n_fft//2+1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.einsum("bfk,km->bfm", power, fb)  # MXU matmul
    return jnp.log(jnp.maximum(mel, 1e-10))
