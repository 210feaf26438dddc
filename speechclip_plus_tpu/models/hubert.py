"""HuBERT acoustic tower (Flax, TPU-first).

Reproduces the semantics of the reference's patched fairseq HuBERT forward
(`avssl/module/speech_encoder_plus.py:29-107`): run the conv frontend, layer
norm (+ projection), add the positional convolution embedding, then the
transformer stack, returning **every** hidden state so a learnable weighted
sum can be applied downstream (`speech_encoder_plus.py:619-621`).

TPU-first choices:
  - all shapes static: callers pass a zero-padded (B, T) waveform batch plus a
    boolean padding mask (True = pad), exactly the layout the reference builds
    in `preprocess_input` (`speech_encoder_plus.py:506-518`);
  - hidden states come back stacked as one (L+1, B, T', D) array so the
    weighted sum is a single einsum on the MXU instead of L separate adds;
  - convs run channel-last via `lax.conv_general_dilated` (XLA's native TPU
    layout); attention is the shared fused path in `nn/attention.py`;
  - no data-dependent control flow: padding is handled by multiplicative /
    additive masks only.

Two architecture variants, as in fairseq:
  - base  (`hubert_base`):  group-norm conv frontend, post-norm encoder
    (encoder layer_norm applied *before* the layer stack), 12 layers, D=768.
  - large (`hubert_large_ll60k`): per-conv layer-norm frontend with conv bias,
    pre-norm encoder (layer_norm_first=True; the final encoder layer norm is
    **not** applied to hidden states, matching the custom extract_features at
    `speech_encoder_plus.py:39-64`), 24 layers, D=1024, and waveform layer
    normalization at preprocessing time (task cfg `normalize=True`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import dot_product_attention
from ..nn.dropout import FastDropout
from ..ops.gelu import fast_gelu

__all__ = [
    "HubertConfig",
    "HubertModel",
    "hubert_feat_lengths",
    "downsample_padding_mask",
    "normalize_waveform",
]


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    """Architecture hyperparameters (fairseq HubertConfig subset)."""

    # conv frontend: (channels, kernel, stride) per layer
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    extractor_mode: str = "group_norm"  # "group_norm" (base) | "layer_norm" (large)
    conv_bias: bool = False
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    layer_norm_first: bool = False  # True for large
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # stacked positional-conv variant (data2vec audio: 5 x [conv(k=19,
    # groups=16) -> non-affine LayerNorm -> GELU]); 1 = the single
    # weight-normalized fairseq pos_conv above
    pos_conv_depth: int = 1
    # WavLM gated relative position bias (microsoft/unilm WavLM; HF
    # transformers WavLMAttention semantics): a bucketed relative-position
    # embedding table shared across layers (owned by the model, mirroring
    # HF layer 0), gated per layer/head/query from the layer input
    rel_pos_bias: bool = False
    rel_buckets: int = 320
    rel_max_distance: int = 800
    normalize_waveform: bool = False  # True for large (task cfg `normalize`)
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    # compile the layer stack as one lax.scan over stacked params (L, ...):
    # ~L-times smaller HLO, same math. Param tree: layers/layer/... instead
    # of layers_{i}/...
    scan_layers: bool = True
    # rematerialize each layer in the backward pass (memory-for-FLOPs trade;
    # irrelevant while the tower is frozen, useful when fine-tuning)
    remat: bool = False
    # Pallas fused (flash) attention for the encoder layers; XLA's fused
    # attention is near-optimal at the reference's <=320 frames, so this is
    # off by default and intended for long-audio regimes (nn/flash.py)
    use_flash_attention: bool = False
    # compute q/k/v with ONE (D, 3D) matmul by concatenating the three
    # projection kernels at trace time. Bitwise-identical math (the concat
    # is along the output axis, so per-element contraction order is
    # unchanged) and the same q_proj/k_proj/v_proj param tree (checkpoint
    # import and tensor-parallel sharding untouched). Measured on v5e
    # (B=128 product step A/B): 221.3 ms fused vs 218.5 ms separate —
    # XLA's scheduler already keeps the (B*T, D) activation resident
    # across the three sibling dots, and the trace-time kernel concat
    # adds a (D, 3D) materialization per layer instead. Default OFF;
    # the knob stays for A/B on other topologies.
    fused_qkv: bool = False
    # Forward-only fused attention with IN-KERNEL dropout
    # (nn/fused_attention.py): eliminates the (B, H, T, T) dropout-mask
    # RNG + HBM traffic and the score tensor round trips. Valid only for
    # a frozen tower (no backward exists); KWClipConfig.from_config turns
    # it on exactly then. Falls back to XLA off-TPU.
    fused_attention_dropout: bool = False
    # Forward-only fused attention BLOCK (nn/fused_attention_block.py):
    # fuses QKV projection -> per-head attention (+ in-kernel dropout) ->
    # output projection per layer, consuming the residual stream in its
    # native (B, T, D) layout — the round-4 answer to the layout
    # transposes that made the attention-only kernel above lose in-model
    # (PERF.md §3). Frozen towers only (no backward); same param tree as
    # the separate projections, so checkpoints and TP sharding rules are
    # untouched. Falls back to XLA off-TPU / beyond VMEM budget.
    fused_attention_block: bool = False
    # stochastic LayerDrop rate (fairseq `encoder.layerdrop`, set from config
    # `audio_encoder.layer_drop`, reference speech_encoder_plus.py:407-415).
    # Active only in training. Static-shape formulation: a dropped layer
    # becomes identity (its input is passed through and contributes to the
    # weighted sum), vs fairseq which skips appending it — equivalent
    # regularization, XLA-compatible (documented deviation, PARITY.md).
    layer_drop: float = 0.0
    # conv frontend lowering (all impls share math + param shapes):
    #   "xla"    = lax.conv_general_dilated via nn.Conv everywhere;
    #   "matmul" = explicit strided-patch extraction + MXU matmul per layer;
    #   "hybrid" = patches-matmul only where XLA's conv lowering is
    #              pathological (tiny contraction: cin*k < 128, i.e. the
    #              waveform layer 0), XLA conv elsewhere.
    # Measured on v5e at the reference shape (B=128, T=102400, RTT-corrected
    # chained timing): xla frontend ~58 ms, matmul ~127 ms (the (B,T',K*C)
    # im2col tensor spills to HBM), hybrid ~110 ms (layer-0 patch tensors
    # have sub-lane minor dims and get layout-padded 128/10x). The layer-0
    # conv itself is ~6 ms under XLA — the frontend's real elementwise cost
    # was exact erf-GELU, replaced by ops/gelu.fast_gelu for bf16. "xla" is
    # the default; the alternates are kept for A/B on new hardware, and
    # ops/conv_frontend.conv0_pallas (deinterleaved two-matmul form) exists
    # for regimes where XLA's C_in=1 conv lowering regresses.
    conv_impl: str = "xla"
    # execute the conv frontend in this many sequential time chunks
    # (lax.map): bounds the layer-0 activation, the model's largest tensor
    # ((B, T/5, 512) = 5 GB at B=256 — the round-1 B=256 HBM OOM). 1 = off.
    # Exact: the stack tiles time perfectly (see ConvFeatureExtractor).
    frontend_chunks: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def downsample_rate(self) -> int:
        r = 1
        for _, _, s in self.conv_layers:
            r *= s
        return r

    @property
    def num_hidden_states(self) -> int:
        # encoder input + every layer output (13 base / 25 large), the
        # weighted-sum width (reference weighted_sum.py:10-45)
        return self.n_layers + 1

    @staticmethod
    def base() -> "HubertConfig":
        return HubertConfig()

    @staticmethod
    def large() -> "HubertConfig":
        return HubertConfig(
            extractor_mode="layer_norm",
            conv_bias=True,
            d_model=1024,
            n_layers=24,
            n_heads=16,
            ffn_dim=4096,
            layer_norm_first=True,
            normalize_waveform=True,
        )

    @staticmethod
    def wavlm_base() -> "HubertConfig":
        return HubertConfig(rel_pos_bias=True)

    @staticmethod
    def wavlm_large() -> "HubertConfig":
        return dataclasses.replace(HubertConfig.large(), rel_pos_bias=True)

    @staticmethod
    def data2vec_base() -> "HubertConfig":
        # fairseq data2vec audio: layer-norm frontend (no conv bias),
        # post-norm encoder, 5-layer stacked pos conv (k=19, groups=16),
        # waveform normalization (HF Data2VecAudioModel semantics)
        return HubertConfig(
            extractor_mode="layer_norm",
            conv_bias=False,
            conv_pos=19,
            pos_conv_depth=5,
            normalize_waveform=True,
        )

    @staticmethod
    def data2vec_large() -> "HubertConfig":
        return dataclasses.replace(
            HubertConfig.data2vec_base(),
            d_model=1024, n_layers=24, n_heads=16, ffn_dim=4096,
        )

    @staticmethod
    def from_upstream_name(name: str) -> "HubertConfig":
        """Map an s3prl / reference `audio_encoder.name` to a tower config.

        The reference accepts any `s3prl.hub` upstream name
        (`speech_encoder_plus.py:110-146`) but every shipped config and
        released checkpoint uses the HuBERT family. This rebuild implements
        the wav2vec2/HuBERT *architecture* family natively (identical tower:
        conv frontend + transformer; fairseq HuBERT is a wav2vec2-arch
        model), so both name families resolve here — wav2vec2 checkpoints
        load through the same fairseq importer (`checkpoint/towers.py:
        fairseq_hubert_to_flax`; the extra quantizer/mask_emb keys in a
        wav2vec2 ckpt are simply not referenced). Mel-input s3prl upstreams
        (apc, vq-apc, tera, mockingjay, decoar2) live in
        `models/mel_upstreams.py`; `KWClipConfig.from_config` falls back to
        them when this raises.
        """
        n = name.lower()
        if "wavlm" in n:
            return (
                HubertConfig.wavlm_large() if "large" in n
                else HubertConfig.wavlm_base()
            )
        if "data2vec" in n:
            return (
                HubertConfig.data2vec_large() if "large" in n
                else HubertConfig.data2vec_base()
            )
        if "hubert" in n or "wav2vec2" in n or "wav2vec" in n:
            return (
                HubertConfig.large() if "large" in n else HubertConfig.base()
            )
        raise NotImplementedError(
            f"audio_encoder.name={name!r} is not a wav2vec2-architecture "
            "upstream (hubert_base, hubert_large_ll60k, wav2vec2_base, "
            "wavlm_base[_plus], wavlm_large, data2vec, data2vec_large, ...); "
            "mel-input upstreams resolve via MelUpstreamConfig "
            "(models/mel_upstreams.py)"
        )

    @staticmethod
    def tiny(**kw) -> "HubertConfig":
        """Small config for tests."""
        defaults = dict(
            conv_layers=((16, 3, 2), (16, 3, 2)),
            d_model=32,
            n_layers=2,
            n_heads=4,
            ffn_dim=64,
            conv_pos=16,
            conv_pos_groups=2,
        )
        defaults.update(kw)
        return HubertConfig(**defaults)


def normalize_waveform(wav: jnp.ndarray, wav_len: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance zero-mean/unit-var over the *valid* samples.

    Matches `F.layer_norm(wav, wav.shape)` applied per (unpadded) waveform in
    the reference `preprocess_input` (`speech_encoder_plus.py:506-508`), but
    formulated for padded batches: statistics are computed over the first
    `wav_len` samples only (torch sees exactly those samples because the
    reference normalizes before padding).
    """
    mask = (jnp.arange(wav.shape[1])[None, :] < wav_len[:, None]).astype(wav.dtype)
    n = jnp.maximum(wav_len.astype(wav.dtype), 1.0)[:, None]
    mean = jnp.sum(wav * mask, axis=1, keepdims=True) / n
    centered = (wav - mean) * mask
    var = jnp.sum(centered * centered, axis=1, keepdims=True) / n
    return centered * jax.lax.rsqrt(var + 1e-5)


def hubert_feat_lengths(
    wav_len: jnp.ndarray, conv_layers: Sequence[Tuple[int, int, int]]
) -> jnp.ndarray:
    """Exact frame count produced by the conv frontend for each waveform."""
    t = wav_len
    for _, k, s in conv_layers:
        t = (t - k) // s + 1
    return t


def downsample_padding_mask(
    wav_padding_mask: jnp.ndarray, n_frames: int
) -> jnp.ndarray:
    """fairseq `HubertModel.forward_padding_mask` semantics.

    Trim the waveform mask to a multiple of `n_frames`, reshape to
    (B, n_frames, -1) and mark a frame as padding iff *all* of its waveform
    samples are padding (`fairseq/models/hubert`; invoked from the custom
    forward at reference `speech_encoder_plus.py:81-82`).
    """
    b, t_wav = wav_padding_mask.shape
    extra = t_wav % n_frames
    if extra > 0:
        wav_padding_mask = wav_padding_mask[:, :-extra]
    return jnp.all(wav_padding_mask.reshape(b, n_frames, -1), axis=-1)


class _PatchConv(nn.Module):
    """Strided 1-D VALID conv as slice+concat patches -> one MXU matmul.

    Same math and the same param tree (`kernel` (K, Cin, Cout) + optional
    `bias`) as `nn.Conv`, so checkpoints are layout-compatible. The HuBERT
    frontend convs have stride >= 2, so patch extraction is k strided
    slices — nothing is gathered and the overlap blow-up is bounded by
    k/s <= 2x (layer 0) / 1.5x (k=3,s=2). XLA's TPU conv lowering handles
    C_in=1 / small-C badly for these shapes; the explicit (B*T', K*Cin) @
    (K*Cin, Cout) form tiles straight onto the systolic array.
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, cin = x.shape
        k, s = self.kernel_size, self.stride
        t_out = (t - k) // s + 1
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, cin, self.features),
        ).astype(self.dtype)
        cols = [
            jax.lax.slice(x, (0, j, 0), (b, j + (t_out - 1) * s + 1, cin), (1, s, 1))
            for j in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B, T', K*Cin)
        out = patches.reshape(b * t_out, k * cin) @ kernel.reshape(
            k * cin, self.features
        )
        out = out.reshape(b, t_out, self.features)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            ).astype(self.dtype)
            out = out + bias
        return out


class _ConvParams(nn.Module):
    """Param holder for one frontend conv (same tree as `nn.Conv`:
    `kernel` (K, Cin, Cout) [+ `bias`]). Params are materialized *outside*
    any `lax.map`, so the conv stack itself can be a pure jnp function —
    the requirement for chunked execution."""

    features: int
    kernel_size: int
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return kernel, bias


class _DenseParams(nn.Module):
    """Raw `kernel`/`bias` pair with nn.Dense's tree and initializers —
    lets the layer combine sibling projections into one matmul while the
    param tree (and so checkpoint import + TP sharding rules) stays
    exactly nn.Dense-shaped."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.in_features, self.features),
            ),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _AffineParams(nn.Module):
    """`scale`/`bias` pair (the tree of `nn.GroupNorm`/`nn.LayerNorm`)."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


def _conv1d_valid(x, kernel, bias, stride, impl, dtype):
    """One frontend conv on (B, T, Cin); impl as in HubertConfig.conv_impl."""
    k, cin, ch = kernel.shape
    use_patches = impl == "matmul" or (impl == "hybrid" and cin * k < 128)
    # the barrier keeps the dtype cast from fusing into the conv's weight
    # operand: a fused cast makes XLA relayout around the (huge) activation
    # instead of the (tiny) kernel — measured 74.7 -> 31.6 ms for the full
    # stack at (128, 102400) on v5e
    kernel = jax.lax.optimization_barrier(kernel.astype(dtype))
    if use_patches:
        b, t, _ = x.shape
        t_out = (t - k) // stride + 1
        cols = [
            jax.lax.slice(
                x, (0, j, 0), (b, j + (t_out - 1) * stride + 1, cin),
                (1, stride, 1),
            )
            for j in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1)
        out = patches.reshape(b * t_out, k * cin) @ kernel.reshape(k * cin, ch)
        out = out.reshape(b, t_out, ch)
    else:
        out = jax.lax.conv_general_dilated(
            x, kernel, (stride,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def _per_channel_norm(x, mean, var, scale, bias, dtype, eps=1e-5):
    """GroupNorm(C, C) application with externally supplied statistics."""
    inv = jax.lax.rsqrt(var + eps)
    return ((x.astype(jnp.float32) - mean) * inv * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def _layer_norm_c(x, scale, bias, dtype, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def frontend_receptive_field(conv_layers) -> Tuple[int, int]:
    """(receptive field, hop) of the conv stack in waveform samples."""
    r, hop = 1, 1
    for _, k, s in reversed(conv_layers):
        r = (r - 1) * s + k
    for _, _, s in conv_layers:
        hop *= s
    return r, hop


class ConvFeatureExtractor(nn.Module):
    """Waveform -> frame features, fairseq ConvFeatureExtractionModel parity.

    group_norm mode (base): conv(+no bias) -> [GroupNorm on layer 0 only] -> GELU
    layer_norm mode (large): conv(+bias) -> LayerNorm(channel) -> GELU

    `cfg.frontend_chunks > 1` executes the stack in that many time chunks
    (sequential `lax.map`), bounding the layer-0 activation — the largest
    tensor of the whole model ((B, T/5, 512): 5 GB at B=256 — the round-1
    B=256 HBM OOM). The conv stack tiles time exactly: a chunk of
    F*hop + (R-hop) samples yields exactly F final frames, so chunked and
    unchunked outputs are identical. The base tower's GroupNorm needs
    whole-utterance per-channel statistics; they are accumulated in an
    extra stats pass (layer-0 conv runs twice — it is ~6 ms, cheap next to
    the memory it frees).
    """

    cfg: HubertConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        dtype = c.dtype
        # params materialized once, outside any control flow
        convs = []
        norms = []
        cin = 1
        for i, (ch, k, s) in enumerate(c.conv_layers):
            convs.append(
                _ConvParams(ch, k, cin, c.conv_bias, name=f"conv_{i}")()
            )
            if c.extractor_mode == "group_norm" and i == 0:
                norms.append(_AffineParams(ch, name=f"gn_{i}")())
            elif c.extractor_mode == "layer_norm":
                norms.append(_AffineParams(ch, name=f"ln_{i}")())
            else:
                norms.append(None)
            cin = ch

        def run_stack(x, gn_stats):
            """(B, Tc) waveform chunk -> (B, F, C); gn_stats = (mean, var)
            per (B, 1, C) for the layer-0 GroupNorm, or None to compute
            locally (unchunked path)."""
            x = x[:, :, None].astype(dtype)
            for i, ((kernel, bias), (ch, k, s)) in enumerate(
                zip(convs, c.conv_layers)
            ):
                x = _conv1d_valid(x, kernel, bias, s, c.conv_impl, dtype)
                if c.extractor_mode == "group_norm" and i == 0:
                    scale, gbias = norms[0]
                    if gn_stats is None:
                        # per-(sample, channel) stats over time as
                        # ones-matmuls: the naive 3-D fp32 reduce lowers
                        # ~13x slower on v5e (88.9 vs 6.9 ms at
                        # (128, 20479, 512))
                        xf = x.astype(jnp.float32)
                        n = jnp.float32(x.shape[1])
                        ones = jnp.ones((x.shape[1],), jnp.float32)
                        # HIGHEST: default matmul precision truncates fp32
                        # operands to bf16 on TPU — a ~1e-3 relative error
                        # on the stats that GroupNorm then amplifies
                        s1 = jnp.einsum("btc,t->bc", xf, ones,
                                        precision=jax.lax.Precision.HIGHEST)
                        s2 = jnp.einsum("btc,t->bc", xf * xf, ones,
                                        precision=jax.lax.Precision.HIGHEST)
                        mean = (s1 / n)[:, None, :]
                        var = (s2 / n)[:, None, :] - mean * mean
                    else:
                        mean, var = gn_stats
                    x = _per_channel_norm(x, mean, var, scale, gbias, dtype)
                elif c.extractor_mode == "layer_norm":
                    scale, lbias = norms[i]
                    x = _layer_norm_c(x, scale, lbias, dtype)
                x = fast_gelu(x)
            return x

        nch = int(getattr(c, "frontend_chunks", 1) or 1)
        if nch <= 1:
            return run_stack(wav, None)

        b, t = wav.shape
        if b % nch == 0 and b > nch:
            # batch-chunked (preferred): every per-sample statistic
            # (GroupNorm over time, LayerNorm over channels) lives entirely
            # inside one chunk, so this is bit-exact vs unchunked with NO
            # halo recompute, stats prepass, or padding — unlike the
            # time-chunked fallback below. Bounds the layer-0 activation to
            # (B/nch, T/5, C), same as time chunking.
            out = jax.lax.map(
                lambda w: run_stack(w, None), wav.reshape(nch, b // nch, t)
            )
            return out.reshape(b, out.shape[2], out.shape[3])
        r, hop = frontend_receptive_field(c.conv_layers)
        t_frames = max(int((t - r) // hop + 1), 1)
        f = -(-t_frames // nch)  # frames per chunk
        t_need = nch * f * hop + (r - hop)
        if t_need > t:
            wav = jnp.pad(wav, ((0, 0), (0, t_need - t)))
        chunk_len = f * hop + (r - hop)
        starts = jnp.arange(nch) * (f * hop)

        gn_stats = None
        if c.extractor_mode == "group_norm":
            # exact whole-utterance stats for the layer-0 GroupNorm: the
            # chunks' layer-0 outputs overlap by their halo, so each chunk
            # contributes only its first `rows0` rows; the ragged final
            # chunk is bounded by the true layer-0 length.
            ch0, k0, s0 = c.conv_layers[0]
            l0_true = (t - k0) // s0 + 1  # pre-pad length
            rows0 = (f * hop) // s0

            def stats_chunk(i):
                w = jax.lax.dynamic_slice(
                    wav, (0, starts[i]), (b, chunk_len)
                )
                x0 = _conv1d_valid(
                    w[:, :, None].astype(dtype), convs[0][0], convs[0][1],
                    s0, c.conv_impl, dtype,
                ).astype(jnp.float32)
                # chunks overlap by their halo: a non-final chunk
                # contributes only its first rows0 rows (the rest belong to
                # the next chunk); the final chunk contributes everything
                # up to the true layer-0 length
                limit = jnp.where(
                    i == nch - 1,
                    jnp.minimum(l0_true - i * rows0, x0.shape[1]),
                    jnp.minimum(rows0, l0_true - i * rows0),
                )
                # fold the row mask into the ones-vector and reduce via
                # matmul (3-D fp32 reduces lower ~13x slower on v5e)
                ones_m = (jnp.arange(x0.shape[1]) < limit).astype(jnp.float32)
                cnt = jnp.maximum(limit, 0).astype(jnp.float32)
                return (
                    jnp.einsum("btc,t->bc", x0, ones_m,
                               precision=jax.lax.Precision.HIGHEST),
                    jnp.einsum("btc,t->bc", x0 * x0, ones_m,
                               precision=jax.lax.Precision.HIGHEST),
                    cnt,
                )

            sums, sqs, cnts = jax.lax.map(stats_chunk, jnp.arange(nch))
            n = cnts.sum()
            mean = sums.sum(axis=0) / n          # (B, C)
            var = sqs.sum(axis=0) / n - mean * mean
            gn_stats = (mean[:, None, :], var[:, None, :])

        def one_chunk(i):
            w = jax.lax.dynamic_slice(wav, (0, starts[i]), (b, chunk_len))
            return run_stack(w, gn_stats)

        out = jax.lax.map(one_chunk, jnp.arange(nch))  # (nch, B, F, C)
        out = out.transpose(1, 0, 2, 3).reshape(b, nch * f, -1)
        return out[:, :t_frames, :]


class PositionalConvEmbedding(nn.Module):
    """fairseq pos_conv: grouped Conv1d(k=conv_pos, pad=k//2) + SamePad + GELU.

    The weight-normalized torch parameterization (weight_g/weight_v) is
    materialized to a single kernel at import time (the tower is frozen, so
    the reparameterization has no training effect).

    `cfg.pos_conv_depth > 1` selects the data2vec-audio stacked variant:
    depth x [grouped conv -> non-affine LayerNorm -> GELU] (HF
    Data2VecAudioPositionalConvEmbedding semantics).
    """

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.cfg.conv_pos
        depth = int(getattr(self.cfg, "pos_conv_depth", 1) or 1)
        if depth > 1:
            for j in range(depth):
                x = nn.Conv(
                    features=self.cfg.d_model,
                    kernel_size=(k,),
                    padding=[(k // 2, k // 2)],
                    feature_group_count=self.cfg.conv_pos_groups,
                    use_bias=True,
                    dtype=self.cfg.dtype,
                    name=f"conv_{j}",
                )(x)
                if k % 2 == 0:
                    x = x[:, :-1, :]
                # parameter-free LayerNorm over channels
                xf = x.astype(jnp.float32)
                mean = xf.mean(axis=-1, keepdims=True)
                var = xf.var(axis=-1, keepdims=True)
                x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
                # exact erf GELU: HF Data2VecAudio uses it per conv layer and
                # the tanh approximation compounds over the 5 stacked layers
                # (round-4 advisor finding); negligible cost — this runs once
                # per forward on a (B, T, D) activation, not in the hot stack
                x = jax.nn.gelu(x, approximate=False)
            return x
        out = nn.Conv(
            features=self.cfg.d_model,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=self.cfg.conv_pos_groups,
            use_bias=True,
            dtype=self.cfg.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:  # SamePad: drop the trailing frame for even kernels
            out = out[:, :-1, :]
        return fast_gelu(out)


def relative_position_buckets(
    t: int, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """WavLM/T5 bucketed relative positions for a (T, T) self-attention.

    Mirrors HF `WavLMAttention._relative_positions_bucket`: sign selects
    the bucket half; small |distances| map 1:1, large ones log-spaced up to
    `max_distance`. Static-shape, computed once per forward.
    """
    ctx = jnp.arange(t)[:, None]
    mem = jnp.arange(t)[None, :]
    rel = mem - ctx                                   # (T, T)
    num = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * num
    ad = jnp.abs(rel)
    max_exact = num // 2
    is_small = ad < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(ad, 1).astype(jnp.float32) / max_exact)
        / jnp.log(jnp.float32(max_distance / max_exact))
        * (num - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num - 1)
    return buckets + jnp.where(is_small, ad, large)


class _ScanHubertLayer(nn.Module):
    """scan body: (carry, per-layer keep, broadcast bias) ->
    (new carry, per-layer output). `keep` implements LayerDrop as identity."""

    cfg: HubertConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, keep, key_padding_bias, position_bias):
        y = HubertEncoderLayer(self.cfg, name="layer")(
            carry, key_padding_bias, deterministic=self.deterministic,
            position_bias=position_bias,
        )
        y = jnp.where(keep, y, carry)
        return y, y


class _ScanHubertLayerFused(nn.Module):
    """scan body with the weighted sum fused into the carry: the (L+1,B,T,D)
    hidden-state stack never materializes (it is ~3 GB at batch 256 for the
    base tower). Carry = (x, acc); the per-layer softmax weight is a scanned
    input. `normalize_contrib` applies the s3prl-style parameter-free layer
    norm to each hidden state before weighting (`weighted_sum.py` semantics).
    """

    cfg: HubertConfig
    deterministic: bool = True
    normalize_contrib: bool = False
    stop_contrib_gradient: bool = False

    @nn.compact
    def __call__(self, carry, w_i, keep, key_padding_bias, position_bias):
        x, acc = carry
        y = HubertEncoderLayer(self.cfg, name="layer")(
            x, key_padding_bias, deterministic=self.deterministic,
            position_bias=position_bias,
        )
        y = jnp.where(keep, y, x)  # LayerDrop: dropped layer = identity
        contrib = y.astype(jnp.float32)
        if self.normalize_contrib:
            mean = contrib.mean(axis=-1, keepdims=True)
            var = contrib.var(axis=-1, keepdims=True)
            contrib = (contrib - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.stop_contrib_gradient:
            # frozen tower: weights still get gradient (w_i * sg(h_i)),
            # tower params get zero cotangents
            contrib = jax.lax.stop_gradient(contrib)
        return (y, acc + w_i * contrib), None


class HubertEncoderLayer(nn.Module):
    """fairseq TransformerSentenceEncoderLayer (separate q/k/v projections)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_bias: Optional[jnp.ndarray],
        deterministic: bool = True,
        position_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        dh = c.d_model // c.n_heads

        def rel_pos_gate(h):
            """WavLM per-layer gate on the shared relative-position bias
            (HF WavLMAttention: gate from the PRE-projection hidden states,
            per head and query position). Returns (B, H, T) — the gated
            bias factorizes as gate(b,h,q) * position_bias(h,q,k)."""
            B, T, D = h.shape
            H = c.n_heads
            gh = h.reshape(B, T, H, dh).transpose(0, 2, 1, 3)  # (B,H,T,dh)
            proj = nn.Dense(8, dtype=c.dtype, name="gru_rel_pos_linear")(gh)
            proj = proj.astype(jnp.float32).reshape(B, H, T, 2, 4).sum(-1)
            gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
            const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1)
            ).astype(jnp.float32)
            gate = gate_a * (gate_b * const - 1.0) + 2.0      # (B,H,T,1)
            return gate[..., 0]

        def attn(h):
            B, T, D = h.shape
            if position_bias is not None and getattr(
                c, "fused_attention_block", False
            ):
                # WavLM through the fused block kernel: the shared (H,T,T)
                # bias rides resident (bf16) and the per-row gate is a
                # kernel input — the (B,H,T,T) gated bias never exists
                from ..nn.fused_attention_block import fused_attention_block

                gate = rel_pos_gate(h)
                wq, bq = _DenseParams(D, D, name="q_proj")()
                wk, bk = _DenseParams(D, D, name="k_proj")()
                wv, bv = _DenseParams(D, D, name="v_proj")()
                wo, bo = _DenseParams(D, D, name="out_proj")()
                kp2 = None
                if key_padding_bias is not None:
                    kp2 = key_padding_bias
                    if kp2.ndim == 4:
                        kp2 = kp2[:, 0, 0, :]
                return fused_attention_block(
                    h, wq, bq, wk, bk, wv, bv, wo, bo, kp2,
                    n_heads=c.n_heads,
                    dropout_rate=c.attention_dropout,
                    dropout_rng=self.make_rng("dropout")
                    if (c.attention_dropout > 0 and not deterministic)
                    else None,
                    deterministic=deterministic,
                    dtype=c.dtype,
                    attn_bias=position_bias,
                    attn_gate=gate,
                )
            if position_bias is not None:
                # WavLM XLA path: full (B,H,T,T) additive bias
                bias = rel_pos_gate(h)[:, :, :, None] * position_bias[
                    None
                ].astype(jnp.float32)
                if key_padding_bias is not None:
                    bias = bias + key_padding_bias
                q = nn.Dense(D, dtype=c.dtype, name="q_proj")(h)
                kk = nn.Dense(D, dtype=c.dtype, name="k_proj")(h)
                v = nn.Dense(D, dtype=c.dtype, name="v_proj")(h)
                split = lambda a: a.reshape(B, T, c.n_heads, dh).transpose(
                    0, 2, 1, 3)
                out = dot_product_attention(
                    split(q), split(kk), split(v), bias=bias,
                    dropout_rate=c.attention_dropout,
                    dropout_rng=self.make_rng("dropout")
                    if (c.attention_dropout > 0 and not deterministic)
                    else None,
                    deterministic=deterministic,
                )
                out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
                return nn.Dense(D, dtype=c.dtype, name="out_proj")(out)
            if getattr(c, "fused_attention_block", False):
                from ..nn.fused_attention_block import fused_attention_block

                wq, bq = _DenseParams(D, D, name="q_proj")()
                wk, bk = _DenseParams(D, D, name="k_proj")()
                wv, bv = _DenseParams(D, D, name="v_proj")()
                wo, bo = _DenseParams(D, D, name="out_proj")()
                return fused_attention_block(
                    h, wq, bq, wk, bk, wv, bv, wo, bo, key_padding_bias,
                    n_heads=c.n_heads,
                    dropout_rate=c.attention_dropout,
                    dropout_rng=self.make_rng("dropout")
                    if (c.attention_dropout > 0 and not deterministic)
                    else None,
                    deterministic=deterministic,
                    dtype=c.dtype,
                )
            if getattr(c, "fused_qkv", False):
                wq, bq = _DenseParams(D, D, name="q_proj")()
                wk, bk = _DenseParams(D, D, name="k_proj")()
                wv, bv = _DenseParams(D, D, name="v_proj")()
                w3 = jnp.concatenate([wq, wk, wv], axis=1).astype(c.dtype)
                b3 = jnp.concatenate([bq, bk, bv]).astype(c.dtype)
                qkv = h.astype(c.dtype) @ w3 + b3
                q, kk, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = nn.Dense(D, dtype=c.dtype, name="q_proj")(h)
                kk = nn.Dense(D, dtype=c.dtype, name="k_proj")(h)
                v = nn.Dense(D, dtype=c.dtype, name="v_proj")(h)
            split = lambda t: t.reshape(B, T, c.n_heads, dh).transpose(0, 2, 1, 3)
            if c.fused_attention_dropout:
                from ..nn.fused_attention import fused_attention_dropout

                out = fused_attention_dropout(
                    split(q),
                    split(kk),
                    split(v),
                    key_padding_bias,
                    dropout_rate=c.attention_dropout,
                    dropout_rng=self.make_rng("dropout")
                    if (c.attention_dropout > 0 and not deterministic)
                    else None,
                    deterministic=deterministic,
                )
            elif c.use_flash_attention and (
                deterministic or c.attention_dropout == 0.0
            ):
                from ..nn.flash import flash_attention

                kpm = None
                if key_padding_bias is not None:
                    kpm = key_padding_bias[:, 0, 0, :] < -1e20  # bias -> bool
                out = flash_attention(split(q), split(kk), split(v), kpm)
            else:
                out = dot_product_attention(
                    split(q),
                    split(kk),
                    split(v),
                    bias=key_padding_bias,
                    dropout_rate=c.attention_dropout,
                    dropout_rng=self.make_rng("dropout")
                    if (c.attention_dropout > 0 and not deterministic)
                    else None,
                    deterministic=deterministic,
                )
            out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
            return nn.Dense(D, dtype=c.dtype, name="out_proj")(out)

        def ffn(h):
            h = nn.Dense(c.ffn_dim, dtype=c.dtype, name="fc1")(h)
            h = fast_gelu(h)
            h = FastDropout(c.activation_dropout)(h, deterministic=deterministic)
            return nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(h)

        drop = lambda h: FastDropout(c.dropout)(h, deterministic=deterministic)
        ln_attn = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="self_attn_layer_norm")
        ln_final = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="final_layer_norm")

        if c.layer_norm_first:
            x = x + drop(attn(ln_attn(x)))
            x = x + drop(ffn(ln_final(x)))
        else:
            x = ln_attn(x + drop(attn(x)))
            x = ln_final(x + drop(ffn(x)))
        return x


class HubertModel(nn.Module):
    """Full tower. Returns all hidden states stacked (L+1, B, T', D).

    `hidden_states[0]` is the encoder input *after* pos-conv add (+ layer norm
    and dropout in the post-norm/base variant), `hidden_states[i]` the output
    of layer i — exactly the `layer_results` list built by the reference's
    `custom_FairseqTransformerEncoder_extract_features`
    (`speech_encoder_plus.py:47-53`).
    """

    cfg: HubertConfig

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        wav_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        layer_weights: Optional[jnp.ndarray] = None,
        normalize_contrib: bool = False,
        stop_contrib_gradient: bool = False,
    ) -> dict:
        c = self.cfg
        feats = ConvFeatureExtractor(c, name="feature_extractor")(wav)  # (B,T',512)
        n_frames = feats.shape[1]

        feats = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm")(feats)

        feat_padding_mask = None
        if wav_padding_mask is not None:
            feat_padding_mask = downsample_padding_mask(wav_padding_mask, n_frames)

        if c.conv_layers[-1][0] != c.d_model:
            feats = nn.Dense(c.d_model, dtype=c.dtype, name="post_extract_proj")(feats)
        x = FastDropout(c.dropout)(feats, deterministic=deterministic)

        # --- encoder (fairseq TransformerEncoder.extract_features) ---
        if feat_padding_mask is not None:
            x = jnp.where(feat_padding_mask[:, :, None], 0.0, x)
        x = x + PositionalConvEmbedding(c, name="pos_conv")(x)
        if not c.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="encoder_layer_norm")(x)
        else:
            # parameters must exist (fairseq large ckpts carry
            # encoder.layer_norm) but the custom forward never applies the
            # final LN to hidden states (speech_encoder_plus.py:39-41,58-64);
            # the unused application materializes the params and is
            # dead-code-eliminated by XLA
            nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="encoder_layer_norm")(x)
        x = FastDropout(c.dropout)(x, deterministic=deterministic)

        key_padding_bias = None
        if feat_padding_mask is not None:
            key_padding_bias = jnp.where(
                feat_padding_mask[:, None, None, :], -1e30, 0.0
            ).astype(jnp.float32)

        # WavLM: ONE bucketed relative-position bias table for the whole
        # stack (HF keeps it in layer 0; a scanned homogeneous stack hoists
        # it to the model), gated per layer inside HubertEncoderLayer
        position_bias = None
        if getattr(c, "rel_pos_bias", False):
            rel_embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(stddev=0.02),
                (c.rel_buckets, c.n_heads),
            )
            buckets = relative_position_buckets(
                x.shape[1], c.rel_buckets, c.rel_max_distance
            )
            position_bias = jnp.take(
                rel_embed, buckets.reshape(-1), axis=0
            ).reshape(x.shape[1], x.shape[1], c.n_heads).transpose(2, 0, 1)

        # LayerDrop keep mask: one bernoulli per layer per forward (fairseq
        # drops whole layers batch-wide; reference speech_encoder_plus.py:407)
        if c.layer_drop > 0.0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("layer_drop"), 1.0 - c.layer_drop, (c.n_layers,)
            )
        else:
            keep = jnp.ones((c.n_layers,), bool)

        if c.scan_layers and layer_weights is not None:
            # fused weighted-sum path: never materialize the hidden stack
            w = layer_weights.astype(jnp.float32)
            x0 = x.astype(jnp.float32)
            if normalize_contrib:
                mean = x0.mean(axis=-1, keepdims=True)
                var = x0.var(axis=-1, keepdims=True)
                x0 = (x0 - mean) * jax.lax.rsqrt(var + 1e-5)
            if stop_contrib_gradient:
                x0 = jax.lax.stop_gradient(x0)
            acc = w[0] * x0
            body = _ScanHubertLayerFused
            if c.remat:
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, 0, nn.broadcast, nn.broadcast),
                length=c.n_layers,
            )(c, deterministic, normalize_contrib, stop_contrib_gradient,
              name="layers")
            (x_final, acc), _ = scanned((x, acc), w[1:], keep,
                                        key_padding_bias, position_bias)
            return {
                "x": x_final,
                "weighted_sum": acc,
                "padding_mask": feat_padding_mask,
            }
        if c.scan_layers:
            body = _ScanHubertLayer
            if c.remat:
                body = nn.remat(body, prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast),
                length=c.n_layers,
            )(c, deterministic, name="layers")
            x_final, layer_outs = scanned(x, keep, key_padding_bias,
                                          position_bias)
            hidden_states = jnp.concatenate([x[None], layer_outs], axis=0)
            x = x_final
        else:
            hidden = [x]
            for i in range(c.n_layers):
                y = HubertEncoderLayer(c, name=f"layers_{i}")(
                    x, key_padding_bias, deterministic=deterministic,
                    position_bias=position_bias,
                )
                x = jnp.where(keep[i], y, x)
                hidden.append(x)
            hidden_states = jnp.stack(hidden, axis=0)

        return {
            "x": x,
            "hidden_states": hidden_states,  # (L+1, B, T', D)
            "padding_mask": feat_padding_mask,
        }
