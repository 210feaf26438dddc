"""Mel-input s3prl upstream family (APC/VQ-APC LSTM, TERA-family transformer).

Reference capability: `avssl/module/speech_encoder_plus.py:110-146` wraps any
`s3prl.hub` upstream. These tests pin the TPU rebuild's native equivalents:
torch-oracle LSTM numerics, the log-mel frontend's math, name resolution,
and end-to-end integration through `KWClip.forward_audio`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechclip_plus_tpu.models.mel_upstreams import (
    MelUpstream,
    MelUpstreamConfig,
    import_torch_lstm_state,
)
from speechclip_plus_tpu.nn.lstm import LSTMStack
from speechclip_plus_tpu.ops.mel import (
    log_mel_spectrogram,
    mel_filterbank,
    mel_frame_count,
)


# ------------------------------------------------------------- mel ----


def test_mel_filterbank_partition():
    """Triangular filters tile the band: interior FFT bins inside
    (fmin..fmax) get positive total weight; each filter peaks at ~1."""
    fb = mel_filterbank(80, 512, 16000)
    assert fb.shape == (257, 80)
    assert np.all(fb >= 0)
    # every filter has support (the narrowest low-mel triangles straddle
    # only a couple of FFT bins, so peaks can sit well below 1)
    assert np.all(fb.max(axis=0) > 0.1)
    # interior bins (skip DC and Nyquist edges) are covered by some filter
    assert np.all(fb[5:-5].sum(axis=1) > 0)


def test_log_mel_shapes_and_frame_count():
    wav = jnp.asarray(np.random.RandomState(0).randn(3, 16000).astype(np.float32))
    mel = log_mel_spectrogram(wav)
    assert mel.shape == (3, mel_frame_count(16000), 80)
    assert mel_frame_count(16000) == (16000 - 400) // 160 + 1
    assert bool(jnp.all(jnp.isfinite(mel)))


def test_log_mel_matches_numpy_reference():
    """Pin the framing/window/FFT math against a direct numpy computation."""
    rng = np.random.RandomState(1)
    wav = rng.randn(1, 4000).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))[0]

    win, hop, n_fft = 400, 160, 512
    nf = (4000 - win) // hop + 1
    window = np.hanning(win)
    fb = mel_filterbank(80, n_fft, 16000)
    want = np.zeros((nf, 80), np.float32)
    for f in range(nf):
        frame = wav[0, f * hop : f * hop + win] * window
        spec = np.fft.rfft(frame, n=n_fft)
        power = np.abs(spec) ** 2
        want[f] = np.log(np.maximum(power @ fb, 1e-10))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ lstm ----


@pytest.mark.slow
def test_lstm_stack_matches_torch():
    """LSTMStack == torch.nn.LSTM under 1:1 state-dict import."""
    import torch

    torch.manual_seed(0)
    B, T, D, H, L = 2, 17, 12, 8, 3
    t_lstm = torch.nn.LSTM(D, H, num_layers=L, batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        t_out, _ = t_lstm(x)

    model = LSTMStack(features=H, n_layers=L)
    params = import_torch_lstm_state(
        {k: v.numpy() for k, v in t_lstm.state_dict().items()}, L
    )
    outs = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(outs[-1]), t_out.numpy(), rtol=1e-5, atol=1e-5
    )
    assert len(outs) == L


# --------------------------------------------------- name resolution ----


@pytest.mark.parametrize(
    "name,kind,arch,layers,d",
    [
        ("apc", "apc", "lstm", 3, 512),
        ("apc_360hr", "apc", "lstm", 3, 512),
        ("vq_apc", "vq_apc", "lstm", 3, 512),
        ("tera", "tera", "transformer", 3, 768),
        ("tera_960hr", "tera", "transformer", 3, 768),
        ("mockingjay", "mockingjay", "transformer", 12, 768),
        ("decoar2", "decoar2", "transformer", 12, 768),
    ],
)
def test_from_upstream_name(name, kind, arch, layers, d):
    c = MelUpstreamConfig.from_upstream_name(name)
    assert (c.kind, c.arch, c.n_layers, c.d_model) == (kind, arch, layers, d)
    assert c.downsample_rate == 160


def test_unknown_upstream_raises():
    with pytest.raises(NotImplementedError):
        MelUpstreamConfig.from_upstream_name("pase_plus")


# ------------------------------------------------------- the module ----


@pytest.mark.parametrize("arch", ["lstm", "transformer"])
def test_mel_upstream_forward(arch):
    cfg = MelUpstreamConfig(
        arch=arch, d_model=16, n_layers=2, n_heads=4, ffn_dim=32
    )
    model = MelUpstream(cfg)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 3200).astype(np.float32))
    pad = jnp.arange(3200)[None, :] >= jnp.asarray([3200, 2000])[:, None]
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav, pad)
    out = model.apply(variables, wav, pad)
    nf = mel_frame_count(3200)
    expect_states = cfg.num_hidden_states
    assert out["hidden_states"].shape == (expect_states, 2, nf, 16)
    assert out["x"].shape == (2, nf, 16)
    assert bool(jnp.all(jnp.isfinite(out["hidden_states"])))
    # padded-frame masking reaches the tower input
    assert out["padding_mask"].shape == (2, nf)
    assert bool(out["padding_mask"][1, -1])


# ------------------------------------------------- kwclip integration ----


def _tiny_cfg_yaml(tmp_path, name):
    import yaml

    from speechclip_plus_tpu.config import ConfigNode

    base = {
        "data": {"dataset": {"name": "flickr", "dataset_root": "/none"},
                 "batch_size": 2},
        "model_settings": {
            "cascaded_objective_weight": 0.0,
            "parallel_objective_weight": 1.0,
            "parallel_branch": {
                "type": "KW_ParallelBranch",
                "need_projection": True,
                "transformer_args": {
                    "type": "TransformerEncoder",
                    "n_layers": 1,
                    "d_model": 16,
                    "nhead": 4,
                    "dim_feedforward": 32,
                    "dropout": 0.1,
                },
            },
        },
        "cl_loss": {"type": "MaskedContrastiveLoss", "temperature": 0.07,
                    "temperature_trainable": True},
        "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
        "clip": {"name": "ViT-B/32", "tiny": True, "tiny_width": 16},
        "audio_encoder": {"type": "s3prl", "name": name,
                          "trainable": False, "max_audio_len": 3200},
        "trainer": {"precision": 32},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(base))
    return ConfigNode(base)


@pytest.mark.parametrize("name", ["apc", "tera"])
def test_kwclip_with_mel_upstream(tmp_path, name):
    """An apc/tera-named audio encoder builds, forwards, and feeds the
    weighted sum + parallel branch end to end (reference: any s3prl name is
    a legal `audio_encoder.name`)."""
    from speechclip_plus_tpu.models.kwclip import KWClip, KWClipConfig
    from speechclip_plus_tpu.models.mel_upstreams import MelUpstreamConfig

    cfg = _tiny_cfg_yaml(tmp_path, name)
    mc = KWClipConfig.from_config(cfg)
    assert isinstance(mc.audio, MelUpstreamConfig)
    # branch d_model must match the upstream width for a real run; the tiny
    # test branch is 16-wide so shrink the upstream to match
    import dataclasses

    mc = dataclasses.replace(
        mc,
        audio=dataclasses.replace(
            mc.audio, d_model=16, n_layers=2, n_heads=4, ffn_dim=32
        ),
    )
    model = KWClip(mc)
    rng = np.random.RandomState(0)
    batch = {
        "wav": jnp.asarray(rng.randn(2, 3200).astype(np.float32)),
        "wav_len": jnp.asarray([3200, 2000]),
        "image": jnp.asarray(rng.randn(2, 3, 224, 224).astype(np.float32)),
        "text": jnp.zeros((2, 77), jnp.int32),
        "id": jnp.asarray([0, 1]),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, batch, training=False)
    # weighted-sum width matches the upstream's hidden-state count
    assert variables["params"]["weightedsum"].shape == (
        mc.audio.num_hidden_states,
    )
    feats, logm, others = model.apply(variables, batch, training=False)
    assert feats["parallel_audio_feat"].shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(feats["parallel_audio_feat"])))
