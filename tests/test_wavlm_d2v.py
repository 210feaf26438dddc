"""WavLM + data2vec-audio towers vs the HuggingFace oracles.

Closes the generic-s3prl inventory row (SURVEY §2.6): the reference accepts
any `s3prl.hub` upstream name (`avssl/module/speech_encoder_plus.py:110-146`);
beyond the HuBERT/wav2vec2 family and the mel upstreams, WavLM (gated
relative position bias) and data2vec audio (stacked positional conv) now
resolve natively. Oracle = randomly-initialized HF models (no egress),
weights imported 1:1 via checkpoint/towers.py."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from speechclip_plus_tpu.checkpoint.towers import (  # noqa: E402
    hf_data2vec_audio_to_flax,
    hf_wavlm_to_flax,
)
from speechclip_plus_tpu.models.hubert import (  # noqa: E402
    HubertConfig,
    HubertModel,
)

pytestmark = pytest.mark.slow


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _wav_batch(rng, B=2, T=2000):
    wav = rng.randn(B, T).astype(np.float32)
    lens = np.array([T, T - 700])
    for b, l in enumerate(lens):
        wav[b, l:] = 0.0
    mask = np.arange(T)[None, :] >= lens[:, None]
    return wav, lens, mask


# Full-valid batches for the value-parity oracles: HF derives frame-level
# attention masks by per-layer conv arithmetic while fairseq (and this
# rebuild, SURVEY §2.6 / hubert.downsample_padding_mask) marks a frame pad
# iff ALL its waveform samples are pad — off-by-a-frame at the boundary,
# and HF zeroes padded frames BEFORE the positional conv, so boundary
# differences propagate through the conv halo. Padded-batch semantics are
# covered by the fairseq-convention tests (test_hubert.py, test_masks_*).
def _full_batch(rng, B=2, T=2000):
    return rng.randn(B, T).astype(np.float32)


def test_wavlm_tower_matches_hf():
    torch.manual_seed(0)
    hf_cfg = transformers.WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(3, 3),
        conv_stride=(2, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        num_buckets=8, max_bucket_distance=20, hidden_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, do_stable_layer_norm=False,
    )
    hf = transformers.WavLMModel(hf_cfg).eval()

    cfg = HubertConfig(
        conv_layers=((16, 3, 2), (16, 3, 2)), d_model=32, n_layers=2,
        n_heads=4, ffn_dim=64, conv_pos=16, conv_pos_groups=2,
        rel_pos_bias=True, rel_buckets=8, rel_max_distance=20,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    model = HubertModel(cfg)
    params = hf_wavlm_to_flax(_np_sd(hf), cfg)

    rng = np.random.RandomState(0)
    wav = _full_batch(rng)
    with torch.no_grad():
        t_out = hf(torch.tensor(wav), output_hidden_states=True)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(wav), None, deterministic=True,
    )
    j_hs = np.asarray(out["hidden_states"])  # (L+1, B, T', D)
    t_hs = [h.numpy() for h in t_out.hidden_states]
    assert j_hs.shape[0] == len(t_hs) == cfg.n_layers + 1
    for l in range(len(t_hs)):
        np.testing.assert_allclose(
            j_hs[l], t_hs[l], rtol=2e-3, atol=2e-4,
        )


def test_data2vec_tower_matches_hf():
    torch.manual_seed(1)
    hf_cfg = transformers.Data2VecAudioConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(3, 3),
        conv_stride=(2, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=3, num_conv_pos_embedding_groups=2,
        conv_pos_kernel_size=5, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
    )
    hf = transformers.Data2VecAudioModel(hf_cfg).eval()

    cfg = HubertConfig(
        conv_layers=((16, 3, 2), (16, 3, 2)), d_model=32, n_layers=2,
        n_heads=4, ffn_dim=64, conv_pos=5, conv_pos_groups=2,
        pos_conv_depth=3, extractor_mode="layer_norm", conv_bias=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    model = HubertModel(cfg)
    params = hf_data2vec_audio_to_flax(_np_sd(hf), cfg)

    rng = np.random.RandomState(1)
    wav = _full_batch(rng)
    with torch.no_grad():
        t_out = hf(torch.tensor(wav), output_hidden_states=True)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(wav), None, deterministic=True,
    )
    j_hs = np.asarray(out["hidden_states"])
    t_hs = [h.numpy() for h in t_out.hidden_states]
    assert j_hs.shape[0] == len(t_hs) == cfg.n_layers + 1
    for l in range(len(t_hs)):
        np.testing.assert_allclose(
            j_hs[l], t_hs[l], rtol=2e-3, atol=2e-4,
        )


def test_upstream_name_resolution():
    assert HubertConfig.from_upstream_name("wavlm_base_plus").rel_pos_bias
    assert HubertConfig.from_upstream_name("wavlm_large").d_model == 1024
    d2v = HubertConfig.from_upstream_name("data2vec")
    assert d2v.pos_conv_depth == 5 and d2v.extractor_mode == "layer_norm"
    assert HubertConfig.from_upstream_name("data2vec_large_ll60k").n_layers == 24


def test_wavlm_fused_block_not_applicable():
    """The rel-pos-bias path must keep the XLA attention (the fused block
    kernel supports key-padding bias only) — full forward stays finite with
    the flag set."""
    cfg = HubertConfig(
        conv_layers=((16, 3, 2),), d_model=32, n_layers=1, n_heads=4,
        ffn_dim=64, conv_pos=16, conv_pos_groups=2, rel_pos_bias=True,
        rel_buckets=8, rel_max_distance=20, fused_attention_block=True,
    )
    model = HubertModel(cfg)
    rng = np.random.RandomState(2)
    wav, lens, mask = _wav_batch(rng, T=900)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav),
                           jnp.asarray(mask))
    out = model.apply(variables, jnp.asarray(wav), jnp.asarray(mask))
    assert np.isfinite(np.asarray(out["hidden_states"])).all()
