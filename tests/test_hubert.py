"""HuBERT tower parity vs a torch oracle (transformers HubertModel).

The HF Hubert implementation is numerically identical to the fairseq model
the reference wraps (`avssl/module/speech_encoder_plus.py:319-634`): conv
frontend, feature projection, pos-conv embedding, transformer stack, with
`output_hidden_states=True` returning the same `layer_results` list the
reference's custom forward builds (hidden_states[0] = encoder input).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.checkpoint.towers import hf_hubert_to_flax
from speechclip_plus_tpu.models.hubert import (
    HubertConfig,
    HubertModel,
    downsample_padding_mask,
    hubert_feat_lengths,
    normalize_waveform,
)

transformers = pytest.importorskip("transformers")

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow


def _mk_pair(do_stable_layer_norm: bool):
    hf_cfg = transformers.HubertConfig(
        vocab_size=10,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_stride=(2, 2),
        conv_kernel=(3, 3),
        conv_bias=do_stable_layer_norm,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=do_stable_layer_norm,
        feat_extract_norm="layer" if do_stable_layer_norm else "group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    oracle = transformers.HubertModel(hf_cfg).eval()
    cfg = HubertConfig.tiny(
        conv_layers=((16, 3, 2), (16, 3, 2)),
        extractor_mode="layer_norm" if do_stable_layer_norm else "group_norm",
        conv_bias=do_stable_layer_norm,
        layer_norm_first=do_stable_layer_norm,
        dropout=0.0,
        attention_dropout=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = hf_hubert_to_flax(sd, cfg)
    return oracle, cfg, params


@pytest.mark.parametrize("stable_ln", [False, True], ids=["base-postnorm", "large-prenorm"])
def test_hubert_hidden_states_parity(stable_ln):
    oracle, cfg, params = _mk_pair(stable_ln)
    rng = np.random.RandomState(1)
    B, T = 3, 403
    lens = np.array([403, 250, 323])
    wav = rng.randn(B, T).astype(np.float32)
    for b, l in enumerate(lens):
        wav[b, l:] = 0.0
    pad_mask = np.arange(T)[None, :] >= lens[:, None]

    model = HubertModel(cfg)
    got = model.apply(
        {"params": params}, jnp.asarray(wav), jnp.asarray(pad_mask), deterministic=True
    )
    hs = np.asarray(got["hidden_states"])  # (L+1, B, T', D)

    n_frames = hs.shape[2]
    feat_mask = ~np.asarray(downsample_padding_mask(jnp.asarray(pad_mask), n_frames))

    # fairseq (the reference) downsamples the padding mask with its
    # reshape-all trick; HF derives it from per-sample conv arithmetic. Feed
    # HF attention-mask lengths chosen so both produce the *same* frame mask
    # (the waveform content is identical either way - zeros past the true
    # length), keeping the oracle honest.
    m = feat_mask.sum(axis=1)  # fairseq valid-frame counts
    la = 4 * m + 3  # inverse of two (k=3, s=2) conv length maps
    la = np.minimum(la, T)
    attn = np.zeros((B, T), dtype=bool)
    for b in range(B):
        attn[b, : la[b]] = True
    with torch.no_grad():
        out = oracle(
            torch.from_numpy(wav),
            attention_mask=torch.from_numpy(attn),
            output_hidden_states=True,
        )

    ref_hs = [h.numpy() for h in out.hidden_states]
    # HF stable-layer-norm applies the final encoder LN to its LAST hidden
    # state; the reference's custom fairseq forward does not
    # (speech_encoder_plus.py:39-64) — compare all but the last in that case.
    n_cmp = len(ref_hs) - (1 if stable_ln else 0)
    assert hs.shape[0] == len(ref_hs)
    for i in range(n_cmp):
        # compare only valid frames
        for b in range(B):
            v = feat_mask[b]
            np.testing.assert_allclose(
                hs[i][b][v], ref_hs[i][b][v], rtol=2e-4, atol=2e-5,
                err_msg=f"hidden state {i}, batch {b}",
            )


def test_feat_lengths_match_conv_output():
    cfg = HubertConfig.base()
    # exact conv arithmetic: 16000 samples -> 49 frames for the base frontend
    assert int(hubert_feat_lengths(jnp.asarray([16000]), cfg.conv_layers)[0]) == 49
    assert cfg.downsample_rate == 320


def test_normalize_waveform_matches_torch_layernorm():
    rng = np.random.RandomState(0)
    lens = np.array([300, 211])
    wav = np.zeros((2, 300), dtype=np.float32)
    for b, l in enumerate(lens):
        wav[b, :l] = rng.randn(l)
    got = np.asarray(normalize_waveform(jnp.asarray(wav), jnp.asarray(lens)))
    for b, l in enumerate(lens):
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(wav[b, :l]), (int(l),)
        ).numpy()
        np.testing.assert_allclose(got[b, :l], ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got[b, l:], 0.0, atol=1e-6)


def test_fused_weighted_sum_matches_stack():
    """The scan-fused weighted sum must equal softmax-weighting the full
    hidden-state stack, and must pass gradients to the weights but not the
    tower when stop_contrib_gradient is set."""
    cfg = HubertConfig.tiny()
    model = HubertModel(cfg)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 403).astype(np.float32))
    pad = jnp.asarray(np.arange(403)[None, :] >= np.array([[403], [250]]))
    params = model.init({"params": jax.random.PRNGKey(0)}, wav, pad)["params"]

    logits = jnp.asarray(rng.randn(cfg.n_layers + 1).astype(np.float32))
    w = jax.nn.softmax(logits)

    stack = model.apply({"params": params}, wav, pad)["hidden_states"]
    ref = (w[:, None, None, None] * stack).sum(0)

    fused = model.apply(
        {"params": params}, wav, pad, layer_weights=w,
        stop_contrib_gradient=True,
    )["weighted_sum"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(lg, p):
        ws = jax.nn.softmax(lg)
        out = model.apply({"params": p}, wav, pad, layer_weights=ws,
                          stop_contrib_gradient=True)
        return (out["weighted_sum"] ** 2).sum()

    g_w, g_p = jax.grad(loss, argnums=(0, 1))(logits, params)
    assert float(jnp.abs(g_w).sum()) > 0
    import optax

    assert float(optax.global_norm(g_p)) == 0.0


def test_conv_impl_matmul_matches_xla_and_param_layout():
    """The strided-patch matmul lowering must be numerically identical to
    the XLA conv lowering and share its param tree (checkpoints are
    interchangeable between the two impls)."""
    import dataclasses

    from speechclip_plus_tpu.models.hubert import ConvFeatureExtractor

    for mode, bias in [("group_norm", False), ("layer_norm", True)]:
        cfg_m = HubertConfig(
            conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
            extractor_mode=mode, conv_bias=bias, conv_impl="matmul",
        )
        cfg_h = dataclasses.replace(cfg_m, conv_impl="hybrid")
        cfg_x = dataclasses.replace(cfg_m, conv_impl="xla")
        wav = jnp.asarray(
            np.random.RandomState(0).randn(2, 2000).astype(np.float32)
        )
        pm = ConvFeatureExtractor(cfg_m).init(
            {"params": jax.random.PRNGKey(0)}, wav
        )
        px = ConvFeatureExtractor(cfg_x).init(
            {"params": jax.random.PRNGKey(0)}, wav
        )
        assert jax.tree_util.tree_structure(pm) == jax.tree_util.tree_structure(px)
        for a, b in zip(jax.tree_util.tree_leaves(pm), jax.tree_util.tree_leaves(px)):
            assert a.shape == b.shape
        out_m = ConvFeatureExtractor(cfg_m).apply(pm, wav)
        out_h = ConvFeatureExtractor(cfg_h).apply(pm, wav)
        out_x = ConvFeatureExtractor(cfg_x).apply(pm, wav)
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_x), atol=2e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-5, rtol=1e-5
        )


def test_chunked_frontend_matches_unchunked():
    """frontend_chunks executes the conv stack in time chunks (lax.map) with
    exact tiling + whole-utterance GroupNorm stats; outputs must equal the
    unchunked path (and the param tree must be identical) for both
    extractor modes, including a ragged final chunk."""
    import dataclasses

    from speechclip_plus_tpu.models.hubert import ConvFeatureExtractor

    for mode, bias in [("group_norm", False), ("layer_norm", True)]:
        base = HubertConfig(
            conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
            extractor_mode=mode, conv_bias=bias,
        )
        # receptive field 70, hop 20; T chosen so the last chunk is ragged
        wav = jnp.asarray(
            np.random.RandomState(0).randn(3, 4130).astype(np.float32)
        )
        # B=4, nch=2 divides the batch -> exercises the batch-chunked
        # (bit-exact, no-halo) preferred path instead of time chunking
        wav4 = jnp.asarray(
            np.random.RandomState(1).randn(4, 4130).astype(np.float32)
        )
        p1 = ConvFeatureExtractor(base).init(
            {"params": jax.random.PRNGKey(0)}, wav
        )
        ref = ConvFeatureExtractor(base).apply(p1, wav)
        for nch in (2, 3):
            cfg = dataclasses.replace(base, frontend_chunks=nch)
            p2 = ConvFeatureExtractor(cfg).init(
                {"params": jax.random.PRNGKey(0)}, wav
            )
            assert jax.tree_util.tree_structure(p1) == \
                jax.tree_util.tree_structure(p2)
            out = ConvFeatureExtractor(cfg).apply(p1, wav)
            assert out.shape == ref.shape, (nch, out.shape, ref.shape)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=3e-5, rtol=2e-5,
                err_msg=f"mode={mode} nch={nch}",
            )
        ref4 = ConvFeatureExtractor(base).apply(p1, wav4)
        cfg4 = dataclasses.replace(base, frontend_chunks=2)
        out4 = ConvFeatureExtractor(cfg4).apply(p1, wav4)
        assert out4.shape == ref4.shape
        np.testing.assert_allclose(
            np.asarray(out4), np.asarray(ref4), atol=1e-6, rtol=1e-6,
            err_msg=f"mode={mode} batch-chunked",
        )
