"""Trainable-encoder policies + feature-selection surface.

Reference: `avssl/module/speech_encoder_plus.py`
  - `feat_select_idx` int list (:612-634)
  - `layer_drop` (:407-415)
  - `trainable` / `reinit_layers` / `unfreeze_layers` subset policies
    (:418-449, trainable_params :478-494)
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_plus_tpu.models import KWClip
from speechclip_plus_tpu.optim import build_optimizer
from speechclip_plus_tpu.parallel import create_train_state, make_train_step
from speechclip_plus_tpu.tasks.builder import reinit_hubert_layers

from test_kwclip_model import make_batch, tiny_cfg

# slow tier: train-step compiles
pytestmark = pytest.mark.slow


def _leaf_diff(a, b):
    return jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b
    )


def _train_once(cfg):
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(
        variables["params"], cfg,
        scheduler_args={"warmup": 1, "max_step": 8, "final_lr": 1e-8},
    )
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, donate=False)
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    return variables["params"], new_state.params


def test_audio_trainable_updates_tower_params():
    cfg = dataclasses.replace(tiny_cfg(""), audio_trainable=True)
    before, after = _train_once(cfg)
    layer_deltas = jax.tree_util.tree_leaves(
        _leaf_diff(before["audio_encoder"]["layers"], after["audio_encoder"]["layers"])
    )
    assert max(layer_deltas) > 0.0, "trainable tower got no update"
    conv_deltas = jax.tree_util.tree_leaves(
        _leaf_diff(before["audio_encoder"]["feature_extractor"],
                   after["audio_encoder"]["feature_extractor"])
    )
    assert max(conv_deltas) > 0.0  # full trainable: conv frontend updates too


def test_audio_frozen_keeps_tower_params():
    cfg = tiny_cfg("")  # audio_trainable=False
    before, after = _train_once(cfg)
    deltas = jax.tree_util.tree_leaves(
        _leaf_diff(before["audio_encoder"], after["audio_encoder"])
    )
    assert max(deltas) == 0.0


def test_unfreeze_layers_trains_only_selected_slice():
    cfg = dataclasses.replace(
        tiny_cfg(""), audio_trainable=True, unfreeze_layers=(1,)
    )
    before, after = _train_once(cfg)
    layers_b = before["audio_encoder"]["layers"]
    layers_a = after["audio_encoder"]["layers"]

    def slice_delta(i):
        return max(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda x, y: float(jnp.max(jnp.abs(x[i] - y[i]))),
                    layers_b, layers_a,
                )
            )
        )

    assert slice_delta(1) > 0.0, "selected layer must update"
    assert slice_delta(0) == 0.0, "unselected layer must stay frozen"
    for frozen_key in ("feature_extractor", "pos_conv"):
        d = jax.tree_util.tree_leaves(
            _leaf_diff(before["audio_encoder"][frozen_key],
                       after["audio_encoder"][frozen_key])
        )
        assert max(d) == 0.0, frozen_key
    # post-norm base: the final encoder LayerNorm trains too
    # (reference trainable_params, speech_encoder_plus.py:489)
    d = jax.tree_util.tree_leaves(
        _leaf_diff(before["audio_encoder"]["encoder_layer_norm"],
                   after["audio_encoder"]["encoder_layer_norm"])
    )
    assert max(d) > 0.0


def test_layer_drop_identity_when_all_dropped():
    cfg = tiny_cfg("")
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, layer_drop=1.0, dropout=0.0,
                                       attention_dropout=0.0),
    )
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)

    def fwd_audio(training):
        return model.apply(
            variables, batch["wav"], batch["wav_len"],
            deterministic=not training, return_hidden_states=True,
            method=KWClip.forward_audio,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "layer_drop": jax.random.PRNGKey(4)},
        )

    _, _, hidden_train = fwd_audio(training=True)
    # p=1.0 -> every layer dropped -> every hidden state equals the input
    for i in range(1, hidden_train.shape[0]):
        np.testing.assert_allclose(
            np.asarray(hidden_train[i]), np.asarray(hidden_train[0]),
            rtol=0, atol=0,
        )
    _, _, hidden_eval = fwd_audio(training=False)
    # eval is unaffected by layer_drop
    assert float(jnp.abs(hidden_eval[-1] - hidden_eval[0]).max()) > 0.0


def test_feat_select_idx_int_list():
    base = tiny_cfg("")
    cfg_multi = dataclasses.replace(base, feat_select_idx=(0, 2))
    cfg_single = dataclasses.replace(base, feat_select_idx=(2,))
    model = KWClip(cfg_multi)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = KWClip(base).init(
        {"params": jax.random.PRNGKey(0)}, batch, training=False
    )

    feat, feat_len, hidden = model.apply(
        variables, batch["wav"], batch["wav_len"], return_hidden_states=True,
        method=KWClip.forward_audio,
    )
    assert feat.shape[0] == 2  # (n_selected, B, T, D)
    np.testing.assert_array_equal(np.asarray(feat[0]), np.asarray(hidden[0]))
    np.testing.assert_array_equal(np.asarray(feat[1]), np.asarray(hidden[2]))

    feat1, _ = KWClip(cfg_single).apply(
        variables, batch["wav"], batch["wav_len"], method=KWClip.forward_audio
    )
    np.testing.assert_array_equal(np.asarray(feat1), np.asarray(hidden[2]))

    with pytest.raises(NotImplementedError):
        model.apply(variables, batch, training=False)


def test_reinit_hubert_layers_swaps_slices():
    rng = np.random.RandomState(0)
    imported = {"layers": {"layer": {"w": rng.randn(3, 4).astype(np.float32)}},
                "pos_conv": {"k": rng.randn(2).astype(np.float32)}}
    random_tree = {"layers": {"layer": {"w": np.zeros((3, 4), np.float32)}},
                   "pos_conv": {"k": np.ones(2, np.float32)}}
    out = reinit_hubert_layers(imported, random_tree, [1])
    got = np.asarray(out["layers"]["layer"]["w"])
    np.testing.assert_array_equal(got[1], np.zeros(4))
    np.testing.assert_array_equal(got[0], imported["layers"]["layer"]["w"][0])
    np.testing.assert_array_equal(out["pos_conv"]["k"], imported["pos_conv"]["k"])


# --------------------------------------------------- s3prl upstream names ----


def test_upstream_name_registry_covers_wav2vec2_family():
    """wav2vec2 shares the HuBERT tower architecture; both name families
    resolve (reference speech_encoder_plus.py:110-146 accepts any s3prl hub
    name; every other upstream is a different architecture and raises)."""
    from speechclip_plus_tpu.models.hubert import HubertConfig

    for name in ("hubert", "hubert_base", "wav2vec2", "wav2vec2_base_960"):
        cfg = HubertConfig.from_upstream_name(name)
        assert cfg.d_model == 768 and cfg.n_layers == 12
    for name in ("hubert_large_ll60k", "wav2vec2_large_ll60k"):
        cfg = HubertConfig.from_upstream_name(name)
        assert cfg.d_model == 1024 and cfg.n_layers == 24
        assert cfg.layer_norm_first and cfg.extractor_mode == "layer_norm"
    with pytest.raises(NotImplementedError):
        HubertConfig.from_upstream_name("apc")


def test_fairseq_wav2vec2_sd_imports_through_hubert_converter():
    """A fairseq wav2vec2 state dict has the same tower keys as HuBERT plus
    quantizer/mask_emb extras; the converter must ignore the extras and
    produce params that drive the Flax tower."""
    from speechclip_plus_tpu.checkpoint.towers import fairseq_hubert_to_flax
    from speechclip_plus_tpu.models.hubert import HubertConfig, HubertModel

    cfg = HubertConfig.tiny()
    rng = np.random.RandomState(0)
    sd = {}
    t_in = 1
    for i, (ch, k, s) in enumerate(cfg.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rng.randn(
            ch, t_in, k
        ).astype(np.float32)
        t_in = ch
    sd["feature_extractor.conv_layers.0.2.weight"] = rng.randn(
        cfg.conv_layers[0][0]
    ).astype(np.float32)
    sd["feature_extractor.conv_layers.0.2.bias"] = rng.randn(
        cfg.conv_layers[0][0]
    ).astype(np.float32)
    sd["layer_norm.weight"] = rng.randn(cfg.conv_layers[-1][0]).astype(np.float32)
    sd["layer_norm.bias"] = rng.randn(cfg.conv_layers[-1][0]).astype(np.float32)
    sd["post_extract_proj.weight"] = rng.randn(
        cfg.d_model, cfg.conv_layers[-1][0]
    ).astype(np.float32)
    sd["post_extract_proj.bias"] = rng.randn(cfg.d_model).astype(np.float32)
    sd["encoder.pos_conv.0.weight"] = rng.randn(
        cfg.d_model, cfg.d_model // cfg.conv_pos_groups, cfg.conv_pos
    ).astype(np.float32)
    sd["encoder.pos_conv.0.bias"] = rng.randn(cfg.d_model).astype(np.float32)
    sd["encoder.layer_norm.weight"] = rng.randn(cfg.d_model).astype(np.float32)
    sd["encoder.layer_norm.bias"] = rng.randn(cfg.d_model).astype(np.float32)
    for i in range(cfg.n_layers):
        lp = f"encoder.layers.{i}."
        for proj in ("self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj", "self_attn.out_proj"):
            sd[f"{lp}{proj}.weight"] = rng.randn(
                cfg.d_model, cfg.d_model
            ).astype(np.float32)
            sd[f"{lp}{proj}.bias"] = rng.randn(cfg.d_model).astype(np.float32)
        sd[f"{lp}fc1.weight"] = rng.randn(cfg.ffn_dim, cfg.d_model).astype(np.float32)
        sd[f"{lp}fc1.bias"] = rng.randn(cfg.ffn_dim).astype(np.float32)
        sd[f"{lp}fc2.weight"] = rng.randn(cfg.d_model, cfg.ffn_dim).astype(np.float32)
        sd[f"{lp}fc2.bias"] = rng.randn(cfg.d_model).astype(np.float32)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{lp}{ln}.weight"] = rng.randn(cfg.d_model).astype(np.float32)
            sd[f"{lp}{ln}.bias"] = rng.randn(cfg.d_model).astype(np.float32)
    # wav2vec2-only extras the converter must not choke on
    sd["mask_emb"] = rng.randn(cfg.d_model).astype(np.float32)
    sd["quantizer.vars"] = rng.randn(1, 640, 128).astype(np.float32)
    sd["project_q.weight"] = rng.randn(256, 256).astype(np.float32)
    sd["final_proj.weight"] = rng.randn(256, cfg.d_model).astype(np.float32)

    params = fairseq_hubert_to_flax(sd, cfg)
    model = HubertModel(cfg)
    wav = jnp.asarray(rng.randn(2, 4000).astype(np.float32))
    out = model.apply({"params": params}, wav)
    assert out["hidden_states"].shape[0] == cfg.n_layers + 1
    assert np.isfinite(np.asarray(out["x"])).all()
