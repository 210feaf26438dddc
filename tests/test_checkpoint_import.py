"""Lightning-checkpoint importer structural test.

Builds a synthetic reference-format state dict (exact fairseq / OpenAI CLIP /
avssl module naming, tiny shapes) and checks `lightning_to_kwclip` produces a
(params, batch_stats) tree with the same structure and shapes as
`KWClip.init` — i.e. released .ckpt files will drop onto the model.

Also round-trips orbax save/restore with metric-based retention.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.checkpoint.lightning_import import lightning_to_kwclip
from speechclip_plus_tpu.models import KWClip

from test_kwclip_model import make_batch, tiny_cfg

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow

D = 32


def _lin(sd, name, dout, din):
    sd[f"{name}.weight"] = np.random.randn(dout, din).astype(np.float32)
    sd[f"{name}.bias"] = np.random.randn(dout).astype(np.float32)


def _ln(sd, name, d):
    sd[f"{name}.weight"] = np.random.randn(d).astype(np.float32)
    sd[f"{name}.bias"] = np.random.randn(d).astype(np.float32)


def _mha_packed(sd, name, d):
    sd[f"{name}.in_proj_weight"] = np.random.randn(3 * d, d).astype(np.float32)
    sd[f"{name}.in_proj_bias"] = np.random.randn(3 * d).astype(np.float32)
    _lin(sd, f"{name}.out_proj", d, d)


def _bn(sd, name, c):
    sd[f"{name}.weight"] = np.random.randn(c).astype(np.float32)
    sd[f"{name}.bias"] = np.random.randn(c).astype(np.float32)
    sd[f"{name}.running_mean"] = np.random.randn(c).astype(np.float32)
    sd[f"{name}.running_var"] = np.abs(np.random.randn(c)).astype(np.float32) + 0.5


def synthetic_lightning_sd(cfg) -> dict:
    sd = {}
    np.random.seed(0)
    # --- fairseq HuBERT tiny (audio_encoder.encoder.*) ---
    p = "audio_encoder.encoder."
    sd[f"{p}feature_extractor.conv_layers.0.0.weight"] = np.random.randn(16, 1, 3).astype(np.float32)
    _ln(sd, f"{p}feature_extractor.conv_layers.0.2", 16)  # group norm
    sd[f"{p}feature_extractor.conv_layers.1.0.weight"] = np.random.randn(16, 16, 3).astype(np.float32)
    _ln(sd, f"{p}layer_norm", 16)
    _lin(sd, f"{p}post_extract_proj", D, 16)
    k = cfg.audio.conv_pos
    g = cfg.audio.conv_pos_groups
    sd[f"{p}encoder.pos_conv.0.weight_g"] = np.abs(np.random.randn(1, 1, k)).astype(np.float32)
    sd[f"{p}encoder.pos_conv.0.weight_v"] = np.random.randn(D, D // g, k).astype(np.float32)
    sd[f"{p}encoder.pos_conv.0.bias"] = np.random.randn(D).astype(np.float32)
    _ln(sd, f"{p}encoder.layer_norm", D)
    for i in range(cfg.audio.n_layers):
        lp = f"{p}encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin(sd, f"{lp}.self_attn.{proj}", D, D)
        _ln(sd, f"{lp}.self_attn_layer_norm", D)
        _lin(sd, f"{lp}.fc1", cfg.audio.ffn_dim, D)
        _lin(sd, f"{lp}.fc2", D, cfg.audio.ffn_dim)
        _ln(sd, f"{lp}.final_layer_norm", D)
    sd["audio_encoder.weightedsum_layer.weights"] = np.zeros(
        cfg.audio.n_layers + 1, np.float32
    )

    # --- OpenAI CLIP tiny (clip.model.*) ---
    c = cfg.clip
    p = "clip.model."
    sd[f"{p}visual.conv1.weight"] = np.random.randn(
        c.vision_width, 3, c.vision_patch_size, c.vision_patch_size
    ).astype(np.float32)
    sd[f"{p}visual.class_embedding"] = np.random.randn(c.vision_width).astype(np.float32)
    n_pos = (c.image_resolution // c.vision_patch_size) ** 2 + 1
    sd[f"{p}visual.positional_embedding"] = np.random.randn(n_pos, c.vision_width).astype(np.float32)
    _ln(sd, f"{p}visual.ln_pre", c.vision_width)
    _ln(sd, f"{p}visual.ln_post", c.vision_width)
    sd[f"{p}visual.proj"] = np.random.randn(c.vision_width, c.embed_dim).astype(np.float32)
    for pref, width, layers in (
        (f"{p}visual.transformer.", c.vision_width, c.vision_layers),
        (f"{p}transformer.", c.text_width, c.text_layers),
    ):
        for i in range(layers):
            bp = f"{pref}resblocks.{i}"
            _mha_packed(sd, f"{bp}.attn", width)
            _ln(sd, f"{bp}.ln_1", width)
            _ln(sd, f"{bp}.ln_2", width)
            _lin(sd, f"{bp}.mlp.c_fc", 4 * width, width)
            _lin(sd, f"{bp}.mlp.c_proj", width, 4 * width)
    sd[f"{p}token_embedding.weight"] = np.random.randn(c.vocab_size, c.text_width).astype(np.float32)
    sd[f"{p}positional_embedding"] = np.random.randn(c.context_length, c.text_width).astype(np.float32)
    _ln(sd, f"{p}ln_final", c.text_width)
    sd[f"{p}text_projection"] = np.random.randn(c.text_width, c.embed_dim).astype(np.float32)
    sd[f"{p}logit_scale"] = np.asarray(2.6593, np.float32)

    sd["criterion.temperature"] = np.asarray(np.log(1 / 0.07), np.float32)

    # --- HybridBranch_plus (cascaded_branch.*) ---
    bp = "cascaded_branch."
    sd[f"{bp}cls"] = np.random.randn(1, 1, D).astype(np.float32)
    _mha_packed(sd, f"{bp}self_att.multihead_attn_layer", D)
    _ln(sd, f"{bp}self_att.attentionBlock_Norm", D)
    sd[f"{bp}downsampling.conv.0.weight"] = np.random.randn(D, D, 3).astype(np.float32)
    sd[f"{bp}downsampling.conv.0.bias"] = np.random.randn(D).astype(np.float32)
    _lin(sd, f"{bp}downsampling.weight_proj.1", 1, D)
    _lin(sd, f"{bp}linear_proj", cfg.head.text_dim, D)
    _bn(sd, f"{bp}bn_layer.bn_layer", cfg.head.text_dim)
    sd[f"{bp}vector_quantizer.curr_temp"] = np.asarray([0.1], np.float32)
    _lin(sd, f"{bp}parallel_proj", c.text_width, D)
    return sd


def test_lightning_import_matches_init_tree():
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    batch = make_batch(np.random.RandomState(0))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)

    sd = synthetic_lightning_sd(cfg)
    params, batch_stats = lightning_to_kwclip(sd, cfg)

    def shapes(tree):
        return {
            jax.tree_util.keystr(path): tuple(np.shape(leaf))
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
        }

    ref_p, got_p = shapes(variables["params"]), shapes(params)
    assert set(ref_p) == set(got_p), (
        f"missing={sorted(set(ref_p) - set(got_p))} "
        f"extra={sorted(set(got_p) - set(ref_p))}"
    )
    mismatches = {k: (ref_p[k], got_p[k]) for k in ref_p if ref_p[k] != got_p[k]}
    assert not mismatches, mismatches

    ref_s, got_s = shapes(variables["batch_stats"]), shapes(batch_stats)
    assert ref_s == got_s, (ref_s, got_s)

    # imported weights must actually run
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, training=False
    )
    assert np.isfinite(float(np.asarray(out[0]["image_feat"]).sum()))


def test_orbax_roundtrip(tmp_path):
    import optax

    from speechclip_plus_tpu.checkpoint import CheckpointManager
    from speechclip_plus_tpu.optim import build_optimizer
    from speechclip_plus_tpu.parallel import create_train_state

    cfg = tiny_cfg("CascadedBranch")
    model = KWClip(cfg)
    batch = make_batch(np.random.RandomState(1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    tx = build_optimizer(variables["params"], cfg)
    state = create_train_state(model, variables, tx)

    mgr = CheckpointManager(str(tmp_path / "ck"), config={"a": 1})
    mgr.save(1, state, {"val_loss": 3.0, "val_recall_mean_10": 10.0})
    state2 = jax.tree_util.tree_map(lambda x: x + 1 if x.dtype.kind == "f" else x,
                                    state)
    mgr.save(2, state2, {"val_loss": 2.0, "val_recall_mean_10": 30.0})
    assert mgr.best_step("val_loss") == 2
    assert mgr.best_step("val_recall_mean_10") == 2
    assert mgr.latest_step() == 2

    restored = mgr.restore(state)
    np.testing.assert_allclose(
        np.asarray(restored.params["weightedsum"]),
        np.asarray(state2.params["weightedsum"]),
    )
    assert CheckpointManager.load_config(str(tmp_path / "ck"))["a"] == 1
    mgr.close()
