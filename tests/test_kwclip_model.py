"""End-to-end model tests: all five branch variants of KWClip build, run a
forward pass with static shapes, produce finite losses, and backprop only
into trainable parameters (frozen towers get zero/no gradient).

Reference behavior being mirrored: `avssl/model/kwClip.py:839-963` (forward),
`:999-1040` (compute_loss), branch construction `:677-807`.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.models import (
    CifConfig,
    ClipConfig,
    KWClip,
    KWClipConfig,
    KeywordHeadConfig,
    KwBnConfig,
    TransformerArgs,
    VQConfig,
)
from speechclip_plus_tpu.models.hubert import HubertConfig

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow


def tiny_cfg(branch_type: str, parallel_w=1.0, cascaded_w=1.0) -> KWClipConfig:
    d = 32
    ta = TransformerArgs(
        type="MultiheadAttentionAndNorm", n_layers=1, d_model=d, nhead=4,
        dim_feedforward=64,
    )
    # text_width == embed_dim as in real CLIP ViT variants (512/512, 768/768)
    clip_cfg = ClipConfig.tiny(text_width=d, embed_dim=d)
    head = KeywordHeadConfig(
        d_model=d,
        text_dim=d,
        vq=VQConfig(temp_type="fixed", temp_init=0.1),
        bn=KwBnConfig(enabled=True, type="eachKw", parallel=True),
        keyword_num=4,
    )
    cif = CifConfig(
        cif_output_dim=d, encoder_embed_dim=d, max_feat_len=12,
        quantity_loss_weight=0.25, scaling_step=5000,
    )
    return KWClipConfig(
        audio=HubertConfig.tiny(d_model=d),
        clip=clip_cfg,
        branch_type=branch_type,
        parallel_ta=TransformerArgs(n_layers=1, d_model=d, nhead=4, dim_feedforward=64),
        cascaded_ta=ta,
        head=head if branch_type else KeywordHeadConfig(d_model=d, text_dim=d),
        cif=cif if branch_type.endswith("_plus") else None,
        cascaded_objective_weight=cascaded_w if branch_type else 0.0,
        parallel_objective_weight=parallel_w,
    )


def make_batch(rng, B=4, T=900, img=32):
    wav = rng.randn(B, T).astype(np.float32)
    wav_len = np.array([T, T - 200, T - 100, T - 350])
    for b, l in enumerate(wav_len):
        wav[b, l:] = 0.0
    batch = {
        "wav": jnp.asarray(wav),
        "wav_len": jnp.asarray(wav_len),
        "image": jnp.asarray(rng.randn(B, img, img, 3).astype(np.float32)),
        "id": jnp.asarray([0, 1, 1, 2]),
        "text": jnp.zeros((B, 16), jnp.int32)
        .at[:, 0].set(62)
        .at[np.arange(B), np.array([5, 7, 7, 9])].set(63),
    }
    return batch


BRANCHES = [
    ("", 1.0, 0.0),                      # parallel-only (original SpeechCLIP)
    ("CascadedBranch", 0.0, 1.0),
    ("HybridBranch", 1.0, 1.0),
    ("CascadedBranch_plus", 0.0, 1.0),
    ("HybridBranch_plus", 1.0, 1.0),
]


@pytest.mark.parametrize("branch_type,pw,cw", BRANCHES,
                         ids=[b[0] or "parallel" for b in BRANCHES])
def test_forward_and_loss(branch_type, pw, cw):
    cfg = tiny_cfg(branch_type, parallel_w=pw, cascaded_w=cw)
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, training=False
    )

    loss_feats, log_metrics, others = model.apply(
        variables, batch, training=False,
        mutable=False,
    )
    losses = model.apply(variables, loss_feats, method=KWClip.compute_loss)
    assert np.isfinite(float(losses["loss"]))

    if pw > 0:
        assert others["parallel_audio_feat"].shape == (4, cfg.clip.text_width)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(others["parallel_audio_feat"]), axis=-1),
            1.0, rtol=1e-5,
        )
        assert "p_cl_loss" in losses
    if cw > 0:
        assert others["cascaded_audio_feat"].shape == (4, cfg.clip.embed_dim)
        assert "c_cl_loss" in losses
        assert np.isfinite(float(log_metrics["code_perplexity"]))
    if branch_type.endswith("_plus"):
        assert "quantity_loss" in losses
        klen = np.asarray(others["keywords_len"])
        assert (klen >= 1).all() and (klen <= cfg.cif.max_feat_len).all()


def test_train_step_grads_only_touch_trainable():
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(p):
        (loss_feats, _, _), new_vars = model.apply(
            {"params": p, "batch_stats": batch_stats},
            batch,
            training=True,
            global_step=jnp.asarray(0),
            rngs={"dropout": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        losses = model.apply(
            {"params": p, "batch_stats": batch_stats},
            loss_feats,
            method=KWClip.compute_loss,
        )
        return losses["loss"], new_vars

    (loss, new_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))

    # frozen towers receive zero gradient via stop_gradient; one fused norm
    # per subtree keeps this cheap on the 1-core CI host
    import optax

    norms = jax.jit(lambda g: {
        "audio": optax.global_norm(g["audio_encoder"]),
        "visual": optax.global_norm(g["clip"]["visual"]),
        "ws": optax.global_norm(g["weightedsum"]),
        "branch": optax.global_norm(g["cascaded_branch"]),
    })(grads)
    assert float(norms["audio"]) == 0.0, "frozen HuBERT must get no gradient"
    assert float(norms["visual"]) == 0.0, "frozen CLIP image tower must get no gradient"
    assert float(norms["ws"]) > 0
    assert float(norms["branch"]) > 0
    assert float(jnp.abs(grads["criterion_log_inv_temp"])) > 0

    # BN running stats updated
    assert "batch_stats" in new_vars


def test_encode_speech_and_feature_extractor():
    cfg = tiny_cfg("HybridBranch_plus")
    model = KWClip(cfg)
    rng = np.random.RandomState(2)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)

    out = model.apply(
        variables, batch["wav"], batch["wav_len"], method=KWClip.encode_speech
    )
    assert out["parallel_audio_feat"] is not None
    assert out["cascaded_audio_feat"] is not None
    assert out["keywords"] is not None

    last, hidden = model.apply(
        variables, batch["wav"], batch["wav_len"], method=KWClip.feature_extractor
    )
    # hubert L+1 states + branch states (MultiheadAttentionAndNorm adds 1)
    assert len(hidden) == (cfg.audio.n_layers + 1) + 1
    assert last.shape[0] == 4


def test_attention_map_and_forward_text():
    cfg = tiny_cfg("CascadedBranch", parallel_w=0.0, cascaded_w=1.0)
    model = KWClip(cfg)
    rng = np.random.RandomState(3)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)

    amap = model.apply(
        variables, batch["wav"], batch["wav_len"], method=KWClip.get_attention_map
    )
    B = batch["wav"].shape[0]
    K = cfg.head.keyword_num
    assert amap.shape[0] == B and amap.shape[2] == K
    # rows are attention distributions
    np.testing.assert_allclose(
        np.asarray(amap).sum(-1), np.ones(amap.shape[:-1]), rtol=1e-4
    )

    ids = np.asarray(batch["text"])[:, : cfg.clip.context_length]
    feats = model.apply(variables, jnp.asarray(ids), method=KWClip.forward_text)
    assert feats.shape == (B, cfg.clip.embed_dim)


def test_supcon_loss_config_path():
    import dataclasses

    from speechclip_plus_tpu.models.kwclip import ClLossConfig

    cfg = dataclasses.replace(
        tiny_cfg("", parallel_w=1.0, cascaded_w=0.0),
        cl_loss=ClLossConfig(type="SupConLoss", temperature_trainable=True),
    )
    model = KWClip(cfg)
    batch = make_batch(np.random.RandomState(4))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, training=False)
    lf, _, _ = model.apply(variables, batch, training=False)
    losses = model.apply(variables, lf, method=KWClip.compute_loss)
    assert np.isfinite(float(losses["loss"]))
    assert "p_cl_loss" in losses
