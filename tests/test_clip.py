"""CLIP tower parity vs a torch oracle (transformers CLIPModel, quick_gelu).

HF's CLIPModel is a faithful port of OpenAI CLIP (the model the reference
wraps at `avssl/module/clip_official.py:52`), so activation parity against it
at fp32 validates our ViT + causal text tower + pooling math. We also test
`encode_keywords` (`clip_official.py:222-279`) against a literal torch
re-enactment of its scatter/inject semantics.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp
from speechclip_plus_tpu.checkpoint.towers import (
    hf_clip_to_flax,
    reduce_token_embedding,
)
from speechclip_plus_tpu.models.clip import ClipConfig, ClipModel

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.CLIPConfig(
        projection_dim=16,
        text_config=dict(
            vocab_size=64,
            hidden_size=32,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
            hidden_act="quick_gelu",
            eos_token_id=63,
            bos_token_id=62,
        ),
        vision_config=dict(
            hidden_size=24,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=32,
            patch_size=16,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    oracle = transformers.CLIPModel(hf_cfg).eval()
    cfg = ClipConfig.tiny()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = hf_clip_to_flax(sd, cfg)
    return oracle, cfg, params


def test_encode_image_parity(pair):
    oracle, cfg, params = pair
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = oracle.get_image_features(torch.from_numpy(img)).numpy()
    model = ClipModel(cfg)
    got = model.apply(
        {"params": params},
        jnp.asarray(img.transpose(0, 2, 3, 1)),  # ours is channel-last
        method=model.encode_image,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_encode_text_parity(pair):
    oracle, cfg, params = pair
    rng = np.random.RandomState(1)
    # CLIP-style sequences: SOT ... EOT then pad id 0; EOT has the max id
    ids = rng.randint(1, 60, size=(3, 16))
    ids[:, 0] = 62
    eot_pos = np.array([5, 15, 9])
    for b, e in enumerate(eot_pos):
        ids[b, e] = 63
        ids[b, e + 1:] = 0
    with torch.no_grad():
        ref = oracle.get_text_features(
            torch.from_numpy(ids), attention_mask=torch.ones_like(torch.from_numpy(ids))
        ).numpy()
    model = ClipModel(cfg)
    got = model.apply({"params": params}, jnp.asarray(ids), method=model.encode_text)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def _torch_encode_keywords(oracle, keywords, keyword_num, sot, eot, context):
    """Literal torch re-enactment of `clip_official.py:234-279`."""
    bsz = keywords.shape[0]
    text = torch.zeros([bsz, context], dtype=torch.long)
    text[:, 0] = sot
    if isinstance(keyword_num, torch.Tensor):
        index = keyword_num + 1
        text = text.scatter(1, index.unsqueeze(1), eot)
    else:
        index = None
        text[:, keyword_num + 1] = eot
    tm = oracle.text_model
    x = tm.embeddings.token_embedding(text)
    if index is not None:
        for i in range(bsz):
            x[i, 1 : index[i], :] = keywords[i, : index[i] - 1, :]
    else:
        x[:, 1 : 1 + keyword_num] = keywords
    x = x + tm.embeddings.position_embedding.weight
    causal = torch.full((context, context), float("-inf")).triu(1)
    for layer in tm.encoder.layers:
        x = layer(x, attention_mask=None, causal_attention_mask=causal[None, None])[0]
    x = tm.final_layer_norm(x)
    if index is not None:
        pooled = x[torch.arange(bsz), index]
    else:
        pooled = x[:, 1 + keyword_num]
    return (pooled @ oracle.text_projection.weight.T).detach().numpy()


@pytest.mark.parametrize("dynamic", [False, True])
def test_encode_keywords_parity(pair, dynamic):
    oracle, cfg, params = pair
    rng = np.random.RandomState(2)
    B, K, W = 3, 8, cfg.text_width
    kws = rng.randn(B, K, W).astype(np.float32) * 0.02
    if dynamic:
        knum_np = np.array([3, 8, 5])
        knum_t = torch.from_numpy(knum_np)
        knum_j = jnp.asarray(knum_np)
    else:
        knum_t = K
        knum_j = K
    with torch.no_grad():
        ref = _torch_encode_keywords(
            oracle, torch.from_numpy(kws), knum_t, cfg.sot_id, cfg.eot_id,
            cfg.context_length,
        )
    model = ClipModel(cfg)
    got = model.apply(
        {"params": params}, jnp.asarray(kws), knum_j, method=model.encode_keywords
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-5)


def test_reduce_token_embedding(pair):
    _, cfg, params = pair
    selected = [0, 5, 7, 62, 63]
    red = reduce_token_embedding(params, selected)
    emb = red["text"]["token_embedding"]["embedding"]
    assert emb.shape[0] == 5
    np.testing.assert_array_equal(
        emb[1], params["text"]["token_embedding"]["embedding"][5]
    )


def test_get_scores_shapes(pair):
    _, cfg, params = pair
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    ids = np.zeros((4, 16), dtype=np.int32)
    ids[:, 0], ids[:, 5] = 62, 63
    model = ClipModel(cfg)
    li, lt = model.apply({"params": params}, img, jnp.asarray(ids))
    assert li.shape == (2, 4) and lt.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-6)


def test_encode_text_pools_true_eot_for_reduced_vocab(pair):
    """Intent-over-quirk (PARITY.md): under a usage-ranked reduced vocabulary
    EOT's reduced id can be SMALL (3 in `*_byfreq.npy`), so OpenAI's
    argmax-pooling convention picks a wrong token; we pool at the known
    `eot_id` position (reference quirk: `clip_official.py:102-107`)."""
    import dataclasses

    oracle, cfg, params = pair
    # pretend id 3 is EOT (byfreq-style reduced vocab): rows contain larger
    # ids after the EOT slot, so argmax != eot position
    cfg_red = dataclasses.replace(cfg, eot_id=3, sot_id=2)
    ids = np.zeros((2, 16), np.int64)
    ids[0, :6] = [2, 40, 50, 61, 3, 0]   # argmax slot 3 (id 61) != EOT slot 4
    ids[1, :4] = [2, 33, 3, 0]
    model = ClipModel(cfg_red)
    got = model.apply({"params": params}, jnp.asarray(ids), method=model.encode_text)

    # oracle: run the torch text tower and pool at the KNOWN eot slots
    with torch.no_grad():
        out = oracle.text_model(
            torch.from_numpy(ids),
            attention_mask=torch.ones(2, 16, dtype=torch.long),
        ).last_hidden_state
        pooled = out[torch.arange(2), torch.tensor([4, 2])]
        ref = oracle.text_projection(pooled).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)

    # full-vocab rows (EOT = max id) are unchanged vs the argmax convention
    ids2 = np.zeros((1, 16), np.int64)
    ids2[0, :5] = [62, 10, 20, 63, 0]
    model_full = ClipModel(cfg)
    got2 = model_full.apply(
        {"params": params}, jnp.asarray(ids2), method=model_full.encode_text
    )
    with torch.no_grad():
        ref2 = oracle.get_text_features(
            torch.from_numpy(ids2),
            attention_mask=torch.ones(1, 16, dtype=torch.long),
        ).numpy()
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=2e-4, atol=2e-5)


def test_remat_grad_parity():
    """`ClipConfig.remat` rematerializes the text-tower scan in the backward
    (the path the cascaded branch differentiates to its keyword inputs) —
    values and input grads must be identical to the non-remat scan. Policy
    rationale: the saved residuals of the 12-layer large text tower OOMed
    v5e HBM at B=128 (18.03G > 15.75G, see kwclip.from_config)."""
    import dataclasses

    import jax

    cc = ClipConfig.tiny()
    v = ClipModel(dataclasses.replace(cc, remat=False)).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cc.image_resolution, cc.image_resolution, 3)),
        jnp.zeros((1, cc.context_length), jnp.int32),
    )
    kw = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, cc.text_width).astype(np.float32)
    )
    outs, grads = {}, {}
    for remat in (False, True):
        m = ClipModel(dataclasses.replace(cc, remat=remat))

        def f(kw, m=m):
            return m.apply(v, kw, 8, method=ClipModel.encode_keywords)

        outs[remat] = f(kw)
        grads[remat] = jax.grad(
            lambda kw, f=f: f(kw).astype(jnp.float32).sum()
        )(kw)
    np.testing.assert_array_equal(np.asarray(outs[True]), np.asarray(outs[False]))
    np.testing.assert_allclose(
        np.asarray(grads[True]), np.asarray(grads[False]), rtol=1e-6, atol=1e-6
    )


def test_clip_remat_config_policy():
    """Auto remat: ON for both families (wins the step-time ABA on base and
    large, and is required to fit large in HBM); explicit `clip.remat` YAML
    key wins."""
    import os

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models import KWClipConfig

    repo = os.path.join(os.path.dirname(__file__), "..")
    large = load_config(
        os.path.join(repo, "config", "speechclip_plus", "large", "flickr",
                     "hybrid_plus.yaml"))
    assert KWClipConfig.from_config(large).clip.remat is True
    base = load_config(
        os.path.join(repo, "config", "speechclip_plus", "base",
                     "hybrid_plus.yaml"))
    assert KWClipConfig.from_config(base).clip.remat is True
    base.clip.remat = False
    assert KWClipConfig.from_config(base).clip.remat is False


def test_vision_fused_attention_block_parity():
    """The vision tower with clip.fused_attention_block produces the same
    embeddings with an identical parameter tree (CPU exercises the XLA
    fallback inside the wrapper; kernel math is interpret-tested in
    test_fused_attention_block.py)."""
    import dataclasses

    import jax
    import numpy as np

    from speechclip_plus_tpu.models.clip import ClipConfig, VisionTransformer

    cfg = ClipConfig.tiny()
    model = VisionTransformer(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    ref = model.apply(variables, img)

    fused = VisionTransformer(
        dataclasses.replace(cfg, fused_attention_block=True)
    )
    # identical param tree: init must produce the same structure, and the
    # baseline variables must apply directly
    v2 = fused.init(jax.random.PRNGKey(0), img)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )
    out = fused.apply(variables, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
