"""Fused cosine-score + VQ kernel (ops/fused_keyword.py) vs the XLA path.

Interpret-mode parity in fp32: the same masked cosine scores, argmax
winners, statistics, keywords, and straight-through gradients (into the
keyword vectors and a learnable temperature) as
`einsum + ops.vq.simple_vector_quantizer`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechclip_plus_tpu.ops.fused_keyword import (
    fused_cosine_vq,
    fused_cosine_vq_available,
)
from speechclip_plus_tpu.ops.vq import simple_vector_quantizer


def _setup(B=4, K=16, D=128, V=300, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, K, D).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    emb = (rng.randn(V, D).astype(np.float32) * 0.1
           + rng.randn(1, D).astype(np.float32) * 0.02)
    return jnp.asarray(xn), jnp.asarray(emb)


def _xla_reference(xn, emb, temp, training):
    en = emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
    )
    scores = jnp.einsum(
        "bkd,vd->bkv", xn, en, preferred_element_type=jnp.float32
    )
    return simple_vector_quantizer(
        scores, temp=temp, training=training, use_gumbel=False, hard=True,
        codebook=emb,
    )


@pytest.mark.parametrize("training", [True, False])
def test_values_match_xla(training):
    xn, emb = _setup()
    temp = jnp.float32(0.1)
    ref = _xla_reference(xn, emb, temp, training)
    out = fused_cosine_vq(xn, emb, temp, training=training,
                          dtype=jnp.float32, interpret=True)
    assert out is not None
    np.testing.assert_array_equal(
        np.asarray(out["targets"]), np.asarray(ref["targets"])
    )
    for key in ("code_perplexity", "prob_perplexity"):
        np.testing.assert_allclose(
            float(out[key]), float(ref[key]), rtol=1e-5, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(out["ent_per_t"]), np.asarray(ref["ent_per_t"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["keywords"]), np.asarray(ref["keywords"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(out["diversity_loss"]), float(ref["diversity_loss"]),
        rtol=1e-5,
    )


def test_grads_match_xla_st_estimator():
    xn, emb = _setup(seed=1)
    probe = jnp.asarray(
        np.random.RandomState(2).randn(4, 16, 128).astype(np.float32)
    )

    def f_ref(xn, temp):
        r = _xla_reference(xn, emb, temp, True)
        return (r["keywords"] * probe).sum()

    def f_ker(xn, temp):
        r = fused_cosine_vq(xn, emb, temp, training=True,
                            dtype=jnp.float32, interpret=True)
        return (r["keywords"] * probe).sum()

    temp = jnp.float32(0.13)
    (v_ref, (gx_ref, gt_ref)) = jax.value_and_grad(
        f_ref, argnums=(0, 1))(xn, temp)
    (v_ker, (gx_ker, gt_ker)) = jax.value_and_grad(
        f_ker, argnums=(0, 1))(xn, temp)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_ker), np.asarray(gx_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(gt_ker), float(gt_ref),
                               rtol=2e-4, atol=1e-5)


def test_availability_bounds():
    # base reduced-vocab table (V=8112, D=512) fits; a ViT-L-wide table at
    # the same vocab does not (falls back to XLA)
    assert fused_cosine_vq_available(9600, 512, 8112)
    assert not fused_cosine_vq_available(9600, 768, 8112)
    # CPU backend without interpret must decline
    xn, emb = _setup()
    assert fused_cosine_vq(xn, emb, jnp.float32(0.1), training=True) is None


def test_module_path_uses_fused_and_matches(monkeypatch):
    """KeywordHead -> SimpleVectorQuantizer(use_fused_kernel=True) must
    produce the same results as the fallback einsum path (CPU: the kernel
    declines, so this exercises the new in-module fallback einsum against
    golden values from the pre-round-5 layout)."""
    import dataclasses

    from speechclip_plus_tpu.models.branches import (
        KeywordHead,
        KeywordHeadConfig,
        VQConfig,
        KwBnConfig,
    )

    cfg = KeywordHeadConfig(
        d_model=64, text_dim=32, vq=VQConfig(temp_type="fixed", temp_init=0.1),
        bn=KwBnConfig(enabled=False), keyword_num=4, dtype=jnp.float32,
    )
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 4, 64).astype(np.float32))
    emb = jnp.asarray(rng.randn(50, 32).astype(np.float32))

    for fused in (False, True):
        head = KeywordHead(
            cfg=dataclasses.replace(cfg, fused_score_kernel=fused),
            variant="fixed",
        )
        variables = head.init(
            jax.random.PRNGKey(0), feats, emb, training=False
        )
        vq, kw = head.apply(variables, feats, emb, training=False)
        if fused is False:
            base = (np.asarray(kw), np.asarray(vq["targets"]))
        else:
            np.testing.assert_allclose(np.asarray(kw), base[0], rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(vq["targets"]), base[1])
