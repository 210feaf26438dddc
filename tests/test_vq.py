import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from speechclip_plus_tpu.ops import scheduled_temperature, simple_vector_quantizer


def _logits(B=2, T=3, V=12, seed=0):
    return np.random.default_rng(seed).normal(size=(B, T, V)).astype(np.float32)


def test_eval_hard_onehot_and_special_mask():
    x = _logits()
    out = simple_vector_quantizer(jnp.asarray(x), temp=jnp.float32(0.1), training=False)
    prob = np.asarray(out["subword_prob"])
    # one-hot rows
    np.testing.assert_allclose(prob.sum(-1), 1.0, rtol=1e-6)
    assert ((prob == 0) | (prob == 1)).all()
    # special tokens 0,2,3 never selected
    assert prob[..., [0, 2, 3]].sum() == 0
    # argmax matches masked argmax
    xm = x.copy()
    xm[..., [0, 2, 3]] = -np.inf
    np.testing.assert_array_equal(prob.argmax(-1), xm.argmax(-1))
    np.testing.assert_array_equal(np.asarray(out["targets"]).squeeze(-1), xm.argmax(-1))


def test_perplexities_match_torch_oracle():
    x = _logits(seed=1)
    out = simple_vector_quantizer(jnp.asarray(x), temp=jnp.float32(0.5), training=False)

    t = torch.from_numpy(x)
    t[..., [0, 2, 3]] = float("-inf")
    flat = t.reshape(-1, t.shape[-1])
    hard = F.one_hot(flat.argmax(-1), t.shape[-1]).float()
    hard_probs = hard.mean(0)
    code_ppl = torch.exp(-torch.sum(hard_probs * torch.log(hard_probs + 1e-7)))
    avg_probs = torch.softmax(flat, dim=-1).mean(0)
    prob_ppl = torch.exp(-torch.sum(avg_probs * torch.log(avg_probs + 1e-7)))
    np.testing.assert_allclose(float(out["code_perplexity"]), code_ppl.item(), rtol=1e-4)
    np.testing.assert_allclose(float(out["prob_perplexity"]), prob_ppl.item(), rtol=1e-4)

    probs_per_t = torch.softmax(t, dim=-1).permute(1, 0, 2)
    ent = (-(probs_per_t * (probs_per_t + 1e-9).log()).sum(-1)).mean(-1)
    np.testing.assert_allclose(np.asarray(out["ent_per_t"]), ent.numpy(), rtol=1e-4)


def test_straight_through_forward_is_hard_grad_is_soft():
    x = _logits(seed=2)
    temp = 0.3

    def f(xj):
        out = simple_vector_quantizer(xj, temp=jnp.float32(temp), training=True)
        return out["subword_prob"]

    prob = f(jnp.asarray(x))
    xm = x.copy()
    xm[..., [0, 2, 3]] = -np.inf
    np.testing.assert_array_equal(np.asarray(prob).argmax(-1), xm.argmax(-1))
    assert ((np.asarray(prob).sum(-1) - 1.0) < 1e-5).all()

    # gradient equals the softmax jacobian (straight-through)
    def loss(xj):
        out = simple_vector_quantizer(xj, temp=jnp.float32(temp), training=True)
        return (out["subword_prob"] * jnp.arange(x.shape[-1])).sum()

    g = jax.grad(loss)(jnp.asarray(x))

    tx = torch.from_numpy(x).requires_grad_(True)
    txm = tx.clone()
    mask = torch.zeros_like(txm, dtype=torch.bool)
    mask[..., [0, 2, 3]] = True
    txm = txm.masked_fill(mask, -1e30)
    soft = torch.softmax(txm / temp, dim=-1)
    (soft * torch.arange(x.shape[-1])).sum().backward()
    np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(), rtol=1e-3, atol=1e-5)


def test_gumbel_needs_rng_and_is_onehot():
    x = _logits(seed=3)
    out = simple_vector_quantizer(
        jnp.asarray(x),
        temp=jnp.float32(1.0),
        training=True,
        use_gumbel=True,
        rng=jax.random.PRNGKey(0),
    )
    prob = np.asarray(out["subword_prob"])
    np.testing.assert_allclose(prob.sum(-1), 1.0, rtol=1e-5)
    assert prob[..., [0, 2, 3]].sum() == 0


def test_diversity_loss():
    x = _logits(seed=4)
    out = simple_vector_quantizer(jnp.asarray(x), temp=jnp.float32(1.0), training=False)
    V = x.shape[-1]
    expected = (V - float(out["prob_perplexity"])) / V
    np.testing.assert_allclose(float(out["diversity_loss"]), expected, rtol=1e-5)

    out_gt = simple_vector_quantizer(
        jnp.asarray(x), temp=jnp.float32(1.0), training=False, ground_truth_perplexity=5.0
    )
    expected_gt = (float(out_gt["prob_perplexity"]) - 5.0) ** 2 / (V - 5.0) ** 2
    np.testing.assert_allclose(float(out_gt["diversity_loss"]), expected_gt, rtol=1e-5)


def test_scheduled_temperature():
    t = scheduled_temperature(2.0, 0.5, 0.999995, jnp.asarray(0))
    np.testing.assert_allclose(float(t), 2.0, rtol=1e-6)
    t2 = scheduled_temperature(2.0, 0.5, 0.5, jnp.asarray(10))
    np.testing.assert_allclose(float(t2), 0.5, rtol=1e-6)


# ---------------------------------------------- fused ST codebook matmul ----


def _vq_keywords(x, cb, temp, *, training, fused):
    out = simple_vector_quantizer(
        jnp.asarray(x),
        temp=temp,
        training=training,
        codebook=cb,
        fused_st=fused,
    )
    return out


def test_fused_st_forward_matches_materialized():
    x = _logits(B=3, T=4, V=17, seed=5)
    cb = jnp.asarray(
        np.random.default_rng(6).normal(size=(17, 9)).astype(np.float32)
    )
    for training in (True, False):
        kw_f = _vq_keywords(x, cb, jnp.float32(0.1), training=training, fused=True)
        kw_u = _vq_keywords(x, cb, jnp.float32(0.1), training=training, fused=False)
        # forward is the hard one-hot @ codebook. The materialized ST chain
        # `(1 + soft_k) - soft_k` rounds the winner's coefficient to
        # 1 ± 2^-24, so parity is to one ulp, not bitwise.
        np.testing.assert_allclose(
            np.asarray(kw_f["keywords"]), np.asarray(kw_u["keywords"]),
            rtol=3e-7, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(kw_f["subword_prob"]), np.asarray(kw_u["subword_prob"]),
            rtol=3e-7, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(kw_f["targets"]), np.asarray(kw_u["targets"])
        )


def test_fused_st_gradients_match_materialized():
    x = jnp.asarray(_logits(B=2, T=3, V=17, seed=7))
    cb = jnp.asarray(
        np.random.default_rng(8).normal(size=(17, 9)).astype(np.float32)
    )
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(2, 3, 9)).astype(np.float32)
    )

    def loss(xj, cbj, tempj, fused):
        out = _vq_keywords(xj, cbj, tempj, training=True, fused=fused)
        return jnp.sum(out["keywords"] * w)

    gx_f, gcb_f, gt_f = jax.grad(loss, argnums=(0, 1, 2))(x, cb, jnp.float32(0.3), True)
    gx_u, gcb_u, gt_u = jax.grad(loss, argnums=(0, 1, 2))(x, cb, jnp.float32(0.3), False)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gcb_f), np.asarray(gcb_u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(gt_f), float(gt_u), rtol=1e-4)


def test_fused_st_bf16_scores_forward_bitexact():
    x = jnp.asarray(_logits(B=2, T=3, V=17, seed=10), jnp.bfloat16)
    cb = jnp.asarray(
        np.random.default_rng(11).normal(size=(17, 9)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kw_f = _vq_keywords(x, cb, jnp.float32(0.1), training=True, fused=True)
    kw_u = _vq_keywords(x, cb, jnp.float32(0.1), training=True, fused=False)
    assert kw_f["keywords"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(kw_f["keywords"], np.float32),
        np.asarray(kw_u["keywords"], np.float32),
        rtol=1e-2, atol=1e-2,
    )
