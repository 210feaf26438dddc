import jax.numpy as jnp
import numpy as np
import torch

from speechclip_plus_tpu.ops import (
    contrastive_temperature,
    masked_contrastive_loss,
    quantity_l1_loss,
    supcon_loss,
)


def _torch_masked_contrastive(feat_a, feat_b, ids, mult, margin=0.0, dcl=False, a2b=True, b2a=True):
    """Independent torch oracle of the reference loss definition."""
    A = torch.from_numpy(feat_a)
    Bm = torch.from_numpy(feat_b)
    n = A.shape[0]
    if ids is not None:
        idx = torch.from_numpy(ids).view(-1, 1)
        neg = idx != idx.t()
    else:
        neg = ~torch.eye(n, dtype=torch.bool)
    pos = torch.eye(n, dtype=torch.bool)
    if not dcl:
        neg = neg | pos
    logits = A @ Bm.t() * mult
    if margin > 0:
        logits = logits - margin * pos.float()
    pos_logits = logits.diag()
    exp_logits = logits.exp() * neg.float()
    loss = 0.0
    cnt = 0
    if a2b:
        loss = loss + (-pos_logits + exp_logits.sum(1).log()).mean()
        cnt += 1
    if b2a:
        loss = loss + (-pos_logits + exp_logits.sum(0).log()).mean()
        cnt += 1
    return (loss / cnt).item()


def _rand_feats(n, d, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_masked_contrastive_matches_torch_oracle():
    a = _rand_feats(8, 16, 0)
    b = _rand_feats(8, 16, 1)
    ids = np.array([0, 0, 1, 2, 3, 3, 3, 4], dtype=np.int64)
    mult = 1.0 / 0.07
    expected = _torch_masked_contrastive(a, b, ids, mult)
    got = masked_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids), logit_scale=jnp.float32(mult)
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_masked_contrastive_variants():
    a = _rand_feats(6, 8, 2)
    b = _rand_feats(6, 8, 3)
    ids = np.arange(6, dtype=np.int64)
    for margin, dcl, a2b, b2a in [
        (0.0, True, True, True),
        (0.1, False, True, False),
        (0.0, False, False, True),
    ]:
        expected = _torch_masked_contrastive(a, b, ids, 5.0, margin, dcl, a2b, b2a)
        got = masked_contrastive_loss(
            jnp.asarray(a),
            jnp.asarray(b),
            jnp.asarray(ids),
            logit_scale=jnp.float32(5.0),
            margin=margin,
            dcl=dcl,
            a2b=a2b,
            b2a=b2a,
        )
        np.testing.assert_allclose(float(got), expected, rtol=1e-5, err_msg=str((margin, dcl, a2b, b2a)))


def test_masked_contrastive_no_ids():
    a = _rand_feats(5, 8, 4)
    b = _rand_feats(5, 8, 5)
    expected = _torch_masked_contrastive(a, b, None, 10.0)
    got = masked_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), None, logit_scale=jnp.float32(10.0)
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_valid_mask_padding_matches_subset():
    a = _rand_feats(8, 8, 6)
    b = _rand_feats(8, 8, 7)
    ids = np.array([0, 1, 2, 3, 4, 5, 99, 99], dtype=np.int64)
    valid = np.array([True] * 6 + [False] * 2)
    full = masked_contrastive_loss(
        jnp.asarray(a[:6]), jnp.asarray(b[:6]), jnp.asarray(ids[:6]),
        logit_scale=jnp.float32(7.0),
    )
    padded = masked_contrastive_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(ids),
        logit_scale=jnp.float32(7.0), valid=jnp.asarray(valid),
    )
    np.testing.assert_allclose(float(padded), float(full), rtol=1e-5)


def test_contrastive_temperature():
    t = contrastive_temperature(jnp.log(1.0 / 0.07), trainable=True)
    np.testing.assert_allclose(float(t), 1.0 / 0.07, rtol=1e-5)
    t2 = contrastive_temperature(None, temperature=0.1, trainable=False)
    np.testing.assert_allclose(float(t2), 10.0, rtol=1e-6)


def test_supcon_degenerate_simclr():
    rng = np.random.default_rng(8)
    feats = rng.normal(size=(4, 2, 8)).astype(np.float32)
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    got = supcon_loss(jnp.asarray(feats), temperature=jnp.float32(0.1), base_temperature=0.1)
    assert np.isfinite(float(got))

    # torch oracle for SimCLR-degenerate SupCon
    f = torch.from_numpy(feats)
    B, V, D = f.shape
    contrast = torch.cat(torch.unbind(f, dim=1), dim=0)
    logits = contrast @ contrast.t() / 0.1
    logits = logits - logits.max(dim=1, keepdim=True)[0]
    mask = torch.eye(B).repeat(V, V)
    logits_mask = 1.0 - torch.eye(B * V)
    mask = mask * logits_mask
    exp_l = logits.exp() * logits_mask
    log_prob = logits - exp_l.sum(1, keepdim=True).log()
    mlpp = (mask * log_prob).sum(1) / mask.sum(1)
    expected = (-(1 / 0.1) * mlpp).view(V, B).mean()
    np.testing.assert_allclose(float(got), expected.item(), rtol=1e-4)


def test_quantity_l1():
    q = jnp.array([3.0, 5.5])
    t = jnp.array([4, 5])
    np.testing.assert_allclose(float(quantity_l1_loss(q, t)), 0.75, rtol=1e-6)


def test_quantity_l1_valid_ignores_padded_rows():
    q = jnp.array([3.0, 5.5, 99.0, 42.0])  # last two rows are padding junk
    t = jnp.array([4, 5, 0, 0])
    valid = jnp.array([True, True, False, False])
    np.testing.assert_allclose(
        float(quantity_l1_loss(q, t, valid=valid)), 0.75, rtol=1e-6
    )


def test_supcon_valid_matches_unpadded_batch():
    """Padded rows with valid=False must not change the SupCon loss: a
    padded batch scores identically to the same batch without padding
    (padding enters via static-shape collate / mesh-divisibility rows)."""
    rng = np.random.default_rng(9)
    feats = rng.normal(size=(4, 2, 8)).astype(np.float32)
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = np.array([0, 1, 1, 2])
    base = supcon_loss(
        jnp.asarray(feats), labels=jnp.asarray(labels),
        temperature=jnp.float32(0.1), base_temperature=0.1,
    )
    # pad with two zero rows labeled 0 (the collate convention)
    padded = np.concatenate([feats, np.zeros((2, 2, 8), np.float32)])
    plabels = np.concatenate([labels, [0, 0]])
    valid = np.array([True] * 4 + [False] * 2)
    got = supcon_loss(
        jnp.asarray(padded), labels=jnp.asarray(plabels),
        temperature=jnp.float32(0.1), base_temperature=0.1,
        valid=jnp.asarray(valid),
    )
    np.testing.assert_allclose(float(got), float(base), rtol=1e-5)


def test_gradient_flows_through_temperature():
    import jax

    a = jnp.asarray(_rand_feats(4, 8, 9))
    b = jnp.asarray(_rand_feats(4, 8, 10))

    def f(log_inv_t):
        return masked_contrastive_loss(
            a, b, None, logit_scale=jnp.exp(log_inv_t)
        )

    g = jax.grad(f)(jnp.float32(np.log(1 / 0.07)))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
