"""Pooling-layer parity vs hand values / torch oracle + text-metric goldens.

Mirrors the reference's `test/test_pooling.py` strategy (hand-computed
numerics for mean pooling, mask/shape checks for attentive pooling,
`pooling.py:8-390`) and adds goldens for the WER/CER/BLEU utilities
(`avssl/util/metric.py`).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.nn.pooling import AttentivePoolingLayer, MeanPoolingLayer
from speechclip_plus_tpu.utils.metric import cer, edit_distance, report_bleu, ter, wer


def test_mean_pooling_length_aware():
    x = jnp.asarray(
        np.stack([
            np.array([[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]),
            np.array([[2.0, 2.0], [4.0, 4.0], [6.0, 6.0]]),
        ])
    )
    lens = jnp.asarray([2, 3])
    pool = MeanPoolingLayer()
    out = pool.apply({}, x, lens)
    np.testing.assert_allclose(np.asarray(out), [[2.0, 3.0], [4.0, 4.0]])
    # no lengths -> plain mean
    out2 = pool.apply({}, x)
    np.testing.assert_allclose(np.asarray(out2)[1], [4.0, 4.0])


def test_mean_pooling_with_projections():
    pool = MeanPoolingLayer(in_dim=4, out_dim=3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4).astype(np.float32))
    params = pool.init(jax.random.PRNGKey(0), x, jnp.asarray([5, 3]))
    out = pool.apply(params, x, jnp.asarray([5, 3]))
    assert out.shape == (2, 3)


def test_attentive_pooling_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    B, Ta, Tb, D = 2, 5, 4, 8
    a = rng.randn(B, Ta, D).astype(np.float32)
    b = rng.randn(B, Tb, D).astype(np.float32)
    U = rng.randn(D, D).astype(np.float32)

    pool = AttentivePoolingLayer(dim_A=D, dim_B=D)
    out_a, out_b = pool.apply(
        {"params": {"U": jnp.asarray(U)}}, jnp.asarray(a), jnp.asarray(b)
    )

    # torch oracle of the reference forward (pooling.py:322-390), (B,D,T) layout
    ta = torch.from_numpy(a.transpose(0, 2, 1))
    tb = torch.from_numpy(b.transpose(0, 2, 1))
    tU = torch.from_numpy(U)
    align = torch.tanh(ta.permute(0, 2, 1) @ tU @ tb)
    sA = torch.softmax(align.max(dim=2).values, dim=-1)
    sB = torch.softmax(align.max(dim=1).values, dim=-1)
    ref_a = (ta @ sA.unsqueeze(-1)).squeeze(-1)
    ref_b = (tb @ sB.unsqueeze(-1)).squeeze(-1)
    np.testing.assert_allclose(np.asarray(out_a), ref_a.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b), ref_b.numpy(), rtol=1e-5, atol=1e-5)


def test_attentive_pooling_mask_and_gallery():
    D = 8
    pool = AttentivePoolingLayer(dim_A=D, dim_B=D, degraded=True)
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(2, 5, D).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 4, D).astype(np.float32))
    msk = AttentivePoolingLayer.generate_input_msk(
        input_A_lens=jnp.asarray([3, 5]), max_Alen=5, max_Blen=4
    )
    assert msk.shape == (2, 5, 4)
    assert float(msk[0, 3, 0]) < -1e20 and float(msk[0, 2, 0]) == 0.0
    out_a, out_b = pool.apply({}, a, b, msk)
    assert out_a.shape == (2, D) and out_b.shape == (2, D)

    gallery = jnp.asarray(rng.randn(7, D).astype(np.float32))
    pooled = pool.apply({}, a, gallery, method=AttentivePoolingLayer.cal_batch_embedding)
    assert pooled.shape == (2, D, 7)

    xa, xb = pool.apply({}, a, b, method=AttentivePoolingLayer.batch_forward)
    assert xa.shape == (2, 2, D) and xb.shape == (2, 2, D)


def test_text_metrics_goldens():
    assert edit_distance("kitten", "sitting") == 3
    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    assert wer(["the dog sat"], ["the cat sat"]) == pytest.approx(1 / 3)
    assert cer(["abcd"], ["abcf"]) == pytest.approx(0.25)
    assert ter([[1, 2, 3]], [[1, 2, 4]]) == pytest.approx(1 / 3)
    assert report_bleu(["the cat sat on the mat"], ["the cat sat on the mat"]) == \
        pytest.approx(100.0, abs=1e-6)
    assert report_bleu(["x y z"], ["a b c"]) < 1.0
