import jax.numpy as jnp
import numpy as np

from speechclip_plus_tpu.ops import (
    key_padding_mask,
    lengths_from_mask,
    valid_mask,
    weighted_sum,
)


def test_key_padding_mask():
    lens = jnp.array([2, 4, 0])
    mask = key_padding_mask(4, lens)
    expected = np.array(
        [
            [False, False, True, True],
            [False, False, False, False],
            [True, True, True, True],
        ]
    )
    np.testing.assert_array_equal(np.asarray(mask), expected)
    np.testing.assert_array_equal(np.asarray(valid_mask(4, lens)), ~expected)
    np.testing.assert_array_equal(np.asarray(lengths_from_mask(mask)), [2, 4, 0])


def test_weighted_sum_softmax_weights():
    rng = np.random.default_rng(0)
    hs = rng.normal(size=(3, 2, 5, 4)).astype(np.float32)
    w = np.array([0.3, -1.2, 2.0], dtype=np.float32)
    got = weighted_sum(jnp.asarray(hs), jnp.asarray(w))
    sw = np.exp(w) / np.exp(w).sum()
    expected = (sw[:, None, None, None] * hs).sum(0)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_weighted_sum_normalized_matches_torch_layernorm():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    hs = rng.normal(size=(4, 3, 6, 8)).astype(np.float32)
    w = rng.normal(size=(4,)).astype(np.float32)
    got = weighted_sum(jnp.asarray(hs), jnp.asarray(w), normalize_features=True)

    t = torch.from_numpy(hs)
    tw = torch.softmax(torch.from_numpy(w), dim=0).view(-1, 1, 1, 1)
    tnorm = F.layer_norm(t, (t.shape[-1],))
    expected = (tw * tnorm).sum(0).numpy()
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)
