"""Fused-attention kernel parity vs the XLA reference path.

Runs the Pallas kernel in interpreter mode on CPU (the same code path the
TPU compiles) and checks values + gradients against plain softmax attention.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.nn import flash as flash_mod
from speechclip_plus_tpu.nn.flash import _xla_attention, flash_attention

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    """Force pallas_call(interpret=True) so the kernel runs on CPU."""
    flash_mod._ensure_pallas()
    real_call = flash_mod.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    monkeypatch.setattr(flash_mod.pl, "pallas_call", interp_call)
    yield


def _data(b=2, h=3, tq=200, tk=200, d=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, tq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, tk, d).astype(np.float32))
    lens = np.array([tk, tk - 57][:b] if b <= 2 else rng.randint(1, tk, b))
    kpm = jnp.asarray(np.arange(tk)[None, :] >= lens[:, None])
    return q, k, v, kpm


def test_forward_matches_xla():
    q, k, v, kpm = _data()
    ref = _xla_attention(q, k, v, kpm)
    got = flash_attention(q, k, v, kpm, use_pallas=True, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_no_mask_odd_lengths():
    # tq/tk not multiples of the block sizes -> padding path
    q, k, v, _ = _data(tq=130, tk=190)
    ref = _xla_attention(q, k, v, None)
    got = flash_attention(q, k, v, None, use_pallas=True, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    q, k, v, kpm = _data(tq=64, tk=64)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, kpm, use_pallas=True,
                               block_q=32, block_k=32).sum()

    def loss_ref(q, k, v):
        return _xla_attention(q, k, v, kpm).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        # fp32 rounding differences between the fused online-softmax forward
        # (saved lse) and XLA's unfused softmax accumulate slightly in grads
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)


def test_hubert_with_flash_matches_xla_path():
    """HubertModel(use_flash_attention=True) must match the XLA path
    (kernel runs in interpreter mode on CPU via the autouse fixture)."""
    import dataclasses

    from speechclip_plus_tpu.models.hubert import HubertConfig, HubertModel

    cfg = HubertConfig.tiny(dropout=0.0, attention_dropout=0.0)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 403).astype(np.float32))
    pad = jnp.asarray(np.arange(403)[None, :] >= np.array([[403], [250]]))
    model = HubertModel(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, wav, pad)["params"]
    ref = model.apply({"params": params}, wav, pad)["x"]

    fcfg = dataclasses.replace(cfg, use_flash_attention=True)
    fmodel = HubertModel(fcfg)
    got = fmodel.apply({"params": params}, wav, pad)["x"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
