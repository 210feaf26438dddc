"""Fused-QKV path (hubert.py `fused_qkv`): one (D, 3D) matmul from a
trace-time concat of the q/k/v projection kernels.

Must be bitwise-identical to the three-matmul path (the concat is along the
*output* axis, so each output element's contraction is unchanged) with the
exact same param tree — checkpoint import and tensor-parallel sharding rules
key on q_proj/k_proj/v_proj names.
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from speechclip_plus_tpu.models.hubert import HubertConfig, HubertModel


def _tiny_cfg(**kw):
    return HubertConfig(
        d_model=64, n_layers=2, n_heads=4, ffn_dim=128,
        conv_layers=((32, 10, 5), (32, 3, 2)), dropout=0.0,
        attention_dropout=0.0, **kw,
    )


def test_fused_qkv_bitwise_and_tree_parity():
    cfg = _tiny_cfg(fused_qkv=True)
    ref = dataclasses.replace(cfg, fused_qkv=False)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 3200).astype(np.float32))
    mask = jnp.zeros((2, 3200), bool)

    v1 = HubertModel(cfg).init({"params": jax.random.PRNGKey(0)}, wav, mask)
    v2 = HubertModel(ref).init({"params": jax.random.PRNGKey(0)}, wav, mask)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)

    out1 = HubertModel(cfg).apply(v1, wav, mask)["hidden_states"]
    out2 = HubertModel(ref).apply(v1, wav, mask)["hidden_states"]
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_fused_qkv_grads_match():
    """Input gradients agree between the two paths (tight tolerance: the
    backward contracts along the concatenated axis, so summation order over
    the three blocks may differ)."""
    cfg = _tiny_cfg(fused_qkv=True)
    ref = dataclasses.replace(cfg, fused_qkv=False)
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(2, 3200).astype(np.float32))
    mask = jnp.zeros((2, 3200), bool)
    v = HubertModel(cfg).init({"params": jax.random.PRNGKey(0)}, wav, mask)

    def loss(c):
        def f(w):
            return (
                HubertModel(c).apply(v, w, mask)["x"].astype(jnp.float32) ** 2
            ).sum()
        return f

    g1 = jax.grad(loss(cfg))(wav)
    g2 = jax.grad(loss(ref))(wav)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_fused_qkv_config_knob():
    import os

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models.kwclip import KWClipConfig

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(
        os.path.join(repo, "config", "speechclip_plus", "base",
                     "hybrid_plus.yaml")
    )
    # default OFF: measured slower in-model on v5e (see HubertConfig)
    assert KWClipConfig.from_config(cfg).audio.fused_qkv is False
    cfg.audio_encoder.fused_qkv = True
    assert KWClipConfig.from_config(cfg).audio.fused_qkv is True
