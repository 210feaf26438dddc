"""Fused QKV->attention->out-proj block kernel (nn/fused_attention_block.py).

Parity vs the layer's XLA path (projections + `dot_product_attention` +
out-proj) in Pallas interpret mode, p=0 — the in-kernel PRNG is TPU
hardware; on-chip dropout statistics are validated by
scripts/bench_attention_block.py."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechclip_plus_tpu.nn.attention import dot_product_attention
from speechclip_plus_tpu.nn.fused_attention_block import fused_attention_block


def _params(rng, D):
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    return dict(
        wq=mk(D, D), bq=mk(D), wk=mk(D, D), bk=mk(D), wv=mk(D, D), bv=mk(D),
        wo=mk(D, D), bo=mk(D),
    )


def _xla_reference(x, p, n_heads, bias4=None):
    b, t, d = x.shape
    dh = d // n_heads
    q = x @ p["wq"] + p["bq"]
    k = x @ p["wk"] + p["bk"]
    v = x @ p["wv"] + p["bv"]
    split = lambda a: a.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
    out = dot_product_attention(split(q), split(k), split(v), bias=bias4)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return out @ p["wo"] + p["bo"]


@pytest.mark.parametrize("T", [64, 320, 70])  # 70: sublane-pad path
def test_matches_xla_layer_path(T):
    rng = np.random.RandomState(0)
    B, H, D = 3, 4, 64
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)
    lens = np.array([T, T // 2, max(T // 3, 1)])
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias = jnp.where(kpm[:, None, None, :], -1e30, 0.0).astype(jnp.float32)

    ref = _xla_reference(x, p, H, bias)
    out = fused_attention_block(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], bias, n_heads=H, dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_bf16_close_to_fp32_reference():
    rng = np.random.RandomState(1)
    B, H, D, T = 2, 12, 768, 320
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.1)
    p = _params(rng, D)
    ref = _xla_reference(x, p, H)
    out = fused_attention_block(
        x.astype(jnp.bfloat16), p["wq"], p["bq"], p["wk"], p["bk"],
        p["wv"], p["bv"], p["wo"], p["bo"], None, n_heads=H,
        dtype=jnp.bfloat16, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    # bf16 matmuls at D=768: tolerance scales with the contraction length
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.1, atol=0.15
    )


def test_off_tpu_fallback_is_xla_path():
    rng = np.random.RandomState(3)
    B, H, D, T = 2, 4, 64, 96
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)
    ref = _xla_reference(x, p, H)
    out = fused_attention_block(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_raises():
    rng = np.random.RandomState(4)
    B, H, D, T = 1, 2, 32, 64
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)

    def f(x):
        return fused_attention_block(
            x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
            interpret=True,
        ).sum()

    with pytest.raises(NotImplementedError):
        jax.grad(f)(x)


def test_config_gate_rejects_trainable_tower():
    import os

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models.kwclip import KWClipConfig

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(
        os.path.join(repo, "config", "speechclip_plus", "base",
                     "hybrid_plus.yaml")
    )
    cfg.audio_encoder.fused_attention_block = True
    mc = KWClipConfig.from_config(cfg)
    assert mc.audio.fused_attention_block is True

    cfg.audio_encoder.trainable = True
    with pytest.raises(ValueError):
        KWClipConfig.from_config(cfg)


def test_hubert_layer_parity_with_fused_block():
    """The same HubertEncoderLayer params must produce (near-)identical
    outputs with the flag on and off — the fused path owns the identical
    q_proj/k_proj/v_proj/out_proj param tree (interpret-mode kernel)."""
    from speechclip_plus_tpu.models.hubert import (HubertConfig,
                                                   HubertEncoderLayer)

    cfg = HubertConfig.tiny()
    B, T, D = 2, 48, cfg.d_model
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    layer = HubertEncoderLayer(cfg)
    variables = layer.init(jax.random.PRNGKey(0), x, None)

    ref = layer.apply(variables, x, None)

    fused_cfg = dataclasses.replace(cfg, fused_attention_block=True)
    fused_layer = HubertEncoderLayer(fused_cfg)
    # same param tree: apply the baseline variables directly. CPU run goes
    # through the wrapper's XLA fallback — identical math, exercises the
    # layer plumbing; kernel math is covered above in interpret mode.
    out = fused_layer.apply(variables, x, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_head_grouped_variant_matches(monkeypatch):
    """Force groups=2 (the D>=1024 / HuBERT-Large regime) by shrinking the
    VMEM budget: group-major weight layout + XLA out-proj must match the
    ungrouped XLA reference."""
    import speechclip_plus_tpu.nn.fused_attention_block as fab

    rng = np.random.RandomState(11)
    B, H, D, T = 2, 4, 256, 96
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.2)
    p = _params(rng, D)
    lens = np.array([96, 50])
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias = jnp.where(kpm[:, None, None, :], -1e30, 0.0).astype(jnp.float32)
    ref = _xla_reference(x, p, H, bias)

    budget = fab._vmem_estimate(B, T, D, D // H, 1) - 1  # g=1 won't fit
    assert fab._vmem_estimate(B, T, D, D // H, 2) < budget
    monkeypatch.setattr(fab, "_VMEM_BUDGET_BYTES", budget)
    assert fab._pick_groups(B, T, D, D // H, H) == 2

    out = fused_attention_block(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], bias, n_heads=H, dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_spmd_partitioned_over_data_mesh():
    """Under a multi-device mesh the kernel registers custom SPMD
    partitioning (batch-shard x/bias/out, replicate weights) instead of
    falling back — the DP train step keeps the kernel. 8-device CPU mesh,
    interpret-mode kernel, parity vs the unsharded XLA reference."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")

    rng = np.random.RandomState(21)
    B, H, D, T = 16, 4, 64, 96
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.2)
    p = _params(rng, D)
    lens = np.linspace(T // 2, T, B).astype(int)
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias = jnp.where(kpm[:, None, None, :], -1e30, 0.0).astype(jnp.float32)
    ref = _xla_reference(x, p, H, bias)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

    @jax.jit
    def f(x):
        return fused_attention_block(
            x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], bias, n_heads=H, dtype=jnp.float32,
            interpret=True,
        )

    out = f(xs)
    # output keeps the batch sharding (no implicit gather)
    assert out.sharding.spec[0] == "data", out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gated_position_bias_matches_xla():
    """WavLM-style gated relative position bias: gate(b,h,q) * shared
    (h,q,k) computed in-kernel vs the materialized (B,H,T,T) XLA bias."""
    rng = np.random.RandomState(7)
    B, H, D, T = 2, 4, 64, 48
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)
    pos = jnp.asarray(rng.randn(H, T, T).astype(np.float32) * 0.5)
    gate = jnp.asarray((1.0 + rng.rand(B, H, T)).astype(np.float32))
    lens = np.array([T, T - 7])
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    kp2 = jnp.where(kpm, -1e30, 0.0).astype(jnp.float32)

    bias4 = gate[:, :, :, None] * pos[None] + kp2[:, None, None, :]
    ref = _xla_reference(x, p, H, bias4)
    out = fused_attention_block(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], kp2, n_heads=H, dtype=jnp.float32,
        interpret=True, attn_bias=pos, attn_gate=gate,
    )
    # the gated kernel keeps the resident bias in bf16 (VMEM budget at
    # WavLM shapes); tolerance covers that single-term rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)
