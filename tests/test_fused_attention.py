"""Forward-only fused attention kernel (nn/fused_attention.py).

Parity vs the XLA `dot_product_attention` path in Pallas interpret mode
(p=0 — the in-kernel PRNG is TPU hardware; dropout statistics are
validated on-chip by scripts/bench_fused_attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechclip_plus_tpu.nn.attention import dot_product_attention
from speechclip_plus_tpu.nn.fused_attention import fused_attention_dropout


def _qkv(rng, B, H, T, dh, dtype=jnp.float32):
    mk = lambda: jnp.asarray(rng.randn(B, H, T, dh).astype(np.float32), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("T", [64, 320])
def test_matches_xla_attention_no_dropout(T):
    rng = np.random.RandomState(0)
    B, H, dh = 3, 4, 64
    q, k, v = _qkv(rng, B, H, T, dh)
    lens = np.array([T, T // 2, max(T // 3, 1)])
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias = jnp.where(kpm[:, None, None, :], -1e30, 0.0).astype(jnp.float32)

    ref = dot_product_attention(q, k, v, bias=bias)
    out = fused_attention_dropout(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs_close_to_fp32_reference():
    rng = np.random.RandomState(1)
    B, H, T, dh = 2, 12, 320, 64
    q, k, v = _qkv(rng, B, H, T, dh)
    ref = dot_product_attention(q, k, v)
    out = fused_attention_dropout(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )


def test_fully_padded_row_is_finite():
    rng = np.random.RandomState(2)
    B, H, T, dh = 2, 2, 128, 64
    q, k, v = _qkv(rng, B, H, T, dh)
    kpm = jnp.asarray(np.array([[False] * T, [True] * T]))
    bias = jnp.where(kpm[:, None, None, :], -1e30, 0.0).astype(jnp.float32)
    out = fused_attention_dropout(q, k, v, bias, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_off_tpu_fallback_is_xla_path():
    # without interpret, the CPU backend must fall through to the XLA path
    rng = np.random.RandomState(3)
    q, k, v = _qkv(rng, 2, 2, 64, 64)
    ref = dot_product_attention(q, k, v)
    out = fused_attention_dropout(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_backward_raises():
    rng = np.random.RandomState(4)
    q, k, v = _qkv(rng, 1, 1, 64, 64)

    def f(q):
        return fused_attention_dropout(q, k, v, interpret=True).sum()

    with pytest.raises(NotImplementedError):
        jax.grad(f)(q)


def test_config_rejects_trainable_tower():
    import os

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models.kwclip import KWClipConfig

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(
        os.path.join(repo, "config", "speechclip_plus", "base",
                     "hybrid_plus.yaml")
    )
    cfg.audio_encoder.fused_attention = True
    mc = KWClipConfig.from_config(cfg)
    assert mc.audio.fused_attention_dropout is True

    cfg.audio_encoder.trainable = True
    with pytest.raises(ValueError):
        KWClipConfig.from_config(cfg)


def test_kwclip_forward_with_fused_flag():
    """The fused-attention flag must wire through a full train-mode KWClip
    forward (CPU exercises the plumbing via the XLA fallback inside
    fused_attention_dropout; the kernel itself is covered above and by
    scripts/bench_fused_attention.py on-chip)."""
    import dataclasses

    import numpy as np

    from speechclip_plus_tpu.models import KWClip
    from tests.test_kwclip_model import make_batch, tiny_cfg

    cfg = tiny_cfg("HybridBranch_plus")
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, fused_attention_dropout=True)
    )
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           training=False)
    (loss_feats, logs, _), _ = model.apply(
        variables, batch, training=True,
        global_step=jnp.zeros((), jnp.int32),
        rngs={"dropout": jax.random.PRNGKey(1),
              "vq": jax.random.PRNGKey(2),
              "layer_drop": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    losses = model.apply(variables, loss_feats, method=KWClip.compute_loss)
    assert np.isfinite(float(losses["loss"]))
