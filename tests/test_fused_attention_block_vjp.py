"""Differentiable fused attention block (nn/fused_attention_block_vjp.py).

Value + GRADIENT parity vs the layer's XLA autodiff path in Pallas
interpret mode (p=0 — exact math both sides), plus a finite-difference
gradient check of the dropout path against the kernel's own deterministic
(seeded) forward. On-chip behavior is A/B'd by scripts/bench_post_vjp.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechclip_plus_tpu.nn.attention import dot_product_attention
from speechclip_plus_tpu.nn import fused_attention_block as fab
from speechclip_plus_tpu.nn.fused_attention_block_vjp import (
    fused_attention_block_vjp,
)


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


def _loss(out, probe):
    return (out.astype(jnp.float32) * probe).sum()


@pytest.mark.parametrize("T", [64, 70])  # 70: sublane-pad path
def test_grads_match_xla_autodiff(T):
    rng = np.random.RandomState(0)
    B, H, D = 3, 4, 64
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)
    probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = np.array([T, T // 2, max(T // 3, 1)])
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias2 = jnp.where(kpm, -1e30, 0.0).astype(jnp.float32)
    bias4 = bias2[:, None, None, :]

    def f_ref(x, p):
        return _loss(_xla_reference(x, p, H, bias4), probe)

    def f_ker(x, p):
        out = fused_attention_block_vjp(
            x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], bias2, n_heads=H, dtype=jnp.float32,
            interpret=True,
        )
        return _loss(out, probe)

    (v_ref, g_ref) = jax.value_and_grad(f_ref, argnums=(0, 1))(x, p)
    (v_ker, g_ker) = jax.value_and_grad(f_ker, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    gx_ref, gp_ref = g_ref
    gx_ker, gp_ker = g_ker
    np.testing.assert_allclose(np.asarray(gx_ker), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp_ker[k]), np.asarray(gp_ref[k]),
            rtol=3e-4, atol=3e-4, err_msg=k,
        )


def test_grads_match_with_attn_bias():
    """Causal (T, T) additive bias — the text-tower configuration."""
    rng = np.random.RandomState(1)
    B, H, D, T = 2, 4, 64, 16
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)
    probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    causal = jnp.where(
        jnp.tril(jnp.ones((T, T), dtype=bool)), 0.0, -1e30
    ).astype(jnp.float32)

    def f_ref(x, p):
        return _loss(_xla_reference(x, p, H, causal[None, None]), probe)

    def f_ker(x, p):
        out = fused_attention_block_vjp(
            x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
            interpret=True, attn_bias=causal,
        )
        return _loss(out, probe)

    (v_ref, g_ref) = jax.value_and_grad(f_ref, argnums=(0, 1))(x, p)
    (v_ker, g_ker) = jax.value_and_grad(f_ker, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ker[0]), np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4)
    for k in g_ref[1]:
        np.testing.assert_allclose(
            np.asarray(g_ker[1][k]), np.asarray(g_ref[1][k]),
            rtol=3e-4, atol=3e-4, err_msg=k,
        )


def test_frozen_weights_dx_only_matches():
    """stop_gradient on the params (text-tower mode): dx must still match
    the XLA autodiff dx."""
    rng = np.random.RandomState(2)
    B, H, D, T = 2, 4, 64, 16
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = {k: jax.lax.stop_gradient(v) for k, v in _params(rng, D).items()}
    probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    g_ref = jax.grad(lambda x: _loss(_xla_reference(x, p, H), probe))(x)
    g_ker = jax.grad(lambda x: _loss(fused_attention_block_vjp(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
        interpret=True), probe))(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG (pltpu.prng_seed) has no CPU interpreter rule; "
    "run on hardware via scripts/bench_post_vjp.py --check",
)
def test_dropout_grad_finite_difference():
    """The dropout path's custom backward against finite differences of the
    kernel's own forward — same seed => identical masks on both sides of
    the difference, so this checks the REAL gradient of the REAL function.
    """
    # FD numerators are ~1e-3 of |f|; TPU's default fp32 matmul precision
    # (bf16 passes) adds rounding noise of the same order
    jax.config.update("jax_default_matmul_precision", "highest")
    rng = np.random.RandomState(3)
    B, H, D, T = 2, 2, 32, 16
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float64).astype(np.float32))
    p = _params(rng, D)
    probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def f(x):
        out = fused_attention_block_vjp(
            x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
            dropout_rate=0.3, dropout_rng=key, deterministic=False,
        )
        return _loss(out, probe)

    g = jax.grad(f)(x)
    # directional finite differences along random unit vectors
    for i in range(3):
        u = np.random.RandomState(10 + i).randn(*x.shape).astype(np.float32)
        u /= np.linalg.norm(u)
        u = jnp.asarray(u)
        eps = 3e-2
        fd = (float(f(x + eps * u)) - float(f(x - eps * u))) / (2 * eps)
        an = float((g * u).sum())
        np.testing.assert_allclose(an, fd, rtol=2e-2, atol=2e-2)


def test_head_grouped_variant_grads_match(monkeypatch):
    """Force G=2 via a tiny VMEM budget (D=256 so D/G=128 stays
    lane-aligned); grads must match the XLA path."""
    rng = np.random.RandomState(4)
    B, H, D, T = 2, 4, 256, 32
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.1)
    p = _params(rng, D)
    probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    from speechclip_plus_tpu.nn import fused_attention_block_vjp as mod

    g1 = mod._pick_groups_vjp(B, T, D, H, 4, False)
    assert g1 == 1
    monkeypatch.setattr(fab, "_VMEM_BUDGET_BYTES",
                        mod._vmem_estimate_bwd(B, T, D, 2, 4) + 1)
    assert mod._pick_groups_vjp(B, T, D, H, 4, False) == 2

    def f_ref(x, p):
        return _loss(_xla_reference(x, p, H), probe)

    def f_ker(x, p):
        out = fused_attention_block_vjp(
            x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
            p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
            interpret=True,
        )
        return _loss(out, probe)

    (v_ref, g_ref) = jax.value_and_grad(f_ref, argnums=(0, 1))(x, p)
    (v_ker, g_ker) = jax.value_and_grad(f_ker, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ker[0]), np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4)
    for k in g_ref[1]:
        np.testing.assert_allclose(
            np.asarray(g_ker[1][k]), np.asarray(g_ref[1][k]),
            rtol=3e-4, atol=3e-4, err_msg=k,
        )


def test_off_tpu_fallback_is_differentiable_xla():
    """Off-TPU (no interpret) the function must silently be the XLA path."""
    rng = np.random.RandomState(5)
    B, H, D, T = 2, 4, 64, 8
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = _params(rng, D)
    out = fused_attention_block_vjp(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
    )
    ref = _xla_reference(x, p, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda x: out.sum() * 0.0 + fused_attention_block_vjp(
        x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
        p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_text_tower_vjp_wiring_matches_xla():
    """ClipConfig.text_fused_attention_vjp routes the text tower through
    the kernel path (_AttnParams + fused_attention_block_vjp). Off-TPU the
    kernel falls back to XLA, so outputs/grads must be IDENTICAL to the
    flag-off tower — this validates the parameter tree and bias plumbing."""
    import dataclasses

    from speechclip_plus_tpu.models.clip import ClipConfig, TextTransformer

    rng = np.random.RandomState(6)
    cfg = ClipConfig.tiny()
    model_off = TextTransformer(dataclasses.replace(
        cfg, text_fused_attention_vjp=False))
    model_on = TextTransformer(dataclasses.replace(
        cfg, text_fused_attention_vjp=True, remat=True))
    B, K = 3, 5
    kws = jnp.asarray(rng.randn(B, K, cfg.text_width).astype(np.float32))
    knum = jnp.asarray([2, 5, 3], dtype=jnp.int32)
    variables = model_off.init(
        jax.random.PRNGKey(0), kws, knum, method=TextTransformer.encode_keywords
    )
    # identical param trees: the flag must not change the checkpoint surface
    v2 = model_on.init(
        jax.random.PRNGKey(0), kws, knum, method=TextTransformer.encode_keywords
    )
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    def run(model, kws):
        out = model.apply(variables, kws, knum,
                          method=TextTransformer.encode_keywords)
        return out, (out.astype(jnp.float32) ** 2).sum()

    out_off, _ = run(model_off, kws)
    out_on, _ = run(model_on, kws)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-5)
    g_off = jax.grad(lambda k: run(model_off, k)[1])(kws)
    g_on = jax.grad(lambda k: run(model_on, k)[1])(kws)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=1e-4, atol=1e-5)
