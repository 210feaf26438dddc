"""fast_gelu: bf16-grade polynomial GELU vs the exact erf profile.

The claim to verify (ops/gelu.py): on the bf16 path the polynomial's
deviation from erf-GELU is below bf16's own quantization noise, so a
bfloat16 tower cannot distinguish them.
"""
import numpy as np

import jax
import jax.numpy as jnp

from speechclip_plus_tpu.ops.gelu import fast_gelu


def _all_finite_bf16():
    """Every finite bf16 value (exhaustive domain)."""
    bits = np.arange(0, 1 << 16, dtype=np.uint32) << 16
    f = bits.view(np.float32)
    return f[np.isfinite(f)]


def test_fast_gelu_exhaustive_bf16_domain():
    x32 = _all_finite_bf16().astype(np.float32)
    # keep magnitudes sane (activations; also avoids overflow in x*phi)
    x32 = x32[np.abs(x32) < 1e4]
    x = jnp.asarray(x32, jnp.bfloat16)
    got = np.asarray(fast_gelu(x), np.float32)
    ref = np.asarray(
        jax.nn.gelu(jnp.asarray(x32), approximate=False), np.float32
    )
    err = np.abs(got - ref)
    # absolute floor for the dead zone + bf16-ulp-scaled relative bound
    tol = np.maximum(2e-4, np.abs(ref) * 2 ** -7)
    assert (err <= tol).all(), (
        f"worst: x={x32[np.argmax(err - tol)]}, err={err.max()}"
    )


def test_fast_gelu_below_bf16_quantization_noise():
    """Approximation noise must be smaller than the noise bf16 itself adds:
    |poly(x) - erf_gelu(x)|  <=  max ulp gap of bf16(erf_gelu(x))."""
    rng = np.random.RandomState(0)
    x32 = (rng.randn(200000) * 2.5).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    poly = np.asarray(fast_gelu(x), np.float32)
    exact_f32 = np.asarray(
        jax.nn.gelu(jnp.asarray(np.asarray(x, np.float32)),
                    approximate=False),
        np.float32,
    )
    exact_bf16 = exact_f32.astype(jnp.bfloat16).astype(np.float32)
    dtype_noise = np.abs(exact_bf16 - exact_f32)
    approx_noise = np.abs(poly - exact_bf16)
    # elementwise the poly can land on the other side of a rounding
    # boundary; statistically it must not add more noise than the dtype
    assert approx_noise.mean() <= dtype_noise.mean() + 2.5e-5
    # against the bf16-rounded exact value, stay within one output ulp + the
    # fit bound (the fp32-exact comparison lives in the exhaustive test)
    tol = np.abs(exact_bf16) * 2 ** -7 + 3e-4
    assert (approx_noise <= tol).all()


def test_fast_gelu_fp32_is_exact():
    x = jnp.asarray(np.linspace(-6, 6, 1001, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(fast_gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
    )


def test_keep_mask_distribution_and_quantization():
    """ops/random.keep_mask ~ Bernoulli(p) at both bit widths: mean within
    sampling noise of p, exact edge behavior, determinism for a fixed key."""
    import jax

    from speechclip_plus_tpu.ops.random import get_mask_bits, keep_mask

    assert get_mask_bits() == 8  # module default
    rng = jax.random.key(0)
    for bits in (8, 16):
        m = keep_mask(rng, 0.9, (1 << 20,), bits=bits)
        frac = float(np.asarray(m, np.float32).mean())
        assert abs(frac - 0.9) < 2e-3, (bits, frac)  # 4+ sigma at n=1M
        # deterministic for a fixed key
        a = np.asarray(keep_mask(rng, 0.5, (1024,), bits=bits))
        b = np.asarray(keep_mask(rng, 0.5, (1024,), bits=bits))
        assert (a == b).all()
    assert np.asarray(keep_mask(rng, 1.0, (16,))).all()
    assert not np.asarray(keep_mask(rng, 0.0, (16,))).any()
    # keep_prob above 254/256 falls back to the 16-bit path (a dithered
    # 8-bit threshold would overflow uint8)
    m = keep_mask(rng, 0.999, (1 << 18,))
    assert abs(float(np.asarray(m, np.float32).mean()) - 0.999) < 1e-3


def test_keep_mask_8bit_dither_is_exact_in_expectation():
    """The dithered 8-bit threshold makes the MARGINAL keep probability
    exactly p (not quantized to 1/256): averaging the realized keep
    fraction over many independent keys must converge to p, not to
    floor(p*256)/256 or ceil(p*256)/256."""
    import jax

    from speechclip_plus_tpu.ops.random import keep_mask

    p = 0.9  # p*256 = 230.4 -> fixed 8-bit thresholds give 0.8984 / 0.9023
    n_keys, n = 64, 1 << 16
    fracs = []
    for i in range(n_keys):
        m = keep_mask(jax.random.key(i), p, (n,), bits=8)
        fracs.append(float(np.asarray(m, np.float32).mean()))
    mean = float(np.mean(fracs))
    # sampling sigma of the grand mean ~ sqrt(p(1-p)/(n_keys*n)) = 1.5e-4;
    # the nearest fixed-threshold values are 1.6e-3 away -> 10+ sigma apart
    assert abs(mean - p) < 6e-4, mean
    # both thresholds must actually occur across keys (dither is live)
    lo_seen = any(f < 0.9 - 8e-4 for f in fracs)
    hi_seen = any(f > 0.9 + 8e-4 for f in fracs)
    assert lo_seen and hi_seen, (min(fracs), max(fracs))
