"""Forward-only fused attention with in-kernel dropout (Pallas, TPU).

Purpose-built for the FROZEN HuBERT tower (the product default: the
reference trains with the speech encoder frozen and — Lightning-effective
behavior — dropout active inside it, SURVEY §2.7 / PARITY.md). The tower
runs under `stop_gradient`, so its attention needs **no backward pass**,
which removes the one thing that made a Pallas kernel lose to XLA here
(`nn/flash.py` measured 1.1–1.2x slower fwd+bwd): a forward-only kernel
can fuse

    scores = QK^T + bias  →  softmax  →  dropout  →  · V

entirely in VMEM, so per layer it eliminates (at B=128, T=320, H=12)

  - the (B, H, T, T) attention-probability dropout masks: ~160 M
    bernoulli draws/layer that the XLA path generates with the hardware
    RNG and round-trips through HBM (`ops/random.keep_mask`, ~26 ms/step
    across the stack), replaced by `pltpu.prng_random_bits` inside the
    kernel — zero HBM traffic;
  - the score/probability tensors' HBM round trips (~300 MB/layer bf16).

Layout: one batch element per grid step, all heads and the full (padded)
sequence resident in VMEM (~2 MB/step at base shapes) — no online
softmax needed at the model's sequence lengths (T ≤ ~2k); the kernel
asserts the padded T fits the VMEM budget and callers fall back to
`dot_product_attention` beyond it.

Numerics: fp32 scores/softmax (matches `nn/attention.py`), bf16 MXU
matmuls for bf16 inputs, dropout keep-threshold quantized to 1/2^32
(the XLA path quantizes to 1/2^16; dropout has no cross-framework
bitwise parity anyway — PARITY.md).

Gradient safety: forward-only by construction. `KWClipConfig.from_config`
enables it only for a frozen tower (`models/kwclip.py`); a trainable
tower keeps the XLA path. A `jax.custom_vjp` with an erroring backward
guards against accidental misuse.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["fused_attention_dropout"]

_NEG_INF = -1e30
# VMEM budget guard: one grid step holds q/k/v/o blocks of (H, Tp, dh)
# bf16 — double-buffered by the pipeline — plus, per head, a (Tp, Tp)
# fp32 score and prob tile. Stay under ~14 MB of v5e's ~16 MB VMEM or
# Mosaic fails at compile time instead of falling back.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _vmem_estimate(b: int, h: int, tp: int, dh: int) -> int:
    io_blocks = 4 * h * tp * dh * 2  # q/k/v/o, bf16
    score_tiles = 2 * tp * tp * 4  # scores + probs, fp32, one head live
    bias_block = b * tp * 4  # full-array (B, Tp) fp32 bias, resident
    return 2 * io_blocks + score_tiles + bias_block  # x2: double-buffering


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
            n_heads: int, keep_thresh: int, inv_keep: float):
    """Grid step = one batch element: q/k/v/o blocks (1, H, Tp, dh).
    The bias rides as ONE full-array (B, Tp) VMEM block (a per-grid
    (1, Tp) block violates Mosaic's second-minor-divisible-by-8 rule)
    and each grid step reads its own row; additive, -inf at padded keys."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if keep_thresh is not None:
        # independent stream per batch element; state advances across
        # prng_random_bits calls within the program
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    bias_row = bias_ref[pl.program_id(0)].astype(jnp.float32)  # (Tp,)
    dh = q_ref.shape[-1]
    scale = jax.lax.rsqrt(jnp.float32(dh))

    def head(h, _):
        qh = q_ref[0, h].astype(jnp.float32) * scale      # (Tp, dh)
        kh = k_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (Tp, Tp)
        s = s + bias_row[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        if keep_thresh is not None:
            bits = pltpu.prng_random_bits(w.shape)
            keep = pltpu.bitcast(bits, jnp.uint32) < jnp.uint32(keep_thresh)
            w = jnp.where(keep, w * jnp.float32(inv_keep), 0.0)
        o_ref[0, h] = jax.lax.dot_general(
            w.astype(v_ref.dtype), v_ref[0, h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_heads, head, 0)


def _pallas_fwd(q, k, v, bias, seed, keep_thresh, inv_keep, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, tp, dh = q.shape
    kernel = functools.partial(
        _kernel, n_heads=h, keep_thresh=keep_thresh, inv_keep=inv_keep
    )
    vmem = pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, tp, dh), lambda i, *_: (i, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, h, tp, dh), lambda i, *_: (i, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, h, tp, dh), lambda i, *_: (i, 0, 0, 0),
                         memory_space=vmem),
            # full-array block: (1, tp) blocks trip Mosaic's "second-minor
            # divisible by 8" check; the whole bias is B*Tp*4 bytes
            # (~200 KB at base shapes), loaded once and kept resident
            pl.BlockSpec((b, tp), lambda i, *_: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, h, tp, dh), lambda i, *_: (i, 0, 0, 0),
                               memory_space=vmem),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dh), q.dtype),
        interpret=interpret,
    )(seed, q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_nograd(q, k, v, bias, seed, keep_thresh, inv_keep, interpret):
    return _pallas_fwd(q, k, v, bias, seed, keep_thresh, inv_keep, interpret)


def _fused_fwd(q, k, v, bias, seed, keep_thresh, inv_keep, interpret):
    return (
        _pallas_fwd(q, k, v, bias, seed, keep_thresh, inv_keep, interpret),
        None,
    )


def _fused_bwd(keep_thresh, inv_keep, interpret, res, g):
    raise NotImplementedError(
        "fused_attention_dropout is forward-only (frozen-tower path); "
        "use nn.attention.dot_product_attention for trainable towers"
    )


_fused_nograd.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_dropout(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_bias: Optional[jnp.ndarray] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(QK^T/sqrt(dh) + bias) with fused in-kernel dropout, then @V.

    Args:
      q, k, v: (B, H, T, dh).
      key_padding_bias: additive bias broadcastable to (B, 1, 1, T)
        (the `nn/attention.py` convention: -inf at padded keys) or (B, T).
      dropout_rate: attention-probability dropout (train mode).
      dropout_rng: PRNG key; only its data seeds the in-kernel generator.
      interpret: run the Pallas interpreter (CPU tests).

    Falls back to the XLA `dot_product_attention` off-TPU (unless
    `interpret`) and for sequences beyond the VMEM budget.
    """
    b, h, t, dh = q.shape
    tp = _round_up(t, 128)
    on_tpu = jax.default_backend() == "tpu"
    if (not on_tpu and not interpret) or (
        _vmem_estimate(b, h, tp, dh) > _VMEM_BUDGET_BYTES
    ):
        from .attention import dot_product_attention

        bias4 = None
        if key_padding_bias is not None:
            bias4 = key_padding_bias
            if bias4.ndim == 2:
                bias4 = bias4[:, None, None, :]
        return dot_product_attention(
            q, k, v, bias=bias4, dropout_rate=dropout_rate,
            dropout_rng=dropout_rng, deterministic=deterministic,
        )

    if key_padding_bias is None:
        bias = jnp.zeros((b, t), jnp.float32)
    elif key_padding_bias.ndim == 4:
        bias = jnp.broadcast_to(
            key_padding_bias, (b, 1, 1, t)
        )[:, 0, 0, :].astype(jnp.float32)
    else:
        bias = key_padding_bias.astype(jnp.float32)

    pad_t = tp - t
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_t)), constant_values=_NEG_INF)

    if dropout_rate > 0.0 and not deterministic:
        assert dropout_rng is not None
        keep = 1.0 - float(dropout_rate)
        keep_thresh = min(int(round(keep * 2.0 ** 32)), 2 ** 32 - 1)
        inv_keep = 1.0 / keep
        # XOR all key words into the seed: fold_in on some impls (rbg)
        # perturbs only part of the key data, and per-layer streams must
        # stay independent
        data = jax.random.key_data(dropout_rng).astype(jnp.uint32)
        seed = jax.lax.reduce(
            data.reshape(-1), jnp.uint32(0), jax.lax.bitwise_xor, (0,)
        ).reshape(1).astype(jnp.int32)
    else:
        keep_thresh, inv_keep = None, 1.0
        seed = jnp.zeros((1,), jnp.int32)

    out = _fused_nograd(q, k, v, bias, seed, keep_thresh, inv_keep, interpret)
    return out[:, :, :t, :] if pad_t else out
