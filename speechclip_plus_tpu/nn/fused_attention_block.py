"""Forward-only fused attention BLOCK: QKV proj -> attention -> out proj.

Round-3's attention-only kernel (`nn/fused_attention.py`) won its standalone
A/B 2.7x but LOST in-model because feeding it forced materialized
(B, H, T, dh) transposes of q/k/v (+ the output) — ~250 MB/layer of HBM
round trips XLA's native path never pays (PERF.md §3 autopsy). This kernel
implements that autopsy's prescription: consume the residual stream in its
native (B, T, D) layout and fuse THROUGH the projections, so no transpose
can exist at any HBM boundary. Per encoder layer it computes, entirely in
VMEM per batch element:

    qkv  = x @ Wqkv + bqkv                  # one (T,D)@(D,3D) MXU matmul
    for each head h (static unroll):
        s_h = q_h @ k_h^T + key_bias        # q pre-scaled into Wq (free)
        p_h = dropout(softmax(s_h))         # in-kernel pltpu.prng_random_bits
        c_h = p_h @ v_h
    out  = concat_h(c_h) @ Wo + bo          # (T,D)@(D,D)

HBM traffic per layer: read x (63 MB at base shapes) + write out (63 MB)
+ weights (6 MB). The XLA path additionally round-trips qkv (189 MB x2),
the (B,H,T,T) score/prob tensors (~300 MB bf16 each, layout permitting)
and the attention-dropout masks; none of those exist here. T is consumed
at its true length (320 base) — the only register padding left is the
lane-dim tile of the (T, T) score tile, inherent to any layout.

Matches the effective fp16 attention of the reference's patched fairseq
encoder (`avssl/module/speech_encoder_plus.py:558-570`); the reference's
torch stack materializes the same tensors this kernel keeps in VMEM.

Weights ride as full-array VMEM blocks with constant index maps, so Pallas
loads them once and keeps them resident across the batch grid (base:
Wqkv 3.4 MB + Wo 1.2 MB bf16). The q scale (1/sqrt(dh)) is folded into
Wq/bq at trace time.

Forward-only by construction: the product tower is FROZEN (reference
trains with the speech encoder frozen and dropout active inside it —
Lightning-effective behavior, PARITY.md), so no backward exists; a
`jax.custom_vjp` with an erroring backward guards misuse, and
`KWClipConfig.from_config` only enables the kernel for a frozen tower.

Numerics: bf16 MXU matmuls with fp32 accumulation (preferred_element_type),
fp32 softmax — slightly *more* accurate than the XLA path, which
materializes bf16 score tensors to bound HBM traffic (nn/attention.py).
Dropout keep-threshold is exact to 1/2^32; dropout has no cross-framework
bitwise parity (PARITY.md).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["fused_attention_block"]

_NEG_INF = -1e30
# VMEM guard: weights resident + double-buffered x/out blocks + qkv/context
# scratch + two fp32 score tiles. Past this, fall back to the XLA path
# rather than fail Mosaic allocation.
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _vmem_estimate(b: int, t: int, d: int, dh: int) -> int:
    io = 2 * (2 * t * d * 2)          # x + out blocks, bf16, double-buffered
    weights = (d * 3 * d + d * d) * 2  # Wqkv + Wo, bf16, resident
    biases = (3 * d + d + b * t) * 4   # bqkv + bo + key bias, fp32
    qkv = t * 3 * d * 4                # fp32 qkv value buffer
    ctx = t * d * 4                    # fp32 context accumulation
    tp_lane = _round_up(t, 128)
    scores = 2 * t * tp_lane * 4       # score + prob tiles, fp32, one head
    return io + weights + biases + qkv + ctx + scores


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref,
            o_ref, *, n_heads: int, keep_thresh: Optional[int],
            inv_keep: float):
    """Grid step = one batch element; block (1, T, D)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if keep_thresh is not None:
        # independent stream per batch element; the generator state advances
        # across prng_random_bits calls within one program
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    x = x_ref[0]                                     # (T, D) bf16
    t, d = x.shape
    dh = d // n_heads
    bias_row = bias_ref[pl.program_id(0)].astype(jnp.float32)  # (T,)

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0]                                  # (T, 3D) fp32
    qkv = qkv.astype(x.dtype)

    ctx = []
    for h in range(n_heads):
        qh = qkv[:, h * dh:(h + 1) * dh]             # (T, dh) — q pre-scaled
        kh = qkv[:, d + h * dh:d + (h + 1) * dh]
        vh = qkv[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (T, T) fp32
        s = s + bias_row[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        if keep_thresh is not None:
            bits = pltpu.prng_random_bits(w.shape)
            keep = pltpu.bitcast(bits, jnp.uint32) < jnp.uint32(keep_thresh)
            w = jnp.where(keep, w * jnp.float32(inv_keep), 0.0)
        ctx.append(jax.lax.dot_general(
            w.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))                           # (T, dh)

    context = jnp.concatenate(ctx, axis=-1)          # (T, D)
    out = jax.lax.dot_general(
        context, wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed, n_heads, keep_thresh,
                inv_keep, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = x.shape
    kernel = functools.partial(
        _kernel, n_heads=n_heads, keep_thresh=keep_thresh, inv_keep=inv_keep
    )
    vmem = pltpu.VMEM
    const = lambda i, *_: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, *_: (i, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((d, 3 * d), const, memory_space=vmem),
            pl.BlockSpec((1, 3 * d), const, memory_space=vmem),
            pl.BlockSpec((d, d), const, memory_space=vmem),
            pl.BlockSpec((1, d), const, memory_space=vmem),
            # key bias as ONE full-array (B, T) block (a (1, T) block trips
            # Mosaic's second-minor-divisible-by-8 rule); each program reads
            # its own row
            pl.BlockSpec((b, t), const, memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i, *_: (i, 0, 0),
                               memory_space=vmem),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(seed, x, wqkv, bqkv, wo, bo, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_nograd(x, wqkv, bqkv, wo, bo, bias, seed, n_heads, keep_thresh,
                  inv_keep, interpret):
    return _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed, n_heads,
                       keep_thresh, inv_keep, interpret)


def _fused_fwd(x, wqkv, bqkv, wo, bo, bias, seed, n_heads, keep_thresh,
               inv_keep, interpret):
    return (
        _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed, n_heads, keep_thresh,
                    inv_keep, interpret),
        None,
    )


def _fused_bwd(n_heads, keep_thresh, inv_keep, interpret, res, g):
    raise NotImplementedError(
        "fused_attention_block is forward-only (frozen-tower path); "
        "use the XLA attention path for trainable towers"
    )


_fused_nograd.defvjp(_fused_fwd, _fused_bwd)


def _seed_from_key(rng: jax.Array) -> jnp.ndarray:
    """XOR all key words into one int32: fold_in on some impls (rbg)
    perturbs only part of the key data, and per-layer streams must stay
    independent (same derivation as nn/fused_attention.py)."""
    data = jax.random.key_data(rng).astype(jnp.uint32)
    return jax.lax.reduce(
        data.reshape(-1), jnp.uint32(0), jax.lax.bitwise_xor, (0,)
    ).reshape(1).astype(jnp.int32)


def fused_attention_block(
    x: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    key_padding_bias: Optional[jnp.ndarray] = None,
    *,
    n_heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full attention sub-block: projections + attention + output projection.

    Args:
      x: (B, T, D) residual stream (native layout — never transposed).
      wq..bo: per-projection kernels/biases with nn.Dense shapes
        ((D, D) kernels, (D,) biases) — the layer's own param tree.
      key_padding_bias: additive bias, (B, T) or broadcastable to
        (B, 1, 1, T); -inf at padded keys (nn/attention.py convention).
      n_heads: head count (D % n_heads == 0).
      dropout_rate: attention-probability dropout (train mode).
      dtype: compute dtype for the MXU matmuls (towers run bf16).
      interpret: run the Pallas interpreter (CPU tests).

    Falls back to the XLA path (identical math through
    `dot_product_attention`) off-TPU and beyond the VMEM budget.
    """
    b, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / float(dh) ** 0.5

    on_tpu = jax.default_backend() == "tpu"
    if (not on_tpu and not interpret) or (
        _vmem_estimate(b, t, d, dh) > _VMEM_BUDGET_BYTES
    ):
        from .attention import dot_product_attention

        xc = x.astype(dtype)
        q = xc @ wq.astype(dtype) + bq.astype(dtype)
        k = xc @ wk.astype(dtype) + bk.astype(dtype)
        v = xc @ wv.astype(dtype) + bv.astype(dtype)
        split = lambda a: a.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
        bias4 = None
        if key_padding_bias is not None:
            bias4 = key_padding_bias
            if bias4.ndim == 2:
                bias4 = bias4[:, None, None, :]
        out = dot_product_attention(
            split(q), split(k), split(v), bias=bias4,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return out @ wo.astype(dtype) + bo.astype(dtype)

    # fold the 1/sqrt(dh) q-scale into Wq/bq (free, trace-time)
    wqkv = jnp.concatenate(
        [wq * scale, wk, wv], axis=1
    ).astype(dtype)                                     # (D, 3D)
    bqkv = jnp.concatenate(
        [bq * scale, bk, bv]
    ).astype(jnp.float32)[None, :]                      # (1, 3D)
    wo_c = wo.astype(dtype)
    bo_c = bo.astype(jnp.float32)[None, :]

    if key_padding_bias is None:
        bias = jnp.zeros((b, t), jnp.float32)
    elif key_padding_bias.ndim == 4:
        bias = jnp.broadcast_to(
            key_padding_bias, (b, 1, 1, t)
        )[:, 0, 0, :].astype(jnp.float32)
    else:
        bias = key_padding_bias.astype(jnp.float32)

    # pad T to the bf16 sublane tile so block shapes stay aligned; padded
    # keys get -inf bias (probs -> 0), padded query rows are sliced off
    tp = _round_up(t, 16)
    pad_t = tp - t
    xc = x.astype(dtype)
    if pad_t:
        xc = jnp.pad(xc, ((0, 0), (0, pad_t), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_t)), constant_values=_NEG_INF)

    if dropout_rate > 0.0 and not deterministic:
        assert dropout_rng is not None
        keep = 1.0 - float(dropout_rate)
        keep_thresh = min(int(round(keep * 2.0 ** 32)), 2 ** 32 - 1)
        inv_keep = 1.0 / keep
        seed = _seed_from_key(dropout_rng)
    else:
        keep_thresh, inv_keep = None, 1.0
        seed = jnp.zeros((1,), jnp.int32)

    out = _fused_nograd(xc, wqkv, bqkv, wo_c, bo_c, bias, seed, n_heads,
                        keep_thresh, inv_keep, interpret)
    return out[:, :t, :] if pad_t else out
