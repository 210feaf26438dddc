"""Fused attention block with a REAL backward pass (`jax.custom_vjp`).

Round 4's `nn/fused_attention_block.py` fused qkv-proj -> attention ->
out-proj for FROZEN towers (forward-only by construction). This module
takes the same design through the backward pass, for the trainable
post-tower phase the round-4 verdict pinned at 14-25 % of peak: the branch
self-attention (reference `avssl/model/kw_branches.py:808-866`, torch
nn.MultiheadAttention) and the frozen-params/trainable-inputs CLIP text
tower (`avssl/module/clip_official.py:222-279`).

Decomposition (chosen so every piece lands where it runs fastest):

  custom_vjp boundary = qkv proj -> per-head attention -> context
  -------------------------------------------------------------------
  forward  kernel: x (B,T,D) -> ctx (B,T,D)     [Pallas, per batch row]
  backward kernel: x, dctx   -> dqkv (B,T,3D)   [Pallas, per batch row]
  out-projection:  ctx @ Wo + bo                [XLA — full-rate matmul,
                                                 AD gives dWo/dbo/dctx]
  weight grads:    dWqkv = x^T dqkv, dbqkv = sum(dqkv)   [XLA einsums —
                   DCE-eliminated automatically when the caller's params
                   are frozen (stop_gradient), so the text tower pays
                   nothing for them]
  input grad:      dx = dqkv @ Wqkv^T           [XLA]

The backward kernel recomputes qkv and the softmax probabilities in VMEM
(flash-attention style) instead of reading saved (B,H,T,T) tensors: the
XLA autodiff path materializes fp32 probabilities, their dropout masks and
the softmax-jacobian intermediate to HBM (~400 MB each at branch shapes
B=128, T=321) — none of those exist here. Only the layer input `x` is
saved. Dropout masks are REGENERATED bit-identically by reseeding
`pltpu.prng_random_bits` with the forward's per-(group,row) stream and
drawing in the same order.

Per head h (group-local), given gh = dctx_h:
    recompute s = q k^T (+key bias +attn bias), p = softmax(s)
    w  = dropout(p)                       (same bits as forward)
    dv = w^T gh
    dw = gh v^T;  dp = mask(dw)           (dropout chain rule)
    ds = p * (dp - rowsum(dp * p))        (softmax jacobian)
    dq = ds k;  dk = ds^T q               (q-scale folded into Wq, so the
                                           scale chain rule happens in the
                                           differentiable packing outside)

Numerics: bf16 MXU matmuls with fp32 accumulation; softmax and the
jacobian in fp32. The cotangents leave the kernel in the compute dtype —
exactly the precision of the XLA bf16 autodiff path.

Head-grouping mirrors the forward module: for D >= 1024 the weights do not
fit VMEM next to the score scratch, so grid (G, B) runs with per-group
(D, 3*D/G) weight blocks and (1, T, 3*D/G) dqkv output blocks.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import fused_attention_block as _fab
from .fused_attention_block import (
    _NEG_INF,
    _pallas_fwd,
    _round_up,
    _seed_from_key,
)

__all__ = ["fused_attention_block_vjp"]


def _vmem_estimate_bwd(b: int, t: int, d: int, groups: int, itemsize: int,
                       ab_heads: int = 0) -> int:
    """Per-grid-step VMEM bound for the BACKWARD kernel (the larger of the
    two passes; forward reuses the fwd module's no-out-proj path which is
    strictly smaller)."""
    dg = d // groups
    io = 2 * (t * d + t * dg + t * 3 * dg) * itemsize  # x+g in, dqkv out
    weights = d * 3 * dg * itemsize
    biases = (3 * dg + b * t) * 4
    qkv = t * 3 * dg * itemsize                        # recomputed buffer
    tp_lane = _round_up(t, 128)
    scores = 4 * t * tp_lane * 4                       # p, dw/dp, ds, scratch
    acc = t * 3 * dg * 4                               # dqkv assembly fp32
    ab = ab_heads * t * tp_lane * 4 if ab_heads else 0
    return io + weights + biases + qkv + scores + acc + ab


def _pick_groups_vjp(b: int, t: int, d: int, n_heads: int, itemsize: int,
                     has_ab: bool):
    g = 1
    while g <= n_heads:
        if n_heads % g == 0 and (g == 1 or (d // g) % 128 == 0):
            est = _vmem_estimate_bwd(
                b, t, d, g, itemsize, ab_heads=(n_heads // g) if has_ab else 0
            )
            # read the budget off the module so tests can monkeypatch it
            if est <= _fab._VMEM_BUDGET_BYTES:
                return g
        g *= 2
    return None


def _bwd_kernel(seed_ref, x_ref, g_ref, wqkv_ref, bqkv_ref, bias_ref, *rest,
                heads_per_group: int, keep_thresh: Optional[int],
                inv_keep: float, has_ab: bool, grid_1d: bool):
    """Grid step = (head-group g, batch element b). Emits the dqkv block
    (1, T, 3*Dg) in the same group-major [q_g|k_g|v_g] column layout the
    forward consumes, so dx/dWqkv reduce to plain matmuls outside."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ab_ref = rest[0] if has_ab else None
    dqkv_ref = rest[-1]

    if grid_1d:
        g_id = 0
        b_id = pl.program_id(0)
        n_b = pl.num_programs(0)
    else:
        g_id = pl.program_id(0)
        b_id = pl.program_id(1)
        n_b = pl.num_programs(1)
    if keep_thresh is not None:
        # the forward's exact stream: same seed derivation, same draw order
        pltpu.prng_seed(seed_ref[0] + g_id * n_b + b_id)

    x = x_ref[0]                                     # (T, D) bf16
    gc = g_ref[0]                                    # (T, Dg) bf16
    dg3 = wqkv_ref.shape[1]
    dg = dg3 // 3
    dh = dg // heads_per_group
    bias_row = bias_ref[b_id].astype(jnp.float32)    # (T,)

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[g_id]
    qkv = qkv.astype(x.dtype)                        # (T, 3Dg)

    dqs, dks, dvs = [], [], []
    for h in range(heads_per_group):
        qh = qkv[:, h * dh:(h + 1) * dh]             # (T, dh), q pre-scaled
        kh = qkv[:, dg + h * dh:dg + (h + 1) * dh]
        vh = qkv[:, 2 * dg + h * dh:2 * dg + (h + 1) * dh]
        gh = gc[:, h * dh:(h + 1) * dh]              # (T, dh)

        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_row[None, :]
        if ab_ref is not None:
            s = s + ab_ref[h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # (T, T) fp32

        if keep_thresh is not None:
            bits = pltpu.prng_random_bits(p.shape)
            keep = pltpu.bitcast(bits, jnp.uint32) < jnp.uint32(keep_thresh)
            w = jnp.where(keep, p * jnp.float32(inv_keep), 0.0)
        else:
            keep = None
            w = p

        # dv = w^T gh  (contract the query axis)
        dvs.append(jax.lax.dot_general(
            w.astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
        # dw = gh v^T  (contract dh)
        dw = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (T, T) fp32
        if keep is not None:
            dp = jnp.where(keep, dw * jnp.float32(inv_keep), 0.0)
        else:
            dp = dw
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(x.dtype)
        # dq = ds k
        dqs.append(jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))
        # dk = ds^T q  (contract the query axis)
        dks.append(jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype))

    dqkv_ref[0] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _pallas_bwd(x, gc, wqkv, bqkv, bias, attn_bias, seed, heads_per_group,
                groups, keep_thresh, inv_keep, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = x.shape
    dg = d // groups
    vmem = pltpu.VMEM
    const = lambda *_: (0, 0)
    has_ab = attn_bias is not None

    def kernel(seed_ref, x_ref, g_ref, wqkv_ref, bqkv_ref, bias_ref, *rest):
        _bwd_kernel(seed_ref, x_ref, g_ref, wqkv_ref, bqkv_ref, bias_ref,
                    *rest, heads_per_group=heads_per_group,
                    keep_thresh=keep_thresh, inv_keep=inv_keep,
                    has_ab=has_ab, grid_1d=groups == 1)

    if groups == 1:
        grid = (b,)
        x_map = lambda i, *_: (i, 0, 0)
        w_map = lambda i, *_: (0, 0)
        o_map = lambda i, *_: (i, 0, 0)
        ab_map = lambda i, *_: (0, 0, 0)
        g_map = x_map
    else:
        grid = (groups, b)
        x_map = lambda g, i, *_: (i, 0, 0)
        w_map = lambda g, i, *_: (0, g)
        o_map = lambda g, i, *_: (i, 0, g)
        ab_map = lambda g, i, *_: (g, 0, 0)
        g_map = o_map
    ab_specs = (
        [pl.BlockSpec((heads_per_group, t, t), ab_map, memory_space=vmem)]
        if has_ab else []
    )
    ab_inputs = (attn_bias,) if has_ab else ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, d), x_map, memory_space=vmem),
            # ctx cotangent: this group's column block
            pl.BlockSpec((1, t, dg), g_map, memory_space=vmem),
            pl.BlockSpec((d, 3 * dg), w_map, memory_space=vmem),
            pl.BlockSpec((groups, 3 * dg), const, memory_space=vmem),
            pl.BlockSpec((b, t), const, memory_space=vmem),
        ] + ab_specs,
        out_specs=pl.BlockSpec((1, t, 3 * dg), o_map, memory_space=vmem),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, 3 * d), x.dtype),
        interpret=interpret,
    )(seed, x, gc, wqkv, bqkv, bias, *ab_inputs)


@functools.lru_cache(maxsize=None)
def _partitioned(is_bwd, heads_per_group, groups, keep_thresh, inv_keep,
                 interpret, has_ab):
    """custom_partitioning wrappers (multi-device meshes): batch-shard
    x / ctx-cotangent / key bias / outputs, replicate weights — the DP
    decomposition; the per-shard grid is the whole kernel."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _batch_axis(sharding):
        spec = getattr(sharding, "spec", None)
        if not spec:
            return None
        return spec[0]

    def _run(seed, *args):
        if is_bwd:
            x, gc, wqkv, bqkv, bias = args[:5]
            ab = args[5] if has_ab else None
            return _pallas_bwd(x, gc, wqkv, bqkv, bias, ab, seed,
                               heads_per_group, groups, keep_thresh,
                               inv_keep, interpret)
        x, wqkv, bqkv, bias = args[:4]
        ab = args[4] if has_ab else None
        return _pallas_fwd(x, wqkv, bqkv, None, None, bias, seed,
                           heads_per_group, groups, keep_thresh, inv_keep,
                           interpret, attn_bias=ab, fuse_out=False)

    @custom_partitioning
    def call(seed, *args):
        return _run(seed, *args)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        x_sh = arg_shapes[1].sharding
        return NamedSharding(mesh, P(_batch_axis(x_sh), None, None))

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes[1].sharding)
        repl = NamedSharding(mesh, P())
        row3 = NamedSharding(mesh, P(axis, None, None))
        shardings = [repl, row3]            # seed, x
        if is_bwd:
            shardings.append(row3)          # ctx cotangent
        shardings += [repl, repl]           # wqkv, bqkv
        shardings.append(NamedSharding(mesh, P(axis, None)))  # key bias
        if has_ab:
            shardings.append(repl)
        out_sharding = row3

        def lower_fn(seed, *args):
            if axis is not None and keep_thresh is not None:
                seed = seed + (
                    jax.lax.axis_index(axis).astype(jnp.int32) << 20
                )
            return _run(seed, *args)

        return mesh, lower_fn, out_sharding, tuple(shardings)

    n_in = (6 if is_bwd else 5) + (1 if has_ab else 0)
    factors = ["s", "b t d"]
    if is_bwd:
        factors.append("b t2 g2")
    factors += ["w1 w2", "q1 q2", "b t5"]
    if has_ab:
        factors.append("h t6 t7")
    assert len(factors) == n_in
    call.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        propagate_user_sharding=lambda sharding, shape: sharding,
        sharding_rule=", ".join(factors) + " -> b t8 d2"
        if is_bwd else ", ".join(factors) + " -> b t d",
    )
    return call


def _maybe_partitioned_fwd(x, wqkv, bqkv, bias, ab, seed, hpg, groups,
                           keep_thresh, inv_keep, interpret):
    if jax.device_count() > 1:
        args = (seed, x, wqkv, bqkv, bias) + ((ab,) if ab is not None else ())
        return _partitioned(False, hpg, groups, keep_thresh, inv_keep,
                            interpret, ab is not None)(*args)
    return _pallas_fwd(x, wqkv, bqkv, None, None, bias, seed, hpg, groups,
                       keep_thresh, inv_keep, interpret, attn_bias=ab,
                       fuse_out=False)


def _maybe_partitioned_bwd(x, gc, wqkv, bqkv, bias, ab, seed, hpg, groups,
                           keep_thresh, inv_keep, interpret):
    if jax.device_count() > 1:
        args = (seed, x, gc, wqkv, bqkv, bias) + (
            (ab,) if ab is not None else ()
        )
        return _partitioned(True, hpg, groups, keep_thresh, inv_keep,
                            interpret, ab is not None)(*args)
    return _pallas_bwd(x, gc, wqkv, bqkv, bias, ab, seed, hpg, groups,
                       keep_thresh, inv_keep, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _attn_core(x, wqkv, bqkv, bias, ab, seed, heads_per_group, groups,
               keep_thresh, inv_keep, interpret):
    """x (B,T,D) -> attention context (B,T,D), head-major columns."""
    return _maybe_partitioned_fwd(x, wqkv, bqkv, bias, ab, seed,
                                  heads_per_group, groups, keep_thresh,
                                  inv_keep, interpret)


def _attn_core_fwd(x, wqkv, bqkv, bias, ab, seed, heads_per_group, groups,
                   keep_thresh, inv_keep, interpret):
    ctx = _maybe_partitioned_fwd(x, wqkv, bqkv, bias, ab, seed,
                                 heads_per_group, groups, keep_thresh,
                                 inv_keep, interpret)
    # residuals: only the layer input (+ the small weights/biases/seed);
    # no (B,H,T,T) tensor is ever saved
    return ctx, (x, wqkv, bqkv, bias, ab, seed)


def _attn_core_bwd(heads_per_group, groups, keep_thresh, inv_keep,
                   interpret, res, gc):
    x, wqkv, bqkv, bias, ab, seed = res
    gc = gc.astype(x.dtype)
    dqkv = _maybe_partitioned_bwd(x, gc, wqkv, bqkv, bias, ab, seed,
                                  heads_per_group, groups, keep_thresh,
                                  inv_keep, interpret)
    # group-major column layout matches wqkv's, so the contractions are
    # permutation-consistent plain matmuls. dWqkv/dbqkv are DCE'd by XLA
    # when the caller freezes the projection weights (stop_gradient).
    dx = jnp.einsum(
        "btk,dk->btd", dqkv, wqkv, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dwqkv = jnp.einsum(
        "btd,btk->dk", x, dqkv, preferred_element_type=jnp.float32
    ).astype(wqkv.dtype)
    dbqkv = dqkv.astype(jnp.float32).sum((0, 1)).reshape(bqkv.shape).astype(
        bqkv.dtype
    )
    dbias = jnp.zeros_like(bias)
    dab = None if ab is None else jnp.zeros_like(ab)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dx, dwqkv, dbqkv, dbias, dab, dseed)


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def fused_attention_block_vjp(
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
    attn_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable fused attention sub-block (same surface as
    `fused_attention_block`, plus gradients for x and all eight
    projection parameters).

    Falls back to the XLA path (identical math, native autodiff) off-TPU
    or when no head-grouping fits the VMEM budget.
    """
    b, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / float(dh) ** 0.5

    on_tpu = jax.default_backend() == "tpu"
    groups = _pick_groups_vjp(
        b, t, d, n_heads, jnp.dtype(dtype).itemsize, attn_bias is not None
    )
    if (not on_tpu and not interpret) or groups is None:
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
        if attn_bias is not None:
            ab4 = attn_bias.reshape(
                (1,) * (3 - attn_bias.ndim) + attn_bias.shape
            )[None]
            bias4 = ab4 if bias4 is None else bias4 + ab4
        out = dot_product_attention(
            split(q), split(k), split(v), bias=bias4,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return out @ wo.astype(dtype) + bo.astype(dtype)

    # differentiable packing: group-major [q_g|k_g|v_g] columns with the
    # 1/sqrt(dh) scale folded into Wq/bq — AD routes the scale's chain rule
    # through these trace-level ops, so the kernel never sees it
    dg = d // groups
    wq_s, bq_s = wq * scale, bq * scale
    w_parts, b_parts = [], []
    for g in range(groups):
        sl = slice(g * dg, (g + 1) * dg)
        w_parts += [wq_s[:, sl], wk[:, sl], wv[:, sl]]
        b_parts += [bq_s[sl], bk[sl], bv[sl]]
    wqkv = jnp.concatenate(w_parts, axis=1).astype(dtype)
    bqkv = jnp.concatenate(b_parts).astype(jnp.float32).reshape(
        groups, 3 * dg
    )

    if key_padding_bias is None:
        bias = jnp.zeros((b, t), jnp.float32)
    elif key_padding_bias.ndim == 4:
        bias = jnp.broadcast_to(
            key_padding_bias, (b, 1, 1, t)
        )[:, 0, 0, :].astype(jnp.float32)
    else:
        bias = key_padding_bias.astype(jnp.float32)

    tp = _round_up(t, 16)
    pad_t = tp - t
    xc = x.astype(dtype)
    if pad_t:
        xc = jnp.pad(xc, ((0, 0), (0, pad_t), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_t)), constant_values=_NEG_INF)
    ab = None
    if attn_bias is not None:
        ab = jnp.broadcast_to(
            attn_bias.reshape((1,) * (3 - attn_bias.ndim) + attn_bias.shape),
            (n_heads, t, t),
        ).astype(jnp.float32)
        if pad_t:
            ab = jnp.pad(ab, ((0, 0), (0, pad_t), (0, pad_t)))
        ab = jax.lax.stop_gradient(ab)

    if dropout_rate > 0.0 and not deterministic:
        assert dropout_rng is not None
        keep = 1.0 - float(dropout_rate)
        keep_thresh = min(int(round(keep * 2.0 ** 32)), 2 ** 32 - 1)
        inv_keep = 1.0 / keep
        seed = _seed_from_key(dropout_rng)
    else:
        keep_thresh, inv_keep = None, 1.0
        seed = jnp.zeros((1,), jnp.int32)

    ctx = _attn_core(xc, wqkv, bqkv, bias, ab, seed, n_heads // groups,
                     groups, keep_thresh, inv_keep, interpret)
    if pad_t:
        ctx = ctx[:, :t, :]
    return ctx @ wo.astype(dtype) + bo.astype(dtype)
