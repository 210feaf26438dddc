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
# scratch + two fp32 score tiles. Past this, try head-grouping, then fall
# back to the XLA path rather than fail Mosaic allocation. 14 MB is
# load-bearing: the base config's fully-fused estimate is ~13.7 MB and
# compiles/runs fine; a 12 MB budget silently dropped base into the
# G=2 grouped path (+8 ms/step, caught by a back-to-back bench).
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _vmem_estimate(b: int, t: int, d: int, dh: int, groups: int,
                   itemsize: int = 2) -> int:
    """Rough per-grid-step VMEM bound at `groups` head-groups.

    groups == 1 fuses the out-projection in-kernel (Wo resident);
    groups > 1 runs grid (G, B) with per-group (D, 3*D/G) weight blocks
    and leaves the out-projection to XLA.

    `itemsize` is the compute dtype's byte width: the kernel runs at the
    caller's dtype, so fp32 towers (trainer.precision: 32) double the
    x/weight/out working set vs the bf16 default — under-estimating that
    would let `_pick_groups` admit a config that fails Mosaic allocation
    instead of falling back to XLA (round-4 advisor finding).
    """
    dg = d // groups
    io = 2 * (2 * t * d + 2 * t * dg) * itemsize  # x in + ctx/out, dbl-buf
    weights = d * 3 * dg * itemsize               # Wqkv group block
    if groups == 1:
        weights += d * d * itemsize               # + Wo resident
    biases = (3 * dg + d + b * t) * 4          # bqkv + bo + key bias, fp32
    qkv = t * 3 * dg * 4                       # fp32 qkv value buffer
    ctx = t * dg * 4                           # fp32 context accumulation
    tp_lane = _round_up(t, 128)
    scores = 2 * t * tp_lane * 4               # score + prob tiles, one head
    return io + weights + biases + qkv + ctx + scores


def _pick_groups(b: int, t: int, d: int, dh: int, n_heads: int,
                 itemsize: int = 2, ab_bytes_per_head: int = 0):
    """Smallest head-group count whose working set fits VMEM (None = no
    fit -> XLA fallback). Grid order (G, B) keeps each group's weight
    block resident across the whole batch, so weights are re-fetched only
    G times per layer. `ab_bytes_per_head`: resident per-head attention
    bias footprint (the (hpg, T, T) block scales with heads per group)."""
    g = 1
    while g <= n_heads:
        # g > 1 writes (1, T, D/G) output blocks at lane offset g*D/G,
        # which must stay lane-tile (128) aligned on TPU
        if n_heads % g == 0 and (g == 1 or (d // g) % 128 == 0):
            est = _vmem_estimate(b, t, d, dh, g, itemsize)
            est += (n_heads // g) * ab_bytes_per_head
            if est <= _VMEM_BUDGET_BYTES:
                return g
        g *= 2
    return None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, bias_ref, o_ref, *,
            heads_per_group: int, keep_thresh: Optional[int],
            inv_keep: float, wo_ref=None, bo_ref=None,
            ab_ref=None, gate_ref=None, grid_1d: bool = False):
    """Grid step = (head-group g, batch element b); x block (1, T, D),
    weight block (D, 3*Dg) for the group's [q|k|v] columns, output block
    (1, T, Dg) at lane offset g*Dg (the whole (T, D) row when G == 1,
    where the out-projection is fused in-kernel too).

    `grid_1d`: G == 1 runs a plain (B,) grid — measured ~8 ms/step faster
    at base shapes than the equivalent (1, B) grid (Mosaic schedules the
    two forms differently); the 2-D grid exists only for real grouping."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fuse_out_proj = wo_ref is not None

    if grid_1d:
        g_id = 0
        b_id = pl.program_id(0)
    else:
        g_id = pl.program_id(0)
        b_id = pl.program_id(1)
    if keep_thresh is not None:
        # independent stream per (group, batch element); the generator
        # state advances across prng_random_bits calls within one program
        n_b = pl.num_programs(0) if grid_1d else pl.num_programs(1)
        pltpu.prng_seed(seed_ref[0] + g_id * n_b + b_id)

    x = x_ref[0]                                     # (T, D) bf16
    t, d = x.shape
    dg = wqkv_ref.shape[1] // 3                      # group width
    dh = dg // heads_per_group
    bias_row = bias_ref[b_id].astype(jnp.float32)    # (T,)

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[g_id]                               # (T, 3*Dg) fp32
    qkv = qkv.astype(x.dtype)

    ctx = []
    for h in range(heads_per_group):
        qh = qkv[:, h * dh:(h + 1) * dh]             # (T, dh) — q pre-scaled
        kh = qkv[:, dg + h * dh:dg + (h + 1) * dh]
        vh = qkv[:, 2 * dg + h * dh:2 * dg + (h + 1) * dh]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # (T, T) fp32
        s = s + bias_row[None, :]
        if ab_ref is not None:
            # per-head additive attention bias (causal mask, WavLM-style
            # relative position bias): block (hpg, T, T), this group's heads
            ab_h = ab_ref[h].astype(jnp.float32)
            if gate_ref is not None:
                # WavLM gated relative position bias: the (B, H, T, T)
                # tensor factorizes as gate(b,h,q) * shared(h,q,k) — the
                # shared part rides resident, the gate is a per-row scalar
                s = s + gate_ref[0, h].astype(jnp.float32)[:, None] * ab_h
            else:
                s = s + ab_h
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

    context = jnp.concatenate(ctx, axis=-1)          # (T, Dg)
    if fuse_out_proj:
        out = jax.lax.dot_general(
            context, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[0]
        o_ref[0] = out.astype(o_ref.dtype)
    else:
        o_ref[0] = context


def _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed, heads_per_group, groups,
                keep_thresh, inv_keep, interpret, attn_bias=None,
                fuse_out=None, attn_gate=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = x.shape
    dg = d // groups
    if fuse_out is None:
        fuse_out = groups == 1
    vmem = pltpu.VMEM
    const = lambda *_: (0, 0)
    has_ab = attn_bias is not None
    has_gate = attn_gate is not None
    assert not (has_gate and not has_ab)

    def _sub_refs(rest):
        ab_ref = rest[0] if has_ab else None
        gate_ref = rest[1] if has_gate else None
        return ab_ref, gate_ref

    if fuse_out:
        def kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                   bias_ref, *rest):
            ab_ref, gate_ref = _sub_refs(rest)
            _kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, bias_ref, rest[-1],
                    heads_per_group=heads_per_group, keep_thresh=keep_thresh,
                    inv_keep=inv_keep, wo_ref=wo_ref, bo_ref=bo_ref,
                    ab_ref=ab_ref, gate_ref=gate_ref, grid_1d=True)

        extra_specs = [
            pl.BlockSpec((d, d), const, memory_space=vmem),
            pl.BlockSpec((1, d), const, memory_space=vmem),
        ]
        extra_inputs = (wo, bo)
    else:
        # out-projection stays in XLA: keeping Wo resident alongside the
        # group weight block would break the VMEM budget exactly in the
        # configs that need grouping (D >= 1024)
        def kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, bias_ref, *rest):
            ab_ref, gate_ref = _sub_refs(rest)
            _kernel(seed_ref, x_ref, wqkv_ref, bqkv_ref, bias_ref, rest[-1],
                    heads_per_group=heads_per_group, keep_thresh=keep_thresh,
                    inv_keep=inv_keep, ab_ref=ab_ref, gate_ref=gate_ref,
                    grid_1d=groups == 1)

        extra_specs = []
        extra_inputs = ()

    # G == 1: plain (B,) grid — ~8 ms/step faster at base shapes than the
    # equivalent (1, B) grid (measured back-to-back; Mosaic schedules the
    # two forms differently). G > 1: grid (G, B) with batch innermost, so
    # each group's weight block stays resident across the whole batch
    # (G weight fetches per layer).
    if groups == 1:
        grid = (b,)
        x_map = lambda i, *_: (i, 0, 0)
        w_map = lambda i, *_: (0, 0)
        o_map = lambda i, *_: (i, 0, 0)
        ab_map = lambda i, *_: (0, 0, 0)
    else:
        grid = (groups, b)
        x_map = lambda g, i, *_: (i, 0, 0)
        w_map = lambda g, i, *_: (0, g)
        o_map = lambda g, i, *_: (i, 0, g)
        ab_map = lambda g, i, *_: (g, 0, 0)
    ab_specs = (
        # per-head additive bias: this group's (hpg, T, T) block, resident
        # across the batch (constant index within a group)
        [pl.BlockSpec((heads_per_group, t, t), ab_map, memory_space=vmem)]
        if has_ab else []
    )
    ab_inputs = (attn_bias,) if has_ab else ()
    if has_gate:
        if groups == 1:
            gate_map = lambda i, *_: (i, 0, 0)
        else:
            gate_map = lambda g, i, *_: (i, g, 0)
        ab_specs.append(
            pl.BlockSpec((1, heads_per_group, t), gate_map,
                         memory_space=vmem)
        )
        ab_inputs = ab_inputs + (attn_gate,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, d), x_map, memory_space=vmem),
            pl.BlockSpec((d, 3 * dg), w_map, memory_space=vmem),
            # all G bias rows ride as one resident (G, 3*Dg) block (~12 KB;
            # a (1, 3*Dg) block would trip Mosaic's second-minor rule);
            # the kernel reads its group's row
            pl.BlockSpec((groups, 3 * dg), const, memory_space=vmem),
        ] + extra_specs + [
            # key bias as ONE full-array (B, T) block (a (1, T) block trips
            # Mosaic's second-minor-divisible-by-8 rule); each program reads
            # its own row
            pl.BlockSpec((b, t), const, memory_space=vmem),
        ] + ab_specs,
        out_specs=pl.BlockSpec((1, t, dg), o_map, memory_space=vmem),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(seed, x, wqkv, bqkv, *extra_inputs, bias, *ab_inputs)


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(heads_per_group, groups, keep_thresh, inv_keep,
                     interpret, has_ab=False, fuse_out=None,
                     has_gate=False):
    """SPMD-partitionable wrapper: XLA cannot partition a pallas_call, so
    under a multi-device mesh the kernel registers its own partitioning —
    batch-shard x/bias/out, replicate weights, run the per-shard grid.
    This is exactly the DP decomposition (the kernel's grid iterates the
    batch), so no collectives are needed inside."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _batch_axis(sharding):
        spec = getattr(sharding, "spec", None)
        if not spec:
            return None
        return spec[0]

    @custom_partitioning
    def call(seed, x, wqkv, bqkv, wo, bo, bias, *ab):
        return _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed,
                           heads_per_group, groups, keep_thresh, inv_keep,
                           interpret, attn_bias=ab[0] if ab else None,
                           fuse_out=fuse_out,
                           attn_gate=ab[1] if has_gate else None)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        x_sh = arg_shapes[1].sharding
        return NamedSharding(mesh, P(_batch_axis(x_sh), None, None))

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes[1].sharding)
        repl = NamedSharding(mesh, P())
        arg_shardings = (
            repl,                                   # seed
            NamedSharding(mesh, P(axis, None, None)),  # x
            repl, repl, repl, repl,                 # weights/biases
            NamedSharding(mesh, P(axis, None)),     # key bias
        ) + ((repl,) if has_ab else ()) + (
            # per-batch gate rows shard with the batch
            (NamedSharding(mesh, P(axis, None, None)),) if has_gate else ()
        )
        out_sharding = NamedSharding(mesh, P(axis, None, None))

        def lower_fn(seed, x, wqkv, bqkv, wo, bo, bias, *ab):
            if axis is not None and keep_thresh is not None:
                # decorrelate the per-shard dropout streams: program_id
                # restarts at 0 on every shard
                seed = seed + (
                    jax.lax.axis_index(axis).astype(jnp.int32) << 20
                )
            return _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed,
                               heads_per_group, groups, keep_thresh,
                               inv_keep, interpret,
                               attn_bias=ab[0] if ab else None,
                               fuse_out=fuse_out,
                               attn_gate=ab[1] if has_gate else None)

        return mesh, lower_fn, out_sharding, arg_shardings

    call.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        propagate_user_sharding=lambda sharding, shape: sharding,
        # shardy (the default partitioner) propagates via this einsum-style
        # rule instead of the callbacks: only the batch factor `b` is
        # shared between x, the key bias and the output — weights are
        # independent (replicated in our use), and nothing ties t/d so no
        # sharding can propagate into the attention or contraction dims
        sharding_rule=(
            "s, b t d, w1 w2, q1 q2, o1 o2, p1 p2, b t2, h t3 t4, b h2 t5"
            " -> b t d"
            if has_gate else
            "s, b t d, w1 w2, q1 q2, o1 o2, p1 p2, b t2, h t3 t4 -> b t d"
            if has_ab else
            "s, b t d, w1 w2, q1 q2, o1 o2, p1 p2, b t2 -> b t d"
        ),
    )
    return call


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _fused_nograd(x, wqkv, bqkv, wo, bo, bias, attn_bias, attn_gate, seed,
                  heads_per_group, groups, keep_thresh, inv_keep, interpret):
    if jax.device_count() > 1:
        ab = () if attn_bias is None else (attn_bias,)
        if attn_gate is not None:
            ab = ab + (attn_gate,)
        return _partitioned_fwd(
            heads_per_group, groups, keep_thresh, inv_keep, interpret,
            has_ab=attn_bias is not None,
            has_gate=attn_gate is not None,
        )(seed, x, wqkv, bqkv, wo, bo, bias, *ab)
    return _pallas_fwd(x, wqkv, bqkv, wo, bo, bias, seed, heads_per_group,
                       groups, keep_thresh, inv_keep, interpret,
                       attn_bias=attn_bias, attn_gate=attn_gate)


def _fused_fwd(x, wqkv, bqkv, wo, bo, bias, attn_bias, attn_gate, seed,
               heads_per_group, groups, keep_thresh, inv_keep, interpret):
    return (
        _fused_nograd(x, wqkv, bqkv, wo, bo, bias, attn_bias, attn_gate,
                      seed, heads_per_group, groups, keep_thresh, inv_keep,
                      interpret),
        None,
    )


def _fused_bwd(heads_per_group, groups, keep_thresh, inv_keep, interpret,
               res, g):
    raise NotImplementedError(
        "fused_attention_block is forward-only (frozen-tower path); "
        "use fused_attention_block_vjp (nn/fused_attention_block_vjp.py) "
        "for trainable towers / trainable inputs"
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
    attn_bias: Optional[jnp.ndarray] = None,
    attn_gate: Optional[jnp.ndarray] = None,
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
      attn_bias: optional per-head additive attention bias, (T, T),
        (1, T, T) or (H, T, T), shared across the batch (causal mask,
        WavLM-style relative position bias). Rides resident in VMEM.
      attn_gate: optional (B, H, T) multiplicative gate on `attn_bias`
        (WavLM's gated relative position bias factorizes as
        gate(b,h,q) * shared(h,q,k)); when given, the resident bias is
        kept bf16 so gate+bias fit the VMEM budget at WavLM shapes.

    Falls back to the XLA path (identical math through
    `dot_product_attention`) off-TPU and beyond the VMEM budget.
    """
    b, t, d = x.shape
    dh = d // n_heads
    scale = 1.0 / float(dh) ** 0.5

    on_tpu = jax.default_backend() == "tpu"
    tp_est = _round_up(t, 16)
    ab_bytes = 0
    if attn_bias is not None:
        per_elt = 2 if attn_gate is not None else 4
        ab_bytes = tp_est * _round_up(tp_est, 128) * per_elt
    groups = _pick_groups(b, t, d, dh, n_heads, jnp.dtype(dtype).itemsize,
                          ab_bytes_per_head=ab_bytes)
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
            )[None]                                  # (1, H|1, T, T)
            if attn_gate is not None:
                ab4 = attn_gate.astype(jnp.float32)[:, :, :, None] * ab4
            bias4 = ab4 if bias4 is None else bias4 + ab4
        out = dot_product_attention(
            split(q), split(k), split(v), bias=bias4,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            deterministic=deterministic,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return out @ wo.astype(dtype) + bo.astype(dtype)

    # fold the 1/sqrt(dh) q-scale into Wq/bq (free, trace-time). Columns
    # are laid out HEAD-GROUP-MAJOR: group g's block is [q_g | k_g | v_g]
    # of width 3*D/G, so the per-group kernel reads one contiguous
    # (D, 3*Dg) weight block (resident across the batch at grid (G, B)).
    dg = d // groups
    wq_s, bq_s = wq * scale, bq * scale
    w_parts, b_parts = [], []
    for g in range(groups):
        sl = slice(g * dg, (g + 1) * dg)
        w_parts += [wq_s[:, sl], wk[:, sl], wv[:, sl]]
        b_parts += [bq_s[sl], bk[sl], bv[sl]]
    wqkv = jnp.concatenate(w_parts, axis=1).astype(dtype)   # (D, 3D)
    bqkv = jnp.concatenate(b_parts).astype(jnp.float32)
    bqkv = bqkv.reshape(groups, 3 * dg)                     # (G, 3*Dg) rows
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
    ab = None
    gate = None
    if attn_bias is not None:
        # bf16 bias under gating: the gated (WavLM) configuration carries a
        # (12, 336, 336) resident block — fp32 would break the VMEM budget
        # at exactly those shapes; the bias is added to fp32 scores, so the
        # only loss is the bias's own bf16 rounding (PARITY.md)
        ab_dtype = jnp.bfloat16 if attn_gate is not None else jnp.float32
        ab = jnp.broadcast_to(
            attn_bias.reshape((1,) * (3 - attn_bias.ndim) + attn_bias.shape),
            (n_heads, t, t),
        ).astype(ab_dtype)
        if pad_t:
            # padded key columns already carry -inf from the key bias; pad
            # the per-head bias with zeros on both axes
            ab = jnp.pad(ab, ((0, 0), (0, pad_t), (0, pad_t)))
    if attn_gate is not None:
        gate = attn_gate.astype(jnp.float32)
        if pad_t:
            gate = jnp.pad(gate, ((0, 0), (0, 0), (0, pad_t)))

    if dropout_rate > 0.0 and not deterministic:
        assert dropout_rng is not None
        keep = 1.0 - float(dropout_rate)
        keep_thresh = min(int(round(keep * 2.0 ** 32)), 2 ** 32 - 1)
        inv_keep = 1.0 / keep
        seed = _seed_from_key(dropout_rng)
    else:
        keep_thresh, inv_keep = None, 1.0
        seed = jnp.zeros((1,), jnp.int32)

    out = _fused_nograd(xc, wqkv, bqkv, wo_c, bo_c, bias, ab, gate, seed,
                        n_heads // groups, groups, keep_thresh, inv_keep,
                        interpret)
    if pad_t:
        out = out[:, :t, :]
    if groups > 1:
        # per-head context came back in (B, T, D) head order; the
        # out-projection runs in XLA (full-rate plain matmul) — fusing it
        # would keep Wo resident on top of the group weight block, past
        # VMEM exactly for the D >= 1024 configs that need grouping.
        # (No stop_gradient: accidental differentiation must keep hitting
        # the erroring custom_vjp, not silently zero the x-cotangent.)
        out = out @ wo_c + bo.astype(dtype)
    return out
