"""Fused cosine-score -> VQ statistics -> straight-through backward kernel.

SURVEY §7 step 9's prescription ("fuse cosine-score + VQ + codebook matmul
— one Pallas kernel over the 8k-row reduced vocab"), taken through the
backward pass. Reference semantics being fused:
`avssl/model/kw_branches.py:158-197` (cosine score vs the token embedding,
then SimpleVectorQuantizer) + `my_vector_quantizer.py:93-141` (softmax
statistics + straight-through estimator).

The XLA path (ops/vq.py) materializes the (B*T, V) fp32 score buffer
(311 MB at base shapes), reads it for the masked argmax, reads it again
for the statistics softmax (materializing soft_all, another 311 MB), and
the ST backward re-builds softmax(s/t) from it. This kernel keeps the
normalized codebook RESIDENT in VMEM (bf16 (V, D): 8.4 MB for the
512-wide reduced-vocab table) and streams row blocks of keywords past it,
so no (N, V) tensor ever exists in HBM:

  forward  (per row block R):
      s   = x_norm @ en^T        fp32, in VMEM only
      mask special columns (CLIP ids {0,2,3}) and the V->V_pad tail
      k   = argmax(s)            -> (N,) winners
      p   = softmax(s)           -> ent (N,), avg_probs (V,) accumulated
      (keywords = emb[k] is a gather, done outside in XLA)

  backward (straight-through estimator, `ops/vq.st_codebook_matmul` math):
      u   = (g @ en^T) * ||emb||     # == g @ emb^T : emb_v = ||emb_v|| en_v
      p   = softmax(s / t)           # s recomputed in VMEM
      dz  = p * (u - rho),  rho = sum(p * u)
      dxn = (dz / t) @ en            # accumulated per block
      dt  = sum(dz * (-s / t^2))     # learnable-temperature cotangent

The ||emb|| factorization is what lets ONE resident table serve both the
cosine scores (normalized rows) and the ST gradient (raw rows) — two
resident tables would not fit VMEM.

`d(codebook)` is NOT produced: the token embedding is frozen in every
reference configuration (the model stop-gradients it,
models/kwclip.py:867-869); callers that train the codebook must use the
XLA path (the wrapper enforces this).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_cosine_vq_available", "fused_cosine_vq"]

_MASK_VALUE = -1e30
# this kernel's resident set is one (V_pad, D) bf16 table + a few (R, V_pad)
# fp32 tiles; R adapts down before giving up, so the budget can sit closer
# to the physical ~16 MB than the attention kernel's 14 MB
_VMEM_BUDGET_BYTES = 15 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan(n: int, d: int, v_pad: int, itemsize: int):
    """Pick (R_fwd, R_bwd) row-block sizes, or None if the resident table
    alone breaks the budget."""
    table = v_pad * d * itemsize + v_pad * 4  # en + norms
    if table + 2 * v_pad * 4 > _VMEM_BUDGET_BYTES:
        return None
    def pick(tiles):
        # floor at 32 rows: thinner blocks leave the MXU's 128-row tile
        # mostly idle and the matmuls dominate this op — below that the
        # XLA fallback is the better program
        for r in (256, 128, 64, 32):
            if n % r:
                continue
            if table + tiles * r * v_pad * 4 + 4 * r * d * itemsize \
                    <= _VMEM_BUDGET_BYTES:
                return r
        return None
    r_fwd = pick(1.5)   # s + small stats scratch
    r_bwd = pick(3.0)   # s, u, dz live together
    if r_fwd is None or r_bwd is None:
        return None
    return r_fwd, r_bwd


def fused_cosine_vq_available(n: int, d: int, v: int,
                              itemsize: int = 2) -> bool:
    return _plan(n, d, _round_up(v, 128), itemsize) is not None


def _fwd_kernel(x_ref, en_ref, mask_ref, k_ref, ent_ref, stats_ref):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    x = x_ref[0]                                     # (R, D)
    s = jax.lax.dot_general(
        x, en_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (R, V_pad)
    s = jnp.where(mask_ref[0] != 0, _MASK_VALUE, s)
    # k/ent ride as full resident (n_blocks, R) outputs (Mosaic forbids
    # (1, R) blocks: second-minor must divide 8); each program writes its
    # own row
    k_ref[pid, :] = jnp.argmax(s, axis=-1).astype(jnp.int32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)                               # masked cols -> 0
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = e / z
    # ent = -sum p log p = log z - sum(e * (s - m)) / z
    ent_ref[pid, :] = (
        jnp.log(z[:, 0]) - jnp.sum(e * (s - m), axis=-1) / z[:, 0]
    )
    colsum = jnp.sum(p, axis=0, keepdims=True)       # (1, V_pad)

    @pl.when(pid == 0)
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    stats_ref[...] += colsum


def _bwd_kernel(x_ref, g_ref, en_ref, norms_ref, mask_ref, t_ref,
                dx_ref, dt_ref):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    x = x_ref[0]
    g = g_ref[0]
    t = t_ref[...]                                   # (1,1), broadcasts
    s = jax.lax.dot_general(
        x, en_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(mask_ref[0] != 0, _MASK_VALUE, s)
    u = jax.lax.dot_general(
        g, en_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * norms_ref[0]                                 # u = g @ emb^T
    st = s / t
    m = jnp.max(st, axis=-1, keepdims=True)
    e = jnp.exp(st - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    rho = jnp.sum(p * u, axis=-1, keepdims=True)
    dz = p * (u - rho)
    dx_ref[0] = jax.lax.dot_general(
        (dz / t).astype(en_ref.dtype), en_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    @pl.when(pid == 0)
    def _init():
        dt_ref[...] = jnp.zeros_like(dt_ref)

    # dz is exactly 0 on masked columns (p underflows to 0), so the huge
    # masked s never contributes. (1,1)-shaped store: Mosaic rejects
    # scalar VMEM stores.
    dt_ref[...] += jnp.sum(dz * (-s / (t * t))).reshape(1, 1)


def _pad_table(en: jnp.ndarray, norms: jnp.ndarray, v_pad: int):
    v = en.shape[0]
    if v_pad != v:
        en = jnp.pad(en, ((0, v_pad - v), (0, 0)))
        norms = jnp.pad(norms, (0, v_pad - v))
    return en, norms


def _col_mask(v: int, v_pad: int, prob_msk: Sequence[int]) -> np.ndarray:
    mask = np.zeros((1, v_pad), np.int32)
    mask[0, v:] = 1
    for i in prob_msk:
        if 0 <= int(i) < v:
            mask[0, int(i)] = 1
    return mask


def _pallas_fwd_call(xn, en, mask, r, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = xn.shape
    v_pad = en.shape[0]
    grid = (n // r,)
    vmem = pltpu.VMEM
    out_shapes = [
        jax.ShapeDtypeStruct((n // r, r), jnp.int32),      # k
        jax.ShapeDtypeStruct((n // r, r), jnp.float32),    # ent
        jax.ShapeDtypeStruct((1, v_pad), jnp.float32),     # sum of p rows
    ]
    k2, ent2, psum = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, d), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((v_pad, d), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=[
            pl.BlockSpec((n // r, r), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((n // r, r), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=vmem),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(xn.reshape(n // r, r, d), en, mask)
    return k2.reshape(n), ent2.reshape(n), psum[0]


def _pallas_bwd_call(xn, g, en, norms, mask, temp, r, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = xn.shape
    v_pad = en.shape[0]
    grid = (n // r,)
    vmem = pltpu.VMEM
    t = jnp.asarray(temp, jnp.float32).reshape(1, 1)
    dx2, dt = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, d), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, r, d), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((v_pad, d), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, v_pad), lambda i: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=vmem),
        ],
        out_specs=[
            pl.BlockSpec((1, r, d), lambda i: (i, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=vmem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // r, r, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xn.reshape(n // r, r, d), g.reshape(n // r, r, d).astype(xn.dtype),
      en, norms.reshape(1, v_pad), mask, t)
    return dx2.reshape(n, d), dt[0, 0]


def _core(xn, en, mask, r_fwd, interpret, v):
    """Statistics pass (argmax winners, per-row entropy, column prob sums).
    Inputs arrive stop-gradient'd — the XLA path computes the same
    statistics on a stop_gradient basis too (ops/vq.py) — so no VJP
    exists or is needed here."""
    k, ent, psum = _pallas_fwd_call(xn, en, mask, r_fwd, interpret)
    return k, ent, psum[:v]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _st_gather(xn, embf, en, norms, mask, temp, k, r_bwd, interpret):
    """keywords = emb[k] with the straight-through backward into xn (and
    temp). The gather runs in XLA against the exact fp32 table; only the
    backward is the Pallas kernel (which uses the bf16 normalized table +
    the norm factorization)."""
    return jnp.take(embf, k, axis=0)


def _st_gather_fwd(xn, embf, en, norms, mask, temp, k, r_bwd, interpret):
    return (
        _st_gather(xn, embf, en, norms, mask, temp, k, r_bwd, interpret),
        (xn, en, norms, mask, temp, k),
    )


def _st_gather_bwd(r_bwd, interpret, res, g):
    xn, en, norms, mask, temp, k = res
    dx, dt = _pallas_bwd_call(xn, g, en, norms, mask, temp, r_bwd,
                              interpret)
    return (
        dx.astype(xn.dtype),
        # the codebook is frozen in every reference configuration (the
        # wrapper is gated on that); zero cotangents keep AD legal and
        # fold away
        jnp.zeros((en.shape[0], en.shape[1]), jnp.float32),
        jnp.zeros_like(en),
        jnp.zeros_like(norms),
        np.zeros(jnp.shape(mask), dtype=jax.dtypes.float0),
        dt.astype(jnp.float32).reshape(jnp.shape(temp)),
        np.zeros(jnp.shape(k), dtype=jax.dtypes.float0),
    )


_st_gather.defvjp(_st_gather_fwd, _st_gather_bwd)


def fused_cosine_vq(
    xn: jnp.ndarray,
    emb: jnp.ndarray,
    temp: jnp.ndarray,
    *,
    prob_msk: Sequence[int] = (0, 2, 3),
    training: bool = False,
    dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> Optional[dict]:
    """Drop-in fused form of cosine-score + SimpleVectorQuantizer for the
    hard straight-through (and eval) path.

    Args:
      xn: (B, K, D) L2-NORMALIZED keyword vectors (trainable inputs).
      emb: (V, D) raw fp32 token embedding (frozen; also the codebook).
      temp: scalar ST temperature (differentiable if learnable).

    Returns the `simple_vector_quantizer` result dict (+ `keywords`), or
    None when the fused path does not apply (table too wide for VMEM, or
    row count not tileable) — callers fall back to the XLA path.
    """
    B, K, D = xn.shape
    V = emb.shape[0]
    n = B * K
    if jax.default_backend() != "tpu" and not interpret:
        return None
    v_pad = _round_up(V, 128)
    plan = _plan(n, D, v_pad, jnp.dtype(dtype).itemsize)
    if plan is None:
        return None
    r_fwd, r_bwd = plan

    embf = emb.astype(jnp.float32)
    norms = jnp.maximum(jnp.linalg.norm(embf, axis=-1), 1e-8)
    en = (embf / norms[:, None]).astype(dtype)
    en_p, norms_p = _pad_table(en, norms.astype(jnp.float32), v_pad)
    mask = jnp.asarray(_col_mask(V, v_pad, prob_msk))

    flat = xn.reshape(n, D).astype(dtype)
    k, ent, psum = _core(
        jax.lax.stop_gradient(flat), jax.lax.stop_gradient(en_p), mask,
        r_fwd, interpret, V,
    )
    result = {"num_vars": jnp.asarray(V)}
    avg_probs = psum / jnp.float32(n)
    result["prob_perplexity"] = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)
    )
    hard_probs = (
        jnp.zeros((V,), jnp.float32).at[k].add(1.0, mode="drop")
        / jnp.float32(n)
    )
    result["code_perplexity"] = jnp.exp(
        -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)
    )
    result["ent_per_t"] = ent.reshape(B, K).mean(axis=0)
    result["temp"] = jnp.asarray(temp, dtype=jnp.float32)
    result["targets"] = jax.lax.stop_gradient(k.reshape(B, K, 1))
    # one-hot subword_prob exists for API parity; DCE removes it from the
    # train step (nothing differentiates through it — same as ops/vq.py)
    result["subword_prob"] = jax.nn.one_hot(
        k, V, dtype=jnp.float32
    ).reshape(B, K, V)
    num_vars_f = jnp.float32(V)
    result["diversity_loss"] = (
        num_vars_f - result["prob_perplexity"]
    ) / num_vars_f

    if training:
        embf_pad = jnp.pad(embf, ((0, v_pad - V), (0, 0))) \
            if v_pad != V else embf
        kw = _st_gather(flat, embf_pad, en_p, norms_p, mask, temp, k,
                        r_bwd, interpret)
    else:
        kw = jnp.take(embf, k, axis=0)
    result["keywords"] = kw.reshape(B, K, D)
    return result
