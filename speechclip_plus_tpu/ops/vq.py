"""Vector quantization onto the CLIP subword codebook.

Reference semantics: ``avssl/module/speechclip_c_modules/my_vector_quantizer.py:12-165``
(SimpleVectorQuantizer): input is a (B, T, V) matrix of cosine scores against
the CLIP token-embedding table; special-token columns are masked to -inf;
training uses Gumbel-softmax or straight-through softmax at a temperature
(fixed / learnable / exp-decay scheduled); eval uses the hard one-hot; the op
also reports codebook statistics (code/prob perplexity, per-timestep entropy)
and a diversity loss.

TPU-native: one pure jit-safe function, straight-through via stop_gradient
algebra, RNG passed explicitly for Gumbel noise.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "simple_vector_quantizer",
    "scheduled_temperature",
    "st_codebook_matmul",
]

_MASK_VALUE = -1e30


# ------------------------------------------------------- fused ST matmul ----
#
# The straight-through path `out = onehot(argmax) + soft - stop_gradient(soft)`
# followed by `keywords = out @ codebook` (reference
# ``my_vector_quantizer.py:138-141`` + ``kw_branches.py:195``) has
# `codebook[argmax]` as its forward value — the +soft/-soft pair cancels up
# to one ulp of the `(1 + soft_k) - soft_k` rounding (for fp32 scores the
# winner's coefficient lands at 1 ± 2^-24 instead of exactly 1; the gather
# form is the estimator's idealized value). Naive AD materializes the
# (B*T, V) softmax, the ST combine, and a dense one-hot matmul, plus a
# softmax-jacobian backward over the same buffers. This custom_vjp computes
# the forward as a gather and the analytically identical backward in fp32:
#
#   z = s / t,  p = softmax(z),  u = g @ codebook^T,  rho = sum(p * u, -1)
#   ds = p * (u - rho) / t
#   dcodebook = onehot(argmax)^T @ g (the one-hot transpose, as a dense matmul)
#   dt = sum(p * (u - rho) * (-s / t^2))
#
# eliminating every (B*T, V) HBM round trip the estimator forced on XLA.


def _st_fwd_value(scores: jnp.ndarray, codebook: jnp.ndarray, temp: jnp.ndarray):
    # reduce over a 2-D view: XLA's reduce/elementwise lowering over the
    # 3-D (B, T, V) layout is ~10x slower on v5e (57.7 vs 5.9 ms for a
    # softmax at (128, 75, 8112)); the same holds for argmax
    flat = scores.reshape(-1, scores.shape[-1])
    k = jnp.argmax(flat, axis=-1)
    out = jnp.take(codebook, k, axis=0).astype(jnp.float32)
    return out.reshape(scores.shape[:-1] + (codebook.shape[-1],))


@jax.custom_vjp
def st_codebook_matmul(
    scores: jnp.ndarray, codebook: jnp.ndarray, temp: jnp.ndarray
) -> jnp.ndarray:
    """Straight-through quantize + codebook reconstruct.

    Forward: ``codebook[argmax(scores, -1)]`` in fp32 — the materialized
    ``(onehot + softmax(scores/temp) - sg(softmax)) @ codebook`` up to one
    ulp of float cancellation. Backward: the straight-through estimator's
    exact gradient.

    Args:
      scores: (..., V) masked cosine scores (special columns at -1e30).
      codebook: (V, D) embedding table (storage dtype preserved in values).
      temp: scalar softmax temperature (differentiable if learnable).

    Returns:
      (..., D) fp32 reconstructed keywords.
    """
    return _st_fwd_value(scores, codebook, temp)


def _st_cm_fwd(scores, codebook, temp):
    return _st_fwd_value(scores, codebook, temp), (scores, codebook, temp)


def _st_cm_bwd(res, g):
    scores, codebook, temp = res
    V = scores.shape[-1]
    D = g.shape[-1]
    # ALL (..., V) math on 2-D views — the 3-D (B, T, V) layout lowers
    # elementwise+reduce ~10x slower on v5e (measured 57.7 vs 5.9 ms for
    # this softmax at (128, 75, 8112)); the two reshapes at the edges are
    # the only relayout copies.
    s = scores.reshape(-1, V).astype(jnp.float32)
    g2 = g.reshape(-1, D).astype(jnp.float32)
    t = jnp.asarray(temp, jnp.float32)
    cb = codebook.astype(jnp.float32)
    p = jax.nn.softmax(s / t, axis=-1)
    u = jax.lax.dot_general(
        g2, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, V) = g @ codebook^T
    rho = jnp.sum(p * u, axis=-1, keepdims=True)
    dz = p * (u - rho)  # dL/d(s/t)
    ds = (dz / t).astype(scores.dtype).reshape(scores.shape)
    # one-hot transpose as a DENSE fp32 matmul: onehot(k)^T @ g (~3 ms at
    # (9600, 8112) on v5e; a `.at[k].add` scatter lowers to a serialized
    # loop on TPU). fp32 one-hot keeps the row sums exact.
    k = jnp.argmax(s, axis=-1)
    onehot = jax.nn.one_hot(k, V, dtype=jnp.float32)
    dcb = jax.lax.dot_general(
        onehot, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(codebook.dtype)
    dt = jnp.sum(dz * (-s / (t * t))).astype(jnp.float32).reshape(jnp.shape(temp))
    return ds, dcb, dt


st_codebook_matmul.defvjp(_st_cm_fwd, _st_cm_bwd)


def scheduled_temperature(
    max_temp: float, min_temp: float, decay: float, num_updates: jnp.ndarray
) -> jnp.ndarray:
    """Exp-decay temperature schedule (reference ``my_vector_quantizer.py:58-62``)."""
    return jnp.maximum(max_temp * decay ** num_updates.astype(jnp.float32), min_temp)


def simple_vector_quantizer(
    x: jnp.ndarray,
    *,
    temp: jnp.ndarray,
    prob_msk: Sequence[int] = (0, 2, 3),
    training: bool = False,
    use_gumbel: bool = False,
    hard: bool = True,
    rng: Optional[jax.Array] = None,
    ground_truth_perplexity: Optional[float] = None,
    produce_targets: bool = True,
    time_first: bool = True,
    codebook: Optional[jnp.ndarray] = None,
    fused_st: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Quantize codeword logits onto a discrete codebook.

    Args:
      x: (B, T, V) logits (cosine scores vs the codebook).
      temp: scalar softmax temperature.
      prob_msk: codebook ids excluded from selection (CLIP special tokens).
      training: straight-through/Gumbel relaxation vs hard one-hot.
      use_gumbel: sample Gumbel noise (requires ``rng``).
      hard: straight-through hard one-hot in the forward pass.
      rng: PRNG key for Gumbel sampling.
      ground_truth_perplexity: optional target for the diversity loss.
      codebook: optional (V, D) embedding table; when given the op also
        returns ``keywords = subword_prob @ codebook`` (fp32), using the
        fused straight-through form (gather forward / analytic backward —
        see ``st_codebook_matmul``) whenever ``fused_st`` and the
        hard/eval path applies.
      fused_st: disable to force the materialized einsum (A/B harness).

    Returns:
      dict with ``subword_prob`` (B, T, V), ``targets`` (B, T, 1),
      ``code_perplexity``, ``prob_perplexity``, ``ent_per_t`` (T,),
      ``diversity_loss``, ``temp``, ``num_vars``
      (+ ``keywords`` (B, T, D) when ``codebook`` is given).
    """
    if not time_first:
        x = jnp.swapaxes(x, 1, 2)
    B, T, V = x.shape
    result: Dict[str, jnp.ndarray] = {"num_vars": jnp.asarray(V)}

    # mask special-token columns on the 2-D view (3-D elementwise ops over
    # (B, T, V) lower ~10x slower on v5e — see _st_cm_bwd)
    flat = x.reshape(B * T, V)
    if len(prob_msk) > 0:
        col = jnp.arange(V)
        special = jnp.isin(col, jnp.asarray(list(prob_msk)))
        flat = jnp.where(special[None, :], _MASK_VALUE, flat)

    k = jnp.argmax(flat, axis=-1)
    hard_x = jax.nn.one_hot(k, V, dtype=flat.dtype)

    # --- logging statistics --------------------------------------------
    # The reference logs (never backprops) every statistic below: the
    # training loss is contrastive (+ CIF quantity), and `diversity_loss`
    # is computed but not added (`kwClip.py:929-948`, only
    # temp/perplexities/ent_per_t reach log_metrics). Computing them on a
    # stop_gradient input keeps the values identical while freeing XLA
    # from building a second softmax backward over the (B*T, V) buffers —
    # measured 61 ms -> fraction of that at (128, 75, 8112) on v5e.
    flat_sg = jax.lax.stop_gradient(flat).astype(jnp.float32)

    # codebook perplexity from hard assignments: a bincount of k — same
    # value as one_hot(k).mean(0) without reducing a (B*T, V) fp32 buffer
    hard_probs = (
        jnp.zeros((V,), jnp.float32)
        .at[k].add(1.0, mode="drop")
        / jnp.float32(B * T)
    )
    result["code_perplexity"] = jnp.exp(
        -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)
    )

    soft_all = jax.nn.softmax(flat_sg, axis=-1)
    avg_probs = soft_all.mean(axis=0)
    result["prob_perplexity"] = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)
    )

    # per-timestep entropy, reduced over V then averaged over the batch —
    # same value as the reference's (T, B, V) transpose layout
    # (`my_vector_quantizer.py:110-118`) without materializing the
    # transposed copy.
    ent = -jnp.sum(soft_all * jnp.log(soft_all + 1e-9), axis=-1)  # (B*T,)
    result["ent_per_t"] = ent.reshape(B, T).mean(axis=0)

    result["temp"] = jnp.asarray(temp, dtype=jnp.float32)

    # argmax of the (eventual) `out`, tracked alongside so `targets` never
    # re-argmaxes the (B*T, V) buffer: for the non-gumbel paths the
    # temperature softmax is monotone in the logits, so argmax(out) == k
    # (hard forward value IS hard_x: soft - stop_gradient(soft) is exactly
    # zero); only Gumbel noise can change the winner.
    out_k = k
    # the fused straight-through form applies whenever the forward value of
    # `out` is exactly the hard one-hot: the ST training path and eval
    use_fused = (
        fused_st
        and codebook is not None
        and ((not training) or (hard and not use_gumbel))
    )
    if training:
        if use_gumbel:
            assert rng is not None, "Gumbel sampling requires an rng key"
            gumbel = -jnp.log(
                -jnp.log(jax.random.uniform(rng, flat.shape, minval=1e-10, maxval=1.0))
            )
            soft = jax.nn.softmax(
                (flat.astype(jnp.float32) + gumbel) / temp, axis=-1
            ).astype(flat.dtype)
            out_k = jnp.argmax(soft, axis=-1)
            if hard:
                g_hard = jax.nn.one_hot(out_k, V, dtype=flat.dtype)
                out = g_hard + soft - jax.lax.stop_gradient(soft)
            else:
                out = soft
        elif hard and use_fused:
            # keywords take the fused custom_vjp below; subword_prob's
            # forward value under ST is the hard one-hot (the
            # +soft/-sg(soft) pair cancels to within one ulp), and nothing
            # differentiates through subword_prob itself (stats are
            # stop_gradient, the loss consumes keywords), so the softmax is
            # never built here
            out = hard_x
        else:
            soft = jax.nn.softmax(flat.astype(jnp.float32) / temp, axis=-1).astype(
                flat.dtype
            )
            if hard:
                # straight-through: forward = hard one-hot, backward = soft
                out = hard_x + soft - jax.lax.stop_gradient(soft)
            else:
                out = soft
    else:
        out = hard_x

    result["subword_prob"] = out.reshape(B, T, V)

    if codebook is not None:
        if use_fused and training:
            result["keywords"] = st_codebook_matmul(
                flat.reshape(B, T, V), codebook, temp
            )
        elif use_fused:
            # eval: hard one-hot @ codebook is a gather
            result["keywords"] = jnp.take(codebook, k, axis=0).astype(
                jnp.float32
            ).reshape(B, T, codebook.shape[-1])
        else:
            result["keywords"] = jnp.einsum(
                "btv,vd->btd",
                result["subword_prob"],
                codebook,
                preferred_element_type=jnp.float32,
            )

    num_vars_f = jnp.float32(V)
    if ground_truth_perplexity is not None:
        result["diversity_loss"] = (
            (result["prob_perplexity"] - ground_truth_perplexity) ** 2
        ) / (num_vars_f - ground_truth_perplexity) ** 2
    else:
        result["diversity_loss"] = (num_vars_f - result["prob_perplexity"]) / num_vars_f

    if produce_targets:
        result["targets"] = jax.lax.stop_gradient(out_k.reshape(B, T, 1))

    return result
