#!/usr/bin/env python3
"""A/B the forward-only fused attention+dropout kernel vs the XLA path.

Tower regime (frozen HuBERT, train mode): B=128, H=12, T=320, dh=64,
attention dropout 0.1, bf16. The XLA side pays dropout-mask RNG +
(B,H,T,T) HBM traffic; the kernel generates masks in-VMEM
(`pltpu.prng_random_bits`). Also validates on-chip dropout statistics
(drop fraction, mean preservation) that CPU tests cannot cover.

Usage: python scripts/bench_fused_attention.py [--batch 128] [--t 320]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from speechclip_plus_tpu.utils.timing import sync_value as jax_block, timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=320)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--p", type=float, default=0.1)
    ap.add_argument("--layers", type=int, default=12,
                    help="chain this many attention calls per step "
                         "(mimics the stack; amortizes dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speechclip_plus_tpu.nn.attention import dot_product_attention
    from speechclip_plus_tpu.nn.fused_attention import fused_attention_dropout
    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    B, H, T, dh, L = args.batch, args.heads, args.t, args.dh, args.layers
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, T, dh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, T, dh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, T, dh), jnp.bfloat16)
    lens = rng.randint(T // 2, T + 1, size=(B,))
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias = jnp.where(kpm[:, None, None, :], -1e30, 0.0).astype(jnp.float32)
    key = jax.random.key(0, impl="rbg")

    # k/v/bias ride as ARGUMENTS: closing over them bakes ~60 MB of
    # constants into each executable (390 MB serialized, minutes-slower
    # compiles through the axon tunnel)
    @jax.jit
    def xla_stack(eps, q, k, v, bias, key):
        x = q + eps.astype(q.dtype)
        for i in range(L):
            x = dot_product_attention(
                x, k, v, bias=bias, dropout_rate=args.p,
                dropout_rng=jax.random.fold_in(key, i), deterministic=False,
            )
        return x.astype(jnp.float32).sum() * 1e-20

    @jax.jit
    def fused_stack(eps, q, k, v, bias, key):
        x = q + eps.astype(q.dtype)
        for i in range(L):
            x = fused_attention_dropout(
                x, k, v, bias, dropout_rate=args.p,
                dropout_rng=jax.random.fold_in(key, i), deterministic=False,
            )
        return x.astype(jnp.float32).sum() * 1e-20

    @jax.jit
    def xla_nodrop(eps, q, k, v, bias):
        x = q + eps.astype(q.dtype)
        for _ in range(L):
            x = dot_product_attention(x, k, v, bias=bias)
        return x.astype(jnp.float32).sum() * 1e-20

    @jax.jit
    def fused_nodrop(eps, q, k, v, bias):
        x = q + eps.astype(q.dtype)
        for _ in range(L):
            x = fused_attention_dropout(x, k, v, bias)
        return x.astype(jnp.float32).sum() * 1e-20

    res = {}
    res[f"xla_dropout_x{L}"] = timed(xla_stack, q, k, v, bias, key)
    res[f"fused_dropout_x{L}"] = timed(fused_stack, q, k, v, bias, key)
    res[f"xla_nodrop_x{L}"] = timed(xla_nodrop, q, k, v, bias)
    res[f"fused_nodrop_x{L}"] = timed(fused_nodrop, q, k, v, bias)
    for name, t in res.items():
        print(f"{name:24s} {t * 1e3:8.3f} ms")
    print(f"speedup (dropout): {res[f'xla_dropout_x{L}'] / res[f'fused_dropout_x{L}']:.3f}x")
    print(f"speedup (nodrop):  {res[f'xla_nodrop_x{L}'] / res[f'fused_nodrop_x{L}']:.3f}x")

    # ---- on-chip dropout statistics --------------------------------------
    @jax.jit
    def one(q, key):
        return fused_attention_dropout(
            q, k, v, bias, dropout_rate=args.p, dropout_rng=key,
            deterministic=False,
        )

    det = jax.jit(lambda q: fused_attention_dropout(q, k, v, bias))(q)
    out = one(q, key)
    # each output element is a weighted sum over T keys with iid kept
    # weights; E[out] = det. Check the batch-mean ratio and the
    # zero-fraction of the dropout mask indirectly via variance increase.
    det_np = np.asarray(det, np.float32)
    out_np = np.asarray(out, np.float32)
    # regression slope <out,det>/<det,det>: E[out|det]=det elementwise, so
    # the slope is ~1 under correct inverted-dropout scaling. (A ratio of
    # the two global means is a junk statistic here — both means are ~0.)
    slope = (out_np * det_np).mean() / (det_np * det_np).mean()
    print(f"regression slope out~det (expect ~1): {slope:.4f}")
    # direct mask statistics: attend a single one-hot value vector so the
    # output IS the dropped attention row
    v_probe = jnp.ones_like(v)
    probe = jax.jit(
        lambda key: fused_attention_dropout(
            q, k, v_probe, bias, dropout_rate=args.p, dropout_rng=key,
            deterministic=False,
        )
    )(key)
    # sum over keys of w * keep/(1-p): expectation 1 per row
    row = np.asarray(probe, np.float32)
    print(f"row-sum mean (expect ~1.0): {row.mean():.4f}  std {row.std():.4f}")


if __name__ == "__main__":
    main()
