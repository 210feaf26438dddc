#!/usr/bin/env python3
"""Standalone A/B + on-chip dropout validation of the fused attention BLOCK
kernel (nn/fused_attention_block.py): QKV proj -> per-head attention with
in-kernel dropout -> out proj, consumed/produced in native (B, T, D) layout.

Chains L layer-shaped calls per timed step (mimics the stack, amortizes
dispatch) against the XLA reference path. Also validates the kernel's
hardware-PRNG dropout statistics, which CPU interpret tests cannot cover:

  - inverted-dropout scaling: regressing train-mode outputs on
    deterministic outputs over many keys must give slope ~1.0
  - drop fraction: with a one-hot value probe, the per-position keep rate
    must match 1-p

The authoritative in-model number comes from
`scripts/ab_product_step.py --knob fused_attention_block` (same-session
ABA through the product step); this script isolates the kernel.

Usage: python scripts/bench_attention_block.py [--batch 128] [--d 768]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from speechclip_plus_tpu.utils.timing import sync_value as jax_block  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=320)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--p", type=float, default=0.1)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speechclip_plus_tpu.nn.attention import dot_product_attention
    from speechclip_plus_tpu.nn.fused_attention_block import (
        fused_attention_block,
    )
    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    B, T, D, H, L, p = (args.batch, args.t, args.d, args.heads, args.layers,
                        args.p)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D) * 0.1, jnp.bfloat16)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * (1.0 / np.sqrt(s[0])),
                                jnp.bfloat16)
    params = [
        dict(wq=mk(D, D), bq=mk(D), wk=mk(D, D), bk=mk(D), wv=mk(D, D),
             bv=mk(D), wo=mk(D, D), bo=mk(D))
        for _ in range(L)
    ]
    lens = np.linspace(T // 2, T, B).astype(int)
    bias = jnp.asarray(
        np.where(np.arange(T)[None, :] >= lens[:, None], -1e30, 0.0),
        jnp.float32,
    )

    def chain_fused(x, key, deterministic):
        for i, pr in enumerate(params):
            x = fused_attention_block(
                x, pr["wq"], pr["bq"], pr["wk"], pr["bk"], pr["wv"],
                pr["bv"], pr["wo"], pr["bo"], bias, n_heads=H,
                dropout_rate=p, dropout_rng=jax.random.fold_in(key, i),
                deterministic=deterministic, dtype=jnp.bfloat16,
            )
        return x

    def chain_xla(x, key, deterministic):
        for i, pr in enumerate(params):
            h = x
            q = h @ pr["wq"] + pr["bq"]
            k = h @ pr["wk"] + pr["bk"]
            v = h @ pr["wv"] + pr["bv"]
            sp = lambda a: a.reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
            o = dot_product_attention(
                sp(q), sp(k), sp(v), bias=bias[:, None, None, :],
                dropout_rate=p,
                dropout_rng=jax.random.fold_in(key, i),
                deterministic=deterministic,
            )
            x = o.transpose(0, 2, 1, 3).reshape(B, T, D) @ pr["wo"] + pr["bo"]
        return x

    f_fused = jax.jit(lambda x, k: chain_fused(x, k, False))
    f_xla = jax.jit(lambda x, k: chain_xla(x, k, False))
    f_fused_det = jax.jit(lambda x, k: chain_fused(x, k, True))

    key = jax.random.PRNGKey(0)

    def bench(fn, label):
        jax_block(fn(x, key))  # compile
        t0 = time.perf_counter()
        out = x
        for i in range(args.iters):
            out = fn(out, jax.random.fold_in(key, i))
        jax_block(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label}: {dt:.1f} ms / {L}-layer chain", flush=True)
        return dt

    print(f"B={B} T={T} D={D} H={H} p={p} L={L} "
          f"device={jax.devices()[0].device_kind}")
    t_xla = bench(f_xla, "XLA path   (train, dropout)")
    t_fused = bench(f_fused, "fused block (train, dropout)")
    print(f"speedup: {t_xla / t_fused:.2f}x")

    # ---- on-chip dropout statistics -------------------------------------
    det = np.asarray(f_fused_det(x, key), np.float32)
    outs = np.stack([
        np.asarray(f_fused(x, jax.random.PRNGKey(100 + i)), np.float32)
        for i in range(24)
    ])
    mean_train = outs.mean(axis=0)
    valid = np.arange(T)[None, :] < lens[:, None]
    a = mean_train[valid].ravel()
    b = det[valid].ravel()
    slope = float((a @ b) / (b @ b))
    print(f"inverted-dropout regression slope (train-mean ~ det): "
          f"{slope:.4f} (expect ~1.0)")
    assert 0.9 < slope < 1.1, slope

    # keep-rate probe on a single layer: one-hot value rows make the
    # attention output expose which probabilities were kept
    pr = params[0]
    probe = fused_attention_block(
        x, pr["wq"], pr["bq"], pr["wk"], pr["bk"], pr["wv"], pr["bv"],
        jnp.eye(D, dtype=jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16),
        bias, n_heads=H, dropout_rate=p,
        dropout_rng=jax.random.PRNGKey(7), deterministic=False,
        dtype=jnp.bfloat16,
    )
    det_probe = fused_attention_block(
        x, pr["wq"], pr["bq"], pr["wk"], pr["bk"], pr["wv"], pr["bv"],
        jnp.eye(D, dtype=jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16),
        bias, n_heads=H, dropout_rate=0.0, deterministic=True,
        dtype=jnp.bfloat16,
    )
    ratio = float(
        np.asarray(probe, np.float32)[valid].sum()
        / np.asarray(det_probe, np.float32)[valid].sum()
    )
    print(f"kept mass ratio (train/det, inverted scaling): {ratio:.4f} "
          f"(expect ~1.0)")
    assert 0.95 < ratio < 1.05, ratio
    print("dropout statistics OK")


if __name__ == "__main__":
    main()
