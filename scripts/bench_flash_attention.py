#!/usr/bin/env python3
"""Measure Pallas flash attention vs the XLA attention path on real hardware.

VERDICT round-1 task 3: flash attention must either be shown to win in a
measured regime or be demoted from the PARITY additive-capability list.
The reference regime (HuBERT, <=320 frames after 320x downsampling of 6.4 s
crops) is short-sequence; flash attention targets long-audio use. This
script times both paths at the reference length and at long-audio lengths.

Usage: python scripts/bench_flash_attention.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=5, chain=10):
    """Chained timing: `chain` async dispatches per sync — a single float()
    costs a ~33 ms tunnel RTT on the axon backend."""
    float(fn(*args))  # compile + sync (axon: float() forces host sync)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(chain)]
        float(outs[-1])
        times.append((time.perf_counter() - t0) / chain)
    return min(times)


def main():
    from speechclip_plus_tpu.nn.attention import dot_product_attention
    from speechclip_plus_tpu.nn.flash import flash_attention

    print(f"device: {jax.devices()[0].device_kind}")
    H, DH = 12, 64
    for B, T in [(128, 320), (16, 1024), (8, 3072)]:
        rng = np.random.RandomState(0)
        shape = (B, H, T, DH)
        q = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)

        @jax.jit
        def xla_fwd_bwd(q, k, v):
            def f(q, k, v):
                o = dot_product_attention(q, k, v)
                return (o.astype(jnp.float32) ** 2).sum()
            return sum(
                g.astype(jnp.float32).sum()
                for g in jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            )

        @jax.jit
        def flash_fwd_bwd(q, k, v):
            def f(q, k, v):
                o = flash_attention(q, k, v, None)
                return (o.astype(jnp.float32) ** 2).sum()
            return sum(
                g.astype(jnp.float32).sum()
                for g in jax.grad(f, argnums=(0, 1, 2))(q, k, v)
            )

        t_xla = timed(xla_fwd_bwd, q, k, v)
        try:
            t_flash = timed(flash_fwd_bwd, q, k, v)
        except Exception as e:
            print(f"B={B} T={T}: flash failed: {e!r}")
            continue
        print(f"B={B:4d} T={T:5d}: xla {t_xla * 1e3:8.2f} ms | "
              f"flash {t_flash * 1e3:8.2f} ms | "
              f"flash/xla {t_flash / t_xla:5.2f}x")


if __name__ == "__main__":
    main()
