#!/usr/bin/env python3
"""On-chip validation + A/B for the differentiable fused attention block
(nn/fused_attention_block_vjp.py) at the branch self-attention's product
shapes (B=128, T=321, D=768/1024, H=8, p=0.1, bf16).

Modes:
  --check   dropout-path gradient check (finite differences vs the custom
            backward, same PRNG seed both sides) + p=0 value/grad parity vs
            the XLA path, ON HARDWARE (the in-kernel PRNG has no CPU
            interpreter rule).
  (default) chained-timing A/B of MHA+residual+LN fwd+bwd: XLA vs kernel.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=321)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    import jax
    import jax.numpy as jnp

    from speechclip_plus_tpu.nn.attention import dot_product_attention
    from speechclip_plus_tpu.nn.fused_attention_block_vjp import (
        fused_attention_block_vjp,
    )

    if args.check:
        # FD numerators are ~1e-3 of |f|; TPU's default fp32 matmul
        # precision (bf16 passes) adds rounding noise of the same order
        jax.config.update("jax_default_matmul_precision", "highest")
        rng = np.random.RandomState(3)
        B, H, D, T = 2, 2, 128, 24
        x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
        p = dict(wq=mk(D, D), bq=mk(D), wk=mk(D, D), bk=mk(D),
                 wv=mk(D, D), bv=mk(D), wo=mk(D, D), bo=mk(D))
        probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
        key = jax.random.PRNGKey(7)

        @jax.jit
        def f(x):
            out = fused_attention_block_vjp(
                x, p["wq"], p["bq"], p["wk"], p["bk"], p["wv"], p["bv"],
                p["wo"], p["bo"], None, n_heads=H, dtype=jnp.float32,
                dropout_rate=0.3, dropout_rng=key, deterministic=False,
            )
            return (out.astype(jnp.float32) * probe).sum()

        g = jax.jit(jax.grad(f))(x)
        ok = True
        for i in range(4):
            u = np.random.RandomState(10 + i).randn(*x.shape)
            u = jnp.asarray((u / np.linalg.norm(u)).astype(np.float32))
            eps = 3e-2
            fd = (float(f(x + eps * u)) - float(f(x - eps * u))) / (2 * eps)
            an = float((g * u).sum())
            rel = abs(an - fd) / max(abs(fd), 1e-6)
            print(f"dir {i}: analytic {an:+.6f}  fd {fd:+.6f}  rel {rel:.2e}")
            ok &= rel < 2e-2
        print("dropout grad check:", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)

    # ---- timing A/B: MHA + residual + LN, fwd+bwd -------------------------
    B, T, D, H = args.batch, args.seq, args.dim, args.heads
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.02)
    p = dict(wq=mk(D, D), bq=mk(D), wk=mk(D, D), bk=mk(D),
             wv=mk(D, D), bv=mk(D), wo=mk(D, D), bo=mk(D),
             ln_g=jnp.ones((D,)), ln_b=jnp.zeros((D,)))
    lens = np.full((B,), T)
    lens[1:] = T - rng.randint(0, T // 3, size=B - 1)
    kpm = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    bias2 = jnp.where(kpm, -1e30, 0.0).astype(jnp.float32)
    probe = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    key = jax.random.PRNGKey(1)
    det = args.dropout <= 0.0

    def ln(y):
        yf = y.astype(jnp.float32)
        mu = yf.mean(-1, keepdims=True)
        var = yf.var(-1, keepdims=True)
        return ((yf - mu) * jax.lax.rsqrt(var + 1e-5)) * p["ln_g"] + p["ln_b"]

    def time_it(step, label):
        out = step(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:28s} {dt:8.3f} ms")
        return dt

    # grads wrt x AND two weight mats => the full backward runs
    def make_full(blk):
        def loss(x, wq, wo):
            q = dict(p, wq=wq, wo=wo)
            xc = x.astype(jnp.bfloat16)
            if blk == "ker":
                out = fused_attention_block_vjp(
                    xc, q["wq"], q["bq"], q["wk"], q["bk"], q["wv"], q["bv"],
                    q["wo"], q["bo"], bias2, n_heads=H, dtype=jnp.bfloat16,
                    dropout_rate=args.dropout, dropout_rng=key,
                    deterministic=det,
                )
            else:
                qq = xc @ wq.astype(jnp.bfloat16) + q["bq"].astype(jnp.bfloat16)
                kk = xc @ q["wk"].astype(jnp.bfloat16) + q["bk"].astype(jnp.bfloat16)
                vv = xc @ q["wv"].astype(jnp.bfloat16) + q["bv"].astype(jnp.bfloat16)
                sp = lambda a: a.reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
                out = dot_product_attention(
                    sp(qq), sp(kk), sp(vv), bias=bias2[:, None, None, :],
                    dropout_rate=args.dropout, dropout_rng=key,
                    deterministic=det,
                )
                out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
                out = out @ wo.astype(jnp.bfloat16) + q["bo"].astype(jnp.bfloat16)
            y = ln(out + xc)
            return (y.astype(jnp.float32) * probe).sum() * 1e-6

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        return lambda x: g(x, p["wq"], p["wo"])

    print(f"B={B} T={T} D={D} H={H} p={args.dropout} "
          f"({args.iters} timed iters, fwd+bwd incl. weight grads)")
    xla_t = time_it(make_full("xla"), "xla fwd+bwd")
    ker_t = time_it(make_full("ker"), "fused vjp kernel fwd+bwd")
    xla_t2 = time_it(make_full("xla"), "xla fwd+bwd (re-run)")
    print(f"saved: {xla_t - ker_t:+.3f} ms (ABA xla drift "
          f"{xla_t2 - xla_t:+.3f} ms)")


if __name__ == "__main__":
    main()
