#!/usr/bin/env python3
"""Sub-component breakdown of the post-tower compute (branch / CIF / VQ /
keyword head / losses) — `profile_step.py` measures the aggregate
(`post_tower_fwd_bwd_incl_text`); this locates the cost inside it.

Usage: python scripts/profile_post.py [--batch 128]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from speechclip_plus_tpu.utils.timing import timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--wav-len", type=int, default=102400)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--config", default=None,
                    help="YAML path (default: base hybrid_plus)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models import KWClip, KWClipConfig
    from speechclip_plus_tpu.tasks.builder import resolve_reduced_vocab
    from speechclip_plus_tpu.ops.vq import simple_vector_quantizer
    from __graft_entry__ import _make_batch

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(args.config or os.path.join(
        repo, "config", "speechclip_plus", "base", "hybrid_plus.yaml"))
    vocab = resolve_reduced_vocab(cfg)
    model_cfg = KWClipConfig.from_config(
        cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
        eot_id=int(vocab.eot_reduced))
    model = KWClip(model_cfg)

    rng = np.random.RandomState(0)
    B = args.batch
    batch = _make_batch(rng, B=2, T=args.wav_len,
                        img=model_cfg.clip.image_resolution)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           training=False)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    key = jax.random.PRNGKey(1)

    Tp = args.wav_len // model_cfg.audio.downsample_rate
    D = model_cfg.audio.d_model
    feats = jnp.asarray(rng.randn(B, Tp, D).astype(np.float32))
    feat_len = jnp.full((B,), Tp, jnp.int32)
    tlen = jnp.full((B,), 12, jnp.int32)
    gstep = jnp.zeros((), jnp.int32)
    V = len(vocab)
    K = model_cfg.cif.max_feat_len if model_cfg.cif else 8

    results = {}

    # --- full cascaded(+parallel) branch fwd+bwd --------------------------
    @jax.jit
    def branch_fwd_bwd(eps, p, feats, k):
        feats = feats + eps

        def f(feats):
            tok = p["clip"]["text"]["token_embedding"]["embedding"]
            out, _ = model.apply(
                {"params": p, "batch_stats": bstats},
                feats, feat_len, jax.lax.stop_gradient(tok),
                target_len=tlen, global_step=gstep, training=True,
                num_updates=gstep,
                method=lambda m, *a, **kw: m.cascaded_branch(*a, **kw),
                rngs={"dropout": k, "vq": jax.random.fold_in(k, 1)},
                mutable=["batch_stats"],
            )
            s = out["keywords"].astype(jnp.float32).sum()
            if out.get("parallel_audio_feat") is not None:
                s += out["parallel_audio_feat"].astype(jnp.float32).sum()
            return s
        return jax.grad(f)(feats).astype(jnp.float32).sum() * 1e-20

    results["branch_fwd_bwd(no_text_tower)"] = timed(
        branch_fwd_bwd, params, feats, key, iters=args.iters)

    # --- branch sub-pieces: attention / CIF / keyword head ---------------
    @jax.jit
    def att_fwd_bwd(eps, p, feats, k):
        feats = feats + eps

        def f(feats):
            out = model.apply(
                {"params": p, "batch_stats": bstats}, feats,
                method=lambda m, x: m.cascaded_branch.self_att(
                    x, deterministic=False),
                rngs={"dropout": k},
            )
            return out.astype(jnp.float32).sum()
        return jax.grad(f)(feats).astype(jnp.float32).sum() * 1e-20

    results["branch_self_att_fwd_bwd"] = timed(
        att_fwd_bwd, params, feats, key, iters=args.iters)

    @jax.jit
    def cif_fwd_bwd(eps, p, feats, k):
        feats = feats + eps

        def f(feats):
            from speechclip_plus_tpu.ops.masks import key_padding_mask
            pad = key_padding_mask(feats.shape[1], feat_len)
            out = model.apply(
                {"params": p, "batch_stats": bstats},
                method=lambda m: m.cascaded_branch.downsampling(
                    feats, pad, target_lengths=tlen, global_step=gstep,
                    training=True, deterministic=False),
                rngs={"dropout": k},
            )
            return out["dsample_feats"].astype(jnp.float32).sum()
        return jax.grad(f)(feats).astype(jnp.float32).sum() * 1e-20

    results["cif_fwd_bwd"] = timed(cif_fwd_bwd, params, feats, key,
                                   iters=args.iters)

    kw_feats = jnp.asarray(rng.randn(B, K, D).astype(np.float32))

    @jax.jit
    def head_fwd_bwd(eps, p, kw_feats, k):
        kw_feats = kw_feats + eps

        def f(kw_feats):
            tok = jax.lax.stop_gradient(
                p["clip"]["text"]["token_embedding"]["embedding"])
            vq, kws = model.apply(
                {"params": p, "batch_stats": bstats},
                method=lambda m: m.cascaded_branch.keyword_head(
                    kw_feats, tok, training=True, num_updates=gstep,
                    deterministic=False),
                rngs={"dropout": k, "vq": jax.random.fold_in(k, 1)},
                mutable=["batch_stats"],
            )[0]
            return kws.astype(jnp.float32).sum()
        return jax.grad(f)(kw_feats).astype(jnp.float32).sum() * 1e-20

    results["keyword_head_fwd_bwd(B,75,768)"] = timed(
        head_fwd_bwd, params, kw_feats, key, iters=args.iters)

    # --- VQ op alone on (B, K, V) logits ----------------------------------
    # IN-MODEL form: codebook passed -> the fused straight-through path
    # (gather fwd / analytic bwd, ops/vq.st_codebook_matmul) and only the
    # stats that survive in the train step's log_metrics (kwclip.py:799-801)
    # kept alive. Without the codebook the op falls back to the materialized
    # ST estimator + a softmax-jacobian backward over (B*T, V) — a path the
    # model never takes; probing it read 35.9 ms where the real path is ~4 ms
    # (measured on v5e, B=128).
    cos = jnp.asarray(rng.randn(B, K, V).astype(np.float32) * 0.1)
    cbook = jnp.asarray(rng.randn(V, 512).astype(np.float32) * 0.02)

    @jax.jit
    def vq_fwd_bwd(eps, cos, cbook):
        cos = cos + eps

        def f(cos):
            r = simple_vector_quantizer(
                cos, temp=jnp.float32(0.1), training=True, use_gumbel=False,
                hard=True, codebook=cbook)
            return (r["keywords"].astype(jnp.float32).sum()
                    + r["code_perplexity"] + r["prob_perplexity"]
                    + r["ent_per_t"].mean())
        return jax.grad(f)(cos).sum() * 1e-20

    results["vq_op_fwd_bwd(B,75,V,in-model)"] = timed(
        vq_fwd_bwd, cos, cbook, iters=args.iters)

    # --- compute_loss fwd+bwd --------------------------------------------
    lf = {
        "id": jnp.arange(B, dtype=jnp.int32),
        "image_feat": jnp.asarray(rng.randn(B, 512).astype(np.float32)),
        "cascaded_audio_feat": jnp.asarray(
            rng.randn(B, 512).astype(np.float32)),
        "parallel_audio_feat": jnp.asarray(
            rng.randn(B, 512).astype(np.float32)),
        "cif_quantity_out": jnp.asarray(
            np.abs(rng.randn(B)).astype(np.float32) * 10),
        "cif_target_len": tlen,
    }

    @jax.jit
    def loss_fwd_bwd(eps, p, lf):
        lf = dict(lf, image_feat=lf["image_feat"] + eps)

        def f(img, casc, par):
            lf2 = dict(lf, image_feat=img, cascaded_audio_feat=casc,
                       parallel_audio_feat=par)
            losses = model.apply({"params": p, "batch_stats": bstats}, lf2,
                                 method=KWClip.compute_loss)
            return losses["loss"]
        g = jax.grad(f)(lf["image_feat"], lf["cascaded_audio_feat"],
                        lf["parallel_audio_feat"])
        return g.astype(jnp.float32).sum() * 1e-20

    results["compute_loss_fwd_bwd"] = timed(loss_fwd_bwd, params, lf,
                                            iters=args.iters)

    print(f"\n=== post-tower breakdown (B={B}, T'={Tp}, V={V}, K={K}) ===")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:34s} {v * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
