#!/usr/bin/env python3
"""Component-level step-time breakdown on the real chip.

Times each stage of the hybrid+ base training step in isolation (separate
jits, host-synced per call): HuBERT conv frontend, full HuBERT tower, CLIP
ViT image tower, CLIP text tower fwd+bwd (gradients flow through the frozen
text tower to the keywords), and the full train step — so the perf pass
attacks the real hot spot instead of a guess (VERDICT round-1 weak #3).

Usage: python scripts/profile_step.py [--batch 128] [--wav-len 102400]
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
    ap.add_argument("--chunks", type=int, default=0,
                    help="conv-frontend chunks (0 = YAML/auto default)")
    ap.add_argument("--config", default=None,
                    help="YAML path (default: base hybrid_plus)")
    args = ap.parse_args()

    os.environ["BENCH_BATCH"] = str(args.batch)
    os.environ["BENCH_WAV_LEN"] = str(args.wav_len)
    os.environ["BENCH_SKIP_TORCH"] = "1"

    import jax
    import jax.numpy as jnp

    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                         ".jax_cache"))
    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models import KWClip, KWClipConfig
    from speechclip_plus_tpu.optim.optimizer import build_optimizer_from_config
    from speechclip_plus_tpu.parallel import create_train_state, make_train_step
    from speechclip_plus_tpu.tasks.builder import resolve_reduced_vocab
    from __graft_entry__ import _make_batch

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = load_config(args.config or os.path.join(
        repo, "config", "speechclip_plus", "base", "hybrid_plus.yaml"))
    vocab = resolve_reduced_vocab(cfg)
    if os.environ.get("BENCH_FUSED_ATTN"):
        cfg.audio_encoder.fused_attention = (
            os.environ["BENCH_FUSED_ATTN"] == "1"
        )
    model_cfg = KWClipConfig.from_config(
        cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
        eot_id=int(vocab.eot_reduced))
    if args.chunks > 0:
        import dataclasses

        model_cfg = dataclasses.replace(
            model_cfg,
            audio=dataclasses.replace(model_cfg.audio,
                                      frontend_chunks=args.chunks))
    model = KWClip(model_cfg)

    rng = np.random.RandomState(0)
    B = args.batch
    batch = _make_batch(rng, B=B, T=args.wav_len,
                        img=model_cfg.clip.image_resolution)
    init_batch = _make_batch(rng, B=2, T=args.wav_len,
                             img=model_cfg.clip.image_resolution)
    variables = model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                           training=False)
    params = variables["params"]
    tx = build_optimizer_from_config(params, model_cfg, cfg)
    state = create_train_state(model, variables, tx)
    # donate=False: sub-timers reuse the same state buffers across calls.
    # NOTE: that (plus input-preservation copies) costs ~8 ms vs the real
    # donating product step — compare totals against bench.py, not across.
    step = make_train_step(model, tx, mesh=None, donate=False,
                           accumulate_grad_batches=1)
    from speechclip_plus_tpu.parallel import training_key

    key = training_key(1)  # product default (rbg on TPU)

    results = {}

    def full(eps, state, batch, key):
        b2 = dict(batch)
        b2["wav"] = batch["wav"] + eps
        _, m = step(state, b2, key)
        return m["train_loss"] * 1e-20

    results["full_step_fwd_bwd_adam"] = timed(full, state, batch, key,
                                              iters=args.iters,
                                              label="full_step_fwd_bwd_adam")

    hub_cfg = model_cfg.audio
    audio_params = params["audio_encoder"]
    wav = batch["wav"]
    wav_pad = batch.get("wav_padding_mask")
    if wav_pad is None:
        wav_pad = (jnp.arange(wav.shape[1])[None, :]
                   >= batch["wav_len"][:, None])

    from speechclip_plus_tpu.models.hubert import (ConvFeatureExtractor,
                                                   HubertModel)

    @jax.jit
    def conv_front(eps, p, w):
        out = ConvFeatureExtractor(hub_cfg).apply(
            {"params": p["feature_extractor"]}, w + eps)
        return out.astype(jnp.float32).sum() * 1e-20

    results["hubert_conv_frontend_fwd"] = timed(conv_front, audio_params, wav,
                                                iters=args.iters,
                                                label="hubert_conv_frontend_fwd")

    hub = HubertModel(hub_cfg)

    @jax.jit
    def hub_full(eps, p, w, m):
        return hub.apply(
            {"params": p}, w + eps, m)["x"].astype(jnp.float32).sum() * 1e-20

    results["hubert_tower_fwd"] = timed(hub_full, audio_params, wav, wav_pad,
                                        iters=args.iters,
                                        label="hubert_tower_fwd")

    # train-mode tower (the product step runs dropout inside the frozen
    # tower — Lightning-effective reference behavior): the delta vs
    # hubert_tower_fwd is the frozen-dropout cost
    @jax.jit
    def hub_train(eps, p, w, m, k):
        return hub.apply(
            {"params": p}, w + eps, m, deterministic=False,
            rngs={"dropout": k, "layer_drop": jax.random.fold_in(k, 2)},
        )["x"].astype(jnp.float32).sum() * 1e-20

    try:
        results["hubert_tower_fwd_train_mode"] = timed(
            hub_train, audio_params, wav, wav_pad, key, iters=args.iters,
            label="hubert_tower_fwd_train_mode")
    except Exception as e:
        print("train-mode tower timing failed:", repr(e))

    # branches + VQ/CIF + keyword text tower + losses + backward, audio
    # tower excluded: drive forward_from_audio with precomputed features
    # (includes the text-tower fwd+bwd measured separately above)
    Tp = int(args.wav_len) // model_cfg.audio.downsample_rate
    feats = jnp.asarray(rng.randn(B, Tp, model_cfg.audio.d_model)
                        .astype(np.float32))
    feat_len = jnp.full((B,), Tp, jnp.int32)
    rest_batch = {k: v for k, v in batch.items() if k != "wav"}

    @jax.jit
    def rest_fwd_bwd(eps, p, feats, k):
        feats = feats + eps

        def f(feats):
            (loss_feats, _, _), _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                feats, feat_len, rest_batch,
                method=KWClip.forward_from_audio,
                training=True, global_step=jnp.zeros((), jnp.int32),
                rngs={"dropout": k, "vq": jax.random.fold_in(k, 1)},
                mutable=["batch_stats"],
            )
            losses = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                loss_feats, method=KWClip.compute_loss,
            )
            return losses["loss"]
        return jax.grad(f)(feats).astype(jnp.float32).sum() * 1e-20

    try:
        results["post_tower_fwd_bwd_incl_text"] = timed(
            rest_fwd_bwd, params, feats, key, iters=args.iters,
            label="post_tower_fwd_bwd_incl_text")
    except Exception as e:
        print("post-tower timing failed:", repr(e))

    # optimizer alone: tx.update + apply_updates on a real-structure grad
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    @jax.jit
    def adam_only(eps, p, opt_state, grads):
        import optax as _optax

        leaves, treedef = jax.tree_util.tree_flatten(grads)
        grads = jax.tree_util.tree_unflatten(
            treedef, [leaves[0] + eps] + leaves[1:])
        updates, new_state = tx.update(grads, opt_state, p)
        new_p = _optax.apply_updates(p, updates)
        return (jax.tree_util.tree_leaves(new_p)[0]
                .astype(jnp.float32).sum() * 1e-20)

    try:
        results["optimizer_update"] = timed(adam_only, params,
                                            state.opt_state, grads,
                                            iters=args.iters,
                                            label="optimizer_update")
    except Exception as e:
        print("optimizer timing failed:", repr(e))

    @jax.jit
    def img_fwd(eps, p, im):
        out = model.apply({"params": p}, im + eps,
                          method=model.encode_image_raw)
        return out.astype(jnp.float32).sum() * 1e-20

    results["clip_image_tower_fwd"] = timed(img_fwd, params, batch["image"],
                                            iters=args.iters,
                                            label="clip_image_tower_fwd")

    # text tower fwd+bwd on K=75-slot pseudo sequences (the cascaded branch
    # pushes keywords through the frozen tower and needs input gradients)
    kmax = model_cfg.cif.max_feat_len if model_cfg.cif else 8
    kw = jnp.asarray(rng.randn(B, kmax, model_cfg.clip.text_width)
                     .astype(np.float32))
    kw_num = jnp.full((B,), kmax, dtype=jnp.int32)

    @jax.jit
    def text_fwd_bwd(eps, p, kw):
        kw = kw + eps

        def f(kw):
            out = model.apply(
                {"params": p},
                method=lambda m: m.clip.encode_keywords(kw, kw_num),
            )
            return (out.astype(jnp.float32) ** 2).sum()
        return jax.grad(f)(kw).astype(jnp.float32).sum() * 1e-20

    try:
        results["clip_text_tower_fwd_bwd"] = timed(text_fwd_bwd, params, kw,
                                                   iters=args.iters,
                                                   label="clip_text_tower_fwd_bwd")
    except Exception as e:
        print("text tower timing failed:", repr(e))

    total = results["full_step_fwd_bwd_adam"]
    print(f"\n=== step breakdown (B={B}, wav={args.wav_len}) ===")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v * 1e3:9.2f} ms  ({v / total * 100:5.1f}% of full step)")
    accounted = sum(v for k, v in results.items()
                    if k != "full_step_fwd_bwd_adam")
    print(f"{'unaccounted (branch/loss/opt)':28s} "
          f"{(total - accounted) * 1e3:9.2f} ms  "
          f"({(total - accounted) / total * 100:5.1f}% of full step)")


if __name__ == "__main__":
    main()
