#!/usr/bin/env python3
"""Same-session A/B of one config knob through the product train step.

Builds the flagship (or --config) model/state ONCE, then times the full
donated train step under variant A, variant B, and A again (ABA order) with
the same threaded state — one process, one device session, so tunnel
variance, compile-cache state and HBM layout drift cancel out of the
comparison. Only knobs that do NOT change the parameter tree are allowed
(the state is shared across variants).

Usage:
  python scripts/ab_product_step.py --knob mask_bits --a 8 --b 16
  python scripts/ab_product_step.py --knob clip_remat --a 1 --b 0 \
      --config config/speechclip_plus/large/flickr/hybrid_plus.yaml
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")

# knob -> (config-tree applicator, value parser). All of these leave the
# parameter tree untouched, so one TrainState serves every variant.
KNOBS = {
    "mask_bits": (lambda cfg, v: setattr(cfg.trainer, "dropout_mask_bits", v),
                  int),
    "clip_remat": (lambda cfg, v: setattr(cfg.clip, "remat", bool(v)), int),
    "frozen_dropout": (
        lambda cfg, v: setattr(cfg.audio_encoder, "frozen_dropout", bool(v)),
        int),
    "fused_attention": (
        lambda cfg, v: setattr(cfg.audio_encoder, "fused_attention", bool(v)),
        int),
    "fused_qkv": (
        lambda cfg, v: setattr(cfg.audio_encoder, "fused_qkv", bool(v)), int),
    "fused_attention_block": (
        lambda cfg, v: setattr(
            cfg.audio_encoder, "fused_attention_block", bool(v)), int),
    "clip_fused_block": (
        lambda cfg, v: setattr(
            cfg.clip, "fused_attention_block", bool(v)), int),
    "fused_st": (
        lambda cfg, v: setattr(
            cfg.model_settings.cascaded_branch.vq.args, "fused_st", bool(v)),
        int),
    "frontend_chunks": (
        lambda cfg, v: setattr(cfg.audio_encoder, "frontend_chunks", v), int),
    "fused_attention_vjp": (
        lambda cfg, v: setattr(
            cfg.model_settings, "fused_attention_vjp", bool(v)), int),
    "text_fused_vjp": (
        lambda cfg, v: setattr(
            cfg.clip, "text_fused_attention_vjp", bool(v)), int),
    "text_remat": (
        lambda cfg, v: setattr(cfg.clip, "text_remat", v), str),
    "fused_score_kernel": (
        lambda cfg, v: setattr(
            cfg.model_settings, "fused_score_kernel", bool(v)), int),
}


def build_variant(config_path: str, knob: str, value, batch: int,
                  wav_len: int):
    """cfg -> (model, make-step closure inputs). Params come from variant A."""
    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models import KWClip, KWClipConfig
    from speechclip_plus_tpu.tasks.builder import resolve_reduced_vocab

    cfg = load_config(config_path)
    KNOBS[knob][0](cfg, value)
    vocab = resolve_reduced_vocab(cfg)
    model_cfg = KWClipConfig.from_config(
        cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
        eot_id=int(vocab.eot_reduced),
    )
    # mirror bench.py: auto-chunk from the BENCH batch, not the YAML's —
    # unless chunking itself is the knob under test
    chunks = value if knob == "frontend_chunks" else max(1, -(-batch // 256))
    model_cfg = dataclasses.replace(
        model_cfg,
        audio=dataclasses.replace(model_cfg.audio, frontend_chunks=chunks),
    )
    return cfg, KWClip(model_cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", required=True, choices=sorted(KNOBS))
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--config", default=os.path.join(
        REPO, "config", "speechclip_plus", "base", "hybrid_plus.yaml"))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--wav-len", type=int, default=102400)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    parse = KNOBS[args.knob][1]
    val_a, val_b = parse(args.a), parse(args.b)

    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(REPO, ".jax_cache"))

    import jax

    from speechclip_plus_tpu.optim.optimizer import build_optimizer_from_config
    from speechclip_plus_tpu.parallel import (create_train_state,
                                              make_train_step, training_key)
    from __graft_entry__ import _make_batch

    cfg_a, model_a = build_variant(args.config, args.knob, val_a, args.batch,
                                   args.wav_len)
    _, model_b = build_variant(args.config, args.knob, val_b, args.batch,
                               args.wav_len)

    rng = np.random.RandomState(0)
    batch = _make_batch(rng, B=args.batch, T=args.wav_len,
                        img=model_a.cfg.clip.image_resolution)
    init_batch = _make_batch(rng, B=2, T=args.wav_len,
                             img=model_a.cfg.clip.image_resolution)
    variables = model_a.init({"params": jax.random.PRNGKey(0)}, init_batch,
                             training=False)
    tx = build_optimizer_from_config(variables["params"], model_a.cfg, cfg_a)
    state = create_train_state(model_a, variables, tx)
    del variables
    accum = int(cfg_a.trainer.accumulate_grad_batches or 1)
    key = training_key(1)

    steps = {}
    for name, model in (("a", model_a), ("b", model_b)):
        steps[name] = make_train_step(model, tx, mesh=None, donate=True,
                                      accumulate_grad_batches=accum)

    def run(name, n):
        nonlocal state
        step = steps[name]
        state, metrics = step(state, batch, key)  # warm (compile on 1st use)
        _ = float(metrics["train_loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch, key)
        loss = float(metrics["train_loss"])
        dt = (time.perf_counter() - t0) / n
        assert loss == loss, f"variant {name} produced NaN loss"
        return dt

    results = {}
    for phase, name in (("a1", "a"), ("b", "b"), ("a2", "a")):
        t = run(name, args.steps)
        val = val_a if name == "a" else val_b
        print(f"[{time.strftime('%H:%M:%S')}] {phase} ({args.knob}={val}): "
              f"{t * 1e3:.1f} ms/step, {args.batch / t:.1f} pairs/s",
              flush=True)
        results[phase] = {"step_ms": round(t * 1e3, 2),
                          "pairs_per_sec": round(args.batch / t, 1)}

    peak = float("nan")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = float(stats.get("peak_bytes_in_use", float("nan")))
    except Exception:
        pass
    print(json.dumps({
        "knob": args.knob, "a": val_a, "b": val_b, "batch": args.batch,
        "steps": args.steps, "config": os.path.relpath(args.config, REPO),
        "peak_hbm_gib": round(peak / 2**30, 2) if peak == peak else None,
        **results,
    }))


if __name__ == "__main__":
    main()
