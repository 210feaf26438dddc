#!/usr/bin/env python3
"""Throughput benchmark: audio-image pairs/sec/chip on the flagship model.

Measures the FULL training step (forward + contrastive loss on the global
batch + backward + Adam update) of SpeechCLIP+ hybrid+ base (HuBERT-base +
CLIP ViT-B/32 + CIF) on synthetic data at reference shapes (6.4 s crops =
`max_audio_len: 102400`, 224x224 images), bf16 towers / fp32 loss.

Baseline: the reference publishes no throughput numbers (SURVEY §6). For
`vs_baseline` this script measures a local PyTorch baseline — the same
frozen towers (HF HubertModel-base + CLIPModel ViT-B/32, random weights,
eval mode, forward only, i.e. a *lower bound* on the reference's per-pair
work) on this host's CPU — unless a cached `bench_baseline.json` exists.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_BATCH (default 16), BENCH_WAV_LEN (default 102400),
BENCH_STEPS (default 10), BENCH_SKIP_TORCH=1 to reuse/skip the baseline.
"""
import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WAV_LEN = int(os.environ.get("BENCH_WAV_LEN", "102400"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from speechclip_plus_tpu.models import KWClip
    from speechclip_plus_tpu.optim import build_optimizer
    from speechclip_plus_tpu.parallel import create_train_state, make_train_step

    import dataclasses

    cfg = _flagship_cfg()
    # bf16 towers (MXU-native); losses/statistics stay fp32 inside ops
    cfg = dataclasses.replace(
        cfg,
        audio=dataclasses.replace(cfg.audio, dtype=jnp.bfloat16),
        clip=dataclasses.replace(cfg.clip, dtype=jnp.bfloat16),
    )
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng, B=BATCH, T=WAV_LEN, img=cfg.clip.image_resolution)

    # init at a tiny batch: the init forward is shape-polymorphic over B and
    # initializing at full batch doubles peak HBM next to the optimizer state
    init_batch = _make_batch(rng, B=2, T=WAV_LEN, img=cfg.clip.image_resolution)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, init_batch, training=False
    )
    tx = build_optimizer(
        variables["params"], cfg,
        scheduler_args={"warmup": 5000, "max_step": 50000, "final_lr": 1e-8},
    )
    state = create_train_state(model, variables, tx)
    del variables  # single live copy of the params next to the opt state
    step = make_train_step(model, tx, mesh=None, donate=True)
    key = jax.random.PRNGKey(1)

    # warmup / compile
    state, metrics = step(state, batch, key)
    _ = float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, key)
        # force a host sync on the step's loss every iteration: on remote
        # backends block_until_ready alone does not reliably drain the queue
        _ = float(metrics["train_loss"])
    dt = time.perf_counter() - t0
    n_dev = 1  # single-chip bench; the step itself is mesh-scalable
    return BATCH * STEPS / dt / n_dev


def bench_torch_cpu() -> float:
    """Frozen-tower forward pass in torch on CPU (reference work lower bound)."""
    import torch
    import transformers

    hub = transformers.HubertModel(transformers.HubertConfig()).eval()
    clip = transformers.CLIPModel(
        transformers.CLIPConfig(
            text_config=dict(hidden_act="quick_gelu"),
            vision_config=dict(hidden_act="quick_gelu"),
        )
    ).eval()
    b = 2
    wav = torch.randn(b, WAV_LEN)
    img = torch.randn(b, 3, 224, 224)
    with torch.no_grad():
        hub(wav)  # warmup
        t0 = time.perf_counter()
        iters = 2
        for _ in range(iters):
            feats = hub(wav, output_hidden_states=True)
            clip.get_image_features(img)
            # text tower on 77-token pseudo sequences (cascaded branch path)
            ids = torch.zeros(b, 77, dtype=torch.long)
            clip.get_text_features(ids)
        dt = time.perf_counter() - t0
    return b * iters / dt


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return float(json.load(f)["torch_cpu_pairs_per_sec"])
    if os.environ.get("BENCH_SKIP_TORCH"):
        return float("nan")
    val = bench_torch_cpu()
    try:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"torch_cpu_pairs_per_sec": val}, f)
    except OSError:
        pass
    return val


def main():
    value = bench_tpu()
    baseline = get_baseline()
    vs = value / baseline if baseline == baseline and baseline > 0 else 0.0
    print(json.dumps({
        "metric": "hybrid_plus_base_train_pairs_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
