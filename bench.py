#!/usr/bin/env python3
"""Throughput benchmark: audio-image pairs/sec/chip on the flagship model.

Measures the FULL training step (forward + contrastive loss on the global
batch + backward + Adam update) of SpeechCLIP+ hybrid+ base, built THROUGH
THE PRODUCT PATH: the shipped YAML (`config/speechclip_plus/base/
hybrid_plus.yaml`, bf16 towers via `trainer.precision`) -> KWClipConfig ->
the same `make_train_step`/optimizer the Trainer uses. Synthetic data at
reference shapes (6.4 s crops = `max_audio_len: 102400`, 224x224 images).

Honest readout: besides pairs/s the JSON line carries the mean step time,
XLA's own FLOP estimate for the compiled step, achieved TFLOP/s and MFU
against the chip's bf16 peak. `vs_baseline` is the ratio to an ANALYTIC
A100 GPU-equivalent at eager-realistic MFU 0.15 (same per-pair FLOPs both
sides, utils/flops.py) — the reference publishes no throughput numbers
(SURVEY §6). The torch-CPU forward lower bound stays in the JSON as
`vs_torch_cpu_forward_lower_bound`, clearly labeled, never the headline.

Env knobs: BENCH_BATCH (default 128), BENCH_WAV_LEN (default 102400),
BENCH_STEPS (default 30), BENCH_SKIP_TORCH=1 to reuse/skip the baseline,
BENCH_CONFIG to bench another YAML (e.g. the large recipe), BENCH_OUT to
additionally dump the raw stats dict to a JSON file.

A persistent XLA compilation cache lives in `.jax_cache/` — the first run
pays the full compile (~minutes through the axon tunnel), subsequent runs
(including the driver's end-of-round run) reuse it, so both the live-tower
and the cached-image phases land within the wall-clock budget.
"""
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WAV_LEN = int(os.environ.get("BENCH_WAV_LEN", "102400"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
CONFIG = os.environ.get("BENCH_CONFIG") or os.path.join(
    os.path.dirname(__file__), "config", "speechclip_plus", "base",
    "hybrid_plus.yaml",
)

# ---- the >=5x-GPU-baseline question (BASELINE.md / BASELINE.json) -------
# No GPU exists in this environment and the reference publishes no
# throughput numbers, so the GPU side is an analytic estimate: take the
# analytic FLOP count of OUR step (utils/flops.py, 2 FLOPs/MAC over all
# dots+convs — a fair proxy for the per-pair work: the torch reference
# does at least this much, same towers, fp16, plus fp32 master weights)
# and divide by an A100's bf16 peak at a documented MFU assumption. 0.40 is *generous* for the reference (eager
# PyTorch + Lightning DP, unfused conv frontend, per-layer host syncs —
# research codebases typically land at 0.10-0.20); 0.15 is the realistic
# eager-mode figure. Both are printed.
GPU_PEAK_TFLOPS = 312.0  # A100-80GB bf16 dense
GPU_MFU_GENEROUS = 0.40
GPU_MFU_EAGER = 0.15

# bf16 peak TFLOP/s per chip (dense): v5e=197, v4=275, v5p=459, v6e=918
PEAK_TFLOPS = {
    "v5 lite": 197.0, "v5e": 197.0, "v4": 275.0, "v5p": 459.0,
    "v6 lite": 918.0, "v6e": 918.0,
}


def _chip_peak(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return float("nan")


def _enable_compile_cache():
    """Persistent XLA compilation cache (survives across bench runs)."""
    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(__file__),
                                         ".jax_cache"))


def _product_path_setup():
    """Flagship model + train step exactly as run_task.py builds them."""
    import jax

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.models import KWClip, KWClipConfig
    from speechclip_plus_tpu.optim.optimizer import build_optimizer_from_config
    from speechclip_plus_tpu.parallel import create_train_state, make_train_step
    from speechclip_plus_tpu.tasks.builder import resolve_reduced_vocab

    cfg = load_config(CONFIG)
    if os.environ.get("BENCH_FROZEN_DROPOUT") == "0":
        cfg.audio_encoder.frozen_dropout = False
    if os.environ.get("BENCH_FUSED_ATTN"):
        cfg.audio_encoder.fused_attention = (
            os.environ["BENCH_FUSED_ATTN"] == "1"
        )
    if os.environ.get("BENCH_FUSED_BLOCK"):
        # A/B the fused QKV->attention->out-proj block kernel
        # (nn/fused_attention_block.py; default auto-on for frozen towers
        # on a single TPU device)
        cfg.audio_encoder.fused_attention_block = (
            os.environ["BENCH_FUSED_BLOCK"] == "1"
        )
    if os.environ.get("BENCH_CLIP_FUSED_BLOCK"):
        # A/B the fused block kernel on the frozen ViT (vision tower only;
        # auto-on for frozen image towers on TPU)
        cfg.clip.fused_attention_block = (
            os.environ["BENCH_CLIP_FUSED_BLOCK"] == "1"
        )
    if os.environ.get("BENCH_FUSED_QKV"):
        # A/B the trace-time QKV kernel concat (bitwise-identical; default
        # OFF — measured 221.3 vs 218.5 ms on v5e, see HubertConfig)
        cfg.audio_encoder.fused_qkv = os.environ["BENCH_FUSED_QKV"] == "1"
    if os.environ.get("BENCH_FUSED_ST"):
        # A/B the fused straight-through VQ->codebook path (default ON)
        node = cfg.model_settings.cascaded_branch.vq.args
        node.fused_st = os.environ["BENCH_FUSED_ST"] == "1"
    if os.environ.get("BENCH_MASK_BITS"):
        # A/B the dropout-mask bit width (ops/random.py; default 8, dithered)
        cfg.trainer.dropout_mask_bits = int(os.environ["BENCH_MASK_BITS"])
    if os.environ.get("BENCH_CLIP_REMAT"):
        # A/B text-tower remat (default ON for all families — wins the
        # step-time ABA on both base and large, models/kwclip.py; "0"
        # forces off — viable on the large config once the grad-accum
        # buffer stopped holding frozen-tower zeros, optim/optimizer.py)
        cfg.clip.remat = os.environ["BENCH_CLIP_REMAT"] == "1"
    vocab = resolve_reduced_vocab(cfg)
    model_cfg = KWClipConfig.from_config(
        cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
        eot_id=int(vocab.eot_reduced),
    )
    import jax.numpy as jnp

    assert jnp.dtype(model_cfg.audio.dtype) == jnp.dtype(jnp.bfloat16), (
        "product path must train bf16 (trainer.precision)"
    )
    # the YAML's data.batch_size (256) drives auto-chunking in from_config,
    # but the bench overrides the batch via BENCH_BATCH — re-derive from the
    # actual bench batch unless explicitly set
    chunks = int(os.environ.get("BENCH_FRONTEND_CHUNKS", "0"))
    if chunks <= 0:
        # mirror KWClipConfig.from_config's auto policy: chunk in units of
        # <=256 (unchunked B=256 fits post fused-ST VQ and measures faster:
        # 564.7 vs 558.1 pairs/s on v5e)
        chunks = max(1, -(-BATCH // 256))
    import dataclasses

    model_cfg = dataclasses.replace(
        model_cfg,
        audio=dataclasses.replace(model_cfg.audio, frontend_chunks=chunks),
    )
    model = KWClip(model_cfg)

    from __graft_entry__ import _make_batch

    rng = np.random.RandomState(0)
    batch = _make_batch(rng, B=BATCH, T=WAV_LEN, img=model_cfg.clip.image_resolution)
    # init at a tiny batch: the init forward is shape-polymorphic over B and
    # initializing at full batch doubles peak HBM next to the optimizer state
    init_batch = _make_batch(rng, B=2, T=WAV_LEN, img=model_cfg.clip.image_resolution)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, init_batch, training=False
    )
    tx = build_optimizer_from_config(variables["params"], model_cfg, cfg)
    state = create_train_state(model, variables, tx)
    del variables
    accum = int(cfg.trainer.accumulate_grad_batches or 1)
    step = make_train_step(model, tx, mesh=None, donate=True,
                           accumulate_grad_batches=accum)
    return model, state, step, batch


def bench_tpu() -> dict:
    import jax

    _enable_compile_cache()
    t_start = time.perf_counter()
    model, state, step, batch = _product_path_setup()
    from speechclip_plus_tpu.parallel import training_key

    key = training_key(1)  # product-path default (rbg on TPU)

    # XLA's own FLOP estimate for the compiled step (MXU work dominates).
    # NOTE: .lower().compile() shares the jit cache with the timed calls, so
    # this does not add a second compilation.
    flops = float("nan")
    try:
        cost = step.lower(state, batch, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        pass

    # warmup / compile
    state, metrics = step(state, batch, key)
    _ = float(metrics["train_loss"])
    # Chained timing: each step consumes the previous state, so the chain
    # executes fully on-device; ONE host sync (float()) at the end. Syncing
    # every step adds the tunnel RTT (~33 ms measured on axon) to every
    # iteration and understates throughput by ~10%.
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, key)
    _ = float(metrics["train_loss"])
    dt = time.perf_counter() - t0
    step_s = dt / STEPS
    pairs_per_sec = BATCH / step_s

    peak = _chip_peak(jax.devices()[0])
    achieved_tflops = flops / step_s / 1e12 if flops == flops else float("nan")
    mfu = achieved_tflops / peak if peak == peak else float("nan")

    # Analytic FLOP count (2/MAC over all dots+convs, utils/flops.py): on
    # this backend XLA's cost_analysis reports ~2.5x less than the matmul
    # arithmetic at these shapes, which understates MFU accordingly — both
    # figures are reported; the analytic derivation is checkable line by
    # line in utils/flops.py.
    from speechclip_plus_tpu.utils.flops import train_step_flops

    fl = train_step_flops(model.cfg, BATCH, WAV_LEN)
    analytic = fl["total"]
    analytic_tflops = analytic / step_s / 1e12
    mfu_analytic = analytic_tflops / peak if peak == peak else float("nan")

    # The real product path caches the frozen image-tower embeddings
    # (data.cache_image_embeddings defaults ON for frozen towers,
    # tasks/base_task.py) — the ViT never runs in a training step. Report
    # that rate too; the headline metric stays the live-tower full step so
    # rounds stay comparable.
    # wall-clock guard: the cached path is a second compile. With the
    # persistent compilation cache warm (any prior run of this script,
    # including during the build round) it costs seconds; cold through the
    # axon tunnel it costs ~8 min, so only skip when the live phase already
    # blew a *hard* budget — the cached rate is the product default
    # (data.cache_image_embeddings, tasks/base_task.py) and must land.
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "2400"))
    over_budget = (time.perf_counter() - t_start) > budget
    cached_pairs_per_sec = float("nan")
    if over_budget and not os.environ.get("BENCH_SKIP_CACHED"):
        print("skipping cached-image phase (time budget)")
    if not os.environ.get("BENCH_SKIP_CACHED") and not over_budget:
        try:
            @jax.jit
            def _embed(params, image):
                return model.apply({"params": params}, image,
                                   method=model.encode_image_raw)

            image_feat = _embed(state.params, batch["image"])
            cached_batch = {k: v for k, v in batch.items() if k != "image"}
            cached_batch["image_feat"] = image_feat
            state, metrics = step(state, cached_batch, key)
            _ = float(metrics["train_loss"])
            t0 = time.perf_counter()
            for _ in range(STEPS):
                state, metrics = step(state, cached_batch, key)
            _ = float(metrics["train_loss"])
            cached_pairs_per_sec = BATCH / ((time.perf_counter() - t0) / STEPS)
        except Exception as e:
            print(f"cached-image bench failed: {e!r}")

    # peak HBM (bytes) — drives the frontend-chunking policy and documents
    # the large-family fit; not all backends expose memory_stats.
    peak_hbm = float("nan")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak_hbm = float(
            stats.get("peak_bytes_in_use", stats.get("bytes_in_use", float("nan")))
        )
    except Exception:
        pass

    return {
        "pairs_per_sec": pairs_per_sec,
        "step_ms": step_s * 1e3,
        "peak_hbm_gib": peak_hbm / 2**30 if peak_hbm == peak_hbm else None,
        "xla_flops_per_step": flops,
        "analytic_flops_per_step": analytic,
        "flops_breakdown": {k: v for k, v in fl.items() if k != "total"},
        "achieved_tflops": achieved_tflops,
        "analytic_tflops": analytic_tflops,
        "peak_tflops": peak,
        "mfu": mfu,
        "mfu_analytic": mfu_analytic,
        "cached_pairs_per_sec": cached_pairs_per_sec,
        "device": str(jax.devices()[0].device_kind),
    }


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


def gpu_estimate(flops: float, pairs_per_sec: float) -> dict:
    """Analytic answer to BASELINE.json's >=5x-over-GPU target (no GPU in
    this env, none published upstream): implied A100 pairs/s at documented
    MFU assumptions — see the module-top comment for why 0.40 is generous
    and 0.15 realistic for the eager-torch reference. Uses the ANALYTIC
    per-pair FLOPs (utils/flops.py, 2/MAC) so both sides of the ratio use
    the same counting convention — XLA's undercounting cost model would
    overstate the implied GPU rate."""
    if flops != flops or flops <= 0 or pairs_per_sec != pairs_per_sec:
        return {}
    flops_per_pair = flops / BATCH
    gen = GPU_PEAK_TFLOPS * 1e12 * GPU_MFU_GENEROUS / flops_per_pair
    eager = GPU_PEAK_TFLOPS * 1e12 * GPU_MFU_EAGER / flops_per_pair
    return {
        "gpu_equiv_pairs_per_sec_at_mfu40": round(gen, 1),
        "gpu_equiv_pairs_per_sec_at_mfu15": round(eager, 1),
        "vs_gpu_estimate_mfu40": round(pairs_per_sec / gen, 3),
        "vs_gpu_estimate_mfu15": round(pairs_per_sec / eager, 3),
        "gpu_assumption": f"A100-80GB bf16 peak {GPU_PEAK_TFLOPS} TF, "
                          "same per-pair FLOPs as our compiled step",
    }


def _unreachable_row(reason: str) -> dict:
    """Honest failure row: the axon TPU tunnel can wedge so that every
    device op (including jax.devices()) blocks forever. Rather than hang
    the driver's end-of-round bench, emit a null metric with the reason and
    point at the last committed measurement."""
    row = {
        "metric": "hybrid_plus_base_train_pairs_per_sec_per_chip",
        "value": None,
        "unit": "pairs/s/chip",
        "vs_baseline": None,
        "error": reason,
        "batch": BATCH,
        "path": "product (YAML->KWClipConfig->make_train_step)",
    }
    here = os.path.dirname(__file__) or "."
    for prev in ("BENCH_r02.json", "BENCH_r01.json"):
        p = os.path.join(here, prev)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    rec = json.load(f)
                # the driver record wraps the bench line; keep the numbers
                rec = rec.get("parsed", rec)
                row["last_committed_measurement"] = {"file": prev, **rec}
                break
            except Exception:
                pass
    return row


def _probe_device(timeout_s: float) -> str | None:
    """Ask for the device in a subprocess so a wedged tunnel can't hang us."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices()[0]; print(d.platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if out.returncode == 0:
            return out.stdout.strip()
        return None
    except subprocess.TimeoutExpired:
        return None


def _arm_watchdog(seconds: float):
    """Hard-exit (after printing the failure row) if the run wedges mid-bench
    — a tunnel hang inside a device op is not interruptible from Python."""
    def fire():
        print(json.dumps(_unreachable_row(
            f"bench watchdog fired after {seconds:.0f}s (device op hung)")),
            flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
    platform = _probe_device(probe_timeout)
    if platform is None:
        print(json.dumps(_unreachable_row(
            f"TPU device probe timed out after {probe_timeout:.0f}s "
            "(axon tunnel unresponsive)")), flush=True)
        return
    watchdog = _arm_watchdog(float(os.environ.get("BENCH_WATCHDOG", "3300")))
    stats = bench_tpu()
    baseline = get_baseline()
    value = stats["pairs_per_sec"]
    vs_torch_cpu = (
        value / baseline if baseline == baseline and baseline > 0 else None
    )

    def r(x, n=3):
        return round(x, n) if x is not None and x == x else None

    # vs_baseline is the analytic A100 GPU-equivalent at eager-realistic
    # MFU 0.15 (same per-pair FLOP convention both sides, utils/flops.py)
    # — the only comparative number honest enough to headline. The
    # round-1..3 torch-CPU forward ratio (~1000x) was a lower bound on
    # reference work, not a capability signal; it stays below, labeled.
    gpu = gpu_estimate(stats["analytic_flops_per_step"], value)
    row = {
        "metric": "hybrid_plus_base_train_pairs_per_sec_per_chip",
        "value": r(value),
        "unit": "pairs/s/chip",
        "vs_baseline": gpu.get("vs_gpu_estimate_mfu15"),
        "baseline_kind": "analytic_gpu_equivalent_a100_bf16_mfu15",
        # key-collision note (round-4 advisor): rounds 1-3 published
        # vs_baseline as the measured torch-CPU forward ratio; since round 4
        # it is the analytic GPU equivalent above. Cross-round consumers
        # should key on vs_gpu_estimate_mfu15 / vs_torch_cpu_forward_lower_
        # bound, which are unambiguous.
        "vs_baseline_semantics_changed_in": "round 4",
        "vs_torch_cpu_forward_lower_bound": r(vs_torch_cpu),
        "step_ms": r(stats["step_ms"], 2),
        "achieved_tflops": r(stats["achieved_tflops"], 2),
        "analytic_tflops": r(stats["analytic_tflops"], 2),
        "peak_tflops": r(stats["peak_tflops"], 1),
        "mfu": r(stats["mfu"], 4),
        "mfu_analytic": r(stats["mfu_analytic"], 4),
        "cached_image_pairs_per_sec": r(stats["cached_pairs_per_sec"]),
        "batch": BATCH,
        "device": stats["device"],
        "path": "product (YAML->KWClipConfig->make_train_step)",
    }
    row.update(gpu)
    # large-family numbers, measured on hardware via
    # `BENCH_CONFIG=config/speechclip_plus/large/flickr/hybrid_plus.yaml
    #  BENCH_OUT=BENCH_LARGE.json python bench.py` and committed
    # committed sub-benchmarks, measured on hardware via BENCH_CONFIG/
    # BENCH_OUT (large family, WavLM / data2vec upstreams, B=256 recipe)
    here = os.path.dirname(__file__)
    for key, fname in (
        ("large", "BENCH_LARGE.json"),
        ("wavlm_base_plus", "BENCH_WAVLM.json"),
        ("data2vec", "BENCH_D2V.json"),
        ("b256", "BENCH_B256.json"),
    ):
        path = os.path.join(here, fname)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    row[key] = json.load(f)
            except Exception:
                pass
    if os.environ.get("BENCH_OUT"):
        with open(os.environ["BENCH_OUT"], "w") as f:
            json.dump({**{k: (v if v == v else None)
                          for k, v in stats.items()}, "batch": BATCH,
                       "config": os.path.relpath(
                           CONFIG, os.path.dirname(__file__) or ".")}, f,
                      indent=2)
    watchdog.cancel()
    print(json.dumps(row))


if __name__ == "__main__":
    main()
