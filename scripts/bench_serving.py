#!/usr/bin/env python3
"""Serving latency/throughput: speech -> top-k image retrieval.

Flagship model (HuBERT-base + ViT-B/32 hybrid+, random weights — timing
only), device-resident index of N images, single jitted query dispatch
(`serving.SpeechRetriever`). Reports single-utterance latency (the
interactive case) and batched throughput (the bulk case).

Usage: python scripts/bench_serving.py [--index-size 5000] [--batch 64]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-size", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--wav-len", type=int, default=102400)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--wire", choices=("f32", "int16"), default="f32",
                    help="waveform wire format: float32 decode or native "
                         "int16 PCM (half the host->device bytes; scaled "
                         "1/32768 on device)")
    args = ap.parse_args()

    import jax

    from speechclip_plus_tpu.api import SpeechCLIP
    from speechclip_plus_tpu.models import KWClip
    from speechclip_plus_tpu.serving import RetrievalIndex, SpeechRetriever
    from speechclip_plus_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    wav = rng.randn(2, args.wav_len).astype(np.float32)
    init_batch = {
        "wav": wav,
        "wav_len": np.full((2,), args.wav_len, np.int32),
        "image": rng.randn(2, cfg.clip.image_resolution,
                           cfg.clip.image_resolution, 3).astype(np.float32),
        "id": np.arange(2, dtype=np.int32),
    }
    print(f"[{time.strftime('%H:%M:%S')}] init ...", flush=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, init_batch, training=False
    )
    sc = SpeechCLIP(model, variables)
    # synthetic pre-embedded index (embedding cost is a one-time build)
    d = cfg.clip.embed_dim
    index = RetrievalIndex(
        rng.randn(args.index_size, d).astype(np.float32),
        np.arange(args.index_size),
    )
    retr = SpeechRetriever(sc, index, feat_src="parallel")

    def bench(n_wavs, label):
        if args.wire == "int16":
            wavs = [(rng.randn(args.wav_len) * 4000).astype(np.int16)
                    for _ in range(n_wavs)]
        else:
            wavs = [rng.randn(args.wav_len).astype(np.float32)
                    for _ in range(n_wavs)]
        retr.search(wavs, k=args.k)  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            ids, _ = retr.search(wavs, k=args.k)
            times.append(time.perf_counter() - t0)
        times.sort()
        p50 = times[len(times) // 2]
        p99 = times[min(len(times) - 1, int(len(times) * 0.99))]
        print(f"{label}: p50 {p50 * 1e3:.1f} ms  p99 {p99 * 1e3:.1f} ms  "
              f"({n_wavs / p50:.1f} queries/s)", flush=True)
        return p50

    def bench_pipelined(n_batches, label):
        """Sustained pipelined throughput: `search_stream` keeps 2 query
        batches in flight, overlapping each upload (the dominant cost on a
        network-attached chip) with the previous batch's compute."""
        def mk():
            if args.wire == "int16":
                return [(rng.randn(args.wav_len) * 4000).astype(np.int16)
                        for _ in range(args.batch)]
            return [rng.randn(args.wav_len).astype(np.float32)
                    for _ in range(args.batch)]

        batches = [mk() for _ in range(n_batches)]
        # compile + warm
        next(iter(retr.search_stream(batches[:1], k=args.k)))
        t0 = time.perf_counter()
        n = 0
        for ids, _ in retr.search_stream(batches, k=args.k, depth=2):
            n += len(ids)
        dt = time.perf_counter() - t0
        print(f"{label}: {n} queries in {dt:.2f}s = {n / dt:.1f} queries/s",
              flush=True)
        return n / dt

    def bench_compute_floor(label):
        """Pure on-chip bound: device-RESIDENT padded waveforms, chained
        dispatch of the jitted query, one host sync per timed window — no
        tunnel upload or top-k fetch in the measured loop. This is the
        ceiling the transfer-bound end-to-end numbers should be read
        against (round-4 verdict #7)."""
        import jax.numpy as jnp

        w = jax.device_put(
            jnp.asarray(rng.randn(args.batch, args.wav_len), jnp.float32)
        )
        lens = jax.device_put(
            jnp.full((args.batch,), args.wav_len, jnp.int32)
        )
        out = retr._query(sc.variables, w, lens, index.feats, k=args.k)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = retr._query(sc.variables, w, lens, index.feats, k=args.k)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        qps = args.batch / dt
        print(f"{label}: {dt * 1e3:.1f} ms/batch = {qps:.1f} queries/s/chip "
              "(no transfers)", flush=True)
        return qps

    print(f"device={jax.devices()[0].device_kind} index={args.index_size} "
          f"k={args.k} wav={args.wav_len / 16000:.1f}s wire={args.wire}",
          flush=True)
    bench(1, "single query (end-to-end, incl. host pad + top-k fetch)")
    p50 = bench(args.batch, f"batch {args.batch}")
    print(f"throughput (serialized): {args.batch / p50:.1f} queries/s/chip")
    rate = bench_pipelined(max(args.iters // 2, 6),
                           f"pipelined batch {args.batch} x depth 2")
    print(f"throughput (pipelined): {rate:.1f} queries/s/chip")
    floor = bench_compute_floor(
        f"compute floor (device-resident batch {args.batch})"
    )
    print(f"compute_floor_qps: {floor:.1f}")


if __name__ == "__main__":
    main()
