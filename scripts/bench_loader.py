#!/usr/bin/env python3
"""Host data-pipeline rate: can the loader feed the chip?

VERDICT round-1 task 5 acceptance: a loader-only benchmark showing the
multi-process `BucketedLoader` sustains >= the device step rate at B=128,
with the image-embedding cache on and off. Builds a synthetic
Flickr8k-shaped dataset on disk (real JPEG + WAV decode work at realistic
sizes: ~5 s 16 kHz audio, 500x375 JPEG), then measures pairs/s through
`FlickrDataset` + `BucketedLoader` for several worker counts.

Device reference rates (v5e, hybrid+ base B=128, this round's bench):
453 pairs/s (parity config) / 527 (frozen_dropout off).

Measured on this (1-CPU!) dev box: cache_on workers=0 = 1037 pairs/s —
the product-default path (frozen towers -> data.cache_image_embeddings on)
clears the device rate 2x single-threaded, because audio+text decode is
~0.12 ms/pair. cache_off is JPEG-decode-bound (~12.7 ms/pair warm), so it
needs ~7 workers at device rate — a real TPU-VM host (~100+ vCPUs) has
them; a 1-CPU box cannot demonstrate the scaling (worker counts > CPUs
just add context switches).

Usage: python scripts/bench_loader.py [--pairs 768] [--batch 128]
"""
import argparse
import json
import os
import sys
import tempfile
import time
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_world(root, n_images, caps_per_image=2, sr=16000, seconds=5.0):
    from PIL import Image

    os.makedirs(os.path.join(root, "flickr_audio", "wavs"), exist_ok=True)
    os.makedirs(os.path.join(root, "Images"), exist_ok=True)
    rng = np.random.RandomState(0)
    names = [f"img{i}" for i in range(n_images)]
    id_pairs = {"filename2Id": {n: i for i, n in enumerate(names)},
                "id2Filename": {str(i): n for i, n in enumerate(names)}}
    with open(os.path.join(root, "Flickr8k_idPairs.json"), "w") as f:
        json.dump(id_pairs, f)
    cap_lines = []
    for i, n in enumerate(names):
        Image.fromarray(
            (rng.rand(375, 500, 3) * 255).astype(np.uint8)
        ).save(os.path.join(root, "Images", f"{n}.jpg"), quality=90)
        for sub in range(caps_per_image):
            nsamp = int(sr * (seconds + 0.5 * rng.rand()))
            data = (rng.randn(nsamp) * 3000).astype(np.int16)
            with wave.open(
                os.path.join(root, "flickr_audio", "wavs", f"{n}_{sub}.wav"),
                "wb",
            ) as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(data.tobytes())
            cap_lines.append(f"{n}.jpg#{sub}\tthe cat sat on the mat {i}")
    with open(os.path.join(root, "Flickr8k.token.txt"), "w") as f:
        f.write("\n".join(cap_lines))
    with open(os.path.join(root, "Flickr_8k.trainImages.txt"), "w") as f:
        f.write("\n".join(f"{n}.jpg" for n in names))
    return root


def measure(loader, batch_size, epochs=2, warm_batches=2):
    it = iter(loader)
    for _ in range(warm_batches):  # pool spin-up + first decodes
        next(it)
    n = 0
    t0 = time.perf_counter()
    for b in it:
        n += len(b["id"])
    for _ in range(epochs - 1):
        for b in loader:
            n += len(b["id"])
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=768)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 4, 8])
    args = ap.parse_args()

    from speechclip_plus_tpu.data.collate import BucketedLoader
    from speechclip_plus_tpu.data.datasets import FlickrDataset
    from speechclip_plus_tpu.data.image_cache import CachedImageDataset

    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    n_images = max(args.pairs // 2, 2)
    build_world(tmp, n_images)
    print(f"world: {n_images} JPEGs x 2 wavs (~5 s) at {tmp}")

    def fresh_ds():
        # CachedImageDataset flips load_image off on the wrapped dataset, so
        # each configuration gets its own dataset object
        return FlickrDataset(
            dataset_root=tmp, split="train", text_file="Flickr8k.token.txt",
            load_image=True, load_audio=True,
        )

    host_cpus = os.cpu_count()
    print(f"host CPUs: {host_cpus}")
    for label in ("cache_off", "cache_on"):
        for nw in args.workers:
            d = fresh_ds()
            if label == "cache_on":
                # cache ON (the product default for frozen image towers):
                # JPEG decode leaves the loader entirely
                cache = {s.image_path: np.zeros((512,), np.float32)
                         for s in d.data}
                d = CachedImageDataset(d, cache)
            loader = BucketedLoader(
                d, batch_size=args.batch, shuffle=True, drop_last=True,
                train=True, max_audio_len=102400, num_workers=nw,
            )
            rate = measure(loader, args.batch)
            per_worker = rate / max(nw, 1)
            print(f"{label:9s} workers={nw}: {rate:8.1f} pairs/s "
                  f"({per_worker:.1f}/worker)")


if __name__ == "__main__":
    main()
