#!/usr/bin/env python3
"""Generate a Flickr8k-SHAPED synthetic dataset on disk.

Purpose: run the FULL product training loop (`run_task.py --train`) on real
TPU hardware in this zero-egress environment — loader workers decoding real
wav/jpg files, length bucketing, fit/validation/retrieval, orbax saves,
artifacts — exactly the tree `FlickrDataset` parses
(reference `avssl/data/flickr_dataset.py:15-158`):

  <root>/flickr_audio/wavs/<name>_<sub>.wav   16 kHz 16-bit PCM
  <root>/Images/<name>.jpg                    RGB JPEG
  <root>/Flickr8k.token.txt                   "<name>.jpg#<sub> <caption>"
  <root>/Flickr8k_idPairs.json                {"filename2Id": ...}
  <root>/Flickr_8k.{train,dev,test}Images.txt

Content is random but PAIRED: each image id deterministically seeds both its
image pixels and the band-limited tone mixture in its wavs, so the
contrastive objective has real audio->image structure to learn (the loss
curve must decrease for reasons beyond memorizing the batch ids).
"""
import argparse
import json
import os
import wave

import numpy as np


def _write_wav(path, wav, sr=16000):
    pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


WORDS = (
    "dog cat man woman child boat water grass tree red blue green jumping "
    "running sitting playing ball park beach mountain snow bike street "
    "group person wearing shirt standing walking field air rock climbs"
).split()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(os.path.dirname(__file__), "..", ".synth_data", "flickr"))
    ap.add_argument("--train-images", type=int, default=800)
    ap.add_argument("--dev-images", type=int, default=120)
    ap.add_argument("--test-images", type=int, default=40)
    ap.add_argument("--caps-per-image", type=int, default=5)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    root = args.root
    os.makedirs(os.path.join(root, "flickr_audio", "wavs"), exist_ok=True)
    os.makedirs(os.path.join(root, "Images"), exist_ok=True)

    rng = np.random.RandomState(args.seed)
    splits = {
        "train": args.train_images,
        "dev": args.dev_images,
        "test": args.test_images,
    }
    filename2id = {}
    id2filename = {}
    captions = []
    next_id = 0
    t_axis = None

    for split, n_img in splits.items():
        names = []
        for i in range(n_img):
            name = f"synth_{split}_{i:05d}"
            names.append(name + ".jpg")
            filename2id[name] = next_id
            id2filename[str(next_id)] = name

            # image: colored gradient + blobs, deterministic per id
            g = np.random.RandomState(1000 + next_id)
            yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
            base = np.stack(
                [
                    g.rand() * xx + g.rand() * yy,
                    g.rand() * (1 - xx) + g.rand() * yy,
                    g.rand() * xx * yy + g.rand(),
                ],
                axis=-1,
            )
            for _ in range(4):
                cy, cx, r = g.rand(3)
                blob = np.exp(
                    -(((yy - cy) ** 2 + (xx - cx) ** 2) / (0.02 + 0.05 * r))
                )
                base += blob[..., None] * g.rand(3)
            img = (255 * (base - base.min()) / (np.ptp(base) + 1e-6)).astype(
                np.uint8
            )
            Image.fromarray(img).save(
                os.path.join(root, "Images", name + ".jpg"), quality=85
            )

            # audio: tone mixture whose frequencies/envelope derive from the
            # SAME per-id generator -> learnable audio<->image correspondence
            freqs = 80.0 + 3000.0 * g.rand(6)
            amps = 0.3 + 0.7 * g.rand(6)
            for sub in range(args.caps_per_image):
                dur = rng.uniform(2.0, 6.4)
                n = int(dur * args.sr)
                if t_axis is None or len(t_axis) < n:
                    t_axis = np.arange(int(6.5 * args.sr)) / args.sr
                t = t_axis[:n]
                wav = sum(
                    a * np.sin(2 * np.pi * f * t * (1 + 0.01 * sub))
                    for f, a in zip(freqs, amps)
                )
                wav += 0.05 * rng.randn(n)
                wav = (wav / (np.abs(wav).max() + 1e-6)) * 0.7
                _write_wav(
                    os.path.join(
                        root, "flickr_audio", "wavs", f"{name}_{sub}.wav"
                    ),
                    wav.astype(np.float32),
                    args.sr,
                )
                cap = " ".join(
                    rng.choice(WORDS, size=rng.randint(5, 12), replace=True)
                )
                captions.append(f"{name}.jpg#{sub}\t{cap} .")
            next_id += 1

        with open(
            os.path.join(root, f"Flickr_8k.{split}Images.txt"), "w"
        ) as f:
            f.write("\n".join(names) + "\n")

    with open(os.path.join(root, "Flickr8k.token.txt"), "w") as f:
        f.write("\n".join(captions) + "\n")
    with open(os.path.join(root, "Flickr8k_idPairs.json"), "w") as f:
        json.dump(
            {"filename2Id": filename2id, "id2Filename": id2filename}, f
        )
    n_wavs = sum(splits.values()) * args.caps_per_image
    print(f"synthetic Flickr tree at {root}: "
          f"{sum(splits.values())} images, {n_wavs} wavs")


if __name__ == "__main__":
    main()
