"""Batching: static-shape padding, length bucketing, threaded prefetch.

The reference collates ragged wav lists with `pad_sequence`
(`avssl/data/collate_function.py:7-36`) and feeds a torch DataLoader with
worker processes (`avssl/task/base_task.py:137-169`). XLA wants a small,
fixed set of shapes, so here:

  - waveforms are random-cropped (train) then padded up to one of a few
    BUCKET lengths -> a handful of compiled graphs instead of one per length;
  - every batch carries `wav`, `wav_len`, `image`, `id`, `text` and a `valid`
    row mask so the final partial batch can be padded to the full batch size
    (padded rows are excluded from the loss via `valid`);
  - a background thread pipelines host decode with device compute (the
    1-process equivalent of the reference's njobs workers; decode is
    numpy/PIL and releases the GIL in the hot parts).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["pad_to_bucket", "collate_batch", "BucketedLoader", "DEFAULT_BUCKETS"]

# multiples of the HuBERT stride (320); top = reference max_audio_len 102400
DEFAULT_BUCKETS = (16000, 32000, 48000, 64000, 80000, 102400)


def pad_to_bucket(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def collate_batch(
    samples: List[Dict],
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    pad_to_size: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Stack a list of dataset items into one padded numpy batch."""
    n = len(samples)
    out: Dict[str, np.ndarray] = {}
    if "wav" in samples[0]:
        lens = np.array([min(len(s["wav"]), buckets[-1]) for s in samples], np.int32)
        t = pad_to_bucket(int(lens.max()), buckets)
        wav = np.zeros((n, t), np.float32)
        for i, s in enumerate(samples):
            w = s["wav"][: lens[i]]
            wav[i, : len(w)] = w
        out["wav"] = wav
        out["wav_len"] = lens
    if "image" in samples[0]:
        out["image"] = np.stack([s["image"] for s in samples]).astype(np.float32)
    if "image_feat" in samples[0]:
        out["image_feat"] = np.stack(
            [s["image_feat"] for s in samples]
        ).astype(np.float32)
    if "text" in samples[0] and not isinstance(samples[0]["text"], str):
        out["text"] = np.stack([np.asarray(s["text"], np.int32) for s in samples])
    if "id" in samples[0]:
        out["id"] = np.array([int(s["id"]) for s in samples], np.int32)
    out["valid"] = np.ones((n,), bool)

    if pad_to_size is not None and n < pad_to_size:
        pad = pad_to_size - n
        for k, v in list(out.items()):
            out[k] = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
            )
        out["valid"][n:] = False
    return out


class BucketedLoader:
    """Iterates epoch batches with optional shuffling, length-sorted
    bucketing (less padding waste) and threaded prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        max_audio_len: int = -1,
        train: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        sort_by_length: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.buckets = tuple(buckets)
        self.max_audio_len = max_audio_len
        self.train = train
        self.seed = seed
        self.prefetch = prefetch
        self.sort_by_length = sort_by_length
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self, rng: np.random.RandomState) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(idx)
        return idx

    def _make_batch(self, indices, rng) -> Dict[str, np.ndarray]:
        from .audio import random_crop_max_length

        samples = []
        for i in indices:
            s = dict(self.dataset[int(i)])
            if self.train and "wav" in s and self.max_audio_len > 0:
                s["wav"] = random_crop_max_length(
                    s["wav"], self.max_audio_len, rng=rng
                )
            samples.append(s)
        pad_to = self.batch_size if not self.drop_last else None
        return collate_batch(samples, self.buckets, pad_to_size=pad_to)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        order = self._index_order(rng)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._make_batch(b, rng))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
