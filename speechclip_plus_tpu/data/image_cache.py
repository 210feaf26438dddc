"""Frozen image-tower embedding cache.

The CLIP image encoder is frozen in every released SpeechCLIP(+) config
(`clip.image_encoder_trainable: false`), yet the reference re-encodes every
image on every training step (`kwClip.py:854`) — for Flickr8k that is 50k
steps x 256 images through a ViT for ~30k distinct images. Precomputing the
(pre-projection) image features once removes the entire image tower AND the
per-step host JPEG decode from the training loop; the trainable projection +
normalization still run in-step (`models/kwclip.py:project_image_feat`).

Enable with `data.cache_image_embeddings: true` in the config.
"""
from __future__ import annotations

import logging
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["precompute_image_embeddings", "CachedImageDataset"]


def precompute_image_embeddings(
    model, variables, dataset, batch_size: int = 64
) -> Dict[str, np.ndarray]:
    """path -> raw frozen image feature (np.float32 (D,))."""
    import jax
    import jax.numpy as jnp

    from ..models.kwclip import KWClip

    paths = sorted({s.image_path for s in dataset.data if s.image_path})
    encode = jax.jit(
        lambda v, img: model.apply(v, img, method=KWClip.encode_image_raw)
    )
    out: Dict[str, np.ndarray] = {}
    size = model.cfg.clip.image_resolution
    from PIL import Image

    from .image import clip_image_transform

    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        imgs = []
        for p in chunk:
            with Image.open(p) as im:
                imgs.append(clip_image_transform(im, size))
        arr = np.stack(imgs).astype(np.float32)
        if len(chunk) < batch_size:  # pad to the compiled batch shape
            arr = np.concatenate(
                [arr, np.zeros((batch_size - len(chunk),) + arr.shape[1:],
                               np.float32)]
            )
        feats = np.asarray(encode(variables, jnp.asarray(arr)))
        for p, f in zip(chunk, feats):
            out[p] = f
    logger.info("cached %d image embeddings", len(out))
    return out


class CachedImageDataset:
    """Wraps a dataset: items carry `image_feat` instead of `image`."""

    def __init__(self, dataset, feats: Dict[str, np.ndarray]):
        self.dataset = dataset
        self.dataset.load_image = False  # skip per-item JPEG decode entirely
        self.feats = feats
        self.data = dataset.data

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        s = self.dataset.data[index]
        item = dict(self.dataset[index])
        item.pop("image", None)
        if s.image_path is not None:
            item["image_feat"] = self.feats[s.image_path]
        return item
