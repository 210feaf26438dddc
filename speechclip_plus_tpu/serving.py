"""Batched inference + retrieval serving.

The reference stops at library-style embedding extraction (`example.py`);
this module is the production-serving layer on top of it: a device-resident
image index and a single-dispatch jitted query path (speech encode -> feature
pick -> normalized score matmul -> top-k), bucketed so repeat queries never
recompile.

TPU shape discipline: the index is one static (N, D) fp32 matrix (scores ride
the MXU), waveforms bucket to the `api._pad_wavs` lengths, and `k` is static —
each (bucket, batch, k) triple compiles once and is cached by jit.

Reference anchors: retrieval scoring = `avssl/model/kwClip.py:448-482`
(dedup by id, audio @ image^T, argsort); feature choice =
`retrieval.audio_feat_src`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .api import SpeechCLIP, _pad_wavs, _wav_to_f32
from .models.kwclip import KWClip

__all__ = [
    "RetrievalIndex",
    "SpeechRetriever",
    "PendingSearch",
    "build_image_index",
]


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class RetrievalIndex:
    """Device-resident L2-normalized image-embedding matrix + ids."""

    def __init__(self, feats: np.ndarray, ids: Sequence[int]):
        assert feats.ndim == 2, feats.shape
        assert len(ids) == feats.shape[0]
        self.feats = jax.device_put(
            np.asarray(
                np.asarray(feats, np.float32)
                / np.maximum(
                    np.linalg.norm(feats, axis=-1, keepdims=True), 1e-8
                ),
            )
        )
        self.ids = np.asarray(ids)

    def __len__(self) -> int:
        return int(self.feats.shape[0])


def build_image_index(
    speechclip: SpeechCLIP,
    images: np.ndarray,
    ids: Sequence[int],
    batch_size: int = 256,
) -> RetrievalIndex:
    """Embed images through the frozen tower in fixed-size batches.

    `images` is (N, H, W, 3) preprocessed pixels; duplicate ids should be
    deduped by the caller (the reference keeps one image per id,
    `kwClip.py:448-458`).
    """
    model, variables = speechclip.model, speechclip.variables

    @jax.jit
    def embed(v, img):
        return model.apply(v, img, method=KWClip.encode_image_raw)

    n = images.shape[0]
    feats = []
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:  # keep the compiled shape
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        out = np.asarray(embed(variables, jnp.asarray(chunk)))
        feats.append(out[: batch_size - pad] if pad else out)
    return RetrievalIndex(np.concatenate(feats), ids)


class SpeechRetriever:
    """Speech -> top-k image retrieval with a single jitted dispatch."""

    def __init__(
        self,
        speechclip: SpeechCLIP,
        index: RetrievalIndex,
        feat_src: Optional[str] = None,
    ):
        self.sc = speechclip
        self.index = index
        cfg = speechclip.cfg
        if feat_src is None:
            feat_src = cfg.retrieval_audio_feat_src
        if feat_src not in ("parallel", "cascaded"):
            raise ValueError(f"unknown feat_src {feat_src!r}")
        self.feat_src = feat_src
        model = speechclip.model

        @partial(jax.jit, static_argnames=("k",))
        def query(variables, wav, wav_len, index_feats, *, k):
            out = model.apply(
                variables, _wav_to_f32(wav), wav_len,
                method=KWClip.encode_speech,
            )
            feat = out[f"{self.feat_src}_audio_feat"]
            if feat is None:
                raise ValueError(
                    f"model produces no {self.feat_src} features"
                )
            scores = _l2_normalize(feat) @ index_feats.T  # (B, N) cosines
            top_scores, top_idx = jax.lax.top_k(scores, k)
            return top_scores, top_idx

        self._query = query

        @partial(jax.jit, static_argnames=("k",))
        def text_query(variables, text_ids, index_feats, *, k):
            txt = model.apply(
                variables, text_ids,
                method=lambda m, t: m.clip.encode_text(t),
            )
            scores = _l2_normalize(txt) @ index_feats.T
            return jax.lax.top_k(scores, k)

        self._text_query = text_query
        self._text_processor = None
        if speechclip.tokenizer is not None:
            from .data.tokenizer import ClipTextProcessor

            self._text_processor = ClipTextProcessor(
                speechclip.tokenizer, speechclip.vocab
            )

    def search_text(
        self, texts: Sequence[str], k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k image ids + cosine scores per text query (CLIP text tower,
        reduced-vocab ids when the model carries a reduced vocabulary) —
        the same device-resident index answers both modalities."""
        if self._text_processor is None:
            raise ValueError(
                "text queries need a tokenizer: load the model via "
                "api.load_from_checkpoint with the config's bpe_path, or "
                "construct SpeechCLIP(..., tokenizer=..., vocab=...)"
            )
        k = min(int(k), len(self.index))
        ids = jnp.asarray(self._text_processor.prep_text(
            list(texts), context_length=self.sc.cfg.clip.context_length
        ))
        scores, idx = self._text_query(
            self.sc.variables, ids, self.index.feats, k=k
        )
        return self.index.ids[np.asarray(idx)], np.asarray(scores)

    def search(
        self, wavs: Sequence[np.ndarray], k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k image ids + cosine scores per waveform (ragged input).

        Waveforms may be float32 (decoder output) or int16 PCM (the native
        wire format): int16 batches cross the host->device link at half the
        bytes and are scaled by 1/32768 on device — bit-identical to
        feeding `wav.astype(np.float32) / 32768`.
        """
        return self.submit(wavs, k).result()

    def submit(self, wavs: Sequence[np.ndarray], k: int = 10) -> "PendingSearch":
        """Asynchronously dispatch a query batch; returns a PendingSearch.

        The H2D transfer starts immediately (async `device_put`) and the
        jitted query is enqueued behind it — neither blocks the host, so a
        caller that submits batch i+1 while batch i computes overlaps
        i+1's upload (the dominant cost through a network-attached chip,
        PERF.md §5) with i's compute. `search_stream` packages that
        double-buffering; `result()` blocks for the final top-k fetch.
        """
        k = min(int(k), len(self.index))
        w, l = _pad_wavs(wavs)
        # async H2D: returns immediately with the transfer in flight; the
        # dispatch below enqueues against the incoming buffer
        w = jax.device_put(w)
        l = jax.device_put(l)
        scores, idx = self._query(
            self.sc.variables, w, l, self.index.feats, k=k
        )
        return PendingSearch(self.index, scores, idx)

    def search_stream(
        self, batches, k: int = 10, depth: int = 2
    ):
        """Pipelined bulk retrieval: yields (ids, scores) per input batch,
        in order, keeping up to `depth` query batches in flight so uploads
        overlap compute (double-buffering at depth=2)."""
        from collections import deque

        pending: deque = deque()
        for wavs in batches:
            # drain before submitting so at most `depth` batches are ever
            # in flight (submit-then-pop briefly held depth+1)
            while len(pending) >= depth:
                yield pending.popleft().result()
            pending.append(self.submit(wavs, k))
        while pending:
            yield pending.popleft().result()


class PendingSearch:
    """Handle for an in-flight retrieval query (async submit/poll surface)."""

    def __init__(self, index: RetrievalIndex, scores, idx):
        self._index = index
        self._scores = scores
        self._idx = idx

    def done(self) -> bool:
        """Non-blocking completion poll."""
        try:
            return self._idx.is_ready()
        except AttributeError:  # older jax Array without is_ready
            return True

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        """Block until the query finishes; returns (ids, scores)."""
        return (
            self._index.ids[np.asarray(self._idx)],
            np.asarray(self._scores),
        )
