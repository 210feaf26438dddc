"""Serving layer: device-resident retrieval index + jitted top-k query."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechclip_plus_tpu.api import SpeechCLIP
from speechclip_plus_tpu.models import KWClip
from speechclip_plus_tpu.serving import SpeechRetriever, build_image_index

from test_kwclip_model import make_batch, tiny_cfg

pytestmark = pytest.mark.slow


def _speechclip(branch_type="HybridBranch_plus"):
    cfg = tiny_cfg(branch_type)
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, training=False
    )
    return SpeechCLIP(model, variables), cfg


def test_search_matches_numpy_ranking():
    sc, cfg = _speechclip()
    rng = np.random.RandomState(1)
    images = rng.randn(8, 32, 32, 3).astype(np.float32)
    index = build_image_index(sc, images, ids=np.arange(100, 108),
                              batch_size=3)  # uneven batching exercised
    assert len(index) == 8

    retr = SpeechRetriever(sc, index, feat_src="parallel")
    wavs = [rng.randn(n).astype(np.float32) for n in (900, 700, 650, 900)]
    ids, scores = retr.search(wavs, k=3)
    assert ids.shape == (4, 3) and scores.shape == (4, 3)
    # scores are descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)

    # oracle: encode through the library API, rank in numpy
    out = sc.encode_speech(wavs)
    feat = np.asarray(out["parallel_audio_feat"], np.float32)
    feat = feat / np.maximum(np.linalg.norm(feat, axis=-1, keepdims=True), 1e-8)
    ref_scores = feat @ np.asarray(index.feats).T
    ref_top = np.argsort(-ref_scores, axis=1)[:, :3]
    np.testing.assert_array_equal(ids, np.arange(100, 108)[ref_top])
    np.testing.assert_allclose(
        scores, np.take_along_axis(ref_scores, ref_top, axis=1), rtol=1e-5
    )


def test_search_int16_pcm_matches_float():
    """int16 PCM waveforms (half the wire bytes) rank identically to the
    float32 decode `wav.astype(f32)/32768` — the conversion moves on device,
    the numerics don't."""
    sc, cfg = _speechclip()
    rng = np.random.RandomState(3)
    images = rng.randn(6, 32, 32, 3).astype(np.float32)
    index = build_image_index(sc, images, ids=np.arange(6), batch_size=6)
    retr = SpeechRetriever(sc, index, feat_src="parallel")

    pcm = [
        (rng.randn(n) * 4000).astype(np.int16) for n in (900, 700, 650)
    ]
    ids_i16, scores_i16 = retr.search(pcm, k=4)
    ids_f32, scores_f32 = retr.search(
        [w.astype(np.float32) / 32768.0 for w in pcm], k=4
    )
    np.testing.assert_array_equal(ids_i16, ids_f32)
    np.testing.assert_allclose(scores_i16, scores_f32, atol=1e-6)

    # mixed-dtype lists fall back to the float32 wire
    from speechclip_plus_tpu.api import _pad_wavs

    w, _ = _pad_wavs([pcm[0], pcm[1].astype(np.float32)])
    assert w.dtype == np.float32
    w, _ = _pad_wavs(pcm)
    assert w.dtype == np.int16


def test_search_text_matches_numpy_ranking(tmp_path):
    """Text queries hit the same device-resident index through the CLIP
    text tower; ranking must match a numpy oracle over the same ids."""
    import dataclasses

    from speechclip_plus_tpu.data.tokenizer import SimpleTokenizer
    from speechclip_plus_tpu.models.clip import ClipConfig

    merges = ["#version: 0.2", "a t</w>", "c at</w>", "d o", "do g</w>",
              "r u", "ru n", "run s</w>", "t h", "th e</w>"]
    bpe = tmp_path / "merges.txt"
    bpe.write_text("\n".join(merges) + "\n")
    tok = SimpleTokenizer(str(bpe))

    cfg = tiny_cfg("HybridBranch_plus")
    cfg = dataclasses.replace(
        cfg,
        clip=ClipConfig.tiny(
            text_width=32, embed_dim=32, vocab_size=tok.vocab_size,
            sot_id=tok.sot, eot_id=tok.eot,
        ),
    )
    model = KWClip(cfg)
    rng = np.random.RandomState(5)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, training=False
    )
    sc = SpeechCLIP(model, variables, tokenizer=tok)

    images = rng.randn(7, 32, 32, 3).astype(np.float32)
    index = build_image_index(sc, images, ids=np.arange(20, 27), batch_size=7)
    retr = SpeechRetriever(sc, index, feat_src="parallel")

    texts = ["the cat runs", "a dog", "cat dog runs the"]
    ids, scores = retr.search_text(texts, k=3)
    assert ids.shape == (3, 3) and scores.shape == (3, 3)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)

    # numpy oracle over the same token ids + tower
    tid = retr._text_processor.prep_text(texts, context_length=16)
    txt = np.asarray(model.apply(
        variables, jnp.asarray(tid), method=lambda m, t: m.clip.encode_text(t)
    ), np.float32)
    txt = txt / np.maximum(np.linalg.norm(txt, axis=-1, keepdims=True), 1e-8)
    ref = txt @ np.asarray(index.feats).T
    top = np.argsort(-ref, axis=1)[:, :3]
    np.testing.assert_array_equal(ids, np.arange(20, 27)[top])

    # without a tokenizer the error is actionable
    sc2 = SpeechCLIP(model, variables)
    retr2 = SpeechRetriever(sc2, index, feat_src="parallel")
    with pytest.raises(ValueError, match="tokenizer"):
        retr2.search_text(["x"])


def test_search_cascaded_source_and_k_clamp():
    sc, cfg = _speechclip()
    rng = np.random.RandomState(2)
    images = rng.randn(4, 32, 32, 3).astype(np.float32)
    index = build_image_index(sc, images, ids=[7, 8, 9, 10], batch_size=4)
    retr = SpeechRetriever(sc, index, feat_src="cascaded")
    ids, scores = retr.search([rng.randn(800).astype(np.float32)], k=99)
    assert ids.shape == (1, 4)  # k clamped to index size
    assert np.all(np.isfinite(scores))


def test_async_submit_and_stream_match_sync_search():
    """submit()/PendingSearch and the pipelined search_stream must return
    exactly what the synchronous search returns, in order."""
    sc, cfg = _speechclip()
    rng = np.random.RandomState(7)
    images = rng.randn(6, 32, 32, 3).astype(np.float32)
    index = build_image_index(sc, images, ids=np.arange(6), batch_size=6)
    retr = SpeechRetriever(sc, index, feat_src="parallel")

    batches = [
        [rng.randn(900).astype(np.float32) for _ in range(3)]
        for _ in range(5)
    ]
    sync = [retr.search(b, k=4) for b in batches]

    # async submit/poll
    pend = retr.submit(batches[0], k=4)
    assert pend.done() in (True, False)  # poll is non-blocking either way
    ids, scores = pend.result()
    np.testing.assert_array_equal(ids, sync[0][0])
    np.testing.assert_allclose(scores, sync[0][1], rtol=1e-6)
    assert pend.done() is True  # after result(), must report ready

    # pipelined stream keeps 2 in flight; results come back in order
    got = list(retr.search_stream(batches, k=4, depth=2))
    assert len(got) == len(batches)
    for (g_ids, g_scores), (s_ids, s_scores) in zip(got, sync):
        np.testing.assert_array_equal(g_ids, s_ids)
        np.testing.assert_allclose(g_scores, s_scores, rtol=1e-6)
