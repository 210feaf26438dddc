"""Hermetic data-pipeline tests with synthetic on-disk datasets.

Covers: Flickr8k directory parsing (reference `flickr_dataset.py:15-158`),
SpokenCOCO json parsing (`coco_dataset.py:15-92`), wav decode + layer norm
(`base_dataset.py:70-147`), CLIP image transform, BPE tokenizer (vs the
HF CLIPTokenizer oracle built from the same merge table), static-shape
bucketing collate and the prefetching loader.
"""
import json
import os
import wave

import numpy as np
import pytest
from PIL import Image

from speechclip_plus_tpu.data import (
    BucketedLoader,
    CoCoDataset,
    FlickrDataset,
    ReducedVocab,
    SimpleTokenizer,
    collate_batch,
    load_wav,
)
from speechclip_plus_tpu.data.image import clip_image_transform


def write_wav(path, n, sr=16000, seed=0):
    rng = np.random.RandomState(seed)
    data = (rng.randn(n) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


@pytest.fixture()
def flickr_root(tmp_path):
    root = tmp_path / "flickr"
    (root / "flickr_audio" / "wavs").mkdir(parents=True)
    (root / "Images").mkdir()
    names = [f"img{i}" for i in range(3)]
    id_pairs = {"filename2Id": {n: i for i, n in enumerate(names)},
                "id2Filename": {str(i): n for i, n in enumerate(names)}}
    (root / "Flickr8k_idPairs.json").write_text(json.dumps(id_pairs))
    cap_lines = []
    for i, n in enumerate(names):
        img = Image.fromarray(
            (np.random.RandomState(i).rand(40, 60, 3) * 255).astype(np.uint8)
        )
        img.save(root / "Images" / f"{n}.jpg")
        for sub in range(2):
            write_wav(root / "flickr_audio" / "wavs" / f"{n}_{sub}.wav",
                      8000 + 1000 * sub, seed=i * 10 + sub)
            cap_lines.append(f"{n}.jpg#{sub}\ta dog runs in field {i} .")
    # an artifact file that must be skipped (reference :134-137)
    write_wav(root / "flickr_audio" / "wavs" / "img0_txt.wav", 1000)
    (root / "Flickr8k.token.txt").write_text("\n".join(cap_lines))
    (root / "Flickr_8k.trainImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in names[:2])
    )
    (root / "Flickr_8k.devImages.txt").write_text(f"{names[2]}.jpg\n")
    return root


def test_flickr_parsing_and_items(flickr_root):
    ds = FlickrDataset(
        str(flickr_root), split="train", normalize_waveform=True
    )
    assert len(ds) == 4  # 2 images x 2 captions
    item = ds[0]
    assert item["wav"].dtype == np.float32
    assert abs(float(item["wav"].mean())) < 1e-4  # layer-normed
    assert item["image"].shape == (224, 224, 3)
    assert isinstance(item["text"], str)
    dev = FlickrDataset(str(flickr_root), split="dev")
    assert len(dev) == 2
    assert {s.id for s in dev.data} == {2}


def test_coco_parsing(tmp_path):
    root = tmp_path / "coco"
    (root / "SpokenCOCO" / "wavs").mkdir(parents=True)
    (root / "mscoco_img").mkdir()
    img = Image.fromarray((np.random.rand(30, 30, 3) * 255).astype(np.uint8))
    img.save(root / "mscoco_img" / "COCO_val2014_000000000042.jpg")
    write_wav(root / "SpokenCOCO" / "wavs" / "a.wav", 4000)
    data = {"data": [{
        "image": "COCO_val2014_000000000042.jpg",
        "captions": [{"wav": "wavs/a.wav", "text": "A Cat"}],
    }]}
    (root / "SpokenCOCO" / "SpokenCOCO_val.json").write_text(json.dumps(data))
    ds = CoCoDataset(str(root), split="val")
    assert len(ds) == 1
    item = ds[0]
    assert int(item["id"]) == 42
    assert item["text"] == "a cat"


def test_load_wav_resample(tmp_path):
    p = tmp_path / "x.wav"
    write_wav(p, 8000, sr=8000)
    out = load_wav(str(p), target_sr=16000)
    assert abs(len(out) - 16000) <= 16


def test_clip_image_transform_matches_torchvision_style():
    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(100, 160, 3) * 255).astype(np.uint8))
    out = clip_image_transform(img, 32)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------- tokenizer ----


@pytest.fixture(scope="module")
def tiny_bpe(tmp_path_factory):
    """Tiny merge table in bpe_simple_vocab_16e6 format."""
    d = tmp_path_factory.mktemp("bpe")
    merges = [
        "#version: 0.2",
        "a t</w>", "c at</w>", "d o", "do g</w>", "r u", "ru n", "run s</w>",
        "t h", "th e</w>", "i n</w>",
    ]
    path = d / "merges.txt"
    path.write_text("\n".join(merges) + "\n")
    return str(path)


def test_tokenizer_roundtrip(tiny_bpe):
    tok = SimpleTokenizer(tiny_bpe)
    ids = tok.encode("the cat runs at a dog")
    assert tok.decode(ids) == "the cat runs at a dog"
    batch = tok.tokenize(["a cat", "the dog runs"], context_length=16)
    assert batch.shape == (2, 16)
    assert (batch[:, 0] == tok.sot).all()
    assert (batch == tok.eot).sum() == 2


def test_tokenizer_matches_hf_clip_oracle(tiny_bpe, tmp_path):
    transformers = pytest.importorskip("transformers")
    tok = SimpleTokenizer(tiny_bpe)
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(json.dumps(tok.encoder))
    hf = transformers.CLIPTokenizer(
        vocab_file=str(vocab_path), merges_file=tiny_bpe
    )
    for text in ["the cat runs", "a dog!", "cat cat cat", "it's a dog."]:
        ours = tok.encode(text)
        ref = hf(text, add_special_tokens=False)["input_ids"]
        assert ours == ref, (text, ours, ref)


def test_reduced_vocab_maps():
    usage = np.array([[0, 100], [5, 50], [49406, 10], [49407, 10], [7, 5]])
    rv = ReducedVocab(usage)
    assert len(rv) == 5
    assert rv.sot_reduced == 2 and rv.eot_reduced == 3
    np.testing.assert_array_equal(rv.to_reduced([0, 5, 7]), [0, 1, 4])
    np.testing.assert_array_equal(rv.to_original([0, 1, 4]), [0, 5, 7])


# ------------------------------------------------------------ collate ----


def test_collate_and_loader(flickr_root):
    from speechclip_plus_tpu.data.tokenizer import SimpleTokenizer  # noqa: F401

    ds = FlickrDataset(str(flickr_root), split="train")
    loader = BucketedLoader(
        ds, batch_size=3, shuffle=True, drop_last=False,
        buckets=(8000, 16000), max_audio_len=8000, train=True, prefetch=1,
    )
    batches = list(loader)
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["wav"].shape[0] == 3 and b0["wav"].shape[1] in (8000, 16000)
    assert b0["image"].shape == (3, 224, 224, 3)
    assert b0["valid"].all()
    b1 = batches[1]
    assert b1["valid"].sum() == 1 and b1["wav"].shape[0] == 3  # padded final batch

    # padded wav positions must be zero
    for b in batches:
        for i in range(len(b["wav_len"])):
            assert (b["wav"][i, b["wav_len"][i]:] == 0).all()


def test_random_crop_max_length_shapes():
    """Reference test_audio_transform.py:5-12 semantics."""
    from speechclip_plus_tpu.data import random_crop_max_length

    rng = np.random.RandomState(0)
    wav = rng.randn(1000).astype(np.float32)
    assert len(random_crop_max_length(wav, 500, rng=rng)) == 500
    assert len(random_crop_max_length(wav, 2000, rng=rng)) == 1000
    assert len(random_crop_max_length(wav, -1, rng=rng)) == 1000
    # crop is a contiguous window of the source
    crop = random_crop_max_length(wav, 100, rng=np.random.RandomState(1))
    found = any(
        np.array_equal(crop, wav[i:i + 100]) for i in range(0, 901)
    )
    assert found


def test_clip_text_processor_roundtrip(tiny_bpe):
    from speechclip_plus_tpu.data import ClipTextProcessor, ReducedVocab, SimpleTokenizer

    tok = SimpleTokenizer(tiny_bpe)
    # reduced vocab covering the ids the captions use
    ids_used = sorted(set(tok.encode("the cat runs at a dog")) | {0, tok.sot, tok.eot})
    usage = np.array([[i, 10] for i in ids_used], dtype=np.int64)
    rv = ReducedVocab(usage, sot_original=tok.sot, eot_original=tok.eot)
    proc = ClipTextProcessor(tok, rv)

    batch = proc.prep_text(["the cat runs"], context_length=12)
    assert batch.shape == (1, 12)
    assert batch[0, 0] == rv.sot_reduced
    # detokenize strips specials and restores the caption text (pad id 0 maps
    # back to original id 0 = "!", the reference deTokenize quirk - trim it)
    text = proc.detokenize(batch)[0]
    assert text.startswith("the cat runs")


def test_multiprocess_loader_matches_thread_loader(flickr_root):
    """num_workers>0 (forked decode processes, the reference's njobs) must
    yield byte-identical batches in the same order as the thread path —
    training is worker-count-invariant."""
    ds = FlickrDataset(str(flickr_root), split="train")
    kw = dict(
        batch_size=3, shuffle=True, drop_last=False,
        buckets=(8000, 16000), max_audio_len=8000, train=True, seed=3,
    )
    ref = list(BucketedLoader(ds, **kw, num_workers=0))
    got = list(BucketedLoader(ds, **kw, num_workers=2))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_thread_loader_abandoned_iteration_stops_producer(flickr_root):
    """Abandoning an epoch mid-iteration (preemption return, exception) must
    stop the background decode thread instead of leaving it blocked forever
    on the full prefetch queue pinning its batches."""
    import threading
    import time

    ds = FlickrDataset(str(flickr_root), split="train")
    loader = BucketedLoader(
        ds, batch_size=2, shuffle=False, drop_last=False,
        buckets=(8000, 16000), max_audio_len=8000, train=True, seed=3,
        num_workers=0,
    )
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> abandoned.set()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_multiprocess_loader_abandoned_epoch_does_not_poison_next(flickr_root):
    """Stale results from an abandoned epoch (same seq numbers as the next
    one) must be dropped by the generation tag, not misdelivered."""
    ds = FlickrDataset(str(flickr_root), split="train")
    kw = dict(
        batch_size=3, shuffle=True, drop_last=False,
        buckets=(8000, 16000), max_audio_len=8000, train=True, seed=3,
    )
    loader = BucketedLoader(ds, **kw, num_workers=1)
    it = iter(loader)
    next(it)  # epoch 0: consume one batch, abandon the rest in flight
    del it
    got = list(loader)  # epoch 1 must be exactly a fresh loader's epoch 1
    ref_loader = BucketedLoader(ds, **kw, num_workers=0)
    ref_loader.set_epoch(1)
    ref = list(ref_loader)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    loader.close()


class _BoomDS:
    """Module-level (picklable into spawn/forkserver workers)."""

    def __len__(self):
        return 4

    def __getitem__(self, i):
        raise RuntimeError("decode failed")


def test_multiprocess_loader_propagates_worker_errors():
    loader = BucketedLoader(_BoomDS(), batch_size=2, shuffle=False, num_workers=1)
    import pytest

    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader)
