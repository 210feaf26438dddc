"""End-to-end task-layer test: synthetic Flickr8k-shaped data + tiny-tower
YAML config, driven through the real CLI path (TrainKWClip task -> datasets
-> loaders -> Trainer.fit with validation, retrieval eval, checkpointing).

Mirrors the reference training entry (`run_task.py` ->
`TrainSpeechClipBaseTask.run`, `avssl/task/base_task.py:55-215`) on a scale
that runs hermetically in CI.
"""
import json
import os
import sys
import wave

import numpy as np
import pytest
import yaml
from PIL import Image

# slow tier: torch-oracle parity / end-to-end (run_test.sh default skips)
pytestmark = pytest.mark.slow


def write_wav(path, n, sr=16000, seed=0):
    rng = np.random.RandomState(seed)
    data = (rng.randn(n) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


@pytest.fixture()
def tiny_world(tmp_path):
    root = tmp_path / "flickr"
    (root / "flickr_audio" / "wavs").mkdir(parents=True)
    (root / "Images").mkdir()
    names = [f"img{i}" for i in range(4)]
    id_pairs = {"filename2Id": {n: i for i, n in enumerate(names)},
                "id2Filename": {str(i): n for i, n in enumerate(names)}}
    (root / "Flickr8k_idPairs.json").write_text(json.dumps(id_pairs))
    cap_lines = []
    for i, n in enumerate(names):
        Image.fromarray(
            (np.random.RandomState(i).rand(40, 40, 3) * 255).astype(np.uint8)
        ).save(root / "Images" / f"{n}.jpg")
        for sub in range(2):
            write_wav(root / "flickr_audio" / "wavs" / f"{n}_{sub}.wav",
                      3200 + 320 * sub, seed=i * 7 + sub)
            cap_lines.append(f"{n}.jpg#{sub}\tthe cat runs at a dog {i}")
    (root / "Flickr8k.token.txt").write_text("\n".join(cap_lines))
    (root / "Flickr_8k.trainImages.txt").write_text(
        "\n".join(f"{n}.jpg" for n in names[:3])
    )
    (root / "Flickr_8k.devImages.txt").write_text(f"{names[3]}.jpg\n")
    (root / "Flickr_8k.testImages.txt").write_text(f"{names[3]}.jpg\n")

    # tiny BPE merges + vocab usage table for the reduced-vocab path
    merges = ["#version: 0.2", "a t</w>", "c at</w>", "d o", "do g</w>",
              "r u", "ru n", "run s</w>", "t h", "th e</w>"]
    bpe = tmp_path / "merges.txt"
    bpe.write_text("\n".join(merges) + "\n")
    usage = np.array([[0, 500], [1, 3], [2, 3], [3, 3], [10, 40], [11, 20],
                      [62, 60], [63, 60]], dtype=np.int64)
    np.save(tmp_path / "usage.npy", usage)

    d = 32
    cfg = {
        "data": {
            "dataset": {
                "name": "flickr",
                "dataset_root": str(root),
                "text_file": "Flickr8k.token.txt",
                "load_image": True,
                "load_audio": True,
                "tokenizeText": False,
                "normalize_waveform": True,
                "bpe_path": str(bpe),
            },
            "batch_size": 4,
            "dev_batch_size": 2,
        },
        "model_settings": {
            "cascaded_objective_weight": 1.0,
            "parallel_objective_weight": 1.0,
            "parallel_branch": {
                "transformer_args": {
                    "type": "TransformerEncoder", "n_layers": 1, "d_model": d,
                    "nhead": 4, "dim_feedforward": 64, "dropout": 0.1,
                    "activation": "gelu", "layer_norm_eps": 1.0e-5,
                    "batch_first": True, "norm_first": False,
                },
            },
            "cascaded_branch": {
                "type": "HybridBranch_dynamic",
                "vq": {"type": "SimpleVectorQuantizer",
                       "args": {"temp": "fixed=0.1", "time_first": True,
                                "use_gumbel": False, "hard": True}},
                "downsampling": {
                    "type": "cif",
                    "cif": {"quantity_loss_weight": 0.25, "using_gt_len": False,
                            "cif_output_dim": d, "encoder_embed_dim": d,
                            "produce_weight_type": "conv", "cif_threshold": 1.0,
                            "conv_cif_layer_num": 1, "conv_cif_width": 3,
                            "conv_cif_dropout": 0.1, "apply_scaling": True,
                            "scaling_step": 10, "apply_tail_handling": True,
                            "tail_handling_firing_threshold": 0.5},
                },
                "keyword": {"batchnorms": {"type": "eachKw", "std_scale": 1.0,
                                            "learnable": True, "parallel": True}},
                "transformer_args": {
                    "type": "MultiheadAttentionAndNorm", "n_layers": 1,
                    "d_model": d, "nhead": 4, "dim_feedforward": 64,
                    "dropout": 0.1, "activation": "gelu",
                    "layer_norm_eps": 1.0e-5, "batch_first": True,
                    "norm_first": False,
                },
            },
        },
        "cl_loss": {"type": "MaskedContrastiveLoss",
                    "args": {"temperature": 0.07, "temperature_trainable": True,
                             "margin": 0.0, "dcl": False, "a2b": True,
                             "b2a": True}},
        "retrieval": {"audio_feat_src": "parallel", "recall_at": [1, 5, 10]},
        "clip": {"name": "ViT-B/32", "tiny": True, "tiny_width": d,
                 "image_encoder_trainable": False,
                 "text_encoder_trainable": False,
                 "reduce_subword_embbedding": str(tmp_path / "usage.npy"),
                 "sot_original": 62, "eot_original": 63},
        "audio_encoder": {"type": "FairseqHubert", "name": "hubert_base",
                          "tiny": True, "tiny_width": d,
                          "downsampling_rate": 4, "pretrained": False,
                          "trainable": False,
                          "feat_select_idx": "weighted_sum",
                          "layer_drop": 0.0, "max_audio_len": 3200,
                          "optim": {"name": "Adam",
                                     "args": {"lr": 1.0e-3,
                                              "weight_decay": 1.0e-6}},
                          "scheduler": {"name": "linear_warmup_decay",
                                         "warmup": 2, "max_step": 6,
                                         "final_lr": 1.0e-8}},
        "trainer": {"max_steps": 4, "gradient_clip_val": 4,
                    "accumulate_grad_batches": 1,
                    "check_val_every_n_epoch": 1, "log_every_n_steps": 1},
        "log_setting": {"log_detokenize_results": True,
                        "log_detokenize_results_every_n_epoch": 1,
                        "log_draw_pca_every_n_epoch": 0},
        "logger": {"backend": None, "project": "test"},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return tmp_path, cfg_path


def test_cli_train_eval_roundtrip(tiny_world, monkeypatch):
    tmp_path, cfg_path = tiny_world
    save = tmp_path / "exp"

    import speechclip_plus_tpu.tasks as tasks

    # --- train for 4 steps through the real task path ---
    monkeypatch.setattr(
        sys, "argv",
        ["run_task.py", "TrainKWClip_GeneralTransformer",
         "--config", str(cfg_path), "--train", "--save_path", str(save),
         "--seed", "1", "--devices", "1", "--njobs", "1"],
    )
    import argparse

    runner = tasks.TrainKWClip_GeneralTransformer()
    p = argparse.ArgumentParser()
    p.add_argument("task")
    runner.add_args(p)
    runner.parse_args(p)
    trainer = runner.run()
    assert int(trainer.state.step) == 4

    # metrics logged - and FINITE (guards the OOB-gather NaN class of bug:
    # CIF slots + SOT + EOT must fit the text context)
    assert (save / "metrics.jsonl").exists()
    rows = [json.loads(l) for l in (save / "metrics.jsonl").read_text().splitlines()]
    assert any("val_recall_mean_10" in r for r in rows)
    import math
    for r in rows:
        for k, v in r.items():
            if isinstance(v, float):
                assert math.isfinite(v), (k, v, r)
    # keyword artifacts dumped (log_detokenize_results every epoch)
    retok = list((save / "retokenizeText").glob("keywords_ep*.json"))
    assert retok, "keyword neighbor JSON missing"
    data = json.loads(retok[0].read_text())
    assert data and "neighbors" in data[0]

    # checkpoints saved (val_loss top-1, recall top-3, last)
    ckroot = save / "checkpoints"
    assert (ckroot / "last").exists()
    assert (ckroot / "val_loss").exists()

    # --- eval from the saved checkpoint through --resume/--test ---
    runner2 = tasks.TrainKWClip_GeneralTransformer()
    monkeypatch.setattr(
        sys, "argv",
        ["run_task.py", "TrainKWClip_GeneralTransformer",
         "--config", str(cfg_path), "--test", "--save_path", str(save),
         "--resume", str(ckroot), "--devices", "1", "--njobs", "1"],
    )
    p2 = argparse.ArgumentParser()
    p2.add_argument("task")
    runner2.add_args(p2)
    runner2.parse_args(p2)
    trainer2 = runner2.run()
    assert int(trainer2.state.step) == 4  # restored full state


def test_image_embedding_cache_matches_live_path(tiny_world):
    """Cached frozen image embeddings must reproduce the live image-tower
    path bit-for-bit through the loss features."""
    import jax
    import jax.numpy as jnp

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.data import BucketedLoader
    from speechclip_plus_tpu.data.image_cache import (
        CachedImageDataset,
        precompute_image_embeddings,
    )
    from speechclip_plus_tpu.tasks import build_model_from_config
    from speechclip_plus_tpu.tasks.base_task import _build_dataset

    tmp_path, cfg_path = tiny_world
    cfg = load_config(str(cfg_path))
    model, variables, model_cfg, _ = build_model_from_config(cfg, seed=0)

    ds = _build_dataset(cfg, "train", None, model_cfg.clip.image_resolution)
    loader = BucketedLoader(ds, 4, shuffle=False, drop_last=False,
                            buckets=(4000,), prefetch=1)
    batch_live = next(iter(loader))

    feats = precompute_image_embeddings(model, variables, ds, batch_size=4)
    cached = CachedImageDataset(ds, feats)
    loader_c = BucketedLoader(cached, 4, shuffle=False, drop_last=False,
                              buckets=(4000,), prefetch=1)
    batch_cached = next(iter(loader_c))
    assert "image" not in batch_cached and "image_feat" in batch_cached

    to_j = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    lf_live, _, _ = model.apply(variables, to_j(batch_live), training=False)
    lf_cached, _, _ = model.apply(variables, to_j(batch_cached), training=False)
    np.testing.assert_allclose(
        np.asarray(lf_live["image_feat"]), np.asarray(lf_cached["image_feat"]),
        rtol=1e-5, atol=1e-6,
    )


def test_api_load_from_orbax_checkpoint(tiny_world, monkeypatch):
    """Library surface: train via CLI, then `load_from_checkpoint` on the
    orbax dir and run encode_speech / feature_extractor_s3prl on ragged
    waveform lists (reference example.py:10-33)."""
    tmp_path, cfg_path = tiny_world
    save = tmp_path / "exp_api"

    import argparse

    import speechclip_plus_tpu.tasks as tasks

    monkeypatch.setattr(
        sys, "argv",
        ["run_task.py", "TrainKWClip_GeneralTransformer",
         "--config", str(cfg_path), "--train", "--save_path", str(save),
         "--seed", "3", "--devices", "1", "--njobs", "1"],
    )
    runner = tasks.TrainKWClip_GeneralTransformer()
    p = argparse.ArgumentParser()
    p.add_argument("task")
    runner.add_args(p)
    runner.parse_args(p)
    runner.run()

    from speechclip_plus_tpu.api import load_from_checkpoint

    m = load_from_checkpoint(str(save / "checkpoints"))
    rng = np.random.RandomState(0)
    wavs = [rng.randn(2000).astype(np.float32),
            rng.randn(1500).astype(np.float32)]
    out = m.encode_speech(wavs)
    assert out["parallel_audio_feat"].shape[0] == 2
    last, hidden = m.feature_extractor_s3prl(wavs)
    assert last.shape[0] == 2 and len(hidden) >= 3
    kw = m.extract_keywords(wavs)
    assert kw["vq_results"] is not None
    assert kw["vq_results"]["targets_original"].shape[0] == 2


def test_cli_eval_from_released_style_lightning_ckpt(
    tiny_world, tmp_path, monkeypatch
):
    """The released-checkpoint user journey, executed end-to-end: a
    synthetic FULL-base-architecture Lightning `.ckpt` (real HuBERT-base +
    ViT-B/32 dims, reference `avssl` state-dict naming, config embedded as
    an OrderedNamespace — `test_lightning_roundtrip._build_ckpt`) is fed to
    `run_task.py --eval --ckpt ...` over the synthetic Flickr world and must
    come out the other side as a finite `val_recall_mean_10` in
    metrics.jsonl — the exact flow `scripts/eval_released_checkpoints.py`
    runs per released artifact (`download_ckpts.sh:1-24`)."""
    import yaml as _yaml

    from test_lightning_roundtrip import _build_ckpt

    world, _ = tiny_world
    root = world / "flickr"
    _, _, _, ckpt_path = _build_ckpt("base", tmp_path)

    override = {
        "data": {
            "dataset": {"tokenizeText": False},
            "batch_size": 2,
            "dev_batch_size": 2,
        },
        "log_setting": {"log_detokenize_results": False,
                        "log_draw_pca_every_n_epoch": 0},
    }
    override_path = tmp_path / "eval_override.yaml"
    override_path.write_text(_yaml.safe_dump(override))
    save = tmp_path / "eval_out"

    import speechclip_plus_tpu.tasks as tasks

    monkeypatch.setattr(
        sys, "argv",
        ["run_task.py", "TrainKWClip_GeneralTransformer",
         "--ckpt", str(ckpt_path), "--eval",
         "--config", str(override_path),
         "--dataset_root", str(root),
         "--save_path", str(save),
         "--devices", "1", "--njobs", "1"],
    )
    import argparse

    runner = tasks.TrainKWClip_GeneralTransformer()
    p = argparse.ArgumentParser()
    p.add_argument("task")
    runner.add_args(p)
    runner.parse_args(p)
    runner.run()

    rows = [json.loads(l)
            for l in (save / "metrics.jsonl").read_text().splitlines()]
    recall = next(
        (r["val_recall_mean_10"] for r in reversed(rows)
         if "val_recall_mean_10" in r), None,
    )
    assert recall is not None
    import math

    assert math.isfinite(float(recall))
