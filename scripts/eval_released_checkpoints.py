#!/usr/bin/env python3
"""Released-checkpoint parity harness.

Loads each released SpeechCLIP+ Lightning checkpoint (fetched with
`scripts/download_ckpts.sh`; filenames carry the expected
`val_recall_mean_10`, reference `download_ckpts.sh:1-24`), imports it onto
the Flax model (`checkpoint/lightning_import.py`), runs the retrieval
evaluation on the matching dataset split, and reports got-vs-expected.

    python scripts/eval_released_checkpoints.py \
        --ckpt_dir ./ckpts --flickr_root /data/flickr --coco_root /data/coco \
        [--tolerance 1.0]

Exit code 0 iff every evaluated checkpoint is within tolerance.
"""
import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def expected_from_name(path: str):
    """val_recall_mean_10 encoded in the filename: either the upstream
    `...val_recall_mean_10=42.1100.ckpt` form (download_ckpts.sh:1-24) or
    this repo's `<size>_<ds>_<family>_42.1100.ckpt` form."""
    name = os.path.basename(path)
    m = re.search(r"val_recall_mean_10[=%3D]+(\d+(?:\.\d+)?)", name)
    if m:
        return float(m.group(1))
    m = re.search(r"_(\d+(?:\.\d+)?)\.ckpt$", name)
    return float(m.group(1)) if m else None


# (size, dataset, family, expected val_recall_mean_10) for the 9 released
# checkpoints (reference download_ckpts.sh:1-24) -> this repo's config path
RELEASED = [
    ("base", "flickr", "cascaded_plus", 42.11),
    ("base", "flickr", "hybrid", 80.01),
    ("base", "flickr", "hybrid_plus", 81.03),
    ("large", "flickr", "cascaded_plus", 60.05),
    ("large", "flickr", "hybrid", 90.10),
    ("large", "flickr", "hybrid_plus", 89.35),
    ("large", "coco", "cascaded_plus", 31.2973),
    ("large", "coco", "hybrid", 79.2988),
    ("large", "coco", "hybrid_plus", 83.5408),
]


def config_path_for(size: str, dataset: str, family: str) -> str:
    root = os.path.join(os.path.dirname(__file__), "..", "config",
                        "speechclip_plus")
    if size == "base":
        return os.path.join(root, "base", f"{family}.yaml")
    return os.path.join(root, "large", dataset, f"{family}.yaml")


def _write_wav(path, n, sr=16000, seed=0):
    import wave

    import numpy as np

    rng = np.random.RandomState(seed)
    data = (rng.randn(n) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


def _synthetic_root(tmpdir: str, dataset: str) -> str:
    """Minimal on-disk Flickr8k / SpokenCOCO layout (2 images x 2 captions)
    so the --dry trace exercises the REAL eval-split pipeline —
    dataset -> bucketed loader -> eval step — not just the model build."""
    import json as _json
    import os

    import numpy as np
    from PIL import Image

    root = os.path.join(tmpdir, dataset)
    if os.path.isdir(root):
        return root
    names = ["imgA", "imgB"]
    if dataset == "flickr":
        os.makedirs(os.path.join(root, "flickr_audio", "wavs"))
        os.makedirs(os.path.join(root, "Images"))
        with open(os.path.join(root, "Flickr8k_idPairs.json"), "w") as f:
            _json.dump({"filename2Id": {n: i for i, n in enumerate(names)},
                        "id2Filename": {str(i): n
                                        for i, n in enumerate(names)}}, f)
        caps = []
        for i, n in enumerate(names):
            Image.fromarray(
                (np.random.RandomState(i).rand(40, 40, 3) * 255)
                .astype(np.uint8)
            ).save(os.path.join(root, "Images", f"{n}.jpg"))
            for sub in range(2):
                _write_wav(os.path.join(root, "flickr_audio", "wavs",
                                        f"{n}_{sub}.wav"),
                           3200 + 320 * sub, seed=i * 7 + sub)
                caps.append(f"{n}.jpg#{sub}\ta dog runs {i}")
        with open(os.path.join(root, "Flickr8k.token.txt"), "w") as f:
            f.write("\n".join(caps))
        for split in ("train", "dev", "test"):
            with open(os.path.join(root, f"Flickr_8k.{split}Images.txt"),
                      "w") as f:
                f.write("\n".join(f"{n}.jpg" for n in names) + "\n")
    else:  # SpokenCOCO
        os.makedirs(os.path.join(root, "SpokenCOCO", "wavs"))
        os.makedirs(os.path.join(root, "mscoco_img"))
        data = []
        for i, n in enumerate(names):
            img = f"COCO_val2014_{i:012d}.jpg"
            Image.fromarray(
                (np.random.RandomState(i).rand(40, 40, 3) * 255)
                .astype(np.uint8)
            ).save(os.path.join(root, "mscoco_img", img))
            caps = []
            for sub in range(2):
                wav = f"wavs/{n}_{sub}.wav"
                _write_wav(os.path.join(root, "SpokenCOCO", wav),
                           3200 + 320 * sub, seed=i * 7 + sub)
                caps.append({"wav": wav, "text": f"a dog runs {i}"})
            # reassign_id: used by the karpathy-split files
            # (split_prefix=SpokenCOCO_ksplit, data/datasets.py)
            data.append({"image": img, "captions": caps,
                         "reassign_id": i})
        for prefix in ("SpokenCOCO", "SpokenCOCO_ksplit"):
            for split in ("train", "val", "test"):
                with open(os.path.join(root, "SpokenCOCO",
                                       f"{prefix}_{split}.json"), "w") as f:
                    _json.dump({"data": data}, f)
    return root


def dry_run() -> int:
    """Exercise the parity path end-to-end without released weights: for
    each released checkpoint, resolve its config + reduced vocab, build the
    typed model config, trace `model.init` shapes (jax.eval_shape — no
    compute), then drive a synthetic on-disk dataset through the REAL eval
    pipeline — `_build_dataset` -> BucketedLoader -> a traced eval step —
    asserting the retrieval features come out at the right shapes. This is
    what CI can prove in a zero-egress environment."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speechclip_plus_tpu.config import load_config
    from speechclip_plus_tpu.data import BucketedLoader
    from speechclip_plus_tpu.models import KWClip, KWClipConfig
    from speechclip_plus_tpu.parallel import make_eval_step
    from speechclip_plus_tpu.parallel.train_step import TrainState
    from speechclip_plus_tpu.tasks.base_task import _build_dataset
    from speechclip_plus_tpu.tasks.builder import resolve_reduced_vocab

    failures = 0
    with tempfile.TemporaryDirectory() as td:
        for size, dataset, family, expected in RELEASED:
            path = config_path_for(size, dataset, family)
            try:
                cfg = load_config(path)
                vocab = resolve_reduced_vocab(cfg)
                mc = KWClipConfig.from_config(
                    cfg, vocab_size=len(vocab), sot_id=int(vocab.sot_reduced),
                    eot_id=int(vocab.eot_reduced),
                )
                model = KWClip(mc)

                # --- eval-split data pipeline, for real ------------------
                cfg.data.dataset.dataset_root = _synthetic_root(td, dataset)
                split = "dev" if dataset == "flickr" else "val"
                ds = _build_dataset(cfg, split,
                                    image_size=mc.clip.image_resolution)
                loader = BucketedLoader(ds, batch_size=2, shuffle=False,
                                        drop_last=False)
                batch = next(iter(loader))
                assert batch["image"].shape[1] == mc.clip.image_resolution

                # --- model init + eval step, traced (no compute) ---------
                jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                shapes = jax.eval_shape(
                    lambda r, b: model.init(r, b, training=False),
                    jax.random.PRNGKey(0), jbatch,
                )
                state = TrainState(
                    step=jax.ShapeDtypeStruct((), jnp.int32),
                    params=shapes["params"],
                    batch_stats=shapes.get("batch_stats", {}),
                    opt_state=None,
                )
                metrics, out = jax.eval_shape(
                    make_eval_step(model), state, jbatch
                )
                assert out["audio_feat"].shape == out["image_feat"].shape, (
                    out["audio_feat"].shape, out["image_feat"].shape,
                )
                assert "val_loss" in metrics
                n_params = sum(
                    int(np.prod(x.shape))
                    for x in jax.tree_util.tree_leaves(shapes["params"])
                )
                wav_shape = tuple(batch["wav"].shape)
                feat_shape = tuple(out["audio_feat"].shape)
                print(f"OK   {size}/{dataset}/{family}: expected "
                      f"recall_mean_10={expected}, {n_params/1e6:.1f}M "
                      f"params, branch={mc.branch_type or 'parallel-only'}, "
                      f"eval pipeline wav{wav_shape} -> feat{feat_shape}")
            except Exception as e:  # noqa: BLE001 - report and continue
                failures += 1
                print(f"FAIL {size}/{dataset}/{family}: "
                      f"{type(e).__name__}: {e}")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--flickr_root", default=None)
    ap.add_argument("--coco_root", default=None)
    ap.add_argument("--tolerance", type=float, default=1.0,
                    help="max |got - expected| recall points")
    ap.add_argument("--devices", type=int, default=-1)
    ap.add_argument("--dry", action="store_true",
                    help="no weights/data: build every released-ckpt config "
                         "and trace model shapes (CI-viable)")
    args = ap.parse_args()

    if args.dry:
        sys.exit(1 if dry_run() else 0)
    assert args.ckpt_dir, "--ckpt_dir required unless --dry"

    import speechclip_plus_tpu.tasks as tasks

    failures = []
    results = []
    for ckpt in sorted(glob.glob(os.path.join(args.ckpt_dir, "*.ckpt"))):
        name = os.path.basename(ckpt)
        expected = expected_from_name(ckpt)
        is_coco = "coco" in name.lower()
        root = args.coco_root if is_coco else args.flickr_root
        if root is None:
            print(f"SKIP {name}: no dataset root for "
                  f"{'coco' if is_coco else 'flickr'}")
            continue

        import argparse as _ap

        runner = tasks.TrainKWClip_GeneralTransformer()
        p = _ap.ArgumentParser()
        p.add_argument("task")
        runner.add_args(p)
        sys.argv = [
            "eval", "TrainKWClip_GeneralTransformer",
            "--ckpt", ckpt, "--eval", "--dataset_root", root,
            "--save_path", os.path.join(args.ckpt_dir, "eval_" + name),
            "--devices", str(args.devices),
        ]
        runner.parse_args(p)
        trainer = runner.run()
        # trainer.validate already ran through --eval; read back its metrics
        import json

        rows = [
            json.loads(l)
            for l in open(os.path.join(args.ckpt_dir, "eval_" + name,
                                       "metrics.jsonl"))
        ]
        got = next(
            (r["val_recall_mean_10"] for r in reversed(rows)
             if "val_recall_mean_10" in r), None,
        )
        ok = expected is None or (got is not None
                                  and abs(got - expected) <= args.tolerance)
        results.append((name, expected, got, ok))
        if not ok:
            failures.append(name)
        print(f"{'OK  ' if ok else 'FAIL'} {name}: expected={expected} got={got}")

    print("\n== summary ==")
    for name, exp, got, ok in results:
        print(f"  {'OK  ' if ok else 'FAIL'} {name}  expected={exp}  got={got}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
