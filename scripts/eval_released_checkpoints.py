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
    m = re.search(r"_(\d+(?:\.\d+)?)\.ckpt$", os.path.basename(path))
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--flickr_root", default=None)
    ap.add_argument("--coco_root", default=None)
    ap.add_argument("--tolerance", type=float, default=1.0,
                    help="max |got - expected| recall points")
    ap.add_argument("--devices", type=int, default=-1)
    args = ap.parse_args()

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
