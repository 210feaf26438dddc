#!/usr/bin/env python3
"""Create the stable image-id assignment for Flickr8k.

Reference: ``data/flickr/createIdForDataPairs.py`` — every image filename in
the three split lists gets a stable integer id, saved as
`Flickr8k_idPairs.json` with both directions of the mapping. Run once after
downloading the dataset.

    python scripts/create_id_pairs.py --dataset_root /data/flickr
"""
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    args = ap.parse_args()

    names = []
    seen = set()
    for split in ("train", "dev", "test"):
        path = os.path.join(args.dataset_root, f"Flickr_8k.{split}Images.txt")
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                name = line.rsplit(".", 1)[0]
                if name not in seen:
                    seen.add(name)
                    names.append(name)

    filename2Id = {n: i for i, n in enumerate(names)}
    id2Filename = {str(i): n for i, n in enumerate(names)}
    out = os.path.join(args.dataset_root, "Flickr8k_idPairs.json")
    with open(out, "w") as f:
        json.dump({"id2Filename": id2Filename, "filename2Id": filename2Id}, f)
    print(f"wrote {out} with {len(names)} images")


if __name__ == "__main__":
    main()
