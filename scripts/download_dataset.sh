#!/bin/bash
# Fetch Flickr8k (images + flickr_audio) and SpokenCOCO, then build the
# stable id mapping. Reference: download_dataset.sh in the upstream repo.
# NOTE: this environment has no network egress; run where downloads work.
set -e
ROOT="${1:-./data}"
mkdir -p "$ROOT/flickr" "$ROOT/coco"

echo "== Flickr8k =="
# images + captions + split lists (Univ. of Illinois mirrors)
wget -c -P "$ROOT/flickr" \
  https://github.com/jbrownlee/Datasets/releases/download/Flickr8k/Flickr8k_Dataset.zip \
  https://github.com/jbrownlee/Datasets/releases/download/Flickr8k/Flickr8k_text.zip
unzip -n "$ROOT/flickr/Flickr8k_Dataset.zip" -d "$ROOT/flickr"
unzip -n "$ROOT/flickr/Flickr8k_text.zip" -d "$ROOT/flickr"
mv -n "$ROOT/flickr/Flicker8k_Dataset" "$ROOT/flickr/Images" 2>/dev/null || true
# spoken captions (CMU)
wget -c -P "$ROOT/flickr" \
  https://groups.csail.mit.edu/sls/downloads/flickraudio/downloads/flickr_audio.tar.gz
tar -xzf "$ROOT/flickr/flickr_audio.tar.gz" -C "$ROOT/flickr"
python3 "$(dirname "$0")/create_id_pairs.py" --dataset_root "$ROOT/flickr"

echo "== SpokenCOCO =="
wget -c -P "$ROOT/coco" \
  https://data.csail.mit.edu/placesaudio/SpokenCOCO.tar.gz
tar -xzf "$ROOT/coco/SpokenCOCO.tar.gz" -C "$ROOT/coco"
echo "Fetch MSCOCO val2014/train2014 images into $ROOT/coco/mscoco_img/"
