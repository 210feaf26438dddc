#!/bin/bash
# Fetch the released SpeechCLIP+ Lightning checkpoints (HuggingFace) plus the
# frozen-tower weights needed to build models from scratch.
# Reference: download_ckpts.sh in the upstream repo (9 released .ckpt files
# with val_recall_mean_10 in their filenames).
# NOTE: this environment has no network egress; run where downloads work.
set -e
OUT="${1:-./ckpts}"
mkdir -p "$OUT"

BASE="https://huggingface.co/speechclip/speechclip_plus/resolve/main"
for f in \
  "flickr_base_cascaded+_42.11.ckpt" \
  "flickr_base_hybrid_80.01.ckpt" \
  "flickr_base_hybrid+_81.03.ckpt" \
  "flickr_large_cascaded+_60.05.ckpt" \
  "flickr_large_hybrid_90.10.ckpt" \
  "flickr_large_hybrid+_89.35.ckpt" \
  "coco_large_cascaded+_31.2973.ckpt" \
  "coco_large_hybrid_79.2988.ckpt" \
  "coco_large_hybrid+_83.5408.ckpt"; do
  wget -c -P "$OUT" "$BASE/$f" || echo "failed: $f (check the upstream HF repo)"
done

echo "== frozen towers =="
wget -c -P "$OUT" https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt
wget -c -P "$OUT" https://dl.fbaipublicfiles.com/hubert/hubert_large_ll60k.pt
wget -c -P "$OUT" https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt
wget -c -P "$OUT" https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt
