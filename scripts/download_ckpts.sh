#!/bin/bash
# Fetch the 9 released SpeechCLIP+ Lightning checkpoints (HuggingFace,
# ShampooWang/speechclip_plus) plus the frozen-tower weights needed to build
# models from scratch. Mirrors the upstream download_ckpts.sh:1-24 layout;
# files land as <out>/<size>_<dataset>_<family>_<recall>.ckpt so
# scripts/eval_released_checkpoints.py can route them by name.
# NOTE: this environment has no network egress; run where downloads work.
set -e
OUT="${1:-./ckpts}"
mkdir -p "$OUT"

HF="https://huggingface.co/ShampooWang/speechclip_plus/resolve/main"

fetch() { # fetch <subpath-url-encoded> <local-name>
  wget -c "$HF/$1?download=true" -O "$OUT/$2" || echo "failed: $2"
}

fetch "base/flickr/cascaded%2B/epoch%3D326-step%3D38258-val_recall_mean_10%3D42.1100.ckpt" base_flickr_cascaded+_42.1100.ckpt
fetch "base/flickr/hybrid/epoch%3D134-step%3D15794-val_recall_mean_10%3D80.0100.ckpt"      base_flickr_hybrid_80.0100.ckpt
fetch "base/flickr/hybrid%2B/epoch%3D80-step%3D9476-val_recall_mean_10%3D81.0300.ckpt"     base_flickr_hybrid+_81.0300.ckpt
fetch "large/flickr/cascaded%2B/epoch%3D112-step%3D26441-val_recall_mean_10%3D60.0500.ckpt" large_flickr_cascaded+_60.0500.ckpt
fetch "large/flickr/hybrid/epoch%3D85-step%3D10061-val_recall_mean_10%3D90.1000.ckpt"      large_flickr_hybrid_90.1000.ckpt
fetch "large/flickr/hybrid%2B/epoch%3D50-step%3D5966-val_recall_mean_10%3D89.3500.ckpt"    large_flickr_hybrid+_89.3500.ckpt
fetch "large/coco/cascaded%2B/epoch%3D10-step%3D48740-val_recall_mean_10%3D31.2973.ckpt"   large_coco_cascaded+_31.2973.ckpt
fetch "large/coco/hybrid/epoch%3D12-step%3D28794-val_recall_mean_10%3D79.2988.ckpt"        large_coco_hybrid_79.2988.ckpt
fetch "large/coco/hybrid%2B/epoch%3D21-step%3D48729-val_recall_mean_10%3D83.5408.ckpt"     large_coco_hybrid+_83.5408.ckpt

echo "== frozen towers =="
wget -c -P "$OUT" https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt
wget -c -P "$OUT" https://dl.fbaipublicfiles.com/hubert/hubert_large_ll60k.pt
wget -c -P "$OUT" https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt
wget -c -P "$OUT" https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt
