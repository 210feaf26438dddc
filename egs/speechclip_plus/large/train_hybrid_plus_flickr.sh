#!/bin/bash
# Train SpeechCLIP+ hybrid+ (large: HuBERT-Large + ViT-L/14) on Flickr8k.
set -e
EXP_ROOT="${EXP_ROOT:-exp/hybrid_plus_large_flickr}"
CFG="config/speechclip_plus/large/flickr/hybrid_plus.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" --devices -1 --njobs 4 --seed 7122 --train \
    --save_path "$EXP_ROOT" "$@"
