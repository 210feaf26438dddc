#!/bin/bash
# Train SpeechCLIP+ hybrid_plus (base, data2vec upstream) on Flickr8k.
# Reference recipe shape: egs/speechCLIP+/model_base/*/train.sh
set -e
EXP_ROOT="${EXP_ROOT:-exp/hybrid_plus_base_data2vec}"
CFG="config/speechclip_plus/base/hybrid_plus_data2vec.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" \
    --devices -1 \
    --njobs 4 \
    --seed 7122 \
    --train \
    --save_path "$EXP_ROOT" "$@"
