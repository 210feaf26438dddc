#!/bin/bash
# Train SpeechCLIP+ cascaded (base) on Flickr8k.
# Reference recipe shape: egs/speechCLIP+/model_base/*/train.sh
set -e
EXP_ROOT="${EXP_ROOT:-exp/cascaded_base}"
CFG="config/speechclip_plus/base/cascaded.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" \
    --devices -1 \
    --njobs 4 \
    --seed 7122 \
    --train \
    --save_path "$EXP_ROOT" "$@"
