#!/bin/bash
# Evaluate SpeechCLIP+ hybrid_plus (base) retrieval on the Flickr8k test split.
set -e
EXP_ROOT="${EXP_ROOT:-exp/hybrid_plus_base}"
CFG="config/speechclip_plus/base/hybrid_plus.yaml"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" \
    --resume "$EXP_ROOT/checkpoints" \
    --test \
    --save_path "$EXP_ROOT" "$@"
