#!/bin/bash
# Train SpeechCLIP+ hybrid (large) on coco.
# Reference recipe shape: egs/speechCLIP{,+}/**/{train,test}.sh (seed 7122)
set -e
EXP_ROOT="${EXP_ROOT:-exp/hybrid_large_coco}"
CFG="config/speechclip_plus/large/coco/hybrid.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" --devices -1 --njobs 4 --seed 7122 --train \
    --save_path "$EXP_ROOT" "$@"
