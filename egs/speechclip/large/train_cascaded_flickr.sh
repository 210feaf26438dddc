#!/bin/bash
# Train original SpeechCLIP cascaded (large) on flickr.
# Reference recipe shape: egs/speechCLIP{,+}/**/{train,test}.sh (seed 7122)
set -e
EXP_ROOT="${EXP_ROOT:-exp/speechclip_cascaded_large_flickr}"
CFG="config/speechclip/large/flickr/cascaded.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" --devices -1 --njobs 4 --seed 7122 --train \
    --save_path "$EXP_ROOT" "$@"
