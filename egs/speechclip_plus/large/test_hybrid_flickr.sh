#!/bin/bash
# Evaluate SpeechCLIP+ hybrid (large) on flickr.
# Reference recipe shape: egs/speechCLIP{,+}/**/{train,test}.sh (seed 7122)
set -e
EXP_ROOT="${EXP_ROOT:-exp/hybrid_large_flickr}"
CFG="config/speechclip_plus/large/flickr/hybrid.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" --devices -1 --njobs 4 --seed 7122 --eval --ckpt "${CKPT:?set CKPT=<orbax ckpt dir or lightning .ckpt>}" \
    --save_path "$EXP_ROOT" "$@"
