#!/bin/bash
# Evaluate original SpeechCLIP cascaded (base) on Flickr8k.
# Reference recipe shape: egs/speechCLIP{,+}/**/{train,test}.sh (seed 7122)
set -e
EXP_ROOT="${EXP_ROOT:-exp/speechclip_cascaded_base}"
CFG="config/speechclip/base/cascaded.yaml"
mkdir -p "$EXP_ROOT"
python3 run_task.py TrainKWClip_GeneralTransformer \
    --config "$CFG" --devices -1 --njobs 4 --seed 7122 --eval --ckpt "${CKPT:?set CKPT=<orbax ckpt dir or lightning .ckpt>}" \
    --save_path "$EXP_ROOT" "$@"
