#!/bin/bash
ROOT_DIR=${ROOT_DIR:-/data/RTMV/google_scanned}
for SCENE in "$ROOT_DIR"/*/; do
    python train.py \
        --root_dir "$SCENE" --dataset_name rtmv \
        --exp_name "$(basename "$SCENE")" --no_save_test \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 "$@"
done
