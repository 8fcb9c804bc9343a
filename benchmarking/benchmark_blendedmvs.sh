#!/bin/bash
ROOT_DIR=${ROOT_DIR:-/data/BlendedMVS}
for SCENE in Character Fountain Jade Statues; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" --split trainval \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 "$@"
done
