#!/bin/bash
# Synthetic-NeRF 8-scene benchmark (reference recipe: 20 epochs x 1000 steps
# x 16384 rays, lr 2e-2). ROOT_DIR must point at Synthetic_NeRF/.
ROOT_DIR=${ROOT_DIR:-/data/Synthetic_NeRF}
for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 "$@"
done
