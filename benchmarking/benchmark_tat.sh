#!/bin/bash
# TanksAndTemples (downsample 0.5, reference benchmark_tat.sh)
ROOT_DIR=${ROOT_DIR:-/data/TanksAndTemple}
for SCENE in Barn Caterpillar Family Ignatius Truck; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" --split trainval --downsample 0.5 \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 "$@"
done
