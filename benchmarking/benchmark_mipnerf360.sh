#!/bin/bash
# mip-NeRF-360 unbounded scenes (downsample 0.25; scale per scene)
ROOT_DIR=${ROOT_DIR:-/data/360_v2}
declare -A SCALE=( [bicycle]=16 [bonsai]=8 [counter]=8 [garden]=16 \
                   [kitchen]=8 [room]=8 [stump]=64 )
for SCENE in "${!SCALE[@]}"; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name colmap \
        --downsample 0.25 --scale "${SCALE[$SCENE]}" \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --random_bg "$@"
done
