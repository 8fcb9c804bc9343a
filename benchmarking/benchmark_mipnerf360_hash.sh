#!/bin/bash
# TPU NOTE: the Hash grid is gather/scatter-bound on TPU (~2 orders of
# magnitude off the LowRank step time, docs/TPU_NOTES.md); a 20-epoch run
# takes hours-days. Use --grid LowRank for the TPU fast path.
# mip-NeRF-360 unbounded scenes, plain Hash grid T20 (reference
# benchmarking/benchmark_mipnerf360_hash.sh recipe: colmap loader,
# downsample .25, scale 16, batch 4096).
ROOT_DIR=${ROOT_DIR:-/data/360_v2}
for SCENE in bicycle bonsai counter garden kitchen room stump; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name colmap \
        --downsample 0.25 --scale 16.0 \
        --exp_name "mipnerf360_hash/$SCENE" \
        --num_epochs 20 --batch_size 4096 --lr 2e-2 --eval_lpips \
        --L 16 --F 2 --T 20 --N_min 16 --grid Hash \
        --rgb_channels 64 --rgb_layers 2 "$@"
done
