#!/bin/bash
# TPU NOTE: MixedFeature is gather/scatter-bound on TPU (~142x the LowRank
# step time, docs/TPU_NOTES.md). Use --grid LowRank for the TPU fast path.
# LLFF forward-facing scenes with the MixedFeature recipe (reference
# benchmark_llff_nerf_mf.sh: colmap loader, scale 16).
ROOT_DIR=${ROOT_DIR:-/data/nerf_llff_data}
for SCENE in fern flower fortress horns leaves orchids room trex; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name colmap \
        --downsample 0.25 --scale 16 \
        --exp_name "llff_mf/$SCENE" \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --L 16 --F 2 --T 20 --N_min 16 --grid MixedFeature --N_tables 8 \
        --rgb_channels 128 --rgb_layers 2 "$@"
done
