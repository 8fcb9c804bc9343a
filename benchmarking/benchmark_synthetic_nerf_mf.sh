#!/bin/bash
# TPU NOTE: MixedFeature is gather/scatter-bound on TPU — measured 2587.6
# ms/step (vs 18.2 for --grid LowRank) = ~142x; 20 epochs would take ~days.
# Use --grid LowRank for the TPU fast path (docs/TPU_NOTES.md), or
# --hash_grad_samples 1 to cut the backward scatter wall 8x with an
# unbiased sampled-corner table gradient (exact forward).
# MixedFeature variants T=20/22, 8 tables, 128ch rgb (reference
# benchmark_synthetic_nerf_mf.sh; its stale --N_grids flag is --N_tables).
ROOT_DIR=${ROOT_DIR:-/data/Synthetic_NeRF}
for T in 20 22; do
  for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --exp_name "mf_T${T}/$SCENE" \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --L 16 --F 2 --T "$T" --N_min 16 --grid MixedFeature --N_tables 8 \
        --rgb_channels 128 --rgb_layers 2 "$@"
  done
done
