#!/bin/bash
# TPU NOTE: the Hash grid is gather/scatter-bound on TPU (~2 orders of
# magnitude off the LowRank step time, docs/TPU_NOTES.md); a 20-epoch run
# takes hours-days. Use --grid LowRank for the TPU fast path.
# Hash-grid variants T=20/22 (reference benchmark_synthetic_nerf_hash.sh).
ROOT_DIR=${ROOT_DIR:-/data/Synthetic_NeRF}
for T in 20 22; do
  for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
    python train.py \
        --root_dir "$ROOT_DIR/$SCENE" \
        --exp_name "hash_T${T}/$SCENE" --no_save_test \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --L 16 --F 2 --T "$T" --N_min 16 --grid Hash "$@"
  done
done
