#!/bin/bash
# TPU NOTE: MixedFeature is gather/scatter-bound on TPU — measured 2587.6
# ms/step (vs 18.2 for --grid LowRank) = ~142x; 20 epochs would take ~days.
# Use --grid LowRank for the TPU fast path (docs/TPU_NOTES.md), or
# --hash_grad_samples 1 to cut the backward scatter wall 8x with an
# unbiased sampled-corner table gradient (exact forward).
ROOT_DIR=${ROOT_DIR:-/data/360_v2} exec bash "$(dirname "$0")/benchmark_mipnerf360.sh" \
    --L 16 --F 2 --T 20 --N_min 16 --grid MixedFeature --N_tables 8 \
    --rgb_channels 128 --rgb_layers 2 "$@"
