#!/bin/bash
ROOT_DIR=${ROOT_DIR:-/data/360_v2} exec bash "$(dirname "$0")/benchmark_mipnerf360.sh" \
    --L 16 --F 2 --T 20 --N_min 16 --grid MixedFeature --N_tables 8 \
    --rgb_channels 128 --rgb_layers 2 "$@"
