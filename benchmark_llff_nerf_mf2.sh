#!/bin/bash
# TPU NOTE: MixedFeature is gather/scatter-bound on TPU (~142x the LowRank
# step time, docs/TPU_NOTES.md). Use --grid LowRank for the TPU fast path.
# Second-device variant of benchmark_llff_nerf_mf.sh (the reference's mf2
# script is identical except CUDA_VISIBLE_DEVICES=1). Select the chip via
# standard JAX env vars instead.
TPU_VISIBLE_CHIPS=${TPU_VISIBLE_CHIPS:-1} \
    exec "$(dirname "$0")/benchmark_llff_nerf_mf.sh" "$@"
