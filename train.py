#!/usr/bin/env python
"""Entry point — mirrors the reference `python train.py --root_dir ...` CLI.

Example (Synthetic-NeRF Lego quickstart, reference README.md:71-73):
    python train.py --root_dir <path>/Synthetic_NeRF/Lego \
        --exp_name Lego --num_epochs 30 --batch_size 8192 --lr 1e-2
"""
from mfnerf_tpu.opt import get_opts
from mfnerf_tpu.train import main

if __name__ == "__main__":
    main(get_opts())
