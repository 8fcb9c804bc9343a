"""Dataset base: infinite random-ray sampler for train, per-image for test.

Parity with reference datasets/base.py: the train split is an infinite
sampler of ``batch_size`` random (image, pixel) pairs per step with 1000
steps per "epoch"; rays are pre-loaded fully into host RAM as
(N_images, H*W, 3|4) float32 arrays. No torch DataLoader: sampling is a NumPy
RNG draw and the arrays are handed to JAX as-is (device transfer happens in
the train step).
"""
from __future__ import annotations

import numpy as np


class BaseDataset:
    def __init__(self, root_dir, split="train", downsample=1.0):
        self.root_dir = root_dir
        self.split = split
        self.downsample = downsample
        self.batch_size = 8192
        self.ray_sampling_strategy = "all_images"
        self.rays = np.zeros((0, 0, 3), np.float32)
        self.poses = np.zeros((0, 3, 4), np.float32)
        self._rng = np.random.default_rng()

    def seed(self, seed):
        self._rng = np.random.default_rng(seed)

    def read_intrinsics(self):
        raise NotImplementedError

    def __len__(self):
        if self.split.startswith("train"):
            return 1000  # steps per "epoch" (reference base.py:17-20)
        return len(self.poses)

    def __getitem__(self, idx):
        if self.split.startswith("train"):
            if self.ray_sampling_strategy == "all_images":
                img_idxs = self._rng.integers(0, len(self.poses),
                                              self.batch_size)
            elif self.ray_sampling_strategy == "same_image":
                img_idxs = int(self._rng.integers(0, len(self.poses)))
            else:
                raise ValueError(self.ray_sampling_strategy)
            pix_idxs = self._rng.integers(
                0, self.img_wh[0] * self.img_wh[1], self.batch_size)
            rays = self.rays[img_idxs, pix_idxs]
            sample = {"img_idxs": img_idxs, "pix_idxs": pix_idxs,
                      "rgb": rays[:, :3]}
            if self.rays.shape[-1] == 4:  # HDR-NeRF data
                sample["exposure"] = rays[:, 3:]
        else:
            sample = {"pose": self.poses[idx], "img_idxs": idx}
            if len(self.rays) > 0:
                rays = self.rays[idx]
                sample["rgb"] = rays[:, :3]
                if rays.shape[1] == 4:
                    sample["exposure"] = rays[0, 3]
        return sample
