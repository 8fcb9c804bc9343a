"""In-memory dataset wrapper (procedural scenes, benchmarks, tests)."""
from __future__ import annotations

import numpy as np

from .base import BaseDataset


class MemoryDataset(BaseDataset):
    """Wrap pre-rendered arrays in the BaseDataset sampling interface."""

    def __init__(self, poses, images, K, directions, img_wh, split="train"):
        super().__init__(root_dir="<memory>", split=split)
        self.poses = np.asarray(poses, np.float32)
        self.rays = np.asarray(images, np.float32)
        self.K = np.asarray(K, np.float32)
        self.directions = np.asarray(directions, np.float32)
        self.img_wh = tuple(img_wh)

    @staticmethod
    def from_scene(scene, split="train"):
        if split == "train":
            return MemoryDataset(scene["poses"], scene["images"], scene["K"],
                                 scene["directions"], scene["img_wh"], split)
        return MemoryDataset(scene["test_poses"], scene["test_images"],
                             scene["K"], scene["directions"],
                             scene["img_wh"], split)
