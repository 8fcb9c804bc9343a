"""NeRF (Blender) synthetic dataset loader. Parity: reference datasets/nerf.py.

Reads transforms_{split}.json; 800x800 with fx from camera_angle_x; pose
convention [right up back] -> [right down front]; camera radius normalized to
1.5 (Jrender scenes get per-scene radii/shifts).
"""
import json
import os

import numpy as np
from tqdm import tqdm

from .base import BaseDataset
from .color_utils import read_image
from .ray_utils import get_ray_directions


class NeRFDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split)

    def read_intrinsics(self):
        with open(os.path.join(self.root_dir, "transforms_train.json")) as f:
            meta = json.load(f)
        w = h = int(800 * self.downsample)
        fx = fy = 0.5 * 800 / np.tan(
            0.5 * meta["camera_angle_x"]) * self.downsample
        self.K = np.float32([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
        self.directions = get_ray_directions(h, w, self.K)
        self.img_wh = (w, h)

    def read_meta(self, split):
        rays, poses = [], []
        if split == "trainval":
            with open(os.path.join(self.root_dir,
                                   "transforms_train.json")) as f:
                frames = json.load(f)["frames"]
            with open(os.path.join(self.root_dir,
                                   "transforms_val.json")) as f:
                frames += json.load(f)["frames"]
        else:
            with open(os.path.join(self.root_dir,
                                   f"transforms_{split}.json")) as f:
                frames = json.load(f)["frames"]

        print(f"Loading {len(frames)} {split} images ...")
        for frame in tqdm(frames):
            c2w = np.array(frame["transform_matrix"])[:3, :4]

            if "Jrender_Dataset" in self.root_dir:
                c2w[:, :2] *= -1  # [left up front] -> [right down front]
                folder = self.root_dir.split("/")
                scene = folder[-1] if folder[-1] != "" else folder[-2]
                pose_radius_scale = {"Easyship": 1.2, "Scar": 1.8,
                                     "Coffee": 2.5, "Car": 0.8}.get(scene, 1.5)
            else:
                c2w[:, 1:3] *= -1  # [right up back] -> [right down front]
                scene, pose_radius_scale = None, 1.5
            c2w[:, 3] /= np.linalg.norm(c2w[:, 3]) / pose_radius_scale
            if "Jrender_Dataset" in self.root_dir:
                if scene == "Coffee":
                    c2w[1, 3] -= 0.4465
                elif scene == "Car":
                    c2w[0, 3] -= 0.7
            poses.append(c2w.astype(np.float32))

            img_path = os.path.join(self.root_dir,
                                    f"{frame['file_path']}.png")
            if os.path.exists(img_path):
                rays.append(read_image(img_path, self.img_wh))

        if rays:
            self.rays = np.stack(rays)
        self.poses = np.stack(poses).astype(np.float32)
