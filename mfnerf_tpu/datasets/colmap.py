"""COLMAP-reconstruction loader (LLFF / mip-NeRF-360 / HDR-NeRF scenes).

Parity: reference datasets/colmap.py — poses from sparse/0 binaries, centered
about the average pose with the 3D point cloud, scaled by the minimum camera
norm; mipnerf360 images_{1/d} folders; every-8th-image test split; HDR-NeRF
per-scene exposure dictionaries; spheric test trajectory.
"""
import glob
import os

import numpy as np
from tqdm import tqdm

from .base import BaseDataset
from .color_utils import read_image
from .colmap_utils import (qvec2rotmat, read_cameras_binary,
                           read_images_binary, read_points3d_binary)
from .ray_utils import center_poses, create_spheric_poses, get_ray_directions

# HDR-NeRF per-scene exposure tables (reference colmap.py:137-152)
_HDR_EXPOSURES = {
    **{s: {e: 1 / 8 * 4 ** e for e in range(5)}
       for s in ["bathroom", "bear", "chair", "desk"]},
    **{s: {e: 1 / 16 * 4 ** e for e in range(5)}
       for s in ["diningroom", "dog"]},
    "sofa": {0: 0.25, 1: 1, 2: 2, 3: 4, 4: 16},
    "sponza": {0: 0.5, 1: 2, 2: 4, 3: 8, 4: 32},
    "box": {0: 2 / 3, 1: 1 / 3, 2: 1 / 6, 3: 0.1, 4: 0.05},
    "computer": {0: 1 / 3, 1: 1 / 8, 2: 1 / 15, 3: 1 / 30, 4: 1 / 60},
    "flower": {0: 1 / 3, 1: 1 / 6, 2: 0.1, 3: 0.05, 4: 1 / 45},
    "luckycat": {0: 2, 1: 1, 2: 0.5, 3: 0.25, 4: 0.125},
}


class ColmapDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split, **kwargs)

    def read_intrinsics(self):
        camdata = read_cameras_binary(
            os.path.join(self.root_dir, "sparse/0/cameras.bin"))
        cam = camdata[1]
        h = int(cam.height * self.downsample)
        w = int(cam.width * self.downsample)
        self.img_wh = (w, h)

        if cam.model == "SIMPLE_RADIAL":
            fx = fy = cam.params[0] * self.downsample
            cx = cam.params[1] * self.downsample
            cy = cam.params[2] * self.downsample
        elif cam.model in ["PINHOLE", "OPENCV"]:
            fx = cam.params[0] * self.downsample
            fy = cam.params[1] * self.downsample
            cx = cam.params[2] * self.downsample
            cy = cam.params[3] * self.downsample
        else:
            raise ValueError(
                f"Please parse the intrinsics for camera model {cam.model}!")
        self.K = np.float32([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        self.directions = get_ray_directions(h, w, self.K)

    @staticmethod
    def _images_meta(path):
        """(names, qvecs (N,4), tvecs (N,3)) in file order — C++ native
        parser when built (csrc/nativeloader.cc), Python struct fallback."""
        from .. import native
        if native.available():
            meta = native.read_images_meta(path)
            return meta["names"], meta["qvecs"], meta["tvecs"]
        imdata = read_images_binary(path)
        return ([imdata[k].name for k in imdata],
                np.stack([imdata[k].qvec for k in imdata]),
                np.stack([imdata[k].tvec for k in imdata]))

    @staticmethod
    def _points3d_xyz(path):
        """Sparse point cloud positions (N, 3); native parser when built."""
        from .. import native
        if native.available():
            return native.read_points3d(path)["xyz"]
        pts3d = read_points3d_binary(path)
        return np.array([pts3d[k].xyz for k in pts3d])

    def read_meta(self, split, **kwargs):
        img_names, qvecs, tvecs = self._images_meta(
            os.path.join(self.root_dir, "sparse/0/images.bin"))
        if "360_v2" in self.root_dir and self.downsample < 1:
            folder = f"images_{int(1 / self.downsample)}"
        else:
            folder = "images"
        img_paths = [os.path.join(self.root_dir, folder, name)
                     for name in sorted(img_names)]
        perm = np.argsort(img_names)
        bottom = np.array([[0, 0, 0, 1.0]])
        w2c_mats = []
        for q, t in zip(qvecs, tvecs):
            r = qvec2rotmat(q)
            w2c_mats.append(np.concatenate(
                [np.concatenate([r, t.reshape(3, 1)], 1), bottom], 0))
        w2c_mats = np.stack(w2c_mats, 0)
        poses = np.linalg.inv(w2c_mats)[perm, :3]  # c2w, sorted by name

        pts3d = self._points3d_xyz(
            os.path.join(self.root_dir, "sparse/0/points3D.bin"))

        self.poses, self.pts3d = center_poses(poses, pts3d)
        scale = np.linalg.norm(self.poses[..., 3], axis=-1).min()
        self.poses[..., 3] /= scale
        self.pts3d /= scale

        rays = []
        if split == "test_traj":  # precomputed spheric test poses
            self.poses = create_spheric_poses(
                1.2, self.poses[:, 1, 3].mean()).astype(np.float32)
            self.rays = np.zeros((0, 0, 3), np.float32)
            return

        exposures = None
        if "HDR-NeRF" in self.root_dir:
            if "syndata" in self.root_dir:  # synthetic: 17 test + 18 train
                self.unit_exposure_rgb = 0.73
                if split == "train":
                    img_paths = sorted(glob.glob(os.path.join(
                        self.root_dir, "train/*[024].png")))
                    self.poses = np.repeat(self.poses[-18:], 3, 0)
                elif split == "test":
                    img_paths = sorted(glob.glob(os.path.join(
                        self.root_dir, "test/*[13].png")))
                    self.poses = np.repeat(self.poses[:17], 2, 0)
                else:
                    raise ValueError(f"split {split} is invalid for HDR-NeRF!")
            else:  # real: even train / odd test
                self.unit_exposure_rgb = 0.5
                if split == "train":
                    img_paths = sorted(glob.glob(os.path.join(
                        self.root_dir, "input_images/*0.jpg")))[::2]
                    img_paths += sorted(glob.glob(os.path.join(
                        self.root_dir, "input_images/*2.jpg")))[::2]
                    img_paths += sorted(glob.glob(os.path.join(
                        self.root_dir, "input_images/*4.jpg")))[::2]
                    self.poses = np.tile(self.poses[::2], (3, 1, 1))
                elif split == "test":
                    img_paths = sorted(glob.glob(os.path.join(
                        self.root_dir, "input_images/*1.jpg")))[1::2]
                    img_paths += sorted(glob.glob(os.path.join(
                        self.root_dir, "input_images/*3.jpg")))[1::2]
                    self.poses = np.tile(self.poses[1::2], (2, 1, 1))
                else:
                    raise ValueError(f"split {split} is invalid for HDR-NeRF!")
        else:
            # every 8th image is test
            if split == "train":
                keep = [i for i in range(len(img_paths)) if i % 8 != 0]
            elif split == "test":
                keep = [i for i in range(len(img_paths)) if i % 8 == 0]
            else:
                keep = list(range(len(img_paths)))
            img_paths = [img_paths[i] for i in keep]
            self.poses = self.poses[keep]

        print(f"Loading {len(img_paths)} {split} images ...")
        for img_path in tqdm(img_paths):
            buf = [read_image(img_path, self.img_wh, blend_a=False)]
            if "HDR-NeRF" in self.root_dir:
                parts = self.root_dir.split("/")
                scene = parts[-1] if parts[-1] != "" else parts[-2]
                e = int(img_path.split(".")[0][-1])
                buf.append(_HDR_EXPOSURES[scene][e]
                           * np.ones_like(buf[0][:, :1]))
            rays.append(np.concatenate(buf, 1))

        self.rays = np.stack(rays)
        self.poses = self.poses.astype(np.float32)
