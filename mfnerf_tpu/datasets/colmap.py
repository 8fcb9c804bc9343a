"""COLMAP-reconstruction loader (LLFF / mip-NeRF-360 / HDR-NeRF scenes).

Behavior parity with reference datasets/colmap.py, restructured around
conventions.py: poses from sparse/0 binaries centered about the average pose
with the 3D point cloud and scaled by the minimum camera norm
(normalize_colmap_poses, pinned by a golden test); mip-NeRF-360
images_{1/d} folders; every-COLMAP_TEST_EVERY-th-image test split;
HDR_EXPOSURES per-scene tables; spheric test trajectory.
"""
import glob
import os

import numpy as np
from tqdm import tqdm

from .base import BaseDataset
from .color_utils import read_image
from .colmap_utils import (qvec2rotmat, read_cameras_binary,
                           read_images_binary, read_points3d_binary)
from .conventions import (COLMAP_TEST_EVERY, HDR_EXPOSURES,
                          HDR_UNIT_EXPOSURE_RGB, MIPNERF360_MARKER,
                          scene_name)
from .ray_utils import center_poses, create_spheric_poses, get_ray_directions


def poses_from_colmap(qvecs, tvecs, perm):
    """World-to-camera quaternion/translation pairs -> (N, 3, 4) c2w poses in
    ``perm`` (filename-sorted) order. Parity: reference colmap.py:58-67."""
    bottom = np.array([[0, 0, 0, 1.0]])
    w2c_mats = [np.concatenate(
        [np.concatenate([qvec2rotmat(q), t.reshape(3, 1)], 1), bottom], 0)
        for q, t in zip(qvecs, tvecs)]
    return np.linalg.inv(np.stack(w2c_mats, 0))[perm, :3]


def normalize_colmap_poses(poses, pts3d):
    """Center poses about the point-cloud-informed average pose, then scale
    so the nearest camera sits at distance 1. PSNR-sensitive: parity with
    reference colmap.py:72-76, pinned by the golden test in
    tests/test_colmap_dataset.py."""
    poses, pts3d = center_poses(poses, pts3d)
    scale = np.linalg.norm(poses[..., 3], axis=-1).min()
    poses[..., 3] /= scale
    return poses, pts3d / scale


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
            cx, cy = (p * self.downsample for p in cam.params[1:3])
        elif cam.model in ["PINHOLE", "OPENCV"]:
            fx, fy, cx, cy = (p * self.downsample for p in cam.params[:4])
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

    def _hdr_split(self, split):
        """HDR-NeRF image paths + pose repetition (reference colmap.py:84-113):
        synthetic scenes shoot 3 exposures per train pose / 2 per test pose;
        real scenes alternate even-train / odd-test."""
        if "syndata" in self.root_dir:  # synthetic: 17 test + 18 train poses
            self.unit_exposure_rgb = HDR_UNIT_EXPOSURE_RGB["syndata"]
            if split == "train":
                paths = sorted(glob.glob(os.path.join(
                    self.root_dir, "train/*[024].png")))
                poses = np.repeat(self.poses[-18:], 3, 0)
            elif split == "test":
                paths = sorted(glob.glob(os.path.join(
                    self.root_dir, "test/*[13].png")))
                poses = np.repeat(self.poses[:17], 2, 0)
            else:
                raise ValueError(f"split {split} is invalid for HDR-NeRF!")
        else:  # real: even-index train / odd-index test
            self.unit_exposure_rgb = HDR_UNIT_EXPOSURE_RGB["real"]
            if split == "train":
                paths = sum((sorted(glob.glob(os.path.join(
                    self.root_dir, f"input_images/*{e}.jpg")))[::2]
                    for e in (0, 2, 4)), [])
                poses = np.tile(self.poses[::2], (3, 1, 1))
            elif split == "test":
                paths = sum((sorted(glob.glob(os.path.join(
                    self.root_dir, f"input_images/*{e}.jpg")))[1::2]
                    for e in (1, 3)), [])
                poses = np.tile(self.poses[1::2], (2, 1, 1))
            else:
                raise ValueError(f"split {split} is invalid for HDR-NeRF!")
        self.poses = poses
        return paths

    def read_meta(self, split, **kwargs):
        img_names, qvecs, tvecs = self._images_meta(
            os.path.join(self.root_dir, "sparse/0/images.bin"))
        if MIPNERF360_MARKER in self.root_dir and self.downsample < 1:
            folder = f"images_{int(1 / self.downsample)}"
        else:
            folder = "images"
        img_paths = [os.path.join(self.root_dir, folder, name)
                     for name in sorted(img_names)]
        poses = poses_from_colmap(qvecs, tvecs, np.argsort(img_names))
        pts3d = self._points3d_xyz(
            os.path.join(self.root_dir, "sparse/0/points3D.bin"))
        self.poses, self.pts3d = normalize_colmap_poses(poses, pts3d)

        if split == "test_traj":  # precomputed spheric test poses
            self.poses = create_spheric_poses(
                1.2, self.poses[:, 1, 3].mean()).astype(np.float32)
            self.rays = np.zeros((0, 0, 3), np.float32)
            return

        hdr = "HDR-NeRF" in self.root_dir
        if hdr:
            img_paths = self._hdr_split(split)
        else:  # every COLMAP_TEST_EVERY-th image is test
            if split == "train":
                keep = [i for i in range(len(img_paths))
                        if i % COLMAP_TEST_EVERY != 0]
            elif split == "test":
                keep = [i for i in range(len(img_paths))
                        if i % COLMAP_TEST_EVERY == 0]
            else:
                keep = list(range(len(img_paths)))
            img_paths = [img_paths[i] for i in keep]
            self.poses = self.poses[keep]

        scene = scene_name(self.root_dir)
        rays = []
        print(f"Loading {len(img_paths)} {split} images ...")
        for img_path in tqdm(img_paths):
            buf = [read_image(img_path, self.img_wh, blend_a=False)]
            if hdr:
                e = int(img_path.split(".")[0][-1])
                buf.append(HDR_EXPOSURES[scene][e]
                           * np.ones_like(buf[0][:, :1]))
            rays.append(np.concatenate(buf, 1))

        self.rays = np.stack(rays)
        self.poses = self.poses.astype(np.float32)
