"""ColmapDataset integration test on a synthesized on-disk COLMAP scene.

Builds a minimal sparse/0 reconstruction (cameras/images/points3D .bin in the
published binary format) plus an images/ folder, and checks the loader's
pose centering/normalization, split logic and ray preloading — through
whichever parser backend is active (C++ native or Python fallback).
"""
import os
import struct

import numpy as np
import pytest


def _look_at_w2c(cam_pos):
    """World-to-camera [R|t] for a camera at cam_pos looking at the origin
    (COLMAP convention: x right, y down, z forward)."""
    fwd = -cam_pos / np.linalg.norm(cam_pos)
    up = np.array([0.0, 0.0, 1.0])
    if abs(fwd @ up) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    r_c2w = np.stack([right, down, fwd], 1)  # columns = camera axes in world
    r_w2c = r_c2w.T
    t = -r_w2c @ cam_pos
    return r_w2c, t


def _rotmat_to_qvec(r):
    from mfnerf_tpu.datasets.colmap_utils import rotmat2qvec
    return rotmat2qvec(r)


def _write_scene(root, n_images=9, wh=(20, 16)):
    import imageio.v2 as imageio
    w, h = wh
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    with open(os.path.join(root, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))  # PINHOLE
        f.write(struct.pack("<dddd", 0.8 * w, 0.8 * w, w / 2, h / 2))

    rng = np.random.default_rng(0)
    names = [f"im_{i:03d}.png" for i in range(n_images)]
    with open(os.path.join(root, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            ang = 2 * np.pi * i / n_images
            pos = 3.0 * np.array([np.cos(ang), np.sin(ang), 0.4])
            r_w2c, t = _look_at_w2c(pos)
            q = _rotmat_to_qvec(r_w2c)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(names[i].encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            imageio.imsave(os.path.join(root, "images", names[i]), img)

    pts = rng.normal(scale=0.5, size=(40, 3))
    with open(os.path.join(root, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<q", i))
            f.write(struct.pack("<ddd", *p))
            f.write(struct.pack("<BBB", 128, 128, 128))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))


@pytest.mark.parametrize("force_python", [False, True])
def test_colmap_dataset_loads(tmp_path, force_python, monkeypatch):
    from mfnerf_tpu import native
    from mfnerf_tpu.datasets.colmap import ColmapDataset

    if force_python:
        monkeypatch.setattr(native, "available", lambda: False)

    root = str(tmp_path / "scene")
    _write_scene(root)
    train = ColmapDataset(root, split="train")
    test = ColmapDataset(root, split="test")

    assert train.img_wh == (20, 16)
    # every-8th split of 9 images: test {0, 8}, train the other 7
    assert len(train.poses) == 7
    assert len(test.poses) == 2
    assert train.rays.shape == (7, 20 * 16, 3)
    assert np.isfinite(train.poses).all()
    # pose normalization: min camera distance scaled to 1
    dists = np.linalg.norm(train.poses[..., 3], axis=-1)
    all_d = np.concatenate(
        [dists, np.linalg.norm(test.poses[..., 3], axis=-1)])
    assert all_d.min() == pytest.approx(1.0, rel=1e-3)
    # rays in [0,1]
    assert train.rays.min() >= 0 and train.rays.max() <= 1

    # sampling a train batch works
    train.batch_size = 128
    batch = train[0]
    assert batch["rgb"].shape == (128, 3)


def test_colmap_dataset_native_matches_python(tmp_path, monkeypatch):
    from mfnerf_tpu import native
    from mfnerf_tpu.datasets.colmap import ColmapDataset
    if not native.available():
        pytest.skip("native loader unavailable")

    root = str(tmp_path / "scene")
    _write_scene(root)
    ds_native = ColmapDataset(root, split="train")
    monkeypatch.setattr(native, "available", lambda: False)
    ds_python = ColmapDataset(root, split="train")
    np.testing.assert_allclose(ds_native.poses, ds_python.poses, atol=1e-6)
    np.testing.assert_allclose(ds_native.rays, ds_python.rays, atol=1e-6)


def test_colmap_pose_normalization_golden():
    """Pin the PSNR-sensitive COLMAP pose centering+scaling exactly
    (reference colmap.py:72-76 semantics): cameras on a ring looking inward,
    point cloud around the origin -> centered poses and scaled points must
    match the frozen golden values, and the nearest camera must sit at
    distance 1.
    """
    import numpy as np
    from mfnerf_tpu.datasets.colmap import (normalize_colmap_poses,
                                            poses_from_colmap)

    rng = np.random.default_rng(42)
    n = 6
    qvecs, tvecs = [], []
    for i in range(n):
        a = 2 * np.pi * i / n
        c = np.array([3 * np.cos(a), 0.4 * np.sin(2 * a), 3 * np.sin(a)])
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        r = np.stack([x, y, z], 1).T  # w2c
        t = -r @ c
        qw = np.sqrt(max(0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
        qvecs.append([qw, (r[2, 1] - r[1, 2]) / (4 * qw),
                      (r[0, 2] - r[2, 0]) / (4 * qw),
                      (r[1, 0] - r[0, 1]) / (4 * qw)])
        tvecs.append(t)
    pts3d = rng.normal(size=(50, 3)) * 0.5
    poses = poses_from_colmap(np.array(qvecs), np.array(tvecs), np.arange(n))
    p, pt = normalize_colmap_poses(poses, pts3d)

    golden_p0 = np.array([
        [-7.07106781e-01, 2.85500899e-17, 7.07106781e-01, -7.10843285e-01],
        [-1.23091491e-01, 9.84731928e-01, -1.23091491e-01, 1.42250715e-01],
        [-6.96310624e-01, -1.74077656e-01, -6.96310624e-01, 6.89087895e-01]])
    golden_p3 = np.array([
        [7.07106781e-01, 5.16422514e-17, -7.07106781e-01, 7.03526874e-01],
        [1.23091491e-01, 9.84731928e-01, 1.23091491e-01, -1.03959526e-01],
        [6.96310624e-01, -1.74077656e-01, 6.96310624e-01, -7.03687558e-01]])
    golden_pt = np.array([[-0.12802475, -0.16070292, -0.02885745],
                          [0.03896323, -0.25508209, 0.30961497]])
    np.testing.assert_allclose(p[0], golden_p0, atol=1e-7)
    np.testing.assert_allclose(p[3], golden_p3, atol=1e-7)
    np.testing.assert_allclose(pt[:2], golden_pt, atol=1e-7)
    np.testing.assert_allclose(
        np.linalg.norm(p[..., 3], axis=-1).min(), 1.0, rtol=1e-12)
