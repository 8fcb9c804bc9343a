"""C++ native data-loader runtime (mfnerf_tpu/csrc) parity tests.

Each native component is compared against the pure-Python reference path on
synthesized inputs: image decode/blend/resize vs color_utils.read_image, and
the COLMAP binary parsers vs colmap_utils.read_*_binary on .bin files written
here to the published format spec.
"""
import os
import struct

import numpy as np
import pytest

from mfnerf_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable (no g++/libpng)")


# --------------------------------------------------------------------- images

def _write_png(path, arr):
    import imageio.v2 as imageio
    imageio.imsave(path, arr)


@pytest.mark.parametrize("case", ["rgba", "rgb", "gray"])
def test_image_decode_matches_python(tmp_path, case):
    from mfnerf_tpu.datasets.color_utils import read_image
    rng = np.random.default_rng(0)
    h, w = 23, 31
    if case == "rgba":
        arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    elif case == "rgb":
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    else:
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    p = str(tmp_path / f"{case}.png")
    _write_png(p, arr)

    for blend_a in ([True, False] if case == "rgba" else [True]):
        ref = read_image(p, (w, h), blend_a=blend_a)
        got = native.load_images([p], (w, h), blend_a=blend_a)[0]
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_image_resize_close_to_cv2(tmp_path):
    from mfnerf_tpu.datasets.color_utils import read_image
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (64, 48, 4), dtype=np.uint8)
    p = str(tmp_path / "r.png")
    _write_png(p, arr)
    # cv2 INTER_LINEAR uses fixed-point interpolation internally on some
    # paths; allow small tolerance.
    ref = read_image(p, (24, 32), blend_a=True)
    got = native.load_images([p], (24, 32), blend_a=True)[0]
    assert got.shape == ref.shape == (24 * 32, 3)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_jpeg_decode(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "j.jpg")
    imageio.imsave(p, arr)
    ref = imageio.imread(p).astype(np.float32) / 255.0
    got = native.load_images([p], (32, 32))[0].reshape(32, 32, 3)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_batch_and_missing_file(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(5):
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        p = str(tmp_path / f"b{i}.png")
        _write_png(p, arr)
        paths.append(p)
    out = native.load_images(paths, (16, 16), n_threads=4)
    assert out.shape == (5, 256, 3)
    with pytest.raises(IOError):
        native.load_images([paths[0], str(tmp_path / "nope.png")], (16, 16))


# --------------------------------------------------------------------- colmap

def _write_colmap_bins(tmp_path, rng):
    """Synthesize cameras/images/points3D .bin per the COLMAP format spec."""
    cam_path = str(tmp_path / "cameras.bin")
    with open(cam_path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, 800, 600))        # PINHOLE
        f.write(struct.pack("<dddd", 500.0, 501.0, 400.0, 300.0))
        f.write(struct.pack("<iiQQ", 2, 2, 640, 480))        # SIMPLE_RADIAL
        f.write(struct.pack("<dddd", 450.0, 320.0, 240.0, 0.01))

    img_path = str(tmp_path / "images.bin")
    qs = rng.normal(size=(3, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    ts = rng.normal(size=(3, 3))
    names = ["a.png", "subdir/b.png", "c_long_name_image.jpg"]
    with open(img_path, "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<i", 10 + i))
            f.write(struct.pack("<dddd", *qs[i]))
            f.write(struct.pack("<ddd", *ts[i]))
            f.write(struct.pack("<i", 1 + (i % 2)))
            f.write(names[i].encode() + b"\x00")
            npts = i * 2
            f.write(struct.pack("<Q", npts))
            for p in range(npts):
                f.write(struct.pack("<ddq", float(p), float(p) + 0.5,
                                    p if p % 2 == 0 else -1))

    pts_path = str(tmp_path / "points3D.bin")
    n_pts = 50
    with open(pts_path, "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<q", 100 + i))
            f.write(struct.pack("<ddd", *rng.normal(size=3)))
            f.write(struct.pack("<BBB", i % 256, (i * 7) % 256, 3))
            f.write(struct.pack("<d", abs(rng.normal())))
            tlen = i % 4
            f.write(struct.pack("<Q", tlen))
            for k in range(tlen):
                f.write(struct.pack("<ii", 10 + k, k * 3))
    return cam_path, img_path, pts_path


def test_colmap_parsers_match_python(tmp_path):
    from mfnerf_tpu.datasets import colmap_utils as cu
    rng = np.random.default_rng(7)
    cam_path, img_path, pts_path = _write_colmap_bins(tmp_path, rng)

    # cameras
    ref = cu.read_cameras_binary(cam_path)
    got = native.read_cameras(cam_path)
    assert list(got["ids"]) == sorted(ref.keys())
    for i, cid in enumerate(got["ids"]):
        r = ref[cid]
        o = got["param_offsets"]
        assert cu.CAMERA_MODEL_IDS[got["model_ids"][i]].model_name == r.model
        assert tuple(got["wh"][i]) == (r.width, r.height)
        np.testing.assert_allclose(got["params"][o[i]:o[i + 1]], r.params)

    # images
    ref = cu.read_images_binary(img_path)
    got = native.read_images_meta(img_path)
    assert list(got["ids"]) == sorted(ref.keys())
    for i, iid in enumerate(got["ids"]):
        r = ref[iid]
        np.testing.assert_allclose(got["qvecs"][i], r.qvec)
        np.testing.assert_allclose(got["tvecs"][i], r.tvec)
        assert got["camera_ids"][i] == r.camera_id
        assert got["names"][i] == r.name
        o = got["pt_offsets"]
        np.testing.assert_allclose(got["xys"][o[i]:o[i + 1]], r.xys)
        np.testing.assert_array_equal(got["p3d_ids"][o[i]:o[i + 1]],
                                      r.point3D_ids)

    # points3D
    ref = cu.read_points3d_binary(pts_path)
    got = native.read_points3d(pts_path)
    assert list(got["ids"]) == sorted(ref.keys())
    for i, pid in enumerate(got["ids"]):
        r = ref[pid]
        np.testing.assert_allclose(got["xyz"][i], r.xyz)
        np.testing.assert_array_equal(got["rgb"][i], r.rgb)
        assert got["error"][i] == pytest.approx(r.error)
        o = got["track_offsets"]
        np.testing.assert_array_equal(got["track_image_ids"][o[i]:o[i + 1]],
                                      r.image_ids)
        np.testing.assert_array_equal(got["track_p2d"][o[i]:o[i + 1]],
                                      r.point2D_idxs)
