"""ctypes bindings for the C++ native data-loader runtime (csrc/).

Builds ``csrc/_nativeloader.so`` on demand with g++ (cached; rebuilt when the
source is newer) and exposes:

* :func:`load_images` — thread-pooled PNG/JPEG decode + alpha blend +
  bilinear resize straight into one float32 batch array (replaces the
  per-image imageio+cv2 path of datasets/color_utils.py).
* :func:`read_points3d` / :func:`read_images_meta` / :func:`read_cameras` —
  COLMAP sparse-reconstruction binary parsers returning flat numpy arrays
  (replaces the Python struct loops of datasets/colmap_utils.py, reference
  colmap_utils.py:108-263).

Everything degrades gracefully: if g++ or libpng/libjpeg are unavailable,
:func:`available` returns False and callers fall back to the Python path.
Set ``MFNERF_NATIVE=0`` to force the fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "nativeloader.cc")
_LIB = os.path.join(_DIR, "csrc", "_nativeloader.so")
_lib = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-lpng", "-ljpeg", "-pthread", "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MFNERF_NATIVE", "1") == "0":
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except (OSError, subprocess.CalledProcessError):
        return None
    lib.nl_load_images.restype = ctypes.c_int
    lib.nl_load_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p]
    lib.nl_image_size.restype = ctypes.c_int
    lib.nl_image_size.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    for name, argt in [
            ("nl_colmap_cameras_sizes", [ctypes.c_char_p, _i64p, _i64p]),
            ("nl_colmap_cameras_read",
             [ctypes.c_char_p, _i32p, _i32p, _i64p, _i64p, _f64p]),
            ("nl_colmap_images_sizes",
             [ctypes.c_char_p, _i64p, _i64p, _i64p]),
            ("nl_colmap_images_read",
             [ctypes.c_char_p, _i32p, _f64p, _f64p, _i32p, ctypes.c_char_p,
              _i64p, _f64p, _i64p]),
            ("nl_colmap_points3d_sizes", [ctypes.c_char_p, _i64p, _i64p]),
            ("nl_colmap_points3d_read",
             [ctypes.c_char_p, _i64p, _f64p, _u8p, _f64p, _i64p, _i32p,
              _i32p]),
    ]:
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = argt
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _check(ret, what):
    if ret != 0:
        raise IOError(f"native {what} failed (code {ret})")


def load_images(paths, img_wh, blend_a=True, n_threads=0) -> np.ndarray:
    """Decode+blend+resize a list of images into a (N, H*W, 3) float32 batch.

    Semantics match datasets/color_utils.py:read_image (alpha blend-to-white
    when blend_a, else premultiply-onto-black; cv2-style bilinear resize).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w, h = int(img_wh[0]), int(img_wh[1])
    n = len(paths)
    out = np.empty((n, h * w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    ret = lib.nl_load_images(arr, n, w, h, int(blend_a), int(n_threads),
                             out.ctypes.data_as(_f32p))
    if ret != 0:
        i = -ret - 1
        raise IOError(f"native image load failed for {paths[i]!r}")
    return out


def read_cameras(path) -> dict:
    """cameras.bin -> dict of flat arrays (ids, model_ids, wh, param_offsets,
    params); params for camera i are params[o[i]:o[i+1]]."""
    lib = _load()
    n_cams, n_params = ctypes.c_int64(), ctypes.c_int64()
    _check(lib.nl_colmap_cameras_sizes(os.fsencode(path),
                                       ctypes.byref(n_cams),
                                       ctypes.byref(n_params)),
           "cameras sizes")
    n = n_cams.value
    ids = np.empty(n, np.int32)
    model_ids = np.empty(n, np.int32)
    wh = np.empty((n, 2), np.int64)
    offs = np.empty(n + 1, np.int64)
    params = np.empty(n_params.value, np.float64)
    _check(lib.nl_colmap_cameras_read(
        os.fsencode(path), ids.ctypes.data_as(_i32p),
        model_ids.ctypes.data_as(_i32p), wh.ctypes.data_as(_i64p),
        offs.ctypes.data_as(_i64p), params.ctypes.data_as(_f64p)),
        "cameras read")
    return {"ids": ids, "model_ids": model_ids, "wh": wh,
            "param_offsets": offs, "params": params}


def read_images_meta(path) -> dict:
    """images.bin -> dict of flat arrays: ids, qvecs (N,4), tvecs (N,3),
    camera_ids, names (list[str]), pt_offsets (N+1), xys (P,2), p3d_ids (P)."""
    lib = _load()
    n_img, n_pts, nb = (ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64())
    _check(lib.nl_colmap_images_sizes(os.fsencode(path), ctypes.byref(n_img),
                                      ctypes.byref(n_pts), ctypes.byref(nb)),
           "images sizes")
    n, p = n_img.value, n_pts.value
    ids = np.empty(n, np.int32)
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names_buf = ctypes.create_string_buffer(nb.value)
    offs = np.empty(n + 1, np.int64)
    xys = np.empty((p, 2), np.float64)
    p3d = np.empty(p, np.int64)
    _check(lib.nl_colmap_images_read(
        os.fsencode(path), ids.ctypes.data_as(_i32p),
        qvecs.ctypes.data_as(_f64p), tvecs.ctypes.data_as(_f64p),
        cam_ids.ctypes.data_as(_i32p), names_buf,
        offs.ctypes.data_as(_i64p), xys.ctypes.data_as(_f64p),
        p3d.ctypes.data_as(_i64p)), "images read")
    names = bytes(names_buf.raw).split(b"\x00")[:-1]
    return {"ids": ids, "qvecs": qvecs, "tvecs": tvecs, "camera_ids": cam_ids,
            "names": [s.decode("utf-8") for s in names],
            "pt_offsets": offs, "xys": xys, "p3d_ids": p3d}


def read_points3d(path) -> dict:
    """points3D.bin -> dict of flat arrays: ids, xyz (N,3), rgb (N,3) uint8,
    error (N,), track_offsets (N+1), track_image_ids, track_p2d."""
    lib = _load()
    n_pts, n_track = ctypes.c_int64(), ctypes.c_int64()
    _check(lib.nl_colmap_points3d_sizes(os.fsencode(path),
                                        ctypes.byref(n_pts),
                                        ctypes.byref(n_track)),
           "points3d sizes")
    n, t = n_pts.value, n_track.value
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    offs = np.empty(n + 1, np.int64)
    tids = np.empty(t, np.int32)
    tp2d = np.empty(t, np.int32)
    _check(lib.nl_colmap_points3d_read(
        os.fsencode(path), ids.ctypes.data_as(_i64p),
        xyz.ctypes.data_as(_f64p), rgb.ctypes.data_as(_u8p),
        err.ctypes.data_as(_f64p), offs.ctypes.data_as(_i64p),
        tids.ctypes.data_as(_i32p), tp2d.ctypes.data_as(_i32p)),
        "points3d read")
    return {"ids": ids, "xyz": xyz, "rgb": rgb, "error": err,
            "track_offsets": offs, "track_image_ids": tids,
            "track_p2d": tp2d}
