#!/usr/bin/env python
"""Convert RTMV HDR .exr frames to LDR .png (parity: reference
misc/prepare_rtmv.py). Requires an EXR reader (imageio with the freeimage
plugin or OpenEXR); gated with a clear error otherwise."""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mfnerf_tpu.datasets.color_utils import linear_to_srgb  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir", help="RTMV scene dir containing *.exr")
    args = ap.parse_args()

    import imageio.v2 as imageio
    exrs = sorted(glob.glob(os.path.join(args.root_dir, "*.exr")))
    if not exrs:
        raise SystemExit(f"no .exr files under {args.root_dir}")
    out_dir = os.path.join(args.root_dir, "images")
    os.makedirs(out_dir, exist_ok=True)
    for p in exrs:
        try:
            img = imageio.imread(p)
        except Exception as e:
            raise SystemExit(
                f"reading {p} failed ({e}); install an EXR plugin, e.g. "
                "imageio's freeimage backend") from e
        img = np.clip(img[..., :3].astype(np.float32), 0, 1)
        img = linear_to_srgb(img)
        name = os.path.splitext(os.path.basename(p))[0] + ".png"
        imageio.imsave(os.path.join(out_dir, name),
                       (img * 255).astype(np.uint8))
        print(name)


if __name__ == "__main__":
    main()
