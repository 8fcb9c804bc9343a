#!/usr/bin/env python
"""Export pretrained LPIPS(VGG16) weights to the canonical npz layout.

Run this on any machine with network access and ``torch`` plus EITHER the
``lpips`` package OR ``torchvision`` (+ the lpips linear weights file), then
copy the npz here and pass it via ``--lpips_weights`` / ``eval.py
--lpips_weights``. This environment has no network access, which is why the
weights are not bundled.

Usage:
    python misc/export_lpips_weights.py --out lpips_vgg.npz

npz keys (see mfnerf_tpu/utils/lpips.py:canonical_weight_shapes):
    conv{0..12}_w  (O, I, 3, 3)   VGG16 feature convs, torch OIHW
    conv{0..12}_b  (O,)
    lin{0..4}_w    (C_k,)         LPIPS learned per-channel head weights
"""
import argparse

import numpy as np


def export_from_lpips_pkg(out_path):
    import lpips  # pip install lpips

    model = lpips.LPIPS(net="vgg", spatial=False)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    out = {}
    # VGG convs live under net.slice{1..5}.{idx}.weight with torchvision
    # features indexing; collect all conv weights in order of their index.
    convs = sorted(
        ((int(k.split(".")[2]), k) for k in sd
         if k.startswith("net.slice") and k.endswith(".weight")),
        key=lambda t: t[0])
    for i, (_, k) in enumerate(convs):
        out[f"conv{i}_w"] = sd[k].astype(np.float32)
        out[f"conv{i}_b"] = sd[k[:-len("weight")] + "bias"].astype(np.float32)
    for k in range(5):
        out[f"lin{k}_w"] = (
            sd[f"lins.{k}.model.1.weight"].reshape(-1).astype(np.float32))
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays) from the lpips package")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()
    export_from_lpips_pkg(args.out)

    # self-check against the canonical shape table if mfnerf_tpu is importable
    try:
        from mfnerf_tpu.utils.lpips import load_lpips_weights
        load_lpips_weights(args.out)
        print("shape check OK")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
