#!/usr/bin/env python
"""Offline evaluation — the script equivalent of the reference test.ipynb:
per-image render + PSNR + FPS timing, optional mesh export via marching
cubes of the trained density field.

Usage:
    python eval.py --root_dir ... --dataset_name nsvf --ckpt_path ... \
        [--mesh out.obj] [--save_dir results/eval]
"""
import argparse
import os
import sys
import time

import numpy as np


def main():
    from mfnerf_tpu.opt import get_opts
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--mesh", type=str, default=None)
    extra.add_argument("--mesh_resolution", type=int, default=256)
    extra.add_argument("--sigma_threshold", type=float, default=20.0)
    extra.add_argument("--guided", action="store_true",
                       help="depth-guided two-pass rendering (see "
                            "models/rendering.render_test; approximate on "
                            "silhouettes of sub-stride occluders)")
    extra.add_argument("--t_threshold", type=float, default=1e-2,
                       help="transmittance kill threshold. The reference's "
                            "offline-eval protocol (test.ipynb cell 2) "
                            "renders at 1e-2, not the 1e-4 used in "
                            "training-time validation")
    extra.add_argument("--wavefront", type=str, default=None,
                       help="render via the persistent-pool wavefront "
                            "renderer: 'P,seek,window,cap'; 'none' forces "
                            "the round-schedule renderer")
    extra_args, rest = extra.parse_known_args()
    hparams = get_opts(rest)
    if not hparams.ckpt_path:
        raise SystemExit("--ckpt_path required")

    import jax
    import jax.numpy as jnp
    from mfnerf_tpu.datasets import dataset_dict
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.rendering import render_test
    from mfnerf_tpu.train import NeRFSystem, depth2img
    from mfnerf_tpu.utils.ckpt import load_ckpt
    from mfnerf_tpu.utils.metrics import psnr as psnr_fn

    import dataclasses
    system = NeRFSystem(hparams)
    system.rcfg = dataclasses.replace(system.rcfg,
                                      T_threshold=extra_args.t_threshold)
    if extra_args.wavefront:
        from mfnerf_tpu.models.rendering import parse_wavefront
        system.rcfg = dataclasses.replace(
            system.rcfg, wavefront=parse_wavefront(extra_args.wavefront))
    # --num_gpus > 1: DP rendering, rays sharded over the device mesh
    # (models/rendering.render_test_sharded)
    mesh = system.mesh if getattr(hparams, "num_gpus", 1) > 1 else None
    dataset = dataset_dict[hparams.dataset_name](
        root_dir=hparams.root_dir, split="test",
        downsample=hparams.downsample)
    system.test_dataset = dataset
    params = system.model.init(jax.random.PRNGKey(0))
    from mfnerf_tpu.models.ngp import OccupancyState
    occ = OccupancyState.create(system.model_cfg)
    loaded = load_ckpt(hparams.ckpt_path, like={"params": params,
                                                "occ": occ})
    params = loaded["params"]
    if "occ" in loaded and not isinstance(loaded["occ"], dict):
        occ = loaded["occ"].refresh_coarse(system.model_cfg)

    save_dir = None
    if not hparams.no_save_test:
        save_dir = f"results/{hparams.dataset_name}/{hparams.exp_name}/eval"
        os.makedirs(save_dir, exist_ok=True)

    w, h = dataset.img_wh
    psnrs, times = [], []
    directions = jnp.asarray(dataset.directions)
    for i in range(len(dataset)):
        batch = dataset[i]
        rays_o, rays_d = get_rays(directions, jnp.asarray(batch["pose"]))
        t0 = time.perf_counter()
        if mesh is not None:
            from mfnerf_tpu.models.rendering import render_test_sharded
            res = render_test_sharded(
                system.model, params, occ, rays_o, rays_d, system.rcfg,
                mesh, camera=(dataset.K, batch["pose"], dataset.img_wh))
        else:
            res = render_test(
                system.model, params, occ, rays_o, rays_d, system.rcfg,
                camera=(dataset.K, batch["pose"], dataset.img_wh),
                guided=extra_args.guided)
        # device_get of a derived scalar: block_until_ready can return
        # before execution finishes over the tunnel (docs/TPU_NOTES.md)
        float(jax.device_get(res["rgb"].sum()))
        times.append(time.perf_counter() - t0)
        line = f"image {i}: {times[-1] * 1e3:.0f} ms"
        if "rgb" in batch:
            p = float(psnr_fn(res["rgb"], jnp.asarray(batch["rgb"])))
            psnrs.append(p)
            line += f", psnr {p:.2f}"
        if save_dir:
            import imageio.v2 as imageio
            rgb = np.asarray(res["rgb"]).reshape(h, w, 3)
            imageio.imsave(os.path.join(save_dir, f"{i:03d}.png"),
                           (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            d = np.asarray(res["depth"]).reshape(h, w)
            imageio.imsave(os.path.join(save_dir, f"{i:03d}_d.png"),
                           depth2img(d))
        print(line, flush=True)

    if psnrs:
        print(f"mean PSNR: {np.mean(psnrs):.2f} dB")
    print(f"mean FPS: {1.0 / np.mean(times):.2f}")

    if extra_args.mesh:
        from mfnerf_tpu.utils.mesh import extract_mesh
        verts, tris = extract_mesh(
            system.model, params, resolution=extra_args.mesh_resolution,
            sigma_threshold=extra_args.sigma_threshold,
            out_path=extra_args.mesh)
        print(f"mesh: {len(verts)} vertices -> {extra_args.mesh}")


if __name__ == "__main__":
    main()
