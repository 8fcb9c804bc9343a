#!/usr/bin/env python
"""3D debug visualization of a scene setup — cameras, rays, marched samples
and cascade boxes — the script equivalent of the reference test.ipynb's
plotly debug cell (cell 6). plotly isn't available in this image, so the
figure renders with matplotlib's 3D axes to a PNG.

Usage:
    python misc/debug_viz.py --root_dir <scene> --dataset_name nsvf \
        [--ckpt_path ckpt.npz] [--out debug.png] [--n_rays 24]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mfnerf_tpu.opt import get_opts
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", type=str, default="debug.png")
    extra.add_argument("--n_rays", type=int, default=24)
    extra_args, rest = extra.parse_known_args()
    hparams = get_opts(rest)

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mfnerf_tpu.datasets import dataset_dict
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
    from mfnerf_tpu.models.rendering import RenderConfig
    from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
    from mfnerf_tpu.ops.ray_march import march_rays_train
    from mfnerf_tpu.train import NeRFSystem
    from mfnerf_tpu.utils.ckpt import load_ckpt

    dataset = dataset_dict[hparams.dataset_name](
        root_dir=hparams.root_dir, split="train",
        downsample=hparams.downsample)
    system = NeRFSystem(hparams)
    cfg = system.model_cfg
    params = system.model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    if hparams.ckpt_path:
        loaded = load_ckpt(hparams.ckpt_path,
                           like={"params": params, "occ": occ})
        params = loaded["params"]
        if "occ" in loaded and not isinstance(loaded["occ"], dict):
            occ = loaded["occ"].refresh_coarse(cfg)

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")

    # cameras: position + forward axis
    poses = np.asarray(dataset.poses)
    ax.scatter(poses[:, 0, 3], poses[:, 1, 3], poses[:, 2, 3],
               c="tab:blue", s=12, label="cameras")
    fwd = poses[:, :3, 2] * 0.25
    for p, f in zip(poses, fwd):
        ax.plot([p[0, 3], p[0, 3] + f[0]], [p[1, 3], p[1, 3] + f[1]],
                [p[2, 3], p[2, 3] + f[2]], c="tab:blue", lw=0.5)

    # a few rays from camera 0 + their marched samples
    directions = jnp.asarray(dataset.directions)
    pix = np.linspace(0, directions.shape[0] - 1, extra_args.n_rays,
                      dtype=int)
    rays_o, rays_d = get_rays(directions[pix], jnp.asarray(poses[0]))
    hits_t = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                       jnp.full(3, cfg.scale))
    rcfg = RenderConfig()
    mr = march_rays_train(
        rays_o, rays_d, hits_t, occ.density_bitfield, cfg.cascades,
        cfg.scale, rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
        jnp.zeros(len(pix)), rcfg.n_rungs(cfg.scale, cfg.grid_size), 64)
    ro, rd = np.asarray(rays_o), np.asarray(rays_d)
    ht = np.asarray(hits_t)
    for i in range(len(pix)):
        t2 = ht[i, 1] if ht[i, 0] >= 0 else 0.3
        ax.plot([ro[i, 0], ro[i, 0] + t2 * rd[i, 0]],
                [ro[i, 1], ro[i, 1] + t2 * rd[i, 1]],
                [ro[i, 2], ro[i, 2] + t2 * rd[i, 2]],
                c="tab:orange", lw=0.4, alpha=0.6)
    xyz = np.asarray(mr.xyzs)[np.asarray(mr.mask)]
    if len(xyz):
        ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c="tab:red", s=2,
                   label="marched samples")

    # cascade boxes: cascade c covers [-2^(c-1), 2^(c-1)]^3 clamped to scale
    for c in range(cfg.cascades):
        s = min(2.0 ** (c - 1), cfg.scale)
        corners = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                            for z in (-s, s)])
        edges = [(0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 7), (5, 1),
                 (5, 4), (5, 7), (6, 2), (6, 4), (6, 7)]
        for a, b in edges:
            ax.plot(*zip(corners[a], corners[b]), c="gray", lw=0.5)

    ax.set_title(f"{hparams.root_dir} — cameras / rays / samples / cascades")
    ax.legend()
    fig.savefig(extra_args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {extra_args.out} "
          f"({int(np.asarray(mr.n_samples).sum())} samples drawn)")


if __name__ == "__main__":
    main()
