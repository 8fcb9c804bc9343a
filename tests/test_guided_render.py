"""Depth-guided two-pass rendering vs the single-pass alive renderer.

The guided pass tightens per-pixel [t_near, t_far] from a low-res depth
render ONLY where the low-res neighborhood composited to full opacity
(models/rendering._guided_ranges); everywhere else the rasterized block
ranges are kept. On a briefly-trained opaque procedural scene the guided
image must match the unguided one closely while marching fewer samples.
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mfnerf_tpu.datasets.memory import MemoryDataset
from mfnerf_tpu.datasets.ray_utils import get_rays
from mfnerf_tpu.models.rendering import _guided_ranges, render_test
from mfnerf_tpu.train import NeRFSystem
from mfnerf_tpu.utils.procedural import make_scene


def test_guided_ranges_gates_and_bounds():
    """Unit: trusted pixels get [min9-m, max9+m]; edges/low-opacity fall
    back to the block ranges; the guided near never undercuts the block
    near."""
    wl = hl = 8
    s = 4
    w = h = wl * s
    depth = np.full((hl, wl), 2.0, np.float32)
    depth[4, 4] = 2.5  # a bump inside the trusted region
    op = np.ones((hl, wl), np.float32)
    op[2, 2] = 0.5     # untrusted pixel: its 3x3 neighborhood falls back
    t_near = np.full((h * w,), 1.0, np.float32)
    t_far = np.full((h * w,), 9.0, np.float32)
    m = 0.1
    tn, tf = _guided_ranges(jnp.asarray(depth.reshape(-1)),
                            jnp.asarray(op.reshape(-1)),
                            jnp.asarray(t_near), jnp.asarray(t_far),
                            (w, h), s, m)
    tn = np.asarray(tn).reshape(h, w)
    tf = np.asarray(tf).reshape(h, w)
    # interior trusted pixel far from the bump/hole: tight range
    assert abs(tn[s * 5 + 1, s * 6 + 1] - (2.0 - m)) < 1e-6
    assert abs(tf[s * 5 + 1, s * 6 + 1] - (2.0 + m)) < 1e-6
    # neighbors of the bump widen to cover it
    assert abs(tf[s * 4 + 1, s * 4 + 1] - (2.5 + m)) < 1e-6
    # pixels whose 3x3 contains the untrusted one keep the block range
    assert tn[s * 2 + 1, s * 2 + 1] == 1.0 and tf[s * 2 + 1, s * 2 + 1] == 9.0
    assert tn[s * 3 + 1, s * 3 + 1] == 1.0  # neighbor of untrusted
    # image-edge lo pixels always fall back
    assert tn[1, 1] == 1.0 and tf[1, 1] == 9.0


def test_guided_two_pass_matches_unguided():
    wh = 64
    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=0.5, use_exposure=False, distortion_loss_w=0.0,
        batch_size=1024, ray_sampling_strategy="all_images", num_epochs=1,
        num_gpus=1, lr=1e-2, optimize_ext=False, random_bg=False,
        eval_lpips=False, val_only=False, no_save_test=True, exp_name="gd",
        ckpt_path=None, weight_path=None, grid="LowRank", L=8, F=2, T=14,
        N_min=16, N_max=128, N_tables=1, rgb_channels=16, rgb_layers=1,
        seed=0, s_max_train=32, s_max_test=64, test_chunk=wh * wh,
        lpips_weights=None, profile=False, steps_per_epoch=64, grid_size=32,
        max_samples=128, lr_levels=3, lr_rank=8, lr_frames=2, lr_k_max=64,
        bf16=False, s_flat=0, lr_fused=True)
    scene = make_scene(n_train=6, n_test=1, wh=wh, seed=2)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    fused = system.make_fused_train_fn(n_img=6, hw=wh * wh)
    rays = jnp.asarray(system.train_dataset.rays)
    system.params, system.opt_state, system.occ, m = fused(
        system.params, system.opt_state, system.occ, system.poses,
        system.directions, rays, jax.random.PRNGKey(1), 0, 384)
    assert float(m["psnr"]) > 18, float(m["psnr"])

    pose = jnp.asarray(scene["test_poses"][0])
    rays_o, rays_d = get_rays(jnp.asarray(scene["directions"]), pose)
    camera = (scene["K"], pose, (wh, wh))
    plain = render_test(system.model, system.params, system.occ, rays_o,
                        rays_d, system.rcfg, camera=camera)
    guided = render_test(system.model, system.params, system.occ, rays_o,
                         rays_d, system.rcfg, camera=camera, guided=True)
    err = float(jnp.mean((guided["rgb"] - plain["rgb"]) ** 2))
    psnr_between = -10 * np.log10(max(err, 1e-12))
    assert psnr_between > 30, psnr_between
    # the guided ranges must actually engage: fewer composited samples even
    # counting the low-res pass's own (included in total_samples)
    assert int(guided["total_samples"]) < int(plain["total_samples"])

    # odd (non-stride-divisible, non-square) resolution: the lo grid
    # edge-pads the remainder pixels (falling back to block ranges there)
    from mfnerf_tpu.datasets.ray_utils import get_ray_directions
    wo, ho = 61, 45
    k_odd = np.float32([[48.0, 0, wo / 2], [0, 48.0, ho / 2], [0, 0, 1]])
    dirs_odd = get_ray_directions(ho, wo, k_odd)
    ro2, rd2 = get_rays(jnp.asarray(dirs_odd), pose)
    cam_odd = (k_odd, pose, (wo, ho))
    p2 = render_test(system.model, system.params, system.occ, ro2, rd2,
                     system.rcfg, camera=cam_odd)
    g2 = render_test(system.model, system.params, system.occ, ro2, rd2,
                     system.rcfg, camera=cam_odd, guided=True)
    err2 = float(jnp.mean((g2["rgb"] - p2["rgb"]) ** 2))
    assert -10 * np.log10(max(err2, 1e-12)) > 30
