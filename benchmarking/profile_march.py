#!/usr/bin/env python
"""Bisect the two-level training march into sub-stage costs.

Times (dependent in-jit loops, docs/TPU_NOTES.md): stage A coarse tests,
stage A + compaction, + stage B fine occupancy, + k_sel selection, and the
full march; plus raw bitfield-gather rates at the march's shapes.
"""
import argparse
import sys
import time
from functools import partial

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timed(fn, n_iter, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(seed, *a):
        def body(i, carry):
            seed, acc = carry
            return seed, acc + fn(jax.random.fold_in(seed, i), *a)
        _, acc = jax.lax.fori_loop(0, n_iter, body,
                                   (seed, jnp.zeros((), jnp.float32)))
        return acc

    key = __import__("jax").random.PRNGKey(0)
    jax = __import__("jax")
    jax.block_until_ready(run(key, *args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(key, *args))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.rendering import _clamp_near
    from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
    from mfnerf_tpu.ops.morton import bitfield_lookup, morton3d
    from mfnerf_tpu.ops.ray_march import (compact_rung_indices,
                                          compact_rung_indices_at,
                                          march_rays_train_twolevel,
                                          twolevel_stratum, _occupancy_at)
    from mfnerf_tpu.ops.stepping import calc_dt, t_ladder
    from mfnerf_tpu.train import NeRFSystem
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=0.5, use_exposure=False, distortion_loss_w=0.0,
        batch_size=args.batch_size, ray_sampling_strategy="all_images",
        num_epochs=1, num_gpus=1, lr=1e-2, optimize_ext=False,
        random_bg=False, eval_lpips=False, val_only=False, no_save_test=True,
        exp_name="pm", ckpt_path=None, weight_path=None, grid="LowRank",
        L=16, F=2, T=19, N_min=16, N_max=2048, N_tables=1, rgb_channels=64,
        rgb_layers=2, seed=1337, s_max_train=64, s_max_test=256,
        test_chunk=65536, lpips_weights=None, profile=False,
        steps_per_epoch=1000, grid_size=128, max_samples=1024,
        lr_levels=8, lr_rank=16, lr_frames=2, lr_k_max=512, bf16=False)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = make_scene(n_train=16, n_test=1, wh=800, seed=0)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    rays = jnp.asarray(system.train_dataset.rays)
    hw = 800 * 800
    fused = system.make_fused_train_fn(n_img=16, hw=hw)
    key = jax.random.PRNGKey(1)
    step = 0
    for _ in range(3):
        key, sub = jax.random.split(key)
        system.params, system.opt_state, system.occ, m = fused(
            system.params, system.opt_state, system.occ, system.poses,
            system.directions, rays, sub, step, 96)
        step += 96
    jax.block_until_ready(m["loss"])
    print(f"warmup: rm_s {float(m['rm_s']):.1f}", file=sys.stderr)

    cfg, rcfg, occ = system.model_cfg, system.rcfg, system.occ
    n = args.batch_size
    img_idxs = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 16)
    pix_idxs = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, hw)
    rays_o, rays_d = get_rays(system.directions[pix_idxs],
                              system.poses[img_idxs])
    hits_t = _clamp_near(ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale)))
    stratum, _ = twolevel_stratum(rcfg.exp_step_factor, rcfg.max_samples,
                                  cfg.scale, cfg.grid_size, cfg.cascades,
                                  cfg.dir_norm)
    n_rungs = rcfg.n_rungs(cfg.scale, cfg.grid_size)
    s_max, s_strata = rcfg.s_max_train, rcfg.s_strata
    e, ms_, gs, sc = (rcfg.exp_step_factor, rcfg.max_samples, cfg.grid_size,
                      cfg.scale)
    n_strata = -(-n_rungs // stratum)
    g_c = gs // 2
    print(f"config: n_rungs={n_rungs} stratum={stratum} "
          f"n_strata={n_strata} s_strata={s_strata} s_max={s_max}",
          file=sys.stderr)

    def march_nbr_gathers(key):
        """Just the march's row gathers at its shapes (cost floor)."""
        n_super = -(-(-(-n_rungs // stratum)) // 4)
        m_a = n * n_super
        m_b = n * s_strata
        i_a = jax.random.randint(key, (m_a,), 0, occ.coarse_nbr.shape[0])
        i_b = jax.random.randint(key, (m_b,), 0, occ.fine_nbr.shape[0])
        return (occ.coarse_nbr[i_a].sum() + occ.fine_nbr[i_b].sum()
                ).astype(jnp.float32)

    print(f"march row gathers alone: "
          f"{timed(march_nbr_gathers, args.iters):.2f} ms")

    def full(key):
        noise = jax.random.uniform(key, (n,))
        mr = march_rays_train_twolevel(
            rays_o, rays_d, hits_t, occ.fine_nbr,
            occ.coarse_nbr, sc, e, gs, ms_, noise, n_rungs, s_max,
            stratum, s_strata=s_strata, dir_norm=cfg.dir_norm)
        return mr.ts.sum()

    print(f"full two-level march: {timed(full, args.iters):.2f} ms")

    # raw gather rates at the march's shapes
    for n_idx, nbytes in ((n * n_strata, occ.coarse_bitfield.size),
                          (n * s_strata * stratum,
                           occ.density_bitfield.size)):
        table = jnp.arange(nbytes, dtype=jnp.int32) % 251

        def g(key, t=table, m=n_idx):
            idx = jax.random.randint(key, (m,), 0, t.size)
            return t[idx].sum().astype(jnp.float32)

        print(f"raw gather {n_idx} idx from {nbytes}B table: "
              f"{timed(g, args.iters):.2f} ms")


if __name__ == "__main__":
    main()
