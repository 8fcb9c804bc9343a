#!/usr/bin/env python
"""Stage-level budget of the fused train step at the bench config.

Times each pipeline stage as a dependent in-jit fori_loop (the only timing
the tunneled chip reports honestly, docs/TPU_NOTES.md): the two-level march,
the field forward, field forward+backward, compositing+losses, and the full
train step. Run with the same defaults as bench.py so the budget maps onto
the headline ms/step.
"""
import argparse
import sys
import time
from functools import partial

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timed_loop(fn, n_iter, *args):
    """Time fn as a dependent fori_loop executed inside one jit."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=())
    def run(seed, *a):
        def body(i, carry):
            seed, acc = carry
            out = fn(jax.random.fold_in(seed, i), *a)
            # fold the output into the carry so iterations can't be elided
            return seed, acc + out
        _, acc = jax.lax.fori_loop(0, n_iter, body,
                                   (seed, jnp.zeros((), jnp.float32)))
        return acc

    key = __import__("jax").random.PRNGKey(0)
    acc = run(key, *args)
    __import__("jax").block_until_ready(acc)  # compile
    t0 = time.perf_counter()
    acc = run(key, *args)
    __import__("jax").block_until_ready(acc)
    return (time.perf_counter() - t0) / n_iter * 1e3


def _flat_layout_arrays(mr0, b, s):
    import jax.numpy as jnp
    counts = mr0.n_samples
    offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    total = counts.sum()
    marks = jnp.zeros((b,), jnp.int32).at[offsets].add(
        1, mode="drop", indices_are_sorted=True)
    ray_id = jnp.cumsum(marks) - 1
    import jax as _jax
    beg = _jax.lax.cummax(
        jnp.where(marks > 0, jnp.arange(b, dtype=jnp.int32), 0))
    pos = jnp.arange(b, dtype=jnp.int32) - beg
    valid = jnp.arange(b) < total
    k_f = mr0.k_idx[ray_id, jnp.minimum(pos, s - 1)]
    return ray_id, offsets, k_f, valid


def _flat_xyz(mr0, rays_o, lay, rcfg, cfg, s):
    import jax.numpy as jnp
    from mfnerf_tpu.ops.stepping import calc_dt, t_ladder
    ray_id, offsets, k_f, valid = lay
    o_f = rays_o[ray_id]
    d_f = mr0.dirs[ray_id]
    t0_f = mr0.t_start[ray_id]
    ts_f = t_ladder(t0_f, k_f[:, None], rcfg.exp_step_factor,
                    rcfg.max_samples, cfg.grid_size, cfg.scale)[:, 0]
    dt_f = calc_dt(ts_f, rcfg.exp_step_factor, rcfg.max_samples,
                   cfg.grid_size, cfg.scale)
    ts_f = jnp.where(valid, ts_f, 0.0)
    dt_f = jnp.where(valid, dt_f, 0.0)
    xyz_f = o_f + ts_f[:, None] * d_f
    return xyz_f, d_f, ts_f, dt_f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--warmup_steps", type=int, default=288)
    ap.add_argument("--s_flat", type=int, default=0,
                    help="flat (ragged) eval budget — bench.py defaults 16; "
                         "affects the full render_train stage only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.rendering import (RenderConfig, _clamp_near,
                                             render_train)
    from mfnerf_tpu.ops.composite import composite_train
    from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
    from mfnerf_tpu.ops.ray_march import (march_rays_train_twolevel,
                                          twolevel_stratum)
    from mfnerf_tpu.train import NeRFSystem
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=0.5, use_exposure=False, distortion_loss_w=0.0,
        batch_size=args.batch_size, ray_sampling_strategy="all_images",
        num_epochs=1, num_gpus=1, lr=1e-2, optimize_ext=False,
        random_bg=False, eval_lpips=False, val_only=False, no_save_test=True,
        exp_name="ps", ckpt_path=None, weight_path=None, grid="LowRank",
        L=16, F=2, T=19, N_min=16, N_max=2048, N_tables=1, rgb_channels=64,
        rgb_layers=2, seed=1337, s_max_train=64, s_max_test=256,
        test_chunk=65536, lpips_weights=None, profile=False,
        steps_per_epoch=1000, grid_size=128, max_samples=1024,
        lr_levels=8, lr_rank=16, lr_frames=2, lr_k_max=512, bf16=False,
        s_flat=args.s_flat, lr_fused=True)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = make_scene(n_train=16, n_test=1, wh=args.wh, seed=0)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    rays = jnp.asarray(system.train_dataset.rays)
    hw = args.wh * args.wh

    # converge the occupancy grid first so samples/ray is steady-state
    fused = system.make_fused_train_fn(n_img=16, hw=hw)
    key = jax.random.PRNGKey(1)
    step = 0
    for n in [96] * (args.warmup_steps // 96):
        key, sub = jax.random.split(key)
        system.params, system.opt_state, system.occ, m = fused(
            system.params, system.opt_state, system.occ, system.poses,
            system.directions, rays, sub, step, n)
        step += n
    jax.block_until_ready(m["loss"])
    print(f"warmup: psnr {float(m['psnr']):.2f} rm_s {float(m['rm_s']):.1f}",
          file=sys.stderr)

    model, params, occ = system.model, system.params, system.occ
    cfg, rcfg = system.model_cfg, system.rcfg
    n = args.batch_size

    # a fixed ray batch for stage isolation
    img_idxs = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 16)
    pix_idxs = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, hw)
    rgb_gt = rays[img_idxs, pix_idxs][:, :3]
    dirs = system.directions[pix_idxs]
    pose = system.poses[img_idxs]
    rays_o, rays_d = get_rays(dirs, pose)
    hits_t = _clamp_near(ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale)))
    stratum, _ = twolevel_stratum(rcfg.exp_step_factor, rcfg.max_samples,
                                  cfg.scale, cfg.grid_size, cfg.cascades,
                                  cfg.dir_norm)
    n_rungs = rcfg.n_rungs(cfg.scale, cfg.grid_size)
    batch = {"img_idxs": img_idxs, "pix_idxs": pix_idxs, "rgb": rgb_gt}

    def do_march(key):
        noise = jax.random.uniform(key, (n,))
        mr = march_rays_train_twolevel(
            rays_o, rays_d, hits_t, occ.fine_nbr,
            occ.coarse_nbr, cfg.scale, rcfg.exp_step_factor,
            cfg.grid_size, rcfg.max_samples, noise, n_rungs,
            rcfg.s_max_train, stratum, s_strata=rcfg.s_strata,
            dir_norm=cfg.dir_norm)
        return mr

    ms = timed_loop(lambda k: do_march(k).ts.sum(), args.iters)
    print(f"march (two-level, s_max={rcfg.s_max_train}): {ms:.2f} ms")

    mr0 = jax.jit(do_march)(jax.random.PRNGKey(4))
    s = rcfg.s_max_train
    xyz_flat = mr0.xyzs.reshape(n * s, 3)
    dir_flat = jnp.broadcast_to(mr0.dirs[:, None, :], (n, s, 3)).reshape(-1, 3)

    def field_fwd(key, xyz, d):
        xyz = xyz + 1e-9 * jax.random.uniform(key, ())
        sig, rgb = model(params, xyz, d)
        return sig.sum() + rgb.sum()

    ms = timed_loop(field_fwd, args.iters, xyz_flat, dir_flat)
    print(f"field fwd ({n * s} padded samples): {ms:.2f} ms")

    def field_fwdbwd(key, xyz, d):
        def f(p):
            sig, rgb = model(p, xyz + 1e-9 * jax.random.uniform(key, ()), d)
            return sig.sum() + rgb.sum()
        g = jax.grad(f)(params)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    ms = timed_loop(field_fwdbwd, args.iters, xyz_flat, dir_flat)
    print(f"field fwd+bwd ({n * s} padded samples): {ms:.2f} ms")

    def comp_loss(key, sig2, rgb2):
        def f(sr):
            sig, rgb = sr
            sig = sig + 1e-9 * jax.random.uniform(key, ())
            comp = composite_train(sig.reshape(n, s), rgb.reshape(n, s, 3),
                                   mr0.deltas, mr0.ts, mr0.mask,
                                   rcfg.T_threshold)
            out = comp.rgb + (1.0 - comp.opacity)[:, None]
            loss = ((out - rgb_gt) ** 2).mean()
            o = comp.opacity + 1e-10
            return loss + 1e-3 * (-o * jnp.log(o)).mean()
        l, g = jax.value_and_grad(f)((sig2, rgb2))
        return l + g[0].sum() + g[1].sum()

    sig0, rgb0 = jax.jit(lambda: model(params, xyz_flat, dir_flat))()
    ms = timed_loop(comp_loss, args.iters, jnp.where(
        mr0.mask.reshape(-1), sig0, 0.0), rgb0)
    print(f"composite+loss fwd+bwd: {ms:.2f} ms")

    if rcfg.s_flat:
        # ---- flat-path machinery breakdown (mirrors rendering.py's
        # s_flat branch stage by stage on the fixed march result) ----
        from mfnerf_tpu.ops.composite import (SEG_BLOCK, composite_train_flat,
                                              gather_rows_sorted)
        from mfnerf_tpu.ops.stepping import calc_dt, t_ladder
        b = n * rcfg.s_flat
        blk = max(SEG_BLOCK, s)

        def flat_layout(key):
            counts = mr0.n_samples + (
                jax.random.uniform(key, ()) * 0).astype(jnp.int32)
            offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
            marks = jnp.zeros((b,), jnp.int32).at[offsets].add(
                1, mode="drop", indices_are_sorted=True)
            ray_id = jnp.cumsum(marks) - 1
            beg = jax.lax.cummax(
                jnp.where(marks > 0, jnp.arange(b, dtype=jnp.int32), 0))
            pos = jnp.arange(b, dtype=jnp.int32) - beg
            k_f = mr0.k_idx[ray_id, jnp.minimum(pos, s - 1)]
            return (ray_id + pos + k_f).sum().astype(jnp.float32)

        ms = timed_loop(flat_layout, args.iters)
        print(f"flat layout (offsets/ray_id/k_f): {ms:.2f} ms")

        lay = jax.jit(lambda: _flat_layout_arrays(mr0, b, s))()
        ray_id0, offs0, k_f0, valid0 = lay

        packed0 = jnp.concatenate(
            [rays_o, mr0.dirs, mr0.t_start[:, None]], axis=1)

        def flat_fetch(key, packed):
            def f(pk):
                row_f = gather_rows_sorted(pk, ray_id0, offs0, blk)
                o_f, d_f, t0_f = row_f[:, :3], row_f[:, 3:6], row_f[:, 6]
                ts_f = t_ladder(t0_f + jax.random.uniform(key, ()) * 0,
                                k_f0[:, None], rcfg.exp_step_factor,
                                rcfg.max_samples, cfg.grid_size,
                                cfg.scale)[:, 0]
                dt_f = calc_dt(ts_f, rcfg.exp_step_factor, rcfg.max_samples,
                               cfg.grid_size, cfg.scale)
                xyz_f = o_f + ts_f[:, None] * d_f
                return (xyz_f.sum() + dt_f.sum())
            l, g = jax.value_and_grad(f)(packed)
            return l + g.sum()

        ms = timed_loop(flat_fetch, args.iters, packed0)
        print(f"flat fetch+reconstruct fwd+bwd ({b} samples): {ms:.2f} ms")

        xyz_fl = jax.jit(lambda: _flat_xyz(mr0, rays_o, lay, rcfg, cfg, s))()
        xyz_f0, d_f0, ts_f0, dt_f0 = xyz_fl

        def flat_field(key, xyz, d):
            def f(p):
                sig, rgb = model(p, xyz + 1e-9 * jax.random.uniform(key, ()),
                                 d)
                return sig.sum() + rgb.sum()
            g = jax.grad(f)(params)
            return sum(jnp.sum(x) for x in jax.tree.leaves(g))

        ms = timed_loop(flat_field, args.iters, xyz_f0, d_f0)
        print(f"flat field fwd+bwd ({b} samples): {ms:.2f} ms")

        sigf0, rgbf0 = jax.jit(lambda: model(params, xyz_f0, d_f0))()

        def flat_comp(key, sig2, rgb2):
            def f(sr):
                sig, rgb = sr
                sig = jnp.where(valid0,
                                sig + 1e-9 * jax.random.uniform(key, ()), 0.0)
                comp = composite_train_flat(sig, rgb, dt_f0, ts_f0, valid0,
                                            ray_id0, offs0, n,
                                            rcfg.T_threshold, block=blk)
                out = comp.rgb + (1.0 - comp.opacity)[:, None]
                loss = ((out - rgb_gt) ** 2).mean()
                o = comp.opacity + 1e-10
                return loss + 1e-3 * (-o * jnp.log(o)).mean()
            l, g = jax.value_and_grad(f)((sig2, rgb2))
            return l + g[0].sum() + g[1].sum()

        ms = timed_loop(flat_comp, args.iters, sigf0, rgbf0)
        print(f"flat composite+loss fwd+bwd: {ms:.2f} ms")

    def full_step(key):
        def loss_fn(p):
            res = render_train(model, p, occ, rays_o, rays_d, key, rcfg)
            return ((res["rgb"] - rgb_gt) ** 2).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    ms = timed_loop(full_step, args.iters)
    print(f"full render_train fwd+bwd (no adam): {ms:.2f} ms")

    def sample_only(key):
        k1, k2 = jax.random.split(key)
        ii = jax.random.randint(k1, (n,), 0, 16)
        pp = jax.random.randint(k2, (n,), 0, hw)
        picked = rays[ii, pp]
        d = system.directions[pp]
        po = system.poses[ii]
        ro, rd = get_rays(d, po)
        return picked.sum() + ro.sum() + rd.sum()

    ms = timed_loop(sample_only, args.iters)
    print(f"ray sampling + get_rays: {ms:.2f} ms")


if __name__ == "__main__":
    main()
