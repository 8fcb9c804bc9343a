#!/usr/bin/env python
"""Bisect the fused-loop vs per-step-dispatch timing gap.

Times, on the same NeRFSystem state:
  a) per-step dispatch of the jitted train step (async-pipelined);
  b) a jitted 16-step fori_loop WITHOUT occupancy updates;
  c) the full fused runner (update blocks);
  d) the jitted occupancy update alone.
"""
import argparse
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--batch_size", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.train import NeRFSystem, UPDATE_INTERVAL, WARMUP_STEPS
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=0.5, use_exposure=False, distortion_loss_w=0.0,
        batch_size=args.batch_size, ray_sampling_strategy="all_images",
        num_epochs=1, num_gpus=1, lr=1e-2, optimize_ext=False,
        random_bg=False, eval_lpips=False, val_only=False, no_save_test=True,
        exp_name="pf", ckpt_path=None, weight_path=None, grid="LowRank",
        L=16, F=2, T=19, N_min=16, N_max=2048, N_tables=1, rgb_channels=64,
        rgb_layers=2, seed=1337, s_max_train=128, s_max_test=128,
        test_chunk=65536, lpips_weights=None, profile=False,
        steps_per_epoch=1000, grid_size=128, max_samples=1024,
        lr_levels=8, lr_rank=16, lr_frames=2, lr_k_max=512)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    scene = make_scene(n_train=16, n_test=1, wh=256, seed=0)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # settle the grid with the per-step path (compiles _train_step too)
    for s in range(WARMUP_STEPS + 32):
        if s % UPDATE_INTERVAL == 0:
            key, sub = jax.random.split(key)
            system.occ = system._update_grid(
                system.params, system.occ, sub, s < WARMUP_STEPS, False)
        batch = {k: jnp.asarray(v) for k, v in system.train_dataset[s].items()}
        key, sub = jax.random.split(key)
        system.params, system.opt_state, m = system._train_step(
            system.params, system.opt_state, system.occ, system.poses,
            system.directions, batch, sub, s)
    jax.block_until_ready(m["loss"])
    print("warmup done", file=sys.stderr)

    # (a) per-step dispatch
    t0 = time.perf_counter()
    for s in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in system.train_dataset[s].items()}
        key, sub = jax.random.split(key)
        system.params, system.opt_state, m = system._train_step(
            system.params, system.opt_state, system.occ, system.poses,
            system.directions, batch, sub, 300 + s)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"(a) per-step dispatch: {dt * 1e3:.2f} ms/step")

    # (b) fused 16-step inner loop, no update
    rays = jnp.asarray(system.train_dataset.rays)
    n_img, hw = rays.shape[0], rays.shape[1]
    train_step = system._train_step_fn

    @partial(jax.jit, donate_argnums=(0, 1))
    def run16(params, opt_state, occ, poses, directions, rays, key, step0):
        def body(i, carry):
            params, opt_state, key, _ = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            img_idxs = jax.random.randint(k1, (args.batch_size,), 0, n_img)
            pix_idxs = jax.random.randint(k2, (args.batch_size,), 0, hw)
            picked = rays[img_idxs, pix_idxs]
            batch = {"img_idxs": img_idxs, "pix_idxs": pix_idxs,
                     "rgb": picked[:, :3]}
            params, opt_state, metrics = train_step(
                params, opt_state, occ, poses, directions, batch, k3,
                step0 + i)
            return params, opt_state, key, metrics

        zero = {k: jnp.zeros(()) for k in ("loss", "psnr", "rm_s", "vr_s",
                                           "lr")}
        return jax.lax.fori_loop(
            0, UPDATE_INTERVAL, body,
            (params, opt_state, key, zero))

    key, sub = jax.random.split(key)
    p, o, _, m = run16(system.params, system.opt_state, system.occ,
                       system.poses, system.directions, rays, sub, 400)
    jax.block_until_ready(m["loss"])
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    n_blocks = max(args.steps // UPDATE_INTERVAL, 2)
    for b in range(n_blocks):
        key, sub = jax.random.split(key)
        p, o, _, m = run16(p, o, system.occ, system.poses,
                           system.directions, rays, sub, 416 + 16 * b)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / (n_blocks * UPDATE_INTERVAL)
    print(f"(b) fused 16-step loop (no update): {dt * 1e3:.2f} ms/step "
          f"(loss {loss0:.5f} -> {float(m['loss']):.5f}; must change or the "
          f"executions were elided)")
    system.params, system.opt_state = p, o

    # (c) full fused runner
    fused = system.make_fused_train_fn(n_img=n_img, hw=hw)
    key, sub = jax.random.split(key)
    p, o, occ, m = fused(system.params, system.opt_state, system.occ,
                         system.poses, system.directions, rays, sub, 800,
                         args.steps)
    jax.block_until_ready(m["loss"])
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    p, o, occ, m = fused(p, o, occ, system.poses, system.directions, rays,
                         sub, 800 + args.steps, args.steps)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"(c) full fused runner: {dt * 1e3:.2f} ms/step "
          f"(loss {float(m['loss']):.5f})")

    # (c2) same outer-loop structure, update replaced by identity
    import mfnerf_tpu.train as train_mod
    upd_bak = system._update_grid_fn
    system._update_grid_fn = lambda params, occ, key, warmup, erode: occ
    fused_noupd = system.make_fused_train_fn(n_img=n_img, hw=hw)
    system._update_grid_fn = upd_bak
    key, sub = jax.random.split(key)
    p2, o2, occ2, m2 = fused_noupd(p, o, occ, system.poses,
                                   system.directions, rays, sub, 1200,
                                   args.steps)
    jax.block_until_ready(m2["loss"])
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    p2, o2, occ2, m2 = fused_noupd(p2, o2, occ2, system.poses,
                                   system.directions, rays, sub,
                                   1200 + args.steps, args.steps)
    jax.block_until_ready(m2["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"(c2) fused runner, identity update: {dt * 1e3:.2f} ms/step "
          f"(loss {float(m2['loss']):.5f})")
    p, o = p2, o2

    # (d) update alone
    key, sub = jax.random.split(key)
    occ2 = system._update_grid(p, occ, sub, False, False)
    jax.block_until_ready(occ2.density_grid)
    t0 = time.perf_counter()
    for _ in range(8):
        key, sub = jax.random.split(key)
        occ2 = system._update_grid(p, occ2, sub, False, False)
    jax.block_until_ready(occ2.density_grid)
    print(f"(d) occupancy update alone: "
          f"{(time.perf_counter() - t0) / 8 * 1e3:.2f} ms/update")


if __name__ == "__main__":
    main()
