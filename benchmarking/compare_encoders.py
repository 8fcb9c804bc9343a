#!/usr/bin/env python
"""Head-to-head encoder comparison on the procedural scene (real TPU).

Trains the same NGP pipeline with different --grid encodings and reports
ms/step, train rays/s and test-view PSNR. This is the experimental harness
that drives TPU-native encoder development (see ops/lowrank.py docstring for
why the exact hash grid is gather/scatter-bound on TPU).

Usage: python benchmarking/compare_encoders.py [--steps 2000] [--wh 256]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(grid, args, overrides=None):
    import jax
    import jax.numpy as jnp
    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.rendering import render_test
    from mfnerf_tpu.train import NeRFSystem, WARMUP_STEPS
    from mfnerf_tpu.utils.metrics import psnr
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=0.5, use_exposure=False, distortion_loss_w=0.0,
        batch_size=args.batch_size, ray_sampling_strategy="all_images",
        num_epochs=1, num_gpus=1, lr=1e-2, optimize_ext=False,
        random_bg=False, eval_lpips=False, val_only=False, no_save_test=True,
        exp_name="cmp", ckpt_path=None, weight_path=None, grid=grid,
        L=16, F=2, T=19, N_min=16, N_max=2048, N_tables=1, rgb_channels=64,
        rgb_layers=2, seed=1337, s_max_train=args.s_max, s_max_test=128,
        test_chunk=args.wh * args.wh, lpips_weights=None, profile=False,
        steps_per_epoch=1000, grid_size=128, max_samples=1024,
        lr_levels=8, lr_rank=16, lr_frames=2, lr_k_max=512,
        # the production path (opt.py --lr_fused default 1): nested levels
        # folded into one full-lane matmul per (frame, axis)
        lr_fused=1)
    for k, v in (overrides or {}).items():
        setattr(hp, k, v)

    scene = make_scene(n_train=24, n_test=2, wh=args.wh, seed=0,
                       thin=args.thin)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)

    # everything runs through chunked fused dispatches (per-step dispatch
    # over the tunneled chip is unreliable for timing AND execution, and
    # with the dense occupancy refresh there is no separate warmup program;
    # docs/TPU_NOTES.md "tunnel reliability")
    import dataclasses
    from mfnerf_tpu.train import FLAT_AFTER
    fused = system.make_fused_train_fn(
        n_img=len(system.train_dataset.poses), hw=args.wh * args.wh)
    # flat (ragged) eval only after the grid has pruned (train.py FLAT_AFTER)
    fused_warm = fused if system.rcfg.s_flat == 0 else \
        system.make_fused_train_fn(
            n_img=len(system.train_dataset.poses), hw=args.wh * args.wh,
            rcfg=dataclasses.replace(system.rcfg, s_flat=0))
    rays = jnp.asarray(system.train_dataset.rays)
    warm = max(WARMUP_STEPS, min(320, args.steps // 4), FLAT_AFTER
               if system.rcfg.s_flat else 0)
    n_meas = args.steps - warm

    def run_fused(n, step0):
        nonlocal key
        key, sub = jax.random.split(key)
        run = fused_warm if step0 < FLAT_AFTER else fused
        return run(system.params, system.opt_state, system.occ,
                   system.poses, system.directions, rays, sub, step0, n)

    # chunk dispatches to seconds — device requests beyond ~0.5-1 min have
    # been killed by the tunnel ("TPU device error"). Gather-bound encoders
    # (Hash/MixedFeature, ~0.5-1 s/step) need far smaller chunks than the
    # all-matmul LowRank path.
    chunk = args.chunk
    n_chunks = -(-n_meas // chunk)
    sizes = [chunk] * (n_meas // chunk) + ([n_meas % chunk]
                                           if n_meas % chunk else [])
    # warmup (converge the grid) + compile of all chunk sizes, then measure
    step = 0
    warm_sizes = [chunk] * (warm // chunk) + ([warm % chunk]
                                              if warm % chunk else [])
    for n in warm_sizes + sorted(set(sizes) - set(warm_sizes)):
        system.params, system.opt_state, system.occ, metrics = run_fused(
            n, step)
        jax.block_until_ready(metrics["loss"])
        step += n
        print(f"warmup chunk {n} (step {step}, "
              f"psnr {float(metrics['psnr']):.2f})", file=sys.stderr,
              flush=True)
    if args.budget_s:
        # equal-WALL-CLOCK protocol (the per-unit-time quality question:
        # VERDICT round-2 weak #6): the warmup loop above compiled the
        # chunk programs; reset to fresh params and run EVERYTHING —
        # occupancy warmup included, it is real wall-clock the reference
        # pays too — until the budget elapses, whatever the per-step cost
        system.configure(jax.random.PRNGKey(0))
        step = 0
        n_meas = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < args.budget_s:
            system.params, system.opt_state, system.occ, metrics = \
                run_fused(chunk, step)
            step += chunk
            n_meas += chunk
            print(f"step {step} ({time.perf_counter() - t0:.0f}s): psnr "
                  f"{float(jax.device_get(metrics['psnr'])):.2f}",
                  file=sys.stderr, flush=True)
    else:
        t0 = time.perf_counter()
        for n in sizes:
            system.params, system.opt_state, system.occ, metrics = run_fused(
                n, step)
            # device_get, not block_until_ready: the latter can return
            # before execution finishes over the tunnel (docs/TPU_NOTES.md)
            step += n
            print(f"step {step}: psnr "
                  f"{float(jax.device_get(metrics['psnr'])):.2f}",
                  file=sys.stderr, flush=True)
    dt = time.perf_counter() - t0
    ms_per_step = dt / max(n_meas, 1) * 1e3

    # test PSNR on the held-out views
    psnrs = []
    for i in range(len(system.test_dataset)):
        batch = system.test_dataset[i]
        rays_o, rays_d = get_rays(
            jnp.asarray(system.test_dataset.directions),
            jnp.asarray(batch["pose"]))
        res = render_test(system.model, system.params, system.occ, rays_o,
                          rays_d, system.rcfg)
        psnrs.append(float(psnr(res["rgb"], jnp.asarray(batch["rgb"]))))
    m = jax.device_get(metrics)
    out = {
        "grid": grid, "steps": step, "ms_per_step": round(ms_per_step, 2),
        "rays_per_sec": round(args.batch_size / (ms_per_step / 1e3)),
        "test_psnr": round(sum(psnrs) / len(psnrs), 2),
        "train_psnr": round(float(m["psnr"]), 2),
        "rm_s": round(float(m["rm_s"]), 1),
        "vr_s": round(float(m["vr_s"]), 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--wh", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=8192)
    ap.add_argument("--s_max", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=96,
                    help="fused steps per dispatch (use ~8 for the slow "
                         "gather-bound encoders: the tunnel kills ~1 min "
                         "dispatches)")
    ap.add_argument("--grids", type=str, default="LowRank,Hash")
    ap.add_argument("--budget_s", type=float, default=0.0,
                    help="equal-WALL-CLOCK mode: train each variant for this "
                         "many seconds from fresh params (grid warmup "
                         "included, compiles excluded) instead of --steps "
                         "steps — the per-unit-time quality protocol")
    ap.add_argument("--thin", action="store_true",
                    help="add sub-voxel striped rods to the scene "
                         "(hash-grid-favorable thin structure; the "
                         "LowRank-vs-Hash quality fixture)")
    ap.add_argument("--variants", type=str, default=None,
                    help="JSON list of hparam-override dicts, each with a "
                         "'grid' key; replaces --grids when given. E.g. "
                         '\'[{"grid":"LowRank","lr_levels":2,"lr_rank":128}]\'')
    args = ap.parse_args()
    if args.variants:
        for ov in json.loads(args.variants):
            grid = ov.pop("grid", "LowRank")
            try:
                run_one(grid, args, overrides=ov)
            except Exception as e:
                print(json.dumps({"grid": grid, "ov": ov,
                                  "error": str(e)[:200]}), flush=True)
        return
    for grid in args.grids.split(","):
        try:
            run_one(grid.strip(), args)
        except Exception as e:
            print(json.dumps({"grid": grid, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
