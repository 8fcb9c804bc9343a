#!/usr/bin/env python
"""Benchmark: training throughput (rays/sec/chip) on the Lego-class config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation: the reference trains Lego for 30k steps x 8192 rays in
5m05s on one RTX 2080 Ti (README.md:71-73,124) = 805,600 rays/s of training
throughput. vs_baseline is our rays/s divided by that number.

No NeRF dataset ships in this environment, so the benchmark trains on a
procedurally rendered multi-view scene (mfnerf_tpu/utils/procedural.py) at
Lego's resolution (800x800) with the reference quickstart geometry/training
hyperparameters (batch 8192, grid 128^3, MAX_SAMPLES=1024, lr schedule).

ENCODER: the default is the TPU-native LowRank (CP) encoder — NOT the
reference's Hash grid (which is gather/scatter-bound on TPU, ~2 orders of
magnitude off; measured in docs/TPU_NOTES.md). The headline number is
therefore the replacement-encoder config; pass --grid Hash for the
parity-encoder cost. The emitted JSON carries a "config" field saying
exactly what ran.
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--warmup_steps", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=8192)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--fps", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="also measure 800x800 render FPS (emitted in the "
                         "JSON line; --no-fps to skip)")
    ap.add_argument("--fps_guided", action="store_true",
                    help="also measure the (opt-in, GUI-oriented) "
                         "depth-guided two-pass renderer")
    ap.add_argument("--fps_wavefront", type=str, default=None,
                    help="render FPS via the persistent-pool wavefront "
                         "renderer: 'P,seek,window,cap' (e.g. '65536,64,"
                         "32,16'); 'none' forces the round-schedule "
                         "renderer. Default: RenderConfig default")
    ap.add_argument("--fps_frames", type=int, default=1,
                    help="batch N frames through ONE wavefront queue per "
                         "dispatch (rendering.render_test_frames): the "
                         "pool refills across frame boundaries so the "
                         "drain tail is paid once per batch — the viewer/"
                         "eval pipelining mode. 1 = per-frame dispatch")
    ap.add_argument("--fps_t_threshold", type=float, default=1e-2,
                    help="transmittance kill threshold for the FPS "
                         "measurement. The reference's published FPS "
                         "numbers use T_threshold=1e-2 (test.ipynb cell 2, "
                         "show_gui.py:83), NOT the 1e-4 used in training/"
                         "validation renders — match its protocol")
    ap.add_argument("--grid", type=str, default="LowRank",
                    help="encoder (LowRank is the TPU-native fast path; "
                         "Hash is gather/scatter-bound, see docs/TPU_NOTES.md)")
    ap.add_argument("--s_flat", type=int, default=16,
                    help="flat (ragged) sample-eval budget per ray (0 = "
                         "padded rows). 16 comfortably covers the Lego-class "
                         "steady-state rm_s ~12; early high-rm_s steps run "
                         "padded via FLAT_AFTER")
    ap.add_argument("--s_max_train", type=int, default=64)
    ap.add_argument("--pool_a", type=int, default=4,
                    help="training-march stage-A pooling factor (0 = G/2 "
                         "coarse table; see NGPConfig.pool_a). 4 measured "
                         "12.47 -> 11.09 ms/step at the bench config, "
                         "quality-neutral (2026-08-20)")
    ap.add_argument("--lr_k_max", type=int, default=256,
                    help="LowRank finest-level knots (encoder cost ~ K). "
                         "256 is the r5 render-throughput point: training "
                         "step time is K-invariant at this config (r3: "
                         "44.7/44.2/44.8 ms at 512/256/128) and quality is "
                         "flat-to-better (train PSNR 28.32 vs 28.02 at 900 "
                         "steps, test PSNR 31.9/31.9/32.1 across K, r3), "
                         "while the render field cost scales ~K (9.6 vs "
                         "8.1 fps measured 2026-08-21)")
    ap.add_argument("--scale", type=float, default=0.5,
                    help="scene scale; > 0.5 exercises the multi-cascade "
                         "exponential-dt marching (TaT/mip-360-class config) "
                         "on a spread procedural scene")
    ap.add_argument("--lr_fused", type=int, default=1,
                    help="LowRank fused nested-level evaluation (full-lane "
                         "bf16 matmuls); 0 restores per-level fp32")
    ap.add_argument("--refresh_half", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="alternating even/odd-Morton half-dense occupancy "
                         "refresh (halves the ~27 ms dense refresh; the "
                         "shipped CLI default, measured quality-neutral)")
    ap.add_argument("--bf16", action="store_true", default=False,
                    help="bfloat16 matmul compute — measured 8x SLOWER than "
                         "fp32 on this encoder's shapes (VPU bf16 tiling of "
                         "the (N,K) hat bases dominates; docs/TPU_NOTES.md)")
    args = ap.parse_args()
    if args.scale > 0.5 and args.s_flat:
        # multi-cascade scenes march ~50 samples/ray steady-state — the flat
        # budget (tuned for synthetic rm_s ~12) would truncate entire rays'
        # samples each batch, which destabilizes training (measured: psnr
        # 17 -> 2 over 200 flat steps at scale=4). Padded eval is correct at
        # every occupancy.
        print("scale > 0.5: forcing s_flat=0 (padded eval)", file=sys.stderr)
        args.s_flat = 0

    import jax
    import jax.numpy as jnp
    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.train import NeRFSystem
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=args.scale, use_exposure=False,
        distortion_loss_w=0.0,
        batch_size=args.batch_size, ray_sampling_strategy="all_images",
        num_epochs=1, num_gpus=1, lr=1e-2, optimize_ext=False,
        random_bg=False, eval_lpips=False, val_only=False, no_save_test=True,
        exp_name="bench", ckpt_path=None, weight_path=None, grid=args.grid,
        L=16, F=2, T=19, N_min=16, N_max=2048, N_tables=1, rgb_channels=64,
        rgb_layers=2, seed=1337, s_max_train=args.s_max_train,
        s_max_test=256, test_chunk=65536, lpips_weights=None, profile=False,
        steps_per_epoch=1000, grid_size=128, max_samples=1024,
        lr_levels=8, lr_rank=16, lr_frames=2, lr_k_max=args.lr_k_max,
        bf16=args.bf16, refresh_half=args.refresh_half,
        s_flat=args.s_flat, lr_fused=bool(args.lr_fused),
        pool_a=args.pool_a)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    spread = 1.0 if args.scale <= 0.5 else args.scale * 1.5
    scene = make_scene(n_train=16, n_test=1, wh=args.wh, seed=0,
                       spread=spread)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)

    # everything runs through the fused multi-step runner (sampling +
    # occupancy refresh + optimizer inside one jit): with the dense
    # occupancy refresh there is no separate warmup program, and per-step
    # dispatch over the tunneled chip is both slow and unreliable
    # (docs/TPU_NOTES.md)
    import dataclasses
    from mfnerf_tpu.train import FLAT_AFTER
    hw = args.wh * args.wh
    fused = system.make_fused_train_fn(n_img=16, hw=hw)
    fused_warm = system.make_fused_train_fn(
        n_img=16, hw=hw,
        rcfg=dataclasses.replace(system.rcfg, s_flat=0))
    rays = jnp.asarray(system.train_dataset.rays)

    def run_fused(n_steps, step0):
        nonlocal key
        key, sub = jax.random.split(key)
        run = fused_warm if step0 < FLAT_AFTER else fused
        return run(system.params, system.opt_state, system.occ,
                   system.poses, system.directions, rays, sub, step0,
                   n_steps)

    # dispatch in ~96-step chunks: single device requests lasting more than
    # ~0.5-1 min have been killed by the tunnel ("TPU device error"); the
    # donated-state chain still forces full sequential execution, so timing
    # across chunks measures true chip throughput
    chunk = 96
    sizes = [chunk] * (args.steps // chunk) + (
        [args.steps % chunk] if args.steps % chunk else [])

    # warmup (converge the occupancy grid) + compile of all chunk sizes.
    # With flat eval on, warm PAST the padded->flat switch at FLAT_AFTER so
    # every timed chunk runs the flat program (chunks are selected by their
    # START step).
    step = 0
    warm_total = args.warmup_steps if args.s_flat == 0 else max(
        args.warmup_steps, FLAT_AFTER)
    warm_sizes = [chunk] * (warm_total // chunk) + (
        [warm_total % chunk] if warm_total % chunk else [])
    for n in warm_sizes + sorted(set(sizes) - set(warm_sizes)):
        system.params, system.opt_state, system.occ, m = run_fused(n, step)
        jax.block_until_ready(m["loss"])
        step += n
    m = jax.device_get(m)
    print(f"warmup done: psnr {float(m['psnr']):.2f} "
          f"rm_s {float(m['rm_s']):.1f}", file=sys.stderr)

    # time each chunk separately and report the MEDIAN ms/step: the tunneled
    # chip is shared infrastructure whose throughput can transiently degrade
    # 2-4x (contention / device faults, docs/TPU_NOTES.md); a single
    # wall-clock total over minutes conflates those events with steady-state
    # speed (round 1: the same program measured 42 vs 137 ms/step). Blocking
    # per chunk costs one ~30 ms dispatch round trip per ~4 s chunk (<1%).
    chunk_ms = []
    for n in sizes:
        t0 = time.perf_counter()
        system.params, system.opt_state, system.occ, m = run_fused(n, step)
        # device_get, not block_until_ready: the latter can return before
        # execution finishes over the tunnel (see the fps section note)
        float(jax.device_get(m["loss"]))
        chunk_ms.append((time.perf_counter() - t0) * 1e3 / n)
        step += n
    med = float(np.median(chunk_ms))
    lo, hi = float(np.min(chunk_ms)), float(np.max(chunk_ms))
    rays_per_sec = args.batch_size / (med / 1e3)
    m = jax.device_get(m)
    outliers = [f"{x:.1f}" for x in chunk_ms if x > 1.5 * med]
    print(f"bench: {args.steps} steps in {len(sizes)} chunks, "
          f"median {med:.2f} ms/step (min {lo:.2f}, max {hi:.2f}"
          + (f"; {len(outliers)} outlier chunks >1.5x median: "
             + ",".join(outliers) if outliers else "")
          + f"), psnr {float(m['psnr']):.2f} rm_s {float(m['rm_s']):.1f} "
          f"vr_s {float(m['vr_s']):.1f}", file=sys.stderr)

    fps_pipelined = None
    if args.fps:
        from mfnerf_tpu.datasets.ray_utils import get_rays
        from mfnerf_tpu.models.rendering import render_test
        fps_rcfg = dataclasses.replace(
            system.rcfg, T_threshold=args.fps_t_threshold)
        if args.fps_wavefront:
            from mfnerf_tpu.models.rendering import parse_wavefront
            fps_rcfg = dataclasses.replace(
                fps_rcfg, wavefront=parse_wavefront(args.fps_wavefront))
        # a ring of DISTINCT poses: identical dispatches are memoized by the
        # tunnel server (docs/TPU_NOTES.md), and distinct frames are what a
        # real orbit/GUI renders
        fps_scene = make_scene(n_train=1, n_test=8, wh=args.wh, seed=0,
                               spread=spread)
        frames = []
        for i in range(8):
            pose = fps_scene["test_poses"][i]
            rays_o, rays_d = get_rays(
                jnp.asarray(fps_scene["directions"]), jnp.asarray(pose))
            frames.append((rays_o, rays_d,
                           (fps_scene["K"], pose, fps_scene["img_wh"])))

        def render(i, guided):
            ro, rd, cam = frames[i]
            return render_test(system.model, system.params, system.occ,
                               ro, rd, fps_rcfg, camera=cam,
                               guided=guided)

        def render_all_batched(fb):
            from mfnerf_tpu.models.rendering import render_test_frames
            outs = []
            for i in range(0, 8, fb):
                outs += render_test_frames(
                    system.model, system.params, system.occ,
                    frames[i:i + fb], fps_rcfg)
            return outs

        # completion barrier: device_get of an on-device scalar. Over the
        # tunnel, block_until_ready has been observed to return BEFORE
        # execution finishes (probe_sorted_scatter read 0.1 ms for a 600 ms
        # scatter); fetching a value derived from the output is the only
        # reliable barrier.
        def fetch(o):
            return float(jax.device_get(o["rgb"].sum()))

        for guided in ([False, True]
                       if (args.fps_guided and args.scale <= 0.5)
                       else [False]):
            try:
                fetch(render(0, guided))  # compile
            except Exception as e:  # e.g. HBM OOM on an untuned schedule
                print(f"render fps guided={guided}: failed "
                      f"({str(e)[:120]})", file=sys.stderr)
                continue
            # blocking per-frame (interactive latency)
            lat = []
            for i in range(4):
                t0 = time.perf_counter()
                fetch(render(i % 8, guided))
                lat.append(time.perf_counter() - t0)
            # pipelined (throughput): all frames in flight, one sync — the
            # ~30 ms tunnel round trip amortizes away, as in a real viewer
            fb = max(1, min(args.fps_frames, 8))
            if fb > 1 and not guided:
                fetch(render_all_batched(fb)[-1])  # compile + sync
                t0 = time.perf_counter()
                outs = render_all_batched(fb)
            else:
                t0 = time.perf_counter()
                outs = [render(i, guided) for i in range(8)]
            for o in outs:
                fetch(o)
            dt = (time.perf_counter() - t0) / 8
            print(f"render fps ({args.wh}x{args.wh}, guided={guided}, "
                  f"T_thr={args.fps_t_threshold:g}): "
                  f"pipelined {1.0 / dt:.2f} ({dt * 1e3:.0f} ms/frame), "
                  f"blocking median {1.0 / float(np.median(lat)):.2f}",
                  file=sys.stderr)
            if not guided:
                fps_pipelined = 1.0 / dt

    baseline = 805_600.0  # reference Lego training rays/s (2080 Ti)
    fps_baseline = 36.2   # reference Lego 800x800 FPS (README.md:92)
    print(json.dumps({
        "metric": "train_rays_per_sec_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
        # standing quality gate: train-batch PSNR after warmup+timed steps
        # (~900 by default — mid-convergence; pass --steps 5000 for a
        # converged-ish value). Marching/compositing redesigns that hurt
        # quality show up here even when throughput improves.
        "train_psnr": round(float(m["psnr"]), 2),
        "train_steps": args.warmup_steps + args.steps,
        **({"fps_800": round(fps_pipelined, 2),
            "fps_vs_baseline": round(fps_pipelined / fps_baseline, 4),
            "fps_t_threshold": args.fps_t_threshold,
            "fps_frames": max(1, min(args.fps_frames, 8)),
            "fps_wavefront": list(fps_rcfg.wavefront)
            if fps_rcfg.wavefront is not None else None}
           if fps_pipelined is not None else {}),
        "config": {
            "grid": args.grid, "s_flat": args.s_flat,
            "s_max_train": args.s_max_train, "scale": args.scale,
            "lr_k_max": args.lr_k_max,
            "batch_size": args.batch_size, "bf16": args.bf16,
            "lr_fused": bool(args.lr_fused),
            "ms_per_step_median": round(med, 2),
        },
    }))


if __name__ == "__main__":
    main()
