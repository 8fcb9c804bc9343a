#!/usr/bin/env python
"""Per-round budget of the multi-round alive-ray test renderer.

Trains the bench scene to steady state, then:
  1. times the full 800x800 frame (current schedule),
  2. times every schedule PREFIX (per-round time = successive differences),
  3. reports per-round capacity / truly-alive rays / emitted samples /
     padded field evaluations (the fill-rate data that sizes a flat
     per-round evaluation budget).
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _sync(x):
    """Completion barrier that works over the tunnel: block_until_ready has
    been observed to return before execution finishes (probe_sorted_scatter
    measured 0.1 ms for a 600 ms scatter); device_get of a derived scalar
    is reliable."""
    import jax
    import jax.numpy as _jnp
    return float(jax.device_get(_jnp.asarray(x).sum()))

def _sweep_wavefronts(args, rcfg, model, params, occ, rays_o, rays_d,
                      t_near, t_far):
    """Time the persistent-pool wavefront renderer per config; PSNR is
    always measured against the dense oracle (never config-vs-config)."""
    import dataclasses
    import json
    import numpy as np

    import jax.numpy as jnp

    from mfnerf_tpu.models.rendering import (_render_test_wavefront,
                                             render_test_dense)
    oracle = render_test_dense(model, params, occ, rays_o, rays_d,
                               dataclasses.replace(rcfg, test_chunk=16384))
    _sync(oracle["rgb"])
    from mfnerf_tpu.models.rendering import parse_wavefront
    for name, wf in json.loads(args.wavefronts).items():
        r2 = dataclasses.replace(rcfg, wavefront=parse_wavefront(wf),
                                 wavefront_stats=True)
        out = _render_test_wavefront(model, params, occ, rays_o, rays_d,
                                     r2, t_near, t_far)
        _sync(out[0])
        # blend the bg like render_test/the oracle do (raw-vs-blended would
        # book every background ray as error): white synthetic, black real
        bg = 1.0 if rcfg.exp_step_factor == 0 else 0.0
        blended = out[0] + bg * (1.0 - out[1])[:, None]
        err = float(jnp.mean((blended - oracle["rgb"]) ** 2))
        note = f"psnr-vs-oracle {-10 * np.log10(max(err, 1e-12)):.1f}"
        ts = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            out = _render_test_wavefront(model, params, occ,
                                         rays_o + (i + 1) * 1e-6,
                                         rays_d, r2, t_near, t_far)
            _sync(out[0])
            ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs = [_render_test_wavefront(model, params, occ,
                                       rays_o + (i + 10) * 1e-6, rays_d,
                                       r2, t_near, t_far)
                for i in range(4)]
        [_sync(o[0]) for o in outs]
        pipe = (time.perf_counter() - t0) / 4
        batched = ""
        if args.batch_frames > 1:
            # multi-frame batching (rendering.render_test_frames semantics):
            # fb epsilon-perturbed copies of the frame through ONE queue —
            # the tail is paid once per batch, big pools stay full
            fb = args.batch_frames
            ro_b = jnp.concatenate([rays_o + (i + 1) * 1e-6
                                    for i in range(fb)])
            rd_b = jnp.concatenate([rays_d] * fb)
            tn_b = (jnp.concatenate([t_near] * fb)
                    if t_near is not None else None)
            tf_b = (jnp.concatenate([t_far] * fb)
                    if t_far is not None else None)
            out_b = _render_test_wavefront(model, params, occ, ro_b, rd_b,
                                           r2, tn_b, tf_b)
            _sync(out_b[0])  # compile
            t0 = time.perf_counter()
            outs = [_render_test_wavefront(
                model, params, occ, ro_b + (j + 20) * 1e-6, rd_b, r2,
                tn_b, tf_b) for j in range(2)]
            [_sync(o[0]) for o in outs]
            bt = (time.perf_counter() - t0) / (2 * fb)
            batched = f", x{fb}-batched {bt * 1e3:8.1f} ms ({1 / bt:.2f} fps)"
        it_n = int(out[4])
        wf_t = r2.wavefront
        pool0 = wf_t[0][0] if isinstance(wf_t[0], tuple) else wf_t[0]
        slots = it_n * pool0 * wf_t[3]
        print(f"  {name}: blocking {min(ts) * 1e3:8.1f} ms/frame, "
              f"pipelined {pipe * 1e3:8.1f} ms ({1 / pipe:.2f} fps)"
              f"{batched} vr={int(out[3])} iters={it_n} "
              f"fill={int(out[3]) / max(slots, 1):.2f} "
              f"ms/iter={min(ts) * 1e3 / max(it_n, 1):.3f} "
              f"n_valid={int(out[5])} {note}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8192)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--warmup_steps", type=int, default=288)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--batch_frames", type=int, default=0,
                    help="additionally time each wavefront config with N "
                         "frames batched through ONE queue (multi-frame "
                         "amortization, rendering.render_test_frames)")
    ap.add_argument("--lr_fused", type=int, default=1)
    ap.add_argument("--no_prepass", action="store_true")
    ap.add_argument("--schedule", type=str, default=None,
                    help="JSON round schedule [[frac,w,s_cap(,q_flat)],...] "
                         "overriding the RenderConfig default")
    ap.add_argument("--schedules", type=str, default=None,
                    help="JSON dict {name: schedule, ...}: render each with "
                         "PSNR vs the default schedule's frame + full-frame "
                         "time, in ONE process (warmup amortized)")
    ap.add_argument("--guided_schedules", type=str, default=None,
                    help="JSON dict {name: schedule}: time the FUSED guided "
                         "frame (render_test camera+guided) with each "
                         "schedule as rounds_guided; PSNR vs the unguided "
                         "fused frame")
    ap.add_argument("--field_probe", action="store_true",
                    help="also time raw field fwd ns/sample")
    ap.add_argument("--dummy_field", action="store_true",
                    help="replace the field eval with constants: isolates "
                         "march+machinery cost from MLP/encoder cost")
    ap.add_argument("--dummy_sigma", type=float, default=500.0,
                    help="constant density of --dummy_field; tune so the "
                         "dummy frame's emission count (vr) matches the "
                         "real field's — then dummy time = the true "
                         "machinery cost at matched work (sigma 500 kills "
                         "rays in ~4 samples; ~150 matches a converged "
                         "bench-scene frame's ~17/ray)")
    ap.add_argument("--pre_block", type=int, default=8,
                    help="rasterized-prepass pixel block size")
    ap.add_argument("--pre_dilate", type=int, default=2,
                    help="rasterized-prepass block dilation")
    ap.add_argument("--t_threshold", type=float, default=None,
                    help="override rcfg.T_threshold (the reference's "
                         "published FPS protocol uses 1e-2; training/"
                         "validation renders use 1e-4)")
    ap.add_argument("--eval_chunk", type=int, default=None,
                    help="override rcfg.eval_chunk (0 disables chunked "
                         "padded-round field eval)")
    ap.add_argument("--prepasses", type=str, default=None,
                    help="JSON dict {name: [pre_block, pre_dilate]}: run "
                         "the --wavefronts sweep once per prepass setting "
                         "in ONE process (prepass-tightness tuning)")
    ap.add_argument("--wavefronts", type=str, default=None,
                    help="JSON dict {name: [pool, seek_w, window, cap]}: "
                         "time the persistent-pool wavefront renderer with "
                         "each config; PSNR vs the dense oracle")
    ap.add_argument("--straggler2", type=str, default=None,
                    help="tail sweep stage as 'capacity,window,cap' "
                         "(rcfg.straggler2; 'none' clears it)")
    ap.add_argument("--straggler", type=str, default=None,
                    help="override rcfg.straggler as 'capacity,window,cap' "
                         "(sweep under the select-once sweep semantics)")
    ap.add_argument("--lr_k_max", type=int, default=512,
                    help="LowRank finest-level knots (field cost ~ K; the "
                         "render-field-cost lever)")
    ap.add_argument("--state", type=str, default=None,
                    help="warmed-state cache path (.npz): load params/occ "
                         "and SKIP the warmup when the file exists, else "
                         "train the warmup and save. The file encodes no "
                         "config — the caller must keep scene/model flags "
                         "consistent between save and load")
    ap.add_argument("--no_prefix", action="store_true",
                    help="skip per-round prefix timing (each prefix is a "
                         "separate slow tunnel compile); report only the "
                         "full-frame time + stats")
    ap.add_argument("--scale", type=float, default=0.5,
                    help="scene scale; > 0.5 exercises the multi-cascade "
                         "(exp-dt) marching paths on a spread procedural "
                         "scene (converged-scene FPS, VERDICT r2 #4). The "
                         "rasterized prepass is single-cascade only, so "
                         "scale > 0.5 implies --no_prepass")
    args = ap.parse_args()
    if args.scale > 0.5:
        args.no_prepass = True

    import jax
    import jax.numpy as jnp
    import numpy as np
    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.rendering import (_render_test_alive,
                                             rasterize_block_ranges)
    from mfnerf_tpu.train import NeRFSystem
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=args.scale, use_exposure=False,
        distortion_loss_w=0.0,
        batch_size=args.batch_size, ray_sampling_strategy="all_images",
        num_epochs=1, num_gpus=1, lr=1e-2, optimize_ext=False,
        random_bg=False, eval_lpips=False, val_only=False, no_save_test=True,
        exp_name="pa", ckpt_path=None, weight_path=None, grid="LowRank",
        L=16, F=2, T=19, N_min=16, N_max=2048, N_tables=1, rgb_channels=64,
        rgb_layers=2, seed=1337, s_max_train=64, s_max_test=256,
        test_chunk=65536, lpips_weights=None, profile=False,
        steps_per_epoch=1000, grid_size=128, max_samples=1024,
        lr_levels=8, lr_rank=16, lr_frames=2, lr_k_max=args.lr_k_max,
        bf16=False, s_flat=0, lr_fused=bool(args.lr_fused))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    spread = 1.0 if args.scale <= 0.5 else args.scale * 1.5
    scene = make_scene(n_train=16, n_test=1, wh=args.wh, seed=0,
                       spread=spread)
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    rays = jnp.asarray(system.train_dataset.rays)
    hw = args.wh * args.wh

    if args.state and os.path.exists(args.state):
        from mfnerf_tpu.utils.ckpt import load_ckpt
        loaded = load_ckpt(args.state, like={"params": system.params,
                                             "occ": system.occ})
        system.params, system.occ = loaded["params"], loaded["occ"]
        print(f"state: loaded {args.state} (warmup skipped)",
              file=sys.stderr)
    else:
        fused = system.make_fused_train_fn(n_img=16, hw=hw)
        key = jax.random.PRNGKey(1)
        step = 0
        chunks = [96] * (args.warmup_steps // 96)
        if args.warmup_steps % 96:
            chunks.append(args.warmup_steps % 96)
        for n in chunks:
            key, sub = jax.random.split(key)
            system.params, system.opt_state, system.occ, m = fused(
                system.params, system.opt_state, system.occ, system.poses,
                system.directions, rays, sub, step, n)
            step += n
        _sync(m["loss"])
        print(f"warmup: psnr {float(m['psnr']):.2f} "
              f"rm_s {float(m['rm_s']):.1f}", file=sys.stderr)
        if args.state:
            from mfnerf_tpu.utils.ckpt import save_ckpt
            save_ckpt(args.state, jax.device_get(system.params),
                      occ=jax.device_get(system.occ), step=step)
            print(f"state: saved {args.state}", file=sys.stderr)

    model, params, occ = system.model, system.params, system.occ
    cfg, rcfg = system.model_cfg, system.rcfg
    if args.dummy_field:
        class _Dummy:  # hashable static stand-in; constant field output
            def __init__(self, cfg, sigma):
                self.cfg = cfg
                self.sigma = sigma

            def __call__(self, params, xyz, dirs, exposure=None):
                return (jnp.full(xyz.shape[:1], self.sigma),
                        jnp.full((xyz.shape[0], 3), 0.5))
        model = _Dummy(cfg, args.dummy_sigma)
    if args.schedule:
        import json
        sched = tuple(tuple(r) for r in json.loads(args.schedule))
        rcfg = dataclasses.replace(rcfg, rounds=sched, rounds_full=sched)
    if args.t_threshold is not None:
        rcfg = dataclasses.replace(rcfg, T_threshold=args.t_threshold)
    if args.eval_chunk is not None:
        rcfg = dataclasses.replace(rcfg, eval_chunk=args.eval_chunk)
    if args.straggler:
        rcfg = dataclasses.replace(
            rcfg, straggler=tuple(int(x) for x in args.straggler.split(",")))
    if args.straggler2:
        rcfg = dataclasses.replace(
            rcfg, straggler2=None if args.straggler2.lower() == "none"
            else tuple(int(x) for x in args.straggler2.split(",")))

    if args.field_probe:
        import functools
        # sweep batch sizes: XLA fuses the hat-basis build into the encoder
        # matmul at small N but materializes the (N, K) basis to HBM at
        # large N (measured 13.4 ns/sample at 1M vs 40.7 at 2M) — the knee
        # sets both rcfg.eval_chunk and the wavefront pool*cap slot count
        for npts in (2 ** 15, 2 ** 17, 2 ** 19, 2 ** 20, 2 ** 21):
            xyz = jax.random.uniform(jax.random.PRNGKey(7), (npts, 3),
                                     minval=-0.5, maxval=0.5)
            dirs = jax.random.normal(jax.random.PRNGKey(8), (npts, 3))
            dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)

            @jax.jit
            def probe(xyz, dirs):
                def body(i, acc):
                    s, r = model(params, xyz + i * 1e-7, dirs)
                    return acc + s.sum() + r.sum()
                return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

            _sync(probe(xyz, dirs))
            t0 = time.perf_counter()
            _sync(probe(xyz + 1e-6, dirs))  # distinct input: no memoization
            dt = (time.perf_counter() - t0) / 8
            print(f"field fwd ({npts} samples, lr_fused={args.lr_fused}): "
                  f"{dt * 1e3:.2f} ms = {dt / npts * 1e9:.2f} ns/sample")
    batch = system.test_dataset[0]
    rays_o, rays_d = get_rays(jnp.asarray(system.test_dataset.directions),
                              jnp.asarray(batch["pose"]))

    if args.guided_schedules:
        # lean mode: go straight to the guided-schedule sweep (every extra
        # phase is a multi-minute tunnel compile)
        import json
        from mfnerf_tpu.models.rendering import render_test
        camera = (system.test_dataset.K, batch["pose"], (args.wh, args.wh))
        ref = render_test(model, params, occ, rays_o, rays_d, rcfg,
                          camera=camera, guided=False)
        _sync(ref["rgb"])
        for name, sched in json.loads(args.guided_schedules).items():
            r2 = dataclasses.replace(
                rcfg, rounds_guided=tuple(tuple(r) for r in sched))
            out = render_test(model, params, occ, rays_o, rays_d, r2,
                              camera=camera, guided=True)
            _sync(out["rgb"])
            err = float(jnp.mean((out["rgb"] - ref["rgb"]) ** 2))
            t0 = time.perf_counter()
            outs = [render_test(model, params, occ,
                                rays_o + (i + 1) * 1e-6, rays_d, r2,
                                camera=camera, guided=True)
                    for i in range(4)]
            [_sync(o["rgb"]) for o in outs]
            pipe = (time.perf_counter() - t0) / 4
            import numpy as _np
            print(f"  {name}: pipelined {pipe * 1e3:8.1f} ms/frame "
                  f"({1 / pipe:.2f} fps, {len(sched)} rounds) "
                  f"psnr-vs-unguided "
                  f"{-10 * _np.log10(max(err, 1e-12)):.1f} "
                  f"vr={int(out['total_samples'])}", flush=True)
        return

    t_near = t_far = None
    if not args.no_prepass:
        t_near, t_far = rasterize_block_ranges(
            cfg, occ.density_bitfield,
            jnp.asarray(system.test_dataset.K, jnp.float32),
            jnp.asarray(batch["pose"], jnp.float32)[:3, :4],
            (args.wh, args.wh), args.pre_block, args.pre_dilate)
        _sync(t_near)

        def time_prepass():
            t0 = time.perf_counter()
            a, b = rasterize_block_ranges(
                cfg, occ.density_bitfield,
                jnp.asarray(system.test_dataset.K, jnp.float32),
                jnp.asarray(batch["pose"], jnp.float32)[:3, :4],
                (args.wh, args.wh), args.pre_block, args.pre_dilate)
            _sync(a)
            return time.perf_counter() - t0
        print(f"prepass (rasterize_block_ranges): "
              f"{min(time_prepass() for _ in range(3)) * 1e3:.1f} ms")

    schedule = rcfg.rounds if t_near is not None else rcfg.rounds_full

    if args.prepasses:
        # prepass-tightness sweep: same wavefront config under different
        # rasterized-prepass (block, dilate) settings — n_valid (rays that
        # enter the pool) is the quantity being tuned, psnr-vs-oracle the
        # conservativeness guard (the oracle never uses a prepass)
        import json
        for name, (blk, dil) in json.loads(args.prepasses).items():
            def raster():
                t0 = time.perf_counter()
                tn, tf = rasterize_block_ranges(
                    cfg, occ.density_bitfield,
                    jnp.asarray(system.test_dataset.K, jnp.float32),
                    jnp.asarray(batch["pose"], jnp.float32)[:3, :4],
                    (args.wh, args.wh), int(blk), int(dil))
                _sync(tn)
                return time.perf_counter() - t0, tn, tf
            raster()  # compile
            runs = [raster() for _ in range(3)]
            dt = min(r[0] for r in runs)
            tn, tf = runs[-1][1], runs[-1][2]
            print(f"prepass {name} (block {blk}, dilate {dil}): "
                  f"{dt * 1e3:.1f} ms", flush=True)
            _sweep_wavefronts(args, rcfg, model, params, occ, rays_o,
                              rays_d, tn, tf)
        return

    if args.wavefronts:
        _sweep_wavefronts(args, rcfg, model, params, occ, rays_o, rays_d,
                          t_near, t_far)
        return

    # per-round stats (one run with stats collection)
    *_, vr_total, stats = _render_test_alive(
        model, params, occ, rays_o, rays_d, rcfg, t_near, t_far, True)
    stats = np.asarray(stats)
    print(f"vr_total={int(vr_total)} "
          f"({int(vr_total) / rays_o.shape[0]:.2f} samples/ray composited)")
    print("round |  capacity |     alive |   emitted |  padded evals | fill")
    for i, (c, alive, emitted, padded) in enumerate(stats):
        print(f"  {i}   | {int(c):9d} | {int(alive):9d} | {int(emitted):9d}"
              f" | {int(padded):13d} | {emitted / max(padded, 1):.3f}")
    tot_pad = stats[:, 3].sum()
    tot_emit = stats[:, 2].sum()
    print(f"total padded field evals: {int(tot_pad)} "
          f"(emitted {int(tot_emit)}, overall fill {tot_emit / tot_pad:.3f})")

    # full-frame timing
    def time_frame():
        out = _render_test_alive(model, params, occ, rays_o, rays_d, rcfg,
                                 t_near, t_far)
        _sync(out[0])
        ts = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            out = _render_test_alive(model, params, occ,
                                     rays_o + (i + 1) * 1e-6, rays_d,
                                     rcfg, t_near, t_far)
            _sync(out[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    print(f"full frame ({len(schedule)} rounds): {time_frame() * 1e3:.1f} ms",
          flush=True)

    # fused one-dispatch frame (render_test with camera): blocking latency
    # and pipelined throughput (4 frames in flight, rays perturbed so the
    # tunnel can't memoize)
    from mfnerf_tpu.models.rendering import render_test
    camera = (system.test_dataset.K, batch["pose"], (args.wh, args.wh))
    for guided in (() if args.guided_schedules or args.schedules
                   else (False, True)):
        out = render_test(model, params, occ, rays_o, rays_d, rcfg,
                          camera=camera, guided=guided)
        _sync(out["rgb"])
        lat = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            out = render_test(model, params, occ, rays_o + (i + 1) * 1e-6,
                              rays_d, rcfg, camera=camera, guided=guided)
            _sync(out["rgb"])
            lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs = [render_test(model, params, occ, rays_o + (i + 10) * 1e-6,
                            rays_d, rcfg, camera=camera, guided=guided)
                for i in range(4)]
        [_sync(o["rgb"]) for o in outs]
        pipe = (time.perf_counter() - t0) / 4
        print(f"fused frame guided={guided}: blocking {min(lat) * 1e3:.1f} "
              f"ms, pipelined {pipe * 1e3:.1f} ms "
              f"({1 / pipe:.2f} fps), vr={int(out['total_samples'])}",
              flush=True)

    if args.schedules:
        import json
        # correctness anchor: the DENSE single-pass oracle at the same
        # T_threshold — schedules must only ever be compared against it,
        # never against each other (a starved schedule pair looks "equal";
        # see docs/TPU_NOTES.md round-2 completion-guarantee fix)
        from mfnerf_tpu.models.rendering import render_test_dense
        # small chunks: a 65536-ray dense chunk materializes a ~10+ GB hat
        # basis (s_max_test x K_pad bf16) and OOMs HBM
        oracle = render_test_dense(model, params, occ, rays_o, rays_d,
                                   dataclasses.replace(rcfg,
                                                       test_chunk=16384))
        _sync(oracle["rgb"])
        for name, sched in json.loads(args.schedules).items():
            r2 = dataclasses.replace(rcfg,
                                     rounds=tuple(tuple(r) for r in sched),
                                     rounds_full=tuple(tuple(r)
                                                       for r in sched))
            out = _render_test_alive(model, params, occ, rays_o, rays_d, r2,
                                     t_near, t_far)
            _sync(out[0])
            blended = out[0] + (1.0 - out[1])[:, None]
            err = float(jnp.mean((blended - oracle["rgb"]) ** 2))
            note = f"psnr-vs-oracle {-10 * np.log10(max(err, 1e-12)):.1f}"
            ts = []
            for i in range(args.frames):
                t0 = time.perf_counter()
                out = _render_test_alive(model, params, occ,
                                         rays_o + (i + 1) * 1e-6,
                                         rays_d, r2, t_near, t_far)
                _sync(out[0])
                ts.append(time.perf_counter() - t0)
            # pipelined: frames in flight, one barrier — the honest
            # throughput number over the tunnel (~30 ms RTT per dispatch)
            t0 = time.perf_counter()
            outs = [_render_test_alive(model, params, occ,
                                       rays_o + (i + 10) * 1e-6, rays_d,
                                       r2, t_near, t_far)
                    for i in range(4)]
            [_sync(o[0]) for o in outs]
            pipe = (time.perf_counter() - t0) / 4
            print(f"  {name}: blocking {min(ts) * 1e3:8.1f} ms/frame, "
                  f"pipelined {pipe * 1e3:8.1f} ms ({1 / pipe:.2f} fps, "
                  f"{len(sched)} rounds) {note}", flush=True)
        return
    if args.no_prefix:
        return

    # schedule-prefix timing
    def time_sched(rounds):
        r2 = dataclasses.replace(rcfg, rounds=tuple(rounds),
                                 rounds_full=tuple(rounds))
        out = _render_test_alive(model, params, occ, rays_o, rays_d, r2,
                                 t_near, t_far)
        _sync(out[0])
        ts = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            out = _render_test_alive(model, params, occ,
                                     rays_o + (i + 1) * 1e-6, rays_d, r2,
                                     t_near, t_far)
            _sync(out[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    prev = 0.0
    for i in range(1, len(schedule) + 1):
        t = time_sched(schedule[:i])
        print(f"rounds[:{i}] {schedule[i - 1]}: {t * 1e3:8.1f} ms "
              f"(round {i - 1}: +{(t - prev) * 1e3:.1f} ms)")
        prev = t


if __name__ == "__main__":
    main()
