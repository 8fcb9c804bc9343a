"""Rendering dispatch: train and test ray rendering pipelines.

TPU-native re-design of reference models/rendering.py. The train path is one
fused jit region: AABB intersect -> t-ladder march -> field eval -> scan
compositing -> background blend. The test path reuses the same static-shape
machinery chunk-by-chunk (the reference's dynamic "alive rays" loop with its
mutable hits_t cursor is replaced by masked incremental compositing; see
render_test for the performance notes).
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.composite import (SEG_BLOCK, composite_test_step,
                             composite_test_step_flat, composite_train,
                             composite_train_flat, gather_flat_rows,
                             gather_rows_sorted)
from ..ops.intersection import ray_aabb_intersect_single
from ..ops.ray_march import (cascades_stratum, march_rays_train,
                             march_rays_train_cascades,
                             march_rays_train_twolevel, march_rays_window,
                             march_rays_window_cascades,
                             march_rays_window_twolevel, march_seek_cascades,
                             march_seek_twolevel, twolevel_stratum)
from ..ops.stepping import calc_dt, max_ladder_steps, t_ladder

MAX_SAMPLES = 1024     # reference rendering.py:7
NEAR_DISTANCE = 0.01   # reference rendering.py:8
SQRT3 = 1.7320508075688772


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering knobs (hashable -> usable as a jit constant)."""
    exp_step_factor: float = 0.0   # 0 synthetic, 1/256 real (train.py:100-101)
    T_threshold: float = 1e-4
    max_samples: int = MAX_SAMPLES
    s_max_train: int = 128         # padded per-ray sample budget (train)
    s_max_test: int = 256          # padded per-ray sample budget (test)
    random_bg: bool = False
    test_chunk: int = 16384
    s_strata: int = 32             # two-level march: coarse-strata budget
    # flat (ragged) training evaluation: the field runs only on the valid
    # marched samples, compacted to a batch budget of s_flat per ray on
    # average, instead of on every slot of the padded (N, s_max_train) rows.
    # Round 1's formulation lost to its per-sample gathers (84 vs 73
    # ms/step); the current gather-frugal layout (segmented scans, merged
    # row gather, scatter-free adjoints) WINS decisively — padded 20.1 vs
    # flat 12.9 ms/step at the r4 bench config — so the CLI defaults to 16
    # (opt.py). 0 here keeps the library default conservative for direct
    # RenderConfig users (multi-cascade scenes REQUIRE 0: their rm_s ~50
    # overflows a synthetic-tuned budget and destabilizes training).
    s_flat: int = 0
    # alive-ray round schedule for the fast test renderer: per round a
    # (capacity fraction of the ray count, rung-window length, sample cap
    # [, flat budget q]). The XLA analogue of the reference's adaptive
    # N_samples loop (rendering.py:75-105): round capacities shrink as rays
    # converge, and each round is a static-shape program — the whole
    # schedule jits as one dispatch.
    # sample cap == 0 marks a FIELD-FREE SEEK round (ops/ray_march.py
    # march_seek_*): the cursor advances to the first coarse-occupied
    # stratum at pure marching cost. Round-2 anatomy showed the first three
    # content rounds were really seeks paying padded field evals at ~2%
    # fill (207 of 321 ms/frame); with explicit seeks the content rounds
    # start AT content and run at high fill.
    # Correctness never depends on these schedules — the completion sweep
    # below finishes whatever they leave — so they are PURE throughput
    # tuning (tuned on the 800x800 bench scene, docs/TPU_NOTES.md).
    rounds: tuple = ((0.55, 128, 0), (0.4, 256, 0), (0.2, 768, 0),
                     (0.4, 48, 16), (0.25, 64, 24), (0.1, 512, 0),
                     (0.1, 96, 32), (0.04, 192, 48), (0.015, 2048, 128))
    # without per-frame t-ranges rays may march long empty stretches before
    # content: longer seek windows, same content cascade
    rounds_full: tuple = ((0.55, 256, 0), (0.4, 512, 0), (0.2, 1024, 0),
                          (0.4, 48, 16), (0.25, 64, 24), (0.1, 1024, 0),
                          (0.1, 96, 32), (0.04, 192, 48), (0.015, 2048, 128))
    # depth-guided two-pass rendering (render_test guided=True): most rays
    # carry a tight [t_near, t_far] from the low-res depth pass, so the
    # full-res schedule opens with a short window sized to the guided span
    # and converges the bulk of the image in one round. Round-0 cap is 8,
    # not 16: at 800x800 a full-capacity 16-cap round materializes a
    # (10.2M, 513) bf16 hat basis (~10.5 GB) and exhausts HBM
    rounds_guided: tuple = ((1.0, 48, 8), (0.3, 96, 16), (0.1, 256, 32),
                            (0.04, 1024, 96), (0.015, 4096, 256))
    guided_stride: int = 4         # low-res pass subsampling factor
    guided_margin_cells: float = 2.0   # guided t-range slack, in fine cells
    # padded-round field evals beyond this many slots run as sequential
    # lax.map chunks: XLA materializes the (slots, K_pad) bf16 hat basis
    # before its matmul, so an unchunked round beyond ~4M slots (~5 GB)
    # OOMs HBM — this cap is why round capacities historically shrank as
    # sample caps grew. Chunking lifts the constraint so schedules can use
    # fewer, larger rounds (machinery is ~34 ms/round at 640k rays,
    # docs/TPU_NOTES.md round 3). 0 disables.
    eval_chunk: int = 2 ** 21
    # completion sweep after the static rounds (capacity, window, cap):
    # while_loop'd fixed-shape rounds until NO ray is alive — the static
    # schedules are throughput tuning, this is the correctness guarantee
    straggler: tuple = (49152, 512, 32)
    straggler_max_iters: int = 512   # safety bound (progress is guaranteed)
    # optional small-capacity TAIL stage (capacity, window, cap): when set,
    # the main sweep stops once <= its capacity rays remain and this stage
    # drains the tail — late sweep iterations otherwise pay the full
    # (capacity x cap) padded field eval for a handful of alive rays.
    # None keeps the single-stage sweep.
    straggler2: Optional[tuple] = None
    # WAVEFRONT renderer (pool, seek_window, window, cap): replaces the
    # round schedule + sweep with a persistent compacted ray pool — dead
    # slots refill from the frame's ray queue each iteration, so the
    # per-iteration selection/state machinery runs at POOL scale instead
    # of frame scale (640k), and completion is structural (the loop runs
    # until the queue is drained and the pool is dead).
    # None keeps the round-schedule renderer. See _render_test_wavefront.
    # DEFAULT (the r3 sweep winner, docs/TPU_NOTES.md): pool 2048 — the
    # measured optimum (bigger pools lose tail fill, smaller ones go
    # iteration-bound); NO explicit seek phase — the window march's
    # stage-A coarse selection already skips leading empty strata, so a
    # long window is a cheaper seek than a separate field-free phase
    # (2.74 -> 3.07 fps at 800x800, T=1e-2, oracle-exact); window 128
    # (saturated 128..256); cap 16. 1.9x the tuned round schedule.
    wavefront: Optional[tuple] = (2048, 0, 128, 16)
    # safety bound only (progress is guaranteed; completion is the exit
    # condition): must exceed the worst case (n/P) * ceil(k_total/window)
    # iterations of a fully-dense frame — 4096 did not at 640k rays/P=2048
    wavefront_max_iters: int = 1 << 16
    # profiling: _render_test_wavefront returns (rgb, op, depth, vr, iters)
    # instead of 4 outputs — iteration count sizes per-iteration cost/fill
    wavefront_stats: bool = False

    def n_rungs(self, scale: float, grid_size: int = 128,
                test: bool = False) -> int:
        """Static ladder length covering the whole scene AABB."""
        t_end = 2.0 * SQRT3 * scale + NEAR_DISTANCE
        dt_scale = self._dt_scale(scale, test)
        k = max_ladder_steps(NEAR_DISTANCE, t_end, self.exp_step_factor,
                             self.max_samples, grid_size, dt_scale)
        return min(k, 4 * self.max_samples)

    def _dt_scale(self, scale, test):
        # bug parity: the reference test kernel passes `cascades` where
        # calc_dt expects `scale` (raymarching.cu:370,399)
        if test:
            import math
            return max(1 + int(math.ceil(math.log2(2 * scale))), 1)
        return scale


def parse_wavefront(spec):
    """Parse a wavefront tuple from CLI text / JSON lists.

    ``"none"`` -> None (round-schedule renderer). Otherwise comma-separated
    fields ``P,seek,window,cap[,s_strata]`` where ``P`` may be a
    colon-separated pool CASCADE (e.g. ``"32768:2048,0,128,16"``); JSON
    callers may pass a list whose first element is itself a list.
    """
    if spec is None:
        return None
    if isinstance(spec, str):
        if spec.lower() == "none":
            return None
        parts = spec.split(",")
    else:
        parts = list(spec)
    out = []
    for i, p in enumerate(parts):
        if i == 0 and isinstance(p, str) and ":" in p:
            out.append(tuple(int(x) for x in p.split(":")))
        elif i == 0 and isinstance(p, (list, tuple)):
            out.append(tuple(int(x) for x in p))
        else:
            out.append(int(p))
    return tuple(out)


def _clamp_near(hits_t):
    """Clamp t_near into [NEAR_DISTANCE, inf) for hitting rays.

    Parity: rendering.py:29.
    """
    t1 = hits_t[:, 0]
    t1 = jnp.where((t1 >= 0) & (t1 < NEAR_DISTANCE), NEAR_DISTANCE, t1)
    return hits_t.at[:, 0].set(t1)


def render_train(model, params, occ, rays_o, rays_d, key, rcfg: RenderConfig,
                 exposure=None):
    """Differentiable train-time rendering of a ray batch.

    Parity: reference render() + __render_rays_train (rendering.py:12-43,
    121-163). Returns a dict with rgb/opacity/depth/ws/deltas/ts/mask and the
    rm_samples/vr_samples telemetry counters.
    """
    cfg = model.cfg
    hits_t = ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale))
    hits_t = _clamp_near(hits_t)

    key_noise, key_bg, key_gn = jax.random.split(key, 3)
    noise = jax.random.uniform(key_noise, (rays_o.shape[0],))

    def hash_grad_noise(n_samples):
        # per-sample uniforms for the stochastic-corner table gradient
        # (hash-family grids only; ops/hashgrid.HashGridConfig.grad_corners)
        if model.is_lowrank or model.cfg.hash_grad_samples >= 8:
            return None
        return jax.random.uniform(
            key_gn, (n_samples, model.cfg.hash_grad_samples))
    stratum, _ = twolevel_stratum(rcfg.exp_step_factor, rcfg.max_samples,
                                  cfg.scale, cfg.grid_size, cfg.cascades,
                                  cfg.dir_norm)
    c_stratum, _ = cascades_stratum(rcfg.exp_step_factor, cfg.scale,
                                    cfg.cascades, dir_norm=cfg.dir_norm)
    if stratum:  # synthetic single-cascade scenes: gather-frugal march
        # cfg.pool_a swaps stage A onto the coarser pooled table (more
        # strata per row gather; false positives cost only exact stage-B
        # tests — a training-only trade, see NGPConfig.pool_a)
        pool_kw = (dict(nbr_a=occ.pool_nbr, g_a=cfg.grid_size // cfg.pool_a)
                   if cfg.pool_a else {})
        mr = march_rays_train_twolevel(
            rays_o, rays_d, hits_t, occ.fine_nbr,
            occ.coarse_nbr, cfg.scale, rcfg.exp_step_factor,
            cfg.grid_size, rcfg.max_samples, noise,
            rcfg.n_rungs(cfg.scale, cfg.grid_size), rcfg.s_max_train,
            stratum, s_strata=rcfg.s_strata, dir_norm=cfg.dir_norm,
            **pool_kw)
    elif c_stratum:  # real scenes: union-grid strata, exact fine rungs
        mr = march_rays_train_cascades(
            rays_o, rays_d, hits_t, occ.density_bitfield, occ.union_bits,
            cfg.cascades, cfg.scale, rcfg.exp_step_factor, cfg.grid_size,
            rcfg.max_samples, noise,
            rcfg.n_rungs(cfg.scale, cfg.grid_size), rcfg.s_max_train,
            c_stratum, s_strata=rcfg.s_strata)
    else:
        mr = march_rays_train(
            rays_o, rays_d, hits_t, occ.density_bitfield, cfg.cascades,
            cfg.scale, rcfg.exp_step_factor, cfg.grid_size,
            rcfg.max_samples, noise,
            rcfg.n_rungs(cfg.scale, cfg.grid_size), rcfg.s_max_train)

    n, s = mr.ts.shape
    if rcfg.s_flat:
        # ragged evaluation: compact the valid samples of the whole batch
        # into a (N*s_flat,) flat array — the padded rows hold ~12 real
        # samples out of s_max_train=64 slots, so this cuts field
        # evaluations ~3-5x. Gather-frugal reconstruction: only the int32
        # rung index k and ONE packed per-ray row are fetched per sample;
        # t/dt/xyz are recomputed closed-form from the ladder (bitwise equal
        # to the padded path's values). The round-1 flat path gathered
        # (xyz, dir, t, dt) directly and lost to the scatter-adds those
        # gathers' VJPs emit (84 vs 73 ms/step); here the backward reaches
        # per-ray geometry only through gather_rows_sorted, whose VJP is a
        # cumsum-difference segment sum — no scatter anywhere.
        b = n * rcfg.s_flat
        counts = mr.n_samples
        offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        total = counts.sum()
        # ray_id via segment-start marks + cumsum (empty segments stack
        # their marks on the same position; overflowing starts drop)
        marks = jnp.zeros((b,), jnp.int32).at[offsets].add(
            1, mode="drop", indices_are_sorted=True)
        ray_id = jnp.cumsum(marks) - 1
        # segment start per slot via cummax instead of offsets[ray_id]: a
        # B-element structural gather costs ~1.2 ms at the bench shapes
        # where the scan costs ~0.3 (benchmarking/probe_segscan.py)
        beg = jax.lax.cummax(
            jnp.where(marks > 0, jnp.arange(b, dtype=jnp.int32), 0))
        pos = jnp.arange(b, dtype=jnp.int32) - beg
        valid = jnp.arange(b) < total

        # content-window bound for the blocked segment helpers: no ray
        # emits more than s (= s_max_train) samples into its flat segment
        blk = max(SEG_BLOCK, s)
        packed = [rays_o, mr.dirs, mr.t_start[:, None]]
        if exposure is not None:
            packed.append(exposure)
        # one row gather fetches geometry AND the ray's rung row; the rung
        # at pos is a select-sum, not a second B-element gather (~1 ms at
        # the bench shapes, profile_stages r4)
        row_f, k_f = gather_flat_rows(
            jnp.concatenate(packed, axis=1), mr.k_idx.astype(jnp.float32),
            ray_id, jnp.minimum(pos, s - 1), offsets, blk)
        o_f, d_f, t0_f = row_f[:, :3], row_f[:, 3:6], row_f[:, 6]
        exp_f = row_f[:, 7:8] if exposure is not None else None
        ts_f = t_ladder(t0_f, k_f[:, None], rcfg.exp_step_factor,
                        rcfg.max_samples, cfg.grid_size, cfg.scale)[:, 0]
        deltas_f = calc_dt(ts_f, rcfg.exp_step_factor, rcfg.max_samples,
                           cfg.grid_size, cfg.scale)
        ts_f = jnp.where(valid, ts_f, 0.0)
        deltas_f = jnp.where(valid, deltas_f, 0.0)
        xyz_f = o_f + ts_f[:, None] * d_f
        sigmas, rgbs = model(params, xyz_f, d_f, exposure=exp_f,
                             grad_noise=hash_grad_noise(b))
        sigmas = jnp.where(valid, sigmas, 0.0)

        comp = composite_train_flat(sigmas, rgbs, deltas_f, ts_f, valid,
                                    ray_id, offsets, n, rcfg.T_threshold,
                                    block=blk)
        extras = {
            "ws_flat": comp.ws, "w_excl_flat": comp.w_excl,
            "wm_excl_flat": comp.wm_excl, "deltas_flat": deltas_f,
            "ts_flat": ts_f, "offsets": offsets, "flat_block": blk,
            "ray_id_flat": ray_id,
        }
    else:
        xyz_flat = mr.xyzs.reshape(n * s, 3)
        dir_flat = jnp.broadcast_to(mr.dirs[:, None, :],
                                    (n, s, 3)).reshape(-1, 3)
        exp_flat = None
        if exposure is not None:
            exp_flat = jnp.broadcast_to(exposure[:, None, :],
                                        (n, s, 1)).reshape(-1, 1)
        sigmas, rgbs = model(params, xyz_flat, dir_flat, exposure=exp_flat,
                             grad_noise=hash_grad_noise(n * s))
        sigmas = jnp.where(mr.mask.reshape(-1), sigmas, 0.0).reshape(n, s)
        rgbs = rgbs.reshape(n, s, 3)
        comp = composite_train(sigmas, rgbs, mr.deltas, mr.ts, mr.mask,
                               rcfg.T_threshold)
        extras = {"ws": comp.ws, "deltas": mr.deltas, "ts": mr.ts,
                  "mask": mr.mask}

    if rcfg.exp_step_factor == 0:  # synthetic scenes: white background
        rgb_bg = jnp.ones(3)
    elif rcfg.random_bg:
        rgb_bg = jax.random.uniform(key_bg, (3,))
    else:
        rgb_bg = jnp.zeros(3)
    rgb = comp.rgb + rgb_bg * (1.0 - comp.opacity)[:, None]

    return {
        "rgb": rgb, "opacity": comp.opacity, "depth": comp.depth,
        "rm_samples": mr.rm_samples, "vr_samples": comp.vr_samples,
        "total_samples": mr.rm_samples, **extras,
    }


@partial(jax.jit, static_argnums=(0, 5))
def _render_test_chunk(model, params, occ, rays_o, rays_d, rcfg,
                       exposure=None):
    """One test chunk: march everything, eval, composite (no grad).

    Covers EVERY sample the MAX_SAMPLES semantics admit: the march caps a
    ray at ``max_samples`` occupied rungs (reference raymarching.cu:204 /
    the test loop's 1024-sample bound, rendering.py:75-105), and this
    oracle composites them in ceil(max_samples / s_max_test) static rank
    windows — window j holds each ray's occupied samples ranked
    j*s_max_test+1 .. (j+1)*s_max_test (march_rays_train ``rank_start``),
    with transmittance resumed across windows by composite_test_step.
    Before round 4 the oracle silently truncated at s_max_test (256)
    samples per ray, under-compositing content-dense rays and weakening
    every "oracle-exact" claim (r3 VERDICT weak #4).

    ``exposure``: optional (1, 1) per-image exposure, broadcast to every
    sample (HDR-NeRF test rendering; reference train.py:102-103)."""
    cfg = model.cfg
    hits_t = ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale))
    hits_t = _clamp_near(hits_t)
    n = rays_o.shape[0]
    noise = jnp.zeros((n,))  # test marching is unjittered
    n_windows = -(-rcfg.max_samples // rcfg.s_max_test)

    opacity = jnp.zeros((n,))
    depth = jnp.zeros((n,))
    rgb = jnp.zeros((n, 3))
    alive = hits_t[:, 0] >= 0
    vr = jnp.int32(0)
    for j in range(n_windows):
        mr = march_rays_train(
            rays_o, rays_d, hits_t, occ.density_bitfield, cfg.cascades,
            cfg.scale, rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
            noise, rcfg.n_rungs(cfg.scale, cfg.grid_size, test=True),
            rcfg.s_max_test, dt_scale=rcfg._dt_scale(cfg.scale, True),
            rank_start=j * rcfg.s_max_test)
        s = mr.ts.shape[1]
        # sigma/rgb pass on every padded sample of this window
        xyz_flat = mr.xyzs.reshape(n * s, 3)
        dir_flat = jnp.broadcast_to(mr.dirs[:, None, :],
                                    (n, s, 3)).reshape(-1, 3)
        sigmas, rgbs = model(params, xyz_flat, dir_flat, exposure=exposure)
        sigmas = jnp.where(mr.mask.reshape(-1), sigmas, 0.0).reshape(n, s)
        rgbs = rgbs.reshape(n, s, 3)
        vr = vr + jnp.sum(jnp.where(alive, mr.n_samples, 0))
        opacity, depth, rgb, alive = composite_test_step(
            sigmas, rgbs, mr.deltas, mr.ts, mr.mask,
            opacity, depth, rgb, alive, rcfg.T_threshold)
    return rgb, opacity, depth, vr


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def rasterize_block_ranges(cfg, occ_bitfield, k_cam, pose, img_wh, block=8,
                           dilate=2):
    """Splat occupied coarse cells into per-pixel-block [t_near, t_far].

    The test-time empty-space skip re-thought for TPU: instead of testing
    occupancy per ladder rung (random gathers at ~7 ns each), project every
    occupied coarse cell into the camera once per frame (a matmul + one
    262k-element scatter-min/max) and bound each 16x16-pixel block's depth
    range conservatively. Rays then start marching at their block's t_near
    and exhaust at t_far. Footprint-bucketed dilation tiers (dilate, 2x,
    4x, then a screen-global bucket) keep the bound a strict superset of
    visible content at every cell depth.

    Default (8, 2) is the r5 tightness-sweep winner: every valid ray costs
    >= 1 pool row-iteration (~0.35 us) in the wavefront renderer, so
    n_valid is a first-order frame cost — (8, 2) cut it 291k -> 192k
    (6.0 -> 8.1 fps) on the converged bench scene, still oracle-exact.
    Looser settings admit background rays that march emitting nothing;
    tighter ones push ordinary cells into the wider tiers.

    Args:
        cfg: NGPConfig (static; single cascade).
        occ_bitfield: fine density bitfield (cell occupied iff its byte != 0
            gives the 2x-pooled coarse occupancy — Morton child property).
        k_cam: (3, 3) intrinsics. pose: (3, 4) c2w.
        img_wh, block, dilate: static ints.
    Returns:
        (t_near, t_far) float32 (H*W,) per-pixel conservative ranges
        (inf/-inf where the block sees nothing).
    """
    from ..ops.morton import morton3d_invert
    w, h = img_wh
    g_c = cfg.grid_size // 2
    occ_cells = occ_bitfield.reshape(-1)[:g_c ** 3] != 0     # coarse, morton
    # (Splatting all g_c^3 cells is fine: the 262k-cell scatter-min/max is
    # a few ms of device time — a per-dispatch timing of this function
    # mostly measures the ~30 ms tunnel round trip. A top_k compaction to
    # occupied cells was tried and REVERTED: any static occupancy budget
    # small enough to save time overflows at realistic mid-training
    # occupancies, and its conservative fallback — disabling the skip —
    # costs far more than the scatter saves.)
    coords = morton3d_invert(jnp.arange(g_c ** 3, dtype=jnp.uint32))
    centers = ((coords.astype(jnp.float32) + 0.5) / g_c * 2.0 - 1.0) \
        * cfg.scale                                           # (M, 3)
    r_cell = SQRT3 * cfg.scale / g_c                          # half-diagonal

    rot = pose[:3, :3]
    cam_t = pose[:3, 3]
    xc = (centers - cam_t) @ rot                              # camera coords
    depth = xc[:, 2]
    uv = (xc @ k_cam.T)[:, :2] / jnp.maximum(depth, 1e-6)[:, None]

    nbx, nby = -(-w // block), -(-h // block)
    # a cell's projected footprint spills ~f*r_cell/depth pixels around its
    # center's block: a uniform ``dilate`` only covers cells with footprint
    # <= (dilate-0.5) blocks. Instead of the old FRAME-GLOBAL fallback
    # (one stray near-camera occupied cell used to disable the whole
    # frame's skip — full-range march, measured 3x slower), cells scatter
    # into the smallest dilation TIER that covers their footprint; the
    # handful nearer than the widest tier contribute a screen-global range
    # (still per-frame conservative, never fatal).
    f_max = jnp.maximum(k_cam[0, 0], k_cam[1, 1])
    fp_blocks = f_max * r_cell \
        / (jnp.maximum(depth, 1e-6) * block)          # footprint, in blocks
    tiers = (dilate, 2 * dilate, 4 * dilate)
    margin = float(tiers[-1] * block)
    valid = (occ_cells & (depth > r_cell)
             & (uv[:, 0] > -margin) & (uv[:, 0] < w + margin)
             & (uv[:, 1] > -margin) & (uv[:, 1] < h + margin))
    bu = jnp.clip(uv[:, 0].astype(jnp.int32) // block, 0, nbx - 1)
    bv = jnp.clip(uv[:, 1].astype(jnp.int32) // block, 0, nby - 1)
    bidx = bv * nbx + bu

    near = jnp.full((nby, nbx), jnp.inf)
    far = jnp.full((nby, nbx), -jnp.inf)
    prev_cap = 0.0
    for dil in tiers:
        cap = dil - 0.5
        sel = valid & (fp_blocks <= cap) & (fp_blocks > prev_cap)
        prev_cap = cap
        tn = jnp.full((nby * nbx,), jnp.inf).at[bidx].min(
            jnp.where(sel, depth - r_cell, jnp.inf)).reshape(nby, nbx)
        tf = jnp.full((nby * nbx,), -jnp.inf).at[bidx].max(
            jnp.where(sel, depth + r_cell, -jnp.inf)).reshape(nby, nbx)
        for axis in (0, 1):
            for _ in range(dil):
                tn = jnp.minimum(tn, jnp.minimum(
                    jnp.roll(tn, 1, axis), jnp.roll(tn, -1, axis)))
                tf = jnp.maximum(tf, jnp.maximum(
                    jnp.roll(tf, 1, axis), jnp.roll(tf, -1, axis)))
        near = jnp.minimum(near, tn)
        far = jnp.maximum(far, tf)

    # global remainder: cells too near for any tier cover (potentially) the
    # whole screen — their range applies to every block. The depth gate
    # keeps cells strictly behind the camera out (their clamped footprint
    # is huge); a cell within r_cell of the camera plane still counts.
    sel_g = occ_cells & (fp_blocks > prev_cap) & (depth > -r_cell)
    g_near = jnp.min(jnp.where(sel_g, depth - r_cell, jnp.inf))
    g_far = jnp.max(jnp.where(sel_g, depth + r_cell, -jnp.inf))
    near = jnp.minimum(near, jnp.maximum(g_near, 0.0))
    far = jnp.maximum(far, g_far)

    # block grid -> per pixel
    near_pix = jnp.repeat(jnp.repeat(near, block, 0), block, 1)[:h, :w]
    far_pix = jnp.repeat(jnp.repeat(far, block, 0), block, 1)[:h, :w]
    return near_pix.reshape(-1), far_pix.reshape(-1)


def _eval_field_padded(model, params, xyz_flat, dir_flat, eval_chunk,
                       exposure=None):
    """Field eval on a flat slot array, optionally as sequential lax.map
    chunks: XLA materializes the (slots, K_pad) hat basis before its
    matmul, so an unchunked eval beyond ~4M slots (~5 GB) OOMs HBM."""
    n_slots = xyz_flat.shape[0]
    if eval_chunk and n_slots > eval_chunk:
        n_ch = -(-n_slots // eval_chunk)
        pad = n_ch * eval_chunk - n_slots
        xyz_c = jnp.concatenate(
            [xyz_flat, jnp.zeros((pad, 3), xyz_flat.dtype)]
        ).reshape(n_ch, eval_chunk, 3)
        dir_c = jnp.concatenate(
            [dir_flat, jnp.ones((pad, 3), dir_flat.dtype)]
        ).reshape(n_ch, eval_chunk, 3)
        sigmas, rgbs = jax.lax.map(
            lambda xd: model(params, xd[0], xd[1], exposure=exposure),
            (xyz_c, dir_c))
        return sigmas.reshape(-1)[:n_slots], rgbs.reshape(-1, 3)[:n_slots]
    return model(params, xyz_flat, dir_flat, exposure=exposure)


@partial(jax.jit, static_argnums=(0, 5, 8))
def _render_test_alive(model, params, occ, rays_o, rays_d,
                       rcfg: RenderConfig, t_near=None, t_far=None,
                       collect_stats=False, exposure=None):
    """Multi-round alive-ray renderer — the whole schedule is ONE dispatch.

    The XLA re-design of the reference's test loop (rendering.py:46-118 +
    raymarching.cu:335-454 + volumerendering.cu:206-285): rounds of
    (march a rung window -> field eval -> incremental composite) over a
    statically shrinking set of alive rays. Compaction is jax.lax.top_k on
    the alive flags (stable, so ray order is preserved); converged/exhausted
    rays stop costing field evaluations, which is where the FPS comes from
    (the dense single-pass path evaluates every padded sample).

    TPU cost structure (docs/TPU_NOTES.md) shapes two further choices:

    * ALL per-ray state lives in one packed (N, 16) fp32 matrix — XLA
      gathers/scatters cost ~7-17 ns per ROW regardless of width, so one
      packed row gather + one scatter per round replaces the ~14 per-array
      ops the naive formulation pays.
    * a round whose schedule entry carries a 4th element ``q`` evaluates the
      field on a FLAT budget of c*q samples instead of the padded (c, s_cap)
      block: emitted samples are compacted (ray-major), their t/dt/xyz
      rebuilt closed-form from the gathered rung index, and composited by
      segment cumsums (composite_test_step_flat). Rays whose samples
      overflow the budget are truncated EXACTLY — their cursor resumes at
      the first dropped rung and they stay alive for later rounds — so the
      result is bit-identical to the padded path given enough total
      schedule capacity.
    """
    cfg = model.cfg
    n = rays_o.shape[0]
    hits_t = ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale))
    hits_t = _clamp_near(hits_t)
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    valid = t1 >= 0
    t_start = jnp.where(valid, t1, 0.0)
    t2 = jnp.where(valid, t2, -1.0)
    k_total = rcfg.n_rungs(cfg.scale, cfg.grid_size, test=True)
    dt_scale = rcfg._dt_scale(cfg.scale, True)

    cursor = jnp.zeros((n,), jnp.float32)
    alive = valid
    if t_near is not None and rcfg.exp_step_factor == 0:
        # rasterized block ranges: jump the cursor to the first rung at or
        # past t_near and clamp the exit to t_far (both conservative)
        dt_min = SQRT3 / rcfg.max_samples
        cursor = jnp.clip(jnp.ceil((t_near - t_start) / dt_min), 0, k_total)
        t2 = jnp.minimum(t2, t_far)
        alive = alive & (t_near < t2)
    vr_total = jnp.int32(0)
    stats = []

    # packed per-ray state: one row gather/scatter per round moves ALL of it.
    # Slot 15 (ATC) flags rays KNOWN to sit at coarse-occupied content —
    # written by seek rounds, consumed by the round-selection scores below.
    zeros = jnp.zeros((n,), jnp.float32)
    st = jnp.concatenate([
        rays_o, rays_d, t_start[:, None], t2[:, None], cursor[:, None],
        zeros[:, None], zeros[:, None], jnp.zeros((n, 3), jnp.float32),
        alive.astype(jnp.float32)[:, None], zeros[:, None]], axis=1)
    O, D, TS, T2, CU, OP, DE, RGB, AL, ATC = (slice(0, 3), slice(3, 6), 6, 7,
                                              8, 9, 10, slice(11, 14), 14,
                                              15)

    stratum, _ = twolevel_stratum(rcfg.exp_step_factor, rcfg.max_samples,
                                  cfg.scale, cfg.grid_size, cfg.cascades,
                                  cfg.dir_norm)
    c_stratum, _ = cascades_stratum(rcfg.exp_step_factor, cfg.scale,
                                    cfg.cascades, dir_norm=cfg.dir_norm)
    schedule = rcfg.rounds if t_near is not None else rcfg.rounds_full

    def run_round(st, vr_total, c, w_len, s_cap, q_flat):
        """One alive-round at STATIC (c, w_len, s_cap, q_flat): select c
        rays, march a window, field-eval, composite incrementally, scatter
        the updated packed rows back. Used both unrolled (the schedule) and
        as the body of the completion sweep below.

        s_cap == 0 is a FIELD-FREE SEEK round: only the coarse structure is
        consulted and only the cursor/at-content flags change — no field
        eval, no compositing. Seek rounds select rays NOT yet known to be
        at content; content rounds prefer rays the seeks have already
        landed on content (the ATC flag), so their padded sample blocks run
        at high fill."""
        seek = s_cap == 0
        if c == st.shape[0]:
            # full-capacity call (frac-1.0 rounds, or the completion
            # sweep's pre-compacted sub-array): no selection, no row
            # movement
            ids = None
            row = st
        else:
            score = (st[:, AL] * (1.0 - st[:, ATC]) if seek
                     else st[:, AL] * (1.0 + st[:, ATC]))
            _, ids = jax.lax.top_k(score, c)
            row = st[ids]
        ro, rd = row[:, O], row[:, D]
        ts0, t2_r = row[:, TS], row[:, T2]
        cur = row[:, CU].astype(jnp.int32)
        op_r, de_r, rgb_r = row[:, OP], row[:, DE], row[:, RGB]
        alive_r = row[:, AL] > 0.5

        if seek:
            if stratum:
                cursor_new, atc, exhausted = march_seek_twolevel(
                    ro, rd, ts0, t2_r, cur, occ.coarse_nbr, cfg.scale,
                    rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
                    w_len, stratum, dir_norm=cfg.dir_norm)
            else:  # c_stratum (caller filters seeks out otherwise)
                cursor_new, atc, exhausted = march_seek_cascades(
                    ro, rd, ts0, t2_r, cur, occ.union_bits, cfg.scale,
                    rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
                    w_len, c_stratum, dt_scale=dt_scale)
            alive_s = alive_r & jnp.logical_not(exhausted) \
                & (cursor_new < k_total)
            new_row = jnp.concatenate([
                ro, rd, ts0[:, None], t2_r[:, None],
                cursor_new.astype(jnp.float32)[:, None], op_r[:, None],
                de_r[:, None], rgb_r, alive_s.astype(jnp.float32)[:, None],
                (atc & alive_s).astype(jnp.float32)[:, None]], axis=1)
            if ids is None:
                st = new_row
            else:
                st = st.at[ids].set(new_row)
            stat_row = jnp.stack([
                jnp.float32(c), alive_r.sum().astype(jnp.float32),
                jnp.float32(0), jnp.float32(0)])
            return st, vr_total, stat_row

        if stratum:  # gather-frugal two-level window (synthetic scenes)
            mr = march_rays_window_twolevel(
                ro, rd, ts0, t2_r, cur, occ.fine_nbr, occ.coarse_nbr,
                cfg.scale, rcfg.exp_step_factor, cfg.grid_size,
                rcfg.max_samples, w_len, s_cap, stratum,
                dir_norm=cfg.dir_norm)
        elif c_stratum:  # real scenes: union-grid strata window
            mr = march_rays_window_cascades(
                ro, rd, ts0, t2_r, cur, occ.density_bitfield,
                occ.union_bits, cfg.cascades, cfg.scale,
                rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
                w_len, s_cap, c_stratum, dt_scale=dt_scale)
        else:
            mr = march_rays_window(
                ro, rd, ts0, t2_r, cur, occ.density_bitfield, cfg.cascades,
                cfg.scale, rcfg.exp_step_factor, cfg.grid_size,
                rcfg.max_samples, w_len, s_cap, dt_scale=dt_scale)

        counts = jnp.where(alive_r, mr.n_samples, 0)
        if q_flat and q_flat < s_cap:
            # ---- flat round: field eval on c*q compacted samples ----
            b = c * int(q_flat)
            excl = jnp.cumsum(counts) - counts
            allowed = jnp.clip(b - excl, 0, counts)
            trunc = allowed < counts
            # truncated rays resume at the first DROPPED sample's rung
            k_resume = mr.k_idx[jnp.arange(c),
                                jnp.minimum(allowed, s_cap - 1)]
            cursor_new = jnp.where(trunc, k_resume, mr.cursor)
            exhausted = jnp.where(trunc, False, mr.exhausted)

            offs = (jnp.cumsum(allowed) - allowed).astype(jnp.int32)
            total = allowed.sum()
            marks = jnp.zeros((b,), jnp.int32).at[offs].add(
                1, mode="drop", indices_are_sorted=True)
            ray_id = jnp.cumsum(marks) - 1
            beg_f = jax.lax.cummax(
                jnp.where(marks > 0, jnp.arange(b, dtype=jnp.int32), 0))
            pos = jnp.arange(b, dtype=jnp.int32) - beg_f
            valid_f = jnp.arange(b) < total
            k_f = mr.k_idx.reshape(-1)[
                ray_id * s_cap + jnp.minimum(pos, s_cap - 1)]
            row_f = row[ray_id]                      # one (b, 16) gather
            ts_f = t_ladder(row_f[:, TS], k_f[:, None], rcfg.exp_step_factor,
                            rcfg.max_samples, cfg.grid_size, dt_scale)[:, 0]
            dt_f = calc_dt(ts_f, rcfg.exp_step_factor, rcfg.max_samples,
                           cfg.grid_size, dt_scale)
            ts_f = jnp.where(valid_f, ts_f, 0.0)
            d_f = row_f[:, D]
            xyz_f = row_f[:, O] + ts_f[:, None] * d_f
            sigmas, rgbs = model(params, xyz_f, d_f, exposure=exposure)

            op_s, dep_s, rgb_s, alive_s = composite_test_step_flat(
                sigmas, rgbs, dt_f, ts_f, valid_f, ray_id, offs,
                op_r, de_r, rgb_r, alive_r, rcfg.T_threshold,
                block=max(SEG_BLOCK, s_cap))
            emitted = allowed
        else:
            # ---- padded round: field eval on the full (c, s_cap) block ----
            cursor_new, exhausted = mr.cursor, mr.exhausted
            xyz_flat = mr.xyzs.reshape(c * s_cap, 3)
            dir_flat = jnp.broadcast_to(rd[:, None, :],
                                        (c, s_cap, 3)).reshape(-1, 3)
            sigmas, rgbs = _eval_field_padded(model, params, xyz_flat,
                                              dir_flat, rcfg.eval_chunk,
                                              exposure=exposure)
            sigmas = jnp.where(mr.mask.reshape(-1), sigmas,
                               0.0).reshape(c, s_cap)
            rgbs = rgbs.reshape(c, s_cap, 3)
            op_s, dep_s, rgb_s, alive_s = composite_test_step(
                sigmas, rgbs, mr.deltas, mr.ts, mr.mask,
                op_r, de_r, rgb_r, alive_r, rcfg.T_threshold)
            emitted = counts

        alive_s = alive_s & jnp.logical_not(exhausted) \
            & (cursor_new < k_total)
        vr_total = vr_total + emitted.sum()

        stat_row = jnp.stack([
            jnp.float32(c),
            alive_r.sum().astype(jnp.float32),
            emitted.sum().astype(jnp.float32),
            jnp.float32(c * int(q_flat) if q_flat and q_flat < s_cap
                        else c * s_cap),
        ])

        # a cursor stopped short of the window end means sampling was capped
        # at content (or an unexamined occupied stratum): flag for the next
        # content round's selection. Advisory only — correctness is the
        # sweep's job.
        atc_new = alive_s & (cursor_new < cur + w_len)
        new_row = jnp.concatenate([
            ro, rd, ts0[:, None], t2_r[:, None],
            cursor_new.astype(jnp.float32)[:, None], op_s[:, None],
            dep_s[:, None], rgb_s, alive_s.astype(jnp.float32)[:, None],
            atc_new.astype(jnp.float32)[:, None]], axis=1)
        if ids is None:
            st = new_row
        else:
            st = st.at[ids].set(new_row)
        return st, vr_total, stat_row

    for entry in schedule:
        frac, w_len, s_cap = entry[:3]
        q_flat = entry[3] if len(entry) > 3 else 0
        if s_cap == 0 and not (stratum or c_stratum):
            continue  # no coarse structure to seek through (plain fallback)
        st, vr_total, stat_row = run_round(
            st, vr_total, min(max(int(round(n * frac)), 1), n),
            min(w_len, k_total), s_cap, q_flat)
        if collect_stats:
            stats.append(stat_row)

    # ---- completion sweep: the static schedule above is tuned for
    # throughput and makes NO completion guarantee — on content-dense
    # frames its shrinking capacities starve the alive queue and rays end
    # half-composited (measured: 8 dB vs the 29.9 dB oracle on a
    # content-only 800x800 slice of a converged scene). Iterate
    # fixed-shape straggler rounds until no ray is alive; every processed
    # ray strictly advances its cursor, so <= ceil(n/c) * ceil(k_total/w)
    # iterations terminate. The zero-straggler case costs one top_k +
    # predicate per frame.
    def run_sweep(st, vr_total, stage, stop_at):
        """Drive alive rays down to ``stop_at`` with fixed-shape rounds of
        ``stage`` = (capacity, window, cap). Select ONCE per outer
        iteration: no ray returns to life after the static rounds, so the
        chosen sub-array can be driven to completion without re-paying
        top_k over the frame + full-row gather/scatter (~3 ms/iteration at
        640k rays) every window. The inner loop keeps a STALE alive count
        for the un-selected remainder (= total - selected-at-entry), so its
        exit test only fires when the selected rows are done; the outer
        loop re-selects while more than max(stop_at, 0) rays remain."""
        c_s, w_s, cap_s = stage
        c_s = min(c_s, n)
        w_s = min(w_s, k_total)

        def sweep_cond(carry):
            st, vr_total, it = carry
            return (jnp.sum(st[:, AL]) > stop_at) \
                & (it < rcfg.straggler_max_iters)

        def sweep_body(carry):
            st, vr_total, it = carry
            _, ids = jax.lax.top_k(st[:, AL], c_s)
            rows = st[ids]

            def inner_cond(carry2):
                rows, vr, it2 = carry2
                return (jnp.sum(rows[:, AL]) > 0) \
                    & (it2 < rcfg.straggler_max_iters)

            def inner_body(carry2):
                rows, vr, it2 = carry2
                rows, vr, _ = run_round(rows, vr, c_s, w_s, cap_s, 0)
                return rows, vr, it2 + 1

            rows, vr_total, it = jax.lax.while_loop(
                inner_cond, inner_body, (rows, vr_total, it))
            st = st.at[ids].set(rows)
            return st, vr_total, it + 1

        st, vr_total, _ = jax.lax.while_loop(
            sweep_cond, sweep_body, (st, vr_total, jnp.int32(0)))
        return st, vr_total

    if rcfg.straggler2 is not None:
        # two-stage: the main sweep hands the tail (<= stage-2 capacity
        # alive rays) to a smaller-shape stage — late iterations of a big
        # sweep otherwise field-eval a mostly-dead padded block
        st, vr_total = run_sweep(st, vr_total, rcfg.straggler,
                                 jnp.int32(min(rcfg.straggler2[0], n)))
        st, vr_total = run_sweep(st, vr_total, rcfg.straggler2, jnp.int32(0))
    else:
        st, vr_total = run_sweep(st, vr_total, rcfg.straggler, jnp.int32(0))

    rgb = st[:, RGB]
    opacity = st[:, OP]
    depth = st[:, DE]
    if collect_stats:
        return rgb, opacity, depth, vr_total, jnp.stack(stats)
    return rgb, opacity, depth, vr_total


@partial(jax.jit, static_argnums=(0, 5))
def _render_test_wavefront(model, params, occ, rays_o, rays_d,
                           rcfg: RenderConfig, t_near=None, t_far=None,
                           exposure=None):
    """Persistent-pool ("wavefront") test renderer — one while_loop.

    The round-schedule renderer's per-round machinery (top_k + packed-row
    gather/scatter) runs at FRAME scale: ~17.5 ms per round at 640k rays
    (docs/TPU_NOTES.md), a floor no schedule tuning can cross. This
    formulation is the XLA analogue of a GPU persistent-megakernel ray
    queue: a compacted pool of P rows marches/evaluates/composites every
    iteration, finished rows scatter their pixel and REFILL from the
    frame's ray queue via prefix-sum ranks — so selection and state
    movement cost O(P), not O(n), and the padded field eval runs at pool
    fill. Completion is structural: the loop exits when the queue is
    drained and no pool row is alive (every alive row strictly advances
    its cursor per iteration, so progress is guaranteed; a static
    iteration bound backstops it). Output is oracle-exact — same ladder,
    same T-threshold semantics, no capacity starvation possible.

    rcfg.wavefront = (P, seek_window, window, cap):
        P           pool rows (clamped to the ray count). May be a TUPLE of
                    descending sizes (P0, P1, ...): a pool-size CASCADE.
                    The r3 pool sweep found one static size trades off two
                    regimes — big pools amortize the per-iteration machinery
                    (the while-loop body's fixed fusion overhead dominates at
                    P=2048: ~0.5 ms/iteration for ~31k emissions) but pay
                    mostly-dead padded field evals once the queue drains and
                    only stragglers remain (64k pool: 1.48 vs 2k: 2.74 fps).
                    The cascade runs stage i's loop until the queue is
                    drained AND <= P_{i+1} rows are alive, then compacts the
                    alive rows into the next (smaller) pool — big-pool
                    amortization for the bulk, small-pool fill for the tail.
        seek_window field-free coarse-seek rungs per iteration (0 skips
                    the seek phase; ignored without a coarse structure)
        window      content-march rungs per iteration
        cap         per-row sample cap per iteration (pool x cap slots)
    """
    cfg = model.cfg
    n = rays_o.shape[0]
    hits_t = ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.scale))
    hits_t = _clamp_near(hits_t)
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    valid = t1 >= 0
    t_start = jnp.where(valid, t1, 0.0)
    t2 = jnp.where(valid, t2, -1.0)
    k_total = rcfg.n_rungs(cfg.scale, cfg.grid_size, test=True)
    dt_scale = rcfg._dt_scale(cfg.scale, True)

    cursor0 = jnp.zeros((n,), jnp.float32)
    if t_near is not None and rcfg.exp_step_factor == 0:
        dt_min = SQRT3 / rcfg.max_samples
        cursor0 = jnp.clip(jnp.ceil((t_near - t_start) / dt_min), 0, k_total)
        t2 = jnp.minimum(t2, t_far)
        valid = valid & (t_near < t2)

    stratum, _ = twolevel_stratum(rcfg.exp_step_factor, rcfg.max_samples,
                                  cfg.scale, cfg.grid_size, cfg.cascades,
                                  cfg.dir_norm)
    c_stratum, _ = cascades_stratum(rcfg.exp_step_factor, cfg.scale,
                                    cfg.cascades, dir_norm=cfg.dir_norm)

    wf = tuple(rcfg.wavefront)
    P, w_seek, w_len, s_cap = wf[:4]
    # optional 5th element: strata budget per march window. The march
    # default (ceil(2*cap/stratum), >= 2) turned out to BIND emissions at
    # converged occupancy: ~2 strata x sparse fine occupancy emit ~6 of 16
    # cap slots per iteration (fill 0.40 measured r5), so row-iterations —
    # not window length — set the frame cost. A larger budget lets each
    # iteration fill its cap from more strata.
    s_strata = wf[4] if len(wf) > 4 else None
    pools = P if isinstance(P, tuple) else (P,)
    # clamp to the ray count and keep strictly descending (a stage equal to
    # or larger than its predecessor can never be entered)
    desc = []
    for p in pools:
        p = min(int(p), n)
        if not desc or p < desc[-1]:
            desc.append(p)
    pools = tuple(desc)
    P = pools[0]
    w_seek = min(w_seek, k_total) if (stratum or c_stratum) else 0
    w_len = min(w_len, k_total)

    # queue: valid rays first (top_k on the flags is stable, so queue order
    # is image order within each class); invalid rays never enter the pool
    _, qids = jax.lax.top_k(valid.astype(jnp.float32), n)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # one packed queue row per ray: o(3) d(3) ts t2 cur0 -> one row gather
    # per refill moves everything a fresh pool row needs
    queue = jnp.concatenate([
        rays_o, rays_d, t_start[:, None], t2[:, None], cursor0[:, None]],
        axis=1)[qids]

    # pool rows: the alive renderer's packed state + the ray's pixel id
    O, D, TS, T2, CU, OP, DE = slice(0, 3), slice(3, 6), 6, 7, 8, 9, 10
    RGB, AL, PIX = slice(11, 14), 14, 15

    def fresh_rows(idx_q, take):
        """Pool rows for queue positions idx_q; ``take`` masks real slots
        (False rows come back dead with an out-of-range pixel id)."""
        qrow = queue[jnp.clip(idx_q, 0, n - 1)]
        pix = jnp.where(take, qids[jnp.clip(idx_q, 0, n - 1)], n)
        alive = take  # queue holds only valid rays in [0, n_valid)
        z = jnp.zeros((idx_q.shape[0],), jnp.float32)
        return jnp.concatenate([
            qrow,                                       # o, d, ts, t2, cur
            z[:, None], z[:, None], jnp.zeros((idx_q.shape[0], 3)),
            alive.astype(jnp.float32)[:, None],
            pix.astype(jnp.float32)[:, None]], axis=1)

    pool0 = fresh_rows(jnp.arange(P, dtype=jnp.int32),
                       jnp.arange(P) < n_valid)
    # seed the output/counter carries from ray data: under shard_map the
    # while_loop requires the initial carry to share the body outputs'
    # varying ('data') manual axes — a constant zeros() does not
    veil = rays_o[0, 0] * 0.0
    out0 = jnp.zeros((n, 5), jnp.float32) + veil  # rgb, opacity, depth
    vr0 = veil.astype(jnp.int32)
    q0 = jnp.minimum(jnp.int32(P), n_valid)

    def body(carry):
        pool, out, q, vr, it = carry
        P = pool.shape[0]
        ro, rd = pool[:, O], pool[:, D]
        ts0, t2_r = pool[:, TS], pool[:, T2]
        cur = pool[:, CU].astype(jnp.int32)
        alive_r = pool[:, AL] > 0.5

        if w_seek:
            # field-free empty-space seek (idempotent at content)
            if stratum:
                cur_s, _, exh_s = march_seek_twolevel(
                    ro, rd, ts0, t2_r, cur, occ.coarse_nbr, cfg.scale,
                    rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
                    w_seek, stratum, dir_norm=cfg.dir_norm)
            else:
                cur_s, _, exh_s = march_seek_cascades(
                    ro, rd, ts0, t2_r, cur, occ.union_bits, cfg.scale,
                    rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
                    w_seek, c_stratum, dt_scale=dt_scale)
            cur = jnp.where(alive_r, cur_s, cur)
            alive_r = alive_r & jnp.logical_not(exh_s) & (cur < k_total)

        if stratum:
            mr = march_rays_window_twolevel(
                ro, rd, ts0, t2_r, cur, occ.fine_nbr, occ.coarse_nbr,
                cfg.scale, rcfg.exp_step_factor, cfg.grid_size,
                rcfg.max_samples, w_len, s_cap, stratum,
                s_strata=s_strata, dir_norm=cfg.dir_norm)
        elif c_stratum:
            mr = march_rays_window_cascades(
                ro, rd, ts0, t2_r, cur, occ.density_bitfield,
                occ.union_bits, cfg.cascades, cfg.scale,
                rcfg.exp_step_factor, cfg.grid_size, rcfg.max_samples,
                w_len, s_cap, c_stratum, s_strata=s_strata,
                dt_scale=dt_scale)
        else:
            mr = march_rays_window(
                ro, rd, ts0, t2_r, cur, occ.density_bitfield, cfg.cascades,
                cfg.scale, rcfg.exp_step_factor, cfg.grid_size,
                rcfg.max_samples, w_len, s_cap, dt_scale=dt_scale)

        xyz_flat = mr.xyzs.reshape(P * s_cap, 3)
        dir_flat = jnp.broadcast_to(rd[:, None, :],
                                    (P, s_cap, 3)).reshape(-1, 3)
        sigmas, rgbs = _eval_field_padded(model, params, xyz_flat, dir_flat,
                                          rcfg.eval_chunk, exposure=exposure)
        sigmas = jnp.where(mr.mask.reshape(-1), sigmas, 0.0).reshape(P, s_cap)
        rgbs = rgbs.reshape(P, s_cap, 3)
        op_s, dep_s, rgb_s, alive_s = composite_test_step(
            sigmas, rgbs, mr.deltas, mr.ts, mr.mask,
            pool[:, OP], pool[:, DE], pool[:, RGB], alive_r,
            rcfg.T_threshold)
        alive_s = alive_s & jnp.logical_not(mr.exhausted) \
            & (mr.cursor < k_total)
        vr = vr + jnp.sum(jnp.where(alive_r, mr.n_samples, 0))

        # every row scatters its (rgb, opacity, depth) to its pixel each
        # iteration: retired rows freeze their final value, live rows are
        # overwritten later — idempotent, no per-row retirement bookkeeping.
        # Hole/padding rows carry pix == n and drop.
        pix = pool[:, PIX].astype(jnp.int32)
        out = out.at[pix].set(
            jnp.concatenate([rgb_s, op_s[:, None], dep_s[:, None]], axis=1),
            mode="drop")

        # refill dead slots from the queue via prefix-sum ranks
        dead = jnp.logical_not(alive_s)
        rank = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        idx_q = q + rank
        take = dead & (idx_q < n_valid)
        fresh = fresh_rows(idx_q, take)
        upd = jnp.concatenate([
            ro, rd, ts0[:, None], t2_r[:, None],
            mr.cursor.astype(jnp.float32)[:, None], op_s[:, None],
            dep_s[:, None], rgb_s, alive_s.astype(jnp.float32)[:, None],
            pool[:, PIX][:, None]], axis=1)
        pool = jnp.where(take[:, None], fresh, upd)
        q = q + jnp.sum(take.astype(jnp.int32))
        return pool, out, q, vr, it + 1

    # pool-size cascade: stage i runs until the queue is drained and at
    # most the NEXT stage's pool of rays is still alive, then the alive
    # rows compact (stable top_k) into the smaller pool. The final stage's
    # exit (next_p = 0) is completion itself.
    carry = (pool0, out0, q0, vr0, jnp.int32(0))
    for si, p_stage in enumerate(pools):
        next_p = pools[si + 1] if si + 1 < len(pools) else 0

        def cond(carry, next_p=next_p):
            pool, out, q, vr, it = carry
            return ((jnp.sum(pool[:, AL]) > next_p) | (q < n_valid)) \
                & (it < rcfg.wavefront_max_iters)

        if si:
            pool, out, q, vr, it = carry
            _, keep = jax.lax.top_k(pool[:, AL], p_stage)
            carry = (pool[keep], out, q, vr, it)
        carry = jax.lax.while_loop(cond, body, carry)
    pool, out, q, vr_total, it_total = carry
    if rcfg.wavefront_stats:
        return (out[:, :3], out[:, 3], out[:, 4], vr_total, it_total,
                n_valid)
    return out[:, :3], out[:, 3], out[:, 4], vr_total


@partial(jax.jit, static_argnums=(4, 5, 6))
def _guided_ranges(depth_lo, opacity_lo, t_near, t_far, img_wh, stride,
                   margin):
    """Per-PIXEL [t_near, t_far] from a low-res depth/opacity render.

    A low-res pixel is trusted iff its whole 3x3 neighborhood composited
    to (near-)full opacity — there the surface is locally smooth and
    opaque, and every full-res ray inside the block must hit it within the
    neighborhood's [min, max] depth span (padded by ``margin``). Everywhere
    else (silhouettes, semi-transparency, background) the rasterized block
    ranges are kept, so thin/edge content still gets the conservative
    treatment. This is the TPU answer to "most pixels are interior pixels":
    one cheap 1/stride^2-res frame converts them to 1-round rays.
    """
    w, h = img_wh
    wl, hl = w // stride, h // stride
    d = depth_lo.reshape(hl, wl)
    ok = (opacity_lo.reshape(hl, wl) > 0.995)

    big = jnp.float32(3.4e38)
    dmin = jnp.where(ok, d, big)
    dmax = jnp.where(ok, d, -big)
    allv = ok
    mn, mx = dmin, dmax
    for ax in (0, 1):
        mn = jnp.minimum(mn, jnp.minimum(
            jnp.roll(mn, 1, ax), jnp.roll(mn, -1, ax)))
        mx = jnp.maximum(mx, jnp.maximum(
            jnp.roll(mx, 1, ax), jnp.roll(mx, -1, ax)))
        allv = allv & jnp.roll(allv, 1, ax) & jnp.roll(allv, -1, ax)
    # image-edge lo pixels wrap via roll: invalidate them (fallback there)
    allv = allv.at[0, :].set(False).at[-1, :].set(False) \
        .at[:, 0].set(False).at[:, -1].set(False)

    def up(a):
        # expand lo cells; edge-pad the sub-stride remainder rows/cols (the
        # border lo pixels are invalidated above, so padded pixels fall
        # back to the block ranges — conservative)
        a = jnp.repeat(jnp.repeat(a, stride, 0), stride, 1)
        return jnp.pad(a, ((0, h - hl * stride), (0, w - wl * stride)),
                       mode="edge")[:h, :w].reshape(-1)
    allv_px = up(allv)
    near_g = jnp.maximum(up(mn) - margin, t_near)
    far_g = jnp.minimum(up(mx) + margin, t_far)
    return (jnp.where(allv_px, near_g, t_near),
            jnp.where(allv_px, far_g, t_far))


@partial(jax.jit, static_argnums=(0, 3, 8, 9))
def _render_frame(model, params, occ, rcfg: RenderConfig, rays_o, rays_d,
                  k_cam, pose, img_wh, guided, exposure=None):
    """ONE-dispatch frame: rasterized prepass (+ optional guided low-res
    depth pass) + the multi-round alive renderer, fused into a single jit
    so a frame costs one tunnel round trip and XLA can overlap the
    stages. See render_test for semantics."""
    t_near, t_far = rasterize_block_ranges(
        model.cfg, occ.density_bitfield, k_cam, pose, img_wh)
    vr_lo = jnp.int32(0)
    if guided:
        w, h = img_wh
        s = rcfg.guided_stride
        xx = jnp.arange(w // s) * s + s // 2
        yy = jnp.arange(h // s) * s + s // 2
        idx = (yy[:, None] * w + xx[None, :]).reshape(-1)
        _, op_lo, de_lo, vr_lo = _render_test_alive(
            model, params, occ, rays_o[idx], rays_d[idx], rcfg,
            t_near[idx], t_far[idx], exposure=exposure)
        margin = rcfg.guided_margin_cells * 2.0 * model.cfg.scale \
            / model.cfg.grid_size
        t_near, t_far = _guided_ranges(de_lo, op_lo, t_near, t_far,
                                       (w, h), s, margin)
        rcfg = dataclasses.replace(rcfg, rounds=rcfg.rounds_guided)
    render = (_render_test_wavefront if rcfg.wavefront is not None
              else _render_test_alive)
    rgb, opacity, depth, vr = render(
        model, params, occ, rays_o, rays_d, rcfg, t_near, t_far,
        exposure=exposure)
    return rgb, opacity, depth, vr + vr_lo


@partial(jax.jit, static_argnums=(0, 3, 7))
def _render_frames_batch(model, params, occ, rcfg: RenderConfig,
                         rays_o, rays_d, k_cams, img_wh, poses):
    """MULTI-frame wavefront dispatch: F frames share ONE persistent pool.

    The wavefront renderer's tail is its weak regime — once a frame's ray
    queue drains, the pool pads its last iterations with dead rows, so a
    pool big enough to amortize the per-iteration machinery (~0.5 ms of
    fixed fusion overhead at P=2048, docs/TPU_NOTES.md round 4) starves at
    the tail and loses the amortization to padding. Batching F frames
    through one queue makes the tail a per-BATCH cost instead of
    per-frame: the pool refills from frame i+1's rays the moment frame
    i's queue drains (rows are frame-agnostic — each carries its global
    pixel id into the concatenated output), so big-pool iterations stay
    full for ~F times longer. This is the TPU analogue of the reference
    GUI's frames-in-flight pipelining (its CUDA queue never goes idle
    between frames), fused into one XLA dispatch.

    Args:
        rays_o, rays_d: (F, n, 3) per-frame rays.
        k_cams: (F, 3, 3) intrinsics; poses: (F, 3, 4) c2w.
        img_wh: static (w, h) shared by the batch.
    Returns:
        (rgb (F, n, 3), opacity (F, n), depth (F, n), vr_total) — before
        background blending (the caller blends, as in render_test).
    """
    f, n = rays_o.shape[:2]
    # per-frame rasterized prepass (a few ms each, replicated machinery):
    # vmap shares one compiled splat across the batch
    t_near, t_far = jax.vmap(
        lambda k, p: rasterize_block_ranges(
            model.cfg, occ.density_bitfield, k, p, img_wh))(k_cams, poses)
    rgb, opacity, depth, vr = _render_test_wavefront(
        model, params, occ, rays_o.reshape(f * n, 3),
        rays_d.reshape(f * n, 3), rcfg,
        t_near.reshape(-1), t_far.reshape(-1))
    return (rgb.reshape(f, n, 3), opacity.reshape(f, n),
            depth.reshape(f, n), vr)


def render_test_frames(model, params, occ, frames, rcfg: RenderConfig):
    """Render F frames through ONE wavefront queue (see
    _render_frames_batch). ``frames`` is a list of (rays_o, rays_d,
    (K, pose, img_wh)) tuples sharing a resolution; single-cascade
    synthetic scenes only (the prepass + wavefront requirements of
    render_test's camera path). Returns a list of per-frame dicts matching
    render_test's output."""
    assert rcfg.wavefront is not None and rcfg.exp_step_factor == 0 \
        and model.cfg.cascades == 1
    rays_o = jnp.stack([fr[0] for fr in frames])
    rays_d = jnp.stack([fr[1] for fr in frames])
    k_cams = jnp.stack([jnp.asarray(fr[2][0], jnp.float32)
                        for fr in frames])
    poses = jnp.stack([jnp.asarray(fr[2][1], jnp.float32)[:3, :4]
                       for fr in frames])
    img_wh = (int(frames[0][2][2][0]), int(frames[0][2][2][1]))
    rgb, opacity, depth, vr = _render_frames_batch(
        model, params, occ, rcfg, rays_o, rays_d, k_cams, img_wh, poses)
    rgb = rgb + jnp.ones(3) * (1.0 - opacity)[..., None]  # synthetic: white
    return [{"rgb": rgb[i], "opacity": opacity[i], "depth": depth[i],
             "total_samples": vr} for i in range(len(frames))]


def render_test(model, params, occ, rays_o, rays_d, rcfg: RenderConfig,
                camera=None, guided=False, exposure=None):
    """Full-image test rendering via the multi-round alive-ray renderer.

    Parity target: __render_rays_test (rendering.py:46-118). Background
    blending matches reference rendering.py:112-116. When ``camera``
    (K, c2w pose, img_wh) is given and the scene is single-cascade
    synthetic, a per-frame rasterization of occupied cells bounds each
    pixel block's [t_near, t_far] so rays skip empty space without
    occupancy gathers (see rasterize_block_ranges). ``guided=True`` adds a
    1/stride^2-resolution depth pre-pass whose composited depth tightens
    the per-pixel ranges on smooth opaque regions (see _guided_ranges) —
    an approximation (thin sub-stride occluders in front of a locally
    opaque surface can be missed) bounded by the opacity/neighborhood
    gates; silhouettes and background keep the conservative block ranges.
    With ``camera`` the whole frame (prepass + guided pass + all rounds)
    is ONE jitted dispatch (_render_frame).

    ``exposure``: optional per-image exposure scalar for HDR-NeRF models
    (rgb_act == 'None'), forwarded to every field evaluation — the
    inference half of the reference's exposure path (train.py:102-103,
    show_gui.py:86). Ignored by Sigmoid-head models.
    """
    if exposure is not None:
        exposure = jnp.asarray(exposure, jnp.float32).reshape(1, 1)
    if (camera is not None and rcfg.exp_step_factor == 0
            and model.cfg.cascades == 1):
        k_cam, pose, img_wh = camera
        rgb, opacity, depth, vr_total = _render_frame(
            model, params, occ, rcfg, rays_o, rays_d,
            jnp.asarray(k_cam, jnp.float32),
            jnp.asarray(pose, jnp.float32)[:3, :4],
            (int(img_wh[0]), int(img_wh[1])), bool(guided),
            exposure=exposure)
    else:
        render = (_render_test_wavefront if rcfg.wavefront is not None
                  else _render_test_alive)
        rgb, opacity, depth, vr_total = render(
            model, params, occ, rays_o, rays_d, rcfg, None, None,
            exposure=exposure)
    if rcfg.exp_step_factor == 0:  # synthetic: white bg; real: black bg
        rgb_bg = jnp.ones(3)
    else:
        rgb_bg = jnp.zeros(3)
    rgb = rgb + rgb_bg * (1.0 - opacity)[:, None]
    # total_samples stays a device scalar: converting here would force a
    # sync per frame and defeat pipelined (multi-frame in flight) rendering
    return {"rgb": rgb, "opacity": opacity, "depth": depth,
            "total_samples": vr_total}


@functools.lru_cache(maxsize=None)
def _sharded_render_fn(model, rcfg: RenderConfig, mesh, img_wh,
                       use_prepass, has_exposure):
    """Build (and cache) the jitted shard_map'd frame renderer for a
    (model, rcfg, mesh, resolution) combination."""
    from jax.sharding import PartitionSpec as P
    pd, pr = P("data"), P()

    render = (_render_test_wavefront if rcfg.wavefront is not None
              else _render_test_alive)

    def local(params, occ, ro, rd, tn, tf, exposure):
        rgb, op, de, vr = render(
            model, params, occ, ro, rd, rcfg,
            tn if use_prepass else None, tf if use_prepass else None,
            exposure=exposure if has_exposure else None)
        return rgb, op, de, vr.reshape(1)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(pr, pr, pd, pd, pd if use_prepass else pr,
                  pd if use_prepass else pr, pr),
        out_specs=(pd, pd, pd, pd))

    @jax.jit
    def fn(params, occ, rays_o, rays_d, k_cam, pose, exposure):
        if use_prepass:
            # per-frame, not per-ray: run once, replicated, outside the
            # shard_map; the resulting per-pixel ranges shard with the rays
            t_near, t_far = rasterize_block_ranges(
                model.cfg, occ.density_bitfield, k_cam, pose, img_wh)
        else:
            # _render_test_alive gets None ranges ("march from the AABB
            # entry"); shard_map still needs array operands, so thread
            # replicated dummies that ``local`` drops
            t_near = t_far = jnp.zeros((1,), jnp.float32)
        rgb, op, de, vr = smapped(params, occ, rays_o, rays_d,
                                  t_near, t_far, exposure)
        return rgb, op, de, vr.sum()

    return fn


def render_test_sharded(model, params, occ, rays_o, rays_d,
                        rcfg: RenderConfig, mesh, camera=None,
                        exposure=None):
    """Multi-device test rendering: DP over the mesh's ``data`` axis.

    Rendering is embarrassingly parallel over rays, so each device drains
    its ray shard with the full single-device alive-ray pipeline
    (_render_test_alive) locally — top_k compaction, completion sweep and
    field evals all stay shard-local and NO collective runs in the hot
    path; params and occupancy are replicated (same layout as DP
    training, parallel/mesh.py). The rasterized prepass runs once,
    replicated, outside the shard_map — it is per-frame, not per-ray.

    This exceeds reference parity (test rendering there is single-GPU,
    SURVEY §2.4): an N-chip mesh serves N× the frame rate or N× the
    resolution at the single-chip latency. Output matches render_test up
    to float tolerance (both are oracle-exact; only the top_k round
    grouping differs). Rays are zero-padded to a multiple of the mesh
    size and the padding is sliced off before returning.
    """
    ndev = int(np.prod(list(mesh.shape.values())))
    n = rays_o.shape[0]
    pad = (-n) % ndev
    if pad:
        rays_o = jnp.concatenate(
            [rays_o, jnp.zeros((pad, 3), rays_o.dtype)])
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], rays_d.dtype), (pad, 3))])
    use_prepass = (camera is not None and rcfg.exp_step_factor == 0
                   and model.cfg.cascades == 1 and pad == 0)
    if camera is not None:
        k_cam, pose, img_wh = camera
        k_cam = jnp.asarray(k_cam, jnp.float32)
        pose = jnp.asarray(pose, jnp.float32)[:3, :4]
        img_wh = (int(img_wh[0]), int(img_wh[1]))
    else:
        k_cam = pose = jnp.zeros((3, 4), jnp.float32)
        img_wh = (0, 0)
    has_exposure = exposure is not None
    if has_exposure:
        exposure = jnp.asarray(exposure, jnp.float32).reshape(1, 1)
    else:
        exposure = jnp.zeros((1, 1), jnp.float32)
    fn = _sharded_render_fn(model, rcfg, mesh, img_wh if use_prepass
                            else (0, 0), use_prepass, has_exposure)
    rgb, opacity, depth, vr_total = fn(params, occ, rays_o, rays_d,
                                       k_cam, pose, exposure)
    if pad:
        rgb, opacity, depth = rgb[:-pad], opacity[:-pad], depth[:-pad]
    if rcfg.exp_step_factor == 0:  # synthetic: white bg; real: black bg
        rgb_bg = jnp.ones(3)
    else:
        rgb_bg = jnp.zeros(3)
    rgb = rgb + rgb_bg * (1.0 - opacity)[:, None]
    return {"rgb": rgb, "opacity": opacity, "depth": depth,
            "total_samples": vr_total}


def render_test_dense(model, params, occ, rays_o, rays_d,
                      rcfg: RenderConfig, exposure=None):
    """Single-pass dense test rendering, chunked to bound memory.

    Kept as the oracle for the alive-ray renderer (same ladder, same
    T-threshold semantics, no round/capacity effects) and as a fallback.
    """
    if exposure is not None:
        exposure = jnp.asarray(exposure, jnp.float32).reshape(1, 1)
    n_rays = rays_o.shape[0]
    chunk = rcfg.test_chunk
    outs = []
    total_samples = 0
    for i in range(0, n_rays, chunk):
        ro, rd = rays_o[i:i + chunk], rays_d[i:i + chunk]
        pad = 0
        if ro.shape[0] < chunk:
            pad = chunk - ro.shape[0]
            ro = jnp.pad(ro, ((0, pad), (0, 0)))
            rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
        rgb, opacity, depth, vr = _render_test_chunk(
            model, params, occ, ro, rd, rcfg, exposure=exposure)
        if pad:
            rgb, opacity, depth = rgb[:-pad], opacity[:-pad], depth[:-pad]
        outs.append((rgb, opacity, depth))
        total_samples += int(vr)

    rgb = jnp.concatenate([o[0] for o in outs])
    opacity = jnp.concatenate([o[1] for o in outs])
    depth = jnp.concatenate([o[2] for o in outs])

    if rcfg.exp_step_factor == 0:  # synthetic: white bg; real: black bg
        rgb_bg = jnp.ones(3)
    else:
        rgb_bg = jnp.zeros(3)
    rgb = rgb + rgb_bg * (1.0 - opacity)[:, None]
    return {"rgb": rgb, "opacity": opacity, "depth": depth,
            "total_samples": total_samples}
