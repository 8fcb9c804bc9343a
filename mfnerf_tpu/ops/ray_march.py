"""Occupancy-grid ray marching as fixed-shape XLA ops (no atomics, no DDA).

TPU-native replacement for the reference CUDA kernels ``raymarching_train``
(models/csrc/raymarching.cu:166-332) and ``raymarching_test`` (:335-454).

Reformulation (see ops/stepping.py): the reference advances ``t`` through the
same ``t += calc_dt(t)`` recurrence whether a rung is occupied (emit sample)
or empty (skip), so each ray visits a deterministic closed-form "t-ladder".
Marching therefore becomes:

1. evaluate the ladder at K static rungs (closed form, vectorized);
2. test the occupancy bitfield at every rung (one byte-gather per rung);
3. compact the first <=S occupied rungs per ray into a padded (N, S) buffer
   via cumsum + batched binary search (replacing the CUDA two-pass
   count-then-write with atomic slot assignment, raymarching.cu:200-279).

Unlike the reference, output ray order is deterministic and there is no
``rays_a`` CSR bookkeeping: samples stay in per-ray rows with a validity mask.

Bug-compatibility note: the reference test kernel passes ``cascades`` where
``calc_dt`` expects ``scale`` (raymarching.cu:370,399 — an upstream ngp_pl
quirk), so the test-time dt clamp differs from train. We reproduce this via
the ``dt_scale`` argument to preserve sampling parity.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .morton import bitfield_lookup, morton3d, neighborhood_lookup
from .stepping import SQRT3, calc_dt, mip_from_dt, mip_from_pos, t_ladder


class MarchResults(NamedTuple):
    xyzs: jnp.ndarray     # (N, S, 3) sample positions
    dirs: jnp.ndarray     # (N, 3) ray directions (shared by row samples)
    deltas: jnp.ndarray   # (N, S) integration steps
    ts: jnp.ndarray       # (N, S) sample distances
    mask: jnp.ndarray     # (N, S) bool sample validity
    n_samples: jnp.ndarray  # (N,) int32 valid samples per ray (<= S)
    rm_samples: jnp.ndarray  # () int32 total marched samples (train/rm_s log)
    k_idx: jnp.ndarray = None    # (N, S) int32 ladder rung of each sample
    t_start: jnp.ndarray = None  # (N,) jittered ladder origin (t at rung 0)


def compact_rung_indices_at(csum, queries, chunk=128):
    """Like :func:`compact_rung_indices` but with per-row query ranks.

    queries: (N, S) int32 1-based ranks; returns (N, S) first k with
    ``csum[n, k] == queries[n, s]`` (i.e. #{k: csum[n,k] < q}).
    """
    n, k_total = csum.shape
    out = jnp.zeros(queries.shape, jnp.int32)
    for k0 in range(0, k_total, chunk):
        blk = csum[:, k0:k0 + chunk]
        out = out + (blk[:, :, None] < queries[:, None, :]).sum(
            axis=1, dtype=jnp.int32)
    return out


def compact_rung_indices(csum, s_max, chunk=128):
    """Rung index of the s-th occupied sample from the per-row cumsum.

    ``k_idx[n, s] = #{k : csum[n, k] <= s}`` — the first k with
    ``csum[k] == s+1`` in a monotone row. Equivalent to
    ``searchsorted(csum[n], s+1, side='left')`` but expressed as a chunked
    broadcast-compare reduction: vmapped searchsorted lowers to per-element
    binary-search loops of dynamic gathers on TPU (catastrophically slow),
    while this is a pure VPU compare+reduce stream.

    Args:
        csum: (N, K) int32 monotone per row.
        s_max: static sample budget S.
        chunk: K-chunk size bounding the fused (N, chunk, S) intermediate.
    Returns:
        (N, S) int32 indices in [0, K] (== K when fewer samples exist; the
        caller clamps and masks).
    """
    n, k_total = csum.shape
    s_range = jnp.arange(s_max, dtype=jnp.int32)[None, None, :]
    out = jnp.zeros((n, s_max), jnp.int32)
    for k0 in range(0, k_total, chunk):
        blk = csum[:, k0:k0 + chunk]
        out = out + (blk[:, :, None] <= s_range).sum(
            axis=1, dtype=jnp.int32)
    return out


def _occupancy_at(xyz, dt, density_bitfield, cascades, scale, grid_size):
    """Occupancy of the (mip-selected) grid cell containing each position.

    Parity: the cell-selection block of raymarching.cu:205-220.
    """
    mip = jnp.maximum(mip_from_pos(xyz, cascades),
                      mip_from_dt(dt, grid_size, cascades))
    mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0), scale)
    nxyz = jnp.clip(
        0.5 * (xyz / mip_bound[..., None] + 1.0) * grid_size,
        0.0, grid_size - 1.0).astype(jnp.int32)
    idx = mip.astype(jnp.uint32) * jnp.uint32(grid_size ** 3) + morton3d(nxyz)
    return bitfield_lookup(density_bitfield, idx.astype(jnp.int32))


def march_rays_train(rays_o, rays_d, hits_t, density_bitfield, cascades,
                     scale, exp_step_factor, grid_size, max_samples, noise,
                     n_rungs, s_max, dt_scale=None,
                     rank_start=0) -> MarchResults:
    """March training rays through the occupancy grid.

    Args:
        rays_o, rays_d: (N, 3) rays (directions normalized).
        hits_t: (N, 2) scene-AABB entry/exit distances (-1 if miss), with
            t_near already clamped to NEAR_DISTANCE by the caller
            (reference rendering.py:29).
        density_bitfield: (C*G^3//8,) uint8 occupancy bits.
        cascades, scale, exp_step_factor, grid_size, max_samples: see the
            reference kernel; max_samples is MAX_SAMPLES=1024.
        noise: (N,) U[0,1) start jitter (reference custom_functions.py:83).
        n_rungs: static K — ladder length; use
            :func:`mfnerf_tpu.ops.stepping.max_ladder_steps`.
        s_max: static S — per-ray sample-buffer width.
        dt_scale: value fed to calc_dt as "scale" (defaults to ``scale``;
            test marching passes ``cascades`` for bug parity, see module doc).
        rank_start: static rank offset — return each ray's occupied samples
            ranked rank_start+1 .. rank_start+s_max instead of the first
            s_max. ceil(max_samples/s_max) such windows cover EVERY sample
            the MAX_SAMPLES cap admits: the dense oracle's resume mechanism
            (rendering.py _render_test_chunk), replacing its former silent
            256-sample truncation.

    Returns:
        :class:`MarchResults` with padded (N, S) sample rows.
    """
    if dt_scale is None:
        dt_scale = scale
    n = rays_o.shape[0]
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    valid_ray = t1 >= 0

    # jitter the starting t (only the first step; raymarching.cu:195-198)
    dt0 = calc_dt(t1, exp_step_factor, max_samples, grid_size, dt_scale)
    t_start = jnp.where(valid_ray, t1 + dt0 * noise, 0.0)

    ks = jnp.arange(n_rungs, dtype=jnp.int32)
    ts_all = t_ladder(t_start, ks, exp_step_factor, max_samples, grid_size,
                      dt_scale)                                   # (N, K)
    dt_all = calc_dt(ts_all, exp_step_factor, max_samples, grid_size,
                     dt_scale)
    xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
    occ = _occupancy_at(xyz, dt_all, density_bitfield, cascades, scale,
                        grid_size)
    occ = occ & (ts_all < t2[:, None]) & valid_ray[:, None]

    csum = jnp.cumsum(occ.astype(jnp.int32), axis=1)              # (N, K)
    occ = occ & (csum <= max_samples)  # per-ray cap (raymarching.cu:204)
    n_total = jnp.minimum(csum[:, -1], max_samples)
    n_samples = jnp.clip(n_total - rank_start, 0, s_max).astype(jnp.int32)

    # compaction: rung index of the (rank_start+s)-th occupied sample =
    # first k with csum[k] == rank_start+s+1 (compare-reduce; see
    # compact_rung_indices)
    if rank_start:
        ranks = jnp.broadcast_to(
            rank_start + jnp.arange(1, s_max + 1, dtype=jnp.int32)[None, :],
            (n, s_max))
        k_idx = jnp.minimum(compact_rung_indices_at(csum, ranks),
                            n_rungs - 1)
    else:
        k_idx = jnp.minimum(compact_rung_indices(csum, s_max), n_rungs - 1)
    queries = jnp.arange(1, s_max + 1, dtype=jnp.int32)
    mask = queries[None, :] <= n_samples[:, None]                 # (N, S)

    # closed-form re-evaluation at the selected rungs (cheaper than gather
    # of the (N, K) ladder and exact by construction)
    ts = t_ladder(t_start, k_idx, exp_step_factor, max_samples, grid_size,
                  dt_scale)
    deltas = calc_dt(ts, exp_step_factor, max_samples, grid_size, dt_scale)
    ts = jnp.where(mask, ts, 0.0)
    deltas = jnp.where(mask, deltas, 0.0)
    xyzs = jnp.where(mask[..., None],
                     rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                     0.0)
    return MarchResults(xyzs=xyzs, dirs=rays_d, deltas=deltas, ts=ts,
                        mask=mask, n_samples=n_samples,
                        rm_samples=n_samples.sum(), k_idx=k_idx,
                        t_start=t_start)


def superstrata_len(stratum, dt_min, cell) -> int:
    """Static count of consecutive strata whose stage-A PROBE cells fit one
    8^3 neighborhood row.

    The span to bound is the full probe extent, not just the stratum
    starts: probes sit at fractional offsets up to (stratum-1)(2p-1)/(2p)
    < stratum-1 rungs past each start (:func:`stage_a_probes`), so s
    strata's probes span < (s*stratum - 1)*dt_min. That must stay within
    NBR_SPAN-1 cells so every probe's cell lies in min_cell +
    [0, NBR_SPAN)^3 (ops/morton.neighborhood_table). Bounding only the
    start offsets ((s-1)*stratum*dt_min, as rounds 3-4 did) lets p>=2
    probes of the last stratum fall outside the window, where
    neighborhood_lookup reads garbage bits and silently drops occupied
    strata. ``dt_min`` must be the worst-case SPATIAL step — t-step times
    the direction-norm bound (directions are unnormalized; see
    twolevel_stratum)."""
    from .morton import NBR_SPAN
    # single-stratum validity ((stratum-1)*dt_min fits the window) is the
    # caller's stratum-selection contract (twolevel_stratum caps stratum at
    # the FINE window, and the stage-A cell here is >= 2 fine cells)
    assert (stratum - 1) * dt_min <= (NBR_SPAN - 1.0) * cell, \
        "stratum probe span exceeds one neighborhood row"
    s = 1
    while s < 16 and ((s + 1) * stratum - 1) * dt_min <= (NBR_SPAN - 1.0) * cell:
        s += 1
    return s


def march_rays_train_twolevel(rays_o, rays_d, hits_t, fine_nbr,
                              coarse_nbr, scale, exp_step_factor,
                              grid_size, max_samples, noise, n_rungs, s_max,
                              stratum, s_strata=32, dir_norm=1.0,
                              nbr_a=None, g_a=None) -> MarchResults:
    """Two-level training march: coarse strata first, fine rungs second.

    Random gathers are the dominant marching cost on TPU (~8 ns per row
    regardless of table size or ROW WIDTH, docs/TPU_NOTES.md), so instead of
    testing the occupancy bitfield at every one of the K~1000 ladder rungs
    per ray (raymarching.cu:166-332 can afford this; XLA cannot), the ladder
    is cut into strata of ``stratum`` rungs and all occupancy reads fetch
    64-cell 4^3-neighborhood rows (ops/morton.neighborhood_table):

    1. ONE dilated-coarse row gather per ~4 stratum centers
       (superstrata_len); dilation makes the per-center test a strict
       superset test (see morton.occupancy_nbr_tables + twolevel_stratum).
    2. the first ``s_strata`` surviving strata are compacted and their rungs
       get exact fine-grid tests — ONE fine row gather per stratum covers
       all ``stratum`` rungs (their cells span < 4 cells by construction).
    3. the surviving rungs compact into the (N, s_max) sample rows exactly as
       the one-level march.

    Sample-for-sample identical to :func:`march_rays_train` whenever a ray's
    occupied-coarse strata fit the ``s_strata`` budget (the parity test
    asserts this); rays crossing more occupied strata sample stratified —
    the same kind of cap the reference applies at MAX_SAMPLES.

    ``nbr_a``/``g_a`` optionally swap the stage-A structure for a COARSER
    pooled table (morton.pooled_stage_a_table): at the bench config the
    G/2 table fits only one stratum per 8^3 row (superstrata_len == 1, one
    row gather per stratum per ray — the march's dominant cost), while a
    G/4 table fits ~3. The extra false positives only cost exact stage-B
    row tests here; the result stays sample-for-sample conservative.
    """
    n = rays_o.shape[0]
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    valid_ray = t1 >= 0
    dt0 = calc_dt(t1, exp_step_factor, max_samples, grid_size, scale)
    t_start = jnp.where(valid_ray, t1 + dt0 * noise, 0.0)

    # ---- stage A: coarse stratum tests (superstrata share one row gather;
    # long strata get p probe points each so the table's ±1-cell dilation
    # stays a superset test, stage_a_probes)
    if nbr_a is None:
        nbr_a, g_c = coarse_nbr, grid_size // 2
    elif g_a is None:
        raise ValueError("nbr_a requires g_a (the pooled stage-A grid "
                         "resolution, e.g. grid_size // 4)")
    else:
        g_c = g_a
    dt_min = SQRT3 / max_samples
    s_a = superstrata_len(stratum, dt_min * dir_norm, 2.0 * scale / g_c)
    offs = jnp.asarray(stage_a_probes(stratum, dt_min * dir_norm,
                                      2.0 * scale / g_c), jnp.float32)
    p = offs.shape[0]
    n_super = -(-(-(-n_rungs // stratum)) // s_a)  # ceil(ceil(K/st)/s_a)
    n_strata = n_super * s_a          # padded to a superstratum multiple
    # padded strata lie past the ladder end, so t_first >= t2 masks them
    centers = (jnp.arange(n_strata, dtype=jnp.float32)[:, None] * stratum
               + offs[None, :]).reshape(-1)
    t_c = t_ladder(t_start, centers, exp_step_factor, max_samples,
                   grid_size, scale)                              # (N, A*p)
    xyz_c = rays_o[:, None, :] + t_c[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz_c / scale + 1.0) * g_c, 0.0,
                    g_c - 1.0).astype(jnp.int32)
    nxyz_g = nxyz.reshape(n, n_super, s_a * p, 3)
    occ_c = neighborhood_lookup(nbr_a, nxyz_g.min(axis=2), nxyz_g,
                                g_c).reshape(n, n_strata, p).any(axis=2)
    # stratum is live if its first rung is before the exit
    t_first = t_ladder(t_start,
                       jnp.arange(n_strata, dtype=jnp.float32) * stratum,
                       exp_step_factor, max_samples, grid_size, scale)
    occ_c = occ_c & (t_first < t2[:, None]) & valid_ray[:, None]

    csum_a = jnp.cumsum(occ_c.astype(jnp.int32), axis=1)
    n_occ = csum_a[:, -1]                                         # (N,)
    # when a ray's occupied strata exceed the budget, take them STRATIFIED
    # along the ray rather than the first s_strata: first-k truncation
    # starves the far scene during early training (the un-pruned grid marks
    # everything occupied), which locks training into near-camera fog.
    # Under budget the ranks are 1..n_occ — exact first-k semantics.
    jj_rank = jnp.arange(s_strata, dtype=jnp.int32)[None, :]
    over = n_occ[:, None] > s_strata
    ranks = jnp.where(
        over, (jj_rank * n_occ[:, None]) // s_strata + 1, jj_rank + 1)
    j_sel = jnp.minimum(compact_rung_indices_at(csum_a, ranks),
                        n_strata - 1)                             # (N, SA)
    sel_mask = (jj_rank + 1) <= jnp.minimum(n_occ, s_strata)[:, None]

    # ---- stage B: exact fine tests inside the selected strata — one row
    # gather per stratum covers all its rungs (span < 4 fine cells)
    ks = (j_sel[:, :, None] * stratum
          + jnp.arange(stratum, dtype=jnp.int32)[None, None, :]
          ).reshape(n, s_strata * stratum)                        # (N, SB)
    ts_all = t_ladder(t_start, ks, exp_step_factor, max_samples, grid_size,
                      scale)
    xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
    bound = min(0.5, scale)  # cascade-0 box half-width (_occupancy_at parity)
    nxyz_f = jnp.clip(0.5 * (xyz / bound + 1.0) * grid_size, 0.0,
                      grid_size - 1.0).astype(jnp.int32)
    nxyz_f = nxyz_f.reshape(n, s_strata, stratum, 3)
    occ = neighborhood_lookup(fine_nbr, nxyz_f.min(axis=2), nxyz_f,
                              grid_size).reshape(n, s_strata * stratum)
    occ = (occ & (ts_all < t2[:, None])
           & jnp.repeat(sel_mask, stratum, axis=1))

    csum = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    n_total = jnp.minimum(csum[:, -1], max_samples)
    n_samples = jnp.minimum(n_total, s_max).astype(jnp.int32)

    queries = jnp.arange(1, s_max + 1, dtype=jnp.int32)
    mask = queries[None, :] <= n_samples[:, None]

    # rung of the s-th sample: exactly one candidate b has csum==s+1 AND occ
    # — select it with a chunked compare-reduce (a take_along_axis here
    # would be 1M more random gathers, the very cost this march avoids)
    sb = s_strata * stratum
    k_sel = jnp.zeros((n, s_max), jnp.int32)
    sval = jnp.where(occ, csum, 0)          # 0 never matches queries
    for b0 in range(0, sb, 128):
        blk_s = sval[:, b0:b0 + 128, None]
        blk_k = ks[:, b0:b0 + 128, None]
        k_sel = k_sel + jnp.sum(
            jnp.where(blk_s == queries[None, None, :], blk_k, 0),
            axis=1, dtype=jnp.int32)
    ts = t_ladder(t_start, k_sel, exp_step_factor, max_samples, grid_size,
                  scale)
    deltas = calc_dt(ts, exp_step_factor, max_samples, grid_size, scale)
    ts = jnp.where(mask, ts, 0.0)
    deltas = jnp.where(mask, deltas, 0.0)
    xyzs = jnp.where(mask[..., None],
                     rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                     0.0)
    return MarchResults(xyzs=xyzs, dirs=rays_d, deltas=deltas, ts=ts,
                        mask=mask, n_samples=n_samples,
                        rm_samples=n_samples.sum(), k_idx=k_sel,
                        t_start=t_start)


def cascades_stratum(exp_step_factor, scale, cascades, stratum=8,
                     dir_norm=1.0):
    """Static (stratum, dilate) for the MULTI-cascade two-level march, or
    (0, 0) when it can't be conservative.

    Stage A tests one dilated-union cell per ``stratum`` ladder rungs (see
    morton.union_bitfield + march_rays_train_cascades). Conservativeness:
    every rung lies within half the stratum's t-span of the stratum's
    t-midpoint, and span <= stratum * dt_max, so dilating by
    ceil(stratum * sqrt(3)/2 * dt_worst/scale) + 1 union cells (cell width
    2*scale/G, dt_max = sqrt(3)*2*dt_scale/G) covers it; +1 absorbs cell
    quantization of the midpoint. dt_worst = max(scale, cascades) because
    the reference's test kernel passes ``cascades`` where calc_dt expects
    ``scale`` (bug parity, module doc). Requires 2*scale to be a power of
    two so every cascade pools into the union grid on exact cell
    boundaries (true of all reference benchmark recipes: scale 0.5..64).
    ``dir_norm`` bounds |rays_d| exactly as in :func:`twolevel_stratum`
    (spatial span = t-span * |d|; directions are unnormalized).
    """
    if cascades == 1 or exp_step_factor == 0.0:
        return 0, 0
    if abs(math.log2(2 * scale) - round(math.log2(2 * scale))) > 1e-9:
        return 0, 0
    dt_worst = max(scale, cascades)
    d = math.ceil(stratum * SQRT3 / 2.0 * dt_worst * dir_norm / scale) + 1
    return stratum, d


def march_rays_train_cascades(rays_o, rays_d, hits_t, density_bitfield,
                              union_bits, cascades, scale, exp_step_factor,
                              grid_size, max_samples, noise, n_rungs, s_max,
                              stratum, s_strata=32, dt_scale=None
                              ) -> MarchResults:
    """Two-level MULTI-cascade training march (exp-dt ladder, mip grids).

    The synthetic-scene two-level march (march_rays_train_twolevel) relies
    on uniform dt to pack strata into 4^3-neighborhood rows; with
    exponential stepping the stratum span varies ~40x along the ray, so
    here:

    1. stage A: ONE dilated-union-bitfield gather per ``stratum`` rungs, at
       the stratum's t-midpoint (morton.union_bitfield pools every
       cascade's occupancy into one world-space grid; the dilation from
       :func:`cascades_stratum` makes the single-cell test a strict
       superset of all the stratum's rungs across all mips);
    2. the first ``s_strata`` surviving strata are selected (stratified
       truncation when over budget, as in the synthetic march);
    3. stage B: exact per-rung tests inside selected strata — the same
       mip-selection + bitfield lookup as the one-level march
       (_occupancy_at, parity with raymarching.cu:205-220).

    Sample-for-sample identical to :func:`march_rays_train` whenever a
    ray's occupied strata fit ``s_strata`` (parity-tested).
    """
    if dt_scale is None:
        dt_scale = scale
    n = rays_o.shape[0]
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    valid_ray = t1 >= 0
    dt0 = calc_dt(t1, exp_step_factor, max_samples, grid_size, dt_scale)
    t_start = jnp.where(valid_ray, t1 + dt0 * noise, 0.0)

    # ---- stage A: one union-cell test per stratum at its t-midpoint
    n_strata = -(-n_rungs // stratum)
    j_first = (jnp.arange(n_strata, dtype=jnp.float32) * stratum)
    t_lo = t_ladder(t_start, j_first, exp_step_factor, max_samples,
                    grid_size, dt_scale)                          # (N, A)
    t_hi = t_ladder(t_start, j_first + stratum, exp_step_factor,
                    max_samples, grid_size, dt_scale)
    t_mid = 0.5 * (t_lo + t_hi)
    xyz_c = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz_c / scale + 1.0) * grid_size, 0.0,
                    grid_size - 1.0).astype(jnp.int32)
    occ_c = bitfield_lookup(union_bits, morton3d(nxyz).astype(jnp.int32))
    occ_c = occ_c & (t_lo < t2[:, None]) & valid_ray[:, None]

    csum_a = jnp.cumsum(occ_c.astype(jnp.int32), axis=1)
    n_occ = csum_a[:, -1]
    # stratified truncation (see march_rays_train_twolevel)
    jj_rank = jnp.arange(s_strata, dtype=jnp.int32)[None, :]
    over = n_occ[:, None] > s_strata
    ranks = jnp.where(
        over, (jj_rank * n_occ[:, None]) // s_strata + 1, jj_rank + 1)
    j_sel = jnp.minimum(compact_rung_indices_at(csum_a, ranks),
                        n_strata - 1)                             # (N, SA)
    sel_mask = (jj_rank + 1) <= jnp.minimum(n_occ, s_strata)[:, None]

    # ---- stage B: exact per-rung mip-selected tests in selected strata
    ks = (j_sel[:, :, None] * stratum
          + jnp.arange(stratum, dtype=jnp.int32)[None, None, :]
          ).reshape(n, s_strata * stratum)                        # (N, SB)
    ts_all = t_ladder(t_start, ks, exp_step_factor, max_samples, grid_size,
                      dt_scale)
    dt_all = calc_dt(ts_all, exp_step_factor, max_samples, grid_size,
                     dt_scale)
    xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
    occ = _occupancy_at(xyz, dt_all, density_bitfield, cascades, scale,
                        grid_size)
    occ = (occ & (ts_all < t2[:, None])
           & jnp.repeat(sel_mask, stratum, axis=1)
           & (ks < n_rungs))

    csum = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    n_total = jnp.minimum(csum[:, -1], max_samples)
    n_samples = jnp.minimum(n_total, s_max).astype(jnp.int32)
    queries = jnp.arange(1, s_max + 1, dtype=jnp.int32)
    mask = queries[None, :] <= n_samples[:, None]

    sb = s_strata * stratum
    k_sel = jnp.zeros((n, s_max), jnp.int32)
    sval = jnp.where(occ, csum, 0)
    for b0 in range(0, sb, 128):
        blk_s = sval[:, b0:b0 + 128, None]
        blk_k = ks[:, b0:b0 + 128, None]
        k_sel = k_sel + jnp.sum(
            jnp.where(blk_s == queries[None, None, :], blk_k, 0),
            axis=1, dtype=jnp.int32)
    ts = t_ladder(t_start, k_sel, exp_step_factor, max_samples, grid_size,
                  dt_scale)
    deltas = calc_dt(ts, exp_step_factor, max_samples, grid_size, dt_scale)
    ts = jnp.where(mask, ts, 0.0)
    deltas = jnp.where(mask, deltas, 0.0)
    xyzs = jnp.where(mask[..., None],
                     rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                     0.0)
    return MarchResults(xyzs=xyzs, dirs=rays_d, deltas=deltas, ts=ts,
                        mask=mask, n_samples=n_samples,
                        rm_samples=n_samples.sum(), k_idx=k_sel,
                        t_start=t_start)


def march_rays_window_cascades(rays_o, rays_d, t_start, t2, cursor,
                               density_bitfield, union_bits, cascades,
                               scale, exp_step_factor, grid_size,
                               max_samples, n_window, s_cap, stratum,
                               s_strata=None, dt_scale=None
                               ) -> WindowMarchResults:
    """Windowed (alive-ray renderer) variant of
    :func:`march_rays_train_cascades`: stage A over the window's strata,
    stage B exact inside the first ``s_strata`` surviving ones. Cursor
    resume semantics match :func:`march_rays_window_twolevel`."""
    if dt_scale is None:
        dt_scale = scale
    if s_strata is None:
        s_strata = max(2, -(-2 * s_cap // stratum))
    c = rays_o.shape[0]
    n_strata = -(-n_window // stratum)

    jj = jnp.arange(n_strata, dtype=jnp.float32)
    j_first = cursor[:, None] + jj[None, :] * stratum
    t_lo = t_ladder(t_start, j_first, exp_step_factor, max_samples,
                    grid_size, dt_scale)
    t_hi = t_ladder(t_start, j_first + stratum, exp_step_factor,
                    max_samples, grid_size, dt_scale)
    t_mid = 0.5 * (t_lo + t_hi)
    xyz_c = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz_c / scale + 1.0) * grid_size, 0.0,
                    grid_size - 1.0).astype(jnp.int32)
    occ_c = bitfield_lookup(union_bits, morton3d(nxyz).astype(jnp.int32))
    occ_c = occ_c & (t_lo < t2[:, None]) \
        & (jj[None, :] * stratum < n_window)

    csum_a = jnp.cumsum(occ_c.astype(jnp.int32), axis=1)
    n_occ_strata = csum_a[:, -1]
    j_sel = jnp.minimum(compact_rung_indices(csum_a, s_strata),
                        n_strata - 1)
    sel_mask = (jnp.arange(1, s_strata + 1, dtype=jnp.int32)[None, :]
                <= n_occ_strata[:, None])

    ks = (cursor[:, None, None] + j_sel[:, :, None] * stratum
          + jnp.arange(stratum, dtype=jnp.int32)[None, None, :]
          ).reshape(c, s_strata * stratum)
    ts_all = t_ladder(t_start, ks, exp_step_factor, max_samples, grid_size,
                      dt_scale)
    dt_all = calc_dt(ts_all, exp_step_factor, max_samples, grid_size,
                     dt_scale)
    xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
    occ = _occupancy_at(xyz, dt_all, density_bitfield, cascades, scale,
                        grid_size)
    occ = (occ & (ts_all < t2[:, None])
           & jnp.repeat(sel_mask, stratum, axis=1)
           & (ks < cursor[:, None] + n_window))

    csum = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    n_found = csum[:, -1]
    n_samples = jnp.minimum(n_found, s_cap).astype(jnp.int32)
    queries = jnp.arange(1, s_cap + 1, dtype=jnp.int32)
    mask = queries[None, :] <= n_samples[:, None]

    sb = s_strata * stratum
    k_sel = jnp.zeros((c, s_cap), jnp.int32)
    sval = jnp.where(occ, csum, 0)
    for b0 in range(0, sb, 128):
        blk_s = sval[:, b0:b0 + 128, None]
        blk_k = ks[:, b0:b0 + 128, None]
        k_sel = k_sel + jnp.sum(
            jnp.where(blk_s == queries[None, None, :], blk_k, 0),
            axis=1, dtype=jnp.int32)

    ts = t_ladder(t_start, k_sel, exp_step_factor, max_samples, grid_size,
                  dt_scale)
    deltas = calc_dt(ts, exp_step_factor, max_samples, grid_size, dt_scale)
    ts = jnp.where(mask, ts, 0.0)
    deltas = jnp.where(mask, deltas, 0.0)
    xyzs = jnp.where(mask[..., None],
                     rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                     0.0)

    last_k = jnp.max(jnp.where(mask, k_sel, 0), axis=1)
    trunc_strata = n_occ_strata > s_strata
    j_next = jnp.minimum(
        compact_rung_indices(csum_a, s_strata + 1)[:, -1], n_strata - 1)
    cursor_after = jnp.where(
        trunc_strata, cursor + j_next * stratum, cursor + n_window)
    cursor_new = jnp.where(n_found > s_cap, last_k + 1,
                           cursor_after).astype(jnp.int32)
    t_next = t_ladder(t_start, cursor_new[:, None], exp_step_factor,
                      max_samples, grid_size, dt_scale)[:, 0]
    exhausted = t_next >= t2
    return WindowMarchResults(xyzs=xyzs, deltas=deltas, ts=ts, mask=mask,
                              n_samples=n_samples, cursor=cursor_new,
                              exhausted=exhausted, k_idx=k_sel)


def twolevel_stratum(exp_step_factor, max_samples, scale, grid_size,
                     cascades, dir_norm=1.0):
    """Static (stratum, dilate) for two-level marching, or (0, 0) when the
    two-level path can't be conservative.

    The stratum length is set by the stage-B constraint alone: a stratum's
    rung cells must fit one 8^3 fine neighborhood row, i.e.
    (stratum-1)*dt_min*dir_norm <= (NBR_SPAN-1) fine cells
    (ops/morton.neighborhood_table). Stage-A conservativeness is then bought
    with COARSE DILATION instead of shrinking the stratum: the coarse grid
    (cell 4*scale/G) is dilated by ``dilate`` cells per axis so the single
    test at the stratum's center rung covers every rung within
    ((stratum-1)/2)*dt_min*dir_norm of it. Rounds 2-3 instead capped the
    stratum at 2*coarse_cell/dt_min (18 rungs at the default config,
    dilation fixed at 1); decoupling lets the stratum reach the fine-window
    limit, cutting both stage-A and stage-B row gathers per rung ~2x —
    dilation only adds stage-A false positives, which the exact stage-B
    test discards. Only the single-cascade uniform-dt regime (synthetic
    scenes: exp_step_factor == 0) is supported; real scenes keep the exact
    one-level march (multi-cascade scenes use :func:`cascades_stratum`).

    ``dir_norm`` upper-bounds |rays_d| over every ray the tables/march will
    see. Ray directions are UNNORMALIZED by convention (datasets/ray_utils
    module doc — pixel directions with |d| up to ~1.2 at a 53-degree-fov
    corner), and the ladder steps t, so a rung's SPATIAL distance from its
    stratum center is ((stratum-1)/2)*dt*|d|: at |d| > 1 a stratum derived
    for |d| = 1 overruns both the fine row and the coarse-test coverage,
    and the march silently drops real samples (caught by an
    exposure-fixture pixel whose corner ray lost its first rung, r4).
    Callers with camera rays must pass the dataset's max direction norm
    (NGPConfig.dir_norm).

    The returned ``dilate`` is fixed at 1: stage A covers a long stratum
    with MULTIPLE probe points (:func:`stage_a_probes`) instead of fatter
    dilation. A dilate-2 half-res table was measured to wreck stage-A
    selectivity — occupied regions bloat by ±1/16 of the scene per axis,
    the wavefront marches through false-positive strata paying padded
    field evals at ~zero fill (bench fps 6.1 -> 4.5, r4) — while extra
    probe points reuse the superstratum's one row gather and only add VPU
    compares.
    """
    if exp_step_factor != 0.0 or cascades != 1:
        return 0, 0
    from .morton import NBR_SPAN
    dt_eff = SQRT3 / max_samples * dir_norm   # worst-case SPATIAL step
    cell_fine = 2.0 * min(0.5, scale) / grid_size
    stratum = min(int((NBR_SPAN - 1.0) * cell_fine / dt_eff) + 1, 32)
    if stratum < 2:
        return 0, 0
    return stratum, 1


def stage_a_probes(stratum, dt_eff, cell):
    """Static fractional rung offsets of the stage-A probe points within a
    stratum (tuple of floats, length p).

    Every rung of the stratum must be within one coarse ``cell`` of a probe
    point so the ±1-cell dilated coarse test at the probe is a strict
    superset test: rung offsets [0, stratum-1] are covered to radius
    (stratum-1)/(2p) rungs by p evenly spaced probes, so p =
    ceil(((stratum-1)/2) * dt_eff / cell) with ``dt_eff`` the worst-case
    spatial step (t-step * direction-norm bound). All p probes of a stratum
    lie inside its rung span, so the superstratum row-sharing bound
    (:func:`superstrata_len`) is unaffected.
    """
    p = max(1, math.ceil(((stratum - 1) / 2.0) * dt_eff / cell))
    return tuple((stratum - 1) * (2 * i + 1) / (2.0 * p) for i in range(p))


class WindowMarchResults(NamedTuple):
    xyzs: jnp.ndarray      # (C, S, 3)
    deltas: jnp.ndarray    # (C, S)
    ts: jnp.ndarray        # (C, S)
    mask: jnp.ndarray      # (C, S) bool
    n_samples: jnp.ndarray  # (C,) int32 emitted this window (<= S)
    cursor: jnp.ndarray    # (C,) int32 next rung to inspect after this window
    exhausted: jnp.ndarray  # (C,) bool ray passed its exit before the cursor
    k_idx: jnp.ndarray = None  # (C, S) int32 GLOBAL ladder rung per sample


def march_rays_window_twolevel(rays_o, rays_d, t_start, t2, cursor,
                               fine_nbr, coarse_nbr, scale,
                               exp_step_factor, grid_size, max_samples,
                               n_window, s_cap, stratum, s_strata=None,
                               dir_norm=1.0) -> WindowMarchResults:
    """Two-level variant of :func:`march_rays_window` (single cascade,
    uniform dt): coarse-test the window's strata, fine-test only the first
    ``s_strata`` surviving strata. Occupancy reads fetch 4^3-neighborhood
    rows exactly as in :func:`march_rays_train_twolevel`. The cursor resumes
    after the s_cap-th emitted sample, or at the first UNEXAMINED
    coarse-occupied stratum, or at the window end — never skipping untested
    occupancy."""
    if s_strata is None:
        s_strata = max(2, -(-2 * s_cap // stratum))
    c = rays_o.shape[0]
    g_c = grid_size // 2
    dt_min = SQRT3 / max_samples
    s_a = superstrata_len(stratum, dt_min * dir_norm, 2.0 * scale / g_c)
    offs = jnp.asarray(stage_a_probes(stratum, dt_min * dir_norm,
                                      2.0 * scale / g_c), jnp.float32)
    p = offs.shape[0]
    n_super = -(-(-(-n_window // stratum)) // s_a)
    n_strata = n_super * s_a          # padded; t_first >= t2 masks extras

    jj = jnp.arange(n_strata, dtype=jnp.float32)
    base = (jj[:, None] * stratum + offs[None, :]).reshape(-1)
    centers = cursor[:, None] + base[None, :]
    t_c = t_ladder(t_start, centers, exp_step_factor, max_samples,
                   grid_size, scale)
    xyz_c = rays_o[:, None, :] + t_c[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz_c / scale + 1.0) * g_c, 0.0,
                    g_c - 1.0).astype(jnp.int32)
    nxyz_g = nxyz.reshape(c, n_super, s_a * p, 3)
    occ_c = neighborhood_lookup(coarse_nbr, nxyz_g.min(axis=2), nxyz_g,
                                g_c).reshape(c, n_strata, p).any(axis=2)
    t_first = t_ladder(t_start, cursor[:, None] + jj[None, :] * stratum,
                       exp_step_factor, max_samples, grid_size, scale)
    # padded strata start at or past the window end: keep them out so no
    # sample is emitted beyond cursor + n_window (it would double-emit
    # after the cursor resumes at the window end)
    occ_c = occ_c & (t_first < t2[:, None]) \
        & (jj[None, :] * stratum < n_window)

    csum_a = jnp.cumsum(occ_c.astype(jnp.int32), axis=1)
    n_occ_strata = csum_a[:, -1]
    j_sel = jnp.minimum(compact_rung_indices(csum_a, s_strata),
                        n_strata - 1)
    sel_mask = (jnp.arange(1, s_strata + 1, dtype=jnp.int32)[None, :]
                <= n_occ_strata[:, None])

    ks = (cursor[:, None, None] + j_sel[:, :, None] * stratum
          + jnp.arange(stratum, dtype=jnp.int32)[None, None, :]
          ).reshape(c, s_strata * stratum)
    ts_all = t_ladder(t_start, ks, exp_step_factor, max_samples, grid_size,
                      scale)
    xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
    bound = min(0.5, scale)  # cascade-0 box half-width (_occupancy_at parity)
    nxyz_f = jnp.clip(0.5 * (xyz / bound + 1.0) * grid_size, 0.0,
                      grid_size - 1.0).astype(jnp.int32)
    nxyz_f = nxyz_f.reshape(c, s_strata, stratum, 3)
    occ = neighborhood_lookup(fine_nbr, nxyz_f.min(axis=2), nxyz_f,
                              grid_size).reshape(c, s_strata * stratum)
    # clamp emissions to the window: a selected stratum whose tail crosses
    # cursor + n_window would otherwise emit rungs the resumed cursor
    # (cursor + n_window) re-tests next window — double-composited samples
    # whenever stratum does not divide n_window (the cascades twin at :488
    # had this gate; this one did not)
    occ = (occ & (ts_all < t2[:, None])
           & jnp.repeat(sel_mask, stratum, axis=1)
           & (ks < cursor[:, None] + n_window))

    csum = jnp.cumsum(occ.astype(jnp.int32), axis=1)
    n_found = csum[:, -1]
    n_samples = jnp.minimum(n_found, s_cap).astype(jnp.int32)

    queries = jnp.arange(1, s_cap + 1, dtype=jnp.int32)
    mask = queries[None, :] <= n_samples[:, None]
    sb = s_strata * stratum
    k_sel = jnp.zeros((c, s_cap), jnp.int32)
    sval = jnp.where(occ, csum, 0)
    for b0 in range(0, sb, 128):
        blk_s = sval[:, b0:b0 + 128, None]
        blk_k = ks[:, b0:b0 + 128, None]
        k_sel = k_sel + jnp.sum(
            jnp.where(blk_s == queries[None, None, :], blk_k, 0),
            axis=1, dtype=jnp.int32)

    ts = t_ladder(t_start, k_sel, exp_step_factor, max_samples, grid_size,
                  scale)
    deltas = calc_dt(ts, exp_step_factor, max_samples, grid_size, scale)
    ts = jnp.where(mask, ts, 0.0)
    deltas = jnp.where(mask, deltas, 0.0)
    xyzs = jnp.where(mask[..., None],
                     rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                     0.0)

    # cursor: past the s_cap-th sample if capped; else past the last
    # EXAMINED stratum — which is the (s_strata)-th occupied one when the
    # strata budget truncated, or the window end otherwise
    last_k = jnp.max(jnp.where(mask, k_sel, 0), axis=1)
    trunc_strata = n_occ_strata > s_strata
    # stratum index of the (s_strata+1)-th occupied stratum (first unexamined)
    j_next = jnp.minimum(
        compact_rung_indices(csum_a, s_strata + 1)[:, -1], n_strata - 1)
    cursor_after = jnp.where(
        trunc_strata, cursor + j_next * stratum, cursor + n_window)
    cursor_new = jnp.where(n_found > s_cap, last_k + 1,
                           cursor_after).astype(jnp.int32)
    t_next = t_ladder(t_start, cursor_new[:, None], exp_step_factor,
                      max_samples, grid_size, scale)[:, 0]
    exhausted = t_next >= t2
    return WindowMarchResults(xyzs=xyzs, deltas=deltas, ts=ts, mask=mask,
                              n_samples=n_samples, cursor=cursor_new,
                              exhausted=exhausted, k_idx=k_sel)


def march_seek_twolevel(rays_o, rays_d, t_start, t2, cursor, coarse_nbr,
                        scale, exp_step_factor, grid_size, max_samples,
                        n_window, stratum, dir_norm=1.0):
    """FIELD-FREE empty-space seek (single cascade, uniform dt): advance each
    ray's cursor to the first COARSE-occupied stratum in the window, testing
    only the dilated coarse grid — no fine tests, no field evaluation.

    The reference's test loop spends its early rounds marching rays through
    empty space with tiny sample caps (rendering.py:75-87); in the XLA
    renderer those rounds paid a padded field eval at ~2% fill — measured
    207 of 321 ms/frame (docs/TPU_NOTES.md round-2 anatomy). The field has
    nothing to say about empty space: this op moves the cursor at pure
    stage-A cost (one 4^3-neighborhood row gather per superstratum).

    Conservative: the dilated coarse test is a strict superset of fine
    occupancy (ops/morton.occupancy_nbr_tables), so the cursor never skips
    a rung the full march would have sampled. A ray already at an occupied
    stratum keeps its cursor (idempotent at content).

    Returns (cursor_new, at_content, exhausted):
        cursor_new: int32 first rung of the first coarse-occupied stratum,
            or cursor + n_window when the window is all-empty.
        at_content: bool — an occupied stratum was found in the window.
        exhausted: bool — the new cursor's t is at/past the ray's exit.
    """
    c = rays_o.shape[0]
    g_c = grid_size // 2
    dt_min = SQRT3 / max_samples
    s_a = superstrata_len(stratum, dt_min * dir_norm, 2.0 * scale / g_c)
    offs = jnp.asarray(stage_a_probes(stratum, dt_min * dir_norm,
                                      2.0 * scale / g_c), jnp.float32)
    p = offs.shape[0]
    n_super = -(-(-(-n_window // stratum)) // s_a)
    n_strata = n_super * s_a

    jj = jnp.arange(n_strata, dtype=jnp.float32)
    base = (jj[:, None] * stratum + offs[None, :]).reshape(-1)
    centers = cursor[:, None] + base[None, :]
    t_c = t_ladder(t_start, centers, exp_step_factor, max_samples,
                   grid_size, scale)
    xyz_c = rays_o[:, None, :] + t_c[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz_c / scale + 1.0) * g_c, 0.0,
                    g_c - 1.0).astype(jnp.int32)
    nxyz_g = nxyz.reshape(c, n_super, s_a * p, 3)
    occ_c = neighborhood_lookup(coarse_nbr, nxyz_g.min(axis=2), nxyz_g,
                                g_c).reshape(c, n_strata, p).any(axis=2)
    t_first = t_ladder(t_start, cursor[:, None] + jj[None, :] * stratum,
                       exp_step_factor, max_samples, grid_size, scale)
    occ_c = occ_c & (t_first < t2[:, None]) \
        & (jj[None, :] * stratum < n_window)

    # first occupied stratum = number of leading all-empty strata
    j0 = jnp.sum(jnp.cumsum(occ_c.astype(jnp.int32), axis=1) == 0, axis=1)
    at_content = j0 < n_strata
    cursor_new = (cursor
                  + jnp.minimum(j0 * stratum, n_window)).astype(jnp.int32)
    t_next = t_ladder(t_start, cursor_new[:, None], exp_step_factor,
                      max_samples, grid_size, scale)[:, 0]
    exhausted = t_next >= t2
    return cursor_new, at_content, exhausted


def march_seek_cascades(rays_o, rays_d, t_start, t2, cursor, union_bits,
                        scale, exp_step_factor, grid_size, max_samples,
                        n_window, stratum, dt_scale=None):
    """FIELD-FREE seek, multi-cascade (exp-dt) variant: one dilated-union
    bitfield lookup per stratum midpoint (see march_rays_window_cascades
    stage A). Same cursor/return semantics as :func:`march_seek_twolevel`."""
    if dt_scale is None:
        dt_scale = scale
    c = rays_o.shape[0]
    n_strata = -(-n_window // stratum)
    jj = jnp.arange(n_strata, dtype=jnp.float32)
    j_first = cursor[:, None] + jj[None, :] * stratum
    t_lo = t_ladder(t_start, j_first, exp_step_factor, max_samples,
                    grid_size, dt_scale)
    t_hi = t_ladder(t_start, j_first + stratum, exp_step_factor,
                    max_samples, grid_size, dt_scale)
    t_mid = 0.5 * (t_lo + t_hi)
    xyz_c = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz_c / scale + 1.0) * grid_size, 0.0,
                    grid_size - 1.0).astype(jnp.int32)
    occ_c = bitfield_lookup(union_bits, morton3d(nxyz).astype(jnp.int32))
    occ_c = occ_c & (t_lo < t2[:, None]) \
        & (jj[None, :] * stratum < n_window)

    j0 = jnp.sum(jnp.cumsum(occ_c.astype(jnp.int32), axis=1) == 0, axis=1)
    at_content = j0 < n_strata
    cursor_new = (cursor
                  + jnp.minimum(j0 * stratum, n_window)).astype(jnp.int32)
    t_next = t_ladder(t_start, cursor_new[:, None], exp_step_factor,
                      max_samples, grid_size, dt_scale)[:, 0]
    exhausted = t_next >= t2
    return cursor_new, at_content, exhausted


def march_rays_window(rays_o, rays_d, t_start, t2, cursor, density_bitfield,
                      cascades, scale, exp_step_factor, grid_size,
                      max_samples, n_window, s_cap, dt_scale=None
                      ) -> WindowMarchResults:
    """March a WINDOW of ``n_window`` t-ladder rungs starting at each ray's
    ``cursor``, emitting at most ``s_cap`` occupied samples.

    The incremental building block of the multi-round test renderer — the
    TPU reformulation of the reference's ``raymarching_test`` CUDA kernel
    (models/csrc/raymarching.cu:335-454), whose per-ray resume point
    (``hits_t[r][0]`` mutation, :390) becomes the explicit integer ``cursor``
    on the closed-form ladder. If more than ``s_cap`` occupied rungs exist in
    the window the cursor resumes right after the ``s_cap``-th; otherwise it
    skips to the window end.

    Args:
        t_start: (C,) ladder origin t (box entry, fixed per ray).
        t2: (C,) box exit distances.
        cursor: (C,) int32 first rung index of this window.
        n_window: static window length W.
        s_cap: static per-ray sample cap S for this round.
    """
    if dt_scale is None:
        dt_scale = scale
    ks = cursor[:, None] + jnp.arange(n_window, dtype=jnp.int32)[None, :]
    ts_all = t_ladder(t_start, ks, exp_step_factor, max_samples, grid_size,
                      dt_scale)                                    # (C, W)
    dt_all = calc_dt(ts_all, exp_step_factor, max_samples, grid_size,
                     dt_scale)
    xyz = rays_o[:, None, :] + ts_all[..., None] * rays_d[:, None, :]
    occ = _occupancy_at(xyz, dt_all, density_bitfield, cascades, scale,
                        grid_size)
    occ = occ & (ts_all < t2[:, None])

    csum = jnp.cumsum(occ.astype(jnp.int32), axis=1)               # (C, W)
    n_found = csum[:, -1]
    n_samples = jnp.minimum(n_found, s_cap).astype(jnp.int32)

    k_local = jnp.minimum(compact_rung_indices(csum, s_cap), n_window - 1)
    queries = jnp.arange(1, s_cap + 1, dtype=jnp.int32)
    mask = queries[None, :] <= n_samples[:, None]                  # (C, S)

    k_glob = cursor[:, None] + k_local
    ts = t_ladder(t_start, k_glob, exp_step_factor, max_samples, grid_size,
                  dt_scale)
    deltas = calc_dt(ts, exp_step_factor, max_samples, grid_size, dt_scale)
    ts = jnp.where(mask, ts, 0.0)
    deltas = jnp.where(mask, deltas, 0.0)
    xyzs = jnp.where(mask[..., None],
                     rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                     0.0)

    cursor_new = jnp.where(
        n_found > s_cap,
        cursor + k_local[:, -1] + 1,   # resume just after the s_cap-th hit
        cursor + n_window).astype(jnp.int32)
    t_next = t_ladder(t_start, cursor_new[:, None], exp_step_factor,
                      max_samples, grid_size, dt_scale)[:, 0]
    exhausted = t_next >= t2
    return WindowMarchResults(xyzs=xyzs, deltas=deltas, ts=ts, mask=mask,
                              n_samples=n_samples, cursor=cursor_new,
                              exhausted=exhausted, k_idx=k_glob)
