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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .morton import bitfield_lookup, morton3d
from .stepping import calc_dt, mip_from_dt, mip_from_pos, t_ladder


class MarchResults(NamedTuple):
    xyzs: jnp.ndarray     # (N, S, 3) sample positions
    dirs: jnp.ndarray     # (N, 3) ray directions (shared by row samples)
    deltas: jnp.ndarray   # (N, S) integration steps
    ts: jnp.ndarray       # (N, S) sample distances
    mask: jnp.ndarray     # (N, S) bool sample validity
    n_samples: jnp.ndarray  # (N,) int32 valid samples per ray (<= S)
    rm_samples: jnp.ndarray  # () int32 total marched samples (train/rm_s log)


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
                     n_rungs, s_max, dt_scale=None) -> MarchResults:
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
    n_samples = jnp.minimum(n_total, s_max).astype(jnp.int32)

    # compaction: rung index of the s-th occupied sample = first k with
    # csum[k] == s+1 (binary search in the monotone csum)
    queries = jnp.arange(1, s_max + 1, dtype=jnp.int32)
    k_idx = jax.vmap(
        lambda row: jnp.searchsorted(row, queries, side="left"))(csum)
    k_idx = jnp.minimum(k_idx, n_rungs - 1).astype(jnp.int32)
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
                        rm_samples=n_samples.sum())
