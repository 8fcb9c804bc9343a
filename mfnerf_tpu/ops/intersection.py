"""Ray/AABB and ray/sphere intersection — pure jnp (slab / quadratic method).

TPU-native equivalents of the reference CUDA kernels ``ray_aabb_intersect``
and ``ray_sphere_intersect`` (reference: models/csrc/intersection.cu,
exposed through models/custom_functions.py:8-52). On TPU these are a handful
of fused VPU ops; no atomics or per-ray hit lists are needed because the main
rendering path intersects each ray with exactly one box — the scene AABB
(reference models/rendering.py:27-29 passes max_hits=1).

The multi-voxel form is kept for API parity: it returns the hits of every ray
against every voxel, sorted near-to-far, with static shape (N_rays, max_hits).
Unlike the reference (whose atomic hit-counter makes the kept subset
nondeterministic when hits > max_hits), ours deterministically keeps the
nearest ``max_hits``.
"""
import jax.numpy as jnp


def _slab(rays_o, inv_d, center, half_size):
    """Slab-method ray/box intersection. Returns (t1, t2); (-1,-1) if miss."""
    t_lo = (center - half_size - rays_o) * inv_d
    t_hi = (center + half_size - rays_o) * inv_d
    tmin = jnp.minimum(t_lo, t_hi).max(axis=-1)
    tmax = jnp.maximum(t_lo, t_hi).min(axis=-1)
    miss = tmin > tmax
    t1 = jnp.where(miss, -1.0, tmin)
    t2 = jnp.where(miss, -1.0, tmax)
    return t1, t2


def ray_aabb_intersect(rays_o, rays_d, centers, half_sizes, max_hits=1):
    """Intersect rays with axis-aligned boxes.

    Args:
        rays_o: (N_rays, 3) ray origins.
        rays_d: (N_rays, 3) ray directions.
        centers: (N_voxels, 3) box centers.
        half_sizes: (N_voxels, 3) box half sizes.
        max_hits: number of nearest hits kept per ray.

    Returns:
        hits_cnt: (N_rays,) int32 number of boxes hit (t2 > 0).
        hits_t: (N_rays, max_hits, 2) float32 (t_near, t_far) sorted
            near-to-far; -1 where there is no hit. t_near is clamped to >= 0
            (camera inside box), matching reference intersection.cu:49-52.
        hits_voxel_idx: (N_rays, max_hits) int32 hit box index, -1 if none.
    """
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    inv_d = 1.0 / rays_d
    # broadcast rays against voxels: (N_rays, N_voxels, 3)
    t1, t2 = _slab(
        rays_o[:, None, :], inv_d[:, None, :],
        centers[None, :, :].astype(jnp.float32),
        half_sizes[None, :, :].astype(jnp.float32),
    )  # (N_rays, N_voxels)
    hit = t2 > 0
    hits_cnt = hit.sum(axis=-1).astype(jnp.int32)

    t1 = jnp.where(hit, jnp.maximum(t1, 0.0), -1.0)
    t2 = jnp.where(hit, t2, -1.0)

    n_voxels = centers.shape[0]
    k = min(max_hits, n_voxels)
    # near-to-far: misses (t1 == -1) must sort LAST -> key = where(hit, t1, inf)
    key = jnp.where(hit, t1, jnp.inf)
    order = jnp.argsort(key, axis=-1)[:, :k]
    hits_t = jnp.stack(
        [jnp.take_along_axis(t1, order, axis=-1),
         jnp.take_along_axis(t2, order, axis=-1)], axis=-1)
    hits_voxel_idx = jnp.where(
        jnp.take_along_axis(hit, order, axis=-1), order, -1
    ).astype(jnp.int32)

    if k < max_hits:  # pad to the static max_hits width
        pad = max_hits - k
        hits_t = jnp.pad(hits_t, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
        hits_voxel_idx = jnp.pad(
            hits_voxel_idx, ((0, 0), (0, pad)), constant_values=-1)
    return hits_cnt, hits_t, hits_voxel_idx


def ray_aabb_intersect_single(rays_o, rays_d, center, half_size):
    """Fast path for the scene AABB (the only box the main pipeline uses).

    Returns hits_t: (N_rays, 2) with the same conventions as above.
    """
    rays_o = rays_o.astype(jnp.float32)
    inv_d = 1.0 / rays_d.astype(jnp.float32)
    t1, t2 = _slab(rays_o, inv_d,
                   jnp.asarray(center, jnp.float32).reshape(3),
                   jnp.asarray(half_size, jnp.float32).reshape(3))
    hit = t2 > 0
    t1 = jnp.where(hit, jnp.maximum(t1, 0.0), -1.0)
    t2 = jnp.where(hit, t2, -1.0)
    return jnp.stack([t1, t2], axis=-1)


def ray_sphere_intersect(rays_o, rays_d, centers, radii, max_hits=1):
    """Intersect rays with spheres (quadratic). Same output conventions as
    :func:`ray_aabb_intersect`.

    Exposed for API parity with the reference RaySphereIntersector
    (custom_functions.py:32-52); unused by the main path there as well
    (reserved for multi-sphere backgrounds, reference README.md:172).
    """
    rays_o = rays_o.astype(jnp.float32)
    rays_d = rays_d.astype(jnp.float32)
    co = rays_o[:, None, :] - centers[None, :, :].astype(jnp.float32)
    a = (rays_d * rays_d).sum(-1)[:, None]
    half_b = (rays_d[:, None, :] * co).sum(-1)
    radii = jnp.asarray(radii, jnp.float32)
    r2 = (radii * radii).reshape(1, -1)
    c = (co * co).sum(-1) - r2
    disc = half_b * half_b - a * c
    hit_mask = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-half_b - sq) / a
    t2 = (-half_b + sq) / a
    hit = hit_mask & (t2 > 0)
    hits_cnt = hit.sum(axis=-1).astype(jnp.int32)
    t1 = jnp.where(hit, jnp.maximum(t1, 0.0), -1.0)
    t2 = jnp.where(hit, t2, -1.0)

    n = centers.shape[0]
    k = min(max_hits, n)
    key = jnp.where(hit, t1, jnp.inf)
    order = jnp.argsort(key, axis=-1)[:, :k]
    hits_t = jnp.stack(
        [jnp.take_along_axis(t1, order, axis=-1),
         jnp.take_along_axis(t2, order, axis=-1)], axis=-1)
    hits_idx = jnp.where(
        jnp.take_along_axis(hit, order, axis=-1), order, -1).astype(jnp.int32)
    if k < max_hits:
        pad = max_hits - k
        hits_t = jnp.pad(hits_t, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
        hits_idx = jnp.pad(hits_idx, ((0, 0), (0, pad)), constant_values=-1)
    return hits_cnt, hits_t, hits_idx
