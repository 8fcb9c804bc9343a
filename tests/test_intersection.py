import numpy as np
import jax.numpy as jnp

from mfnerf_tpu.ops.intersection import (
    ray_aabb_intersect, ray_aabb_intersect_single, ray_sphere_intersect)


def test_aabb_single_analytic():
    # unit cube centered at origin, rays along +z from z=-2
    rays_o = jnp.asarray([[0.0, 0.0, -2.0],
                          [0.0, 0.0, 0.0],     # camera inside the box
                          [2.0, 2.0, -2.0]])   # miss
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    hits_t = np.asarray(ray_aabb_intersect_single(
        rays_o, rays_d, jnp.zeros(3), jnp.full(3, 0.5)))
    np.testing.assert_allclose(hits_t[0], [1.5, 2.5], atol=1e-6)
    # inside: t_near clamped to 0
    np.testing.assert_allclose(hits_t[1], [0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(hits_t[2], [-1.0, -1.0])


def test_aabb_multi_sorted_near_to_far():
    centers = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]])
    half = jnp.full((2, 3), 0.5)
    rays_o = jnp.asarray([[0.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    cnt, hits_t, idx = ray_aabb_intersect(rays_o, rays_d, centers, half,
                                          max_hits=3)
    assert int(cnt[0]) == 2
    np.testing.assert_allclose(np.asarray(hits_t[0, 0]), [1.5, 2.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hits_t[0, 1]), [4.5, 5.5], atol=1e-6)
    assert idx[0, 0] == 1 and idx[0, 1] == 0 and idx[0, 2] == -1
    np.testing.assert_allclose(np.asarray(hits_t[0, 2]), [-1.0, -1.0])


def test_aabb_matches_bruteforce_random():
    rng = np.random.default_rng(3)
    rays_o = rng.normal(size=(256, 3)).astype(np.float32) * 2
    rays_d = rng.normal(size=(256, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.zeros(3), jnp.full(3, 0.5)))
    # brute force: sample along each ray, check containment
    ts = np.linspace(0, 10, 20001)
    for r in range(64):
        pts = rays_o[r, None] + ts[:, None] * rays_d[r, None]
        inside = np.all(np.abs(pts) <= 0.5, axis=-1)
        if hits[r, 1] > 0:
            t_in = ts[inside]
            assert t_in.size > 0
            assert abs(t_in.min() - max(hits[r, 0], 0)) < 2e-3
            assert abs(t_in.max() - hits[r, 1]) < 2e-3
        else:
            assert not inside.any()


def test_sphere_analytic():
    rays_o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 5.0, 0.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    cnt, hits_t, idx = ray_sphere_intersect(
        rays_o, rays_d, jnp.zeros((1, 3)), jnp.ones(1), max_hits=1)
    assert int(cnt[0]) == 1 and int(cnt[1]) == 0
    np.testing.assert_allclose(np.asarray(hits_t[0, 0]), [2.0, 4.0], atol=1e-5)
    assert idx[1, 0] == -1
