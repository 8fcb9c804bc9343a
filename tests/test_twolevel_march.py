"""Two-level (coarse-strata) training march vs the one-level exact march.

The coarse stage is a strict superset test (dilated half-res bitfield), so
whenever a ray's occupied strata fit the s_strata budget the emitted sample
set must be IDENTICAL to the one-level march.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfnerf_tpu.ops.morton import occupancy_nbr_tables
from mfnerf_tpu.ops.ray_march import (march_rays_train,
                                      march_rays_train_twolevel,
                                      twolevel_stratum)
from mfnerf_tpu.ops.stepping import max_ladder_steps

SCALE = 0.5
GRID = 64
MAX_SAMPLES = 512  # dt_min = sqrt(3)/512


def _setup(occ_density=0.02, seed=0, n=256, dir_norm=1.0):
    rng = np.random.default_rng(seed)
    n_bytes = GRID ** 3 // 8
    fine = (rng.random(n_bytes * 8) < occ_density).astype(np.uint8)
    fine_bits = jnp.asarray(
        (fine.reshape(-1, 8) << np.arange(8)).sum(1).astype(np.uint8))
    _, dilate = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1, dir_norm)
    coarse_nbr, fine_nbr = occupancy_nbr_tables(fine_bits, GRID,
                                                dilate=dilate)

    key = jax.random.PRNGKey(seed + 1)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.3]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * jnp.asarray([0.35, 0.35, 0.0]) \
        + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    if dir_norm != 1.0:
        # camera-style UNNORMALIZED directions: |d| in (1, dir_norm],
        # worst-case corners included (datasets/ray_utils module doc)
        s = 1.0 + (dir_norm - 1.0) * jax.random.uniform(
            jax.random.PRNGKey(seed + 2), (n, 1))
        s = s.at[: n // 8].set(dir_norm)  # pin some rays at the bound
        rays_d = rays_d * s

    from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
    hits_t = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                       jnp.full(3, SCALE))
    noise = jax.random.uniform(jax.random.PRNGKey(9), (n,))
    return fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise


def test_stratum_selection():
    # the stratum is fine-window-limited (8^3 rows cover up to 33 rungs,
    # capped 32); stage-A conservativeness is bought with MULTIPLE probe
    # points per stratum at fixed ±1-cell dilation (rounds 2-3 instead
    # capped the stratum at 2*cell/dt = 18 with one center probe)
    assert twolevel_stratum(0.0, 1024, 0.5, 128, 1) == (32, 1)
    assert twolevel_stratum(0.0, 256, 0.5, 128, 1) == (9, 1)
    assert twolevel_stratum(1 / 256, 1024, 0.5, 128, 1) == (0, 0)  # real
    assert twolevel_stratum(0.0, 1024, 4.0, 128, 4) == (0, 0)  # cascades
    # unnormalized camera directions shrink the stratum / add probes by
    # the direction-norm bound (a 53-deg-fov corner ray has |d| ~1.22;
    # rays are NOT unit vectors, datasets/ray_utils module doc)
    assert twolevel_stratum(0.0, 256, 0.5, 64, 1, 1.25) == (13, 1)
    s1, _ = twolevel_stratum(0.0, 1024, 0.5, 128, 1, 1.25)
    assert s1 < 32


def test_stage_a_probe_coverage():
    """Every rung of a stratum must lie within one coarse cell of a probe
    point (spatially), so the ±1-dilated coarse test at the probes is a
    strict superset test for any stratum/dir_norm combination."""
    from mfnerf_tpu.ops.ray_march import stage_a_probes

    for ms, g, dn in [(1024, 128, 1.0), (1024, 128, 1.25), (256, 64, 1.25),
                      (512, 64, 1.75), (128, 32, 1.25)]:
        stratum, dil = twolevel_stratum(0.0, ms, 0.5, g, 1, dn)
        if not stratum:
            continue
        assert dil == 1
        dt_eff = 1.7320508 / ms * dn
        cell = 2.0 * 0.5 / (g // 2)
        offs = np.asarray(stage_a_probes(stratum, dt_eff, cell))
        rungs = np.arange(stratum)
        dist = np.abs(rungs[:, None] - offs[None, :]).min(axis=1) * dt_eff
        assert (dist <= cell + 1e-9).all(), (ms, g, dn, stratum, offs)


@pytest.mark.parametrize("density", [0.005, 0.03])
def test_twolevel_matches_onelevel(density):
    fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise = \
        _setup(density)
    stratum, _ = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1)
    assert stratum >= 2
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, 0.0,
                         MAX_SAMPLES, GRID, SCALE)
    s_max = 64

    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, 1, SCALE,
                           0.0, GRID, MAX_SAMPLES, noise, k, s_max)
    two = march_rays_train_twolevel(
        rays_o, rays_d, hits_t, fine_nbr, coarse_nbr, SCALE, 0.0, GRID,
        MAX_SAMPLES, noise, k, s_max, stratum, s_strata=64)

    # rays whose occupied strata fit the budget must agree exactly
    n1 = np.asarray(one.n_samples)
    n2 = np.asarray(two.n_samples)
    agree = n2 >= n1  # two-level may only lose samples via budget truncation
    # with a generous budget, require exact agreement on nearly all rays
    exact = (n1 == n2)
    assert exact.mean() > 0.98, f"only {exact.mean():.2%} rays agree"
    m = exact[:, None] & np.asarray(one.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(one.ts), 0),
                               np.where(m, np.asarray(two.ts), 0),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.where(m, np.asarray(one.deltas), 0),
                               np.where(m, np.asarray(two.deltas), 0),
                               rtol=1e-5, atol=1e-7)
    assert agree.all() or exact.mean() > 0.98


@pytest.mark.parametrize("pool,dir_norm", [(4, 1.0), (4, 1.25), (8, 1.0)])
def test_twolevel_pooled_stage_a_matches_onelevel(pool, dir_norm):
    """Stage A on a POOLED (G/pool) table (NGPConfig.pool_a training path)
    must stay sample-for-sample conservative: the coarser dilated cell only
    adds stage-A false positives, which the exact stage-B test discards, so
    the emitted samples still match the one-level march exactly whenever
    the strata budget holds."""
    from mfnerf_tpu.ops.morton import pooled_stage_a_table

    fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise = \
        _setup(0.03, dir_norm=dir_norm)
    stratum, _ = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1, dir_norm)
    assert stratum >= 2
    pool_nbr = pooled_stage_a_table(fine_bits, GRID, pool=pool, dilate=1)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, 0.0,
                         MAX_SAMPLES, GRID, SCALE)
    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, 1, SCALE,
                           0.0, GRID, MAX_SAMPLES, noise, k, 64)
    two = march_rays_train_twolevel(
        rays_o, rays_d, hits_t, fine_nbr, coarse_nbr, SCALE, 0.0, GRID,
        MAX_SAMPLES, noise, k, 64, stratum, s_strata=64, dir_norm=dir_norm,
        nbr_a=pool_nbr, g_a=GRID // pool)
    n1, n2 = np.asarray(one.n_samples), np.asarray(two.n_samples)
    exact = (n1 == n2)
    assert exact.mean() > 0.98, f"only {exact.mean():.2%} rays agree"
    m = exact[:, None] & np.asarray(one.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(one.ts), 0),
                               np.where(m, np.asarray(two.ts), 0),
                               rtol=1e-5, atol=1e-7)


def test_pooled_stage_a_validation():
    """nbr_a without g_a raises a clear error; non-divisible pool factors
    are rejected with a descriptive message (ADVICE r4)."""
    from mfnerf_tpu.ops.morton import pooled_stage_a_table

    fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise = \
        _setup(0.03)
    stratum, _ = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1)
    pool_nbr = pooled_stage_a_table(fine_bits, GRID, pool=4, dilate=1)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, 0.0,
                         MAX_SAMPLES, GRID, SCALE)
    with pytest.raises(ValueError, match="g_a"):
        march_rays_train_twolevel(
            rays_o, rays_d, hits_t, fine_nbr, coarse_nbr, SCALE, 0.0, GRID,
            MAX_SAMPLES, noise, k, 64, stratum, nbr_a=pool_nbr)
    with pytest.raises(ValueError, match="divisible"):
        pooled_stage_a_table(fine_bits, GRID, pool=5, dilate=1)


@pytest.mark.parametrize("dir_norm", [1.25, 1.75])
def test_twolevel_matches_onelevel_unnormalized_dirs(dir_norm):
    """Camera rays are UNNORMALIZED (|d| up to ~1.2 at a 53-deg-fov corner,
    more for wider lenses): a ladder t-step moves dt*|d| through space, so
    the stratum/dilation bounds must scale with the direction-norm bound.
    Regression: the r4 exact-boundary stratum derived for |d| = 1 overran
    the 8^3 fine row on corner rays and silently DROPPED their first rung
    (caught as a wavefront-vs-oracle pixel mismatch in the exposure
    fixture)."""
    fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise = \
        _setup(0.03, dir_norm=dir_norm)
    stratum, _ = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1,
                                  dir_norm)
    assert stratum >= 2
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, 0.0,
                         MAX_SAMPLES, GRID, SCALE)
    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, 1, SCALE,
                           0.0, GRID, MAX_SAMPLES, noise, k, 64)
    two = march_rays_train_twolevel(
        rays_o, rays_d, hits_t, fine_nbr, coarse_nbr, SCALE, 0.0, GRID,
        MAX_SAMPLES, noise, k, 64, stratum, s_strata=64, dir_norm=dir_norm)
    n1, n2 = np.asarray(one.n_samples), np.asarray(two.n_samples)
    exact = (n1 == n2)
    assert exact.mean() > 0.98, f"only {exact.mean():.2%} rays agree"
    m = exact[:, None] & np.asarray(one.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(one.ts), 0),
                               np.where(m, np.asarray(two.ts), 0),
                               rtol=1e-5, atol=1e-7)


def test_twolevel_budget_truncation_is_ordered_subsequence():
    """With a tiny strata budget, the emitted samples must be an ORDERED
    SUBSEQUENCE of the one-level sample sequence — stratified along the ray
    (first-k truncation starves the far scene; see march docstring), never
    out-of-order or fabricated."""
    fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise = \
        _setup(0.08)
    stratum, _ = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, 0.0,
                         MAX_SAMPLES, GRID, SCALE)
    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, 1, SCALE,
                           0.0, GRID, MAX_SAMPLES, noise, k, 64)
    two = march_rays_train_twolevel(
        rays_o, rays_d, hits_t, fine_nbr, coarse_nbr, SCALE, 0.0, GRID,
        MAX_SAMPLES, noise, k, 64, stratum, s_strata=4)
    ts1, ts2 = np.asarray(one.ts), np.asarray(two.ts)
    n1 = np.asarray(one.n_samples)
    n2 = np.asarray(two.n_samples)
    for i in range(ts1.shape[0]):
        a, b = ts2[i, :n2[i]], ts1[i, :n1[i]]
        assert (np.diff(a) > 0).all()  # strictly increasing (ordered)
        # every emitted t is one of the one-level sample t's
        if len(a) and len(b):
            d = np.abs(a[:, None] - b[None, :]).min(axis=1)
            np.testing.assert_array_less(d, 1e-5)


def test_window_march_indivisible_window_never_reemits():
    """Windowed two-level march with a window NOT a multiple of the stratum:
    walking the full ladder window-by-window must emit each rung at most
    once and the union must equal the one-level sample set. Regression for
    the selected-stratum-tail overlap (a stratum crossing cursor+n_window
    emitted rungs the resumed cursor re-tested — double-composited samples;
    the quickstart config has stratum 18 with windows 48/64/96/..., so the
    synthetic alive renderer was exposed)."""
    from mfnerf_tpu.ops.ray_march import march_rays_window_twolevel

    fine_bits, (fine_nbr, coarse_nbr), rays_o, rays_d, hits_t, noise = \
        _setup(0.05)
    stratum, _ = twolevel_stratum(0.0, MAX_SAMPLES, SCALE, GRID, 1)
    assert stratum not in (0, 1)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, 0.0,
                         MAX_SAMPLES, GRID, SCALE)
    t1 = jnp.maximum(hits_t[:, 0], 0.01)
    valid = hits_t[:, 0] >= 0
    ts0 = jnp.where(valid, t1, 0.0)
    t2 = jnp.where(valid, hits_t[:, 1], -1.0)

    for w, cap in ((16, 4), (stratum + 1, 6), (3 * stratum - 1, 8)):
        cur = jnp.zeros((rays_o.shape[0],), jnp.int32)
        emitted = [[] for _ in range(rays_o.shape[0])]
        for _ in range(400):
            mr = march_rays_window_twolevel(
                rays_o, rays_d, ts0, t2, cur, fine_nbr, coarse_nbr, SCALE,
                0.0, GRID, MAX_SAMPLES, w, cap, stratum)
            kk, m = np.asarray(mr.k_idx), np.asarray(mr.mask)
            for i in range(rays_o.shape[0]):
                emitted[i].extend(kk[i][m[i]].tolist())
            done = np.asarray(mr.exhausted) | (np.asarray(mr.cursor) >= k)
            cur = jnp.where(done, k, mr.cursor).astype(jnp.int32)
            if bool(done.all()):
                break
        for i in range(rays_o.shape[0]):
            assert len(set(emitted[i])) == len(emitted[i]), \
                f"w={w}: ray {i} re-emitted rungs"

    # union equals the exact one-level set (generous cap, one window cfg)
    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, 1, SCALE,
                           0.0, GRID, MAX_SAMPLES, jnp.zeros_like(noise),
                           k, 64)
    n1 = np.asarray(one.n_samples)
    k1 = np.asarray(one.k_idx)
    cur = jnp.zeros((rays_o.shape[0],), jnp.int32)
    emitted = [[] for _ in range(rays_o.shape[0])]
    for _ in range(400):
        mr = march_rays_window_twolevel(
            rays_o, rays_d, ts0, t2, cur, fine_nbr, coarse_nbr, SCALE,
            0.0, GRID, MAX_SAMPLES, 2 * stratum - 1, 16, stratum)
        kk, m = np.asarray(mr.k_idx), np.asarray(mr.mask)
        for i in range(rays_o.shape[0]):
            emitted[i].extend(kk[i][m[i]].tolist())
        done = np.asarray(mr.exhausted) | (np.asarray(mr.cursor) >= k)
        cur = jnp.where(done, k, mr.cursor).astype(jnp.int32)
        if bool(done.all()):
            break
    for i in range(rays_o.shape[0]):
        got = sorted(emitted[i])
        want = sorted(k1[i, :n1[i]].tolist())
        # windowed emissions may exceed the one-level s_max budget cap;
        # require the one-level set to be a prefix-subset of the union
        assert set(want) <= set(got), f"ray {i} missing rungs"
