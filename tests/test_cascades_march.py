"""Multi-cascade (exp-dt) two-level march vs the one-level exact march.

Stage A tests strata against the dilated world-space union of all cascades'
occupancy (a strict superset test, ops/morton.union_bitfield), so whenever a
ray's occupied strata fit the s_strata budget the emitted samples must be
IDENTICAL to the exact one-level march (march_rays_train with per-rung
mip-selected lookups, parity with raymarching.cu:205-233).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
from mfnerf_tpu.ops.morton import union_bitfield
from mfnerf_tpu.ops.ray_march import (cascades_stratum, march_rays_train,
                                      march_rays_train_cascades,
                                      march_rays_window,
                                      march_rays_window_cascades)
from mfnerf_tpu.ops.stepping import max_ladder_steps

SCALE = 4.0
CASCADES = 4
GRID = 32
MAX_SAMPLES = 256
E = 1 / 256


def _setup(occ_density=0.02, seed=0, n=192):
    rng = np.random.default_rng(seed)
    n_bits = CASCADES * GRID ** 3
    fine = (rng.random(n_bits) < occ_density).astype(np.uint8)
    fine_bits = jnp.asarray(
        (fine.reshape(-1, 8) << np.arange(8)).sum(1).astype(np.uint8))
    stratum, dilate = cascades_stratum(E, SCALE, CASCADES)
    assert stratum > 0
    union = union_bitfield(fine_bits, GRID, CASCADES, dilate)

    key = jax.random.PRNGKey(seed + 1)
    rays_o = jnp.tile(jnp.asarray([[0.3, -0.2, -SCALE * 1.6]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * jnp.asarray([0.4, 0.4, 0.0]) \
        + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    hits_t = ray_aabb_intersect_single(rays_o, rays_d, jnp.zeros(3),
                                       jnp.full(3, SCALE))
    noise = jax.random.uniform(jax.random.PRNGKey(9), (n,))
    return fine_bits, union, stratum, rays_o, rays_d, hits_t, noise


def test_union_bitfield_is_superset():
    """Every occupied cell of every cascade must map to an occupied union
    cell at its world position (before even counting the dilation)."""
    from mfnerf_tpu.ops.morton import (bitfield_lookup, morton3d,
                                       morton3d_invert)
    fine_bits, union, *_ = _setup(0.01)
    rng = np.random.default_rng(3)
    for c in range(CASCADES):
        s_c = min(2.0 ** (c - 1), SCALE)
        codes = jnp.asarray(rng.integers(0, GRID ** 3, 512, dtype=np.uint32))
        occ = np.asarray(bitfield_lookup(
            fine_bits, (c * GRID ** 3 + codes).astype(jnp.int32)))
        coords = morton3d_invert(codes)
        # world position of the cell center in cascade c's box
        xyz = (coords.astype(jnp.float32) + 0.5) / GRID * 2.0 * s_c - s_c
        nu = jnp.clip(0.5 * (xyz / SCALE + 1.0) * GRID, 0,
                      GRID - 1).astype(jnp.int32)
        u = np.asarray(bitfield_lookup(
            union, morton3d(nu).astype(jnp.int32)))
        assert (u[occ]).all(), f"cascade {c}: union misses occupied cells"


@pytest.mark.parametrize("density", [0.004, 0.02])
def test_cascades_matches_onelevel(density):
    fine_bits, union, stratum, rays_o, rays_d, hits_t, noise = \
        _setup(density)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, E,
                         MAX_SAMPLES, GRID, SCALE)
    s_max = 64

    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, CASCADES,
                           SCALE, E, GRID, MAX_SAMPLES, noise, k, s_max)
    two = march_rays_train_cascades(
        rays_o, rays_d, hits_t, fine_bits, union, CASCADES, SCALE, E, GRID,
        MAX_SAMPLES, noise, k, s_max, stratum, s_strata=96)

    n1 = np.asarray(one.n_samples)
    n2 = np.asarray(two.n_samples)
    exact = (n1 == n2)
    assert exact.mean() > 0.97, f"only {exact.mean():.2%} rays agree"
    m = exact[:, None] & np.asarray(one.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(one.ts), 0),
                               np.where(m, np.asarray(two.ts), 0),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.where(m, np.asarray(one.deltas), 0),
                               np.where(m, np.asarray(two.deltas), 0),
                               rtol=1e-5, atol=1e-7)


def test_cascades_budget_truncation_is_ordered_subsequence():
    fine_bits, union, stratum, rays_o, rays_d, hits_t, noise = _setup(0.06)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, E,
                         MAX_SAMPLES, GRID, SCALE)
    # uncapped one-level reference: stratified truncation spreads the strata
    # budget along the WHOLE ray, so its samples come from the full exact
    # sequence (not its first-s_max prefix)
    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, CASCADES,
                           SCALE, E, GRID, MAX_SAMPLES, noise, k, 256)
    two = march_rays_train_cascades(
        rays_o, rays_d, hits_t, fine_bits, union, CASCADES, SCALE, E, GRID,
        MAX_SAMPLES, noise, k, 64, stratum, s_strata=6)
    ts1, ts2 = np.asarray(one.ts), np.asarray(two.ts)
    n1, n2 = np.asarray(one.n_samples), np.asarray(two.n_samples)
    for i in range(ts1.shape[0]):
        a, b = ts2[i, :n2[i]], ts1[i, :n1[i]]
        if len(a):
            assert (np.diff(a) > 0).all()
        if len(a) and len(b):
            d = np.abs(a[:, None] - b[None, :]).min(axis=1)
            np.testing.assert_array_less(d, 1e-4)


def test_render_paths_use_cascades_march_and_match_oracle():
    """render_train/render_test on a multi-cascade model must dispatch to
    the union-grid march and agree with the dense one-level oracle."""
    import dataclasses as dc

    from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
    from mfnerf_tpu.models.rendering import (RenderConfig, render_test,
                                             render_test_dense)

    cfg = NGPConfig(grid="LowRank", lr_levels=2, lr_rank=8, lr_k_max=64,
                    grid_size=32, scale=4.0, rgb_channels=16, rgb_layers=1,
                    L=4, F=2)
    assert cfg.cascades == 4
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    assert occ.union_bits.shape[0] > 1  # the cascades path is enabled
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 256, occ.density_bitfield.shape,
                        dtype=np.uint8) & 0x11
    occ = dc.replace(occ, density_bitfield=jnp.asarray(bits)) \
        .refresh_coarse(cfg)

    n = 256
    rays_o = jnp.tile(jnp.asarray([[0.1, 0.2, -5.5]]), (n, 1))
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3)) \
        * jnp.asarray([0.4, 0.4, 0.0]) + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    rcfg = RenderConfig(exp_step_factor=1 / 256, max_samples=256,
                        s_max_test=256, test_chunk=256,
                        rounds_full=((1.0, 256, 48),) * 16)
    res_alive = render_test(model, params, occ, rays_o, rays_d, rcfg)
    res_dense = render_test_dense(model, params, occ, rays_o, rays_d, rcfg)
    np.testing.assert_allclose(np.asarray(res_alive["opacity"]),
                               np.asarray(res_dense["opacity"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_alive["rgb"]),
                               np.asarray(res_dense["rgb"]), atol=2e-3)

    # the wavefront renderer's multi-cascade branch (union-grid seek +
    # exp-dt window march inside the persistent pool) vs the same oracle
    for wf in ((64, 32, 32, 8), (48, 0, 48, 16)):
        res_wf = render_test(model, params, occ, rays_o, rays_d,
                             dc.replace(rcfg, wavefront=wf))
        np.testing.assert_allclose(np.asarray(res_wf["opacity"]),
                                   np.asarray(res_dense["opacity"]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_wf["rgb"]),
                                   np.asarray(res_dense["rgb"]), atol=2e-3)


def test_e2e_multicascade_training_learns():
    """Fused training on a spread (scale=2, exp-dt) procedural scene must
    run through the cascades march end-to-end and reduce loss."""
    import argparse

    from mfnerf_tpu.datasets.memory import MemoryDataset
    from mfnerf_tpu.train import NeRFSystem
    from mfnerf_tpu.utils.procedural import make_scene

    hp = argparse.Namespace(
        root_dir="<memory>", dataset_name="nsvf", split="train",
        downsample=1.0, scale=2.0, use_exposure=False,
        distortion_loss_w=0.0, batch_size=512,
        ray_sampling_strategy="all_images", num_epochs=1, num_gpus=1,
        lr=1e-2, optimize_ext=False, random_bg=False, eval_lpips=False,
        val_only=False, no_save_test=True, exp_name="casc",
        ckpt_path=None, weight_path=None, grid="LowRank", L=8, F=2, T=14,
        N_min=16, N_max=128, N_tables=1, rgb_channels=16, rgb_layers=1,
        seed=0, s_max_train=48, s_max_test=48, test_chunk=2048,
        lpips_weights=None, profile=False, steps_per_epoch=64,
        grid_size=32, max_samples=128, lr_levels=3, lr_rank=8,
        lr_frames=2, lr_k_max=64, bf16=False, s_flat=0, lr_fused=True)

    import jax
    import jax.numpy as jnp
    scene = make_scene(n_train=4, n_test=1, wh=48, seed=1, spread=2.5)
    system = NeRFSystem(hp)
    assert system.model_cfg.cascades == 3
    assert system.rcfg.exp_step_factor == 1 / 256
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    assert system.occ.union_bits.shape[0] > 1

    fused = system.make_fused_train_fn(n_img=4, hw=48 * 48)
    rays = jnp.asarray(system.train_dataset.rays)
    p, o, occ, m0 = fused(system.params, system.opt_state, system.occ,
                          system.poses, system.directions, rays,
                          jax.random.PRNGKey(1), 0, 16)
    p, o, occ, m1 = fused(p, o, occ, system.poses, system.directions, rays,
                          jax.random.PRNGKey(2), 16, 48)
    assert float(m1["loss"]) < float(m0["loss"])
    assert float(m1["psnr"]) > 10.0


def test_window_cascades_covers_ladder_like_onelevel_window():
    """Accumulating windowed cascades marches over the whole ladder must
    reproduce the one-shot exact march's sample set."""
    fine_bits, union, stratum, rays_o, rays_d, hits_t, noise = _setup(0.01)
    k = max_ladder_steps(0.01, 2 * 1.7320508 * SCALE + 0.01, E,
                         MAX_SAMPLES, GRID, SCALE)
    n = rays_o.shape[0]
    t1 = jnp.maximum(hits_t[:, 0], 0.0)
    t2 = jnp.where(hits_t[:, 0] >= 0, hits_t[:, 1], -1.0)
    zero_noise = jnp.zeros((n,))

    one = march_rays_train(rays_o, rays_d, hits_t, fine_bits, CASCADES,
                           SCALE, E, GRID, MAX_SAMPLES, zero_noise, k, 128)

    cursor = jnp.zeros((n,), jnp.int32)
    collected = [[] for _ in range(n)]
    w_len, s_cap = 256, 32
    for _ in range(-(-k // w_len) + 4):
        mr = march_rays_window_cascades(
            rays_o, rays_d, t1, t2, cursor, fine_bits, union, CASCADES,
            SCALE, E, GRID, MAX_SAMPLES, w_len, s_cap, stratum,
            s_strata=96)
        ns = np.asarray(mr.n_samples)
        ts = np.asarray(mr.ts)
        for i in range(n):
            collected[i].extend(ts[i, :ns[i]].tolist())
        cursor = mr.cursor
        if bool((np.asarray(cursor) >= k).all()):
            break

    n1 = np.asarray(one.n_samples)
    ts1 = np.asarray(one.ts)
    agree = 0
    for i in range(n):
        got = np.asarray(collected[i][:128])
        want = ts1[i, :n1[i]]
        if len(got) == len(want) and np.allclose(got, want, rtol=1e-5,
                                                 atol=1e-6):
            agree += 1
    assert agree / n > 0.95, f"only {agree}/{n} rays agree"
