"""Multi-round alive-ray test renderer vs the dense single-pass oracle.

Both evaluate the same t-ladder samples with the same T-threshold inclusion
semantics, so with a generous round schedule (full capacity every round,
windows covering the whole ladder) the images must agree to float tolerance.
A second test checks the shrinking-capacity schedule stays close on a
realistic (trained-free) field where most rays terminate early.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
from mfnerf_tpu.models.rendering import (RenderConfig, render_test,
                                         render_test_dense)


def _setup(seed=0, occ_fill=0x33):
    cfg = NGPConfig(grid="Hash", L=4, log2_T=12, N_max=64, grid_size=32,
                    scale=0.5, rgb_channels=16, rgb_layers=1)
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    occ = OccupancyState.create(cfg)
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 256, occ.density_bitfield.shape,
                        dtype=np.uint8) & occ_fill
    import dataclasses
    occ = dataclasses.replace(
        occ, density_bitfield=jnp.asarray(bits)).refresh_coarse(cfg)

    n = 512
    key = jax.random.PRNGKey(seed + 1)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.4]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * jnp.asarray([0.3, 0.3, 0.0]) \
        + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return model, params, occ, rays_o, rays_d


def test_alive_matches_dense_with_full_capacity():
    model, params, occ, rays_o, rays_d = _setup()
    # full capacity every round; enough window+samples to cover the ladder
    rcfg = RenderConfig(
        max_samples=128, s_max_test=256, test_chunk=512,
        rounds=((1.0, 64, 16),) * 16,
        rounds_full=((1.0, 64, 16),) * 16)
    res_alive = render_test(model, params, occ, rays_o, rays_d, rcfg)
    res_dense = render_test_dense(model, params, occ, rays_o, rays_d, rcfg)
    np.testing.assert_allclose(np.asarray(res_alive["opacity"]),
                               np.asarray(res_dense["opacity"]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_alive["rgb"]),
                               np.asarray(res_dense["rgb"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_alive["depth"]),
                               np.asarray(res_dense["depth"]), atol=2e-3)


def test_alive_shrinking_schedule_matches_when_rays_exhaust():
    # sparse occupancy (1/8 cells): rays pick up a handful of samples then
    # exhaust as the cursor passes the scene exit — capacity shrinks in the
    # late rounds without dropping any still-alive ray
    model, params, occ, rays_o, rays_d = _setup(occ_fill=0x01)
    rcfg = RenderConfig(
        max_samples=128, s_max_test=256, test_chunk=512,
        rounds=((1.0, 32, 8), (1.0, 32, 8), (1.0, 64, 16),
                (0.5, 128, 32), (0.25, 256, 64)),
        rounds_full=((1.0, 32, 8), (1.0, 32, 8), (1.0, 64, 16),
                     (0.5, 128, 32), (0.25, 256, 64)))
    res_alive = render_test(model, params, occ, rays_o, rays_d, rcfg)
    res_dense = render_test_dense(model, params, occ, rays_o, rays_d, rcfg)
    np.testing.assert_allclose(np.asarray(res_alive["rgb"]),
                               np.asarray(res_dense["rgb"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_alive["opacity"]),
                               np.asarray(res_dense["opacity"]), atol=1e-3)
    assert res_alive["total_samples"] > 0


def test_flat_rounds_match_padded_rounds():
    """Rounds with a flat sample budget (4-tuple schedule entries) must
    reproduce the padded rounds exactly: generous budget -> identical
    compaction; tight budget -> exact truncation with cursor resume, so the
    final image still matches given later rounds with capacity to spare."""
    for occ_fill in (0x33, 0x01):
        model, params, occ, rays_o, rays_d = _setup(occ_fill=occ_fill)
        base = ((1.0, 32, 8), (1.0, 32, 8), (1.0, 64, 16),
                (0.5, 128, 32), (0.25, 256, 64), (0.25, 256, 64))
        rcfg_pad = RenderConfig(max_samples=128, s_max_test=256,
                                test_chunk=512, rounds=base,
                                rounds_full=base)
        # generous flat budgets (q == s_cap-1 < s_cap triggers flat path but
        # rarely truncates) and tight ones (heavy truncation)
        for qs in ((7, 7, 15, 31, 63, 63), (2, 2, 4, 8, 16, 63)):
            flat = tuple(r + (q,) for r, q in zip(base, qs))
            rcfg_flat = dataclasses.replace(rcfg_pad, rounds=flat,
                                            rounds_full=flat)
            res_p = render_test(model, params, occ, rays_o, rays_d, rcfg_pad)
            res_f = render_test(model, params, occ, rays_o, rays_d,
                                rcfg_flat)
            np.testing.assert_allclose(np.asarray(res_f["rgb"]),
                                       np.asarray(res_p["rgb"]), atol=2e-3)
            np.testing.assert_allclose(np.asarray(res_f["opacity"]),
                                       np.asarray(res_p["opacity"]),
                                       atol=2e-3)
            np.testing.assert_allclose(np.asarray(res_f["depth"]),
                                       np.asarray(res_p["depth"]),
                                       atol=5e-3)


def test_alive_handles_missing_rays():
    model, params, occ, rays_o, rays_d = _setup()
    # point half the rays away from the box: they must return pure background
    rays_d = np.array(rays_d)
    rays_d[::2] = np.array([0.0, 0.0, -1.0])
    rays_d = jnp.asarray(rays_d)
    rcfg = RenderConfig(max_samples=128, rounds=((1.0, 64, 8),) * 4,
                        rounds_full=((1.0, 64, 8),) * 4)
    res = render_test(model, params, occ, rays_o, rays_d, rcfg)
    rgb = np.asarray(res["rgb"])
    np.testing.assert_allclose(rgb[::2], 1.0, atol=1e-6)  # white bg
    assert np.asarray(res["opacity"])[::2].max() == 0.0


def test_rasterized_ranges_match_full_march():
    """render_test with the per-frame rasterized [t_near, t_far] prepass must
    reproduce the no-prepass image (the block ranges are conservative)."""
    import jax
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
    from mfnerf_tpu.train import NeRFSystem  # noqa: F401 (env setup)
    from mfnerf_tpu.utils.procedural import make_scene

    scene = make_scene(n_train=2, n_test=1, wh=48, seed=3)
    cfg = NGPConfig(grid="LowRank", lr_levels=2, lr_rank=8, lr_k_max=64,
                    grid_size=32, scale=0.5)
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    occ = model.update_density_grid(params, occ, jax.random.PRNGKey(1),
                                    density_threshold=0.01, warmup=True)

    rcfg = RenderConfig(max_samples=128, rounds=((1.0, 64, 16),) * 8,
                        rounds_full=((1.0, 64, 16),) * 8)
    directions = jnp.asarray(scene["directions"])
    pose = jnp.asarray(scene["test_poses"][0])
    rays_o, rays_d = get_rays(directions, pose)

    plain = render_test(model, params, occ, rays_o, rays_d, rcfg)
    fast = render_test(model, params, occ, rays_o, rays_d, rcfg,
                       camera=(scene["K"], pose, (48, 48)))
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(plain["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast["opacity"]),
                               np.asarray(plain["opacity"]), atol=2e-3)
    # and the prepass must actually engage (fewer marched samples), not
    # silently fall back to the full march
    assert fast["total_samples"] <= plain["total_samples"]


def test_starving_schedule_completes_via_sweep():
    """A schedule whose capacities can't possibly cover all alive rays must
    STILL produce the oracle image: the completion sweep (while_loop'd
    fixed-shape straggler rounds, rendering.py) picks up every ray the
    static rounds dropped. Regression for the round-2 contract run, where
    content-dense 800x800 frames starved (8 dB vs the 29.9 dB oracle)."""
    model, params, occ, rays_o, rays_d = _setup()
    rcfg = RenderConfig(
        max_samples=128, s_max_test=256, test_chunk=512,
        # one tiny round: 2% capacity, 32-rung window, cap 4 — hopeless
        # without the sweep
        rounds=((0.02, 32, 4),),
        rounds_full=((0.02, 32, 4),),
        straggler=(64, 64, 16))
    res_alive = render_test(model, params, occ, rays_o, rays_d, rcfg)
    res_dense = render_test_dense(model, params, occ, rays_o, rays_d, rcfg)
    np.testing.assert_allclose(np.asarray(res_alive["rgb"]),
                               np.asarray(res_dense["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_alive["opacity"]),
                               np.asarray(res_dense["opacity"]), atol=2e-3)


def test_two_stage_sweep_completes_like_single_stage():
    """straggler2 (small-capacity tail stage) must not change the image:
    the main sweep stops at <= straggler2-capacity alive rays and the tail
    stage drains the rest. Same starving schedule as above, so completion
    rests entirely on the two sweep stages."""
    import dataclasses
    model, params, occ, rays_o, rays_d = _setup()
    rcfg = RenderConfig(
        max_samples=128, s_max_test=256, test_chunk=512,
        rounds=((0.02, 32, 4),), rounds_full=((0.02, 32, 4),),
        straggler=(128, 64, 16), straggler2=(16, 128, 8))
    res_alive = render_test(model, params, occ, rays_o, rays_d, rcfg)
    res_dense = render_test_dense(model, params, occ, rays_o, rays_d,
                                  dataclasses.replace(rcfg, straggler2=None))
    np.testing.assert_allclose(np.asarray(res_alive["rgb"]),
                               np.asarray(res_dense["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_alive["opacity"]),
                               np.asarray(res_dense["opacity"]), atol=2e-3)


def test_wavefront_matches_dense_oracle():
    """Persistent-pool (wavefront) renderer vs the dense oracle: refill
    from the ray queue + structural completion must reproduce the oracle
    exactly at ANY pool/window/cap — including a pool smaller than the
    frame, a window that is not a multiple of the coarse stratum, and a
    disabled seek phase."""
    import dataclasses
    for fill in (0x33, 0x01):
        model, params, occ, rays_o, rays_d = _setup(occ_fill=fill)
        rcfg0 = RenderConfig(max_samples=128, s_max_test=256,
                             test_chunk=512)
        dense = render_test_dense(model, params, occ, rays_o, rays_d, rcfg0)
        # the last two exercise the pool-size CASCADE (stage exits when the
        # queue is drained and <= next-pool rays are alive, alive rows
        # compact into the smaller pool) incl. a pool above the ray count
        for wf in ((64, 32, 32, 8), (17, 16, 16, 4), (128, 0, 64, 16),
                   ((128, 32), 0, 64, 8), ((1024, 96, 13), 16, 32, 4)):
            rcfg = dataclasses.replace(rcfg0, wavefront=wf)
            res = render_test(model, params, occ, rays_o, rays_d, rcfg)
            np.testing.assert_allclose(np.asarray(res["rgb"]),
                                       np.asarray(dense["rgb"]), atol=2e-4)
            np.testing.assert_allclose(np.asarray(res["opacity"]),
                                       np.asarray(dense["opacity"]),
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(res["depth"]),
                                       np.asarray(dense["depth"]),
                                       atol=2e-3)


def test_chunked_padded_eval_matches_unchunked():
    # eval_chunk splits each padded round's field eval into sequential
    # lax.map chunks (HBM bound on the transient hat basis). Force a tiny
    # chunk so the path runs at test scale; outputs must match the
    # unchunked program exactly (same samples, same math, only batching
    # differs).
    model, params, occ, rays_o, rays_d = _setup()
    base = RenderConfig(
        max_samples=128, s_max_test=256, test_chunk=512,
        rounds=((1.0, 64, 16), (0.5, 128, 32), (0.25, 256, 64)),
        rounds_full=((1.0, 64, 16), (0.5, 128, 32), (0.25, 256, 64)))
    res_un = render_test(model, params, occ, rays_o, rays_d,
                         dataclasses.replace(base, eval_chunk=0))
    # 100 does not divide any round's c*s_cap -> exercises the pad+slice
    res_ch = render_test(model, params, occ, rays_o, rays_d,
                         dataclasses.replace(base, eval_chunk=100))
    np.testing.assert_allclose(np.asarray(res_ch["rgb"]),
                               np.asarray(res_un["rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_ch["opacity"]),
                               np.asarray(res_un["opacity"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_ch["depth"]),
                               np.asarray(res_un["depth"]), atol=1e-6)


def test_dense_oracle_resumes_past_s_max_test():
    """r3 VERDICT weak #4: the dense oracle used to march at most
    s_max_test occupied rungs in ONE pass with no resume, silently
    under-compositing any ray with more content. It now composites in
    ceil(max_samples / s_max_test) rank windows, so a fully-occupied grid
    (every ray carries ~max_samples occupied rungs, far beyond a small
    s_max_test) must render identically at s_max_test=32 and 256 — and the
    wavefront renderer must still match that oracle."""
    model, params, occ, rays_o, rays_d = _setup()
    # force EVERY cell occupied (the _setup fill is an AND-mask over random
    # bytes, ~50% occupancy — not dense enough to overrun s_max_test=32)
    occ = dataclasses.replace(
        occ, density_bitfield=jnp.full_like(occ.density_bitfield, 255)
    ).refresh_coarse(model.cfg)
    small = RenderConfig(max_samples=128, s_max_test=32, test_chunk=512)
    big = RenderConfig(max_samples=128, s_max_test=256, test_chunk=512)
    res_small = render_test_dense(model, params, occ, rays_o, rays_d, small)
    res_big = render_test_dense(model, params, occ, rays_o, rays_d, big)
    # the scene must actually exceed the small budget per ray on average,
    # or this test proves nothing
    assert res_big["total_samples"] > 32 * rays_o.shape[0]
    np.testing.assert_allclose(np.asarray(res_small["rgb"]),
                               np.asarray(res_big["rgb"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_small["opacity"]),
                               np.asarray(res_big["opacity"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_small["depth"]),
                               np.asarray(res_big["depth"]), atol=2e-3)

    wf = dataclasses.replace(small, wavefront=(64, 0, 64, 16))
    res_wf = render_test(model, params, occ, rays_o, rays_d, wf)
    np.testing.assert_allclose(np.asarray(res_wf["rgb"]),
                               np.asarray(res_big["rgb"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_wf["opacity"]),
                               np.asarray(res_big["opacity"]), atol=2e-4)

def test_multiframe_batch_matches_per_frame():
    """render_test_frames (F frames through ONE wavefront queue) must
    reproduce the per-frame render_test images exactly: the pool is
    frame-agnostic — batching only changes WHEN rows enter the pool, not
    the samples any ray composites."""
    import jax
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
    from mfnerf_tpu.models.rendering import render_test_frames
    from mfnerf_tpu.utils.procedural import make_scene

    scene = make_scene(n_train=2, n_test=3, wh=32, seed=5)
    cfg = NGPConfig(grid="LowRank", lr_levels=2, lr_rank=8, lr_k_max=64,
                    grid_size=32, scale=0.5)
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    occ = model.update_density_grid(params, occ, jax.random.PRNGKey(1),
                                    density_threshold=0.01, warmup=True)

    rcfg = RenderConfig(max_samples=128, wavefront=(96, 0, 64, 8))
    directions = jnp.asarray(scene["directions"])
    frames = []
    singles = []
    for i in range(3):
        pose = jnp.asarray(scene["test_poses"][i])
        rays_o, rays_d = get_rays(directions, pose)
        cam = (scene["K"], pose, (32, 32))
        frames.append((rays_o, rays_d, cam))
        singles.append(render_test(model, params, occ, rays_o, rays_d,
                                   rcfg, camera=cam))
    batched = render_test_frames(model, params, occ, frames, rcfg)
    for single, multi in zip(singles, batched):
        np.testing.assert_allclose(np.asarray(multi["rgb"]),
                                   np.asarray(single["rgb"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(multi["opacity"]),
                                   np.asarray(single["opacity"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(multi["depth"]),
                                   np.asarray(single["depth"]), atol=2e-3)
