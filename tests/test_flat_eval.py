"""Flat (ragged) training evaluation vs the padded (N, S) path.

Both paths composite the same marched samples with the same T-threshold
semantics, so rendered outputs AND parameter gradients must agree to float
tolerance whenever the flat batch budget holds every valid sample.
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mfnerf_tpu.losses import NeRFLoss
from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
from mfnerf_tpu.models.rendering import RenderConfig, render_train


def _setup(seed=0):
    cfg = NGPConfig(grid="LowRank", lr_levels=2, lr_rank=8, lr_k_max=64,
                    grid_size=32, scale=0.5, rgb_channels=16, rgb_layers=1)
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    occ = OccupancyState.create(cfg)
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 256, occ.density_bitfield.shape, dtype=np.uint8) \
        & 0x31
    occ = dataclasses.replace(
        occ, density_bitfield=jnp.asarray(bits)).refresh_coarse(cfg)

    n = 256
    key = jax.random.PRNGKey(seed + 1)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.3]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * jnp.asarray([0.3, 0.3, 0.0]) \
        + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return model, params, occ, rays_o, rays_d


def _outputs(model, params, occ, rays_o, rays_d, rcfg):
    return render_train(model, params, occ, rays_o, rays_d,
                        jax.random.PRNGKey(7), rcfg)


def test_flat_matches_padded_outputs_and_grads():
    model, params, occ, rays_o, rays_d = _setup()
    base = dict(max_samples=256, s_max_train=64)
    rcfg_pad = RenderConfig(s_flat=0, **base)
    rcfg_flat = RenderConfig(s_flat=64, **base)  # budget >= every sample

    out_pad = _outputs(model, params, occ, rays_o, rays_d, rcfg_pad)
    out_flat = _outputs(model, params, occ, rays_o, rays_d, rcfg_flat)
    for k in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(out_flat[k]),
                                   np.asarray(out_pad[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    assert int(out_flat["vr_samples"]) == int(out_pad["vr_samples"])

    target = jax.random.uniform(jax.random.PRNGKey(9),
                                (rays_o.shape[0], 3))

    def loss_fn(params, rcfg):
        res = _outputs(model, params, occ, rays_o, rays_d, rcfg)
        loss_d = NeRFLoss(lambda_distortion=1e-2)(res, {"rgb": target})
        return sum(v.mean() for v in loss_d.values())

    l_pad, g_pad = jax.value_and_grad(loss_fn)(params, rcfg_pad)
    l_flat, g_flat = jax.value_and_grad(loss_fn)(params, rcfg_flat)
    np.testing.assert_allclose(float(l_flat), float(l_pad), rtol=1e-5)
    flat_p, _ = jax.tree_util.tree_flatten(g_pad)
    flat_f, _ = jax.tree_util.tree_flatten(g_flat)
    for a, b in zip(flat_p, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)


def test_flat_budget_truncation_is_graceful():
    """An undersized flat budget must only DROP samples (dimmer pixels),
    never corrupt other rays."""
    model, params, occ, rays_o, rays_d = _setup(seed=2)
    base = dict(max_samples=256, s_max_train=64)
    out_pad = _outputs(model, params, occ, rays_o, rays_d,
                       RenderConfig(s_flat=0, **base))
    out_tiny = _outputs(model, params, occ, rays_o, rays_d,
                        RenderConfig(s_flat=4, **base))
    op_pad = np.asarray(out_pad["opacity"])
    op_tiny = np.asarray(out_tiny["opacity"])
    assert (op_tiny <= op_pad + 1e-5).all()
    assert np.isfinite(np.asarray(out_tiny["rgb"])).all()


def test_segment_helpers_survive_large_global_prefix():
    """seg_sum / seg_excl_cumsum reconstruct SMALL per-segment values as
    differences of a GLOBAL prefix sum. At production flat-batch sizes the
    prefix reaches ~1e7 (sigma*dt up to 80 over millions of samples) where
    one fp32 ulp is ~1 — a plain-cumsum implementation returned sd_excl
    wrong by O(1), i.e. transmittance off by e^{+-1} (13-31 dB vs the
    oracle at 800x800, TPU 2026-08-18). The compensated double-single scan
    must stay accurate to ~1e-4 absolute at that magnitude."""
    from mfnerf_tpu.ops.composite import seg_excl_cumsum, seg_sum

    rng = np.random.default_rng(0)
    n, length = 100_000, 16  # global prefix ~ 8e6
    x = rng.uniform(0, 10, size=(n * length,)).astype(np.float32)
    offsets = (np.arange(n, dtype=np.int32) * length)
    ray_id = np.repeat(np.arange(n), length).astype(np.int32)

    excl = np.asarray(seg_excl_cumsum(jnp.asarray(x), jnp.asarray(ray_id),
                                      jnp.asarray(offsets), n))
    x64 = x.astype(np.float64).reshape(n, length)
    ref_excl = (np.cumsum(x64, axis=1) - x64).reshape(-1)
    np.testing.assert_allclose(excl, ref_excl, atol=1e-4)

    ssum = np.asarray(seg_sum(jnp.asarray(x), jnp.asarray(offsets)))
    np.testing.assert_allclose(ssum, x64.sum(axis=1), atol=1e-4)

    # 2D variant (rgb accumulation path)
    x2 = rng.uniform(0, 10, size=(n * length, 2)).astype(np.float32)
    s2 = np.asarray(seg_sum(jnp.asarray(x2), jnp.asarray(offsets)))
    ref2 = x2.astype(np.float64).reshape(n, length, 2).sum(axis=1)
    np.testing.assert_allclose(s2, ref2, atol=1e-4)


def test_seg_excl_values_and_adjoint_exact_for_arbitrary_cotangents():
    """ADVICE r3 (medium) closed structurally: seg_excl_cumsum is now a
    segmented associative scan — exact for EVERY slot and segment length
    (no content-window precondition), and its custom adjoint (the reversed
    segmented scan) is the exact transpose for ARBITRARY cotangents,
    including ones supported past any nominal content window. Checked
    against a dense O(n^2) reference on ragged segments with tail padding,
    long segments (> SEG_BLOCK would-be window), and junk cotangents
    everywhere."""
    from mfnerf_tpu.ops.composite import seg_excl_cumsum, seg_sum_l

    rng = np.random.default_rng(3)
    n, block = 8, 16
    # include a segment LONGER than the nominal block to prove the scan
    # has no window truncation
    lengths = np.array([3, 40, 1, 0, 16, 7, 25, 2])
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    b = int(lengths.sum()) + 5  # tail padding past the last segment
    ray_id = np.searchsorted(offsets, np.arange(b), side="right") - 1
    ray_id = ray_id.astype(np.int32)
    x = rng.normal(size=(b,)).astype(np.float32)
    g = rng.normal(size=(b,)).astype(np.float32)

    y = np.asarray(seg_excl_cumsum(jnp.asarray(x), jnp.asarray(ray_id),
                                   jnp.asarray(offsets), n, block=block))

    def seg_bounds(r):
        lo = offsets[r]
        hi = offsets[r + 1] if r + 1 < n else b
        return lo, hi

    ref_y = np.zeros(b)
    ref_dx = np.zeros(b)
    for r in range(n):
        lo, hi = seg_bounds(r)
        for i in range(lo, hi):
            ref_y[i] = x[lo:i].astype(np.float64).sum()
            ref_dx[i] = g[i + 1:hi].astype(np.float64).sum()
    np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-5)

    def f(xx):
        return (seg_excl_cumsum(xx, jnp.asarray(ray_id),
                                jnp.asarray(offsets), n, block=block)
                * jnp.asarray(g)).sum()

    grad = np.asarray(jax.grad(f)(jnp.asarray(x)))
    np.testing.assert_allclose(grad, ref_dx, rtol=1e-5, atol=1e-5)

    # seg_sum_l keeps the blocked content-window contract: its broadcast
    # adjoint is zero past the window (callers guarantee zero content there)
    in_window = (np.arange(b) - offsets[ray_id]) < block

    def f2(xx):
        return (seg_sum_l(xx, jnp.asarray(ray_id), jnp.asarray(offsets),
                          block=block) ** 2).sum()
    grad2 = np.asarray(jax.grad(f2)(jnp.asarray(x)))
    assert np.isfinite(grad2).all()
    assert (grad2[~in_window] == 0).all()
