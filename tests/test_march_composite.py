import numpy as np
import jax
import jax.numpy as jnp

from mfnerf_tpu.ops.morton import morton3d, packbits, bitfield_lookup
from mfnerf_tpu.ops.ray_march import march_rays_train
from mfnerf_tpu.ops.stepping import (SQRT3, calc_dt, mip_from_pos,
                                     mip_from_dt, t_ladder, max_ladder_steps)
from mfnerf_tpu.ops.composite import composite_train, composite_test_step
from mfnerf_tpu.losses import distortion_loss


def _random_scene(seed=0, grid_size=32, cascades=1, occupancy=0.15):
    rng = np.random.default_rng(seed)
    grid = (rng.random((cascades, grid_size ** 3)) < occupancy).astype(
        np.float32)
    bitfield = packbits(jnp.asarray(grid), 0.5)
    return grid, bitfield


def _march_oracle(ro, rd, t1, t2, bitfield, cascades, scale, e, g, max_s,
                  n_rungs, s_max):
    """Sequential per-ray oracle of raymarching.cu:204-233 semantics, walking
    the same t-ladder rungs as the vectorized op."""
    ts_row = np.asarray(t_ladder(jnp.asarray([t1], jnp.float32),
                                 jnp.arange(n_rungs), e, max_s, g, scale))[0]
    out_t = []
    for t in ts_row:
        if t1 < 0 or t >= t2 or len(out_t) >= s_max:
            break
        xyz = ro + t * rd
        dt = float(calc_dt(jnp.float32(t), e, max_s, g, scale))
        mip = max(int(mip_from_pos(jnp.asarray(xyz), cascades)),
                  int(mip_from_dt(jnp.float32(dt), g, cascades)))
        mip_bound = min(2.0 ** (mip - 1), scale)
        n_xyz = np.clip(0.5 * (xyz / mip_bound + 1) * g, 0, g - 1).astype(
            np.int32)
        idx = mip * g ** 3 + int(morton3d(jnp.asarray(n_xyz)))
        if bool(bitfield_lookup(jnp.asarray(bitfield), jnp.asarray(idx))):
            out_t.append(t)
    return np.array(out_t, np.float32)


def test_march_matches_sequential_oracle():
    grid_size, scale, e = 32, 0.5, 0.0
    _, bitfield = _random_scene(0, grid_size)
    rng = np.random.default_rng(1)
    n = 16
    ro = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)

    from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(ro), jnp.asarray(rd), jnp.zeros(3), jnp.full(3, scale)))
    n_rungs = max_ladder_steps(0.0, 2 * SQRT3 * scale, e, 1024, grid_size,
                               scale)
    s_max = 64
    noise = jnp.zeros(n)
    mr = march_rays_train(jnp.asarray(ro), jnp.asarray(rd),
                          jnp.asarray(hits), bitfield, 1, scale, e,
                          grid_size, 1024, noise, n_rungs, s_max)
    for r in range(n):
        oracle_t = _march_oracle(ro[r], rd[r], hits[r, 0], hits[r, 1],
                                 bitfield, 1, scale, e, grid_size, 1024,
                                 n_rungs, s_max)
        got = np.asarray(mr.ts[r])[np.asarray(mr.mask[r])]
        assert len(got) == len(oracle_t), f"ray {r}"
        np.testing.assert_allclose(got, oracle_t, rtol=1e-5, atol=1e-6)
        # positions are o + t*d
        xyzs = np.asarray(mr.xyzs[r])[np.asarray(mr.mask[r])]
        np.testing.assert_allclose(
            xyzs, ro[r] + oracle_t[:, None] * rd[r], rtol=1e-4, atol=1e-5)


def test_march_multicascade_and_exp_stepping():
    grid_size, scale, e = 32, 4.0, 1 / 256
    cascades = 4
    _, bitfield = _random_scene(2, grid_size, cascades, occupancy=0.3)
    rng = np.random.default_rng(3)
    n = 8
    ro = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, -1, keepdims=True)
    from mfnerf_tpu.ops.intersection import ray_aabb_intersect_single
    hits = np.asarray(ray_aabb_intersect_single(
        jnp.asarray(ro), jnp.asarray(rd), jnp.zeros(3), jnp.full(3, scale)))
    n_rungs = min(max_ladder_steps(0.0, 2 * SQRT3 * scale, e, 1024,
                                   grid_size, scale), 4096)
    mr = march_rays_train(jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(hits),
                          bitfield, cascades, scale, e, grid_size, 1024,
                          jnp.zeros(n), n_rungs, 64)
    for r in range(n):
        oracle_t = _march_oracle(ro[r], rd[r], hits[r, 0], hits[r, 1],
                                 bitfield, cascades, scale, e, grid_size,
                                 1024, n_rungs, 64)
        got = np.asarray(mr.ts[r])[np.asarray(mr.mask[r])]
        assert len(got) == len(oracle_t), f"ray {r}"
        np.testing.assert_allclose(got, oracle_t, rtol=2e-4, atol=1e-5)


def _composite_oracle(sig, rgb, dl, ts, mask, thr):
    """volumerendering.cu:26-44 sequential fp32 oracle (one ray)."""
    T, op, dp = 1.0, 0.0, 0.0
    c = np.zeros(3)
    ws = np.zeros(len(sig))
    n_used = 0
    for i in range(len(sig)):
        if not mask[i]:
            continue
        a = 1.0 - np.exp(-sig[i] * dl[i])
        w = a * T
        c += w * rgb[i]
        dp += w * ts[i]
        op += w
        ws[i] = w
        T *= 1 - a
        n_used += 1
        if T <= thr:
            break
    return op, dp, c, ws, n_used


def test_composite_matches_oracle_with_early_termination():
    rng = np.random.default_rng(0)
    n, s = 32, 24
    sig = rng.exponential(2.0, (n, s)).astype(np.float32) * 10
    rgb = rng.random((n, s, 3)).astype(np.float32)
    dl = np.full((n, s), 0.01, np.float32)
    ts = np.cumsum(dl, 1).astype(np.float32)
    counts = rng.integers(0, s + 1, n)
    mask = np.arange(s)[None] < counts[:, None]
    thr = 1e-2  # high threshold so early termination actually triggers
    comp = composite_train(jnp.asarray(sig), jnp.asarray(rgb),
                           jnp.asarray(dl), jnp.asarray(ts),
                           jnp.asarray(mask), thr)
    total_used = 0
    for r in range(n):
        op, dp, c, ws, used = _composite_oracle(sig[r], rgb[r], dl[r], ts[r],
                                                mask[r], thr)
        np.testing.assert_allclose(float(comp.opacity[r]), op, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(float(comp.depth[r]), dp, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(comp.rgb[r]), c, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(comp.ws[r]), ws, rtol=1e-4,
                                   atol=1e-6)
        total_used += used
    assert int(comp.vr_samples) == total_used


def test_composite_gradients_match_scan_reference():
    """Autodiff through the cumprod formulation must equal autodiff through a
    sequential lax.scan implementation (independent of the closed form)."""
    rng = np.random.default_rng(1)
    n, s = 8, 16
    sig = jnp.asarray(rng.exponential(1.0, (n, s)).astype(np.float32) * 5)
    rgb = jnp.asarray(rng.random((n, s, 3)).astype(np.float32))
    dl = jnp.full((n, s), 0.02)
    ts = jnp.cumsum(dl, 1)
    mask = jnp.ones((n, s), bool)
    thr = 1e-4

    def loss_ours(sig, rgb):
        c = composite_train(sig, rgb, dl, ts, mask, thr)
        return (c.rgb ** 2).sum() + c.opacity.sum() + (c.depth * 0.3).sum() \
            + (c.ws * 0.1).sum()

    def scan_one(sig_r, rgb_r):
        def body(carry, x):
            T = carry
            sg, cl, d, t = x
            a = 1.0 - jnp.exp(-sg * d)
            w = jnp.where(T > thr, a * T, 0.0)
            return T * (1 - a), (w * cl, w * t, w)
        _, (crgb, cdep, ws) = jax.lax.scan(
            body, 1.0, (sig_r, rgb_r, dl[0], ts[0]))
        return crgb.sum(0), cdep.sum(), ws

    def loss_scan(sig, rgb):
        crgb, cdep, ws = jax.vmap(scan_one)(sig, rgb)
        op = ws.sum(1)
        return (crgb ** 2).sum() + op.sum() + (cdep * 0.3).sum() \
            + (ws * 0.1).sum()

    g1 = jax.grad(loss_ours, argnums=(0, 1))(sig, rgb)
    g2 = jax.grad(loss_scan, argnums=(0, 1))(sig, rgb)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-5)


def test_composite_test_step_incremental_equals_batch():
    """Splitting samples into rounds must reproduce one-shot compositing."""
    rng = np.random.default_rng(2)
    n, s = 16, 32
    sig = jnp.asarray(rng.exponential(1.0, (n, s)).astype(np.float32) * 20)
    rgb = jnp.asarray(rng.random((n, s, 3)).astype(np.float32))
    dl = jnp.full((n, s), 0.01)
    ts = jnp.cumsum(dl, 1)
    mask = jnp.ones((n, s), bool)
    thr = 1e-3
    ref = composite_train(sig, rgb, dl, ts, mask, thr)

    op = jnp.zeros(n); dp = jnp.zeros(n); c = jnp.zeros((n, 3))
    alive = jnp.ones(n, bool)
    for i in range(0, s, 8):
        sl = slice(i, i + 8)
        op, dp, c, alive = composite_test_step(
            sig[:, sl], rgb[:, sl], dl[:, sl], ts[:, sl], mask[:, sl],
            op, dp, c, alive, thr)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ref.opacity),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(ref.depth),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref.rgb),
                               rtol=1e-4, atol=1e-6)


def test_distortion_loss_matches_double_sum():
    rng = np.random.default_rng(3)
    n, s = 8, 12
    ws = rng.random((n, s)).astype(np.float32) * 0.2
    dl = rng.random((n, s)).astype(np.float32) * 0.05
    ts = np.cumsum(dl + 0.01, 1).astype(np.float32)
    counts = rng.integers(1, s + 1, n)
    mask = np.arange(s)[None] < counts[:, None]
    got = np.asarray(distortion_loss(jnp.asarray(ws), jnp.asarray(dl),
                                     jnp.asarray(ts), jnp.asarray(mask)))
    for r in range(n):
        w = ws[r] * mask[r]
        m = ts[r]
        pair = sum(w[i] * w[j] * abs(m[i] - m[j])
                   for i in range(s) for j in range(s))
        uni = (w ** 2 * dl[r]).sum() / 3
        np.testing.assert_allclose(got[r], pair + uni, rtol=1e-4, atol=1e-6)


def test_compact_rung_indices_matches_searchsorted():
    import numpy as np
    import jax.numpy as jnp
    from mfnerf_tpu.ops.ray_march import compact_rung_indices

    rng = np.random.default_rng(0)
    occ = rng.random((37, 150)) < 0.1
    csum = np.cumsum(occ.astype(np.int32), axis=1)
    s_max = 16
    got = np.asarray(compact_rung_indices(jnp.asarray(csum), s_max, chunk=64))
    want = np.stack([np.searchsorted(row, np.arange(1, s_max + 1), "left")
                     for row in csum])
    np.testing.assert_array_equal(got, want)
