import math

import numpy as np
import jax.numpy as jnp

from mfnerf_tpu.ops.stepping import (
    SQRT3, calc_dt, mip_from_pos, mip_from_dt, t_ladder, max_ladder_steps)


def _ladder_oracle(t0, K, e, max_samples, grid_size, scale):
    """Iterate the reference recurrence (raymarching.cu:204-233) in float64."""
    a = SQRT3 / max_samples
    b = SQRT3 * 2 * scale / grid_size
    out = np.empty(K)
    t = float(t0)
    for k in range(K):
        out[k] = t
        t += min(max(t * e, a), b)
    return out


def test_ladder_synthetic_constant_dt():
    # exp_step_factor == 0 (synthetic scenes): dt is exactly SQRT3/1024
    t0 = jnp.asarray([0.0, 0.3, 1.2])
    ks = jnp.arange(64)
    lad = np.asarray(t_ladder(t0, ks, 0.0, 1024, 128, 0.5))
    for i, t in enumerate([0.0, 0.3, 1.2]):
        np.testing.assert_allclose(
            lad[i], _ladder_oracle(t, 64, 0.0, 1024, 128, 0.5),
            rtol=1e-6, atol=1e-6)


def test_ladder_exponential_matches_iteration():
    # real scenes: e = 1/256, several scales; verify all three regimes
    for scale in [0.5, 4.0, 16.0]:
        K = max_ladder_steps(0.0, 3.5 * scale * SQRT3, 1 / 256, 1024, 128,
                             scale)
        K = min(K, 4096)
        for t0 in [0.0, 0.05, 1.0, 37.0]:
            lad = np.asarray(
                t_ladder(jnp.asarray([t0]), jnp.arange(K), 1 / 256, 1024,
                         128, scale))[0]
            oracle = _ladder_oracle(t0, K, 1 / 256, 1024, 128, scale)
            # fp32 closed form vs fp64 iteration: allow small relative slack
            np.testing.assert_allclose(lad, oracle, rtol=5e-4, atol=5e-5)


def test_calc_dt_clamps():
    assert float(calc_dt(jnp.float32(0.0), 1 / 256, 1024, 128, 0.5)) == (
        np.float32(SQRT3 / 1024))
    big = float(calc_dt(jnp.float32(1e6), 1 / 256, 1024, 128, 0.5))
    assert abs(big - SQRT3 * 2 * 0.5 / 128) < 1e-6


def _frexp_exp(x):
    m, e = math.frexp(abs(x))
    return e


def test_mip_from_pos_oracle():
    rng = np.random.default_rng(0)
    xyz = (rng.random((2048, 3)).astype(np.float32) * 8 - 4)
    for cascades in [1, 3, 5]:
        got = np.asarray(mip_from_pos(jnp.asarray(xyz), cascades))
        mx = np.abs(xyz).max(-1)
        expect = np.clip([_frexp_exp(v) + 1 for v in mx], 0, cascades - 1)
        np.testing.assert_array_equal(got, expect)
    # documented ranges (raymarching.cu:15-18)
    pts = jnp.asarray([[0.3, 0.1, 0.0], [0.5, 0.0, 0.0], [1.5, 0.2, 0.3]])
    np.testing.assert_array_equal(np.asarray(mip_from_pos(pts, 8)), [0, 1, 2])


def test_mip_from_dt_oracle():
    rng = np.random.default_rng(1)
    dts = rng.random(2048).astype(np.float32) * 0.1 + 1e-4
    for cascades in [1, 3, 5]:
        got = np.asarray(mip_from_dt(jnp.asarray(dts), 128, cascades))
        expect = np.clip([_frexp_exp(v * np.float32(128)) for v in dts],
                         0, cascades - 1)
        np.testing.assert_array_equal(got, expect)


def test_max_ladder_steps_bounds_iteration():
    for e, scale in [(0.0, 0.5), (1 / 256, 0.5), (1 / 256, 8.0)]:
        t_end = 2 * SQRT3 * scale
        K = max_ladder_steps(0.0, t_end, e, 1024, 128, scale)
        lad = _ladder_oracle(0.0, K, e, 1024, 128, scale)
        # ladder of K rungs reaches the far bound (fp64 accumulation slack)
        assert lad[-1] >= t_end - 1e-9
