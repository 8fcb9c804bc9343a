import numpy as np
import jax
import jax.numpy as jnp

from mfnerf_tpu.ops.hashgrid import (
    HashGridConfig, init_hashgrid_params, hashgrid_encode, _fwd_impl,
    window_weights)


def _small_cfg(**kw):
    args = dict(L=4, F=2, log2_T=10, N_min=4, b=2.0, grid_type="Hash",
                N_tables=1)
    args.update(kw)
    return HashGridConfig.create(**args)


def test_config_sizes_dense_vs_hash():
    cfg = _small_cfg()
    # level 0: scale 3, res 4 -> dense 64 -> aligned 64
    assert cfg.levels[0].dense and cfg.levels[0].size == 64
    # level 3: scale 31, res 33 -> 35937 > 1024 -> hashed at 2^10
    assert not cfg.levels[3].dense and cfg.levels[3].size == 1024
    # offsets are contiguous
    off = 0
    for lv in cfg.levels:
        assert lv.offset == off
        off += lv.size
    assert cfg.n_params == off


def test_trilinear_interpolation_exact():
    """Single dense level: compare against a NumPy trilinear oracle."""
    cfg = HashGridConfig.create(L=1, F=1, log2_T=14, N_min=8, b=2.0)
    lv = cfg.levels[0]
    assert lv.dense
    rng = np.random.default_rng(0)
    table = rng.normal(size=(cfg.n_params, 1)).astype(np.float32)
    x = rng.random((64, 3)).astype(np.float32) * 0.9  # stay off the boundary

    out = np.asarray(hashgrid_encode(jnp.asarray(table), jnp.asarray(x), cfg,
                                     None))[:, 0]

    pos = x * lv.scale + 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    expect = np.zeros(len(x), np.float32)
    for c in range(8):
        bits = np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1])
        idx = ((base + bits) * np.array([1, lv.res, lv.res ** 2])).sum(-1)
        w = np.prod(np.where(bits.astype(bool), frac, 1 - frac), axis=-1)
        expect += w * table[idx, 0]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff_of_impl():
    """The hand-written backward must equal JAX autodiff of the forward."""
    cfg = _small_cfg()
    key = jax.random.PRNGKey(0)
    params = init_hashgrid_params(key, cfg) * 1e4  # make features O(1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3)) * 0.95 + 0.01
    cot = jax.random.normal(jax.random.PRNGKey(2), (128, cfg.out_dim))

    def loss_custom(p, xx):
        return (hashgrid_encode(p, xx, cfg, None) * cot).sum()

    def loss_auto(p, xx):
        return (_fwd_impl(p, xx, cfg, None) * cot).sum()

    gp_c, gx_c = jax.grad(loss_custom, argnums=(0, 1))(params, x)
    gp_a, gx_a = jax.grad(loss_auto, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_a),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a),
                               rtol=1e-4, atol=1e-4)


def test_param_grad_finite_differences():
    cfg = HashGridConfig.create(L=2, F=1, log2_T=8, N_min=4, b=3.0)
    key = jax.random.PRNGKey(3)
    params = jax.random.normal(key, (cfg.n_params, 1)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 3)) * 0.9

    def loss(p):
        return (hashgrid_encode(p, x, cfg, None) ** 2).sum()

    g = np.asarray(jax.grad(loss)(params))
    rng = np.random.default_rng(0)
    p_np = np.asarray(params)
    for _ in range(10):
        i = rng.integers(0, cfg.n_params)
        eps = 1e-3
        pp = p_np.copy(); pp[i, 0] += eps
        pm = p_np.copy(); pm[i, 0] -= eps
        fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (
            2 * eps)
        assert abs(fd - g[i, 0]) < 2e-2 * max(1.0, abs(fd))


def test_mixed_feature_memory_and_grouping():
    # 8 levels, 2 tables of 2^12: memory = dense-packed group + hashed group
    cfg = HashGridConfig.create(L=8, F=2, log2_T=12, N_min=4, b=2.0,
                                grid_type="MixedFeature", N_tables=2)
    # group 0 = levels 0..3 (res 4,8,16,32 -> 64+512+4096... exceeds 2^12)
    # -> group 0 hashes; both groups share table size 2^12 each
    assert cfg.n_params <= 2 * 4096 + 8 * 8
    # levels in the same group share the same offset but differ in salt
    g0 = [lv for lv in cfg.levels[:4]]
    if not g0[0].dense:
        assert len({lv.offset for lv in g0}) == 1
        assert len({lv.salt for lv in g0}) == 4
    # hashed MF levels must produce different features for the same point
    params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    out = np.asarray(hashgrid_encode(params, x, cfg, None))
    assert out.shape == (32, 16)
    assert np.abs(out).max() > 0

    # gradients flow into every table region that was touched
    g = jax.grad(lambda p: hashgrid_encode(p, x, cfg, None).sum())(params)
    assert float(jnp.abs(g).sum()) > 0


def test_mf_respects_table_budget():
    cfg = HashGridConfig.create(L=16, F=2, log2_T=15, N_min=16,
                                b=1.3819128800392336,
                                grid_type="MixedFeature", N_tables=8)
    assert cfg.n_params <= 8 * (1 << 15) + 16 * 8
    hash_cfg = HashGridConfig.create(L=16, F=2, log2_T=15, N_min=16,
                                     b=1.3819128800392336)
    assert cfg.n_params < hash_cfg.n_params  # MF is the memory-efficient one


def test_window_alpha_one_equals_hash():
    cfg = _small_cfg(grid_type="Window")
    params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    w1 = window_weights(cfg, 1.0)
    np.testing.assert_allclose(np.asarray(w1), np.ones(cfg.L), atol=1e-6)
    out_w = hashgrid_encode(params, x, cfg, w1)
    out_h = hashgrid_encode(params, x, cfg, None)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_h),
                               rtol=1e-6)
    # alpha=0.5 suppresses the finest levels entirely
    wh = window_weights(cfg, 0.5)
    out_half = np.asarray(hashgrid_encode(params, x, cfg, wh))
    assert np.abs(out_half[:, -cfg.F:]).max() == 0.0


def test_stochastic_backward_unbiased():
    """grad_corners<8: the sampled-corner table gradient equals the exact
    gradient in expectation. Quadrature check: averaging the estimator over a
    stratified grid of uniforms integrates the inverse-CDF sampling exactly up
    to the weight-boundary discretization (<= 8/K of the cotangent mass)."""
    cfg = _small_cfg(grad_corners=1)
    cfg_exact = _small_cfg()
    key = jax.random.PRNGKey(0)
    params = init_hashgrid_params(key, cfg) * 1e4
    n = 32
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 0.95 + 0.01
    cot = jax.random.normal(jax.random.PRNGKey(2), (n, cfg.out_dim))

    def grad_with_noise(u_scalar):
        gn = jnp.full((n, 1), u_scalar)
        return jax.grad(lambda p: (hashgrid_encode(p, x, cfg, None, gn)
                                   * cot).sum())(params)

    K = 512
    us = (np.arange(K) + 0.5) / K
    acc = np.zeros_like(np.asarray(params))
    f = jax.jit(grad_with_noise)
    for u in us:
        acc += np.asarray(f(u))
    acc /= K
    exact = np.asarray(jax.grad(
        lambda p: (hashgrid_encode(p, x, cfg_exact, None) * cot).sum()
    )(params))
    scale = np.abs(exact).max()
    np.testing.assert_allclose(acc, exact, atol=scale * 8.5 / K)


def test_stochastic_backward_multi_corner_and_dx():
    """m>1 averages m one-corner draws (same expectation, each draw a valid
    single-corner estimate) and d_x stays EXACT regardless of grad_corners."""
    cfg = _small_cfg(grad_corners=4)
    cfg_exact = _small_cfg()
    key = jax.random.PRNGKey(5)
    params = init_hashgrid_params(key, cfg) * 1e4
    n = 64
    x = jax.random.uniform(jax.random.PRNGKey(6), (n, 3)) * 0.9 + 0.05
    cot = jax.random.normal(jax.random.PRNGKey(7), (n, cfg.out_dim))
    gn = jax.random.uniform(jax.random.PRNGKey(8), (n, 4))

    gp_s, gx_s = jax.grad(
        lambda p, xx: (hashgrid_encode(p, xx, cfg, None, gn) * cot).sum(),
        argnums=(0, 1))(params, x)
    gp_e, gx_e = jax.grad(
        lambda p, xx: (hashgrid_encode(p, xx, cfg_exact, None) * cot).sum(),
        argnums=(0, 1))(params, x)
    # d_x exact
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_e),
                               rtol=1e-5, atol=1e-6)
    # table grad: same total cotangent mass routed per level (weights sum
    # to 1 -> every draw deposits exactly g/m somewhere in the level)
    def level_mass(gp):
        out = []
        for lv in cfg.levels:
            out.append(np.asarray(gp)[lv.offset:lv.offset + lv.size].sum(0))
        return np.stack(out)
    np.testing.assert_allclose(level_mass(gp_s), level_mass(gp_e),
                               rtol=1e-4, atol=1e-5)


def test_stochastic_ignored_without_noise():
    """grad_corners<8 with grad_noise=None falls back to the exact backward."""
    cfg = _small_cfg(grad_corners=1)
    cfg_exact = _small_cfg()
    params = init_hashgrid_params(jax.random.PRNGKey(0), cfg) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3)) * 0.9
    cot = jax.random.normal(jax.random.PRNGKey(2), (16, cfg.out_dim))
    gp_s = jax.grad(lambda p: (hashgrid_encode(p, x, cfg, None) * cot).sum()
                    )(params)
    gp_e = jax.grad(
        lambda p: (hashgrid_encode(p, x, cfg_exact, None) * cot).sum()
    )(params)
    np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_e))
