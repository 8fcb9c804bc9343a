import numpy as np
import jax
import jax.numpy as jnp

from mfnerf_tpu.ops.lowrank import (LowRankConfig, init_lowrank_params,
                                    lowrank_encode, _hat_basis)


def test_hat_basis_partition_of_unity_and_interp():
    u = jnp.asarray([0.0, 0.25, 0.5, 0.99, 1.0])
    b = np.asarray(_hat_basis(u, 9))
    assert b.shape == (5, 9)
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-6)
    # u=0.5 on a 9-knot grid sits exactly on knot 4
    np.testing.assert_allclose(b[2, 4], 1.0, atol=1e-6)
    assert b[2, :4].max() == 0 and b[2, 5:].max() == 0


def test_encode_shapes_and_grads():
    cfg = LowRankConfig.create(n_levels=3, k_min=8, k_max=32, rank=4,
                               n_frames=2, out_dim=16)
    params = init_lowrank_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = lowrank_encode(params, x, cfg)
    assert out.shape == (64, 16)
    assert bool(jnp.isfinite(out).all())

    def loss(p, xx):
        return (lowrank_encode(p, xx, cfg) ** 2).sum()

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    total = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(gp))
    assert total > 0
    assert bool(jnp.isfinite(gx).all())


def test_encode_fits_a_target_field():
    """The encoding + linear head must be able to fit a nontrivial 3D field
    quickly (sanity of capacity + gradients)."""
    cfg = LowRankConfig.create(n_levels=3, k_min=8, k_max=64, rank=8,
                               n_frames=2, out_dim=1)
    params = init_lowrank_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3))
    xn = np.asarray(x)
    target = jnp.asarray(
        np.sin(7 * xn[:, 0]) * np.cos(5 * xn[:, 1]) + xn[:, 2] ** 2)

    import optax
    tx = optax.adam(3e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            pred = lowrank_encode(p, x, cfg)[:, 0]
            return ((pred - target) ** 2).mean()
        l, g = jax.value_and_grad(loss)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    l0 = None
    for i in range(300):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.05 * l0, (l0, float(l))


def test_fused_nested_matches_per_level():
    """Fused evaluation (levels prolongated onto the finest hat basis, one
    wide matmul per axis) must equal the per-level path exactly (same
    params, fp32 operands): piecewise-linear nesting is exact."""
    from mfnerf_tpu.ops.lowrank import _prolongation
    cfg_f = LowRankConfig.create(n_levels=3, k_max=64, rank=4, n_frames=2,
                                 out_dim=16, fused=True,
                                 matmul_dtype="float32")
    assert cfg_f.levels == (17, 33, 65)  # snapped to the nested ladder
    cfg_u = LowRankConfig(levels=cfg_f.levels, rank=4, n_frames=2,
                          out_dim=16, fused=False)
    params = init_lowrank_params(jax.random.PRNGKey(0), cfg_f)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    out_f = lowrank_encode(params, x, cfg_f)
    out_u = lowrank_encode(params, x, cfg_u)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-4, atol=2e-5)

    # prolongation itself is exact on arbitrary query points
    p = _prolongation(65, 17)
    u = jax.random.uniform(jax.random.PRNGKey(2), (128,))
    fine = _hat_basis(u, 65) @ jnp.asarray(p)
    coarse = _hat_basis(u, 17)
    np.testing.assert_allclose(np.asarray(fine), np.asarray(coarse),
                               atol=1e-5)

    # gradients flow to every level's tables through the fused path
    def loss(p):
        return (lowrank_encode(p, x, cfg_f) ** 2).sum()
    g = jax.grad(loss)(params)
    for m in range(2):
        for li in range(3):
            for d in range(3):
                assert float(jnp.abs(g["lines"][m][li][d]).sum()) > 0


def test_fused_bf16_close_to_fp32():
    cfg16 = LowRankConfig.create(n_levels=3, k_max=64, rank=4, n_frames=2,
                                 out_dim=16, fused=True)
    cfg32 = dataclasses_replace(cfg16, matmul_dtype="float32")
    params = init_lowrank_params(jax.random.PRNGKey(0), cfg16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    o16 = np.asarray(lowrank_encode(params, x, cfg16))
    o32 = np.asarray(lowrank_encode(params, x, cfg32))
    scale = np.abs(o32).max()
    assert np.abs(o16 - o32).max() < 0.03 * scale


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_ngp_with_lowrank_grid():
    from mfnerf_tpu.models.ngp import NGP, NGPConfig
    cfg = NGPConfig(scale=0.5, grid="LowRank", L=8, F=2, rgb_channels=16,
                    rgb_layers=2, grid_size=32, sigma_neurons=16,
                    lr_levels=3, lr_rank=4, lr_frames=2, lr_k_max=64)
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "lowrank" in params and "hash_table" not in params
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.5,
                           maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    sig, rgb = model(params, x, d)
    assert sig.shape == (32,) and rgb.shape == (32, 3)
    assert bool((sig > 0).all())
