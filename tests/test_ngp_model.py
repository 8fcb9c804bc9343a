import numpy as np
import jax
import jax.numpy as jnp

from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
from mfnerf_tpu.ops.morton import bitfield_lookup


def _tiny_cfg(**kw):
    args = dict(scale=0.5, L=4, F=2, log2_T=12, N_min=4, N_max=64,
                rgb_channels=16, rgb_layers=2, grid_size=32, sigma_neurons=16)
    args.update(kw)
    return NGPConfig(**args)


def test_cascades_and_b():
    assert NGPConfig(scale=0.5).cascades == 1
    assert NGPConfig(scale=4.0).cascades == 4
    cfg = NGPConfig(scale=0.5, L=16, N_min=16, N_max=2048)
    np.testing.assert_allclose(cfg.per_level_scale,
                               np.exp(np.log(2048 * 0.5 / 16) / 15))


def test_forward_shapes_and_ranges():
    cfg = _tiny_cfg()
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5,
                           maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    sigmas, rgbs = model(params, x, d)
    assert sigmas.shape == (64,)
    assert rgbs.shape == (64, 3)
    assert bool((sigmas > 0).all())          # trunc_exp output
    assert bool((rgbs >= 0).all() and (rgbs <= 1).all())  # sigmoid output

    s2, feat = model.density(params, x, return_feat=True)
    assert feat.shape == (64, cfg.geo_feat_dim)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sigmas), rtol=1e-6)


def test_hdr_head_tonemaps():
    cfg = _tiny_cfg(rgb_act="None")
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "tonemappers" in params and len(params["tonemappers"]) == 3
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-0.4,
                           maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    _, ldr = model(params, x, d, exposure=jnp.ones((8, 1)))
    assert bool((ldr >= 0).all() and (ldr <= 1).all())
    _, hdr = model(params, x, d, output_radiance=True)
    assert bool((hdr > 0).all())


def test_update_density_grid_warmup_and_ema():
    cfg = _tiny_cfg()
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    occ = model.update_density_grid(params, occ, jax.random.PRNGKey(1),
                                    density_threshold=0.01, warmup=True)
    g1 = np.asarray(occ.density_grid)
    assert (g1 > 0).any()  # fresh random net has sigma = exp(~0) ~ 1

    # invisible cells (-1) must never be resurrected
    import dataclasses
    marked = dataclasses.replace(
        occ, density_grid=occ.density_grid.at[0, :100].set(-1.0))
    occ2 = model.update_density_grid(params, marked, jax.random.PRNGKey(2),
                                     density_threshold=0.01, warmup=True)
    assert (np.asarray(occ2.density_grid)[0, :100] == -1).all()

    # non-sampled cells decay: with a fresh key + non-warmup, every visible
    # cell either decays by 0.95 or is refreshed to a new sigma
    occ3 = model.update_density_grid(params, occ, jax.random.PRNGKey(3),
                                     density_threshold=0.01, warmup=False)
    g3 = np.asarray(occ3.density_grid)
    assert g3.shape == g1.shape
    assert (g3 >= g1 * 0.95 - 1e-5).all()


def test_half_dense_refresh_alternates_and_covers():
    """--refresh_half semantics (update_density_grid(half=0|1)): the
    refreshed Morton half gets live sigma (trunc_exp > 0 always), the
    skipped half decays exactly like the reference's unsampled cells
    (networks.py:264), and an even+odd pair covers every cell."""
    import dataclasses
    cfg = _tiny_cfg()
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ0 = OccupancyState.create(cfg)
    assert (np.asarray(occ0.density_grid) == 0).all()

    o1 = model.update_density_grid(params, occ0, jax.random.PRNGKey(1),
                                   density_threshold=0.01, decay=0.6,
                                   half=0)
    g1 = np.asarray(o1.density_grid)
    assert (g1[:, 0::2] > 0).all()   # refreshed half: live sigma
    assert (g1[:, 1::2] == 0).all()  # skipped half: decayed zero stays zero

    o2 = model.update_density_grid(params, o1, jax.random.PRNGKey(2),
                                   density_threshold=0.01, decay=0.6,
                                   half=1)
    g2 = np.asarray(o2.density_grid)
    assert (g2[:, 1::2] > 0).all()   # the pair covers all cells
    # the even half was skipped this refresh: exact EMA decay, no eval
    np.testing.assert_allclose(g2[:, 0::2], g1[:, 0::2] * 0.6, rtol=1e-6)

    # invisible cells are never resurrected by a half refresh
    marked = dataclasses.replace(
        o2, density_grid=o2.density_grid.at[0, :64].set(-1.0))
    o3 = model.update_density_grid(params, marked, jax.random.PRNGKey(3),
                                   density_threshold=0.01, half=0)
    assert (np.asarray(o3.density_grid)[0, :64] == -1).all()


def test_bitfield_consistent_with_grid():
    cfg = _tiny_cfg()
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    occ = model.update_density_grid(params, occ, jax.random.PRNGKey(1),
                                    density_threshold=0.01, warmup=True)
    grid = np.asarray(occ.density_grid).reshape(-1)
    pos = grid[grid > 0]
    thr = min(pos.mean(), 0.01)
    lookup = np.asarray(bitfield_lookup(
        occ.density_bitfield, jnp.arange(grid.size)))
    np.testing.assert_array_equal(lookup, grid > thr)


def test_mark_invisible_cells():
    cfg = _tiny_cfg()
    model = NGP(cfg)
    occ = OccupancyState.create(cfg)
    # one camera at -z looking towards +z (identity rotation, [right down
    # front] convention): cells behind it (z < -1) are invisible
    pose = np.eye(3, 4, dtype=np.float32)
    pose[2, 3] = -1.0
    w = h = 64
    K = np.array([[64, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32)
    occ = model.mark_invisible_cells(occ, K, pose[None], (w, h),
                                     chunk=cfg.n_cells // 4)
    grid = np.asarray(occ.density_grid)[0]
    coords = np.asarray(model.all_cell_coords())
    g = cfg.grid_size
    s = min(0.5, cfg.scale)
    xyz = (coords / (g - 1) * 2 - 1) * (s - s / g)
    behind = xyz[:, 2] < -1.0  # never true here (scene inside [-0.5,.5])
    # center-front cells are visible (density 0), lateral far cells may not be
    center = np.all(np.abs(xyz[:, :2]) < 0.05, axis=1) & (xyz[:, 2] > -0.9)
    assert (grid[center] == 0).all()
    assert set(np.unique(grid)) <= {0.0, -1.0}
    cnt = np.asarray(occ.count_grid)[0]
    assert cnt.max() <= 1.0 and cnt[center].min() > 0


def test_dense_update_superset_of_sparse():
    """The dense refresh must mark occupied every cell the reference-style
    sparse refresh marks (it evaluates a superset of cells; both share the
    EMA/threshold logic)."""
    import jax
    import jax.numpy as jnp
    cfg = _tiny_cfg()
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ0 = OccupancyState.create(cfg)
    occ0 = model.update_density_grid(params, occ0, jax.random.PRNGKey(1),
                                     density_threshold=0.01, warmup=True)
    dense = model.update_density_grid(params, occ0, jax.random.PRNGKey(2),
                                      density_threshold=0.01)
    sparse = model.update_density_grid(params, occ0, jax.random.PRNGKey(2),
                                       density_threshold=0.01, sparse=True)
    gd = np.asarray(dense.density_grid)
    gs = np.asarray(sparse.density_grid)
    # every sparse-refreshed value is <= the dense one up to jitter noise:
    # both decay identically and dense additionally refreshes every cell
    assert (gd >= gs * 0.94 - 1e-4).mean() > 0.999


def test_coarse_bitfield_conservative():
    """Every occupied fine cell's parent coarse cell (and its neighbors,
    via dilation) must be set in the coarse bitfield."""
    import jax.numpy as jnp
    from mfnerf_tpu.ops.morton import (bitfield_lookup,
                                       coarse_bitfield_from_fine, morton3d)
    rng = np.random.default_rng(0)
    g = 32
    fine_bits = jnp.asarray(rng.integers(0, 256, g ** 3 // 8, dtype=np.uint8)
                            & rng.integers(0, 2, g ** 3 // 8,
                                           dtype=np.uint8) * 255)
    coarse = coarse_bitfield_from_fine(fine_bits, g, 1)
    fine_occ = np.asarray(bitfield_lookup(
        fine_bits, jnp.arange(g ** 3, dtype=jnp.int32)))
    # occupied fine morton code c -> parent coarse code c >> 3
    parents = np.unique(np.nonzero(fine_occ)[0] >> 3)
    got = np.asarray(bitfield_lookup(
        coarse, jnp.asarray(parents, jnp.int32)))
    assert got.all()


def test_half_refresh_skipped_cells_decay_exactly():
    """half=0/1 refreshes only that Morton parity; the other half follows
    the reference's unsampled-cell rule exactly: max(grid*decay, 0) ==
    grid*decay for non-negative grids (networks.py:264)."""
    import numpy as np
    cfg = _tiny_cfg()
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ = OccupancyState.create(cfg)
    # seed a non-trivial positive grid via one dense refresh
    occ = model.update_density_grid(params, occ, jax.random.PRNGKey(1),
                                    density_threshold=0.01, warmup=True)
    g0 = np.asarray(occ.density_grid)
    for half in (0, 1):
        occ_h = model.update_density_grid(params, occ, jax.random.PRNGKey(2),
                                          density_threshold=0.01, decay=0.5,
                                          half=half)
        g1 = np.asarray(occ_h.density_grid)
        skipped = slice(1 - half, None, 2)
        refreshed = slice(half, None, 2)
        np.testing.assert_allclose(g1[:, skipped], 0.5 * g0[:, skipped],
                                   rtol=1e-6)
        assert (g1[:, refreshed] >= 0.5 * g0[:, refreshed] - 1e-6).all()
        # refreshed half actually got fresh (different) values somewhere
        assert np.abs(g1[:, refreshed] - 0.5 * g0[:, refreshed]).max() > 1e-4
