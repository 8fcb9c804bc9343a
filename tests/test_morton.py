import numpy as np
import jax.numpy as jnp

from mfnerf_tpu.ops.morton import (
    morton3d, morton3d_invert, packbits, bitfield_lookup)


def _morton_ref(x, y, z):
    """Bit-by-bit NumPy oracle."""
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip_and_oracle():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, size=(4096, 3), dtype=np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expect = _morton_ref(coords[:, 0].astype(np.int64),
                         coords[:, 1].astype(np.int64),
                         coords[:, 2].astype(np.int64))
    np.testing.assert_array_equal(codes.astype(np.int64), expect)

    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_morton_dense_grid_is_permutation():
    g = 16
    xyz = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing="ij"), -1).reshape(-1, 3)
    codes = np.asarray(morton3d(jnp.asarray(xyz, dtype=jnp.int32)))
    assert sorted(codes.tolist()) == list(range(g ** 3))


def test_packbits_matches_oracle():
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(2, 8 * 97)).astype(np.float32)
    thr = 0.1
    bf = np.asarray(packbits(jnp.asarray(grid), thr))
    flat = grid.reshape(-1)
    expect = np.zeros(flat.size // 8, dtype=np.uint8)
    for n in range(expect.size):
        b = 0
        for i in range(8):
            if flat[8 * n + i] > thr:
                b |= 1 << i
        expect[n] = b
    np.testing.assert_array_equal(bf, expect)


def test_bitfield_lookup():
    rng = np.random.default_rng(2)
    grid = (rng.random(8 * 64) > 0.5).astype(np.float32)
    bf = packbits(jnp.asarray(grid), 0.5)
    idx = jnp.arange(8 * 64)
    occ = np.asarray(bitfield_lookup(bf, idx))
    np.testing.assert_array_equal(occ, grid > 0.5)


def test_neighborhood_table_matches_bitfield_lookup():
    """Every bit of every 4^3-neighborhood row must equal the direct fine
    bitfield test of the corresponding cell (the gather-wide marching
    primitive must be EXACT, not conservative)."""
    from mfnerf_tpu.ops.morton import (morton3d, neighborhood_lookup,
                                       occupancy_nbr_tables)
    g = 16
    rng = np.random.default_rng(3)
    fine = (rng.random(g ** 3) < 0.3).astype(np.uint8)
    fine_bits = jnp.asarray(
        (fine.reshape(-1, 8) << np.arange(8)).sum(1).astype(np.uint8))
    coarse_nbr, fine_nbr = occupancy_nbr_tables(fine_bits, g)

    # query random anchors with all 64 local offsets that stay in-bounds
    anchors = rng.integers(0, g - 1, size=(64, 3)).astype(np.int32)
    offs = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(4),
                                indexing="ij"), -1).reshape(-1, 3)[:, ::-1]
    cells = anchors[:, None, :] + offs[None, :, :]          # (64, 64, 3)
    in_b = (cells < g).all(-1)
    cells_c = np.minimum(cells, g - 1)
    got = np.asarray(neighborhood_lookup(
        fine_nbr, jnp.asarray(anchors), jnp.asarray(cells_c), g))
    want = np.asarray(bitfield_lookup(
        fine_bits, morton3d(jnp.asarray(cells_c)).astype(jnp.int32)))
    np.testing.assert_array_equal(got[in_b], want[in_b])


def test_coarse_nbr_is_dilated_superset():
    """The coarse neighborhood rows encode the +-1-dilated half-res grid: any
    cell with an occupied fine cell in its 2x2x2 block (or a neighbor's) must
    test occupied."""
    from mfnerf_tpu.ops.morton import (coarse_bitfield_from_fine,
                                       morton3d, bitfield_lookup as bl,
                                       neighborhood_lookup,
                                       occupancy_nbr_tables)
    g = 16
    rng = np.random.default_rng(4)
    fine = (rng.random(g ** 3) < 0.05).astype(np.uint8)
    fine_bits = jnp.asarray(
        (fine.reshape(-1, 8) << np.arange(8)).sum(1).astype(np.uint8))
    coarse_nbr, _ = occupancy_nbr_tables(fine_bits, g)
    coarse_bits = coarse_bitfield_from_fine(fine_bits, g, 1)

    g2 = g // 2
    cells = np.stack(np.meshgrid(*[np.arange(g2)] * 3,
                                 indexing="ij"), -1).reshape(-1, 3)[:, ::-1]
    cells = cells.astype(np.int32)
    got = np.asarray(neighborhood_lookup(
        coarse_nbr, jnp.asarray(cells), jnp.asarray(cells[:, None, :]),
        g2))[:, 0]
    want = np.asarray(bl(coarse_bits, morton3d(jnp.asarray(cells))
                         .astype(jnp.int32)))
    np.testing.assert_array_equal(got, want)
