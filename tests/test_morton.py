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
