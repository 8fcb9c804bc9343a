"""Morton (Z-order) codes and occupancy-bitfield packing — pure jnp.

TPU-native equivalents of the reference CUDA kernels ``morton3D``,
``morton3D_invert`` and ``packbits`` (reference: models/csrc/raymarching.cu:35-161).
On TPU these are pure VPU bit-twiddling ops that XLA fuses into their callers;
no dedicated kernel is needed.

The occupancy grid stores one density value per cell, addressed by
``mip * grid_size**3 + morton3d(cell_xyz)``; the bitfield packs 8 cells per
byte with bit ``i`` of byte ``n`` covering cell ``8*n + i``.
"""
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of ``v`` so consecutive bits are 3 apart.

    Standard magic-number bit dilation (public domain bit trick, used by the
    reference at raymarching.cu:35-42 and by many space-filling-curve libs).
    """
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit x,y,z integer coords into a 30-bit Morton index.

    Args:
        coords: (..., 3) integer array, each component in [0, 1024).
    Returns:
        (...,) uint32 Morton codes. Parity: reference raymarching.cu:44-50.
    """
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return x | (y << 1) | (z << 2)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """Invert :func:`morton3d`: Morton index -> (..., 3) integer coords.

    Parity: reference raymarching.cu:52-60 / 90-101.
    """
    indices = indices.astype(jnp.uint32)
    x = _compact_bits(indices)
    y = _compact_bits(indices >> 1)
    z = _compact_bits(indices >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(density_grid: jnp.ndarray, density_threshold) -> jnp.ndarray:
    """Threshold a float density grid into a uint8 occupancy bitfield.

    Args:
        density_grid: (C, G**3) or flat (C*G**3,) float densities in Morton
            cell order.
        density_threshold: scalar; a cell is occupied iff density > threshold.
    Returns:
        (C*G**3//8,) uint8 bitfield, bit i of byte n = cell 8*n+i occupied.
        Parity: reference raymarching.cu:122-161 (vren.packbits).
    """
    flat = density_grid.reshape(-1, 8)
    bits = (flat > density_threshold).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (bits * weights).sum(axis=-1).astype(jnp.uint8)


_DILATE_PERMS = {}


def _morton_spatial_perms(g: int):
    """(to_spatial, to_morton) index permutations between Morton storage
    order and (x, y, z) raster order for a g^3 grid (cached; pure NumPy so
    it is safe to call inside a jit trace)."""
    if g not in _DILATE_PERMS:
        import numpy as np

        def compact(v):
            v = v & np.uint32(0x49249249)
            v = (v | (v >> 2)) & np.uint32(0xC30C30C3)
            v = (v | (v >> 4)) & np.uint32(0x0F00F00F)
            v = (v | (v >> 8)) & np.uint32(0xFF0000FF)
            v = (v | (v >> 16)) & np.uint32(0x0000FFFF)
            return v

        codes = np.arange(g ** 3, dtype=np.uint32)
        x, y, z = compact(codes), compact(codes >> 1), compact(codes >> 2)
        flat = (z.astype(np.int64) * g + y) * g + x
        to_spatial = np.empty(g ** 3, np.int32)
        to_spatial[flat] = codes.astype(np.int32)   # spatial pos -> morton idx
        _DILATE_PERMS[g] = (to_spatial, flat.astype(np.int32))
    return _DILATE_PERMS[g]


def coarse_bitfield_from_fine(fine_bitfield: jnp.ndarray, grid_size: int,
                              cascades: int) -> jnp.ndarray:
    """Build a dilated half-resolution occupancy bitfield from the fine one.

    Key structural property of Morton order: the 8 children of a coarse
    (2x-pooled) cell are consecutive fine codes, i.e. exactly one BYTE of the
    packed fine bitfield — so the un-dilated coarse occupancy is simply
    ``fine_byte != 0``. The coarse grid is then dilated by one cell (3^3 max)
    so that testing the single coarse cell at a march stratum's center
    conservatively covers every fine rung in the stratum (see
    ray_march.march_rays_train_twolevel), and repacked to bits.

    Returns:
        (cascades * (grid_size//2)^3 // 8,) uint8.
    """
    g2 = grid_size // 2
    per = g2 ** 3
    coarse = (fine_bitfield.reshape(cascades, per) != 0)
    out = []
    for c in range(cascades):
        d = morton_values_to_spatial(coarse[c], g2)
        for axis in range(3):
            d = d | jnp.roll(d, 1, axis) | jnp.roll(d, -1, axis)
        # jnp.roll wraps; boundary wrap marks a few spurious edge cells
        # occupied — conservative, never drops a sample
        out.append(spatial_to_morton_values(d, g2))
    coarse_morton = jnp.stack(out).reshape(-1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return (coarse_morton.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)


def _unpack_bits_morton(bitfield: jnp.ndarray, n_cells: int) -> jnp.ndarray:
    """Packed uint8 bitfield -> (n_cells,) bool in Morton cell order."""
    bits = (bitfield[:, None] >> jnp.arange(8, dtype=jnp.uint8)) \
        & jnp.uint8(1)
    return bits.reshape(-1)[:n_cells].astype(jnp.bool_)


def morton_values_to_spatial(v: jnp.ndarray, g: int) -> jnp.ndarray:
    """(g^3,) Morton-ordered per-cell values -> (g, g, g) raster [z, y, x].

    XLA gather cost is per ROW regardless of width (docs/TPU_NOTES.md), so
    instead of permuting g^3 cells with a flat gather (the dominant cost of
    every occupancy-table rebuild at g=128: ~2M random rows), gather
    (g/2)^3 rows of 8 values — each row is exactly a Morton 2x2x2 child
    block (bit i covers offset x0=i&1, y0=i>>1&1, z0=i>>2) — and expand the
    blocks into place with a reshape/transpose: 8x fewer gather rows, the
    rest is a contiguous relayout XLA streams.
    """
    g2 = g // 2
    to_spatial, _ = _morton_spatial_perms(g2)
    rows = v.reshape(g2 ** 3, 8)[jnp.asarray(to_spatial)]
    a = rows.reshape(g2, g2, g2, 2, 2, 2)   # [..., z0, y0, x0]
    return a.transpose(0, 3, 1, 4, 2, 5).reshape(g, g, g)


def spatial_to_morton_values(a: jnp.ndarray, g: int) -> jnp.ndarray:
    """(g, g, g) raster [z, y, x] -> (g^3,) Morton-ordered values (inverse
    of :func:`morton_values_to_spatial`, same 8-wide-row gather trick)."""
    g2 = g // 2
    _, to_morton = _morton_spatial_perms(g2)
    blocks = a.reshape(g2, 2, g2, 2, g2, 2).transpose(0, 2, 4, 1, 3, 5)
    rows = blocks.reshape(g2 ** 3, 8)[jnp.asarray(to_morton)]
    return rows.reshape(-1)


NBR_SPAN = 8  # neighborhood-row window width in cells (span <= NBR_SPAN-1)


def neighborhood_table(occ_spatial: jnp.ndarray) -> jnp.ndarray:
    """Pack each cell's 8x8x8 forward neighborhood into one 512-bit row.

    The gather-wide marching primitive: XLA random-gather cost is per ROW,
    not per byte (measured 16M x 32B rows slightly CHEAPER than 16M x 8B,
    docs/TPU_NOTES.md), so fetching 512 cells per gather cuts the march's
    occupancy-test gathers vs per-cell tests by the full window factor.
    Round 2 used 4^3 (64-bit) rows; 8^3 doubles the rung span a single
    gather covers, halving both stage-A superstratum gathers and stage-B
    per-stratum gathers (ray_march.superstrata_len / twolevel_stratum).

    Row r = (z*g + y)*g + x holds the occupancy of cells
    (x+lx, y+ly, z+lz), l in [0,8)^3, in word lz*2 + (ly>=4) at bit
    lx + 8*(ly%4). Built separably (shifted-OR passes + z rolls); the
    wrap-around roll writes garbage bits only at row/offset pairs that
    point outside the grid, which lookups never read (the anchor is the
    min of in-bounds cells).

    Args:
        occ_spatial: (g, g, g) bool occupancy, axes [z, y, x] raster order.
    Returns:
        (g^3, 16) uint32, row-indexed by (z*g + y)*g + x.
    """
    occ = occ_spatial.astype(jnp.uint32)
    px = occ
    for ox in range(1, 8):
        px = px | (jnp.roll(occ, -ox, axis=2) << ox)         # 8 bits of lx
    lo = px
    for oy in range(1, 4):
        lo = lo | (jnp.roll(px, -oy, axis=1) << (8 * oy))    # ly in 0..3
    hi = jnp.roll(px, -4, axis=1)
    for oy in range(5, 8):
        hi = hi | (jnp.roll(px, -oy, axis=1) << (8 * (oy - 4)))  # ly 4..7
    words = []
    for lz in range(8):
        words.append(jnp.roll(lo, -lz, axis=0).reshape(-1))
        words.append(jnp.roll(hi, -lz, axis=0).reshape(-1))
    return jnp.stack(words, axis=-1)


def neighborhood_lookup(table: jnp.ndarray, anchor: jnp.ndarray,
                        cells: jnp.ndarray, g: int) -> jnp.ndarray:
    """Occupancy of ``cells`` read from their shared neighborhood row.

    Args:
        table: (g^3, 16) uint32 from :func:`neighborhood_table`.
        anchor: (..., 3) int32 xyz cell coords; every query cell must lie in
            anchor + [0, NBR_SPAN)^3 (callers guarantee this statically by
            bounding the marching span; see ray_march.superstrata_len).
        cells: (..., K, 3) int32 xyz cell coords.
        g: grid resolution.
    Returns:
        (..., K) bool — one row gather per anchor for K cell tests.
    """
    idx = (anchor[..., 2] * g + anchor[..., 1]) * g + anchor[..., 0]
    rows = table[idx]                                        # (..., 16)
    local = cells - anchor[..., None, :]
    word_i = (local[..., 2] * 2 + (local[..., 1] >> 2))      # (..., K)
    bit = (local[..., 0] + 8 * (local[..., 1] & 3)).astype(jnp.uint32)
    # word selection as a 16-way select-sum (VPU stream; a take_along_axis
    # here would be K more random gathers — the cost this table avoids).
    # A 4-level binary select tree was probed and is NOT faster: XLA fuses
    # the where+sum into one streaming pass already (bench 20.6 vs 20.0
    # ms/step, 2026-08-18).
    word = jnp.sum(
        jnp.where(word_i[..., None] == jnp.arange(16, dtype=word_i.dtype),
                  rows[..., None, :], jnp.uint32(0)),
        axis=-1)                                             # (..., K)
    return ((word >> bit) & 1).astype(jnp.bool_)


def occupancy_nbr_tables(fine_bitfield: jnp.ndarray, grid_size: int,
                         dilate: int = 1, pool_a: int = 0):
    """Neighborhood tables for two-level marching (single-cascade scenes).

    Args:
        dilate: coarse dilation radius in cells — must match (be >=) the
            ``dilate`` half of ray_march.twolevel_stratum so the stage-A
            center test conservatively covers the whole stratum.
        pool_a: when nonzero, ALSO build the pooled (g/pool_a) stage-A
            table (see :func:`pooled_stage_a_table`) from the same
            unpacked fine grid — the unpack + Morton->raster permute of
            the g^3 cells is a ~2M-row gather, the dominant table-build
            cost, and building the pooled table separately would pay it
            twice per occupancy refresh.
    Returns:
        (coarse_nbr, fine_nbr[, pool_nbr]): 8^3-neighborhood rows of the
        DILATED half-resolution grid ((g/2)^3, 16), of the exact fine grid
        ((g^3, 16)), and — with ``pool_a`` — of the dilated pooled grid;
        see neighborhood_table. The coarse grid reuses the Morton-byte
        pooling + dilation of :func:`coarse_bitfield_from_fine`.
    """
    g = grid_size
    g2 = g // 2
    coarse = morton_values_to_spatial(fine_bitfield[: g2 ** 3] != 0, g2)
    d = coarse
    for axis in range(3):
        for _ in range(dilate):
            d = d | jnp.roll(d, 1, axis) | jnp.roll(d, -1, axis)

    fine = morton_values_to_spatial(
        _unpack_bits_morton(fine_bitfield[: g ** 3 // 8], g ** 3), g)
    if not pool_a:
        return neighborhood_table(d), neighborhood_table(fine)
    return (neighborhood_table(d), neighborhood_table(fine),
            _pooled_table_from_spatial(fine, pool_a, dilate=1))


def _pooled_table_from_spatial(fine_spatial: jnp.ndarray, pool: int,
                               dilate: int = 1) -> jnp.ndarray:
    """Pooled stage-A neighborhood rows from an already-unpacked (g, g, g)
    spatial occupancy grid (shared-unpack core of
    :func:`pooled_stage_a_table`)."""
    g = fine_spatial.shape[0]
    if g % pool:
        raise ValueError(f"grid_size ({g}) must be divisible by the "
                         f"stage-A pool factor ({pool})")
    gp = g // pool
    pooled = fine_spatial.reshape(gp, pool, gp, pool, gp, pool) \
        .any(axis=(1, 3, 5))
    d = pooled
    for axis in range(3):
        for _ in range(dilate):
            # jnp.roll wraps; spurious edge cells are conservative
            d = d | jnp.roll(d, 1, axis) | jnp.roll(d, -1, axis)
    return neighborhood_table(d)


def pooled_stage_a_table(fine_bitfield: jnp.ndarray, grid_size: int,
                         pool: int = 4, dilate: int = 1) -> jnp.ndarray:
    """8^3-neighborhood rows of a ``pool``x-pooled, dilated occupancy grid.

    Stage-A economics (training march): at the bench config the stratum
    span (~4.2 half-res cells) fills a whole 8^3 row, so superstrata_len
    degenerates to 1 and stage A pays ONE row gather per stratum per ray —
    262k gathers ~ 2.1 ms/step of the 3.85 ms march (profile_stages +
    profile_march, 2026-08-20). Pooling the grid 2x further (G/4 cells)
    fits ~3 strata per row, cutting stage-A gathers ~3x. The coarser cell
    admits more stage-A false positives, which the march's exact stage-B
    test discards — acceptable for TRAINING (field evals are fixed at
    N*s_flat there) but NOT for the wavefront renderer, where a
    false-positive stratum wastes a whole padded field iteration (the
    dilate-2 FPS regression, docs/R4_TPU_QUEUE.md); the test path keeps
    the G/2 table.

    Args:
        fine_bitfield: packed cascade-0 bitfield (>= G^3/8 bytes).
        grid_size: fine grid resolution G.
        pool: pooling factor (cells of the stage-A grid are ``pool`` fine
            cells wide).
        dilate: dilation radius in POOLED cells (must match the march's
            probe spacing contract, ray_march.stage_a_probes).
    Returns:
        ((G/pool)^3, 16) uint32 neighborhood rows (morton.neighborhood_table
        layout, row-indexed in raster order of the pooled grid).
    """
    g = grid_size
    if g % pool:
        raise ValueError(f"grid_size ({g}) must be divisible by the "
                         f"stage-A pool factor ({pool})")
    fine = morton_values_to_spatial(
        _unpack_bits_morton(fine_bitfield[: g ** 3 // 8], g ** 3), g)
    return _pooled_table_from_spatial(fine, pool, dilate=dilate)


def union_bitfield(fine_bitfield: jnp.ndarray, grid_size: int,
                   cascades: int, dilate: int) -> jnp.ndarray:
    """Dilated WORLD-SPACE union of every cascade's occupancy.

    The stage-A structure for multi-cascade two-level marching
    (ray_march.march_rays_train_cascades): one grid at ``grid_size``^3 over
    the largest cascade's box [-S, S]^3 (S = 2^(cascades-1) * base, but only
    relative placement matters here) where a cell is occupied iff ANY
    cascade has an occupied cell intersecting it. Cascade c (half-extent
    2^c smaller... i.e. factor f = 2^(cascades-1-c) smaller box) occupies
    the central (G/f)^3 cells; its G^3 cells pool by OR over f^3 blocks.
    The result is dilated by ``dilate`` cells per axis so that testing ONE
    cell at a march stratum's center conservatively covers every rung
    within ``dilate`` cell-widths of it.

    Returns:
        (grid_size^3 // 8,) uint8 packed bitfield in MORTON order (the same
        bitfield_lookup addressing as the per-cascade fields).
    """
    g = grid_size
    union = jnp.zeros((g, g, g), jnp.bool_)
    for c in range(cascades):
        f = 1 << (cascades - 1 - c)
        occ = morton_values_to_spatial(_unpack_bits_morton(
            fine_bitfield[c * g ** 3 // 8:(c + 1) * g ** 3 // 8], g ** 3), g)
        if f > 1:
            gf = g // f
            pooled = occ.reshape(gf, f, gf, f, gf, f).any(axis=(1, 3, 5))
            lo = (g - gf) // 2
            union = union.at[lo:lo + gf, lo:lo + gf, lo:lo + gf].set(
                union[lo:lo + gf, lo:lo + gf, lo:lo + gf] | pooled)
        else:
            union = union | occ
    d = union
    for axis in range(3):
        for _ in range(dilate):
            # wrap-around marks a few spurious edge cells: conservative
            d = d | jnp.roll(d, 1, axis) | jnp.roll(d, -1, axis)
    d_m = spatial_to_morton_values(d, g).reshape(-1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return (d_m.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)


def bitfield_lookup(bitfield: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Test occupancy bit ``idx`` in a packed bitfield.

    Args:
        bitfield: (N_bytes,) uint8.
        idx: (...,) integer cell indices (mip*G^3 + morton code).
    Returns:
        (...,) bool occupancy.
    """
    byte = bitfield[idx >> 3]
    bit = (byte >> (idx & 7).astype(jnp.uint8)) & jnp.uint8(1)
    return bit.astype(jnp.bool_)
