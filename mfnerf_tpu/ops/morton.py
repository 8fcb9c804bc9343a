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
