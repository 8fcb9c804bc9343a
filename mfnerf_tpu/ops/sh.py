"""Real spherical-harmonics direction encoding (degree <= 4) — pure jnp.

TPU-native replacement for the tinycudann ``SphericalHarmonics`` encoding the
reference instantiates at models/networks.py:60-67 (degree 4 -> 16 coeffs).
Matches tcnn's convention: the input is a direction mapped to [0,1]^3 (the
caller does ``(d+1)/2``, reference networks.py:146); the encoding internally
rescales back to [-1,1] and evaluates the closed-form real-SH polynomials.

The polynomial constants are the standard real spherical-harmonics
normalization factors (public mathematical formulas).
"""
import jax.numpy as jnp


def sh_encode(dirs01: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate real SH bases of the given degree.

    Args:
        dirs01: (..., 3) unit directions rescaled to [0,1] (i.e. (d+1)/2).
        degree: 1..4; output has degree**2 components.

    Returns:
        (..., degree**2) float32 SH features.
    """
    if not 1 <= degree <= 4:
        raise ValueError(f"degree must be in [1,4], got {degree}")
    d = dirs01.astype(jnp.float32) * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)
