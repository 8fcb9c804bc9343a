import numpy as np
import jax
import jax.numpy as jnp

from mfnerf_tpu.ops.sh import sh_encode
from mfnerf_tpu.ops.activations import trunc_exp


def _random_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def test_sh_orthonormality():
    """Monte-Carlo check: SH bases are orthonormal over the sphere."""
    d = _random_unit(200_000)
    y = np.asarray(sh_encode(jnp.asarray((d + 1) / 2), degree=4))
    gram = 4 * np.pi * (y.T @ y) / len(d)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_sh_degree_sizes_and_prefix():
    d = jnp.asarray((_random_unit(16) + 1) / 2)
    full = np.asarray(sh_encode(d, 4))
    for deg in [1, 2, 3, 4]:
        y = np.asarray(sh_encode(d, deg))
        assert y.shape == (16, deg ** 2)
        np.testing.assert_allclose(y, full[:, : deg ** 2], rtol=1e-6)


def test_sh_known_values():
    # +z axis: all m != 0 bands vanish except the zonal ones
    y = np.asarray(sh_encode(jnp.asarray([[0.5, 0.5, 1.0]]), 4))[0]
    np.testing.assert_allclose(y[0], 0.28209479, rtol=1e-5)
    np.testing.assert_allclose(y[2], 0.48860251, rtol=1e-5)   # z band
    np.testing.assert_allclose(y[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[3], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[6], 0.94617470 - 0.31539157, rtol=1e-5)


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.asarray([-20.0, -1.0, 0.0, 2.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)),
                               rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    expect = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)
