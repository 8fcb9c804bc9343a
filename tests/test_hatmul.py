"""Pallas fused hat-product kernel vs the XLA dense-basis oracle.

Runs the kernel in Pallas interpreter mode (CPU-safe); on TPU the same
kernel is compiled by Mosaic. Checks forward parity, dW/du gradient parity
(vs autodiff through the dense-basis formulation), and the zero-padded-row
exactness claim."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mfnerf_tpu.ops.hatmul import TN, hat_prod

K = 65    # knots (small for interpreter speed; covers K != KP)
KP = 128  # padded
R = 16


def _dense_ref(u3, w):
    ks = jnp.arange(KP, dtype=jnp.float32)[None, :]
    prod = None
    for d in range(3):
        pos = u3[:, d][:, None] * (K - 1)
        basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))
        a = jnp.dot(basis.astype(jnp.bfloat16), w[d].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        prod = a if prod is None else prod * a
    return prod


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n = TN + 37  # exercise the pad path
    u3 = jax.random.uniform(k1, (n, 3), jnp.float32)
    w = 0.3 * jax.random.normal(k2, (3, KP, R), jnp.float32)
    w = w.at[:, K:, :].set(0.0)
    return u3, w


def test_forward_matches_dense(data):
    u3, w = data
    got = hat_prod(u3, w, K, interpret=True)
    want = _dense_ref(u3, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_gradients_match_dense(data):
    u3, w = data

    def loss_pallas(u3, w):
        out = hat_prod(u3, w, K, interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_dense(u3, w):
        return jnp.sum(jnp.sin(_dense_ref(u3, w)))

    gu_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(u3, w)
    gu_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(u3, w)
    # dW: bf16 operand matmuls both sides
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_d),
                               atol=2e-2, rtol=2e-2)
    # du: at a position EXACTLY on a knot the hat subgradient is ambiguous
    # (the kernel picks 0, XLA autodiff half-weights the neighbors; both
    # valid) — random f32 uniforms do land on dyadic knots, so mask those
    # wider bound than dW: the kernel's dB matmul rounds the cotangent to
    # bf16 (the MXU wants matching operand dtypes) and du multiplies dB by
    # the (K-1)=64x hat-derivative scale, amplifying that rounding; du only
    # drives pose refinement (--optimize_ext, ext lr 1e-6 parity default)
    # where percent-level gradient noise is irrelevant
    pos = np.asarray(u3) * (K - 1)
    off_knot = np.abs(pos - np.round(pos)) > 1e-5
    np.testing.assert_allclose(np.asarray(gu_p)[off_knot],
                               np.asarray(gu_d)[off_knot],
                               atol=1e-1, rtol=3e-1)
    # padded knot rows receive zero gradient
    assert float(jnp.abs(gw_p[:, K:, :]).max()) == 0.0
