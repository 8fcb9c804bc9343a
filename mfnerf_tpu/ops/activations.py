"""Truncated-exponential density activation with clamped-gradient VJP.

Parity with the reference TruncExp autograd Function
(models/custom_functions.py:162-173): forward is exp(x); backward multiplies
the cotangent by exp(clamp(x, -15, 15)) so huge densities cannot produce
overflowing gradients. Computed in float32 regardless of input dtype (the
reference forces fp32 through custom_fwd(cast_inputs=float32)).
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x.astype(jnp.float32))


def _fwd(x):
    x = x.astype(jnp.float32)
    return jnp.exp(x), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
