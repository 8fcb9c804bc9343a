"""Marching step-size schedule and cascade (mip) selection — pure jnp.

The reference's CUDA ray marcher (models/csrc/raymarching.cu:166-280) advances
each ray by ``dt = clamp(t * exp_step_factor, SQRT3/max_samples,
SQRT3*2*scale/grid_size)`` in *both* its occupied-sample branch and its
empty-space-skip branch (the skip's do-while at raymarching.cu:230-233 steps
``t`` through the same increments until it passes the voxel boundary).

Consequence — and the key to the TPU-native design: the sequence of t values
visited by a ray is a fixed recurrence ``t_{k+1} = t_k + clamp(t_k*e, a, b)``
that depends only on the start ``t_0``, NOT on occupancy. Occupancy merely
selects which rungs of this "t-ladder" emit samples. The recurrence has a
closed form (linear -> geometric -> linear regimes), so the whole
variable-length DDA march collapses into a fixed-shape, fully vectorized
evaluation: build the ladder, look up occupancy at every rung, compact.
"""
import math

import jax.numpy as jnp

SQRT3 = 1.7320508075688772


def calc_dt(t, exp_step_factor, max_samples, grid_size, scale):
    """Step size at distance ``t``. Parity: reference raymarching.cu:11-13."""
    dt_min = SQRT3 / max_samples
    dt_max = SQRT3 * 2.0 * scale / grid_size
    return jnp.clip(t * exp_step_factor, dt_min, dt_max)


def _frexp_exponent(x):
    """Exact frexp() exponent of |x| via float32 bit manipulation.

    frexp writes |x| = m * 2^e with m in [0.5, 1); returns e. For zero and
    subnormal inputs returns a large negative value (so callers clamping to
    >= 0 get 0, matching frexp(0) == 0 semantics in the reference's use).
    """
    bits = jnp.abs(x).astype(jnp.float32).view(jnp.int32)
    return ((bits >> 23) & 0xFF) - 126


def mip_from_pos(xyz, cascades):
    """Cascade index from position: |xyz| in [0,.5)->0, [.5,1)->1, [1,2)->2...

    Parity: reference raymarching.cu:19-23 (frexpf-based).
    """
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    exponent = _frexp_exponent(mx)
    return jnp.clip(exponent + 1, 0, cascades - 1)


def mip_from_dt(dt, grid_size, cascades):
    """Cascade index from step size: dt*gs in [0,1)->0, [1,2)->1, [2,4)->2...

    Parity: reference raymarching.cu:29-32.
    """
    exponent = _frexp_exponent(dt * grid_size)
    return jnp.clip(exponent, 0, cascades - 1)


def t_ladder(t0, ks, exp_step_factor, max_samples, grid_size, scale):
    """Closed form of the marching recurrence t_{k+1} = t_k + calc_dt(t_k).

    Args:
        t0: (N,) start distances (already jittered/clamped).
        ks: (K,) or (N, K) integer rung indices.
        exp_step_factor, max_samples, grid_size, scale: schedule constants
            (see :func:`calc_dt`).

    Returns:
        (N, K) float32 t values; ``t_ladder(t0, 0) == t0``.

    Derivation: with a = SQRT3/max_samples, b = SQRT3*2*scale/grid_size,
    e = exp_step_factor, the recurrence has three regimes:
      linear-a   while t <  a/e : t += a
      geometric  while t <  b/e : t *= (1+e)
      linear-b   afterwards     : t += b
    so rung k is (t0 + k1*a) * (1+e)^kg + kb*b with k1/kg/kb the number of
    steps spent in each regime.
    """
    a = SQRT3 / max_samples
    b = SQRT3 * 2.0 * scale / grid_size
    e = exp_step_factor

    t0 = t0.astype(jnp.float32)
    ks = jnp.asarray(ks)
    if t0.ndim == 1:
        t0 = t0[:, None]           # (N, 1)
        if ks.ndim == 1:
            ks = ks[None, :]       # (1, K); 2-D ks is already (N, K)
    ks = ks.astype(jnp.float32)

    if e == 0.0:
        return t0 + ks * a

    ta = a / e  # below: dt == a
    tb = b / e  # above: dt == b
    # steps spent in the linear-a regime starting from t0
    n1 = jnp.ceil(jnp.maximum(ta - t0, 0.0) / a)
    t_g0 = t0 + n1 * a  # first t in the geometric regime
    # steps spent in the geometric regime (t_g0 * (1+e)^m >= tb)
    log1pe = math.log1p(e)
    m2 = jnp.ceil(jnp.maximum(jnp.log(jnp.maximum(tb / t_g0, 1.0)), 0.0)
                  / log1pe)

    k1 = jnp.minimum(ks, n1)
    kg = jnp.clip(ks - n1, 0.0, m2)
    kb = jnp.maximum(ks - n1 - m2, 0.0)
    return (t0 + k1 * a) * jnp.exp(kg * log1pe) + kb * b


def max_ladder_steps(t_start_min, t_end_max, exp_step_factor, max_samples,
                     grid_size, scale):
    """Static (Python-level) upper bound on the number of ladder rungs needed
    to march from any t >= t_start_min to t_end_max. Used to size the padded
    occupancy/compaction buffers at trace time.
    """
    a = SQRT3 / max_samples
    b = SQRT3 * 2.0 * scale / grid_size
    e = exp_step_factor
    if e == 0.0:
        return max(1, int(math.ceil((t_end_max - t_start_min) / a)) + 1)
    t = max(t_start_min, 0.0)
    k = 0
    while t < t_end_max:
        t += min(max(t * e, a), b)
        k += 1
        if k > 16 * max_samples:  # safety; should never trigger
            break
    return max(1, k + 1)
