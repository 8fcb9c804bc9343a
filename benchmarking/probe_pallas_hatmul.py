#!/usr/bin/env python
"""Feasibility probe: Pallas fused hat-basis matmul for the LowRank encoder.

The XLA encoder is HBM-bound: the dense hat basis (N, K_max) bf16 must be
materialized per (frame, axis) before its matmul — ~6.4 GB of traffic per
524k-sample forward (measured 8.5 ms, ~30% MXU). A Pallas kernel that
builds the basis TILE in VMEM and feeds the MXU in place reduces HBM
traffic to read-x + write-out (~40x less).

Formulation per grid step (tile of TN samples, one frame):
    for d in 0..2:  basis_d = relu(1 - |u_d*(K-1) - iota_K|)   (TN, KP)
                    a_d = dot(basis_d.bf16, W_d.bf16)          (TN, R)
    out = a_0 * a_1 * a_2
W_d (KP, R) stays VMEM-resident across the grid (R = L*rank = 128,
KP = 640 >= K_max+1 padded to a lane multiple; hat weights past K_max are
identically zero so padding W with zeros is exact).

Prints compile status + ns/sample vs the XLA dense-basis reference.
"""
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timeit_loop(fn, iters, *args):
    """Dependent-iteration timing inside one jit (tunnel-honest)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=())
    def run(*a):
        def body(i, acc):
            out = fn(a[0] + i * 1e-7, *a[1:])
            return acc + out.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    acc = run(*args)
    float(jax.device_get(acc))
    t0 = time.perf_counter()
    acc = run(*args)
    float(jax.device_get(acc))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", file=sys.stderr)
    K = 513          # K_max + 1 knots
    KP = 640         # padded to a multiple of 128
    R = 128          # L * rank output columns
    N = 1 << 19      # 524288 — the padded train-eval sample count
    TN = 256

    key = jax.random.PRNGKey(0)
    u3 = jax.random.uniform(key, (N, 3), jnp.float32)
    w = 0.1 * jax.random.normal(key, (3, KP, R), jnp.float32)
    w = w.at[:, K:, :].set(0.0)

    # ---- XLA reference: dense hat basis then matmul (current encoder path)
    def xla_ref(u3, w):
        prod = None
        ks = jnp.arange(KP, dtype=jnp.float32)[None, :]
        for d in range(3):
            pos = u3[:, d][:, None] * (K - 1)
            basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))
            a = jnp.dot(basis.astype(jnp.bfloat16),
                        w[d].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            prod = a if prod is None else prod * a
        return prod

    ref_jit = jax.jit(xla_ref)
    want = np.asarray(ref_jit(u3, w))
    dt = timeit_loop(xla_ref, 8, u3, w)
    print(f"XLA dense-basis ref: {dt * 1e3:.2f} ms = "
          f"{dt / N * 1e9:.2f} ns/sample")

    # ---- Pallas fused kernel
    def kernel(u_ref, w_ref, out_ref):
        u = u_ref[:]                               # (TN, 3)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TN, KP), 1
                                        ).astype(jnp.float32)
        prod = None
        for d in range(3):
            pos = u[:, d][:, None] * (K - 1)
            basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - iota))
            a = jnp.dot(basis.astype(jnp.bfloat16),
                        w_ref[d].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            prod = a if prod is None else prod * a
        out_ref[:] = prod

    @jax.jit
    def run_pallas(u3, w):
        return pl.pallas_call(
            kernel,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((TN, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, KP, R), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, R), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, R), jnp.float32),
        )(u3, w)

    try:
        got = np.asarray(run_pallas(u3, w))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-2)
        dt = timeit_loop(run_pallas, 8, u3, w)
        print(f"pallas fused hatmul: {dt * 1e3:.2f} ms = "
              f"{dt / N * 1e9:.2f} ns/sample  (correct)")
    except Exception as e:
        print(f"pallas fused hatmul FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")


if __name__ == "__main__":
    main()
