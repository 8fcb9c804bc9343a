#!/usr/bin/env python
"""Second-round Mosaic probes for the LowRank encoder hot ops (the round-2
probes died in remote compile with HTTP 500; the hatmul probe now compiles,
so re-test the sparse formulations).

Probe A — lane-axis dynamic_gather forward: the hat interpolation
    a[t, c] = (1-f_t) * W[i_t, c] + f_t * W[i_t + 1, c]
expressed with the table TRANSPOSED to (R sublanes, K lanes) and
jnp.take_along_axis along the LANE axis with the per-sample index broadcast
over sublanes (Mosaic's dynamic_gather wants idx shape == table shape, so
each call processes K-lane-width sample tiles). If this runs at VPU rates
the encoder forward drops from ~164k FLOP/sample (dense basis matmul) to
~2 reads + a lerp.

Probe B — Pallas dense-basis BACKWARD: dW = sum_t basis[t]^T @ g[t]
accumulated in VMEM across a sequential grid (out block revisited), so the
(N, K) basis never hits HBM. This is the table-gradient path that XLA
serves with a scatter-add (60 ns/update, docs/TPU_NOTES.md).
"""
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timeit_loop(fn, iters, *args):
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
    K = 513
    KP = 640
    R = 128
    N = 1 << 19
    TN = 640            # probe A tile: lane width of the transposed table

    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (N,), jnp.float32, minval=0.0, maxval=1.0)
    w = 0.1 * jax.random.normal(key, (KP, R), jnp.float32)
    w = w.at[K:, :].set(0.0)

    pos = u * (K - 1)
    idx = jnp.clip(pos.astype(jnp.int32), 0, K - 2)
    frac = pos - idx.astype(jnp.float32)

    def ref(u, w):
        pos = u * (K - 1)
        i = jnp.clip(pos.astype(jnp.int32), 0, K - 2)
        f = (pos - i.astype(jnp.float32))[:, None]
        return w[i] * (1 - f) + w[i + 1] * f

    want = np.asarray(jax.jit(ref)(u, w))
    dt = timeit_loop(ref, 8, u, w)
    print(f"XLA row-gather ref: {dt * 1e3:.2f} ms = "
          f"{dt / N * 1e9:.2f} ns/sample")

    # ---------------- probe A: lane-axis take_along_axis
    wt = jnp.asarray(np.asarray(w).T)          # (R, KP) — lanes = K

    # TN == KP: the idx operand then has exactly the table's shape, which is
    # Mosaic dynamic_gather's documented constraint
    def k_gather(u_ref, wt_ref, out_ref):
        uu = u_ref[:]                          # (1, TN)
        pos = uu * (K - 1)
        i = jnp.clip(pos.astype(jnp.int32), 0, K - 2)    # (1, TN)
        f = pos - i.astype(jnp.float32)
        tab = wt_ref[:]                        # (R, KP)
        idx2 = jnp.broadcast_to(i, (R, TN))
        t0 = jnp.take_along_axis(tab, idx2, axis=1)      # (R, TN)
        t1 = jnp.take_along_axis(tab, idx2 + 1, axis=1)
        out_ref[:] = jnp.transpose(t0 * (1 - f) + t1 * f)

    @jax.jit
    def run_gather(u, wt):
        return pl.pallas_call(
            k_gather,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((1, TN), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, KP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, R), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, R), jnp.float32),
        )(u.reshape(1, N), wt)

    try:
        got = np.asarray(run_gather(u, wt))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
        dt = timeit_loop(lambda uu, ww: run_gather(uu.reshape(-1), ww), 8,
                         u, wt)
        print(f"pallas lane-gather fwd: {dt * 1e3:.2f} ms = "
              f"{dt / N * 1e9:.2f} ns/sample  (correct)")
    except Exception as e:
        print(f"pallas lane-gather fwd FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")

    # ---------------- probe B: dense-basis backward, dW accumulated in VMEM
    TB = 256
    g = jax.random.normal(key, (N, R), jnp.float32)

    def ref_bwd(u, g):
        ks = jnp.arange(KP, dtype=jnp.float32)[None, :]
        pos = u[:, None] * (K - 1)
        basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))
        return jnp.dot(basis.T.astype(jnp.bfloat16),
                       g.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    want_bwd = np.asarray(jax.jit(ref_bwd)(u, g))
    dt = timeit_loop(ref_bwd, 8, u, g)
    print(f"XLA dense-basis bwd ref: {dt * 1e3:.2f} ms = "
          f"{dt / N * 1e9:.2f} ns/sample")

    def k_bwd(u_ref, g_ref, dw_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        uu = u_ref[:]                            # (1, TB)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TB, KP), 1
                                        ).astype(jnp.float32)
        pos = uu.reshape(TB, 1) * (K - 1)
        basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - iota))   # (TB, KP)
        dw_ref[:] += jnp.dot(basis.T.astype(jnp.bfloat16),
                             g_ref[:].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)

    @jax.jit
    def run_bwd(u, g):
        return pl.pallas_call(
            k_bwd,
            grid=(N // TB,),
            in_specs=[
                pl.BlockSpec((1, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, R), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((KP, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((KP, R), jnp.float32),
        )(u.reshape(1, N), g)

    try:
        got = np.asarray(run_bwd(u, g))
        np.testing.assert_allclose(got, want_bwd, atol=2.0, rtol=2e-2)
        dt = timeit_loop(lambda uu, gg: run_bwd(uu.reshape(-1), gg), 8, u, g)
        print(f"pallas vmem-accum bwd: {dt * 1e3:.2f} ms = "
              f"{dt / N * 1e9:.2f} ns/sample  (correct)")
    except Exception as e:
        print(f"pallas vmem-accum bwd FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}")


if __name__ == "__main__":
    main()
