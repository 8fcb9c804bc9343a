#!/usr/bin/env python
"""Feasibility probe: can Pallas/Mosaic express the LowRank line-table
interpolation as lane-indexed gathers from a VMEM-resident table?

The op: out[r, n] = T[r, idx[n]] * (1-f[n]) + T[r, idx[n]+1] * f[n]
with T (RANK, K) resident in VMEM, idx/f per sample. If this compiles and
runs at VPU-like rates it unlocks a fused encoder forward ~10x faster than
the dense hat-basis matmul (see docs/TPU_NOTES.md encoder numbers).

Tries several formulations; prints which ones compile and their timing.
"""
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", file=sys.stderr)
    RANK, K, N = 8, 128, 1 << 20
    TILE = 512

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (RANK, K), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, K - 1, dtype=jnp.int32)
    frac = jax.random.uniform(key, (N,))

    # reference (XLA gather)
    def ref(table, idx, frac):
        t0 = table[:, idx]            # (RANK, N)
        t1 = table[:, idx + 1]
        return t0 * (1 - frac)[None, :] + t1 * frac[None, :]

    ref_jit = jax.jit(ref)
    want = np.asarray(ref_jit(table, idx, frac))
    dt = timeit(ref_jit, table, idx, frac)
    print(f"XLA gather ref: {dt * 1e3:.2f} ms = {dt / N * 1e9:.2f} ns/sample")

    # formulation 1: one-hot matmul inside pallas (MXU, baseline sanity)
    def k_onehot(table_ref, idx_ref, frac_ref, out_ref):
        idxs = idx_ref[:]                      # (TILE,)
        oh0 = (idxs[:, None] ==
               jax.lax.broadcasted_iota(jnp.int32, (TILE, K), 1)).astype(
            jnp.float32)                       # (TILE, K)
        t0 = jnp.dot(oh0, table_ref[:].T,
                     preferred_element_type=jnp.float32)  # (TILE, RANK)
        oh1 = ((idxs + 1)[:, None] ==
               jax.lax.broadcasted_iota(jnp.int32, (TILE, K), 1)).astype(
            jnp.float32)
        t1 = jnp.dot(oh1, table_ref[:].T,
                     preferred_element_type=jnp.float32)
        f = frac_ref[:][:, None]
        out_ref[:] = t0 * (1 - f) + t1 * f

    @jax.jit
    def run_onehot(table, idx, frac):
        return pl.pallas_call(
            k_onehot,
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((RANK, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, RANK), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, RANK), jnp.float32),
        )(table, idx, frac)

    try:
        got = np.asarray(run_onehot(table, idx, frac))
        np.testing.assert_allclose(got, want.T, atol=1e-5)
        dt = timeit(run_onehot, table, idx, frac)
        print(f"pallas one-hot: {dt * 1e3:.2f} ms = "
              f"{dt / N * 1e9:.2f} ns/sample  (correct)")
    except Exception as e:
        print(f"pallas one-hot FAILED: {type(e).__name__}: {str(e)[:300]}")

    # formulation 2: take_along_axis with idx broadcast to the table shape
    # (Mosaic's dynamic_gather constraint: idx shape == table shape; the
    # table's lane dim is padded to TILE so each lane can request any entry)
    def k_index(table_ref, idx_ref, frac_ref, out_ref):
        idxs = idx_ref[:]                                    # (TILE,)
        t = table_ref[:]                                     # (RANK, TILE)
        idx2 = jnp.broadcast_to(idxs[None, :], (RANK, TILE))
        t0 = jnp.take_along_axis(t, idx2, axis=1)            # (RANK, TILE)
        t1 = jnp.take_along_axis(t, idx2 + 1, axis=1)
        f = frac_ref[:][None, :]
        out_ref[:] = (t0 * (1 - f) + t1 * f).T

    @jax.jit
    def run_index(table, idx, frac):
        table_padded = jnp.pad(table, ((0, 0), (0, TILE - K)))
        return pl.pallas_call(
            k_index,
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((RANK, TILE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, RANK), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, RANK), jnp.float32),
        )(table_padded, idx, frac)

    try:
        got = np.asarray(run_index(table, idx, frac))
        np.testing.assert_allclose(got, want.T, atol=1e-5)
        dt = timeit(run_index, table, idx, frac)
        print(f"pallas jnp.take: {dt * 1e3:.2f} ms = "
              f"{dt / N * 1e9:.2f} ns/sample  (correct)")
    except Exception as e:
        print(f"pallas jnp.take FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
