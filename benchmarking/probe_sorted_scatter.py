#!/usr/bin/env python
"""Probe: does sorting indices make XLA scatter-add fast on this TPU?

Decides the hash-grid (MixedFeature) backward strategy: the bottleneck is
~12.5M random scatter-adds/step into the hash tables (60 ns/update measured
round 1). If `indices_are_sorted` unlocks a vectorized lowering, a
sort-then-scatter backward (sort 16M int32 = 65 ms) becomes viable.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timed(fn, n_iter, *args):
    @jax.jit
    def run(seed, *a):
        def body(i, carry):
            seed, acc = carry
            return seed, acc + fn(jax.random.fold_in(seed, i), *a)
        _, acc = jax.lax.fori_loop(0, n_iter, body,
                                   (seed, jnp.zeros((), jnp.float32)))
        return acc

    # warmup and timed runs use DIFFERENT seeds: the tunnel memoizes
    # byte-identical dispatches and returns instantly. block_until_ready
    # alone has also been observed to return early over the tunnel —
    # device_get of the scalar is the only reliable completion barrier.
    float(jax.device_get(run(jax.random.PRNGKey(0), *args)))
    t0 = time.perf_counter()
    v = float(jax.device_get(run(jax.random.PRNGKey(1), *args)))
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    print(f"  (value {v:.3e})", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4_000_000)
    ap.add_argument("--t", type=int, default=2 ** 19)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    m, t = args.m, args.t
    print(f"devices: {jax.devices()}", file=sys.stderr)

    def unsorted(key):
        idx = jax.random.randint(key, (m,), 0, t)
        val = jax.random.uniform(key, (m, 2))
        out = jnp.zeros((t, 2)).at[idx].add(val)
        return (out * out).sum()  # nonlinear: stops XLA folding sum(scatter(v)) -> sum(v)

    def sorted_scatter(key):
        idx = jax.random.randint(key, (m,), 0, t)
        val = jax.random.uniform(key, (m, 2))
        idx = jnp.sort(idx)  # values deliberately not permuted — timing only
        out = jnp.zeros((t, 2)).at[idx].add(
            val, indices_are_sorted=True)
        return (out * out).sum()

    def sort_only(key):
        idx = jax.random.randint(key, (m,), 0, t)
        val = jax.random.uniform(key, (m, 2))
        si = jnp.argsort(idx)
        return (jnp.sort(idx).sum() + val[si].sum()).astype(jnp.float32)

    def segsum_dense(key):
        """Sort + dense per-slot reduction WITHOUT scatter: bucket counts by
        one-hot... here: sorted idx -> contribution via cumsum diffs read at
        per-slot boundary positions found with searchsorted."""
        idx = jnp.sort(jax.random.randint(key, (m,), 0, t))
        val = jax.random.uniform(key, (m, 2))
        csum = jnp.cumsum(val, axis=0)
        ends = jnp.searchsorted(idx, jnp.arange(t) + 1) - 1
        starts = jnp.searchsorted(idx, jnp.arange(t)) - 1
        out = (csum[jnp.maximum(ends, 0)] - csum[jnp.maximum(starts, 0)]) \
            * ((ends > starts)[:, None])
        return (out * out).sum()

    print(f"scatter-add {m} x2f32 into {t}: "
          f"{timed(unsorted, args.iters):.1f} ms")
    print(f"sorted scatter-add: {timed(sorted_scatter, args.iters):.1f} ms")
    print(f"sort+perm alone: {timed(sort_only, args.iters):.1f} ms")
    print(f"sort + searchsorted dense reduce: "
          f"{timed(segsum_dense, args.iters):.1f} ms")


if __name__ == "__main__":
    main()
