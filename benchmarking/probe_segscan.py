#!/usr/bin/env python
"""Probe: segmented associative scans vs the blocked gather-based helpers.

profile_stages (2026-08-19, bench config) put the flat composite+loss
fwd+bwd at 7.37 of the 20.13 ms step — and its cost is ~8 B-element
structural gathers (~0.92 ms each at B=131072, 7 ns/row). Every one of
those gathers implements a segmented scan / reduce / broadcast over the
SORTED ray_id, which is expressible as ONE segmented inclusive scan
(the classic (flag, value) reset operator) with no gathers at all and
exact segment-local magnitudes. This probe measures whether
lax.associative_scan's lowering beats the gather-based formulation on
this chip.
"""
import argparse
import time
from functools import partial

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timed(fn, n_iter, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(seed, *a):
        def body(i, carry):
            seed, acc = carry
            out = fn(jax.random.fold_in(seed, i), *a)
            return seed, acc + out
        _, acc = jax.lax.fori_loop(0, n_iter, body,
                                   (seed, jnp.zeros((), jnp.float32)))
        return acc

    key = __import__("jax").random.PRNGKey(0)
    acc = run(key, *args)
    __import__("jax").block_until_ready(acc)
    t0 = time.perf_counter()
    acc = run(key, *args)
    __import__("jax").block_until_ready(acc)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=131072)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, N = args.b, args.n
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 33, size=N)
    counts = (counts * (B / max(counts.sum(), 1))).astype(np.int64)
    counts = np.minimum(counts, 64)
    offsets_np = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offsets_np = np.minimum(offsets_np, B - 1).astype(np.int32)
    offsets = jnp.asarray(offsets_np)
    marks_np = np.zeros(B, np.int32)
    np.add.at(marks_np, offsets_np, 1)
    ray_id = jnp.asarray(np.cumsum(marks_np) - 1, dtype=jnp.int32)
    flags = jnp.asarray(marks_np > 0)
    x1 = jnp.asarray(rng.uniform(0, 10, B).astype(np.float32))
    x5 = jnp.asarray(rng.uniform(0, 10, (B, 5)).astype(np.float32))
    vN = jnp.asarray(rng.uniform(0, 10, N).astype(np.float32))
    vN5 = jnp.asarray(rng.uniform(0, 10, (N, 5)).astype(np.float32))
    tbl = jnp.asarray(rng.uniform(0, 1, (N, 7)).astype(np.float32))

    def j(key):
        return jax.random.uniform(key, ()) * 0

    def segscan(x, f):
        """Segmented inclusive scan: reset at flag positions."""
        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, vb + va * (1.0 - fb.astype(va.dtype))
        if x.ndim == 2:
            ff = f[:, None] & jnp.ones(x.shape, bool)
        else:
            ff = f
        _, y = jax.lax.associative_scan(op, (ff, x), axis=0)
        return y

    r = {}
    r["cumsum (B,)"] = timed(lambda k: jnp.cumsum(x1 + j(k)).sum(),
                             args.iters)
    r["cumsum (B,5)"] = timed(lambda k: jnp.cumsum(x5 + j(k), axis=0).sum(),
                              args.iters)
    r["cummax int (B,)"] = timed(
        lambda k: jax.lax.cummax(
            ray_id + (j(k)).astype(jnp.int32)).sum().astype(jnp.float32),
        args.iters)
    r["segscan (B,)"] = timed(lambda k: segscan(x1 + j(k), flags).sum(),
                              args.iters)
    r["segscan (B,5)"] = timed(
        lambda k: segscan(x5 + j(k), flags).sum(), args.iters)
    r["gather B from (N,)"] = timed(
        lambda k: jnp.take(vN + j(k), ray_id).sum(), args.iters)
    r["gather B rows from (N,5)"] = timed(
        lambda k: jnp.take(vN5 + j(k), ray_id, axis=0).sum(), args.iters)
    r["gather B rows from (N,7)"] = timed(
        lambda k: jnp.take(tbl + j(k), ray_id, axis=0).sum(), args.iters)
    r["scatter-set N rows(7) into B"] = timed(
        lambda k: jnp.zeros((B, 7)).at[offsets].set(tbl + j(k)).sum(),
        args.iters)
    # broadcast N->B via scatter + segscan-hold (gather-free broadcast)
    def bcast_scan(k):
        z = jnp.zeros((B, 5)).at[offsets].set(
            vN5 + j(k), mode="drop", indices_are_sorted=True,
            unique_indices=False)
        return segscan(z, flags).sum()
    r["bcast N->B: scatter+segscan (5 cols)"] = timed(bcast_scan, args.iters)

    from mfnerf_tpu.ops.composite import _seg_excl_impl, seg_sum
    r["blocked _seg_excl_impl (B,)"] = timed(
        lambda k: _seg_excl_impl(x1 + j(k), ray_id, offsets, 128).sum(),
        args.iters)
    r["blocked seg_sum (B,5)"] = timed(
        lambda k: seg_sum(x5 + j(k), offsets, 128).sum(), args.iters)
    # seg_sum via segscan: scan + pick at segment-end slots (N-gather)
    ends = jnp.concatenate([offsets[1:], jnp.array([B], jnp.int32)]) - 1
    def seg_sum_scan(k):
        y = segscan(x5 + j(k), flags)
        return y[jnp.maximum(ends, 0)].sum()
    r["segscan seg_sum (B,5)"] = timed(seg_sum_scan, args.iters)

    for name, ms in r.items():
        print(f"{name:44s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
