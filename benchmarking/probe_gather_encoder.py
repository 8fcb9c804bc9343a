#!/usr/bin/env python
"""Probe: LowRank FORWARD as 2-row gather+lerp vs dense hat-basis matmul.

The fused encoder (ops/lowrank.lowrank_encode) evaluates the hat basis
DENSELY: per (frame, axis) a (N, K_max) basis build plus a
(N, K_max) @ (K_max, L*R) matmul — 513x128 MACs/sample at the bench
config, though each basis row has exactly 2 nonzeros. That formulation
exists for the BACKWARD (dense transposed matmuls instead of
scatter-adds, the TPU wall measured in docs/TPU_NOTES.md). The test-time
renderer takes no gradients, so its forward could instead gather the two
bracketing rows of the folded (K_max, L*R) table (256 KB — the
small-table gather regime the occupancy bitfield already exploits) and
lerp: 2 row gathers + one FMA per (frame, axis) instead of 65k MACs.

This probe times the full encoder forward both ways at wavefront pool
scale (N = P * cap = 32k) and at flat-train scale (131k), fp32 and bf16
lerp arithmetic, on the real folded table shapes (K=513, L*R=128, 2
frames). If gather-lerp wins, _eval_field_padded gets a no-grad fast
path; the custom-VJP forward could also adopt it (backward unchanged).

Run on TPU:  python benchmarking/probe_gather_encoder.py
"""
import argparse
import sys
import time
from functools import partial

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timed_loop(fn, n_iter, *args):
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
    float(__import__("jax").device_get(acc))
    t0 = time.perf_counter()
    acc = run(key, *args)
    float(__import__("jax").device_get(acc))
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--k", type=int, default=513)
    ap.add_argument("--c", type=int, default=128, help="L*R columns")
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k_res, c, m = args.k, args.c, args.frames
    w3 = jax.random.normal(key, (m, 3, k_res, c), jnp.float32)

    def dense_fwd(seed, x, w3, dt):
        """The production formulation (lowrank._hat_cp_prod_fwd inlined)."""
        x = x + 1e-9 * jax.random.uniform(seed, ())
        feats = []
        ks = jnp.arange(k_res, dtype=jnp.float32)[None, :]
        for mi in range(m):
            prod = None
            for d in range(3):
                pos = x[:, d][:, None] * (k_res - 1)
                basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))
                a = jnp.dot(basis.astype(dt), w3[mi, d].astype(dt),
                            preferred_element_type=jnp.float32)
                prod = a if prod is None else prod * a
            feats.append(prod)
        return sum(f.sum() for f in feats)

    def gather_fwd(seed, x, w3, dt):
        """2-row gather + lerp per (frame, axis)."""
        x = x + 1e-9 * jax.random.uniform(seed, ())
        feats = []
        for mi in range(m):
            prod = None
            for d in range(3):
                pos = x[:, d] * (k_res - 1)
                i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, k_res - 2)
                f = (pos - i0.astype(jnp.float32))[:, None].astype(dt)
                t = w3[mi, d].astype(dt)
                lo = t[i0]
                hi = t[i0 + 1]
                a = (lo * (1.0 - f) + hi * f).astype(jnp.float32)
                prod = a if prod is None else prod * a
            feats.append(prod)
        return sum(f.sum() for f in feats)

    for n in (32768, 131072):
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
        for dt_name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            ms_d = timed_loop(partial(dense_fwd, dt=dt), args.iters, x, w3)
            ms_g = timed_loop(partial(gather_fwd, dt=dt), args.iters, x, w3)
            print(f"N={n:6d} {dt_name}: dense {ms_d:7.3f} ms  "
                  f"gather+lerp {ms_g:7.3f} ms  ({ms_d / ms_g:.2f}x)")


if __name__ == "__main__":
    main()
