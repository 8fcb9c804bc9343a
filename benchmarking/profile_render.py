#!/usr/bin/env python
"""Microbenchmark the test-render pipeline stages on the live chip.

Times (with dependent-iteration loops inside one jit, per docs/TPU_NOTES.md):
  1. occupancy-bitfield lookups at (N, K) ladder rungs
  2. t-ladder closed-form evaluation
  3. cumsum + searchsorted sample compaction
  4. field (encoder+MLP) forward per sample, fp32 vs bf16
  5. the full current render_test chunk
Prints ns/unit so the renderer redesign can budget against 36 FPS.
"""
import argparse
import sys
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timeit(fn, *args, iters=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--s", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8,
                    help="dependent repetitions inside the jit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n, k, s, reps = args.n, args.k, args.s, args.reps
    key = jax.random.PRNGKey(0)

    # ---- 1. bitfield lookups --------------------------------------------
    from mfnerf_tpu.ops.morton import bitfield_lookup
    bitfield = jax.random.randint(key, (128 ** 3 // 8,), 0, 255,
                                  dtype=jnp.int32).astype(jnp.uint8)

    @jax.jit
    def bench_bitfield(idx):
        def body(i, acc):
            out = bitfield_lookup(bitfield, (idx + i) % (128 ** 3))
            return acc + out.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    idx = jax.random.randint(key, (n, k), 0, 128 ** 3, dtype=jnp.int32)
    dt = timeit(bench_bitfield, idx) / reps
    print(f"bitfield lookup ({n}x{k}): {dt * 1e3:.2f} ms "
          f"= {dt / (n * k) * 1e9:.3f} ns/lookup")

    # gather rate by table dtype/size (is the uint8 byte-gather the problem?)
    for dtype, tab_n in [(jnp.uint8, 128 ** 3 // 8), (jnp.int32, 128 ** 3 // 8),
                         (jnp.float32, 128 ** 3 // 8), (jnp.float32, 4096)]:
        table = jnp.zeros((tab_n,), dtype)

        @jax.jit
        def bench_gather(idx, table=table, tab_n=tab_n):
            def body(i, acc):
                rows = table[(idx + i) % tab_n]
                return acc + rows.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        dt = timeit(bench_gather, idx) / reps
        print(f"gather {dtype.__name__} table[{tab_n}] ({n}x{k}): "
              f"{dt * 1e3:.2f} ms = {dt / (n * k) * 1e9:.3f} ns/el")

    # ---- 2. t-ladder ----------------------------------------------------
    from mfnerf_tpu.ops.stepping import t_ladder

    @jax.jit
    def bench_ladder(t0v):
        def body(i, acc):
            ts = t_ladder(t0v + i * 1e-6, jnp.arange(k, dtype=jnp.int32),
                          1 / 256, 1024, 128, 0.5)
            return acc + ts.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    t0v = jax.random.uniform(key, (n,)) * 0.1 + 0.01
    dt = timeit(bench_ladder, t0v) / reps
    print(f"t_ladder ({n}x{k}): {dt * 1e3:.2f} ms "
          f"= {dt / (n * k) * 1e9:.3f} ns/rung")

    # ---- 3. compaction --------------------------------------------------
    @jax.jit
    def bench_compact(occ_mask):
        def body(i, acc):
            csum = jnp.cumsum(occ_mask.astype(jnp.int32), axis=1)
            queries = jnp.arange(1, s + 1, dtype=jnp.int32)
            k_idx = jax.vmap(
                lambda row: jnp.searchsorted(row, queries + i * 0))(csum)
            return acc + k_idx.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    occ_mask = jax.random.uniform(key, (n, k)) < 0.03
    dt = timeit(bench_compact, occ_mask) / reps
    print(f"cumsum+searchsorted ({n}x{k}->S{s}): {dt * 1e3:.2f} ms "
          f"= {dt / (n * k) * 1e9:.3f} ns/rung")

    # ---- 4. field eval -------------------------------------------------
    from mfnerf_tpu.models.ngp import NGP, NGPConfig
    for dtype_name in ("float32", "bfloat16"):
        cfg = NGPConfig(grid="LowRank", compute_dtype=dtype_name)
        model = NGP(cfg)
        params = model.init(jax.random.PRNGKey(1))
        m = n * s  # samples

        @jax.jit
        def bench_field(params, xyz, dirs):
            def body(i, acc):
                sig, rgb = model(params, xyz + i * 1e-6, dirs)
                return acc + sig.sum() + rgb.sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        xyz = jax.random.uniform(jax.random.PRNGKey(2), (m, 3)) - 0.5
        dirs = jax.random.normal(jax.random.PRNGKey(3), (m, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        dt = timeit(bench_field, params, xyz, dirs) / reps
        print(f"field fwd {dtype_name} ({m} samples): {dt * 1e3:.2f} ms "
              f"= {dt / m * 1e9:.2f} ns/sample")

    # ---- 4b. compaction primitives at image scale ------------------------
    n_img_rays = 640 * 1024
    alive = jax.random.uniform(key, (n_img_rays,)) < 0.25
    state = jax.random.normal(key, (n_img_rays, 12))

    @jax.jit
    def bench_argsort(alive):
        def body(i, acc):
            order = jnp.argsort(jnp.logical_not(alive) != (i < 0))
            return acc + order[0]
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    dt = timeit(bench_argsort, alive) / reps
    print(f"argsort bool ({n_img_rays}): {dt * 1e3:.2f} ms")

    @jax.jit
    def bench_topk(alive):
        def body(i, acc):
            _, idx = jax.lax.top_k(alive.astype(jnp.float32) + 0.0 * i,
                                   n_img_rays // 4)
            return acc + idx[0]
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    dt = timeit(bench_topk, alive) / reps
    print(f"top_k N/4 ({n_img_rays}): {dt * 1e3:.2f} ms")

    idx4 = jax.random.randint(key, (n_img_rays // 4,), 0, n_img_rays)

    @jax.jit
    def bench_gather_rows(state, idx4):
        def body(i, acc):
            rows = state[(idx4 + i) % n_img_rays]
            return acc + rows.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    dt = timeit(bench_gather_rows, state, idx4) / reps
    print(f"gather rows 48B (N/4 of {n_img_rays}): {dt * 1e3:.2f} ms")

    rows4 = jax.random.normal(key, (n_img_rays // 4, 12))

    @jax.jit
    def bench_scatter_rows(state, idx4, rows4):
        def body(i, st):
            return st.at[(idx4 + i) % n_img_rays].set(rows4)
        return jax.lax.fori_loop(0, reps, body, state)

    dt = timeit(bench_scatter_rows, state, idx4, rows4) / reps
    print(f"scatter-set rows 48B (N/4 of {n_img_rays}): {dt * 1e3:.2f} ms")

    # ---- 5. current full render chunk -----------------------------------
    from mfnerf_tpu.models.rendering import RenderConfig, _render_test_chunk
    from mfnerf_tpu.models.ngp import OccupancyState
    cfg = NGPConfig(grid="LowRank", compute_dtype="bfloat16")
    model = NGP(cfg)
    params = model.init(jax.random.PRNGKey(1))
    import dataclasses
    occ = OccupancyState.create(cfg)
    occ = dataclasses.replace(
        occ, density_bitfield=jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, occ.density_bitfield.shape,
                dtype=np.uint8) & 0x11)).refresh_coarse(cfg)
    rcfg = RenderConfig(s_max_test=args.s * 4, test_chunk=n)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.2]]), (n, 1))
    d = jax.random.normal(jax.random.PRNGKey(4), (n, 3)) * 0.15
    rays_d = d.at[:, 2].set(1.0)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)

    fn = partial(_render_test_chunk, model)
    dt = timeit(fn, params, occ, rays_o, rays_d, rcfg)
    print(f"render_test_chunk ({n} rays, S={args.s * 4}): {dt * 1e3:.2f} ms "
          f"-> {n / dt / 1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
