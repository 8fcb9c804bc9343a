#!/usr/bin/env python
"""Is the du (position-gradient) path of the hat-CP VJP dead-code-eliminated
when only parameter gradients are pulled? field bwd measures 2.6x fwd at the
bench config; the dB matmuls + dhat VPU work feeding du are ~40% of the
backward if they survive DCE."""
import sys
import time
from functools import partial

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def timed(fn, iters, *args):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit)
    def run(*a):
        def body(i, acc):
            return acc + fn(a[0] + i * 1e-9, *a[1:])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(jax.device_get(run(*args)))
    t0 = time.perf_counter()
    float(jax.device_get(run(*args)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from mfnerf_tpu.ops import lowrank as LR

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = LR.LowRankConfig.create(n_levels=8, k_max=512, rank=16,
                                  n_frames=2, out_dim=32, fused=True)
    params = LR.init_lowrank_params(jax.random.PRNGKey(0), cfg)
    n = 1 << 19
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32)

    def fwd(x, params):
        return LR.lowrank_encode(params, x, cfg).sum()

    def fwdbwd(x, params):
        g = jax.grad(lambda p: LR.lowrank_encode(p, x, cfg).sum())(params)
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    print(f"encoder fwd: {timed(fwd, 24, x, params):.2f} ms")
    print(f"encoder fwd+bwd (du live in VJP): "
          f"{timed(fwdbwd, 24, x, params):.2f} ms")

    # monkeypatch: du short-circuited to zeros (no dB matmul, no dhat)
    orig = LR._hat_cp_prod_bwd

    def bwd_nodu(k_res, mm_dtype, res, g):
        u3, w3, a = res
        scale = jnp.float32(k_res - 1)
        ks = jnp.arange(k_res, dtype=jnp.float32)[None, :]
        dw = []
        for d in range(3):
            e, f = (d + 1) % 3, (d + 2) % 3
            g_d = g * a[e] * a[f]
            pos = u3[:, d][:, None] * scale
            basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))
            dw.append(jnp.dot(basis.astype(mm_dtype).T,
                              g_d.astype(mm_dtype),
                              preferred_element_type=jnp.float32))
        return jnp.zeros_like(u3), jnp.stack(dw).astype(w3.dtype)

    LR._hat_cp_prod.defvjp(LR._hat_cp_prod_fwd, bwd_nodu)
    print(f"encoder fwd+bwd (du zeroed): "
          f"{timed(fwdbwd, 24, x, params):.2f} ms")
    LR._hat_cp_prod.defvjp(LR._hat_cp_prod_fwd, orig)

    # plain autodiff: bypass the custom VJP entirely — XLA saves the (N, K)
    # bases as residuals instead of rebuilding them (the pre-a75ed76
    # behavior). A/B against the memory-lean rebuild at the bench shape.
    def hat_cp_plain(u3, w3, k_res, mm_dtype):
        out, _ = LR._hat_cp_prod_fwd(u3, w3, k_res, mm_dtype)
        return out

    orig_prod = LR._hat_cp_prod
    LR._hat_cp_prod = hat_cp_plain
    try:
        print(f"encoder fwd (plain autodiff): {timed(fwd, 24, x, params):.2f} ms")
        print(f"encoder fwd+bwd (plain autodiff): "
              f"{timed(fwdbwd, 24, x, params):.2f} ms")
    finally:
        LR._hat_cp_prod = orig_prod


if __name__ == "__main__":
    main()
