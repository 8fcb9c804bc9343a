"""Probe: dense-level hash-grid FORWARD via one-hot MXU matmul vs gathers.

VERDICT r3 next-round #7: the MixedFeature forward is 8 corner gathers per
level per sample (ops/hashgrid.py _fwd_impl); for DENSE (small) levels the
round-2 review suggested replacing the gathers with a one-hot matmul so the
MXU does the row selection. This probe measures both formulations on the
actual smallest dense levels of the MF benchmark config (N_min=16 ->
V = 4096 / 12168 / 29792 rows for levels 0-2) at the training batch size.

Cost model being tested: a fused one-hot matmul must produce N*V one-hot
elements (compare against iota) regardless of MXU speed, so it scales with
V, while the gather path is 8*N row gathers independent of V — the hybrid
can only win for V below (8 * gather_ns / compare_ns) rows.

Run on TPU:  python benchmarking/probe_onehot_dense.py --n 131072
"""
import argparse
import time

import jax
import jax.numpy as jnp


def timed(fn, iters, *args):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072,
                    help="samples (training flat batch: 8192 rays x 16)")
    ap.add_argument("--f", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--loop", type=int, default=16,
                    help="dependent in-jit repetitions (tunnel timing rule)")
    args = ap.parse_args()

    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    n, f, rep = args.n, args.f, args.loop

    for res in (16, 23, 31):
        v = res ** 3
        table = jax.random.normal(key, (v, f), jnp.float32)
        # 8 corner indices + trilinear weights of n samples in a res^3 grid
        pos = jax.random.uniform(key, (n, 3)) * (res - 1)
        base = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        idxs, ws = [], []
        for c in range(8):
            bits = jnp.array([c & 1, (c >> 1) & 1, (c >> 2) & 1], jnp.int32)
            cc = jnp.minimum(base + bits, res - 1)
            idxs.append(cc[:, 0] + cc[:, 1] * res + cc[:, 2] * res * res)
            wb = jnp.where(bits.astype(bool), frac, 1.0 - frac)
            ws.append(wb[:, 0] * wb[:, 1] * wb[:, 2])
        idx8 = jnp.stack(idxs)          # (8, N)
        w8 = jnp.stack(ws)              # (8, N)

        @jax.jit
        def fwd_gather(table, idx8, w8):
            out = jnp.zeros((n, f), jnp.float32)
            for _ in range(rep):  # dependent loop: out feeds back
                acc = jnp.zeros((n, f), jnp.float32)
                for c in range(8):
                    acc = acc + w8[c][:, None] * table[idx8[c]]
                out = acc + out * 1e-20
            return out

        @jax.jit
        def fwd_onehot(table, idx8, w8):
            iota = jnp.arange(v, dtype=jnp.int32)
            out = jnp.zeros((n, f), jnp.float32)
            for _ in range(rep):
                # weighted multi-hot built by 8 fused compares, one matmul
                wrow = jnp.zeros((n, v), jnp.float32)
                for c in range(8):
                    wrow = wrow + jnp.where(
                        idx8[c][:, None] == iota[None, :], w8[c][:, None],
                        0.0)
                acc = wrow @ table
                out = acc + out * 1e-20
            return out

        t_g = timed(fwd_gather, args.iters, table, idx8, w8) / rep
        t_o = timed(fwd_onehot, args.iters, table, idx8, w8) / rep
        a = fwd_gather(table, idx8, w8)
        b = fwd_onehot(table, idx8, w8)
        err = float(jnp.abs(a - b).max())
        print(f"res {res:3d} (V={v:6d}): gather {t_g:7.3f} ms | "
              f"one-hot {t_o:7.3f} ms | ratio {t_o / t_g:5.2f} | "
              f"max err {err:.2e}")


if __name__ == "__main__":
    main()
