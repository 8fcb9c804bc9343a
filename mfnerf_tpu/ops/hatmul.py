"""Pallas fused hat-basis CP product — the LowRank encoder's hot op.

The fused LowRank forward is, per (frame, axis d):

    a_d = B(u_d) @ W_d,    prod = a_0 * a_1 * a_2          (N, R)

where B(u) is the dense piecewise-linear hat basis (N, K) with exactly two
nonzeros per row (ops/lowrank._hat_basis). XLA materializes B in HBM before
each matmul: at the training config (K=513, R=128, bf16) that is ~0.66 MB
per 512 samples per axis-frame — the measured 13.4 ms/1M-sample field
forward is HBM-bound at ~3x the FLOP-bound time (docs/TPU_NOTES.md "gather
wall"). This kernel builds each basis TILE in VMEM from an iota and feeds
the MXU in place, so HBM traffic drops to read-u + write-out, and the
backward recomputes the basis the same way instead of re-materializing it.

Forward kernel (grid over N/TN sample tiles; W resident in VMEM):
    basis_d = relu(1 - |u_d*(K-1) - iota_K|)      (TN, KP)   VPU
    a_d     = basis_d.bf16 @ W_d.bf16             (TN, R)    MXU
    out     = a_0 * a_1 * a_2                                VPU

Backward kernel (same grid; dW accumulated across the sequential TPU grid
into a revisited output block):
    g_d  = g * a_e * a_f                 e, f != d           VPU
    dW_d += basis_d^T @ g_d              (KP, R)             MXU
    dB_d  = g_d @ W_d^T                  (TN, KP)            MXU
    du_d  = sum_k dB_d * dhat_d          dhat = -(K-1)*sign(pos-k)*[|.|<1]

du is exact (hat subgradient 0 at the kinks), so pose refinement
(--optimize_ext) and any other x-gradient consumer work unchanged.

The op is numerically identical to the XLA dense-basis path up to matmul
reassociation (same bf16 operand rounding); parity is tested in
tests/test_hatmul.py in interpreter mode on CPU.

STATUS: NOT integrated — no production path imports this module. The
measured Mosaic build does not beat XLA on this formulation (fwd 13.1 vs
10.4 ns/sample, bwd 9.9 vs 9.2 — the dense basis build is VPU-bound and
XLA already overlaps it with the matmul, docs/TPU_NOTES.md round 3), so
``ops/lowrank.lowrank_encode`` stays on the XLA path unconditionally. The
kernel is kept, parity-tested, for the day Mosaic lands a usable
``dynamic_gather`` lowering (the 2-reads-per-level formulation that would
actually remove the VPU wall).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TN = 512  # samples per grid tile


def _fwd_kernel(u_ref, w_ref, out_ref, *, k_res, kp, mm_dt):
    scale = jnp.float32(k_res - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TN, kp), 1
                                    ).astype(jnp.float32)
    prod = None
    for d in range(3):
        pos = u_ref[:, d][:, None] * scale
        basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - iota))
        a = jnp.dot(basis.astype(mm_dt), w_ref[d].astype(mm_dt),
                    preferred_element_type=jnp.float32)
        prod = a if prod is None else prod * a
    out_ref[:] = prod


def _make_bwd_kernel(k_res, kp, mm_dt):
    from jax.experimental import pallas as pl

    def kernel(u_ref, w_ref, g_ref, du_ref, dw_ref):
        scale = jnp.float32(k_res - 1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TN, kp), 1
                                        ).astype(jnp.float32)
        g = g_ref[:]                                       # (TN, R) f32

        @pl.when(pl.program_id(0) == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        pos = []
        basis = []
        a = []
        for d in range(3):
            p = u_ref[:, d][:, None] * scale               # (TN, KP)
            b = jnp.maximum(0.0, 1.0 - jnp.abs(p - iota))
            pos.append(p)
            basis.append(b)
            a.append(jnp.dot(b.astype(mm_dt), w_ref[d].astype(mm_dt),
                             preferred_element_type=jnp.float32))
        for d in range(3):
            e, f = (d + 1) % 3, (d + 2) % 3
            g_d = g * a[e] * a[f]                          # (TN, R)
            dw_ref[d] += jnp.dot(
                basis[d].astype(mm_dt).T, g_d.astype(mm_dt),
                preferred_element_type=jnp.float32)        # (KP, R)
            db = jnp.dot(g_d.astype(mm_dt), w_ref[d].astype(mm_dt).T,
                         preferred_element_type=jnp.float32)  # (TN, KP)
            diff = pos[d] - iota
            dhat = jnp.where(jnp.abs(diff) < 1.0,
                             -jnp.sign(diff) * scale, 0.0)
            du_ref[:, d] = jnp.sum(db * dhat, axis=1)

    return kernel


def _pad_n(x, tn):
    n = x.shape[0]
    n_pad = -(-n // tn) * tn
    if n_pad == n:
        return x, n
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)], axis=0), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hat_prod(u3, w, k_res, interpret=False):
    """prod_d B_{k_res}(u3[:, d]) @ w[d] — fused, no HBM basis.

    Args:
        u3: (N, 3) float32 in [0, 1].
        w: (3, KP, R) float32, KP a multiple of 128 with rows >= k_res
           zeroed (hat weights past the knot count are identically zero, so
           zero-padding is exact).
        k_res: number of knots (static).
        interpret: run the Pallas interpreter (CPU testing).
    Returns:
        (N, R) float32.
    """
    return _hat_prod_fwd_impl(u3, w, k_res, interpret)


def _hat_prod_fwd_impl(u3, w, k_res, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kp, r = w.shape[1], w.shape[2]
    u_pad, n = _pad_n(u3.astype(jnp.float32), TN)
    n_pad = u_pad.shape[0]
    kern = functools.partial(_fwd_kernel, k_res=k_res, kp=kp,
                             mm_dt=jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        grid=(n_pad // TN,),
        in_specs=[
            pl.BlockSpec((TN, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kp, r), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, r), jnp.float32),
        interpret=interpret,
    )(u_pad, w)
    return out[:n]


def _hat_prod_fwd(u3, w, k_res, interpret):
    return _hat_prod_fwd_impl(u3, w, k_res, interpret), (u3, w)


def _hat_prod_bwd(k_res, interpret, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u3, w = res
    kp, r = w.shape[1], w.shape[2]
    u_pad, n = _pad_n(u3.astype(jnp.float32), TN)
    g_pad, _ = _pad_n(g.astype(jnp.float32), TN)
    n_pad = u_pad.shape[0]
    kern = _make_bwd_kernel(k_res, kp, jnp.bfloat16)
    du, dw = pl.pallas_call(
        kern,
        grid=(n_pad // TN,),
        in_specs=[
            pl.BlockSpec((TN, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, kp, r), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TN, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # revisited block: the TPU grid is sequential, so += across
            # grid steps accumulates dW without an HBM scatter
            pl.BlockSpec((3, kp, r), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, kp, r), jnp.float32),
        ),
        interpret=interpret,
    )(u_pad, w, g_pad)
    du = du[:n].astype(u3.dtype)
    return du, dw.astype(w.dtype)


hat_prod.defvjp(_hat_prod_fwd, _hat_prod_bwd)
