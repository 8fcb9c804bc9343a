"""Low-rank (CP) multiresolution encoding — the all-matmul TPU-native field.

Motivation (measured on TPU v5e, see docs/TPU_NOTES.md): XLA random gather
runs at ~165M rows/s and scatter-add at ~16M updates/s, while a faithful
Instant-NGP hash grid needs ~50M random accesses per training step in each
direction — 50-600x over the step budget. Mosaic exposes a dynamic_gather
(forward) but no dynamic scatter, so an exact hash-grid *backward* cannot be
made fast on this hardware. The TPU-native answer is an encoding whose
forward AND backward are dense matmuls:

    phi(x) = W · concat_{m,l} [ prod_d ( B_l((R_m x)_d) @ T[m,l,d] ) ]

i.e. a CANDECOMP/PARAFAC (CP) factorization per resolution level l (TensoRF,
arXiv 2203.09517, CP variant) evaluated in M rotated coordinate frames
(rotations decorrelate CP's axis-aligned rank deficiency), where
B_l(u) in R^{K_l} is the dense piecewise-linear "hat" basis. Every operation
is an elementwise VPU op or an MXU matmul; gradients flow through the same
matmuls transposed. Per-sample cost ~ sum_l K_l * rank MACs — MXU-bound, no
random memory access anywhere.

This replaces the tinycudann grid encoding's ROLE (fast-converging spatial
features in front of tiny MLPs); the exact hash-grid (ops/hashgrid.py) is
retained for behavioral parity and correctness tests.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LowRankConfig:
    levels: Tuple[int, ...] = (32, 48, 72, 108, 162, 243, 364, 512)
    rank: int = 16
    n_frames: int = 2
    out_dim: int = 32
    # fused nested evaluation: levels must be NESTED ((K_max-1) % (K_l-1)
    # == 0); all levels then fold exactly onto the finest hat basis via
    # prolongation, turning the per-axis encoding into ONE
    # (N, K_max) x (K_max, L*rank) matmul at full MXU lane width (see
    # lowrank_encode). ``matmul_dtype`` is the operand dtype of that matmul
    # (accumulation stays fp32) — the hat basis itself is built in fp32 and
    # cast, which sidesteps the VPU bf16 hat-tiling slowdown that made the
    # naive --bf16 mode 8x slower (docs/TPU_NOTES.md).
    fused: bool = False
    matmul_dtype: str = "bfloat16"

    @staticmethod
    def create(n_levels=8, k_min=32, k_max=512, rank=16, n_frames=2,
               out_dim=32, fused=False, matmul_dtype="bfloat16"
               ) -> "LowRankConfig":
        if fused:
            # nested ladder: K-1 halves per level down from the finest.
            # k_max is rounded up to 2^m + 1 so every level divides exactly.
            base = 1 << max(n_levels - 1,
                            math.ceil(math.log2(max(k_max - 1, 2))))
            ks = tuple(base // (1 << i) + 1
                       for i in reversed(range(n_levels)))
        elif n_levels == 1:
            ks = (k_max,)
        else:
            b = (k_max / k_min) ** (1.0 / (n_levels - 1))
            ks = tuple(int(round(k_min * b ** i)) for i in range(n_levels))
        return LowRankConfig(levels=ks, rank=rank, n_frames=n_frames,
                             out_dim=out_dim, fused=fused,
                             matmul_dtype=matmul_dtype)

    @property
    def n_components(self) -> int:
        return len(self.levels) * self.n_frames * self.rank


def _frame_rotations(n_frames: int) -> np.ndarray:
    """Fixed rotation matrices; frame 0 is identity. Deterministic
    quasi-random rotations (QR of seeded Gaussians) for the rest."""
    rots = [np.eye(3, dtype=np.float32)]
    rng = np.random.default_rng(12345)
    while len(rots) < n_frames:
        q, r = np.linalg.qr(rng.normal(size=(3, 3)))
        q = q * np.sign(np.diag(r))  # make unique / right-handed-ish
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        rots.append(q.astype(np.float32))
    return np.stack(rots)  # (M, 3, 3)


def init_lowrank_params(key, cfg: LowRankConfig, dtype=jnp.float32) -> dict:
    """Line tables T[m][l][d]: (K_l, rank), plus the output projection.

    Init: lines ~ N(0, 0.3) with a +1 mean on one axis so early products are
    near-linear (helps optimization, mirrors TensoRF's practice of starting
    from a smooth field); projection is He-uniform.
    """
    lines = []
    for m in range(cfg.n_frames):
        per_level = []
        for k_res in cfg.levels:
            axes = []
            for d in range(3):
                key, sub = jax.random.split(key)
                t = 0.3 * jax.random.normal(sub, (k_res, cfg.rank), dtype)
                if d == 0:
                    t = t + 1.0
                axes.append(t)
            per_level.append(axes)
        lines.append(per_level)
    key, sub = jax.random.split(key)
    n_comp = cfg.n_components
    bound = math.sqrt(6.0 / n_comp)
    proj = jax.random.uniform(sub, (n_comp, cfg.out_dim), dtype,
                              minval=-bound, maxval=bound)
    return {"lines": lines, "proj": proj}


def _hat_basis(u, k_res):
    """Dense hat (piecewise-linear interpolation) basis.

    u: (N,) in [0,1] -> (N, K) with rows summing to 1; B[n,k] =
    max(0, 1 - |u*(K-1) - k|). Evaluating it densely turns 1D interpolation
    into a matmul — no gathers.
    """
    pos = u[:, None] * (k_res - 1)
    ks = jnp.arange(k_res, dtype=jnp.float32)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))


def _prolongation(k_fine: int, k_coarse: int) -> np.ndarray:
    """(K_fine, K_coarse) matrix P with B_Kc(u) == B_Kf(u) @ P exactly.

    Piecewise-linear nesting: when (K_fine-1) is a multiple of (K_coarse-1),
    every coarse hat function is itself piecewise linear on the fine grid,
    so sampling it at the fine knots reproduces it exactly under fine-hat
    interpolation. P[i, j] = hat_j^{coarse}(fine knot i)."""
    assert (k_fine - 1) % (k_coarse - 1) == 0, (k_fine, k_coarse)
    r = (k_fine - 1) // (k_coarse - 1)
    i = np.arange(k_fine, dtype=np.float64)[:, None] / r
    j = np.arange(k_coarse, dtype=np.float64)[None, :]
    return np.maximum(0.0, 1.0 - np.abs(i - j)).astype(np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hat_cp_prod(u3, w3, k_res, mm_dtype):
    """prod_d B_{k_res}(u3[:, d]) @ w3[d] with a memory-lean VJP.

    XLA's default reverse-mode saves the (N, K) hat bases as residuals
    (~1.3 GB per axis-frame at the training config) — measured backward was
    1.8x the forward (docs/TPU_NOTES.md round-3 stage budget). This VJP
    saves only the three (N, R) axis products and REBUILDS each basis in
    the backward (a VPU-only op), so the backward is three transpose
    matmuls + one basis rebuild with no giant residual traffic.

    du (for --optimize_ext pose gradients) uses the exact hat subgradient
    (0 at knots); it is dead-code-eliminated when x is not differentiated.
    """
    out, _ = _hat_cp_prod_fwd(u3, w3, k_res, mm_dtype)
    return out


def _hat_cp_prod_fwd(u3, w3, k_res, mm_dtype):
    a = []
    for d in range(3):
        basis = _hat_basis(u3[:, d], k_res)
        a.append(jnp.dot(basis.astype(mm_dtype), w3[d].astype(mm_dtype),
                         preferred_element_type=jnp.float32))
    return a[0] * a[1] * a[2], (u3, w3, tuple(a))


def _hat_cp_prod_bwd(k_res, mm_dtype, res, g):
    u3, w3, a = res
    scale = jnp.float32(k_res - 1)
    ks = jnp.arange(k_res, dtype=jnp.float32)[None, :]
    dw = []
    du = []
    for d in range(3):
        e, f = (d + 1) % 3, (d + 2) % 3
        g_d = g * a[e] * a[f]                                   # (N, R)
        pos = u3[:, d][:, None] * scale
        basis = jnp.maximum(0.0, 1.0 - jnp.abs(pos - ks))       # rebuild
        dw.append(jnp.dot(basis.astype(mm_dtype).T, g_d.astype(mm_dtype),
                          preferred_element_type=jnp.float32))  # (K, R)
        db = jnp.dot(g_d.astype(mm_dtype), w3[d].astype(mm_dtype).T,
                     preferred_element_type=jnp.float32)        # (N, K)
        diff = pos - ks
        dhat = jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff) * scale, 0.0)
        du.append(jnp.sum(db * dhat, axis=1))
    return jnp.stack(du, axis=1).astype(u3.dtype), \
        jnp.stack(dw).astype(w3.dtype)


_hat_cp_prod.defvjp(_hat_cp_prod_fwd, _hat_cp_prod_bwd)


def lowrank_encode(params: dict, x: jnp.ndarray,
                   cfg: LowRankConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Encode positions x (N, 3) in [0,1] -> (N, out_dim). Pure autodiff —
    every op is dense, so no custom VJP is required. ``dtype`` controls the
    matmul compute precision (hat positions stay fp32; products and the
    output projection accumulate in fp32 via preferred_element_type).

    With ``cfg.fused`` (nested levels) the per-level matmuls collapse into
    one (N, K_max) x (K_max, L*rank) contraction per (frame, axis): level
    tables are prolongated onto the finest grid (exact — see
    :func:`_prolongation`) and concatenated column-wise, so the MXU runs at
    full 128-lane width instead of rank/128 (~12.5%) and only ONE hat basis
    (K_max wide, vs sum of all K_l) is built per axis. Feature order and the
    parameter pytree are identical to the unfused path.
    """
    rots = jnp.asarray(_frame_rotations(cfg.n_frames))  # (M,3,3)
    xf = x.astype(jnp.float32)
    feats = []
    if cfg.fused:
        mm_dt = jnp.dtype(cfg.matmul_dtype)
        k_max = cfg.levels[-1]
        prols = [jnp.asarray(_prolongation(k_max, k)) for k in cfg.levels]
        for m in range(cfg.n_frames):
            if m == 0:
                u3 = xf
            else:
                u3 = (xf - 0.5) @ rots[m].T / 1.7320508 + 0.5
            u3 = jnp.clip(u3, 0.0, 1.0)
            # fold every level's table onto the finest grid: (3, K_max, L*R)
            w3 = jnp.stack([
                jnp.concatenate([p @ params["lines"][m][li][d]
                                 for li, p in enumerate(prols)], axis=1)
                for d in range(3)])
            feats.append(_hat_cp_prod(u3, w3, k_max, mm_dt))
    else:
        for m in range(cfg.n_frames):
            if m == 0:
                u3 = xf
            else:
                # rotate about the domain center and renormalize into [0,1]
                u3 = (xf - 0.5) @ rots[m].T / 1.7320508 + 0.5
            u3 = jnp.clip(u3, 0.0, 1.0)
            for li, k_res in enumerate(cfg.levels):
                prod = None
                for d in range(3):
                    basis = _hat_basis(u3[:, d], k_res).astype(dtype)
                    a = jnp.dot(basis,
                                params["lines"][m][li][d].astype(dtype),
                                preferred_element_type=jnp.float32)  # (N, R)
                    prod = a if prod is None else prod * a
                feats.append(prod)
    h = jnp.concatenate(feats, axis=1).astype(dtype)          # (N, M*L*R)
    return jnp.dot(h, params["proj"].astype(dtype),
                   preferred_element_type=jnp.float32)
