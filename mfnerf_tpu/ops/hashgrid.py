"""Multiresolution hash-grid encoding (Hash / MixedFeature / Window) for TPU.

TPU-native replacement for the tinycudann fork's ``GridEncoding`` that the
reference builds at models/networks.py:36-57 with config keys
``type: Hash|Window|MixedFeature`` and ``n_tables`` (keys only the MF-NeRF
authors' tcnn fork accepts). The kernel spec therefore comes from:

* the Instant-NGP paper (arXiv 2201.05989): L levels of resolution
  ``N_min * b**level``, F features per level, trilinear interpolation of
  per-corner learned features; levels whose dense grid fits in the table use
  direct (dense) indexing, larger ones spatial-hash with the published XOR
  primes {1, 2654435761, 805459861}; tables init U(-1e-4, 1e-4);
* the MF-NeRF paper (arXiv 2304.12587): the **MixedFeature** variant stores
  the L levels in only ``N_tables`` hash tables — levels are grouped and a
  group's levels *mix* their features inside one shared table (memory is
  ``N_tables * 2**T * F`` instead of up to ``L * 2**T * F``). Levels sharing
  a table are decorrelated by salting the spatial hash with a per-level
  prime multiple. Dense (small) levels are packed at distinct offsets of the
  shared table while they fit, exactly like single-level dense packing.
* ``Window`` is a fork-only variant with no public spec; we reconstruct it as
  Hash plus a smooth coarse-to-fine per-level window (the standard
  progressive-level masking of BARF/Nerfies), which degrades to Hash at the
  default ``window_alpha=1.0``.

Design notes (TPU): the forward pass is 8 corner gathers per level batched
over levels — XLA lowers these to HBM gathers and fuses the trilinear blend;
the backward table gradient is one big scatter-add (the reference fork uses
CUDA atomicAdd; on TPU the scatter is a deterministic sorted reduction, see
``_scatter_grad``). A Pallas specialization can be slotted in behind the same
custom_vjp without touching callers.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# spatial-hash primes from the Instant-NGP paper (Eq. 4 of arXiv 2201.05989)
_PRIMES = (1, 2654435761, 805459861)
# per-level salt prime for levels sharing a MixedFeature table
_LEVEL_SALT_PRIME = 3674653429


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    scale: float          # grid scale s: pos = x*s + 0.5
    res: int              # corner resolution = ceil(scale) + 1
    offset: int           # start row of this level's storage in the table
    size: int             # number of rows addressable by this level
    dense: bool           # dense (direct) indexing vs spatial hash
    salt: int             # hash salt (0 unless sharing a table)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static encoding configuration (hashable -> usable as a jit constant).

    Mirrors the reference CLI surface: --grid --L --F --T --N_min --N_max
    --N_tables (opt.py:71-85); ``b`` is derived by the caller exactly as
    networks.py:33 does.
    """
    L: int = 16
    F: int = 2
    log2_T: int = 19
    N_min: int = 16
    b: float = 1.3819128800392336  # exp(ln(2048*0.5/16)/15), the Lego default
    grid_type: str = "Hash"        # Hash | MixedFeature | Window
    N_tables: int = 1
    levels: Tuple[LevelSpec, ...] = ()
    n_params: int = 0
    # table-gradient scatter budget: number of corners (of 8) that receive
    # scatter-add updates in the backward, sampled proportionally to their
    # trilinear weights. 8 = exact (every corner). The trilinear weights of
    # a sample sum to 1 per level, so sampling a corner with probability
    # w_c and scattering the UNWEIGHTED cotangent there is an exactly
    # unbiased estimator of the true table gradient with 8/grad_corners
    # fewer scatter updates — the measured TPU wall for Hash/MixedFeature
    # training (~60 ns per scatter-add update, docs/TPU_NOTES.md). Needs
    # per-sample uniforms via hashgrid_encode(..., grad_noise=...); exact
    # whenever grad_noise is None.
    grad_corners: int = 8

    @staticmethod
    def create(L=16, F=2, log2_T=19, N_min=16, b=1.3819128800392336,
               grid_type="Hash", N_tables=1,
               grad_corners=8) -> "HashGridConfig":
        if grid_type not in ("Hash", "Window", "MixedFeature"):
            raise ValueError(f"unknown grid type {grid_type!r}")
        hashmap_size = 1 << log2_T
        specs = []
        if grid_type in ("Hash", "Window") or N_tables <= 0:
            # one (logical) table per level, as in Instant-NGP / tcnn
            offset = 0
            for lvl in range(L):
                scale = N_min * (b ** lvl) - 1.0
                res = int(math.ceil(scale)) + 1
                dense_size = res ** 3
                if dense_size <= hashmap_size:
                    size = -(-dense_size // 8) * 8  # align to 8 rows
                    dense = True
                else:
                    size = hashmap_size
                    dense = False
                specs.append(LevelSpec(scale, res, offset, size, dense, 0))
                offset += size
            n_params = offset
        else:
            # MixedFeature: group the L levels into N_tables shared tables
            levels_per_table = -(-L // N_tables)
            offset = 0
            raw = [None] * L
            for t in range(N_tables):
                group = list(range(t * levels_per_table,
                                   min((t + 1) * levels_per_table, L)))
                table_off = offset
                # pack dense levels at the front of the shared table while
                # the whole group still fits; otherwise everyone hashes
                sizes = []
                for lvl in group:
                    scale = N_min * (b ** lvl) - 1.0
                    res = int(math.ceil(scale)) + 1
                    sizes.append(-(-res ** 3 // 8) * 8)
                if sum(sizes) <= hashmap_size:
                    sub = 0
                    for lvl, sz in zip(group, sizes):
                        scale = N_min * (b ** lvl) - 1.0
                        res = int(math.ceil(scale)) + 1
                        raw[lvl] = LevelSpec(scale, res, table_off + sub, sz,
                                             True, 0)
                        sub += sz
                    table_size = sub
                else:
                    table_size = hashmap_size
                    for j, lvl in enumerate(group):
                        scale = N_min * (b ** lvl) - 1.0
                        res = int(math.ceil(scale)) + 1
                        salt = ((j * _LEVEL_SALT_PRIME) & 0xFFFFFFFF)
                        raw[lvl] = LevelSpec(scale, res, table_off,
                                             hashmap_size, False, salt)
                offset += table_size
            specs = raw
            n_params = offset
        return HashGridConfig(L=L, F=F, log2_T=log2_T, N_min=N_min, b=b,
                              grid_type=grid_type, N_tables=N_tables,
                              levels=tuple(specs), n_params=n_params,
                              grad_corners=grad_corners)

    @property
    def out_dim(self) -> int:
        return self.L * self.F


def init_hashgrid_params(key, cfg: HashGridConfig,
                         dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init, matching tcnn's hash-table initialization."""
    return jax.random.uniform(key, (cfg.n_params, cfg.F), dtype,
                              minval=-1e-4, maxval=1e-4)


def _level_arrays(cfg: HashGridConfig):
    lv = cfg.levels
    return (
        np.array([m.scale for m in lv], np.float32),
        np.array([m.res for m in lv], np.uint32),
        np.array([m.offset for m in lv], np.uint32),
        np.array([m.size for m in lv], np.uint32),
        np.array([m.dense for m in lv], bool),
        np.array([m.salt for m in lv], np.uint32),
    )


def _corner_index(corner, res, offset, size, dense, salt):
    """Global table row for integer corner coords.

    corner: (L, N, 3) int32 (already >= 0); res/offset/size/dense/salt: (L,).
    """
    c = corner.astype(jnp.uint32)
    res = res[:, None]
    # clamp to the valid corner range (affects only x==1.0 exactly; see
    # module docstring note on the tcnn boundary convention)
    c = jnp.minimum(c, (res - 1)[..., None])
    dense_idx = c[..., 0] + c[..., 1] * res + c[..., 2] * res * res
    h = (c[..., 0] * jnp.uint32(_PRIMES[0])
         ^ c[..., 1] * jnp.uint32(_PRIMES[1])
         ^ c[..., 2] * jnp.uint32(_PRIMES[2])
         ^ salt[:, None])
    hash_idx = h & (size - 1)[:, None]
    idx = jnp.where(dense[:, None], dense_idx, hash_idx) + offset[:, None]
    return idx.astype(jnp.int32)


def _fwd_impl(params, x, cfg: HashGridConfig, window=None):
    """(N,3) in [0,1] -> (N, L*F). Returns (out, residuals-for-bwd)."""
    scale, res, offset, size, dense, salt = map(jnp.asarray,
                                                _level_arrays(cfg))
    xf = x.astype(jnp.float32)
    pos = xf[None, :, :] * scale[:, None, None] + 0.5   # (L, N, 3)
    base = jnp.floor(pos)
    frac = pos - base                                    # (L, N, 3)
    base = base.astype(jnp.int32)

    n = x.shape[0]
    out = jnp.zeros((cfg.L, n, cfg.F), jnp.float32)
    for c in range(8):
        bits = jnp.array([c & 1, (c >> 1) & 1, (c >> 2) & 1], jnp.int32)
        idx = _corner_index(base + bits, res, offset, size, dense, salt)
        wb = jnp.where(bits.astype(bool), frac, 1.0 - frac)   # (L,N,3)
        w = wb[..., 0] * wb[..., 1] * wb[..., 2]              # (L,N)
        out = out + w[..., None] * params[idx].astype(jnp.float32)
    if window is not None:
        out = out * window[:, None, None]
    return jnp.transpose(out, (1, 0, 2)).reshape(n, cfg.L * cfg.F)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode(params, x, cfg: HashGridConfig, window=None,
                    grad_noise=None):
    """Encode positions with the multiresolution (mixed-feature) hash grid.

    Args:
        params: (cfg.n_params, cfg.F) table.
        x: (N, 3) positions normalized to [0, 1].
        cfg: static :class:`HashGridConfig`.
        window: optional (L,) per-level window weights (Window grid type).
        grad_noise: optional (N, cfg.grad_corners) uniforms in [0, 1)
            enabling the stochastic-corner table gradient (see
            ``HashGridConfig.grad_corners``); the forward is always exact.

    Returns:
        (N, L*F) features, level-major (level 0 features first), matching the
        tcnn output layout consumed by the sigma MLP (networks.py:36-57).
    """
    return _fwd_impl(params, x, cfg, window)


def _encode_fwd(params, x, cfg, window=None, grad_noise=None):
    out = _fwd_impl(params, x, cfg, window)
    return out, (params, x, window, grad_noise)


def _encode_bwd(cfg, residuals, g):
    params, x, window, grad_noise = residuals
    scale, res, offset, size, dense, salt = map(jnp.asarray,
                                                _level_arrays(cfg))
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    pos = xf[None, :, :] * scale[:, None, None] + 0.5
    base = jnp.floor(pos)
    frac = pos - base
    base = base.astype(jnp.int32)

    gl = g.reshape(n, cfg.L, cfg.F).transpose(1, 0, 2)  # (L, N, F)
    if window is not None:
        gl_tab = gl * window[:, None, None]
    else:
        gl_tab = gl

    d_params = jnp.zeros_like(params)
    d_x = jnp.zeros_like(xf)
    need_dx = True  # cheap relative to the scatter; keeps pose-refinement live
    stochastic = grad_noise is not None and cfg.grad_corners < 8
    ws = []  # (8,) list of (L, N) trilinear weights for corner sampling
    for c in range(8):
        bits = jnp.array([c & 1, (c >> 1) & 1, (c >> 2) & 1], jnp.int32)
        bmask = bits.astype(bool)
        wb = jnp.where(bmask, frac, 1.0 - frac)  # (L,N,3)
        w = wb[..., 0] * wb[..., 1] * wb[..., 2]
        if stochastic:
            ws.append(w)
        else:
            idx = _corner_index(base + bits, res, offset, size, dense, salt)
            upd = (w[..., None] * gl_tab).reshape(-1, cfg.F)
            d_params = d_params.at[idx.reshape(-1)].add(
                upd.astype(params.dtype), mode="drop")
        if need_dx:
            idx = _corner_index(base + bits, res, offset, size, dense, salt)
            feat = params[idx].astype(jnp.float32)       # (L,N,F)
            gdot = (feat * gl_tab).sum(-1)               # (L,N)
            sgn = jnp.where(bmask, 1.0, -1.0)
            # dw/dfrac_d = sgn_d * prod_{d' != d} wb_{d'}
            dw = jnp.stack([
                sgn[0] * wb[..., 1] * wb[..., 2],
                sgn[1] * wb[..., 0] * wb[..., 2],
                sgn[2] * wb[..., 0] * wb[..., 1],
            ], axis=-1)                                   # (L,N,3)
            d_x = d_x + ((gdot[..., None] * dw)
                         * scale[:, None, None]).sum(0)
    if stochastic:
        # Sample cfg.grad_corners of the 8 corners per (level, sample) with
        # probability = trilinear weight via inverse-CDF on the per-sample
        # uniforms, and scatter the UNWEIGHTED cotangent there: because the
        # 8 weights sum to 1, E[scatter] == sum_c w_c * gl_tab @ idx_c — the
        # exact gradient — with 8/grad_corners fewer scatter-add updates
        # (the measured TPU wall, ~60 ns/update; docs/TPU_NOTES.md).
        m = cfg.grad_corners
        cumw = jnp.cumsum(jnp.stack(ws), axis=0)            # (8, L, N)
        u = grad_noise.astype(jnp.float32).T                # (m, N)
        cstar = jnp.minimum(
            (cumw[None] < u[:, None, None, :]).sum(1), 7)   # (m, L, N)
        bits = jnp.stack([cstar & 1, (cstar >> 1) & 1, (cstar >> 2) & 1],
                         axis=-1)                           # (m, L, N, 3)
        corner = (base[None] + bits).transpose(1, 0, 2, 3)  # (L, m, N, 3)
        idx_s = _corner_index(corner.reshape(cfg.L, m * n, 3),
                              res, offset, size, dense, salt)
        upd = jnp.broadcast_to(gl_tab[:, None] / m,
                               (cfg.L, m, n, cfg.F)).reshape(-1, cfg.F)
        d_params = d_params.at[idx_s.reshape(-1)].add(
            upd.astype(params.dtype), mode="drop")
    d_window = None
    if window is not None:
        out_l = _fwd_impl(params, x, cfg, None)
        out_l = out_l.reshape(n, cfg.L, cfg.F).transpose(1, 0, 2)
        d_window = (out_l * gl).sum(axis=(1, 2))
    d_gn = None if grad_noise is None else jnp.zeros_like(grad_noise)
    return d_params, d_x.astype(x.dtype), d_window, d_gn


hashgrid_encode.defvjp(_encode_fwd, _encode_bwd)


def window_weights(cfg: HashGridConfig, alpha: float = 1.0) -> jnp.ndarray:
    """Coarse-to-fine level window for the Window grid type.

    alpha in [0,1]: levels < alpha*L fully on, one transition level smoothed
    with a raised cosine, finer levels off. alpha=1 -> identity (== Hash).
    """
    ls = jnp.arange(cfg.L, dtype=jnp.float32)
    t = jnp.clip(alpha * cfg.L - ls, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * t))
