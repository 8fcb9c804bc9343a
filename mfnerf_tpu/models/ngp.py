"""NGP radiance field: hash-grid encoder + sigma/rgb MLPs + occupancy grid.

TPU-native re-design of the reference ``NGP(nn.Module)``
(models/networks.py:12-271). Differences from the reference are architectural,
not behavioral:

* tinycudann's fused ``NetworkWithInputEncoding`` / ``FullyFusedMLP`` /
  ``SphericalHarmonics`` become plain jnp matmuls + our hashgrid/sh ops; XLA
  fuses them into the surrounding rendering computation (tcnn MLPs are
  bias-free, which we match).
* the model is a pytree of arrays + a static config, so the same functions
  run under jit/shard_map without module state;
* occupancy maintenance (update_density_grid / mark_invisible_cells) is fully
  on-device jnp: Morton-ordered density grid, EMA decay, erosion, packbits —
  semantics follow networks.py:157-271 exactly, except that sampling
  "occupied" cells uses exact inverse-CDF sampling over the occupancy mask
  (static shapes) instead of torch.nonzero + randint (dynamic shapes).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import trunc_exp
from ..ops.hashgrid import (HashGridConfig, hashgrid_encode,
                            init_hashgrid_params, window_weights)
from ..ops.lowrank import (LowRankConfig, init_lowrank_params,
                           lowrank_encode)
from ..ops.morton import morton3d_invert, packbits
from ..ops.sh import sh_encode

NEAR_DISTANCE = 0.01  # reference models/rendering.py:8


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    """Static model configuration mirroring the reference CLI (opt.py:19-90)."""
    scale: float = 0.5
    grid: str = "Hash"            # Hash | Window | MixedFeature
    L: int = 16
    F: int = 2
    log2_T: int = 19
    N_min: int = 16
    N_max: int = 2048
    N_tables: int = 1
    # Hash/Window/MixedFeature table-gradient scatter budget: corners (of 8)
    # receiving backward scatter-adds, sampled by trilinear weight (exactly
    # unbiased; see ops/hashgrid.HashGridConfig.grad_corners). 8 = exact.
    hash_grad_samples: int = 8
    rgb_channels: int = 64
    rgb_layers: int = 2
    rgb_act: str = "Sigmoid"      # 'Sigmoid' | 'None' (HDR / exposure mode)
    grid_size: int = 128
    sigma_neurons: int = 64       # tcnn sigma MLP width (networks.py:54)
    geo_feat_dim: int = 16        # sigma MLP output width (networks.py:38)
    sh_degree: int = 4
    # LowRank (grid == 'LowRank') encoder knobs — the all-matmul TPU path
    lr_levels: int = 8
    lr_rank: int = 16
    lr_frames: int = 2
    lr_k_min: int = 32
    lr_k_max: int = 512
    # fused nested-level evaluation (one full-lane MXU matmul per axis
    # instead of L lane-starved ones; bf16 operands, fp32 accumulation) —
    # see ops/lowrank.lowrank_encode
    lr_fused: bool = False
    lr_matmul_dtype: str = "bfloat16"
    # matmul compute dtype: 'bfloat16' doubles MXU throughput; parameters,
    # sigma activation and compositing stay fp32 (mirrors the reference's
    # fp16-AMP-with-fp32-kernels policy, SURVEY §5 mixed precision)
    compute_dtype: str = "float32"
    # per-ray sample cap, mirrors RenderConfig.max_samples (reference
    # MAX_SAMPLES=1024, rendering.py:7). Kept here because it fixes the
    # marching ladder's dt_min and therefore the coarse-table dilation the
    # two-level march requires (ops/ray_march.twolevel_stratum)
    max_samples: int = 1024
    # upper bound on |rays_d| over every ray rendered/trained with this
    # model. Directions are UNNORMALIZED (reference parity,
    # datasets/ray_utils module doc), so a ladder t-step of dt moves
    # dt*|d| through space; the two-level march's stratum length and
    # coarse-table dilation must be derived for the WORST direction norm
    # or corner rays silently lose samples (ops/ray_march.twolevel_stratum).
    # NeRFSystem.setup computes this from the dataset's camera directions;
    # direct users with non-unit rays must set it themselves.
    dir_norm: float = 1.0
    # stage-A pooling factor for the TRAINING march (0 = the G/2 coarse
    # table). At the bench config the G/2 stage-A cell fits barely 2 strata
    # per 8^3 neighborhood row, so stage A pays ~1 row gather per 2 strata
    # per ray — the march's dominant cost; a G/pool_a table (pool_a = 4)
    # fits ~2x more. Extra stage-A false positives only cost exact stage-B
    # row tests in TRAINING (field evals are fixed at N*s_flat); the test
    # renderer keeps the G/2 table (a false-positive stratum there wastes a
    # whole padded field iteration — the r4 dilate-2 FPS regression).
    pool_a: int = 0

    @property
    def cascades(self) -> int:
        # each cascade covers [-2^(k-1), 2^(k-1)]^3 (networks.py:26)
        return max(1 + int(math.ceil(math.log2(2 * self.scale))), 1)

    @property
    def per_level_scale(self) -> float:
        # growth factor b (networks.py:33)
        return math.exp(
            math.log(self.N_max * self.scale / self.N_min) / (self.L - 1))

    @property
    def hash_cfg(self) -> HashGridConfig:
        if self.grid == "LowRank":
            raise ValueError("LowRank grid has no hash config")
        return HashGridConfig.create(
            L=self.L, F=self.F, log2_T=self.log2_T, N_min=self.N_min,
            b=self.per_level_scale, grid_type=self.grid,
            N_tables=self.N_tables, grad_corners=self.hash_grad_samples)

    @property
    def lowrank_cfg(self) -> LowRankConfig:
        return LowRankConfig.create(
            n_levels=self.lr_levels, k_min=self.lr_k_min,
            k_max=self.lr_k_max, rank=self.lr_rank,
            n_frames=self.lr_frames, out_dim=self.L * self.F,
            fused=self.lr_fused, matmul_dtype=self.lr_matmul_dtype)

    @property
    def n_cells(self) -> int:
        return self.grid_size ** 3


@jax.tree_util.register_pytree_with_keys_class
@dataclasses.dataclass
class OccupancyState:
    """Occupancy-grid buffers (reference buffers density_grid/density_bitfield/
    count_grid, train.py:77-81 + networks.py:28-29,212).

    ``coarse_bitfield`` is TPU-specific: a dilated half-resolution copy of the
    bitfield enabling two-level marching (strata tested at the coarse level,
    fine lookups only inside surviving strata) — random gathers are the
    scarce resource on TPU (~8 ns each, see docs/TPU_NOTES.md).
    ``coarse_nbr``/``fine_nbr`` are 8^3-neighborhood row tables (512 cells per
    gathered row, see ops/morton.neighborhood_table) that the two-level march
    reads instead of per-rung bit gathers — they cut marching gathers a
    further ~6x. All three are derived from ``density_bitfield`` (see
    refresh_coarse); kept in the state so marching needn't rebuild them every
    step. The nbr tables serve the single-cascade march; multi-cascade
    configs carry (1, 2) placeholders.
    """
    density_grid: jnp.ndarray    # (C, G^3) float32, Morton cell order
    density_bitfield: jnp.ndarray  # (C*G^3//8,) uint8
    count_grid: jnp.ndarray      # (C, G^3) float32 camera-coverage fraction
    coarse_bitfield: jnp.ndarray  # (C*(G/2)^3//8,) uint8, dilated
    coarse_nbr: jnp.ndarray      # ((G/2)^3, 16) uint32 dilated-coarse rows
    fine_nbr: jnp.ndarray        # (G^3, 16) uint32 exact fine rows
    union_bits: jnp.ndarray      # (G^3//8,) uint8 dilated world-space union
    #                              of all cascades (multi-cascade marching)
    pool_nbr: jnp.ndarray = None  # ((G/pool_a)^3, 16) uint32 pooled stage-A
    #                               rows for the TRAINING march (cfg.pool_a)

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("density_grid"), self.density_grid),
                (jax.tree_util.GetAttrKey("density_bitfield"),
                 self.density_bitfield),
                (jax.tree_util.GetAttrKey("count_grid"), self.count_grid),
                (jax.tree_util.GetAttrKey("coarse_bitfield"),
                 self.coarse_bitfield),
                (jax.tree_util.GetAttrKey("coarse_nbr"), self.coarse_nbr),
                (jax.tree_util.GetAttrKey("fine_nbr"), self.fine_nbr),
                (jax.tree_util.GetAttrKey("union_bits"), self.union_bits),
                (jax.tree_util.GetAttrKey("pool_nbr"), self.pool_nbr)), \
            None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def _nbr_tables(density_bitfield, cfg: "NGPConfig"):
        from ..ops.morton import occupancy_nbr_tables
        from ..ops.ray_march import twolevel_stratum
        if cfg.cascades != 1:
            z = jnp.zeros((1, 16), jnp.uint32)
            return z, z, z
        # the march buys stage-A conservativeness with multiple probe
        # points per stratum at this fixed ±1-cell dilation
        # (ops/ray_march.twolevel_stratum + stage_a_probes); the call keeps
        # the table/march contract in one place
        _, dilate = twolevel_stratum(0.0, cfg.max_samples, cfg.scale,
                                     cfg.grid_size, cfg.cascades,
                                     cfg.dir_norm)
        tables = occupancy_nbr_tables(density_bitfield, cfg.grid_size,
                                      dilate=max(dilate, 1),
                                      pool_a=cfg.pool_a)
        if cfg.pool_a:
            return tables
        return tables[0], tables[1], jnp.zeros((1, 16), jnp.uint32)

    @staticmethod
    def _union_bits(density_bitfield, cfg: "NGPConfig"):
        from ..ops.morton import union_bitfield
        from ..ops.ray_march import cascades_stratum
        stratum, dilate = cascades_stratum(
            1 / 256 if cfg.scale > 0.5 else 0.0, cfg.scale, cfg.cascades,
            dir_norm=cfg.dir_norm)
        if not stratum:
            return jnp.zeros((1,), jnp.uint8)
        return union_bitfield(density_bitfield, cfg.grid_size, cfg.cascades,
                              dilate)

    @staticmethod
    def create(cfg: NGPConfig) -> "OccupancyState":
        c, n = cfg.cascades, cfg.n_cells
        one = c == 1
        multi = OccupancyState._union_bits(
            jnp.zeros((c * n // 8,), jnp.uint8), cfg).shape[0] > 1
        n_pool = (n // cfg.pool_a ** 3) if (one and cfg.pool_a) else 1
        return OccupancyState(
            density_grid=jnp.zeros((c, n), jnp.float32),
            density_bitfield=jnp.zeros((c * n // 8,), jnp.uint8),
            count_grid=jnp.zeros((c, n), jnp.float32),
            coarse_bitfield=jnp.zeros((c * n // 64,), jnp.uint8),
            coarse_nbr=jnp.zeros((n // 8 if one else 1, 16), jnp.uint32),
            fine_nbr=jnp.zeros((n if one else 1, 16), jnp.uint32),
            union_bits=jnp.zeros((n // 8 if multi else 1,), jnp.uint8),
            pool_nbr=jnp.zeros((n_pool, 16), jnp.uint32),
        )

    def refresh_coarse(self, cfg: NGPConfig) -> "OccupancyState":
        """Rebuild the derived marching tables (coarse_bitfield + nbr rows +
        union bitfield) from density_bitfield (after ckpt load / direct
        bitfield edits)."""
        from ..ops.morton import coarse_bitfield_from_fine
        coarse_nbr, fine_nbr, pool_nbr = self._nbr_tables(
            self.density_bitfield, cfg)
        return dataclasses.replace(
            self, coarse_bitfield=coarse_bitfield_from_fine(
                self.density_bitfield, cfg.grid_size, cfg.cascades),
            coarse_nbr=coarse_nbr, fine_nbr=fine_nbr, pool_nbr=pool_nbr,
            union_bits=self._union_bits(self.density_bitfield, cfg))


def _mlp_init(key, sizes, dtype=jnp.float32):
    """Bias-free MLP weights, He-uniform (ReLU hidden layers)."""
    ws = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        bound = math.sqrt(6.0 / fan_in)
        ws.append(jax.random.uniform(sub, (fan_in, fan_out), dtype,
                                     minval=-bound, maxval=bound))
    return ws


def _mlp_apply(ws, x, out_act=None, dtype=jnp.float32):
    h = x.astype(dtype)
    for w in ws[:-1]:
        h = jax.nn.relu(jnp.dot(h, w.astype(dtype),
                                preferred_element_type=jnp.float32))
        h = h.astype(dtype)
    h = jnp.dot(h, ws[-1].astype(dtype),
                preferred_element_type=jnp.float32)
    if out_act == "sigmoid":
        h = jax.nn.sigmoid(h)
    return h


class NGP:
    """Functional NGP model: ``NGP(cfg)`` holds only static config; params and
    occupancy are explicit pytrees threaded through the methods."""

    def __init__(self, cfg: NGPConfig):
        self.cfg = cfg
        self.is_lowrank = cfg.grid == "LowRank"
        self.hash_cfg = None if self.is_lowrank else cfg.hash_cfg
        self.lowrank_cfg = cfg.lowrank_cfg if self.is_lowrank else None
        self.dtype = jnp.dtype(cfg.compute_dtype)

    # ------------------------------------------------------------------ init
    def init(self, key) -> dict:
        cfg = self.cfg
        k_table, k_sigma, k_rgb, k_tm = jax.random.split(key, 4)
        sh_dim = cfg.sh_degree ** 2
        params = {
            ("lowrank" if self.is_lowrank else "hash_table"):
                (init_lowrank_params(k_table, self.lowrank_cfg)
                 if self.is_lowrank
                 else init_hashgrid_params(k_table, self.hash_cfg)),
            # sigma net: L*F -> 64 -> 16 (networks.py:36-57)
            "sigma_mlp": _mlp_init(
                k_sigma, [cfg.L * cfg.F, cfg.sigma_neurons, cfg.geo_feat_dim]),
            # rgb net: (sh + geo_feat) -> rgb_channels x rgb_layers -> 3
            "rgb_mlp": _mlp_init(
                k_rgb, [sh_dim + cfg.geo_feat_dim]
                + [cfg.rgb_channels] * cfg.rgb_layers + [3]),
        }
        if cfg.rgb_act == "None":
            # HDR-NeRF tonemappers, one per channel (networks.py:81-94)
            tms = []
            for i in range(3):
                k_tm, sub = jax.random.split(k_tm)
                tms.append(_mlp_init(sub, [1, 64, 1]))
            params["tonemappers"] = tms
        return params

    # --------------------------------------------------------------- queries
    def _normalize(self, x):
        cfg = self.cfg
        # (x - xyz_min) / (xyz_max - xyz_min), networks.py:105
        return jnp.clip((x + cfg.scale) / (2 * cfg.scale), 0.0, 1.0)

    def density(self, params, x, return_feat=False, window_alpha=None,
                grad_noise=None):
        """sigma at world positions x in [-scale, scale]^3.

        Parity: networks.py:96-109. Returns (N,) sigma [and (N,16) features].
        ``grad_noise``: optional (N, hash_grad_samples) uniforms enabling the
        stochastic-corner table gradient (training-only throughput knob).
        """
        xn = self._normalize(x)
        if self.is_lowrank:
            enc = lowrank_encode(params["lowrank"], xn, self.lowrank_cfg,
                                 dtype=self.dtype)
        else:
            win = None
            if self.cfg.grid == "Window" and window_alpha is not None:
                win = window_weights(self.hash_cfg, window_alpha)
            enc = hashgrid_encode(params["hash_table"], xn, self.hash_cfg,
                                  win, grad_noise)
        h = _mlp_apply(params["sigma_mlp"], enc, dtype=self.dtype)
        sigmas = trunc_exp(h[:, 0])
        if return_feat:
            return sigmas, h
        return sigmas

    def log_radiance_to_rgb(self, params, log_radiances, exposure=None):
        """HDR-NeRF tonemapping (networks.py:111-132), rgb_act == 'None'."""
        if exposure is not None:
            log_exposure = jnp.log(exposure)
        else:
            log_exposure = 0.0
        outs = []
        for i in range(3):
            inp = log_radiances[:, i:i + 1] + log_exposure
            outs.append(_mlp_apply(params["tonemappers"][i], inp,
                                   out_act="sigmoid"))
        return jnp.concatenate(outs, axis=1)

    def forward(self, params, x, d, exposure=None, output_radiance=False,
                window_alpha=None, grad_noise=None):
        """(sigma, rgb) at positions x with view directions d.

        Parity: networks.py:134-155.
        """
        sigmas, h = self.density(params, x, return_feat=True,
                                 window_alpha=window_alpha,
                                 grad_noise=grad_noise)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        sh = sh_encode((d + 1.0) / 2.0, self.cfg.sh_degree)
        inp = jnp.concatenate([sh, h], axis=1)
        if self.cfg.rgb_act == "Sigmoid":
            rgbs = _mlp_apply(params["rgb_mlp"], inp, out_act="sigmoid",
                              dtype=self.dtype)
        else:  # log-radiance head
            rgbs = _mlp_apply(params["rgb_mlp"], inp, dtype=self.dtype)
            if output_radiance:
                rgbs = trunc_exp(rgbs)
            else:
                rgbs = self.log_radiance_to_rgb(params, rgbs,
                                                exposure=exposure)
        return sigmas, rgbs

    __call__ = forward

    # ----------------------------------------------------- occupancy helpers
    def _cell_world_coords(self, coords, cascade, key=None):
        """Morton cell coords -> jittered world positions in cascade's box.

        Parity: networks.py:253-257.
        """
        g = self.cfg.grid_size
        s = min(2 ** (cascade - 1), self.cfg.scale)
        half_grid_size = s / g
        xyzs = coords.astype(jnp.float32) / (g - 1) * 2.0 - 1.0
        xyzs_w = xyzs * (s - half_grid_size)
        if key is not None:
            noise = jax.random.uniform(key, xyzs_w.shape, minval=-1.0,
                                       maxval=1.0)
            xyzs_w = xyzs_w + noise * half_grid_size
        return xyzs_w

    def all_cell_coords(self):
        """(G^3, 3) integer coords of every cell in Morton storage order."""
        return morton3d_invert(jnp.arange(self.cfg.n_cells, dtype=jnp.uint32))

    def mark_invisible_cells(self, occ: OccupancyState, K, poses, img_wh,
                             chunk=64 ** 3) -> OccupancyState:
        """Mark cells seen by no camera with density -1 (frustum culling).

        Runs once before training. Parity: networks.py:199-240 — a cell is
        valid iff covered by >= 1 camera at depth >= NEAR_DISTANCE and not in
        front of (closer than NEAR_DISTANCE to) any camera. Also fills
        count_grid with the fraction of cameras covering each cell.
        """
        cfg = self.cfg
        g = cfg.grid_size
        w, h = int(img_wh[0]), int(img_wh[1])
        K = jnp.asarray(K, jnp.float32)
        poses = jnp.asarray(poses, jnp.float32)          # (N_cams, 3, 4)
        w2c_r = jnp.transpose(poses[:, :3, :3], (0, 2, 1))
        w2c_t = -jnp.einsum("nij,nj->ni", w2c_r, poses[:, :3, 3])
        n_cams = poses.shape[0]

        coords = self.all_cell_coords()                  # (G^3, 3)
        xyzs = coords.astype(jnp.float32) / (g - 1) * 2.0 - 1.0

        def per_cascade(c):
            s = min(2 ** (c - 1), cfg.scale)
            half_grid_size = s / g
            xyzs_w = xyzs * (s - half_grid_size)          # (G^3, 3)

            def body(chunk_xyz):
                # (N_cams, chunk, 3)
                xc = jnp.einsum("nij,kj->nki", w2c_r, chunk_xyz) + \
                    w2c_t[:, None, :]
                uvd = jnp.einsum("ij,nkj->nki", K, xc)
                depth = uvd[..., 2]
                uv = uvd[..., :2] / depth[..., None]
                in_image = ((depth >= 0)
                            & (uv[..., 0] >= 0) & (uv[..., 0] < w)
                            & (uv[..., 1] >= 0) & (uv[..., 1] < h))
                covered = (depth >= NEAR_DISTANCE) & in_image
                count = covered.sum(0).astype(jnp.float32) / n_cams
                too_near = ((depth < NEAR_DISTANCE) & in_image).any(0)
                valid = (count > 0) & (~too_near)
                return count, jnp.where(valid, 0.0, -1.0)

            n_chunks = -(-cfg.n_cells // chunk)
            xs = xyzs_w.reshape(n_chunks, -1, 3)
            counts, grids = jax.lax.map(body, xs)
            return counts.reshape(-1), grids.reshape(-1)

        counts, grids = [], []
        for c in range(cfg.cascades):
            cnt, grd = per_cascade(c)
            counts.append(cnt)
            grids.append(grd)
        return dataclasses.replace(
            occ, density_grid=jnp.stack(grids),
            count_grid=jnp.stack(counts))

    def update_density_grid(self, params, occ: OccupancyState, key,
                            density_threshold, warmup=False, decay=0.95,
                            erode=False, sparse=False,
                            half=None) -> OccupancyState:
        """Refresh the density grid from the live field and repack the
        bitfield. Parity: networks.py:242-271.

        warmup (and the default steady state): evaluate EVERY cell. The
        reference's steady state samples G^3/4 uniform + G^3/4 occupied
        cells instead (networks.py:171-197) — a GPU-economics choice: on TPU
        the sparse path's scatter-max costs ~60 ns/update (~60 ms per
        refresh) while simply evaluating all cells densely costs ~27 ms of
        MXU time and never misses a cell. ``sparse=True`` restores the
        reference's exact sampled semantics (inverse-CDF over the occupancy
        mask; kept for parity testing).

        ``half`` in {0, 1}: evaluate only the even/odd-Morton half of each
        cascade this refresh (alternate per refresh) — halves the dense
        refresh's field cost. The skipped half decays by ``decay`` exactly
        like the reference's UNSAMPLED cells do (networks.py:264 applies
        max(grid*decay, 0) to every cell it didn't sample), so per-cell
        refresh cadence lands close to the reference's stochastic one.
        """
        cfg = self.cfg
        n = cfg.n_cells
        grid = occ.density_grid

        def eval_cells(cascade, coords, key):
            xyzs_w = self._cell_world_coords(coords, cascade, key)
            return self.density(params, xyzs_w)

        tmp = jnp.zeros_like(grid)
        if not sparse and half is not None:  # alternating half-dense refresh
            idx = np.arange(int(half), n, 2, dtype=np.uint32)
            coords = morton3d_invert(jnp.asarray(idx))
            for c in range(cfg.cascades):
                key, sub = jax.random.split(key)
                sig = eval_cells(c, coords, sub)
                tmp = tmp.at[c, int(half)::2].set(sig)
        elif not sparse:  # dense refresh (warmup and TPU steady state)
            coords = self.all_cell_coords()
            for c in range(cfg.cascades):
                key, sub = jax.random.split(key)
                sig = eval_cells(c, coords, sub)
                tmp = tmp.at[c].set(sig)
        else:
            m = n // 4
            for c in range(cfg.cascades):
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                idx_uniform = jax.random.randint(k1, (m,), 0, n)
                # exact uniform sampling over occupied cells via inverse CDF
                occ_mask = (grid[c] > density_threshold).astype(jnp.float32)
                csum = jnp.cumsum(occ_mask)
                n_occ = csum[-1]
                u = jax.random.uniform(k2, (m,)) * n_occ
                idx_occupied = jnp.searchsorted(csum, u, side="right")
                idx_occupied = jnp.clip(idx_occupied, 0, n - 1)
                # if there are no occupied cells, fall back to the uniform set
                idx_occupied = jnp.where(n_occ > 0, idx_occupied, idx_uniform)
                indices = jnp.concatenate([idx_uniform, idx_occupied])
                coords = morton3d_invert(indices.astype(jnp.uint32))
                sig = eval_cells(c, coords, k3)
                tmp = tmp.at[c, indices].max(sig)
        if erode:
            # decay more the cells seen by few cameras (networks.py:260-262)
            decay = jnp.clip(
                jnp.asarray(decay, jnp.float32)
                ** (1.0 / jnp.maximum(occ.count_grid, 1e-8)), 0.1, 0.95)
        new_grid = jnp.where(grid < 0, grid, jnp.maximum(grid * decay, tmp))

        pos = new_grid > 0
        mean_density = jnp.where(pos, new_grid, 0.0).sum() / \
            jnp.maximum(pos.sum(), 1)
        threshold = jnp.minimum(mean_density, density_threshold)
        bitfield = packbits(new_grid, threshold)
        from ..ops.morton import coarse_bitfield_from_fine
        coarse = coarse_bitfield_from_fine(bitfield, cfg.grid_size,
                                           cfg.cascades)
        coarse_nbr, fine_nbr, pool_nbr = OccupancyState._nbr_tables(
            bitfield, cfg)
        return OccupancyState(density_grid=new_grid,
                              density_bitfield=bitfield,
                              count_grid=occ.count_grid,
                              coarse_bitfield=coarse,
                              coarse_nbr=coarse_nbr,
                              fine_nbr=fine_nbr,
                              union_bits=OccupancyState._union_bits(
                                  bitfield, cfg),
                              pool_nbr=pool_nbr)
