"""Training orchestration: the TPU-native equivalent of the reference
NeRFSystem (train.py:56-248) + __main__ (train.py:251-311).

pytorch-lightning / DDP / apex / torchmetrics are replaced by a plain jitted
train step (optax Adam, cosine-staircase LR), on-device occupancy updates
every 16 steps, a numpy ray sampler, and tensorboardX logging under the same
tag names. Data parallelism uses a jax.sharding mesh (see parallel/mesh.py)
instead of NCCL DDP.
"""
from __future__ import annotations

import dataclasses
import glob
import math
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .datasets import dataset_dict
from .datasets.ray_utils import axisangle_to_R, get_rays
from .losses import NeRFLoss
from .models.ngp import NGP, NGPConfig, OccupancyState
from .models.rendering import (MAX_SAMPLES, RenderConfig, render_test,
                               render_train)
from .parallel.mesh import constrain_batch, make_mesh, replicate
from .utils.ckpt import load_ckpt, save_ckpt, slim_ckpt
from .utils.metrics import psnr as psnr_fn
from .utils.metrics import ssim as ssim_fn

WARMUP_STEPS = 256        # reference train.py:61
UPDATE_INTERVAL = 16      # reference train.py:62
STEPS_PER_EPOCH = 1000    # reference base.py:17-20
FUSED_CHUNK = 160         # steps per device dispatch in the fused train loop
FLAT_AFTER = 512          # switch to flat (ragged) sample eval once the
#                           occupancy grid has pruned (early rm_s ~ s_max
#                           would overflow the flat batch budget)


def depth2img(depth):
    """Colorize a depth map (TURBO colormap). Parity: train.py:48-53."""
    import cv2
    depth = (depth - depth.min()) / (depth.max() - depth.min() + 1e-8)
    return cv2.applyColorMap((depth * 255).astype(np.uint8),
                             cv2.COLORMAP_TURBO)


def cosine_staircase_lr(lr0, num_epochs, steps_per_epoch=STEPS_PER_EPOCH):
    """CosineAnnealingLR(T_max=num_epochs-1, eta_min=lr0*0.01) stepped per
    epoch (PL steps schedulers per epoch). Parity: train.py:140-142."""
    eta_min = lr0 * 0.01
    t_max = max(num_epochs - 1, 1)

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, t_max)
        return eta_min + 0.5 * (lr0 - eta_min) * (
            1 + jnp.cos(jnp.pi * epoch / t_max))

    return schedule


def allgather_ragged(vals, n_max, gather=None):
    """Gather each process's ragged per-image metric list.

    Pads this rank's list to the static n_max with NaN sentinels,
    all-gathers across processes, and drops the padding (the reference's
    `all_gather_ddp_if_available` on a round-robin image split,
    train.py:230-242). NaN — not -1 — is the sentinel: SSIM can be
    legitimately negative on anticorrelated images.

    ``gather`` is injectable for unit tests (multi-process validation is
    not reachable in CI); defaults to multihost_utils.process_allgather.
    """
    if gather is None:
        from jax.experimental import multihost_utils
        gather = multihost_utils.process_allgather
    pad = np.full(n_max, np.nan, np.float32)
    pad[:len(vals)] = vals
    flat = np.asarray(gather(jnp.asarray(pad))).reshape(-1)
    return flat[~np.isnan(flat)].tolist()


class NeRFSystem:
    def __init__(self, hparams):
        self.hparams = hparams
        self.model_cfg = NGPConfig(
            scale=hparams.scale, grid=hparams.grid, L=hparams.L, F=hparams.F,
            log2_T=hparams.T, N_min=hparams.N_min, N_max=hparams.N_max,
            N_tables=hparams.N_tables, rgb_channels=hparams.rgb_channels,
            rgb_layers=hparams.rgb_layers,
            hash_grad_samples=getattr(hparams, "hash_grad_samples", 8),
            rgb_act="None" if hparams.use_exposure else "Sigmoid",
            grid_size=getattr(hparams, "grid_size", 128),
            lr_levels=getattr(hparams, "lr_levels", 8),
            lr_rank=getattr(hparams, "lr_rank", 16),
            lr_frames=getattr(hparams, "lr_frames", 2),
            lr_k_min=getattr(hparams, "lr_k_min", 32),
            lr_k_max=getattr(hparams, "lr_k_max", 512),
            lr_fused=getattr(hparams, "lr_fused", False),
            compute_dtype="bfloat16" if getattr(hparams, "bf16", False)
            else "float32",
            max_samples=getattr(hparams, "max_samples", MAX_SAMPLES),
            # pooled stage-A table only for grid sizes it divides (the
            # march asserts conservativeness bounds; odd grids fall back
            # to the G/2 coarse table)
            pool_a=(getattr(hparams, "pool_a", 0)
                    if getattr(hparams, "grid_size", 128)
                    % max(getattr(hparams, "pool_a", 0), 1) == 0 else 0))
        self.model = NGP(self.model_cfg)
        if hparams.grid in ("Hash", "Window", "MixedFeature"):
            try:
                backend = jax.default_backend()
            except Exception:
                backend = "unknown"
            if backend not in ("cpu",):
                # measured on TPU v5e (docs/TPU_NOTES.md): the hash-table
                # backward is ~34-50M random scatter-adds per step; a
                # reference MF config ran 2587.6 ms/step vs 18.2 for LowRank
                # (~142x) — a 30k-step quickstart would take ~21 HOURS.
                hint = ("" if getattr(hparams, "hash_grad_samples", 8) < 8
                        else " or --hash_grad_samples 1 to cut the backward"
                             " scatter wall ~8x (unbiased sampled-corner"
                             " gradient)")
                print(
                    f"WARNING: --grid {hparams.grid} is gather/scatter-bound "
                    f"on TPU (measured ~142x slower per step than the "
                    f"TPU-native LowRank encoder; a 30k-step run takes hours,"
                    f" not minutes — docs/TPU_NOTES.md). Pass --grid LowRank "
                    f"for the TPU fast path with comparable quality{hint}.",
                    file=sys.stderr)
        self.rcfg = RenderConfig(
            exp_step_factor=1 / 256 if hparams.scale > 0.5 else 0.0,
            random_bg=hparams.random_bg,
            max_samples=getattr(hparams, "max_samples", MAX_SAMPLES),
            s_max_train=hparams.s_max_train,
            s_max_test=hparams.s_max_test,
            test_chunk=hparams.test_chunk,
            # stage-B strata budget: keep ~2.25x s_max_train rungs of
            # occupied-content coverage (the round-2/3 working point: 8
            # strata x 18 rungs at s_max_train 64) regardless of how long
            # the derived stratum is — longer strata (dilation-bought, see
            # ops/ray_march.twolevel_stratum) mean FEWER row gathers for
            # the same coverage
            s_strata=self._s_strata(hparams),
            # multi-cascade scenes march ~50 samples/ray steady-state: a
            # flat budget tuned for synthetic rm_s ~12 truncates whole
            # rays' samples and destabilizes training (measured, bench.py)
            s_flat=(0 if hparams.scale > 0.5
                    else getattr(hparams, "s_flat", 0)))
        wf = getattr(hparams, "wavefront", "auto")
        if wf != "auto":
            from .models.rendering import parse_wavefront
            self.rcfg = dataclasses.replace(
                self.rcfg, wavefront=parse_wavefront(str(wf)))
        self.loss = NeRFLoss(lambda_distortion=hparams.distortion_loss_w)
        self.density_threshold = 0.01 * MAX_SAMPLES / (3 ** 0.5)
        self.mesh = make_mesh(hparams.num_gpus)
        self.steps_per_epoch = getattr(hparams, "steps_per_epoch",
                                       STEPS_PER_EPOCH)

    def _s_strata(self, hparams):
        from .ops.ray_march import twolevel_stratum
        cfg = self.model_cfg
        exp_f = 1 / 256 if hparams.scale > 0.5 else 0.0
        stratum, _ = twolevel_stratum(exp_f, cfg.max_samples, cfg.scale,
                                      cfg.grid_size, cfg.cascades,
                                      cfg.dir_norm)
        if stratum:
            cov = 9 * hparams.s_max_train // 4
            return max(4, -(-cov // stratum))
        return max(4, hparams.s_max_train // 8)

    # ------------------------------------------------------------------ data
    def setup(self, train_dataset=None, test_dataset=None):
        hp = self.hparams
        if train_dataset is None:
            dataset = dataset_dict[hp.dataset_name]
            kwargs = {"root_dir": hp.root_dir, "downsample": hp.downsample}
            train_dataset = dataset(split=hp.split, **kwargs)
            test_dataset = dataset(split="test", **kwargs)
        self.train_dataset = train_dataset
        self.train_dataset.batch_size = hp.batch_size
        self.train_dataset.ray_sampling_strategy = hp.ray_sampling_strategy
        self.train_dataset.seed(hp.seed)
        self.test_dataset = test_dataset

        # directions are UNNORMALIZED (reference parity): the two-level
        # march's stratum/dilation bounds scale with the WORST |d| over
        # the cameras (ops/ray_march.twolevel_stratum). Known only now —
        # rebuild the model config (init/occ happen later, in configure)
        # and the stratum-dependent s_strata budget. Ceil to 1/16 so the
        # static value is stable across float jitter.
        dn = 1.0
        for ds in (train_dataset, test_dataset):
            d = getattr(ds, "directions", None)
            if d is not None:
                dn = max(dn, float(np.linalg.norm(
                    np.asarray(d, np.float32), axis=-1).max()))
        dn = math.ceil(dn * 16.0) / 16.0
        if dn != self.model_cfg.dir_norm:
            self.model_cfg = dataclasses.replace(self.model_cfg,
                                                 dir_norm=dn)
            self.model = NGP(self.model_cfg)
            self.rcfg = dataclasses.replace(self.rcfg,
                                            s_strata=self._s_strata(hp))

    # ----------------------------------------------------------------- state
    def configure(self, key):
        hp = self.hparams
        self.params = self.model.init(key)
        self.occ = OccupancyState.create(self.model_cfg)
        self.poses = jnp.asarray(self.train_dataset.poses)
        self.directions = jnp.asarray(self.train_dataset.directions)
        if hp.optimize_ext:
            n = len(self.train_dataset.poses)
            self.params["dR"] = jnp.zeros((n, 3))
            self.params["dT"] = jnp.zeros((n, 3))

        if hp.weight_path:  # partial warm start (reference train.py:129)
            loaded = load_ckpt(hp.weight_path, like={"params": self.params})
            self.params = loaded["params"]

        self.lr_schedule = cosine_staircase_lr(hp.lr, hp.num_epochs,
                                               self.steps_per_epoch)

        def label_fn(params):
            return {k: ("ext" if k in ("dR", "dT") else "net")
                    for k in params}

        tx_net = optax.adam(self.lr_schedule, eps=1e-15)
        # reference hard-codes 1e-6 (train.py:139); --pose_lr overrides
        tx_ext = optax.adam(getattr(self.hparams, "pose_lr", 1e-6))
        self.tx = optax.multi_transform(
            {"net": tx_net, "ext": tx_ext}, label_fn)
        self.opt_state = self.tx.init(self.params)
        self.global_step = 0
        self._build_jits()

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        hp = self.hparams
        model, loss_mod = self.model, self.loss
        use_exposure = hp.use_exposure
        optimize_ext = hp.optimize_ext
        unit_exposure_rgb = getattr(self.train_dataset, "unit_exposure_rgb",
                                    None)

        def make_train_step(rcfg):
            return self._make_train_step(rcfg, model, loss_mod, use_exposure,
                                         optimize_ext, unit_exposure_rgb)

        self._make_step_for = make_train_step
        self._train_step_fn = make_train_step(self.rcfg)
        self._train_step = jax.jit(self._train_step_fn,
                                   donate_argnums=(0, 1))

        def update_grid(params, occ, key, warmup, erode, half=None):
            return model.update_density_grid(
                params, occ, key, self.density_threshold, warmup=warmup,
                erode=erode, half=half)

        self._update_grid_fn = update_grid
        self._update_grid = jax.jit(update_grid, static_argnums=(3, 4, 5),
                                    donate_argnums=(1,))

    def _make_train_step(self, rcfg, model, loss_mod, use_exposure,
                         optimize_ext, unit_exposure_rgb):
        def forward_train(params, occ, poses, directions, batch, key):
            pose = poses[batch["img_idxs"]]
            dirs = directions[batch["pix_idxs"]]
            if optimize_ext:
                dr = axisangle_to_R(params["dR"][batch["img_idxs"]])
                pose = pose.at[..., :3].set(dr @ pose[..., :3])
                pose = pose.at[..., 3].add(params["dT"][batch["img_idxs"]])
            rays_o, rays_d = get_rays(dirs, pose)
            exposure = batch.get("exposure")
            return render_train(model, params, occ, rays_o, rays_d, key,
                                rcfg, exposure=exposure)

        def loss_fn(params, occ, poses, directions, batch, key):
            results = forward_train(params, occ, poses, directions, batch,
                                    key)
            loss_d = loss_mod(results, batch)
            if use_exposure:
                zero_rad = jnp.zeros((1, 3))
                unit_rgb = model.log_radiance_to_rgb(
                    params, zero_rad, exposure=jnp.ones((1, 1)))
                loss_d["unit_exposure"] = 0.5 * (
                    unit_rgb - unit_exposure_rgb) ** 2
            loss = sum(v.mean() for v in loss_d.values())
            aux = {
                "rgb": results["rgb"],
                "rm_samples": results["rm_samples"],
                "vr_samples": results["vr_samples"],
            }
            return loss, aux

        def train_step(params, opt_state, occ, poses, directions, batch, key,
                       step):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, occ, poses, directions, batch, key)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = {
                "loss": loss,
                "psnr": psnr_fn(aux["rgb"], batch["rgb"]),
                "rm_s": aux["rm_samples"] / batch["rgb"].shape[0],
                "vr_s": aux["vr_samples"] / batch["rgb"].shape[0],
                "lr": self.lr_schedule(step),
            }
            return params, opt_state, metrics

        return train_step

    # ------------------------------------------------------- fused multi-step
    def make_fused_train_fn(self, n_img, hw, erode=False,
                            same_image=False, rcfg=None, mesh=None):
        """Build a jitted runner executing ``n_steps`` training steps in ONE
        device dispatch: on-device ray sampling from a staged ``rays`` array,
        occupancy-grid refresh every UPDATE_INTERVAL steps via ``lax.cond``,
        and the optimizer update — a single fused XLA program.

        This is the TPU-shaped replacement for the reference's
        one-dispatch-per-step Lightning loop (train.py:164-190): host round
        trips (30 ms over a tunneled chip) would otherwise dominate the
        ~4 ms step. Steady-state only (the warmup<256 grid phase uses the
        per-step path, since warmup updates have a different cell-sampling
        shape).

        With ``mesh`` (data parallelism) the sampled batch is
        sharding-constrained on the ray axis, so the same fused program runs
        SPMD across the mesh: per-device slices of the sampling gather and
        the render/grad pipeline, one all-reduce at the loss/grad means —
        the GSPMD equivalent of the reference's DDP (train.py:283-285)
        without leaving the fused dispatch.

        Returns ``run(params, opt_state, occ, poses, directions, rays, key,
        step0, n_steps) -> (params, opt_state, occ, metrics)`` with
        ``n_steps`` static; ``rays`` is (n_img, hw, 3|4) with the optional
        exposure channel.
        """
        train_step = (self._train_step_fn if rcfg is None
                      else self._make_step_for(rcfg))
        update_grid = self._update_grid_fn

        def sample_batch(rays, key):
            k1, k2 = jax.random.split(key)
            if same_image:  # reference base.py:27-28
                img = jax.random.randint(k1, (), 0, n_img)
                img_idxs = jnp.full((self.hparams.batch_size,), img)
            else:
                img_idxs = jax.random.randint(
                    k1, (self.hparams.batch_size,), 0, n_img)
            pix_idxs = jax.random.randint(
                k2, (self.hparams.batch_size,), 0, hw)
            picked = rays[img_idxs, pix_idxs]
            batch = {"img_idxs": img_idxs, "pix_idxs": pix_idxs,
                     "rgb": picked[:, :3]}
            if rays.shape[-1] == 4:
                batch["exposure"] = picked[:, 3:4]
            return constrain_batch(batch, mesh)

        zero_metrics = {k: jnp.zeros(()) for k in
                        ("loss", "psnr", "rm_s", "vr_s", "lr")}

        # Blocks of [grid update; UPDATE_INTERVAL train steps] rather than a
        # per-step lax.cond: XLA may lower a cond inside fori_loop by
        # executing both branches (measured: the update branch ran every
        # step, 9.6 -> 76 ms/step), so the update is hoisted to block
        # structure instead. Caller must pass step0 % UPDATE_INTERVAL == 0.
        def train_block(params, opt_state, occ, poses, directions, rays, key,
                        block_step0, n):
            def body(i, carry):
                params, opt_state, key, _ = carry
                key, k_batch, k_step = jax.random.split(key, 3)
                batch = sample_batch(rays, k_batch)
                params, opt_state, metrics = train_step(
                    params, opt_state, occ, poses, directions, batch, k_step,
                    block_step0 + i)
                return params, opt_state, key, metrics

            return jax.lax.fori_loop(
                0, n, body, (params, opt_state, key, zero_metrics))

        # alternating half-dense refresh (--refresh_half): halve the dense
        # refresh's field cost by evaluating even-Morton cells one refresh,
        # odd the next; the skipped half decays exactly like the reference's
        # unsampled cells (ngp.update_density_grid). The parity must be a
        # STATIC index (strided store), and a cond inside fori_loop may
        # execute both branches (see train_block note), so blocks unroll in
        # PAIRS; parity restarts per dispatch (a one-refresh cadence hiccup
        # at chunk seams — cells only ever decay while skipped, never stale
        # high).
        refresh_half = getattr(self.hparams, "refresh_half", False)

        @partial(jax.jit, static_argnums=(8,), donate_argnums=(0, 1, 2))
        def run(params, opt_state, occ, poses, directions, rays, key, step0,
                n_steps):
            n_blocks, tail = divmod(n_steps, UPDATE_INTERVAL)

            def upd_and_block(params, opt_state, occ, key, bstep, n, half):
                key, k_up, k_blk = jax.random.split(key, 3)
                occ = update_grid(params, occ, k_up, False, erode, half)
                params, opt_state, _, metrics = train_block(
                    params, opt_state, occ, poses, directions, rays, k_blk,
                    bstep, n)
                return params, opt_state, occ, key, metrics

            if refresh_half:
                n_pairs, odd = divmod(n_blocks, 2)

                def pair(b, carry):
                    params, opt_state, occ, key, _ = carry
                    s0 = step0 + 2 * b * UPDATE_INTERVAL
                    params, opt_state, occ, key, metrics = upd_and_block(
                        params, opt_state, occ, key, s0, UPDATE_INTERVAL, 0)
                    params, opt_state, occ, key, metrics = upd_and_block(
                        params, opt_state, occ, key, s0 + UPDATE_INTERVAL,
                        UPDATE_INTERVAL, 1)
                    return params, opt_state, occ, key, metrics

                params, opt_state, occ, key, metrics = jax.lax.fori_loop(
                    0, n_pairs, pair,
                    (params, opt_state, occ, key, zero_metrics))
                if odd:
                    params, opt_state, occ, key, metrics = upd_and_block(
                        params, opt_state, occ, key,
                        step0 + (n_blocks - 1) * UPDATE_INTERVAL,
                        UPDATE_INTERVAL, 0)
                if tail:
                    params, opt_state, occ, key, metrics = upd_and_block(
                        params, opt_state, occ, key,
                        step0 + n_blocks * UPDATE_INTERVAL, tail,
                        1 if odd else 0)
                return params, opt_state, occ, metrics

            def block(b, carry):
                params, opt_state, occ, key, _ = carry
                return upd_and_block(params, opt_state, occ, key,
                                     step0 + b * UPDATE_INTERVAL,
                                     UPDATE_INTERVAL, None)

            params, opt_state, occ, key, metrics = jax.lax.fori_loop(
                0, n_blocks, block,
                (params, opt_state, occ, key, zero_metrics))
            if tail:
                params, opt_state, occ, key, metrics = upd_and_block(
                    params, opt_state, occ, key,
                    step0 + n_blocks * UPDATE_INTERVAL, tail, None)
            return params, opt_state, occ, metrics

        return run

    # ------------------------------------------------------------- main loop
    def fit(self, log_dir=None, writer=None):
        hp = self.hparams
        erode = hp.dataset_name == "colmap"
        key = jax.random.PRNGKey(hp.seed)

        if self.mesh is not None:  # replicate state across the data mesh
            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
            self.occ = replicate(self.occ, self.mesh)
            self.poses = replicate(self.poses, self.mesh)
            self.directions = replicate(self.directions, self.mesh)

        # frustum culling once before training (train.py:159-162)
        self.occ = jax.jit(
            self.model.mark_invisible_cells, static_argnums=(3,))(
                self.occ, jnp.asarray(self.train_dataset.K), self.poses,
                tuple(self.train_dataset.img_wh))

        total_steps = hp.num_epochs * self.steps_per_epoch

        # steady-state fused runner: N steps per dispatch with on-device
        # sampling. Multi-chip runs the SAME fused program with the sampled
        # batch sharding-constrained across the mesh (GSPMD slices the
        # pipeline and inserts the gradient all-reduce) — DP no longer falls
        # back to RTT-dominated per-step dispatch
        kwargs = dict(
            n_img=len(self.train_dataset.poses),
            hw=self.train_dataset.img_wh[0]
            * self.train_dataset.img_wh[1],
            erode=erode,
            same_image=hp.ray_sampling_strategy == "same_image",
            mesh=self.mesh)
        fused = self.make_fused_train_fn(**kwargs)
        # early steps run the padded evaluator: pre-pruning rm_s would
        # overflow the flat sample budget and starve training
        fused_warm = fused if self.rcfg.s_flat == 0 else \
            self.make_fused_train_fn(
                rcfg=dataclasses.replace(self.rcfg, s_flat=0), **kwargs)
        staged_rays = replicate(jnp.asarray(self.train_dataset.rays),
                                self.mesh)

        def log_metrics(metrics, step):
            m = jax.device_get(metrics)
            if writer is not None:
                writer.add_scalar("lr", float(m["lr"]), step)
                writer.add_scalar("train/loss", float(m["loss"]), step)
                writer.add_scalar("train/rm_s", float(m["rm_s"]), step)
                writer.add_scalar("train/vr_s", float(m["vr_s"]), step)
                writer.add_scalar("train/psnr", float(m["psnr"]), step)
            return m

        t0 = time.time()
        step = self.global_step
        last_print = -1000
        # the dense occupancy refresh makes warmup and steady-state updates
        # the same program, so the fused runner can serve every step
        while step < total_steps:
            chunk = min(FUSED_CHUNK, total_steps - step)
            if step < FLAT_AFTER:
                chunk = min(chunk, FLAT_AFTER - step)
            run = fused_warm if step < FLAT_AFTER else fused
            key, sub = jax.random.split(key)
            self.params, self.opt_state, self.occ, metrics = run(
                self.params, self.opt_state, self.occ, self.poses,
                self.directions, staged_rays, sub, step, chunk)
            step += chunk

            self.global_step = step
            if step - last_print >= 1000 or step == total_steps:
                m = log_metrics(metrics, step - 1)
                last_print = step
                dt = time.time() - t0
                print(f"step {step:6d}/{total_steps} "
                      f"loss {float(m['loss']):.4f} "
                      f"psnr {float(m['psnr']):.2f} "
                      f"rm_s {float(m['rm_s']):.1f} "
                      f"vr_s {float(m['vr_s']):.1f} "
                      f"[{dt:.0f}s]", flush=True)
        return time.time() - t0

    # ------------------------------------------------------------ validation
    def validate(self, save_dir=None, writer=None, eval_lpips=False):
        hp = self.hparams
        w, h = self.test_dataset.img_wh
        psnrs, ssims, lpipss = [], [], []
        lpips_weights = getattr(hp, "lpips_weights", None)
        if eval_lpips and lpips_weights is None:
            # fail fast rather than silently dropping a requested metric:
            # the reference's torchmetrics LPIPS downloads VGG16 weights at
            # first use (train.py:69-71), which a no-egress deployment can't
            raise ValueError(
                "--eval_lpips needs --lpips_weights <npz>. Export it once on "
                "a machine with network access: `pip install lpips && python "
                "misc/export_lpips_weights.py --out lpips_vgg.npz`, then "
                "pass --lpips_weights lpips_vgg.npz. (This environment has "
                "no torchvision/lpips package and no egress, so the VGG16 "
                "weights cannot be bundled; the JAX LPIPS implementation in "
                "mfnerf_tpu/utils/lpips.py is parity-tested against a torch "
                "replica in tests/test_lpips.py.)")
        if eval_lpips:  # fail fast on a bad weights file, before rendering
            from .utils.lpips import load_lpips_weights
            load_lpips_weights(lpips_weights)
        n_imgs = len(self.test_dataset)
        # multi-host: round-robin the test images across processes, then
        # all-gather the per-image metrics (the reference's
        # all_gather_ddp_if_available, train.py:230-242)
        n_proc = jax.process_count()
        proc_id = jax.process_index()
        for i in range(n_imgs):
            if i % n_proc != proc_id:
                continue
            batch = self.test_dataset[i]
            rays_o, rays_d = get_rays(
                jnp.asarray(self.test_dataset.directions),
                jnp.asarray(batch["pose"]))
            if self.mesh is not None and jax.process_count() == 1:
                # DP rendering: rays shard over the mesh devices. Multi-host
                # keeps the per-process round-robin above instead (the mesh
                # spans remote chips this process's host arrays can't feed).
                from .models.rendering import render_test_sharded
                results = render_test_sharded(
                    self.model, self.params, self.occ, rays_o, rays_d,
                    self.rcfg, self.mesh,
                    camera=(self.test_dataset.K, batch["pose"],
                            self.test_dataset.img_wh),
                    exposure=batch.get("exposure"))
            else:
                results = render_test(
                    self.model, self.params, self.occ, rays_o, rays_d,
                    self.rcfg,
                    camera=(self.test_dataset.K, batch["pose"],
                            self.test_dataset.img_wh),
                    # HDR-NeRF: test renders use the image's exposure
                    # (reference train.py:102-103)
                    exposure=batch.get("exposure"))
            rgb_pred = np.asarray(results["rgb"]).reshape(h, w, 3)
            logs = {}
            if "rgb" in batch:
                rgb_gt = np.asarray(batch["rgb"]).reshape(h, w, 3)
                logs["psnr"] = float(psnr_fn(jnp.asarray(rgb_pred),
                                             jnp.asarray(rgb_gt)))
                logs["ssim"] = float(ssim_fn(jnp.asarray(rgb_pred),
                                             jnp.asarray(rgb_gt)))
                psnrs.append(logs["psnr"])
                ssims.append(logs["ssim"])
                if eval_lpips:
                    from .utils.metrics import lpips_vgg
                    logs["lpips"] = float(lpips_vgg(
                        jnp.asarray(rgb_pred), jnp.asarray(rgb_gt),
                        weights_path=lpips_weights))
                    lpipss.append(logs["lpips"])
            if save_dir is not None:
                import imageio.v2 as imageio
                idx = batch["img_idxs"]
                imageio.imsave(
                    os.path.join(save_dir, f"{idx:03d}.png"),
                    (rgb_pred * 255).astype(np.uint8))
                depth = np.asarray(results["depth"]).reshape(h, w)
                imageio.imsave(os.path.join(save_dir, f"{idx:03d}_d.png"),
                               depth2img(depth))
            print(f"val image {i + 1}/{n_imgs}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in logs.items()), flush=True)

        if n_proc > 1:  # gather every rank's per-image metrics
            psnrs = allgather_ragged(psnrs, n_imgs)
            ssims = allgather_ragged(ssims, n_imgs)
            lpipss = allgather_ragged(lpipss, n_imgs)

        out = {}
        if psnrs:
            out["test/psnr"] = float(np.mean(psnrs))
            out["test/ssim"] = float(np.mean(ssims))
        if lpipss:
            out["test/lpips_vgg"] = float(np.mean(lpipss))
        if writer is not None:
            for k, v in out.items():
                writer.add_scalar(k, v, self.global_step)
        return out


def main(hparams):
    t_start = time.time()
    if getattr(hparams, "multihost", False):
        # DCN multi-host: the data mesh then spans every host's chips
        # (reference DDP's multi-node analogue); idempotent if already up
        jax.distributed.initialize()
    np.random.seed(hparams.seed)

    if hparams.val_only and (not hparams.ckpt_path):
        raise ValueError("You need to provide a @ckpt_path for validation!")

    system = NeRFSystem(hparams)
    system.setup()
    system.configure(jax.random.PRNGKey(hparams.seed))

    ckpt_dir = f"ckpts/{hparams.dataset_name}/{hparams.exp_name}"
    os.makedirs(ckpt_dir, exist_ok=True)
    log_dir = f"logs/{hparams.dataset_name}/{hparams.exp_name}"
    os.makedirs(log_dir, exist_ok=True)
    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir)
    except ImportError:
        pass

    if hparams.ckpt_path:
        loaded = load_ckpt(hparams.ckpt_path, like={
            "params": system.params, "occ": system.occ,
            "opt_state": system.opt_state})
        system.params = loaded["params"]
        if "occ" in loaded:
            system.occ = loaded["occ"].refresh_coarse(system.model_cfg)
        if "opt_state" in loaded and not hparams.val_only:
            system.opt_state = loaded["opt_state"]
        system.global_step = loaded["step"]

    if getattr(hparams, "profile", False) and not hparams.val_only:
        # capture a device trace of a few steps (view with tensorboard or
        # xprof); parity-plus: the reference has no profiler integration
        # (SURVEY §5), only wall-clock logs
        trace_dir = os.path.join(log_dir, "profile")
        sys_bak = hparams.num_epochs, hparams.steps_per_epoch
        hparams.num_epochs, system.steps_per_epoch = 1, 48
        with jax.profiler.trace(trace_dir):
            system.fit()
        hparams.num_epochs, system.steps_per_epoch = sys_bak
        system.global_step = 0
        print(f"profiler trace written to {trace_dir}")

    if not hparams.val_only:
        train_time = system.fit(log_dir=log_dir, writer=writer)
        print(f"training took {train_time:.1f}s")
        ckpt_path = os.path.join(ckpt_dir,
                                 f"epoch={hparams.num_epochs - 1}.ckpt.npz")
        save_ckpt(ckpt_path, system.params, occ=system.occ,
                  opt_state=system.opt_state, step=system.global_step,
                  poses=system.poses if hparams.optimize_ext else None)
        slim_ckpt(ckpt_path,
                  os.path.join(ckpt_dir,
                               f"epoch={hparams.num_epochs - 1}_slim.ckpt.npz"),
                  save_poses=hparams.optimize_ext)

    save_dir = None
    if not hparams.no_save_test:
        save_dir = f"results/{hparams.dataset_name}/{hparams.exp_name}"
        os.makedirs(save_dir, exist_ok=True)
    metrics = system.validate(save_dir=save_dir, writer=writer,
                              eval_lpips=hparams.eval_lpips)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")

    # mp4 assembly for NSVF synthetic scenes (reference train.py:298-307)
    if (not hparams.no_save_test) and hparams.dataset_name == "nsvf" \
            and "Synthetic" in hparams.root_dir:
        try:
            import imageio.v2 as imageio
            imgs = sorted(glob.glob(os.path.join(save_dir, "*.png")))
            imageio.mimsave(os.path.join(save_dir, "rgb.mp4"),
                            [imageio.imread(img) for img in imgs
                             if not img.endswith("_d.png")], fps=30)
            imageio.mimsave(os.path.join(save_dir, "depth.mp4"),
                            [imageio.imread(img) for img in imgs
                             if img.endswith("_d.png")], fps=30)
        except Exception as e:  # ffmpeg may be unavailable
            print(f"video assembly skipped: {e}")

    runtime = time.strftime("%H:%M:%S", time.gmtime(time.time() - t_start))
    print(f"Total runtime: {runtime}")
    return metrics
