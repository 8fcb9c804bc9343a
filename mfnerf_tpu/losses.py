"""Training losses: per-ray MSE, opacity entropy, mip-NeRF-360 distortion.

Parity with the reference losses.py:40-60 (NeRFLoss) and the CUDA
distortion-loss kernels (models/csrc/losses.cu, DVGO-v2 closed form from
arXiv 2206.05085 of the mip-NeRF-360 loss, arXiv 2111.12077).

The distortion loss's inclusive/exclusive prefix-scan formulation maps 1:1
onto jnp.cumsum over the padded (N_rays, S) sample rows, and its hand-written
CUDA backward (losses.cu:112-175) is replaced by JAX autodiff through the
scans.
"""
from __future__ import annotations

import jax.numpy as jnp


def distortion_loss(ws, deltas, ts, mask):
    """Per-ray distortion loss over padded sample rows.

    L = sum_{i,j} w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 delta_i, evaluated
    with the sorted-prefix-sum identity (ts are treated as interval midpoints
    exactly as the reference does, losses.py:12-15):
    pairwise term = 2 * sum_i w_i (m_i * csum_{j<i} w_j - csum_{j<i} w_j m_j).

    Args:
        ws: (N, S) sample weights.
        deltas, ts: (N, S).
        mask: (N, S) validity.
    Returns:
        (N,) per-ray loss.
    """
    w = jnp.where(mask, ws, 0.0)
    m = ts
    wm = w * m
    w_excl = jnp.cumsum(w, axis=1) - w
    wm_excl = jnp.cumsum(wm, axis=1) - wm
    pair = 2.0 * (w * (m * w_excl - wm_excl)).sum(axis=1)
    uni = (w * w * deltas).sum(axis=1) / 3.0
    return pair + uni


def distortion_loss_flat(ws, w_excl, wm_excl, deltas, ts, offsets,
                         block=None, ray_id=None):
    """Distortion loss over flat ray-ordered samples (same closed form as
    :func:`distortion_loss`, with the exclusive prefix sums precomputed by
    the flat compositor). Returns (N,) per-ray losses. ``block`` is the
    static content-window bound of the flat layout (ops/composite.SEG_BLOCK
    when omitted). Passing ``ray_id`` uses the scatter-free linear adjoint
    (ops/composite.seg_sum_l) — required for the fast backward."""
    from .ops.composite import SEG_BLOCK, seg_sum, seg_sum_l
    pair = 2.0 * (ws * (ts * w_excl - wm_excl))
    uni = ws * ws * deltas / 3.0
    if ray_id is not None:
        return seg_sum_l(pair + uni, ray_id, offsets, block or SEG_BLOCK)
    return seg_sum(pair + uni, offsets, block or SEG_BLOCK)


class NeRFLoss:
    """Loss dict {rgb, opacity[, distortion]}; parity: losses.py:40-60."""

    def __init__(self, lambda_opacity=1e-3, lambda_distortion=1e-3):
        self.lambda_opacity = lambda_opacity
        self.lambda_distortion = lambda_distortion

    def __call__(self, results, target):
        d = {}
        d["rgb"] = (results["rgb"] - target["rgb"]) ** 2

        o = results["opacity"] + 1e-10
        # encourage opacity to be 0 or 1 to avoid floaters
        d["opacity"] = self.lambda_opacity * (-o * jnp.log(o))

        if self.lambda_distortion > 0:
            if "ws_flat" in results:  # flat (ragged) sample layout
                blk = results.get("flat_block")
                d["distortion"] = (
                    self.lambda_distortion * distortion_loss_flat(
                        results["ws_flat"], results["w_excl_flat"],
                        results["wm_excl_flat"], results["deltas_flat"],
                        results["ts_flat"], results["offsets"],
                        block=blk if isinstance(blk, int) else None,
                        ray_id=results.get("ray_id_flat")))
            else:
                d["distortion"] = self.lambda_distortion * distortion_loss(
                    results["ws"], results["deltas"], results["ts"],
                    results["mask"])
        return d
