"""Image quality metrics in jnp: MSE / PSNR / SSIM (+ optional LPIPS).

Replaces the reference's metrics.py (mse/psnr) and its torchmetrics
PSNR/SSIM/LPIPS instances (train.py:28-32,65-71). SSIM follows the standard
Wang et al. formulation with an 11x11 Gaussian window (sigma 1.5) and
k1=0.01/k2=0.03 on data_range=1, matching torchmetrics defaults.

LPIPS requires pretrained VGG16 features; this environment has no
torchvision/lpips weights, so :func:`lpips_vgg` is a gated stub that raises
with instructions unless a weights file is provided.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def mse(image_pred, image_gt, valid_mask=None, reduction="mean"):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr(image_pred, image_gt, valid_mask=None, reduction="mean"):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(img_pred, img_gt, data_range=1.0, kernel_size=11, sigma=1.5):
    """Mean SSIM over an image.

    Args:
        img_pred, img_gt: (H, W, C) float arrays.
    Returns:
        scalar mean SSIM.
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)[None, None]  # (1,1,kh,kw)

    def filt(x):  # x: (H, W, C) -> valid-window local means
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # (C,1,H,W)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), "VALID")
        return y[:, 0]

    mu_p, mu_g = filt(img_pred), filt(img_gt)
    mu_pp = filt(img_pred * img_pred)
    mu_gg = filt(img_gt * img_gt)
    mu_pg = filt(img_pred * img_gt)
    # fp32 cancellation on near-constant windows (e.g. white background)
    # can drive E[x^2]-E[x]^2 slightly negative and SSIM above 1; clamp
    # variances and project the covariance onto Cauchy-Schwarz so the
    # result is mathematically bounded by 1
    var_p = jnp.maximum(mu_pp - mu_p * mu_p, 0.0)
    var_g = jnp.maximum(mu_gg - mu_g * mu_g, 0.0)
    cov = mu_pg - mu_p * mu_g
    bound = jnp.sqrt(var_p * var_g)
    cov = jnp.clip(cov, -bound, bound)
    num = (2 * mu_p * mu_g + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_g ** 2 + c1) * (var_p + var_g + c2)
    return jnp.mean(num / den)


def lpips_vgg(img_pred, img_gt, weights_path=None, _cache={}):
    """LPIPS(vgg) distance between (H, W, 3) images in [0, 1].

    The reference uses torchmetrics' LearnedPerceptualImagePatchSimilarity
    ('vgg') (train.py:28-32); the JAX implementation lives in
    utils/lpips.py. Pretrained weights are not bundled in this offline
    environment — export them once with misc/export_lpips_weights.py and
    pass the npz via ``weights_path`` (CLI: --lpips_weights).
    """
    from .lpips import load_lpips_weights, lpips_from_weights
    if weights_path is None:
        raise RuntimeError(
            "LPIPS requires pretrained VGG16 features which are not bundled "
            "in this environment. Export them with "
            "misc/export_lpips_weights.py and pass --lpips_weights "
            "<file.npz>, or drop the --eval_lpips flag.")
    if weights_path not in _cache:
        _cache[weights_path] = load_lpips_weights(weights_path)
    return lpips_from_weights(_cache[weights_path], img_pred, img_gt)
