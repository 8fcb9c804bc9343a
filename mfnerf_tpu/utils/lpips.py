"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 backbone, in JAX.

Replaces the reference's torchmetrics
``LearnedPerceptualImagePatchSimilarity('vgg')`` (reference train.py:28-32,
65-71, applied at train.py:210-214 as ``lpips(clip(2*pred-1), clip(2*gt-1))``).

The metric (Zhang et al., CVPR 2018, "The Unreasonable Effectiveness of Deep
Features as a Perceptual Metric"):

    d(x, y) = sum_l  mean_hw || w_l ⊙ ( f̂_l(x) − f̂_l(y) ) ||²

where f_l are VGG16 activations after relu1_2 / relu2_2 / relu3_3 / relu4_3 /
relu5_3, f̂ is channel-unit-normalization, and w_l are the learned per-channel
linear weights. Inputs are scaled to [-1, 1] then whitened by the fixed
shift/scale constants from the official implementation.

Pretrained VGG16 + LPIPS linear weights are NOT bundled (no network access in
this environment, and the weights are not redistributable here). They load
from a .npz produced by ``misc/export_lpips_weights.py`` (runs anywhere with
torchvision + lpips installed) — pass it via ``--lpips_weights``. Weight
layout is the torch one (conv kernels OIHW), converted on the fly.

All ops are jnp convs/reductions, so the metric runs on TPU/CPU under jit.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 "features" conv layout: (out_channels, n_convs) per block; maxpool
# between blocks. LPIPS taps the activation after the last ReLU of each block.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
N_CONVS = sum(n for _, n in _VGG_BLOCKS)          # 13
N_TAPS = len(_VGG_BLOCKS)                          # 5
TAP_CHANNELS = tuple(c for c, _ in _VGG_BLOCKS)    # (64,128,256,512,512)

# Official LPIPS input whitening constants (ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def canonical_weight_shapes():
    """Expected npz contents: conv{i}_w (O,I,3,3) / conv{i}_b (O,) for the 13
    VGG16 convs in order, and lin{k}_w (C_k,) for the 5 LPIPS heads."""
    shapes = {}
    c_in = 3
    i = 0
    for c_out, n in _VGG_BLOCKS:
        for _ in range(n):
            shapes[f"conv{i}_w"] = (c_out, c_in, 3, 3)
            shapes[f"conv{i}_b"] = (c_out,)
            c_in = c_out
            i += 1
    for k, c in enumerate(TAP_CHANNELS):
        shapes[f"lin{k}_w"] = (c,)
    return shapes


def load_lpips_weights(path):
    """Load the canonical npz into a pytree of jnp arrays (validated)."""
    raw = np.load(path)
    shapes = canonical_weight_shapes()
    missing = sorted(set(shapes) - set(raw.files))
    if missing:
        raise ValueError(
            f"LPIPS weights file {path!r} is missing keys {missing[:4]}... "
            "— regenerate it with misc/export_lpips_weights.py")
    out = {}
    for k, shape in shapes.items():
        a = np.asarray(raw[k], np.float32)
        if k.startswith("lin") and a.ndim == 4:   # torch (1,C,1,1) 1x1 conv
            a = a.reshape(-1)
        if a.shape != shape:
            raise ValueError(f"LPIPS weight {k}: shape {a.shape} != {shape}")
        out[k] = jnp.asarray(a)
    return out


def random_lpips_weights(key):
    """Random (untrained) weights with the right shapes — for tests only."""
    out = {}
    for k, shape in canonical_weight_shapes().items():
        key, sub = jax.random.split(key)
        a = 0.05 * jax.random.normal(sub, shape, jnp.float32)
        if k.startswith("lin"):
            a = jnp.abs(a)  # lpips constrains heads non-negative
        out[k] = a
    return out


def _conv3x3(x, w, b):
    """NCHW conv, stride 1, SAME(pad=1), torch OIHW kernel."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def vgg16_taps(weights, x):
    """VGG16 forward; returns the 5 tapped post-ReLU activations.

    x: (N, 3, H, W), already whitened.
    """
    taps = []
    i = 0
    for bi, (_, n) in enumerate(_VGG_BLOCKS):
        for _ in range(n):
            x = jax.nn.relu(
                _conv3x3(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"]))
            i += 1
        taps.append(x)
        if bi < len(_VGG_BLOCKS) - 1:
            x = _maxpool2(x)
    return taps


def _unit_normalize(f, eps=1e-10):
    """Channel-unit normalization (lpips normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@partial(jax.jit, static_argnames=())
def lpips_from_weights(weights, img_pred, img_gt):
    """LPIPS distance between two images.

    Args:
        weights: pytree from :func:`load_lpips_weights`.
        img_pred, img_gt: (H, W, 3) float arrays in [0, 1].
    Returns:
        scalar distance.
    """
    def prep(img):
        x = jnp.clip(img.astype(jnp.float32) * 2.0 - 1.0, -1.0, 1.0)
        x = (x - _SHIFT) / _SCALE                      # whitening
        return jnp.transpose(x, (2, 0, 1))[None]       # (1,3,H,W)

    taps_p = vgg16_taps(weights, prep(img_pred))
    taps_g = vgg16_taps(weights, prep(img_gt))
    total = 0.0
    for k in range(N_TAPS):
        d = _unit_normalize(taps_p[k]) - _unit_normalize(taps_g[k])
        wd = weights[f"lin{k}_w"][None, :, None, None] * (d * d)
        total = total + jnp.mean(jnp.sum(wd, axis=1))  # 1x1 conv + avg pool
    return total
