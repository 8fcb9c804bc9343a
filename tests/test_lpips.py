"""LPIPS(VGG16) implementation tests.

Pretrained weights are unavailable offline, so correctness is established
structurally: the JAX network is compared against an independently
hand-written torch replica of the official LPIPS architecture (ScalingLayer
-> VGG16 features -> channel-unit-normalize -> squared diff -> non-negative
1x1 heads -> spatial mean -> sum) using identical random weights. Any wiring
mistake (conv padding, pool placement, tap location, normalization eps,
head application) shows up as a numeric mismatch.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mfnerf_tpu.utils.lpips import (canonical_weight_shapes,  # noqa: E402
                                    lpips_from_weights,
                                    random_lpips_weights)


def _np_weights(seed=0):
    key = jax.random.PRNGKey(seed)
    w = random_lpips_weights(key)
    return {k: np.asarray(v) for k, v in w.items()}


def test_weight_shapes_match_vgg16():
    shapes = canonical_weight_shapes()
    # 13 convs + 5 heads
    assert sum(1 for k in shapes if k.endswith("_w") and "conv" in k) == 13
    assert sum(1 for k in shapes if k.startswith("lin")) == 5
    # VGG16 conv channel progression
    assert shapes["conv0_w"] == (64, 3, 3, 3)
    assert shapes["conv12_w"] == (512, 512, 3, 3)
    assert shapes["lin0_w"] == (64,)
    assert shapes["lin4_w"] == (512,)


def test_identity_is_zero_and_symmetry():
    w = {k: jnp.asarray(v) for k, v in _np_weights().items()}
    rng = np.random.default_rng(0)
    a = rng.random((33, 37, 3)).astype(np.float32)
    b = rng.random((33, 37, 3)).astype(np.float32)
    assert float(lpips_from_weights(w, a, a)) == pytest.approx(0.0, abs=1e-6)
    dab = float(lpips_from_weights(w, a, b))
    dba = float(lpips_from_weights(w, b, a))
    assert dab > 0
    assert dab == pytest.approx(dba, rel=1e-5)


def test_matches_torch_replica():
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    weights = _np_weights(seed=3)

    class TorchLPIPS(nn.Module):
        """Independent replica of official LPIPS(VGG16), eval mode."""

        BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

        def __init__(self, w):
            super().__init__()
            self.convs = nn.ModuleList()
            c_in, i = 3, 0
            for c_out, n in self.BLOCKS:
                for _ in range(n):
                    conv = nn.Conv2d(c_in, c_out, 3, padding=1)
                    conv.weight.data = torch.from_numpy(w[f"conv{i}_w"])
                    conv.bias.data = torch.from_numpy(w[f"conv{i}_b"])
                    self.convs.append(conv)
                    c_in = c_out
                    i += 1
            self.lins = [torch.from_numpy(w[f"lin{k}_w"]) for k in range(5)]
            self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
            self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def taps(self, x):
            out, i = [], 0
            for bi, (_, n) in enumerate(self.BLOCKS):
                for _ in range(n):
                    x = F.relu(self.convs[i](x))
                    i += 1
                out.append(x)
                if bi < len(self.BLOCKS) - 1:
                    x = F.max_pool2d(x, 2, 2)
            return out

        def forward(self, im0, im1):  # images (H,W,3) in [0,1]
            def prep(im):
                x = torch.from_numpy(im).permute(2, 0, 1)[None] * 2 - 1
                return (x - self.shift) / self.scale

            def unit(f):
                return f / (f.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

            t0, t1 = self.taps(prep(im0)), self.taps(prep(im1))
            total = 0.0
            for k in range(5):
                d = (unit(t0[k]) - unit(t1[k])) ** 2
                wd = self.lins[k].view(1, -1, 1, 1) * d
                total = total + wd.sum(1).mean()
            return total

    rng = np.random.default_rng(7)
    a = rng.random((48, 40, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(np.float32)

    with torch.no_grad():
        ref = float(TorchLPIPS(weights)(a, b))
    got = float(lpips_from_weights(
        {k: jnp.asarray(v) for k, v in weights.items()}, a, b))
    assert got == pytest.approx(ref, rel=1e-4, abs=1e-6)
