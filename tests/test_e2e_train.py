"""End-to-end: train the full pipeline on a procedural scene and check the
test-view PSNR rises well above the untrained baseline. This is the
"minimum end-to-end slice" of SURVEY §7.2 phase 5, runnable on CPU."""
import argparse

import numpy as np
import jax
import pytest

from mfnerf_tpu.datasets.memory import MemoryDataset
from mfnerf_tpu.train import NeRFSystem
from mfnerf_tpu.utils.procedural import make_scene
from mfnerf_tpu.utils.metrics import psnr


def _hparams(**kw):
    d = dict(root_dir="<memory>", dataset_name="nsvf", split="train",
             downsample=1.0, scale=0.5, use_exposure=False,
             distortion_loss_w=0.0, batch_size=1024,
             ray_sampling_strategy="all_images", num_epochs=1, num_gpus=1,
             lr=1e-2, optimize_ext=False, random_bg=False, eval_lpips=False,
             val_only=False, no_save_test=True, exp_name="test",
             ckpt_path=None, weight_path=None, grid="Hash", L=8, F=2, T=15,
             N_min=16, N_max=128, N_tables=1, rgb_channels=32, rgb_layers=2,
             seed=1337, s_max_train=64, s_max_test=64, test_chunk=4096,
             # 400 steps: 256 per-step (grid warmup) + 144 through the fused
             # multi-step runner, so this also gates the fused path
             lpips_weights=None, profile=False, steps_per_epoch=400,
             grid_size=64, max_samples=256)
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture(scope="module")
def trained_system():
    scene = make_scene(n_train=12, n_test=2, wh=64, seed=0)
    hp = _hparams()
    system = NeRFSystem(hp)
    system.setup(MemoryDataset.from_scene(scene, "train"),
                 MemoryDataset.from_scene(scene, "test"))
    system.configure(jax.random.PRNGKey(0))
    system._scene = scene
    return system


def _test_view_psnr(system):
    from mfnerf_tpu.datasets.ray_utils import get_rays
    from mfnerf_tpu.models.rendering import render_test
    import jax.numpy as jnp
    scene = system._scene
    batch = system.test_dataset[0]
    rays_o, rays_d = get_rays(jnp.asarray(system.test_dataset.directions),
                              jnp.asarray(batch["pose"]))
    res = render_test(system.model, system.params, system.occ, rays_o,
                      rays_d, system.rcfg)
    return float(psnr(res["rgb"], jnp.asarray(batch["rgb"])))


def test_overfit_procedural_scene(trained_system):
    system = trained_system
    # baseline PSNR of the untrained field (after a warmup grid update only)
    system.occ = system._update_grid(system.params, system.occ,
                                     jax.random.PRNGKey(9), True, False)
    psnr_before = _test_view_psnr(system)

    system.fit()
    psnr_after = _test_view_psnr(system)
    print(f"PSNR before {psnr_before:.2f} -> after {psnr_after:.2f}")
    assert psnr_after > psnr_before + 8.0
    assert psnr_after > 20.0


def test_checkpoint_roundtrip(tmp_path, trained_system):
    import jax.numpy as jnp
    from mfnerf_tpu.utils.ckpt import save_ckpt, load_ckpt, slim_ckpt
    system = trained_system
    path = str(tmp_path / "ckpt.npz")
    save_ckpt(path, system.params, occ=system.occ,
              opt_state=system.opt_state, step=system.global_step)
    loaded = load_ckpt(path, like={"params": system.params,
                                   "occ": system.occ})
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["hash_table"]),
        np.asarray(system.params["hash_table"]))
    assert loaded["step"] == system.global_step

    slim_path = str(tmp_path / "slim.npz")
    slim_ckpt(path, slim_path)
    slim = load_ckpt(slim_path)
    # slim keeps params + bitfield, drops grids and optimizer state
    assert "params" in slim and "occ" in slim
    assert any("density_bitfield" in k for k in slim["occ"])
    assert not any("density_grid" in k for k in slim["occ"])
    assert "opt_state" not in slim

    # the slim checkpoint renders the same image
    params2 = load_ckpt(slim_path, like={"params": system.params})["params"]
    np.testing.assert_allclose(np.asarray(params2["hash_table"]),
                               np.asarray(system.params["hash_table"]))
