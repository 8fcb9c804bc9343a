#!/usr/bin/env python
"""Interactive viewer on a trained checkpoint — parity with reference
show_gui.py (OrbitCamera + dearpygui frame loop). dearpygui is optional in
this environment; without it (or without a display), --offline renders an
orbit sequence to PNG/MP4 instead, exercising the same render path
(test_time, T_threshold=1e-2, max_samples=100).
"""
import argparse
import os
import time

import numpy as np

from mfnerf_tpu.opt import get_opts
from mfnerf_tpu.datasets import dataset_dict
from mfnerf_tpu.datasets.ray_utils import get_ray_directions, get_rays
from mfnerf_tpu.models.ngp import NGP, NGPConfig, OccupancyState
from mfnerf_tpu.models.rendering import RenderConfig, render_test
from mfnerf_tpu.train import NeRFSystem, depth2img
from mfnerf_tpu.utils.ckpt import load_ckpt


def _rotvec_to_mat(v):
    angle = np.linalg.norm(v)
    if angle < 1e-12:
        return np.eye(3)
    axis = v / angle
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


class OrbitCamera:
    """Parity: reference show_gui.py:19-51."""

    def __init__(self, K, img_wh, r):
        self.K = K
        self.W, self.H = img_wh
        self.radius = r
        self.center = np.zeros(3)
        self.rot = np.eye(3)

    @property
    def pose(self):
        res = np.eye(4)
        res[2, 3] -= self.radius
        rot = np.eye(4)
        rot[:3, :3] = self.rot
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    def orbit(self, dx, dy):
        rotvec_x = self.rot[:, 1] * np.radians(0.05 * dx)
        rotvec_y = self.rot[:, 0] * np.radians(-0.05 * dy)
        self.rot = _rotvec_to_mat(rotvec_y) @ _rotvec_to_mat(rotvec_x) @ \
            self.rot

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0):
        self.center += 1e-4 * self.rot @ np.array([dx, dy, dz])


class NGPGUI:
    """Render a trained field from an orbit camera (GUI or offline)."""

    def __init__(self, hparams, K, img_wh, radius=2.5, guided=True):
        import jax
        self.hparams = hparams
        # interactive frames tolerate the guided pass's silhouette
        # approximation (reference GUI itself renders at T_threshold=1e-2)
        self.guided = guided
        system = NeRFSystem(hparams)
        self.model = system.model
        self.params = system.model.init(jax.random.PRNGKey(0))
        self.occ = OccupancyState.create(system.model_cfg)
        loaded = load_ckpt(hparams.ckpt_path,
                           like={"params": self.params, "occ": self.occ})
        self.params = loaded["params"]
        if "occ" in loaded and not isinstance(loaded["occ"], dict):
            self.occ = loaded["occ"].refresh_coarse(system.model_cfg)
        exp_step_factor = (1 / 256 if hparams.dataset_name
                           in ["colmap", "nerfpp"] else 0.0)
        self.rcfg = RenderConfig(
            exp_step_factor=exp_step_factor, T_threshold=1e-2,
            max_samples=100, s_max_test=64,
            test_chunk=min(hparams.test_chunk, img_wh[0] * img_wh[1]))
        self.cam = OrbitCamera(K, img_wh, r=radius)
        self.W, self.H = img_wh
        self.dt = 0.0
        self.mean_samples = 0.0
        self.img_mode = 0
        # live exposure for HDR-NeRF checkpoints (rgb_act == 'None'); the
        # dpg slider writes it each frame (reference show_gui.py:86)
        self.exposure = 0.2 if hparams.use_exposure else None

    def render_cam(self, cam):
        import jax.numpy as jnp
        t = time.time()
        directions = get_ray_directions(cam.H, cam.W, cam.K)
        rays_o, rays_d = get_rays(jnp.asarray(directions),
                                  jnp.asarray(cam.pose[:3], jnp.float32))
        results = render_test(self.model, self.params, self.occ,
                              rays_o, rays_d, self.rcfg,
                              camera=(cam.K, cam.pose[:3], (cam.W, cam.H)),
                              guided=self.guided, exposure=self.exposure)
        rgb = np.asarray(results["rgb"]).reshape(self.H, self.W, 3)
        depth = np.asarray(results["depth"]).reshape(self.H, self.W)
        self.dt = time.time() - t
        self.mean_samples = float(results["total_samples"]) \
            / (self.W * self.H)
        if self.img_mode == 0:
            return rgb
        return depth2img(depth).astype(np.float32) / 255.0

    # ------------------------------------------------------------- offline
    def render_orbit(self, out_dir, n_frames=30):
        os.makedirs(out_dir, exist_ok=True)
        import imageio.v2 as imageio
        frames = []
        for i in range(n_frames):
            self.cam.orbit(600, 0)  # ~30 deg per frame
            img = (np.clip(self.render_cam(self.cam), 0, 1)
                   * 255).astype(np.uint8)
            imageio.imsave(os.path.join(out_dir, f"orbit_{i:03d}.png"), img)
            frames.append(img)
            print(f"frame {i}: {self.dt * 1e3:.0f} ms, "
                  f"{self.mean_samples:.1f} samples/ray", flush=True)
        try:
            imageio.mimsave(os.path.join(out_dir, "orbit.mp4"), frames,
                            fps=10)
        except Exception as e:
            print(f"mp4 skipped: {e}")

    # ----------------------------------------------------------------- dpg
    def run_dpg(self):
        import dearpygui.dearpygui as dpg

        self.render_buffer = np.ones((self.H, self.W, 3), np.float32)
        dpg.create_context()
        with dpg.texture_registry():
            dpg.add_raw_texture(self.W, self.H, self.render_buffer,
                                format=dpg.mvFormat_Float_rgb,
                                tag="_texture")
        with dpg.window(tag="_primary", width=self.W, height=self.H):
            dpg.add_image("_texture")
        with dpg.window(label="Control", width=200):
            dpg.add_slider_float(label="exposure", default_value=0.2,
                                 min_value=1 / 60, max_value=32,
                                 tag="_exposure")
            dpg.add_button(label="show depth",
                           callback=lambda: setattr(
                               self, "img_mode", 1 - self.img_mode))
            dpg.add_text("", tag="_log_time")

        def cb_drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])

        def cb_wheel(sender, app_data):
            self.cam.scale(app_data)

        def cb_pan(sender, app_data):
            self.cam.pan(app_data[1], app_data[2])

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                       callback=cb_drag)
            dpg.add_mouse_wheel_handler(callback=cb_wheel)
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Middle,
                                       callback=cb_pan)
        dpg.create_viewport(title="mfnerf_tpu", width=self.W,
                            height=self.H, resizable=False)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.set_primary_window("_primary", True)
        while dpg.is_dearpygui_running():
            if self.exposure is not None:  # live HDR exposure slider
                self.exposure = float(dpg.get_value("_exposure"))
            self.render_buffer[:] = self.render_cam(self.cam)
            dpg.set_value("_texture", self.render_buffer)
            dpg.set_value("_log_time",
                          f"{self.dt * 1e3:.1f} ms "
                          f"({self.mean_samples:.1f} samp/ray)")
            dpg.render_dearpygui_frame()
        dpg.destroy_context()


if __name__ == "__main__":
    hparams = get_opts()
    if not hparams.ckpt_path:
        raise ValueError("--ckpt_path is required for the viewer")
    dataset = dataset_dict[hparams.dataset_name](
        root_dir=hparams.root_dir, downsample=hparams.downsample,
        read_meta=False)
    gui = NGPGUI(hparams, dataset.K, dataset.img_wh)
    try:
        import dearpygui.dearpygui  # noqa: F401
        gui.run_dpg()
    except ImportError:
        print("dearpygui unavailable -> offline orbit render")
        gui.render_orbit(f"results/{hparams.dataset_name}/"
                         f"{hparams.exp_name}/gui")
