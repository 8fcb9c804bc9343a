"""Camera-ray and pose utilities (NumPy for loaders, jnp inside jit).

Parity with reference datasets/ray_utils.py: camera coords are
[right down front]; ray directions pass through pixel centers (u+0.5);
directions are NOT normalized (marching distances are measured in units of
the unnormalized direction, exactly like the reference pipeline).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_ray_directions(H, W, K, random=False, rng=None, flatten=True,
                       return_uv=False):
    """Ray directions for every pixel in camera coordinates [right down front].

    Parity: reference ray_utils.py:8-42.
    """
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    K = np.asarray(K, np.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if random:
        rng = rng or np.random.default_rng()
        du = rng.random(u.shape, dtype=np.float32)
        dv = rng.random(v.shape, dtype=np.float32)
    else:
        du = dv = 0.5
    directions = np.stack(
        [(u - cx + du) / fx, (v - cy + dv) / fy, np.ones_like(u)], -1)
    grid = np.stack([u, v], -1)
    if flatten:
        directions = directions.reshape(-1, 3)
        grid = grid.reshape(-1, 2)
    if return_uv:
        return directions.astype(np.float32), grid
    return directions.astype(np.float32)


def get_rays(directions, c2w):
    """Camera-space directions + c2w pose(s) -> world rays (jnp, jit-safe).

    Parity: reference ray_utils.py:45-70.

    Args:
        directions: (N, 3) camera-coordinate directions.
        c2w: (3, 4) or (N, 3, 4) camera-to-world matrices.
    Returns:
        rays_o, rays_d: (N, 3) world origins/directions (unnormalized).
    """
    directions = jnp.asarray(directions, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    if c2w.ndim == 2:
        rays_d = directions @ c2w[:, :3].T
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nc,nbc->nb", directions, c2w[..., :3])
        rays_o = c2w[..., 3]
    return rays_o, rays_d


def axisangle_to_R(v):
    """Axis-angle -> rotation matrix (Rodrigues), jit-safe.

    Parity: reference ray_utils.py:73-100 (pose-refinement path).
    """
    v = jnp.asarray(v, jnp.float32)
    squeeze = v.ndim == 1
    if squeeze:
        v = v[None]
    zero = jnp.zeros_like(v[:, :1])
    skew = jnp.stack([
        jnp.concatenate([zero, -v[:, 2:3], v[:, 1:2]], 1),
        jnp.concatenate([v[:, 2:3], zero, -v[:, 0:1]], 1),
        jnp.concatenate([-v[:, 1:2], v[:, 0:1], zero], 1),
    ], axis=1)
    # Gradient-safe norm: jnp.linalg.norm has a NaN gradient at v = 0, and
    # the pose-refinement path (--optimize_ext) STARTS dR at exactly zero —
    # one backward pass through the naive formula poisons training with
    # NaNs. Clamping the squared norm keeps every branch (taken or not)
    # NaN-free under autodiff; at theta -> 0 the constant branches give the
    # correct first-order gradient (d r / d v ~ skew'(dv) via the skew
    # term; sinc'(0) = 0).
    sq = jnp.sum(v * v, axis=1)[:, None, None]
    norm_v = jnp.sqrt(jnp.maximum(sq, 1e-14))
    small = sq < 1e-14
    sinc = jnp.where(small, 1.0, jnp.sin(norm_v) / norm_v)
    cosc = jnp.where(small, 0.5, (1 - jnp.cos(norm_v))
                     / jnp.maximum(sq, 1e-14))
    eye = jnp.eye(3)
    r = eye + sinc * skew + cosc * (skew @ skew)
    return r[0] if squeeze else r


def normalize(v):
    return v / np.linalg.norm(v)


def average_poses(poses, pts3d=None):
    """Average pose used for recentering. Parity: ray_utils.py:108-147."""
    center = pts3d.mean(0) if pts3d is not None else poses[..., 3].mean(0)
    z = normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses, pts3d=None):
    """Recenter poses (and points) about the average pose.

    Parity: ray_utils.py:150-178.
    """
    pose_avg = average_poses(poses, pts3d)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    pose_avg_inv = np.linalg.inv(pose_avg_homo)
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    poses_centered = (pose_avg_inv @ poses_homo)[:, :3]
    if pts3d is not None:
        pts3d_centered = pts3d @ pose_avg_inv[:3, :3].T + pose_avg_inv[:3, 3]
        return poses_centered, pts3d_centered
    return poses_centered


def create_spheric_poses(radius, mean_h, n_poses=120):
    """Circular test-trajectory poses around +z. Parity: ray_utils.py:180-215."""
    def spheric_pose(theta, phi, radius):
        trans_t = lambda t: np.array([[1, 0, 0, 0],
                                      [0, 1, 0, 2 * mean_h],
                                      [0, 0, 1, -t]], dtype=np.float64)
        rot_phi = lambda p: np.array([[1, 0, 0],
                                      [0, np.cos(p), -np.sin(p)],
                                      [0, np.sin(p), np.cos(p)]])
        rot_theta = lambda th: np.array([[np.cos(th), 0, -np.sin(th)],
                                         [0, 1, 0],
                                         [np.sin(th), 0, np.cos(th)]])
        c2w = rot_theta(theta) @ rot_phi(phi) @ trans_t(radius)
        c2w = np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0.]]) @ c2w
        return c2w

    return np.stack([spheric_pose(th, -np.pi / 12, radius)
                     for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]])
