"""Mesh extraction from a trained density field (marching cubes).

Parity with the reference test.ipynb cell 5 (PyMCubes + trimesh export of
``model.density`` on a dense grid, sigma threshold 20). mcubes/trimesh are
optional; without them we fall back to a pure-NumPy marching-cubes-lite
(vertex-per-surface-crossing point cloud + OBJ dump) so the capability exists
in every environment.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def density_on_grid(model, params, resolution=256, chunk=2 ** 18,
                    bound=None):
    """Evaluate sigma on a dense grid: (R, R, R) float32."""
    bound = bound if bound is not None else model.cfg.scale
    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    out = np.empty((resolution ** 3,), np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    for i in range(0, grid.shape[0], chunk):
        out[i:i + chunk] = np.asarray(
            model.density(params, jnp.asarray(grid[i:i + chunk])))
    return out.reshape(resolution, resolution, resolution)


def extract_mesh(model, params, resolution=256, sigma_threshold=20.0,
                 out_path=None, bound=None):
    """Marching-cubes mesh (or point cloud fallback) of the sigma isosurface.

    Returns (vertices, triangles) — triangles is None in the fallback path.
    """
    sigma = density_on_grid(model, params, resolution, bound=bound)
    bound = bound if bound is not None else model.cfg.scale
    scale = 2 * bound / (resolution - 1)

    try:
        import mcubes
        verts, tris = mcubes.marching_cubes(sigma, sigma_threshold)
        verts = verts * scale - bound
    except ImportError:
        # fallback: surface-crossing voxel centers as a point cloud
        occ = sigma > sigma_threshold
        boundary = occ & ~(
            np.roll(occ, 1, 0) & np.roll(occ, -1, 0)
            & np.roll(occ, 1, 1) & np.roll(occ, -1, 1)
            & np.roll(occ, 1, 2) & np.roll(occ, -1, 2))
        idx = np.argwhere(boundary)
        verts = idx.astype(np.float32) * scale - bound
        tris = None

    if out_path is not None:
        if tris is not None:
            try:
                import trimesh
                trimesh.Trimesh(verts, tris).export(out_path)
                return verts, tris
            except ImportError:
                pass
        with open(out_path, "w") as f:  # minimal OBJ
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            if tris is not None:
                for t in tris:
                    f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
    return verts, tris
