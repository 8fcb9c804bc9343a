"""Checkpoint save/load/slim for the JAX pipeline.

Functional parity with reference utils.py:4-39 (extract_model_state_dict /
load_ckpt / slim_ckpt): full checkpoints carry model params, occupancy
buffers, optimizer state and step; "slim" checkpoints drop the density grid,
optimizer state and (optionally) poses but KEEP the density bitfield — it is
required for test-time marching, exactly like the reference's slim ckpt.

Format: a single .npz of flattened pytree leaves + a JSON-encoded treedef
manifest (portable, no torch/pickle).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def _path_entry(p):
    for attr in ("name", "key", "idx"):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = {}
    for path, leaf in flat[0]:
        key = "/".join(_path_entry(p) for p in path)
        leaves[key] = np.asarray(leaf)
    return leaves


def save_ckpt(path, params, occ=None, opt_state=None, step=0, poses=None,
              extra=None):
    """Save a checkpoint. occ/opt_state/poses optional (None -> omitted)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blobs = {}
    manifest = {"step": int(step), "sections": []}
    for name, tree in [("params", params), ("occ", occ),
                       ("opt_state", opt_state), ("poses", poses),
                       ("extra", extra)]:
        if tree is None:
            continue
        leaves = _flatten_with_paths(tree)
        manifest["sections"].append(name)
        manifest[name + "_keys"] = sorted(leaves)
        for k, v in leaves.items():
            blobs[f"{name}::{k}"] = v
    blobs["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez(path, **blobs)


def load_ckpt(path, like=None):
    """Load a checkpoint into a dict of sections.

    Args:
        like: optional dict {section: template_pytree}; sections present in
            both are unflattened into the template's structure (leaves are
            matched by flattened path). Without a template, returns flat
            {section: {path: ndarray}} dicts.
    """
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    out = {"step": manifest["step"]}
    for name in manifest["sections"]:
        flat = {k.split("::", 1)[1]: data[k] for k in data.files
                if k.startswith(name + "::")}
        if like is not None and name in like and like[name] is not None:
            template = like[name]
            tpl_flat = _flatten_with_paths(template)
            leaves_sorted = []
            paths, treedef = jax.tree_util.tree_flatten_with_path(template)
            for path, leaf in paths:
                key = "/".join(_path_entry(p) for p in path)
                if key in flat:
                    arr = flat[key]
                    if arr.shape != np.asarray(leaf).shape:
                        raise ValueError(
                            f"shape mismatch for {name}/{key}: ckpt "
                            f"{arr.shape} vs model {np.asarray(leaf).shape}")
                    leaves_sorted.append(jnp.asarray(arr))
                else:  # partial (non-strict) load, reference utils.py:21-26
                    leaves_sorted.append(leaf)
            out[name] = jax.tree_util.tree_unflatten(treedef, leaves_sorted)
        else:
            out[name] = flat
    return out


def extract_model_state(path):
    """Return the raw flat {path: ndarray} params dict of a checkpoint."""
    return load_ckpt(path)["params"]


def slim_ckpt(path, out_path, save_poses=False):
    """Strip a full checkpoint for distribution.

    Drops: optimizer state, density_grid, count_grid (and poses unless
    save_poses). Keeps: params + density_bitfield. Parity: utils.py:29-39.
    """
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    keep = {}
    sections = []
    for k in data.files:
        if k == "__manifest__":
            continue
        name, sub = k.split("::", 1)
        if name == "opt_state":
            continue
        if name == "occ" and ("density_grid" in sub or "count_grid" in sub):
            continue
        if name == "poses" and not save_poses:
            continue
        keep[k] = data[k]
        if name not in sections:
            sections.append(name)
    new_manifest = {"step": manifest["step"], "sections": sections}
    for name in sections:
        new_manifest[name + "_keys"] = sorted(
            k.split("::", 1)[1] for k in keep if k.startswith(name + "::"))
    keep["__manifest__"] = np.frombuffer(
        json.dumps(new_manifest).encode(), dtype=np.uint8)
    np.savez(out_path, **keep)
