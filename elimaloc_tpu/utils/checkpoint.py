"""Checkpoint / resume: persistent map tensors and pipeline state.

The reference persists nothing but the input PCD map (SURVEY.md §5.4); its
state is rebuilt live. Here the one-time map build (the minutes-scale
precompute, pcm_matching.cpp:86-101) is cached to disk, and the full
pipeline state pytree can be saved so a replay resumes mid-log.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..map.builder import BuiltMap


def save_built_map(path: str, built: BuiltMap) -> None:
    data = {
        k: v
        for k, v in dataclasses.asdict(built).items()
        if isinstance(v, np.ndarray)
    }
    data["_meta"] = np.array(
        [built.voxel_size, built.max_points_per_voxel, built.table_size,
         built.max_probe]
    )
    np.savez_compressed(path, **data)


def load_built_map(path: str) -> BuiltMap:
    z = np.load(path)
    voxel_size, max_pts, table_size, max_probe = z["_meta"]
    return BuiltMap(
        voxel_size=float(voxel_size),
        max_points_per_voxel=int(max_pts),
        vox_coords=z["vox_coords"],
        points=z["points"],
        counts=z["counts"],
        vox_mean=z["vox_mean"],
        vox_cov=z["vox_cov"],
        table=z["table"],
        table_fp=z["table_fp"],
        table_size=int(table_size),
        max_probe=int(max_probe),
        point_cov=z["point_cov"] if "point_cov" in z else None,
        point_cov_mean=z["point_cov_mean"] if "point_cov_mean" in z else None,
    )


def save_state(path: str, state) -> None:
    """Persist any pytree of arrays (PipelineState / EkfState) as npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path,
        _treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_state(path: str, like):
    """Load a pytree saved by save_state into the structure of ``like``."""
    z = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = [
        np.asarray(z[f"leaf_{i}"], dtype=np.asarray(l).dtype)
        for i, l in enumerate(leaves_like)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
