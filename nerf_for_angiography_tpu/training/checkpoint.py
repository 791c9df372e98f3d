"""Checkpointing: orbax resume state + reference-compatible artifacts.

The reference only ever *saves* (CPPN.save -> .pth dicts of
{version, parameters, training_information, model}, run_nerf_acc.py:382,426;
occupancy grids as VTK, :359-367) and has **no training resume path**
(SURVEY.md §5). Here:
  * full resume-on-preemption state {params, opt_state, grids, step, key,
    best} via orbax;
  * ``save_model`` writes the same {version, parameters,
    training_information, model} bundle as an .npz (torch-free), and grids
    export as VTK cell-data files the reference's evaluation layer knows how
    to restore (visualization.py:158-162).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..ops.occupancy import OccupancyGrid
from ..utils.vtk import read_vtk, write_structured_points

MODEL_VERSION = "v0.10-tpu"


# --- reference-style model bundles (highmodel / coarsemodel) ---------------


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    out = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_model(path: str, model_definition: dict, params, training_information: dict | None = None) -> None:
    """CPPN.save equivalent (model/CPPN.py:261-276): bundle of
    {version, parameters, training_information, model-state}."""
    flat = _flatten(jax.tree.map(np.asarray, params))
    meta = {
        "version": MODEL_VERSION,
        "parameters": model_definition,
        "training_information": training_information or {},
        "param_keys": list(flat.keys()),
    }
    np.savez(path, __meta__=json.dumps(meta), **flat)


def load_model(path: str) -> tuple[dict, Any]:
    """Returns (meta dict, params pytree)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in meta["param_keys"]}
    return meta, _unflatten(flat)


# --- occupancy grid VTK export/restore --------------------------------------


def save_grid_vtk(path: str, grid: OccupancyGrid) -> None:
    """coarsegrid.vtk-style export: binary occupancy as int CELL_DATA on a
    (res+1)^3-point uniform grid (run_nerf_acc.py:200-204,359-367)."""
    write_structured_points(
        path,
        np.asarray(grid.binary).astype(np.int32),
        origin=tuple(np.asarray(grid.aabb[:3])),
        spacing=tuple(
            (np.asarray(grid.aabb[3:]) - np.asarray(grid.aabb[:3]))
            / grid.resolution
        ),
        name="values",
        cell=True,
        binary=True,  # 128^3 cells; ASCII is ~100x slower to write
    )


def load_grid_vtk(path: str, aabb) -> OccupancyGrid:
    """Restore a binary occupancy grid from VTK (visualization.py:158-162)."""
    import jax.numpy as jnp

    from ..ops.occupancy import with_packed

    g = read_vtk(path)
    binary = g.scalars_3d("values", cell=True).astype(bool)
    return with_packed(OccupancyGrid(
        occs=jnp.asarray(binary, jnp.float32),
        binary=jnp.asarray(binary),
        aabb=jnp.asarray(aabb, jnp.float32),
    ))


# --- orbax resume state -------------------------------------------------------


class CheckpointManager:
    """Periodic full-state checkpointing for resume-on-preemption."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_like):
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._mgr.close()
