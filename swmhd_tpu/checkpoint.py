"""Checkpoint / resume — the recovery story the reference lacks (SURVEY §5).

Serialises the full :class:`State` pytree + grid metadata to a single
``.npz``; :func:`restore` rebuilds the state and validates the grid. The
nearest reference analog is the JLD2 field snapshots that *could* seed a
restart but never do (SWMHD_example.jl:81-84).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .models.state import State, Clock

_FORMAT_VERSION = 1


def save(path: str, state: State, grid: Grid) -> None:
    state = jax.device_get(state)
    meta = {
        "version": _FORMAT_VERSION,
        "grid": {
            "Nx": grid.Nx, "Ny": grid.Ny, "Lx": grid.Lx, "Ly": grid.Ly,
            "x0": grid.x0, "y0": grid.y0,
            "topology_x": grid.topology_x, "topology_y": grid.topology_y,
            "dtype_name": grid.dtype_name,
        },
    }
    tmp = path + ".tmp"
    np.savez(tmp if tmp.endswith(".npz") else tmp,
             h=np.asarray(state.h), u=np.asarray(state.u),
             v=np.asarray(state.v), A=np.asarray(state.A),
             time=np.asarray(state.clock.time),
             iteration=np.asarray(state.clock.iteration),
             meta=json.dumps(meta))
    # numpy appends .npz to the temp name
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def restore(path: str, grid: Grid | None = None) -> State:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version {meta['version']}")
        if grid is not None:
            gm = meta["grid"]
            if (gm["Nx"], gm["Ny"]) != (grid.Nx, grid.Ny):
                raise ValueError(
                    f"checkpoint grid {gm['Nx']}x{gm['Ny']} != "
                    f"model grid {grid.Nx}x{grid.Ny}")
        dtype = meta["grid"]["dtype_name"] if grid is None else grid.dtype
        return State(
            h=jnp.asarray(z["h"], dtype), u=jnp.asarray(z["u"], dtype),
            v=jnp.asarray(z["v"], dtype), A=jnp.asarray(z["A"], dtype),
            clock=Clock(time=jnp.asarray(z["time"], dtype),
                        iteration=jnp.asarray(z["iteration"], jnp.int32)))


def grid_from_checkpoint(path: str) -> Grid:
    with np.load(path, allow_pickle=False) as z:
        gm = json.loads(str(z["meta"]))["grid"]
    return Grid(**gm)
