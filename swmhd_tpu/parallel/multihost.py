"""Multi-host execution (SURVEY §7.2 M5; reference has nothing multi-node).

On a multi-host TPU pod slice every host runs the same program;
:func:`initialize` wires them into one JAX runtime over DCN, and the
existing :class:`~swmhd_tpu.parallel.decomposition.DomainDecomposition`
then spans all hosts' devices through the same ``Mesh`` + ``ppermute``
machinery — XLA routes neighbor exchanges over ICI within a slice and DCN
across slices. The mesh factory below orders devices so that ICI-adjacent
chips land on adjacent mesh coordinates (jax.experimental.mesh_utils),
keeping the 4-neighbor halo traffic off DCN wherever the torus allows.

Host-local I/O: each host owns the shards resident on its devices;
:func:`process_local_slab` gives the global index range a host should
write, so FieldWriter outputs can be sharded per host without gathers.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from .decomposition import AXIS_X, AXIS_Y


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with TPU auto-detection defaults.

    On Cloud TPU pods all arguments are discovered from the metadata
    server; pass them explicitly for manual/DCN setups."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_pod_mesh(shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """A 2-D ('x','y') mesh over ALL processes' devices with ICI-aware
    device ordering (mesh_utils.create_device_mesh)."""
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    if shape is None:
        px = int(math.isqrt(n))
        while n % px:
            px -= 1
        shape = (px, n // px)
    dev_array = mesh_utils.create_device_mesh(shape)
    return Mesh(dev_array, (AXIS_X, AXIS_Y))


def process_local_slab(mesh: Mesh, Nx: int, Ny: int):
    """((x0, x1), (y0, y1)) global index bounds of the region whose shards
    live on this process — the slab this host writes during sharded I/O."""
    nx = Nx // mesh.shape[AXIS_X]
    ny = Ny // mesh.shape[AXIS_Y]
    dev = np.asarray(mesh.devices)
    mine = np.array([[d.process_index == jax.process_index()
                      for d in row] for row in dev])
    xs, ys = np.where(mine)
    return ((int(xs.min()) * nx, (int(xs.max()) + 1) * nx),
            (int(ys.min()) * ny, (int(ys.max()) + 1) * ny))
