"""Compile-level weak-scaling evidence across abstract TPU topologies (r5).

Real multi-chip wall-clock scaling is unmeasurable on this 1-chip host
(SCALING_r04's CPU-mesh rows measure tooling overhead by construction).
What CAN be produced without hardware is the compile-level counterpart:
AOT-compile the sharded production step for a LADDER of abstract v5e
topologies at fixed per-chip work (weak scaling) and record, per rung:

  - that the identical program compiles at every scale (the structural
    claim the 8-device dryrun makes, now at real topology sizes);
  - per-device memory (arguments / temps) — flat curves = no hidden
    per-chip blowup with mesh size;
  - collective counts and the scheduled-HLO overlap metrics
    (benchmarks/overlap_aot.parse_schedule) — how the compiler's
    comm/compute scheduling changes with scale.

Writes SCALING_AOT_r05.json.

Usage: JAX_PLATFORMS=cpu python benchmarks/scaling_aot.py [--local 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp
import numpy as np

from overlap_aot import parse_schedule

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

# v5e topology rungs: (name, mesh shape). Per-chip tile is fixed at
# --local^2 (weak scaling); 4x8 spans 4 hosts, 8x8 a 64-chip pod slice.
RUNGS = [
    ("v5e:2x2", (2, 2)),
    ("v5e:2x4", (2, 4)),
    ("v5e:4x8", (4, 8)),
    ("v5e:8x8", (8, 8)),
]


def compile_rung(topology, mesh_shape, local):
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from swmhd_tpu.parallel.decomposition import (DomainDecomposition,
                                                  AXIS_X, AXIS_Y)
    from swmhd_tpu.models.state import State, Clock

    topo = topologies.get_topology_desc(topology, "tpu")
    devs = np.array(topo.devices).reshape(mesh_shape)
    mesh = Mesh(devs, (AXIS_X, AXIS_Y))
    Nx, Ny = local * mesh_shape[0], local * mesh_shape[1]
    from swmhd_tpu import (Grid, ShallowWaterModel, FPlane,
                           jacobian_lorentz_forcing)
    g = Grid.regular(Nx, Ny, (-5.0, 5.0), (-5.0, 5.0),
                     dtype=jnp.float32)
    model = ShallowWaterModel(grid=g, coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    dd = DomainDecomposition(model, mesh, halo=8)
    fn = dd.step_fn(0.001, 1)

    sh_field = NamedSharding(mesh, P(AXIS_X, AXIS_Y))
    sh_scalar = NamedSharding(mesh, P())
    field = jax.ShapeDtypeStruct((Nx, Ny), jnp.float32, sharding=sh_field)
    scalar = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh_scalar)
    it = jax.ShapeDtypeStruct((), jnp.int32, sharding=sh_scalar)
    state = State(h=field, u=field, v=field, A=field,
                  clock=Clock(time=scalar, iteration=it))
    t0 = time.time()
    compiled = fn.lower(state).compile()
    compile_s = time.time() - t0
    mem = compiled.memory_analysis()
    sched = parse_schedule(compiled.as_text())
    n_chips = mesh_shape[0] * mesh_shape[1]
    return {
        "topology": topology,
        "n_chips": n_chips,
        "n_processes": len({d.process_index for d in topo.devices}),
        "global_grid": [Nx, Ny],
        "tile_per_chip": [local, local],
        "compile_s": round(compile_s, 1),
        "per_device_mib": {
            "arguments": round(mem.argument_size_in_bytes / 2**20, 1),
            "temps": round(mem.temp_size_in_bytes / 2**20, 1),
        },
        "schedule": sched,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", type=int, default=1024)
    args = ap.parse_args()

    rows = []
    for topology, shape in RUNGS:
        print(f"== {topology} (mesh {shape}, "
              f"{args.local * shape[0]}x{args.local * shape[1]})",
              flush=True)
        try:
            row = compile_rung(topology, shape, args.local)
        except Exception as e:
            row = {"topology": topology, "error":
                   f"{type(e).__name__}: {str(e)[:200]}"}
        rows.append(row)
        print("   ", json.dumps(row), flush=True)

    out = {
        "mode": "weak (fixed per-chip tile, abstract v5e topologies)",
        "local": args.local,
        "note": ("Compile-level scaling evidence: identical sharded "
                 "program compiled per rung; per-device memory flat "
                 "with mesh size = no hidden per-chip blowup; schedule "
                 "metrics show the compiler's comm/compute scheduling "
                 "per scale. Wall-clock multi-chip efficiency remains "
                 "unmeasurable on this 1-chip host (BASELINE's >=90% "
                 "target needs real hardware)."),
        "rungs": rows,
    }
    with open(os.path.join(REPO, "SCALING_AOT_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_AOT_r05.json")


if __name__ == "__main__":
    main()
