"""AOT-compile the 16384² multi-host pod config (r5, VERDICT r4 item 9).

The BASELINE ladder's last rung (16384², multi-host) previously existed
only as a dryrun-validated program *structure*. This actually compiles
the sharded production step for an abstract multi-host v5e topology
(4x8 = 32 chips = 4 hosts' worth of v5e boards) at the full 16384²
grid and records the compile report — memory figures included — in
LADDER_16384_compile.json. The same artifact carries the scheduled-HLO
overlap metrics (benchmarks/overlap_aot.parse_schedule) for the config,
so the last rung's comm/compute schedule is on record too.

Usage: JAX_PLATFORMS=cpu python benchmarks/ladder16384_aot.py
       [--n 16384] [--topology v5e:4x8] [--mesh 4 8] [--overlap]
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

from overlap_aot import build_model, parse_schedule

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--topology", default="v5e:4x8")
    ap.add_argument("--mesh", type=int, nargs=2, default=(4, 8))
    args = ap.parse_args()

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from swmhd_tpu.parallel.decomposition import (DomainDecomposition,
                                                  AXIS_X, AXIS_Y)
    from swmhd_tpu.models.state import State, Clock

    topo = topologies.get_topology_desc(args.topology, "tpu")
    n_dev = len(topo.devices)
    n_proc = len({d.process_index for d in topo.devices})
    devs = np.array(topo.devices).reshape(tuple(args.mesh))
    mesh = Mesh(devs, (AXIS_X, AXIS_Y))
    print(f"topology {args.topology}: {n_dev} chips, {n_proc} processes",
          flush=True)

    model, _ = build_model(args.n)
    N = args.n
    sh_field = NamedSharding(mesh, P(AXIS_X, AXIS_Y))
    sh_scalar = NamedSharding(mesh, P())
    field = jax.ShapeDtypeStruct((N, N), jnp.float32, sharding=sh_field)
    scalar = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh_scalar)
    it = jax.ShapeDtypeStruct((), jnp.int32, sharding=sh_scalar)
    state = State(h=field, u=field, v=field, A=field,
                  clock=Clock(time=scalar, iteration=it))
    tile = (N // args.mesh[0], N // args.mesh[1])

    report = {
        "grid": f"{N}x{N}",
        "topology": args.topology,
        "n_chips": n_dev,
        "n_processes": n_proc,
        "mesh": list(args.mesh),
        "tile_per_chip": list(tile),
        "halo": 8,
    }
    for overlap in (False, True):
        dd = DomainDecomposition(model, mesh, halo=8, overlap=overlap)
        fn = dd.step_fn(0.001, 1)
        t0 = time.time()
        compiled = fn.lower(state).compile()
        compile_s = time.time() - t0
        mem = compiled.memory_analysis()
        sched = parse_schedule(compiled.as_text())
        report[f"overlap_{str(overlap).lower()}"] = {
            "compile_s": round(compile_s, 1),
            "per_device_bytes": {
                "arguments": int(mem.argument_size_in_bytes),
                "outputs": int(mem.output_size_in_bytes),
                "temps": int(mem.temp_size_in_bytes),
                "generated_code": int(mem.generated_code_size_in_bytes),
            },
            "hbm_gib_per_chip": round(
                (mem.argument_size_in_bytes + mem.temp_size_in_bytes)
                / 2 ** 30, 2),
            "schedule": sched,
        }
        print(f"overlap={overlap}: compiled in {compile_s:.0f}s, "
              f"{report[f'overlap_{str(overlap).lower()}']['hbm_gib_per_chip']}"
              f" GiB/chip, schedule {sched}", flush=True)
    report["note"] = ("v5e has 16 GiB HBM/chip. n_sync_permutes counts "
                      "synchronous collective-permute instructions (the "
                      "scheduler chose not to split them into async "
                      "start/done pairs); n_permute_pairs counts async "
                      "pairs and the compute scheduled inside them.")
    with open(os.path.join(REPO, "LADDER_16384_compile.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote LADDER_16384_compile.json")


if __name__ == "__main__":
    main()
