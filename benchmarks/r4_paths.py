"""r4 execution-path shootout on the real chip.

Measures every execution path at representative sizes to settle two
VERDICT r3 items:

 - item 9 (slab_step's fate): does the halo-slab XLA path still beat the
   plain (pad-roll) XLA step anywhere now that fused-Pallas is default —
   and by how much, as the documented non-Pallas-backend fallback?
 - item 2 (fused sharded production-grade): a mesh-1x1 sharded-fused row
   to show the shard_map wrapper costs ~nothing vs fused-unsharded.
 - item 4 (512² rung): resident vs windowed-fused at small N.

    python benchmarks/r4_paths.py            # writes PATHS_r04.json rows

Each row: {"N", "path", "points_per_s"}.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(N):
    from swmhd_tpu import (Grid, ShallowWaterModel, FPlane,
                           VECTOR_INVARIANT, jacobian_lorentz_forcing)
    g = Grid.regular(N, N, (-5.0, 5.0), (-5.0, 5.0), dtype=jnp.float32)
    model = ShallowWaterModel(grid=g, formulation=VECTOR_INVARIANT,
                              gravitational_acceleration=9.81,
                              coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=1.0,
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    return model, state


def steppers(N, model):
    from swmhd_tpu.ops.fused_step import (
        fused_step_fn, resident_step_fn, resident_vmem_bytes,
        _vmem_limit_bytes, pallas_available)
    steps = 10
    out = {
        "xla-padroll": lambda: jax.jit(model.step_fn(1e-3, steps)),
        # the halo-slab XLA path was measured here (PATHS_r04.json: 1.5e8
        # pts/s at 512^2, 7.6e7 at 2048^2 — strictly dominated by both
        # pad-roll XLA and fused) and retired; see PERFORMANCE.md.
    }
    if pallas_available():
        out["fused"] = lambda: jax.jit(fused_step_fn(model, 1e-3, steps))
        limit = _vmem_limit_bytes() or 16 * 2 ** 20
        if resident_vmem_bytes(model) <= 0.85 * limit:
            out["resident"] = lambda: jax.jit(
                resident_step_fn(model, 1e-3, steps))

        def sharded_fused():
            from swmhd_tpu.parallel import DomainDecomposition, make_mesh
            dd = DomainDecomposition(model, make_mesh(shape=(1, 1)),
                                     halo=8)
            return jax.jit(dd.fused_step_fn(1e-3, steps))
        if len(jax.devices()) >= 1:
            out["fused-sharded-1x1"] = sharded_fused
    return steps, out


def main():
    from swmhd_tpu.profiling import benchmark_step
    only = os.environ.get("SWMHD_PATHS_ONLY", "")
    sizes = [int(s) for s in
             os.environ.get("SWMHD_PATHS_SIZES", "512,2048").split(",")]
    rows = []
    for N in sizes:
        model, state = build(N)
        steps, table = steppers(N, model)
        for name, mk in table.items():
            if only and only not in name:
                continue
            try:
                b = benchmark_step(mk(), state, steps, n_calls=3)
                rows.append({"N": N, "path": name,
                             "points_per_s": round(b.points_per_s, 1)})
            except Exception as e:
                rows.append({"N": N, "path": name,
                             "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "PATHS_r04.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0].device_kind),
                   "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
