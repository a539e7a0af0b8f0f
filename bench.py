"""Headline benchmark: grid-points/s/chip for the SWMHD RK3 step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no wall-time numbers (BASELINE.md), so vs_baseline
is measured against a conservative estimate of the reference's per-point
cost on its demonstrated hardware path (single-device CPU, ~1e7 pts/s for a
WENO5 RK3 shallow-water step — Oceananigans-class throughput).

Environment knobs:
  SWMHD_BENCH_N      grid size (default 2048)
  SWMHD_BENCH_FUSED  "1" -> use the fused Pallas substage kernels (compile
                     is slow the first time but persistently cached; best
                     for N <= ~512 where windows stay compile-feasible)
"""

import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_POINTS_PER_S = 1.0e7  # single-device reference-class throughput


def build(N=2048, dtype=jnp.float32):
    from swmhd_tpu import (
        Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT,
        jacobian_lorentz_forcing)

    grid = Grid.regular(N, N, (-5.0, 5.0), (-5.0, 5.0), dtype=dtype)
    model = ShallowWaterModel(
        grid=grid, formulation=VECTOR_INVARIANT,
        gravitational_acceleration=9.81, coriolis=FPlane(1.0),
        forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=1.0,
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    return model, state


def main():
    from swmhd_tpu.profiling import benchmark_step

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
    use_fused = os.environ.get("SWMHD_BENCH_FUSED", "0") == "1"
    steps_per_call = 10
    model, state = build(N)

    if use_fused:
        from swmhd_tpu.ops.fused_step import fused_step_fn
        step = jax.jit(fused_step_fn(model, 0.001, steps_per_call))
        path = "fused-pallas"
    else:
        step = jax.jit(model.step_fn(0.001, steps_per_call))
        path = "xla"

    bench = benchmark_step(step, state, steps_per_call, n_calls=5)

    print(json.dumps({
        "metric": f"grid-points/s/chip (SWMHD RK3 step, {N}^2 f32, WENO5 "
                  f"vector-invariant + jacobian Lorentz, {path} path)",
        "value": round(bench.points_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(bench.points_per_s / REFERENCE_POINTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
