"""Headline benchmark: grid-points/s/chip for the SWMHD RK3 step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no wall-time numbers (BASELINE.md), so the honest
baseline is the hardware roofline: BASELINE.json's stencil-throughput
target is >= 80% of HBM bandwidth-of-light for the fused step.
``vs_baseline`` is therefore achieved_fraction_of_light / 0.80 — 1.0 means
the 80% target is met exactly; the raw fraction is also emitted as
``hbm_fraction_of_light``. (Bandwidth-of-light for one RK3 step = the
24-field-transfer minimum at peak HBM bandwidth; see profiling.py.)

Environment knobs:
  SWMHD_BENCH_N      grid size (default 2048)
  SWMHD_BENCH_FUSED  "1" -> use the fused Pallas substage kernels
                     (persistently cached after first compile)
"""

import json
import os
import time

import jax
import jax.numpy as jnp

TARGET_FRACTION_OF_LIGHT = 0.80  # BASELINE.json stencil-throughput target


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

    frac = bench.hbm_fraction_of_light
    out = {
        "metric": f"grid-points/s/chip (SWMHD RK3 step, {N}^2 f32, WENO5 "
                  f"vector-invariant + jacobian Lorentz, {path} path; "
                  f"vs_baseline = fraction of HBM bandwidth-of-light / 0.80 "
                  f"target)",
        "value": round(bench.points_per_s, 1),
        "unit": "points/s",
    }
    if frac is not None:
        out["vs_baseline"] = round(frac / TARGET_FRACTION_OF_LIGHT, 4)
        out["hbm_fraction_of_light"] = round(frac, 4)
        out["hbm_gbps_at_min_traffic"] = round(bench.hbm_gbps_estimate, 1)
    else:  # non-TPU backend: no roofline to compare against
        out["vs_baseline"] = 0.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
