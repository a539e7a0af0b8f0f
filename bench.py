"""Headline benchmark: grid-points/s/chip for the SWMHD RK3 step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no wall-time numbers (BASELINE.md), so the honest
baseline is the hardware roofline. BASELINE.json's stencil target is
">= 80% of HBM bandwidth-of-light", but the fully-fused WENO5 SWMHD step
is COMPUTE-bound, not bandwidth-bound: it does ~3.0 kflop per point per
step against a 96 B/pt minimum traffic (arithmetic intensity ~31 flop/B,
far above the v5e's ~4.3 flop/B machine balance). The binding roofline is
therefore min(VPU-limit, HBM-limit) points/s, and ``vs_baseline`` is
achieved / (0.80 * binding_roofline) — 1.0 means the 80%-of-roofline
target is met. Both raw fractions are also emitted.

Environment knobs:
  SWMHD_BENCH_N      grid size (default 2048)
  SWMHD_BENCH_FUSED  "0" -> force the unfused XLA path ("1" default on
                     TPU: the fused Pallas substage kernels, persistently
                     cached after first compile)
"""

import json
import os
import time

import jax
import jax.numpy as jnp

TARGET_FRACTION = 0.80  # of the binding roofline (BASELINE.json target)

# Algebraic work of one RK3 step of this discretisation (flops/point),
# from XLA's cost analysis of the unfused step graph at 2048^2
# (PERFORMANCE.md): 1.25e10 flops / 2048^2 points.
FLOPS_PER_POINT = 2990.0

# Minimum HBM traffic: 3 substages x (read+write 4 prognostics) x 4 B.
BYTES_PER_POINT = 96.0


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
    from swmhd_tpu.profiling import (
        benchmark_step, detect_hbm_peak, detect_vpu_peak)
    from swmhd_tpu.ops.fused_step import pallas_available

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
    default_fused = "1" if pallas_available() else "0"
    use_fused = os.environ.get("SWMHD_BENCH_FUSED", default_fused) == "1"
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

    out = {
        "metric": f"grid-points/s/chip (SWMHD RK3 step, {N}^2 f32, WENO5 "
                  f"vector-invariant + jacobian Lorentz, {path} path; "
                  f"vs_baseline = achieved / (0.80 x binding roofline, "
                  f"which is the VPU compute limit for this "
                  f"arithmetic-intensity-31 step))",
        "value": round(bench.points_per_s, 1),
        "unit": "points/s",
    }
    hbm_peak, vpu_peak = detect_hbm_peak(), detect_vpu_peak()
    if hbm_peak is not None and vpu_peak is not None:
        hbm_limit = hbm_peak * 1e9 / BYTES_PER_POINT       # pts/s
        vpu_limit = vpu_peak * 1e9 / FLOPS_PER_POINT       # pts/s
        roofline = min(hbm_limit, vpu_limit)
        out["vs_baseline"] = round(
            bench.points_per_s / (TARGET_FRACTION * roofline), 4)
        out["fraction_of_roofline"] = round(
            bench.points_per_s / roofline, 4)
        out["hbm_fraction_of_light"] = round(
            bench.points_per_s / hbm_limit, 4)
        out["vpu_fraction_of_peak"] = round(
            bench.points_per_s / vpu_limit, 4)
        out["hbm_gbps_at_min_traffic"] = round(
            bench.points_per_s * BYTES_PER_POINT / 1e9, 1)
    else:  # non-TPU backend: no roofline to compare against
        out["vs_baseline"] = 0.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
