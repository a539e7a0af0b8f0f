"""Headline benchmark: grid-points/s/chip for the SWMHD RK3 step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no wall-time numbers (BASELINE.md), so vs_baseline
is measured against a conservative estimate of the reference's per-point
cost on its demonstrated hardware path (single-device CPU, ~1e7 pts/s for a
WENO5 RK3 shallow-water step — Oceananigans-class throughput).
"""

import json
import time

import jax
import jax.numpy as jnp


REFERENCE_POINTS_PER_S = 1.0e7  # single-device reference-class throughput


def build(N=2048, dtype=jnp.float32, use_pallas=None):
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
    N = 2048
    steps_per_call = 10
    model, state = build(N)
    step = jax.jit(model.step_fn(0.001, steps_per_call))

    # warmup & compile. NOTE: sync via a device->host scalar pull, not
    # block_until_ready — over the axon TPU relay the latter can return
    # before the computation drains, inflating throughput ~1000x.
    state = step(state)
    float(jnp.sum(state.h))

    n_calls = 5
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = step(state)
    float(jnp.sum(state.h))
    dt_wall = time.perf_counter() - t0

    n_steps = n_calls * steps_per_call
    pts_per_s = N * N * n_steps / dt_wall

    print(json.dumps({
        "metric": "grid-points/s/chip (SWMHD RK3 step, 2048^2 f32, WENO5 "
                  "vector-invariant + jacobian Lorentz)",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / REFERENCE_POINTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
