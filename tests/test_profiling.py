"""Profiling utilities + multihost helpers (single-process smoke tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from swmhd_tpu import Grid, ShallowWaterModel, FPlane
from swmhd_tpu.profiling import benchmark_step, StepBenchmark
from swmhd_tpu.parallel import make_mesh, process_local_slab


def test_benchmark_step_counts():
    g = Grid.regular(32, 32, (0, 1), (0, 1), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, momentum_advection="centered2",
                              mass_advection="centered2",
                              tracer_advection="centered2")
    state = model.initial_state(h=1.0)
    step = jax.jit(model.step_fn(1e-3, 2))
    bench = benchmark_step(step, state, n_steps_per_call=2, n_calls=3)
    assert isinstance(bench, StepBenchmark)
    assert bench.n_steps == 6
    assert bench.grid_points == 32 * 32
    assert bench.points_per_s > 0
    assert "pts/s" in str(bench)


def test_process_local_slab_single_process():
    mesh = make_mesh(shape=(2, 2))
    (x0, x1), (y0, y1) = process_local_slab(mesh, 16, 16)
    # single process owns everything
    assert (x0, x1) == (0, 16)
    assert (y0, y1) == (0, 16)
