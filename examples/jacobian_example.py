"""The canonical jacobian-formulation run — the analog of the reference's
jacobian_formulation/SWMHD_example.jl, written against the library API.

Equivalent one-liner:
    python -m swmhd_tpu.cli run adjustment_jacobian --movie
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from swmhd_tpu import (
    Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT,
    jacobian_lorentz_forcing, Simulation, IterationInterval, TimeInterval,
    Callback, diagnostics)
from swmhd_tpu.simulation import progress_callback
from swmhd_tpu.io import FieldWriter, ScalarSeriesWriter

# grid — SWMHD_example.jl:14-16
N, L = 64, 10.0
grid = Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2))

# model — SWMHD_example.jl:21-33 (WENO5 VelocityStencil momentum advection,
# RK3, FPlane(f=1), g=9.81, A as tracer, Lorentz forcing on u,v)
model = ShallowWaterModel(
    grid=grid, formulation=VECTOR_INVARIANT,
    gravitational_acceleration=9.81, coriolis=FPlane(1.0),
    forcing=jacobian_lorentz_forcing())

# initial conditions — SWMHD_example.jl:36-41
state = model.initial_state(
    u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
    v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
    h=1.0,
    A=lambda x, y: 0.5 * jnp.abs(y))
h0 = state.h

# simulation + schedules — SWMHD_example.jl:42-92
sim = Simulation(model, dt=0.01, stop_time=30.0)
sim.callbacks["progress"] = Callback(progress_callback(),
                                     IterationInterval(100))
sim.output_writers["fields"] = FieldWriter(
    outputs={"A": lambda s: s.state.A, "h": lambda s: s.state.h,
             "u": lambda s: s.state.u, "v": lambda s: s.state.v},
    schedule=TimeInterval(0.1), path="runs/jacobian_example/fields")
sim.output_writers["energies"] = ScalarSeriesWriter(
    fn=lambda m, s: diagnostics.energy_report(m, s, h0),
    schedule=IterationInterval(1),
    path="runs/jacobian_example/energies.csv")

if __name__ == "__main__":
    final = sim.run(state)

    from swmhd_tpu.viz import render_scenario_outputs
    render_scenario_outputs("runs/jacobian_example", "jacobian example")
