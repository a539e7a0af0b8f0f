"""The canonical conservative-formulation run — the analog of the
reference's divergence_formulation/divergence_sw_mhd.jl: prognostics
(uh, vh, h), plain WENO5 momentum advection, Lorentz forcing on (uh, vh),
two-Gaussian dipole magnetic potential, stop_time 45.

Equivalent one-liner:
    python -m swmhd_tpu.cli run adjustment_divergence \
        --formulation conservative --movie
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from swmhd_tpu import (
    Grid, ShallowWaterModel, FPlane, CONSERVATIVE,
    divergence_lorentz_forcing, Simulation, IterationInterval, TimeInterval,
    Callback, diagnostics)
from swmhd_tpu.simulation import progress_callback
from swmhd_tpu.io import FieldWriter, ScalarSeriesWriter

# grid — divergence_sw_mhd.jl:12-14
N, L = 64, 10.0
grid = Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2))

# model — divergence_sw_mhd.jl:19-31
model = ShallowWaterModel(
    grid=grid, formulation=CONSERVATIVE,
    gravitational_acceleration=9.81, coriolis=FPlane(1.0),
    forcing=divergence_lorentz_forcing())

# ICs — divergence_sw_mhd.jl:33-38 (rest start, dipole A)
state = model.initial_state(
    h=1.0,
    A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
    - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
h0 = state.h

sim = Simulation(model, dt=0.01, stop_time=45.0)
sim.callbacks["progress"] = Callback(progress_callback(),
                                     IterationInterval(100))
sim.output_writers["fields"] = FieldWriter(
    outputs={"A": lambda s: s.state.A, "h": lambda s: s.state.h,
             "u": lambda s: s.model.velocities(s.state)[0],
             "v": lambda s: s.model.velocities(s.state)[1]},
    schedule=TimeInterval(0.1), path="runs/divergence_example/fields")
sim.output_writers["energies"] = ScalarSeriesWriter(
    fn=lambda m, s: diagnostics.energy_report(m, s, h0),
    schedule=IterationInterval(1),
    path="runs/divergence_example/energies.csv")

if __name__ == "__main__":
    final = sim.run(state)

    from swmhd_tpu.viz import render_scenario_outputs
    render_scenario_outputs("runs/divergence_example", "divergence example")
