"""Static linear-background tracer machinery (the low_B_low_U uniform
field: A = γ·y carried analytically, state.A = perturbation).

Pins the behavior the reference got from GradientBoundaryCondition(-0.05)
on a Bounded grid (SWMHD_example.jl:19, divergence_sw_mhd.jl:34): exact
uniform B everywhere including walls, zero Lorentz force for uniform B,
and the exact advection source −u·∇(γy) = −γv on the perturbation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import scenarios, diagnostics
from swmhd_tpu.grid import Grid
from swmhd_tpu.models.shallow_water import ShallowWaterModel
from swmhd_tpu.physics.coriolis import FPlane
from swmhd_tpu.forcing import jacobian_lorentz_forcing


GAMMA = -0.05


def test_low_B_low_U_initial_magnetic_energy_exact():
    """ME0 = ½γ²LxLy = 0.125 exactly — the anchor the reference plots
    record (energy_plots/*low_B_low_U.png)."""
    model, state, sc = scenarios.build("64x64_low_B_low_U",
                                       dtype=jnp.float64)
    me = float(diagnostics.magnetic_energy(
        state.A, state.h, model.grid, model.A_background_gradient_y))
    assert me == pytest.approx(0.125, rel=1e-12)
    ke = float(diagnostics.kinetic_energy(state.u, state.v, state.h,
                                          model.grid))
    assert ke == pytest.approx(np.pi / 8, rel=1e-3)  # U=1 vortex


def test_uniform_background_rest_state_is_steady():
    """Uniform B exerts no Lorentz force: rest + background must freeze,
    including at the Bounded walls (the clamp-ghost bug this machinery
    replaces would inject a wall-layer force)."""
    g = Grid.regular(32, 32, (-5, 5), (-5, 5),
                     topology=("periodic", "bounded"), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing(GAMMA),
                              A_background_gradient_y=GAMMA)
    state = model.initial_state(h=1.0)
    out = jax.jit(model.step_fn(0.01, 50))(state)
    for name in ("u", "v", "A"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)), 0.0,
                                   atol=1e-13, err_msg=name)
    np.testing.assert_allclose(np.asarray(out.h), 1.0, atol=1e-13)


def test_background_advection_source_exact():
    """Uniform v advecting the background: ∂t A' = −γ v exactly (discrete
    source −γ·ℑy(Vf)/h with h ≡ 1, Vf ≡ v). Periodic so v=const is
    legal; f=0, g=0 keep v frozen."""
    g = Grid.regular(32, 32, (-5, 5), (-5, 5), dtype=jnp.float64)
    model = ShallowWaterModel(grid=g, coriolis=FPlane(0.0),
                              gravitational_acceleration=0.0,
                              forcing=jacobian_lorentz_forcing(GAMMA),
                              A_background_gradient_y=GAMMA)
    v0 = 0.3
    state = model.initial_state(h=1.0, v=lambda x, y: v0 + 0.0 * x)
    dt, n = 0.01, 100
    out = jax.jit(model.step_fn(dt, n))(state)
    expected = -GAMMA * v0 * dt * n
    np.testing.assert_allclose(np.asarray(out.A), expected, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.v), v0, rtol=1e-12)
