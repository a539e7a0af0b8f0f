"""Fused Pallas RK3 substage == reference XLA step (interpret mode on CPU).

Validates both the kernel logic and the SUBSTAGE_RADIUS halo budget: if the
composed stencil radius of one tendency evaluation exceeded the per-substage
halo, the tile borders would diverge from the global-roll path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import (
    Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT, CONSERVATIVE,
    jacobian_lorentz_forcing, divergence_lorentz_forcing,
)
from swmhd_tpu.ops.fused_step import fused_step_fn

L = 10.0


def build(formulation, N=64):
    g = Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2),
                     dtype=jnp.float64)
    forcing = (jacobian_lorentz_forcing()
               if formulation == VECTOR_INVARIANT
               else divergence_lorentz_forcing())
    model = ShallowWaterModel(grid=g, formulation=formulation,
                              coriolis=FPlane(1.0), forcing=forcing)
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=lambda x, y: 1.0 + 0.05 * jnp.exp(-(x**2 + y**2)),
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    return model, state


@pytest.mark.parametrize("formulation", [VECTOR_INVARIANT, CONSERVATIVE])
def test_fused_matches_reference_step(formulation):
    model, state = build(formulation, N=64)
    dt = 0.01
    ref = jax.jit(model.step_fn(dt, 2))(state)
    fused = fused_step_fn(model, dt, n_steps=2, tile_x=32, halo=8,
                          interpret=True)
    out = fused(state)
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-12, err_msg=f"{name} ({formulation})")
    assert float(out.clock.time) == pytest.approx(float(ref.clock.time))


def test_fused_multi_tile():
    """More than one tile in each direction exercises the DMA windowing."""
    model, state = build(VECTOR_INVARIANT, N=96)
    dt = 0.005
    ref = jax.jit(model.step_fn(dt, 1))(state)
    fused = fused_step_fn(model, dt, n_steps=1, tile_x=48, halo=8,
                          interpret=True)
    out = fused(state)
    for name in ("h", "u", "v", "A"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=1e-12, err_msg=name)
