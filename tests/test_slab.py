"""Halo-slab fast path == roll-based reference step.

The slab layer (swmhd_tpu/ops/slab_step.py) replaces periodic rolls with
wrap-pad + telescoping slices. Because the pad is an exact periodic image
and all slices stay in bounds, every floating-point operation sees exactly
the same operands as the jnp.roll path — eager evaluation is asserted
*bitwise* equal; jitted multi-step runs are asserted to roundoff (XLA's
FMA-contraction choices depend on graph structure).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import (
    Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT, CONSERVATIVE,
    jacobian_lorentz_forcing, divergence_lorentz_forcing,
)
from swmhd_tpu.ops.slab_step import Slab, slab_tendencies, slab_step_fn

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


class TestSlab:
    def test_pad_roll_crop_matches_jnp_roll(self, rng):
        a = jnp.asarray(rng.standard_normal((16, 24)))
        s = Slab.pad(a, 5)
        for axis in (0, 1):
            for r in (-4, -1, 1, 3, 5):
                got = s.roll(r, axis).interior()
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(jnp.roll(a, r, axis)),
                    err_msg=f"roll {r} axis {axis}")

    def test_composed_rolls(self, rng):
        a = jnp.asarray(rng.standard_normal((16, 16)))
        s = Slab.pad(a, 6)
        got = s.roll(2, 0).roll(-3, 1).roll(-1, 0).interior()
        want = jnp.roll(jnp.roll(jnp.roll(a, 2, 0), -3, 1), -1, 0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_arithmetic_aligns_extents(self, rng):
        a = jnp.asarray(rng.standard_normal((12, 12)))
        b = jnp.asarray(rng.standard_normal((12, 12)))
        sa, sb = Slab.pad(a, 4), Slab.pad(b, 4)
        out = (sa.roll(1, 0) * sb - 2.0 * abs(sa) / (sb.roll(-2, 1) + 10.0))
        want = (jnp.roll(a, 1, 0) * b
                - 2.0 * jnp.abs(a) / (jnp.roll(b, -2, 1) + 10.0))
        np.testing.assert_array_equal(np.asarray(out.interior()),
                                      np.asarray(want))

    def test_overrun_raises(self):
        s = Slab.pad(jnp.ones((8, 8)), 2)
        with pytest.raises(ValueError):
            s.roll(3, 0)


@pytest.mark.parametrize("formulation", [VECTOR_INVARIANT, CONSERVATIVE])
class TestSlabTendency:
    def test_tendencies_bitwise_equal(self, formulation):
        model, state = build(formulation)
        G_ref = model.tendencies(state)
        G_slab = slab_tendencies(model, state)
        for name in ("h", "u", "v", "A"):
            np.testing.assert_array_equal(
                np.asarray(getattr(G_slab, name)),
                np.asarray(getattr(G_ref, name)),
                err_msg=f"{name} ({formulation})")

    def test_steps_equal_to_roundoff(self, formulation):
        # Under jit the two step graphs differ structurally, so XLA's
        # fusion/FMA-contraction choices differ — ULP-level deltas are
        # expected (the eager tendency comparison above IS bitwise).
        model, state = build(formulation)
        dt = 0.01
        ref = jax.jit(model.step_fn(dt, 3))(state)
        out = jax.jit(slab_step_fn(model, dt, n_steps=3))(state)
        for name in ("h", "u", "v", "A"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-13, atol=1e-14,
                err_msg=f"{name} ({formulation})")
        assert float(out.clock.time) == pytest.approx(float(ref.clock.time))
        assert int(out.clock.iteration) == 3


def test_slab_step_with_diagnostics():
    model, state = build(VECTOR_INVARIANT)
    diag = lambda s: {"mean_h": jnp.mean(s.h)}
    out, series = jax.jit(slab_step_fn(model, 0.01, n_steps=4,
                                       diagnostics=diag))(state)
    assert series["mean_h"].shape == (4,)
    ref, ref_series = jax.jit(model.step_fn(0.01, 4, diagnostics=diag))(state)
    np.testing.assert_allclose(np.asarray(series["mean_h"]),
                               np.asarray(ref_series["mean_h"]),
                               rtol=1e-13, atol=1e-14)


def test_bounded_topology_rejected():
    g = Grid.regular(16, 16, (0, 1), (0, 1), topology=("bounded", "periodic"))
    model = ShallowWaterModel(grid=g)
    with pytest.raises(ValueError):
        slab_step_fn(model, 0.01)
