"""Advection-scheme accuracy and conservation properties.

The reference never unit-tests WENO (it inherits it from Oceananigans);
these tests pin the schemes the framework re-implements: reconstruction
convergence order on smooth fields, non-oscillatory behavior on
discontinuities, and the discrete conservation the flux forms guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT
from swmhd_tpu.advection import (
    weno5_left_x_f, weno5_right_x_f, left3_x_f, Centered2, WENO5)
from tests.conftest import convergence_order


class TestReconstructionOrder:
    @staticmethod
    def _cell_averages(g):
        """Exact cell averages of sin(2πx): the reconstructions are
        finite-volume formulas (cell average → interface value); feeding
        point values instead floors the error at O(h²)."""
        k = 2 * jnp.pi
        xl = g.xf()
        xr = xl + g.dx
        avg = (jnp.cos(k * xl) - jnp.cos(k * xr)) / (k * g.dx)
        return avg[:, None] * jnp.ones((1, 4))

    def test_weno5_smooth_order5(self):
        """On a smooth field the WENO5 weights approach the optimal linear
        ones and the reconstruction converges at 5th order."""
        errs, ns = [], [32, 64, 128, 256]
        for N in ns:
            g = Grid.regular(N, 4, (0.0, 1.0), (0.0, 1.0),
                             dtype=jnp.float64)
            c = self._cell_averages(g)
            want = jnp.sin(2 * jnp.pi * g.xf())[:, None]
            got = weno5_left_x_f(c, g)
            errs.append(float(jnp.max(jnp.abs(got - want))))
        order = convergence_order(ns, errs)
        assert order > 4.5, (order, errs)

    def test_upwind3_smooth_order3(self):
        errs, ns = [], [32, 64, 128, 256]
        for N in ns:
            g = Grid.regular(N, 4, (0.0, 1.0), (0.0, 1.0),
                             dtype=jnp.float64)
            c = self._cell_averages(g)
            want = jnp.sin(2 * jnp.pi * g.xf())[:, None]
            errs.append(float(jnp.max(jnp.abs(left3_x_f(c, g) - want))))
        order = convergence_order(ns, errs)
        assert order > 2.7, (order, errs)

    def test_weno5_step_no_overshoot(self):
        """Essentially-non-oscillatory: reconstructing a step must not
        overshoot the data range by more than a tiny margin."""
        N = 64
        g = Grid.regular(N, 4, (0.0, 1.0), (0.0, 1.0), dtype=jnp.float64)
        c = jnp.where(jnp.arange(N) < N // 2, 1.0, 0.0)[:, None] \
            * jnp.ones((1, 4))
        for recon in (weno5_left_x_f, weno5_right_x_f):
            r = recon(c, g)
            assert float(jnp.max(r)) < 1.0 + 1e-6
            assert float(jnp.min(r)) > -1e-6


class TestConservation:
    """The flux-form tendencies conserve mass and tracer content to
    roundoff — a property the reference relies on but never asserts."""

    @pytest.mark.parametrize("scheme", [Centered2, WENO5])
    def test_mass_and_tracer_content_conserved(self, scheme):
        N = 64
        g = Grid.regular(N, N, (-5, 5), (-5, 5), dtype=jnp.float64)
        model = ShallowWaterModel(
            grid=g, formulation=VECTOR_INVARIANT, coriolis=FPlane(1.0),
            momentum_advection=scheme, mass_advection=scheme,
            tracer_advection=scheme)
        state = model.initial_state(
            u=lambda x, y: jnp.sin(2 * jnp.pi * x / 10) * 0.3,
            v=lambda x, y: jnp.cos(2 * jnp.pi * y / 10) * 0.3,
            h=lambda x, y: 1.0 + 0.1 * jnp.cos(2 * jnp.pi * x / 10),
            A=lambda x, y: jnp.exp(-(x**2 + y**2)))
        mass0 = float(jnp.sum(state.h))
        content0 = float(jnp.sum(state.h * state.A))
        out = jax.jit(model.step_fn(1e-3, 50))(state)
        mass1 = float(jnp.sum(out.h))
        content1 = float(jnp.sum(out.h * out.A))
        # mass flux form is exactly conservative
        assert abs(mass1 - mass0) / abs(mass0) < 1e-12
        # hA is conserved semi-discretely; RK3 staging reintroduces an
        # O(dt^2)/step cross term — assert it stays at that scale
        assert abs(content1 - content0) / abs(content0) < 1e-6
