"""M0 operator tests: staggering, exactness, convergence orders.

Protocol ported from the reference's verification scripts
(test_jacobian.jl:32-71, MHD_visualize.jl:33-111): evaluate discrete
operators on analytic fields over a refinement ladder and assert the
log-log convergence order.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import Grid
from swmhd_tpu import operators as op
from conftest import convergence_order

L = 10.0


def make_grid(N, dtype=jnp.float64):
    return Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2), dtype=dtype)


def gaussian(x, y):
    return jnp.exp(-(x ** 2 + y ** 2))


class TestCoordinates:
    def test_staggering_offsets(self):
        g = make_grid(64)
        assert float(g.xf()[0]) == pytest.approx(-5.0)
        assert float(g.xc()[0]) == pytest.approx(-5.0 + g.dx / 2)
        assert float(g.yf()[0]) == pytest.approx(-5.0)
        np.testing.assert_allclose(np.diff(np.asarray(g.xc())), g.dx)

    def test_nodes_match_loc(self):
        g = make_grid(8)
        Xc, Yc = g.nodes("cc")
        Xf, Yf = g.nodes("fc")
        assert Xc.shape == (8, 8)
        np.testing.assert_allclose(np.asarray(Xc - Xf), g.dx / 2)
        np.testing.assert_allclose(np.asarray(Yc - Yf), 0.0)


class TestExactness:
    """2-pt differences/means are exact for linear fields (periodic-safe
    fields only: use a single Fourier mode instead where wrap matters)."""

    def test_ddx_f_on_mode(self):
        g = make_grid(128)
        X, Y = g.nodes("cc")
        k = 2 * np.pi / L
        c = jnp.sin(k * X)
        got = op.ddx_f(c, g)
        Xf, _ = g.nodes("fc")
        # discrete derivative of sin(kx) = cos(k x_f) * sin(k dx/2)/(dx/2)
        keff = np.sin(k * g.dx / 2) / (g.dx / 2)
        want = keff * jnp.cos(k * Xf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)

    def test_interp_roundtrip_constant(self):
        g = make_grid(32)
        c = jnp.full(g.shape, 3.7)
        for f in (op.ix_f, op.ix_c, op.iy_f, op.iy_c,
                  op.ixy_fc, op.ixy_cf, op.ixy_ff, op.ixy_cc):
            np.testing.assert_allclose(np.asarray(f(c, g)), 3.7, rtol=1e-14)

    def test_delta_adjointness(self):
        """∑ c·δxᶜ(f) = −∑ f·δxᶠ(c): summation-by-parts on the periodic
        grid (the discrete structure energy conservation rests on)."""
        g = make_grid(16)
        rng = np.random.default_rng(1)
        c = jnp.asarray(rng.standard_normal(g.shape))
        f = jnp.asarray(rng.standard_normal(g.shape))
        lhs = jnp.sum(c * op.dx_c(f, g))
        rhs = -jnp.sum(f * op.dx_f(c, g))
        assert float(lhs) == pytest.approx(float(rhs), rel=1e-12)


class TestConvergence:
    @pytest.mark.parametrize("deriv,loc,exact", [
        ("ddx_f", "fc", lambda X, Y: -2 * X * np.exp(-(X**2 + Y**2))),
        ("ddy_f", "cf", lambda X, Y: -2 * Y * np.exp(-(X**2 + Y**2))),
    ])
    def test_derivative_order2(self, deriv, loc, exact):
        errs, ns = [], [50, 100, 200, 400]
        for N in ns:
            g = make_grid(N)
            X, Y = g.nodes("cc")
            c = gaussian(X, Y)
            got = getattr(op, deriv)(c, g)
            Xl, Yl = g.nodes(loc)
            want = exact(np.asarray(Xl), np.asarray(Yl))
            errs.append(float(jnp.max(jnp.abs(got - want))))
        order = convergence_order(ns, errs)
        assert order > 1.9, f"{deriv} order {order}"

    def test_interpolation_order2(self):
        errs, ns = [], [50, 100, 200, 400]
        for N in ns:
            g = make_grid(N)
            X, Y = g.nodes("cc")
            c = gaussian(X, Y)
            got = op.ix_f(c, g)
            Xf, Yf = g.nodes("fc")
            want = gaussian(Xf, Yf)
            errs.append(float(jnp.max(jnp.abs(got - want))))
        assert convergence_order(ns, errs) > 1.9

    def test_laplacian_order2(self):
        errs, ns = [], [50, 100, 200, 400]
        for N in ns:
            g = make_grid(N)
            X, Y = g.nodes("cc")
            c = gaussian(X, Y)
            got = op.laplacian_cc(c, g)
            want = (4 * (X**2 + Y**2) - 4) * gaussian(X, Y)
            errs.append(float(jnp.max(jnp.abs(got - want))))
        assert convergence_order(ns, errs) > 1.9

    def test_vorticity_order2(self):
        # periodic-safe localized vortex: u = 5y e^{-r²}, v = -5x e^{-r²}
        # (the reference IC, SWMHD_example.jl:39-40)
        errs, ns = [], [64, 128, 256]
        for N in ns:
            g = make_grid(N)
            Xu, Yu = g.nodes("fc")
            Xv, Yv = g.nodes("cf")
            u = 5 * Yu * jnp.exp(-(Xu**2 + Yu**2))
            v = -5 * Xv * jnp.exp(-(Xv**2 + Yv**2))
            z = op.vorticity_ff(u, v, g)
            Xf, Yf = g.nodes("ff")
            r2 = Xf**2 + Yf**2
            want = (-10 + 10 * r2) * jnp.exp(-r2)
            errs.append(float(jnp.max(jnp.abs(z - want))))
        assert convergence_order(ns, errs) > 1.9
