"""Lorentz-force verification — the test_formulations.jl / MHD_visualize.jl
protocols.

With A = exp(−(x²+y²)) and h ≡ 1 the analytic Lorentz force is
(−4x, −4y)·exp(−2(x²+y²)) (reference: test_formulations.jl:14-15). Both
formulations must converge to it (order ≈ 2) and agree with each other.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import Grid
from swmhd_tpu.physics.lorentz import (
    magnetic_field_cc, lorentz_force_jacobian, lorentz_force_divergence)
from conftest import convergence_order

L = 10.0
NS = [64, 128, 256]


def make_grid(N):
    return Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2),
                        dtype=jnp.float64)


def setup(N):
    g = make_grid(N)
    X, Y = g.nodes("cc")
    A = jnp.exp(-(X ** 2 + Y ** 2))
    h = jnp.ones(g.shape, g.dtype)
    return g, A, h


def exact_fx(X, Y):
    return -4 * X * np.exp(-2 * (X ** 2 + Y ** 2))


def exact_fy(X, Y):
    return -4 * Y * np.exp(-2 * (X ** 2 + Y ** 2))


class TestMagneticField:
    """B = (−∂yA, ∂xA)/h convergence — MHD_visualize.jl:33-111 protocol."""

    def test_b_field_order2(self):
        errs = []
        for N in NS[:3]:
            g, A, h = setup(N)
            Bx, By = magnetic_field_cc(A, h, g)
            X, Y = g.nodes("cc")
            want_bx = 2 * Y * jnp.exp(-(X**2 + Y**2))
            want_by = -2 * X * jnp.exp(-(X**2 + Y**2))
            e = max(float(jnp.max(jnp.abs(Bx - want_bx))),
                    float(jnp.max(jnp.abs(By - want_by))))
            errs.append(e)
        assert convergence_order(NS[:3], errs) > 1.9


class TestJacobianForm:
    def test_convergence_order2(self):
        ex, ey = [], []
        for N in NS:
            g, A, h = setup(N)
            fx, fy = lorentz_force_jacobian(A, h, g)
            Xf, Yc = g.nodes("fc")
            Xc, Yf = g.nodes("cf")
            ex.append(float(jnp.max(jnp.abs(fx - exact_fx(Xf, Yc)))))
            ey.append(float(jnp.max(jnp.abs(fy - exact_fy(Xc, Yf)))))
        ox, oy = convergence_order(NS, ex), convergence_order(NS, ey)
        assert ox > 1.8, f"jacobian fx order {ox}"
        assert oy > 1.8, f"jacobian fy order {oy}"


class TestDivergenceForm:
    def test_convergence_order2(self):
        ex, ey = [], []
        for N in NS:
            g, A, h = setup(N)
            fx, fy = lorentz_force_divergence(A, h, g)
            Xf, Yc = g.nodes("fc")
            Xc, Yf = g.nodes("cf")
            ex.append(float(jnp.max(jnp.abs(fx - exact_fx(Xf, Yc)))))
            ey.append(float(jnp.max(jnp.abs(fy - exact_fy(Xc, Yf)))))
        ox, oy = convergence_order(NS, ex), convergence_order(NS, ey)
        assert ox > 1.8, f"divergence fx order {ox}"
        assert oy > 1.8, f"divergence fy order {oy}"


class TestCrossFormulation:
    """The two discretisations of the same physics must agree as N grows
    (test_formulations.jl cross-validation, SURVEY §4.4)."""

    def test_agreement_shrinks(self):
        diffs = []
        for N in (64, 128, 256):
            g, A, h = setup(N)
            jx, jy = lorentz_force_jacobian(A, h, g)
            dx_, dy_ = lorentz_force_divergence(A, h, g)
            diffs.append(max(float(jnp.max(jnp.abs(jx - dx_))),
                             float(jnp.max(jnp.abs(jy - dy_)))))
        assert diffs[2] < diffs[0]
        assert convergence_order([64, 128, 256], diffs) > 1.5

    def test_nonunit_h(self):
        """With spatially-varying h both forms still converge to each other
        (they differ at truncation order only)."""
        N = 256
        g = make_grid(N)
        X, Y = g.nodes("cc")
        A = jnp.exp(-(X**2 + Y**2))
        h = 1.0 + 0.1 * jnp.exp(-((X - 1) ** 2 + Y ** 2))
        jx, jy = lorentz_force_jacobian(A, h, g)
        dx_, dy_ = lorentz_force_divergence(A, h, g)
        # jacobian form applies J(A,B)/h; divergence form ∇·(hB⊗B) is the
        # tendency of uh. Relation: force_uh ≈ h̄·force_u + O(Δ²) when the
        # field is smooth. Compare the u-space forces.
        from swmhd_tpu import operators as op
        assert float(jnp.max(jnp.abs(dx_ / op.ix_f(h, g) - jx))) < 0.05
        assert float(jnp.max(jnp.abs(dy_ / op.iy_f(h, g) - jy))) < 0.05
