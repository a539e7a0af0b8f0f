"""End-to-end model tests.

Protocols from the reference (SURVEY §4):
 - steady-state invariance: h≡const, u=v=0, any A must stay constant
   (test_example.jl:96-109 rationale);
 - bounded energy drift over a short canonical run (the energy_plots
   baseline, SWMHD_example.jl:74-92);
 - cross-formulation agreement at 64² (SURVEY §4.4);
 - RK3 temporal order on a linear gravity-wave problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swmhd_tpu import (
    Grid, ShallowWaterModel, FPlane, WENO5, Centered2,
    VECTOR_INVARIANT, CONSERVATIVE,
    jacobian_lorentz_forcing, divergence_lorentz_forcing,
    diagnostics,
)

L = 10.0


def make_grid(N, dtype=jnp.float64):
    return Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2), dtype=dtype)


def jacobian_model(N=64, **kw):
    """The canonical SWMHD_example.jl:21-33 setup."""
    g = make_grid(N)
    return ShallowWaterModel(
        grid=g,
        formulation=VECTOR_INVARIANT,
        gravitational_acceleration=9.81,
        coriolis=FPlane(f=1.0),
        forcing=jacobian_lorentz_forcing(),
        **kw)


def divergence_model(N=64, **kw):
    """The divergence_sw_mhd.jl:19-31 setup."""
    g = make_grid(N)
    return ShallowWaterModel(
        grid=g,
        formulation=CONSERVATIVE,
        gravitational_acceleration=9.81,
        coriolis=FPlane(f=1.0),
        forcing=divergence_lorentz_forcing(),
        **kw)


def vortex_ic(model):
    """SWMHD_example.jl:36-41 initial condition."""
    return model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=1.0,
        A=lambda x, y: 0.5 * jnp.abs(y))


def dipole_ic(model):
    """divergence_sw_mhd.jl:33-38 initial condition."""
    return model.initial_state(
        h=1.0,
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))


class TestSteadyState:
    """h≡const, u=v=0 ⇒ nothing moves (test_example.jl:96-100)."""

    @pytest.mark.parametrize("formulation",
                             [VECTOR_INVARIANT, CONSERVATIVE])
    def test_rest_state_stays_at_rest(self, formulation):
        """No forcing: with h≡const and u=v=0, any A stays frozen and
        nothing moves (exactly the reference's stated protocol,
        test_example.jl:96-100 — 'for tracer A and NO forcing')."""
        model = ShallowWaterModel(
            grid=make_grid(32), formulation=formulation,
            gravitational_acceleration=9.81, coriolis=FPlane(1.0))
        A0 = lambda x, y: jnp.exp(-(x**2 + y**2))
        state = model.initial_state(h=1.0, A=A0)
        stepped = jax.jit(model.step_fn(1e-3, 50))(state)
        assert float(jnp.max(jnp.abs(stepped.u))) < 1e-12
        assert float(jnp.max(jnp.abs(stepped.v))) < 1e-12
        np.testing.assert_allclose(np.asarray(stepped.h), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(stepped.A),
                                   np.asarray(state.A), atol=1e-12)

    def test_uniform_A_is_exactly_steady(self):
        """Uniform A ⇒ B=0 ⇒ no Lorentz force at all; state is exactly
        fixed (up to roundoff)."""
        model = jacobian_model(N=32)
        state = model.initial_state(h=1.0, A=2.0)
        stepped = jax.jit(model.step_fn(1e-3, 20))(state)
        assert float(jnp.max(jnp.abs(stepped.u))) < 1e-12
        assert float(jnp.max(jnp.abs(stepped.A - 2.0))) < 1e-12


class TestEnergyConservation:
    """Short canonical runs must keep total energy drift tiny
    (the energy_plots baseline, SWMHD_example.jl:146-165)."""

    def test_jacobian_energy_drift(self):
        model = jacobian_model(N=64)
        state = vortex_ic(model)
        h0 = state.h
        e0 = diagnostics.energy_report(model, state, h0)
        stepped = jax.jit(model.step_fn(0.01, 100))(state)  # t = 1.0
        e1 = diagnostics.energy_report(model, stepped, h0)
        E0, E1 = float(e0["total_energy"]), float(e1["total_energy"])
        assert np.isfinite(E1)
        assert abs(E1 - E0) / abs(E0) < 0.05
        assert float(e1["min_h"]) > 0.5

    def test_divergence_energy_drift(self):
        model = divergence_model(N=64)
        state = dipole_ic(model)
        h0 = state.h
        e0 = diagnostics.energy_report(model, state, h0)
        stepped = jax.jit(model.step_fn(0.01, 100))(state)
        e1 = diagnostics.energy_report(model, stepped, h0)
        E0, E1 = float(e0["total_energy"]), float(e1["total_energy"])
        assert np.isfinite(E1)
        assert abs(E1 - E0) / max(abs(E0), 1e-8) < 0.05


class TestCrossFormulation:
    """Both formulations integrate the same physics: from the same smooth
    IC, velocities agree to truncation accuracy over a short run."""

    def test_short_run_agreement(self):
        N = 64
        mj = jacobian_model(N)
        md = divergence_model(N)
        A0 = lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2)) \
            - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2))
        sj = mj.initial_state(h=1.0, A=A0)
        sd = md.initial_state(h=1.0, A=A0)
        sj = jax.jit(mj.step_fn(0.005, 100))(sj)   # t = 0.5
        sd = jax.jit(md.step_fn(0.005, 100))(sd)
        uj, vj = mj.velocities(sj)
        ud, vd = md.velocities(sd)
        scale = float(jnp.max(jnp.abs(uj))) + 1e-12
        assert float(jnp.max(jnp.abs(uj - ud))) / scale < 0.15
        np.testing.assert_allclose(np.asarray(sj.A), np.asarray(sd.A),
                                   atol=2e-3)


class TestRK3:
    def test_temporal_order3(self):
        """Gravity-wave linear problem: refine dt at fixed grid, compare to
        a tiny-dt reference; the Le–Moin RK3 should show ≈3rd order."""
        model = ShallowWaterModel(
            grid=make_grid(32), formulation=VECTOR_INVARIANT,
            momentum_advection=Centered2, mass_advection=Centered2,
            tracer_advection=Centered2,
            gravitational_acceleration=1.0, coriolis=FPlane(0.0))
        state = model.initial_state(
            h=lambda x, y: 1.0 + 0.01 * jnp.sin(2 * jnp.pi * x / L),
            A=0.0)
        T = 0.2
        ref = jax.jit(model.step_fn(T / 512, 512))(state)
        errs, dts = [], []
        for n in (4, 8, 16):
            out = jax.jit(model.step_fn(T / n, n))(state)
            errs.append(float(jnp.max(jnp.abs(out.h - ref.h))))
            dts.append(T / n)
        order = np.polyfit(np.log(dts), np.log(errs), 1)[0]
        assert order > 2.5, f"RK3 temporal order {order}"


class TestForcingHook:
    def test_custom_forcing_receives_fields_and_clock(self):
        seen = {}

        def forcing(grid, clock, fields):
            seen["keys"] = sorted(fields)
            return 0.01 * fields["h"]

        model = ShallowWaterModel(
            grid=make_grid(16), formulation=VECTOR_INVARIANT,
            momentum_advection=Centered2, mass_advection=Centered2,
            tracer_advection=Centered2, forcing={"h": forcing})
        state = model.initial_state(h=1.0)
        out = model.step(state, 0.1)
        assert seen["keys"] == ["A", "h", "u", "v"]
        # dh/dt = 0.01 h ⇒ h(0.1) ≈ e^{0.001}
        np.testing.assert_allclose(np.asarray(out.h), np.exp(0.001),
                                   rtol=1e-9)
