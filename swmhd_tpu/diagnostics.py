"""In-graph scalar diagnostics: energies, cross-helicity, field extrema.

Reproduces the reference's energy functionals (jacobian_formulation/
SWMHD_example.jl:74-77, divergence_formulation/divergence_sw_mhd.jl:71-74):
domain integrals computed as ``mean(·)·Lx·Ly`` (uniform-grid quadrature),
potential energy measured against the *initial* height field, plus the
progress-log extrema (max|u|, max A, min h — SWMHD_example.jl:54-58) and a
cross-helicity integral ∫ h u·B the reference lacks (SURVEY §5 metrics row).

Note (SURVEY §2.3.4): the reference's "relative energy error (%)" is the
*absolute* deviation ×100; `total_energy_deviation` reproduces the quantity
under an honest name.
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid import Grid
from . import operators as op
from .physics.lorentz import magnetic_field_cc


def _integral(field, grid: Grid):
    return jnp.mean(field) * grid.Lx * grid.Ly


def kinetic_energy(u, v, h, grid: Grid):
    """∫ ½ h (u²+v²) — with u,v interpolated to centers (the reference mixes
    staggerings without interpolation, SURVEY §2.3.6; we interpolate)."""
    u2 = op.ix_c(u * u, grid)
    v2 = op.iy_c(v * v, grid)
    return _integral(0.5 * h * (u2 + v2), grid)


def magnetic_energy(A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """∫ ½ h (Bx²+By²) with B = (−∂yA, ∂xA)/h at centers
    (SWMHD_example.jl:75)."""
    Bx, By = magnetic_field_cc(A, h, grid, A_bg_grad_y)
    return _integral(0.5 * h * (Bx * Bx + By * By), grid)


def potential_energy(h, h0, g_acc, grid: Grid):
    """∫ ½ g (h−h₀)² against the initial height h₀ (SWMHD_example.jl:76)."""
    return _integral(0.5 * g_acc * (h - h0) ** 2, grid)


def total_energy(u, v, h, A, h0, g_acc, grid: Grid,
                 A_bg_grad_y: float = 0.0):
    return (kinetic_energy(u, v, h, grid)
            + magnetic_energy(A, h, grid, A_bg_grad_y)
            + potential_energy(h, h0, g_acc, grid))


def total_energy_deviation(E, E0):
    """|E − E₀|·100 — the quantity the reference plots as "relative energy
    error (%)" (SWMHD_example.jl:147)."""
    return jnp.abs(E - E0) * 100.0


def cross_helicity(u, v, A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """∫ h (u·B) — an MHD invariant worth monitoring at scale."""
    Bx, By = magnetic_field_cc(A, h, grid, A_bg_grad_y)
    uc = op.ix_c(u, grid)
    vc = op.iy_c(v, grid)
    return _integral(h * (uc * Bx + vc * By), grid)


def enstrophy(u, v, grid: Grid):
    z = op.vorticity_ff(u, v, grid)
    return _integral(0.5 * z * z, grid)


def extrema_report(u, v, h, A, grid: Grid):
    """max|u|, max A, min h — the progress-callback fields
    (SWMHD_example.jl:54-58)."""
    speed = jnp.sqrt(op.ix_c(u, grid) ** 2 + op.iy_c(v, grid) ** 2)
    return {
        "max_speed": jnp.max(speed),
        "max_abs_u": jnp.max(jnp.abs(u)),
        "max_A": jnp.max(A),
        "min_h": jnp.min(h),
    }


def derived_fields(model, state, h0=None):
    """The reference's derived-field set as plain arrays (no lazy graph —
    XLA fuses): speed ``s = sqrt(u²+v²)`` at centers, magnetic field
    ``B = (−∂yA, ∂xA)/h``, relative vorticity ``ω``, and physical
    velocities (SWMHD_example.jl:67-72, divergence_sw_mhd.jl:63-75,
    test_example.jl:123-125)."""
    g = model.grid
    gamma = getattr(model, "A_background_gradient_y", 0.0)
    u, v = model.velocities(state)
    Bx, By = magnetic_field_cc(state.A, state.h, g, gamma)
    A_total = state.A
    if gamma:
        A_total = state.A + gamma * g.nodes("cc")[1]
    out = {
        "u": u,
        "v": v,
        "s": jnp.sqrt(op.ix_c(u, g) ** 2 + op.iy_c(v, g) ** 2),
        "Bx": Bx,
        "By": By,
        "omega": op.vorticity_ff(u, v, g),
        "h": state.h,
        "A": A_total,
    }
    if h0 is not None:
        out["eta"] = state.h - h0
    return out


def cfl_numbers(model, state, dt):
    """(advective CFL, gravity-wave CFL) for a step size ``dt`` — the
    stability diagnostics behind adaptive stepping. Advective:
    max(|u|/Δx + |v|/Δy)·Δt; surface gravity wave: max(√(g h))·(1/Δx +
    1/Δy)·Δt."""
    g = model.grid
    u, v = model.velocities(state)
    adv = jnp.max(jnp.abs(u)) / g.dx + jnp.max(jnp.abs(v)) / g.dy
    wave = jnp.sqrt(model.gravitational_acceleration
                    * jnp.max(state.h)) * (1.0 / g.dx + 1.0 / g.dy)
    return adv * dt, wave * dt


def reference_kinetic_energy(u, v, h, grid: Grid):
    """∫ ½ h (u²+v²) with staggered fields read index-aligned (no
    interpolation) — mirroring the reference's lazy-expression functional
    `mean((1/2)*h*(u^2+v^2))*Lx*Ly` (SWMHD_example.jl:74) as evaluated
    over C-grid indices. For smooth fields this differs from
    :func:`kinetic_energy` at O(Δ²); for grid-scale structure the
    interpolated form systematically undercounts (the difference reached
    2.5 deviation units on the 64² low_B_low_U run — see VALIDATION.md),
    so validation against the recorded envelopes must use this form."""
    return _integral(0.5 * h * (u * u + v * v), grid)


def reference_magnetic_energy(A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """∫ ½ h (Bx²+By²) with Bx = −∂yA/h read at (c,f), By = ∂xA/h at
    (f,c), squared in place and h read index-aligned — the reference's
    `B_x = -∂y(A)/h` derived-field diagnostic (SWMHD_example.jl:70-71,75)
    without relocation. Equals ∫ ½ |∇A|²/h on the staggered points."""
    dyA = op.ddy_f(A, grid) + A_bg_grad_y
    dxA = op.ddx_f(A, grid)
    return _integral(0.5 * (dyA * dyA + dxA * dxA) / h, grid)


def reference_energy_report(model, state, h0):
    """Scalar energies in the reference's own (index-aligned) functional
    convention — the apples-to-apples quantities for comparing against
    the recorded energy_plots/*.png baselines."""
    g = model.grid
    gamma = getattr(model, "A_background_gradient_y", 0.0)
    if getattr(model, "formulation", "") == "conservative":
        # mean(½(1/h)(uh²+vh²)) — divergence_sw_mhd.jl:71
        uh, vh = state.u, state.v
        ke = _integral(0.5 * (uh * uh + vh * vh) / state.h, g)
    else:
        u, v = model.velocities(state)
        ke = reference_kinetic_energy(u, v, state.h, g)
    me = reference_magnetic_energy(state.A, state.h, g, gamma)
    pe = potential_energy(state.h, h0, model.gravitational_acceleration, g)
    return {
        "kinetic_energy": ke,
        "magnetic_energy": me,
        "potential_energy": pe,
        "total_energy": ke + me + pe,
    }


def energy_report(model, state, h0):
    """All scalar diagnostics in one jit-friendly dict."""
    g = model.grid
    gamma = getattr(model, "A_background_gradient_y", 0.0)
    u, v = model.velocities(state)
    ke = kinetic_energy(u, v, state.h, g)
    me = magnetic_energy(state.A, state.h, g, gamma)
    pe = potential_energy(state.h, h0, model.gravitational_acceleration, g)
    return {
        "kinetic_energy": ke,
        "magnetic_energy": me,
        "potential_energy": pe,
        "total_energy": ke + me + pe,
        "cross_helicity": cross_helicity(u, v, state.A, state.h, g, gamma),
        "enstrophy": enstrophy(u, v, g),
        **extrema_report(u, v, state.h, state.A, g),
    }
