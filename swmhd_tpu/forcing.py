"""Forcing hooks — the array analog of Oceananigans' discrete-form Forcing.

The reference attaches the Lorentz force as
``forcing = (u = Forcing(lorentz_force_func_x, discrete_form=true), v = …)``
(jacobian_formulation/SWMHD_example.jl:30-31) or on (uh, vh)
(divergence_formulation/divergence_sw_mhd.jl:28-29). Here a forcing is any
callable ``(grid, clock, fields) -> array`` returning the whole tendency
contribution at the prognostic's staggering; these helpers build the two
standard SWMHD forcings.
"""

from __future__ import annotations

from .physics.lorentz import lorentz_force_jacobian, lorentz_force_divergence


def jacobian_lorentz_forcing(A_bg_grad_y: float = 0.0):
    """Forcing dict for the vector-invariant model:
    {(u, v): (1/h̄ˣ)J_x(A,B), (1/h̄ʸ)J_y(A,B)}
    (sw_mhd_jacobian_functions.jl:20-26). The tuple key makes one callable
    supply both components so the shared B-field subgraph is traced once.
    ``A_bg_grad_y``: static linear-background gradient of A (see
    physics.lorentz.magnetic_field_cc)."""
    def f(grid, clock, fields):
        return lorentz_force_jacobian(fields["A"], fields["h"], grid,
                                      A_bg_grad_y)

    return {("u", "v"): f}


def divergence_lorentz_forcing(A_bg_grad_y: float = 0.0):
    """Forcing dict for the conservative model:
    {(uh, vh): div_lorentz_x, div_lorentz_y}
    (sw_mhd_divergence_functions.jl:162-170)."""
    def f(grid, clock, fields):
        return lorentz_force_divergence(fields["A"], fields["h"], grid,
                                        A_bg_grad_y)

    return {("uh", "vh"): f}
