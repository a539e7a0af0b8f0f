"""Shallow-water MHD Lorentz force, both reference formulations, array form.

The physics: with magnetic potential A (advected as a tracer), the magnetic
field is B = (−∂y A, ∂x A)/h and the Lorentz acceleration on the momentum
equations is (B·∇)B-like; the reference implements it two mathematically
equivalent ways:

  1. **Jacobian form** (reference: jacobian_formulation/
     sw_mhd_jacobian_functions.jl:1-26): force_u = (1/h̄ˣ)·J_x(A, B),
     force_v = (1/h̄ʸ)·J_y(A, B) built from 2nd-order centered C-grid
     stencils. Applied to (u, v) in the vector-invariant model.

  2. **Divergence form** (reference: divergence_formulation/
     sw_mhd_divergence_functions.jl:38-170): ∇·(hB⊗B) computed as an
     advective flux divergence where hB is the "transport" (symmetric
     2-pt interpolation) and B the "advected" field (3rd-order upwind-biased
     reconstruction, 1st-order one-sided near Bounded walls). Applied to
     (uh, vh) in the conservative model.

Every Julia per-point closure composition maps 1:1 to whole-array operator
composition because all inner operators are shift-linear; the nonlinear
upwind selection is pointwise after reconstruction.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grid import Grid
from .. import operators as op
from ..advection import (
    upwind_biased_product,
    left3_x_f, right3_x_f, left3_y_f, right3_y_f,
    left3_x_c, right3_x_c, left3_y_c, right3_y_c,
)


# -- magnetic field diagnostics -------------------------------------------------

def magnetic_field_cc(A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """B at cell centers: (Bx, By) = (−ℑyᶜ(∂yᶠA), ℑxᶜ(∂xᶠA))/h.

    Matches the jacobian-form `Bx`/`By` (sw_mhd_jacobian_functions.jl:1-7)
    and the derived-field diagnostics `B_x = -∂y(A)/h`, `B_y = ∂x(A)/h`
    (SWMHD_example.jl:70-71).

    ``A_bg_grad_y`` γ: the prognostic A is a perturbation on a static
    linear background γ·y (the low_B_low_U uniform field with its wall
    gradient BCs, SWMHD_example.jl:19 / divergence_sw_mhd.jl:34); the
    background's y-derivative is added analytically — exact everywhere
    including Bounded walls, where a stencil could not be."""
    Bx = -op.iy_c(op.ddy_f(A, grid) + A_bg_grad_y, grid) / h
    By = op.ix_c(op.ddx_f(A, grid), grid) / h
    return Bx, By


def magnetic_field_faces(A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """Face-staggered B of the divergence form: Bx at (f,c), By at (c,f)
    (sw_mhd_divergence_functions.jl:134-140). Also returns the h-free
    numerators hBx/hBy (:142-148) used as the transport field."""
    hBx = -op.ixy_fc(op.ddy_f(A, grid) + A_bg_grad_y, grid)   # (f,c)
    hBy = op.ixy_cf(op.ddx_f(A, grid), grid)    # (c,f)
    Bx = hBx / op.ix_f(h, grid)
    By = hBy / op.iy_f(h, grid)
    return Bx, By, hBx, hBy


# -- jacobian formulation ---------------------------------------------------------

def lorentz_force_jacobian(A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """(force_u at (f,c), force_v at (c,f)) — the vector-invariant forcing.

    Array transcription of lorentz_force_func_x/y
    (sw_mhd_jacobian_functions.jl:20-26):

        force_u = (1/ℑxᶠh) [ ∂xᶠA · ℑxyᶠᶜ(∂yᶠ Bx) − ℑxyᶠᶜ(∂yᶠA) · ∂xᶠ Bx ]
        force_v = (1/ℑyᶠh) [ ℑxyᶜᶠ(∂xᶠA) · ∂yᶠ By − ∂yᶠA · ℑxyᶜᶠ(∂xᶠ By) ]

    with Bx = −ℑyᶜ(∂yᶠA)/h and By = ℑxᶜ(∂xᶠA)/h at centers.
    ``A_bg_grad_y``: see :func:`magnetic_field_cc`."""
    dAdx_f = op.ddx_f(A, grid)                        # (f,c)
    dAdy_f = op.ddy_f(A, grid) + A_bg_grad_y          # (c,f)

    Bx = -op.iy_c(dAdy_f, grid) / h
    By = op.ix_c(dAdx_f, grid) / h

    jac_x = (dAdx_f * op.ixy_fc(op.ddy_f(Bx, grid), grid)
             - op.ixy_fc(dAdy_f, grid) * op.ddx_f(Bx, grid))
    jac_y = (op.ixy_cf(dAdx_f, grid) * op.ddy_f(By, grid)
             - dAdy_f * op.ixy_cf(op.ddx_f(By, grid), grid))

    force_u = jac_x / op.ix_f(h, grid)
    force_v = jac_y / op.iy_f(h, grid)
    return force_u, force_v


# -- divergence formulation --------------------------------------------------------

def lorentz_force_divergence(A, h, grid: Grid, A_bg_grad_y: float = 0.0):
    """(force_uh at (f,c), force_vh at (c,f)) = ∇·(hB⊗B) — the conservative
    forcing div_lorentz_x/y (sw_mhd_divergence_functions.jl:162-170).

    Flux assembly mirrors the reference exactly:
      flux_hBx_bx (c,c): ũ = ℑxᶜ(hBx);  B̃x = 3rd-order biased x-recon of Bx
      flux_hBy_bx (f,f): ṽ = ℑxᶠ(hBy);  B̃x = biased y-recon of Bx
      flux_hBx_by (f,f): ũ = ℑyᶠ(hBx);  B̃y = biased x-recon of By
      flux_hBy_by (c,c): ṽ = ℑyᶜ(hBy);  B̃y = biased y-recon of By
    each weighted by the face area, divergence divided by cell area
    (:59,83,107,131,163-169)."""
    Bx, By, hBx, hBy = magnetic_field_faces(A, h, grid, A_bg_grad_y)

    Ax, Ay, Az = grid.Ax, grid.Ay, grid.Az

    # x-momentum: (1/Az)[δxᶠ(flux_hBx_bx) + δyᶜ(flux_hBy_bx)]
    u_t = op.ix_c(hBx, grid)
    flux_xx = Ax * upwind_biased_product(
        u_t, left3_x_c(Bx, grid), right3_x_c(Bx, grid))        # (c,c)
    v_t = op.ix_f(hBy, grid)
    flux_yx = Ay * upwind_biased_product(
        v_t, left3_y_f(Bx, grid), right3_y_f(Bx, grid))        # (f,f)
    force_uh = (op.dx_f(flux_xx, grid) + op.dy_c(flux_yx, grid)) / Az

    # y-momentum: (1/Az)[δxᶜ(flux_hBx_by) + δyᶠ(flux_hBy_by)]
    u_t2 = op.iy_f(hBx, grid)
    flux_xy = Ax * upwind_biased_product(
        u_t2, left3_x_f(By, grid), right3_x_f(By, grid))       # (f,f)
    v_t2 = op.iy_c(hBy, grid)
    flux_yy = Ay * upwind_biased_product(
        v_t2, left3_y_c(By, grid), right3_y_c(By, grid))       # (c,c)
    force_vh = (op.dx_c(flux_xy, grid) + op.dy_f(flux_yy, grid)) / Az

    return force_uh, force_vh
