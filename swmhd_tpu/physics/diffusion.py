"""Laplacian and biharmonic diffusion closures.

The reference scripts run inviscid (no closure anywhere in the 8 files), but
the BASELINE north-star names "biharmonic/Laplacian diffusion" as part of the
finite-volume dynamical core, and Oceananigans' ShallowWaterModel accepts
them; high-resolution production runs need the hyperviscous sink. Both are
plain operator compositions — XLA fuses them into the tendency.

Staggered Laplacians:
  center field  c: ∇²c = ∂xᶜ(∂xᶠ c) + ∂yᶜ(∂yᶠ c)
  x-face field  u: ∇²u = ∂xᶠ(∂xᶜ u) + ∂yᶜ(∂yᶠ u)   (u at (f,c))
  y-face field  v: ∇²v = ∂xᶜ(∂xᶠ v) + ∂yᶠ(∂yᶜ v)   (v at (c,f))
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax

from ..grid import Grid
from .. import operators as op


def laplacian_u(u, grid: Grid):
    return op.ddx_f(op.ddx_c(u, grid), grid) + op.ddy_c(op.ddy_f(u, grid), grid)


def laplacian_v(v, grid: Grid):
    return op.ddx_c(op.ddx_f(v, grid), grid) + op.ddy_f(op.ddy_c(v, grid), grid)


def laplacian_c(c, grid: Grid):
    return op.ddx_c(op.ddx_f(c, grid), grid) + op.ddy_c(op.ddy_f(c, grid), grid)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu", "kappa"])
@dataclasses.dataclass(frozen=True)
class LaplacianDiffusion:
    """ν∇² on momentum, κ∇² on tracers."""
    nu: float = 0.0
    kappa: float = 0.0
    halo = 1

    def tendency_u(self, u, grid):
        return self.nu * laplacian_u(u, grid)

    def tendency_v(self, v, grid):
        return self.nu * laplacian_v(v, grid)

    def tendency_c(self, c, grid):
        return self.kappa * laplacian_c(c, grid)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["nu", "kappa"])
@dataclasses.dataclass(frozen=True)
class BiharmonicDiffusion:
    """−ν∇⁴ on momentum, −κ∇⁴ on tracers (scale-selective)."""
    nu: float = 0.0
    kappa: float = 0.0
    halo = 2

    def tendency_u(self, u, grid):
        return -self.nu * laplacian_u(laplacian_u(u, grid), grid)

    def tendency_v(self, v, grid):
        return -self.nu * laplacian_v(laplacian_v(v, grid), grid)

    def tendency_c(self, c, grid):
        return -self.kappa * laplacian_c(laplacian_c(c, grid), grid)
