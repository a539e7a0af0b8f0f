"""Coriolis forces.

The reference uses ``FPlane(f=1)`` everywhere
(jacobian_formulation/SWMHD_example.jl:28,
divergence_formulation/divergence_sw_mhd.jl:26, test_example.jl:72,89).
On the C-grid the cross terms need 4-point corner means: the v felt by the
u-equation lives at (f,c) and is ℑxyᶠᶜ(v); symmetric for u in the v-equation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax

from ..grid import Grid
from .. import operators as op


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=["f"])
@dataclasses.dataclass(frozen=True)
class FPlane:
    """f-plane: constant Coriolis parameter."""
    f: float = 0.0

    def tendency_u(self, v, grid: Grid):
        """+f v̄ at (f,c): contribution to ∂t u (or ∂t uh with v = vh)."""
        return self.f * op.ixy_fc(v, grid)

    def tendency_v(self, u, grid: Grid):
        """−f ū at (c,f)."""
        return -self.f * op.ixy_cf(u, grid)
