"""Halo-slab fast path: the single-chip speed-of-light XLA step (M3).

The default step evaluates every C-grid shift as a ``jnp.roll``. XLA lowers
each static roll to concatenate-of-slices and — because each rolled value
has several consumers — materialises it (measured on TPU v5e: ~126
copy ops and 145 small fusions per RK3 step, ~40x the minimum HBM
traffic; see PERFORMANCE.md).

This module replaces rolls with *halo slabs*:

  - each prognostic field is wrap-padded ONCE per RK substage by the
    composed stencil radius E (one concatenate per axis) into a
    ``(Nx+2E, Ny+2E)`` slab;
  - every shift inside the tendency is then a pure ``lax.slice`` of a slab
    whose valid extent telescopes down per axis (a shift by ``s`` along an
    axis eats ``|s|`` of that axis' halo); binary ops crop operands to the
    common extents;
  - slices and elementwise ops fuse freely in XLA (a slice of a fusion
    parameter is just an indexed read — no duplication-cost heuristics),
    so the whole substage collapses into a handful of loop fusions whose
    HBM traffic is close to the 8-transfers-per-field minimum.

Results are *bitwise identical* to the roll-based path: the wrap-pad
followed by in-bounds slices reads exactly the same values in the same
order as periodic rolls.

The extent bookkeeping lives in :class:`Slab`, which quacks like an array
for the operator algebra (arithmetic dunders + ``abs``); the pluggable
roll hook in ``swmhd_tpu.operators`` routes shifts here during tracing.

Reference behavior accelerated: the per-(i,j,k) tendency + forcing hot
loop of the Oceananigans time stepper (SURVEY §3.1;
jacobian_formulation/sw_mhd_jacobian_functions.jl:20-26 called per point).
Periodic topology only — the bounded machinery needs global index masks
(advection._degrade_*) that the slab layer does not carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..grid import PERIODIC
from ..models.state import State
from ..models.shallow_water import ShallowWaterModel, RK3_GAMMA, RK3_ZETA
from .. import operators as op_mod


class Slab:
    """A 2-D field carried with ``(ex, ey)`` halo cells per side.

    ``data`` has shape ``(Nx + 2*ex, Ny + 2*ey)`` and
    ``data[i, j] == field[i - ex, j - ey]`` (periodic indexing).
    Shifts slice; binary ops crop to the common extents. All ops are
    XLA-fusible (no concatenate, no scatter).
    """

    __slots__ = ("data", "ex", "ey")

    def __init__(self, data, ex: int, ey: int):
        self.data = data
        self.ex = ex
        self.ey = ey

    # -- construction / deconstruction ---------------------------------------

    @staticmethod
    def pad(field, ex: int, ey: int | None = None) -> "Slab":
        """Wrap-pad a plain (Nx, Ny) array into a slab (periodic halo)."""
        ey = ex if ey is None else ey
        f = field
        if ex:
            f = jnp.concatenate([f[-ex:, :], f, f[:ex, :]], axis=0)
        if ey:
            f = jnp.concatenate([f[:, -ey:], f, f[:, :ey]], axis=1)
        return Slab(f, ex, ey)

    def crop(self, ex: int, ey: int) -> "Slab":
        """Slice down to smaller halo extents."""
        if ex == self.ex and ey == self.ey:
            return self
        if ex > self.ex or ey > self.ey:
            raise ValueError(
                f"cannot grow slab extent ({self.ex},{self.ey}) -> "
                f"({ex},{ey}); increase the initial pad")
        dx, dy = self.ex - ex, self.ey - ey
        nx, ny = self.data.shape
        return Slab(lax.slice(self.data, (dx, dy), (nx - dx, ny - dy)),
                    ex, ey)

    def interior(self):
        """The plain (Nx, Ny) array (extent-0 view)."""
        return self.crop(0, 0).data

    # -- the shift (jnp.roll semantics: out[i] = in[i - r]) -------------------

    def roll(self, r: int, axis: int) -> "Slab":
        if r == 0:
            return self
        e = self.ex if axis == 0 else self.ey
        e2 = e - abs(r)
        if e2 < 0:
            raise ValueError(
                f"slab shift {r} on axis {axis} exceeds remaining halo {e}")
        # out.data[k] = out[k - e2] = in[k - e2 - r] = data[k - e2 - r + e]
        start = abs(r) - r          # 0 for r>0, 2|r| for r<0
        nx, ny = self.data.shape
        if axis == 0:
            sl = lax.slice(self.data,
                           (start, 0), (start + nx - 2 * abs(r), ny))
            return Slab(sl, e2, self.ey)
        sl = lax.slice(self.data, (0, start), (nx, start + ny - 2 * abs(r)))
        return Slab(sl, self.ex, e2)

    # -- arithmetic -----------------------------------------------------------

    def _align(self, other):
        if isinstance(other, Slab):
            ex, ey = min(self.ex, other.ex), min(self.ey, other.ey)
            return self.crop(ex, ey).data, other.crop(ex, ey).data, ex, ey
        # scalars (python numbers / 0-d arrays) broadcast
        return self.data, other, self.ex, self.ey

    def __add__(self, o):
        a, b, ex, ey = self._align(o)
        return Slab(a + b, ex, ey)

    __radd__ = __add__

    def __sub__(self, o):
        a, b, ex, ey = self._align(o)
        return Slab(a - b, ex, ey)

    def __rsub__(self, o):
        a, b, ex, ey = self._align(o)
        return Slab(b - a, ex, ey)

    def __mul__(self, o):
        a, b, ex, ey = self._align(o)
        return Slab(a * b, ex, ey)

    __rmul__ = __mul__

    def __truediv__(self, o):
        a, b, ex, ey = self._align(o)
        return Slab(a / b, ex, ey)

    def __rtruediv__(self, o):
        a, b, ex, ey = self._align(o)
        return Slab(b / a, ex, ey)

    def __pow__(self, p):
        return Slab(self.data ** p, self.ex, self.ey)

    def __neg__(self):
        return Slab(-self.data, self.ex, self.ey)

    def __abs__(self):
        return Slab(jnp.abs(self.data), self.ex, self.ey)


def _slab_roll(a, r, axis):
    """Roll hook: slabs slice, plain arrays fall back to jnp.roll."""
    if isinstance(a, Slab):
        return a.roll(r, axis)
    return jnp.roll(a, r, axis)


def slab_tendencies(model: ShallowWaterModel, state: State,
                    extent: int | None = None) -> State:
    """One tendency evaluation through the slab layer.

    ``state`` holds plain (Nx, Ny) arrays; the result holds plain arrays.
    Bitwise identical to ``model.tendencies`` on periodic topology.
    """
    g = model.grid
    if g.topology_x != PERIODIC or g.topology_y != PERIODIC:
        raise ValueError("slab fast path supports periodic topology only")
    # +1 over the distributed exchange halo: the Slab extent accounting is
    # symmetric (a shift by s eats |s| of BOTH sides), so the shared-beta
    # WENO pairs' sh(beta, +1) — which in truth only shortens the minus-
    # side reach — is billed against the plus side too. One extra pad ring
    # costs a wider concat only, not extra compute.
    E = (model.exchange_halo + 1) if extent is None else extent
    st = state.replace(h=Slab.pad(state.h, E), u=Slab.pad(state.u, E),
                       v=Slab.pad(state.v, E), A=Slab.pad(state.A, E))
    prev = op_mod.set_roll_impl(_slab_roll)
    try:
        G = model.tendencies(st)
    finally:
        op_mod.set_roll_impl(prev)
    return state.replace(h=G.h.interior(), u=G.u.interior(),
                         v=G.v.interior(), A=G.A.interior())


def slab_step_fn(model: ShallowWaterModel, dt: float, n_steps: int = 1,
                 diagnostics=None):
    """Jittable ``state -> state`` advancing ``n_steps`` RK3 steps through
    the slab fast path. Same contract (and bitwise results) as
    ``model.step_fn`` on periodic topology.

    With ``diagnostics`` (a ``state -> {name: scalar}`` callable) returns
    ``state -> (state, {name: (n_steps,) series})`` like ``step_fn``.
    """
    g = model.grid
    if g.topology_x != PERIODIC or g.topology_y != PERIODIC:
        raise ValueError("slab fast path supports periodic topology only")

    def one_step(state: State) -> State:
        s = state
        G_prev = None
        for gamma, zeta in zip(RK3_GAMMA, RK3_ZETA):
            G = slab_tendencies(model, s)
            if G_prev is None:
                s = s.replace(
                    h=s.h + dt * gamma * G.h, u=s.u + dt * gamma * G.u,
                    v=s.v + dt * gamma * G.v, A=s.A + dt * gamma * G.A)
            else:
                s = s.replace(
                    h=s.h + dt * (gamma * G.h + zeta * G_prev.h),
                    u=s.u + dt * (gamma * G.u + zeta * G_prev.u),
                    v=s.v + dt * (gamma * G.v + zeta * G_prev.v),
                    A=s.A + dt * (gamma * G.A + zeta * G_prev.A))
            G_prev = G
        return s.replace(clock=state.clock.tick(dt))

    if n_steps == 1 and diagnostics is None:
        return one_step

    def one(s, _):
        s = one_step(s)
        ys = diagnostics(s) if diagnostics is not None else None
        return s, ys

    def fn(state: State):
        out, series = jax.lax.scan(one, state, None, length=n_steps)
        return (out, series) if diagnostics is not None else out

    return fn
