"""Fused Pallas RK3 substage — the single-chip speed-of-light path (M3).

The XLA path executes one RK3 substage as a long chain of stencil ops,
each round-tripping every intermediate through HBM (~40x bandwidth-of-
light, measured). This module fuses one ENTIRE tendency evaluation + the
low-storage update into one Pallas kernel; an RK3 step is 3 kernel launches.

Design (chosen over a 3-substage mega-kernel, whose 3x-unrolled WENO graph
blew the 16 MB scoped-VMEM limit and took Mosaic >9 min to compile):

  - decomposition is along x (sublane) ONLY: each kernel instance owns a
    full-width row block. The lane dimension then needs NO halo — the full
    row is resident in VMEM, so a concat-based roll along y is an *exact*
    periodic wrap, and Mosaic's 128-lane DMA alignment constraint never
    meets a halo slice;
  - in x the state is pre-padded by H (8-aligned, >= the composed stencil
    radius of one substage) with a cheap XLA wrap-concat; each instance
    DMAs its (Tx + 2H, Ny) window HBM->VMEM, runs the *identical* tendency
    code as the XLA path (operators' roll hook pointed at a local
    concat-shift), and writes back only the valid Tx interior;
  - the Le-Moin update s' = s + dt (gamma G + zeta G_prev) happens
    in-kernel: G_prev rides along as a tile input, G as a tile output
    (skipped where zeta/gamma make them dead), so per step the HBM traffic
    is ~41 field transfers instead of the XLA path's several hundred.

Reference behavior being accelerated: the per-(i,j,k) tendency + forcing
evaluation inside Oceananigans' time stepper (SURVEY §3.1 hot loop;
jacobian_formulation/sw_mhd_jacobian_functions.jl:20-26 called per point).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..grid import Grid, PERIODIC
from ..models.state import State, Clock
from ..models.shallow_water import (
    ShallowWaterModel, RK3_GAMMA, RK3_ZETA)
from .. import operators as op_mod

try:  # pallas is TPU/interpret-only; import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# Composed stencil radius of the widest single tendency evaluation (WENO5
# reconstruction 3 + flux divergence 1 + transport/Lorentz chains); 6 is
# validated by the interpret-mode equality tests in tests/test_fused.py.
SUBSTAGE_RADIUS = 6

# Mosaic f32 tiling: sublane-dim DMA offsets/shapes must be 8-aligned.
SUBLANE = 8
DEFAULT_HALO = 8  # >= SUBSTAGE_RADIUS, 8-aligned


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _tile_roll(a, shift, axis):
    """Concat-based roll usable inside a Pallas TPU kernel.

    Along the full-width lane axis this is an exact periodic wrap. Along
    the padded sublane axis it brings garbage into a ring < |shift| wide
    at the window edge; every consumer only needs validity up to the halo
    distance from the edge, and the kernel crops the halo before writing."""
    size = a.shape[axis]
    shift = shift % size
    if shift == 0:
        return a
    lo = jax.lax.slice_in_dim(a, size - shift, size, axis=axis)
    hi = jax.lax.slice_in_dim(a, 0, size - shift, axis=axis)
    return jax.lax.concatenate([lo, hi], dimension=axis)


def _mosaic_roll(a, shift, axis):
    """Native Mosaic lane/sublane rotate (same wrap semantics as above)."""
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def _make_kernel_roll(interpret: bool):
    """Roll impl for one kernel trace, memoized on (tracer, shift, axis).

    Pallas lowers the traced jaxpr to Mosaic with NO common-subexpression
    elimination, and the operator algebra re-derives identical shifts all
    over the tendency graph (WENO left/right stencils, Lorentz chains).
    Deduplicating shifts at trace time cuts the Mosaic graph — and its
    compile time — by a large factor. Entries pin their input tracer so
    id() keys cannot be recycled."""
    import os
    use_mosaic = os.environ.get("SWMHD_MOSAIC_ROLL", "0") == "1"
    base = _tile_roll if (interpret or not use_mosaic) else _mosaic_roll
    memo = {}

    def roll(a, shift, axis):
        key = (id(a), shift % a.shape[axis], axis)
        hit = memo.get(key)
        if hit is not None and hit[0] is a:
            return hit[1]
        r = base(a, shift, axis)
        memo[key] = (a, r)
        return r

    return roll


def default_tile_x(Nx: int, Ny: int, halo: int = DEFAULT_HALO,
                   vmem_budget: int = 12 * 2 ** 20,
                   live_windows: int = 24) -> int:
    """Largest 8-aligned Tx dividing Nx whose working set (~live_windows
    full-width temporaries of the WENO tendency graph) fits the budget."""
    cap = max(SUBLANE, vmem_budget // (live_windows * Ny * 4) - 2 * halo)
    t = min(Nx, cap - cap % SUBLANE)
    t = max(t, SUBLANE)
    while Nx % t:
        t -= SUBLANE
        if t <= 0:
            raise ValueError(f"no 8-aligned tile divides Nx={Nx}")
    return t


def fused_step_fn(model: ShallowWaterModel, dt: float, n_steps: int = 1,
                  tile_x: int | None = None, halo: int | None = None,
                  interpret: bool = False):
    """Jittable ``state -> state`` advancing ``n_steps`` fused RK3 steps.

    Requirements: doubly-periodic topology; ``tile_x`` ≡ 0 (mod 8)
    dividing Nx. ``halo`` (default 8) must be >= the composed per-substage
    stencil radius (6) and 8-aligned."""
    g = model.grid
    if g.topology_x != PERIODIC or g.topology_y != PERIODIC:
        raise ValueError("fused step supports periodic topology only")

    H = DEFAULT_HALO if halo is None else halo
    if H < SUBSTAGE_RADIUS:
        raise ValueError(f"halo {H} < required {SUBSTAGE_RADIUS}")
    Tx = default_tile_x(g.Nx, g.Ny, H) if tile_x is None else tile_x
    if g.Nx % Tx:
        raise ValueError(f"tile_x {Tx} does not divide Nx={g.Nx}")
    Px = Tx + 2 * H  # padded window height
    Ny = g.Ny

    # Tendencies on the padded window use a local grid: same spacings;
    # periodic rolls (x-garbage ring < H cropped before writeback, y exact).
    local_grid = dataclasses.replace(
        g, Nx=Px, Lx=g.dx * Px)
    local_model = dataclasses.replace(model, grid=local_grid)

    def make_kernel(gamma: float, zeta: float, write_G: bool):
        has_prev = zeta != 0.0

        def kernel(time_ref, *refs):
            i = pl.program_id(0)
            srcs = refs[:4]                       # padded fields in HBM
            k = 4
            prevs = refs[k:k + 4] if has_prev else ()   # G_prev tiles (VMEM)
            k += 4 if has_prev else 0
            outs = refs[k:k + 4]                  # updated field tiles
            k += 4
            gouts = refs[k:k + 4] if write_G else ()
            k += 4 if write_G else 0
            buf, sems = refs[k], refs[k + 1]

            copies = []
            for n, src in enumerate(srcs):
                dma = pltpu.make_async_copy(
                    src.at[pl.ds(i * Tx, Px), :], buf.at[n], sems.at[n])
                dma.start()
                copies.append(dma)
            for dma in copies:
                dma.wait()

            clock = Clock(time=time_ref[0], iteration=jnp.int32(0))
            st = State(h=buf[0], u=buf[1], v=buf[2], A=buf[3], clock=clock)

            prev_roll = op_mod.set_roll_impl(_make_kernel_roll(interpret))
            try:
                G = local_model.tendencies(st)
            finally:
                op_mod.set_roll_impl(prev_roll)

            Gt = (G.h, G.u, G.v, G.A)
            for n in range(4):
                g_tile = Gt[n][H:H + Tx, :]
                s_tile = buf[n][H:H + Tx, :]
                upd = s_tile + dt * gamma * g_tile
                if has_prev:
                    upd = upd + dt * zeta * prevs[n][...]
                outs[n][...] = upd
                if write_G:
                    gouts[n][...] = g_tile

        return kernel

    grid_dims = (g.Nx // Tx,)
    tile_spec = pl.BlockSpec((Tx, Ny), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    field_shape = jax.ShapeDtypeStruct((g.Nx, Ny), g.dtype)

    def make_call(gamma, zeta, write_G):
        has_prev = zeta != 0.0
        n_out = 8 if write_G else 4
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pl.ANY)] * 4
                    + ([tile_spec] * 4 if has_prev else []))
        return pl.pallas_call(
            make_kernel(gamma, zeta, write_G),
            grid=grid_dims,
            in_specs=in_specs,
            out_specs=(tile_spec,) * n_out,
            out_shape=(field_shape,) * n_out,
            scratch_shapes=[
                pltpu.VMEM((4, Px, Ny), g.dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )

    calls = [make_call(RK3_GAMMA[0], RK3_ZETA[0], True),
             make_call(RK3_GAMMA[1], RK3_ZETA[1], True),
             make_call(RK3_GAMMA[2], RK3_ZETA[2], False)]

    def pad(f):
        return jnp.concatenate([f[-H:], f, f[:H]], axis=0)

    def one_step(state: State) -> State:
        fields = (state.h, state.u, state.v, state.A)
        tarr = state.clock.time.reshape(1).astype(g.dtype)
        G_prev = ()
        for s, call in enumerate(calls):
            out = call(tarr, *map(pad, fields), *G_prev)
            fields, G_prev = out[:4], out[4:]
        return State(h=fields[0], u=fields[1], v=fields[2], A=fields[3],
                     clock=state.clock.tick(dt))

    if n_steps == 1:
        return one_step

    def fn(state: State) -> State:
        out, _ = jax.lax.scan(lambda s, _: (one_step(s), None), state,
                              None, length=n_steps)
        return out

    return fn
