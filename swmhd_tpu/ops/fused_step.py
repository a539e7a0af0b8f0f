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
    # r3: with the shared-beta WENO pairs the graph carries more shifts,
    # and concat-based slices now beat native rotates (~6% at 2048^2:
    # 6.56e8 vs 6.20e8 pts/s per-call-synced; equal at 4096^2) — flipped
    # back to concat by default. SWMHD_MOSAIC_ROLL=1 restores rotates.
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


def _vmem_limit_bytes():
    """Scoped-VMEM limit for the fused kernel, by device generation.

    The unrolled tendency's live set (~82 MB at Tx=32, Ny=2048 with
    double-buffered windows) exceeds Mosaic's default scoped limit, so on
    generations with 128 MiB physical VMEM per core (v4/v5e/v5p/v6e) the
    limit is raised to 114 MiB. Older 16 MiB-class generations (v2/v3)
    keep the compiler default rather than inheriting a v5e constant."""
    import os
    env = os.environ.get("SWMHD_VMEM_LIMIT_MB")
    if env:
        return int(env) * 2 ** 20
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        kind = ""
    # tunneled/relay PJRT clients may not report a kind; fall back to the
    # generation env some harnesses provide
    kind = kind or os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    if any(t in kind for t in ("v4", "v5", "v6")):
        return 114 * 2 ** 20
    return None


def default_tile_x(Nx: int, Ny: int, halo: int = DEFAULT_HALO,
                   vmem_budget: int = 12 * 2 ** 20,
                   live_windows: int = 24) -> int:
    """Largest 8-aligned Tx dividing Nx whose working set (~live_windows
    full-width temporaries of the WENO tendency graph) fits the budget,
    floored at 32 rows: with the 8+8-row halo, Tx=16 recomputes 50% of
    every window (measured r4 at 4096²: 9.84e8 pts/s at Tx=16 vs
    1.059e9 at Tx=32, while Tx=64 drops back to 9.7e8 — less window
    pipelining), and Tx=32 keeps the working set ~19 MB even at
    Ny=4096, well under the 114 MiB scoped-VMEM limit."""
    cap = max(SUBLANE, vmem_budget // (live_windows * Ny * 4) - 2 * halo)
    if _vmem_limit_bytes() is not None:
        # The 32-row floor is a throughput heuristic measured under the
        # raised (114 MiB-class) scoped-VMEM limit; on generations where
        # _vmem_limit_bytes() is None (v2/v3, ~16 MiB compiler default)
        # flooring past the budget-derived cap could exceed VMEM at large
        # Ny and fail at first compile instead of auto-shrinking
        # (advisor r4) — keep the pure budget cap there.
        cap = max(cap, 32)
    t = min(Nx, cap - cap % SUBLANE)
    t = max(t, SUBLANE)
    while Nx % t:
        t -= SUBLANE
        if t <= 0:
            raise ValueError(f"no 8-aligned tile divides Nx={Nx}")
    return t


def build_fused_calls(model: ShallowWaterModel, dt: float,
                      tile_x: int | None = None, halo: int | None = None,
                      interpret: bool = False):
    """The three per-substage Pallas calls plus their geometry.

    Each call maps x-PADDED fields (Nx+2H, Ny) (+ G_prev tiles after the
    first substage) -> x-padded updated fields (+ G tiles): rows
    [H, H+Nx) of the outputs carry the Le-Moin update wherever the input
    pad rows carried valid neighbor data; rows [0,H) and [Nx+H, Nx+2H)
    are additionally written with the periodic wrap of the interior (the
    single-chip fast path feeds substages back-to-back without an XLA
    re-pad; a sharded caller crops them and re-exchanges instead).
    Returns (calls, Tx, H)."""
    g = model.grid

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
            outs = refs[k:k + 4]                  # padded updated fields
            k += 4
            gouts = refs[k:k + 4] if write_G else ()
            k += 4 if write_G else 0
            buf, ubuf, sems, osems, esems = refs[k:k + 5]

            # Double-buffered window reads: grid step i consumes slot i%2
            # and prefetches window i+1 into the other slot, so the HBM
            # read of the next window overlaps this window's tendency
            # compute (the grid iterates sequentially on one core; scratch
            # persists across steps).
            last = grid_dims[0] - 1
            slot = i % 2

            def read(window, into, n, src):
                return pltpu.make_async_copy(
                    src.at[pl.ds(window * Tx, Px), :],
                    buf.at[into, n], sems.at[into, n])

            for n, src in enumerate(srcs):
                @pl.when(i == 0)
                def _(n=n, src=src):
                    read(i, slot, n, src).start()
                    if last > 0:  # static: ntiles > 1
                        read(i + 1, 1 - slot, n, src).start()

                @pl.when((i > 0) & (i < last))
                def _(n=n, src=src):
                    read(i + 1, 1 - slot, n, src).start()
            for n, src in enumerate(srcs):
                read(i, slot, n, src).wait()

            clock = Clock(time=time_ref[0], iteration=jnp.int32(0))
            st = State(h=buf[slot, 0], u=buf[slot, 1], v=buf[slot, 2],
                       A=buf[slot, 3], clock=clock)

            prev_roll = op_mod.set_roll_impl(_make_kernel_roll(interpret))
            try:
                G = local_model.tendencies(st)
            finally:
                op_mod.set_roll_impl(prev_roll)

            # Updated fields are written back PADDED via manual DMA: the
            # interior lands at rows [H + i*Tx, H + i*Tx + Tx) and the two
            # edge tiles also write the wrap rows (first tile -> the top
            # pad, last tile -> the bottom pad), so the output feeds the
            # next substage directly — the XLA wrap-pad pass between
            # substages disappears (a full read+write of every field per
            # substage at 2048²). All DMA offsets are non-negative affine
            # in the program id or constants; Mosaic cannot lower offsets
            # whose static range goes negative (e.g. i*Tx - H), which
            # rules out the read-side wrap-DMA alternative. Writes are
            # double-buffered like the reads: step i stages into ubuf slot
            # i%2 and only waits for the write it issued two steps ago.
            Gt = (G.h, G.u, G.v, G.A)

            def write(step, from_slot, n):
                return pltpu.make_async_copy(
                    ubuf.at[from_slot, n],
                    outs[n].at[pl.ds(H + step * Tx, Tx), :],
                    osems.at[from_slot, n])

            def write_wait(from_slot, n):
                # waits only consume (semaphore, byte count): a constant-
                # offset descriptor avoids emitting slices whose static
                # offset range goes negative (Mosaic rejects those).
                pltpu.make_async_copy(
                    ubuf.at[from_slot, n],
                    outs[n].at[pl.ds(H, Tx), :],
                    osems.at[from_slot, n]).wait()

            for n in range(4):
                g_tile = Gt[n][H:H + Tx, :]
                s_tile = buf[slot, n][H:H + Tx, :]
                upd = s_tile + dt * gamma * g_tile
                if has_prev:
                    upd = upd + dt * zeta * prevs[n][...]

                @pl.when(i >= 2)
                def _(n=n):
                    write_wait(slot, n)

                ubuf[slot, n, :, :] = upd
                if write_G:
                    gouts[n][...] = g_tile
                write(i, slot, n).start()

                @pl.when(i == 0)
                def _(n=n):
                    d = pltpu.make_async_copy(
                        ubuf.at[slot, n, pl.ds(0, H), :],
                        outs[n].at[pl.ds(g.Nx + H, H), :], esems.at[n])
                    d.start()
                    d.wait()

                @pl.when(i == last)
                def _(n=n):
                    d = pltpu.make_async_copy(
                        ubuf.at[slot, n, pl.ds(Tx - H, H), :],
                        outs[n].at[pl.ds(0, H), :], esems.at[n])
                    d.start()
                    d.wait()

                # drain: the final grid step leaves its own write and (for
                # more than one tile) the previous step's in flight.
                @pl.when(i == last)
                def _(n=n):
                    write_wait(slot, n)
                    if last > 0:
                        write_wait(1 - slot, n)

        return kernel

    grid_dims = (g.Nx // Tx,)
    tile_spec = pl.BlockSpec((Tx, Ny), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tile_shape = jax.ShapeDtypeStruct((g.Nx, Ny), g.dtype)
    padded_shape = jax.ShapeDtypeStruct((g.Nx + 2 * H, Ny), g.dtype)

    def make_call(gamma, zeta, write_G):
        has_prev = zeta != 0.0
        # Fields ride in HBM explicitly (under a raised vmem limit the
        # compiler may promote ANY-space inputs to VMEM, where dynamic
        # DMA slices fail to lower); interpret mode has no HBM space.
        field_space = pl.ANY if interpret else pltpu.MemorySpace.HBM
        field_spec = pl.BlockSpec(memory_space=field_space)
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [field_spec] * 4
                    + ([tile_spec] * 4 if has_prev else []))
        out_specs = (field_spec,) * 4 + ((tile_spec,) * 4 if write_G else ())
        out_shape = ((padded_shape,) * 4
                     + ((tile_shape,) * 4 if write_G else ()))
        kwargs = {}
        if not interpret:
            limit = _vmem_limit_bytes()
            if limit:
                kwargs["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=limit)
        return pl.pallas_call(
            make_kernel(gamma, zeta, write_G),
            grid=grid_dims,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, 4, Px, Ny), g.dtype),  # window slots
                pltpu.VMEM((2, 4, Tx, Ny), g.dtype),  # updated-tile slots
                pltpu.SemaphoreType.DMA((2, 4)),      # window reads
                pltpu.SemaphoreType.DMA((2, 4)),      # interior writes
                pltpu.SemaphoreType.DMA((4,)),        # edge wrap writes
            ],
            interpret=interpret,
            **kwargs,
        )

    calls = [make_call(RK3_GAMMA[0], RK3_ZETA[0], True),
             make_call(RK3_GAMMA[1], RK3_ZETA[1], True),
             make_call(RK3_GAMMA[2], RK3_ZETA[2], False)]
    return calls, Tx, H


def fused_step_fn(model: ShallowWaterModel, dt: float, n_steps: int = 1,
                  tile_x: int | None = None, halo: int | None = None,
                  interpret: bool = False, diagnostics=None):
    """Jittable ``state -> state`` advancing ``n_steps`` fused RK3 steps.

    ``diagnostics`` follows the ``ShallowWaterModel.step_fn`` contract
    (a ``state -> {name: scalar}`` callable turns the return into
    ``(state, {name: (n_steps,) array})``), so the fused path slots into
    :class:`~swmhd_tpu.simulation.Simulation` via :class:`FusedStepper`.

    Requirements: PERIODIC x (the tiled/padded axis); y may be PERIODIC
    or BOUNDED — the kernel holds the full y row in VMEM, so the wall
    machinery's local indices coincide with global ones and the clamped
    shifts / wall-flux masks / no-penetration masks (all roll+where+iota
    form) are exact in-kernel. This gives the reference's bounded-wall
    scenario class (low_B_low_U, SWMHD_example.jl:18-19) the same fast
    path as the periodic runs. ``tile_x`` ≡ 0 (mod 8) dividing Nx;
    ``halo`` (default 8) must be >= the composed per-substage stencil
    radius (6) and 8-aligned."""
    g = model.grid
    if g.topology_x != PERIODIC:
        raise ValueError("fused step requires periodic x topology "
                         "(the tiled axis)")
    if not interpret and g.Ny % 128:
        raise ValueError(
            f"fused step needs Ny % 128 == 0 on TPU (Mosaic requires the "
            f"HBM window DMA's lane dim 128-aligned); Ny={g.Ny}")
    calls, Tx, H = build_fused_calls(model, dt, tile_x, halo, interpret)

    def pad(f):
        return jnp.concatenate([f[-H:], f, f[:H]], axis=0)

    def one_padded_step(pfields, clock):
        tarr = clock.time.reshape(1).astype(g.dtype)
        G_prev = ()
        for call in calls:
            out = call(tarr, *pfields, *G_prev)
            pfields, G_prev = out[:4], out[4:]
        return pfields, clock.tick(dt)

    def crop(pfields, clock) -> State:
        h, u, v, A = (f[H:H + g.Nx] for f in pfields)
        return State(h=h, u=u, v=v, A=A, clock=clock)

    def fn(state: State):
        pfields = tuple(pad(f) for f in
                        (state.h, state.u, state.v, state.A))

        if n_steps == 1 and diagnostics is None:
            pfields, clock = one_padded_step(pfields, state.clock)
        else:
            # in-scan time reconstructed from the step index (single
            # rounding; no f32 += dt drift — see step_fn's clock note)
            t0 = state.clock.time

            def body(carry, k):
                pf, clock = one_padded_step(*carry)
                clock = Clock(time=t0 + (k + 1).astype(t0.dtype) * dt,
                              iteration=clock.iteration)
                carry = (pf, clock)
                ys = (diagnostics(crop(*carry))
                      if diagnostics is not None else None)
                return carry, ys
            ks = jnp.arange(n_steps, dtype=jnp.int32)
            (pfields, clock), series = jax.lax.scan(
                body, (pfields, state.clock), ks)
            if diagnostics is not None:
                return crop(pfields, clock), series

        return crop(pfields, clock)

    return fn


def resident_vmem_bytes(model: ShallowWaterModel,
                        live_arrays: int = 44) -> int:
    """Rough VMEM working set of the resident kernel: state + G_prev +
    in/out blocks + the tendency graph's live temporaries, all full-size."""
    g = model.grid
    return live_arrays * g.Nx * g.Ny * jnp.dtype(g.dtype).itemsize


def resident_step_fn(model: ShallowWaterModel, dt: float, n_steps: int = 1,
                     interpret: bool = False, diagnostics=None):
    """Whole-state-resident fused RK3 stepper for small grids.

    ONE ``pallas_call`` advances ``n_steps`` full RK3 steps with every
    prognostic and temporary resident in VMEM: a ``fori_loop`` over
    3·n_steps substages runs the identical tendency code as the XLA and
    windowed-fused paths, with zero HBM round-trips between substages or
    steps and zero per-substage launch overhead. This is the 512² ladder
    rung fix (VERDICT r3 item 4): at small N the 3-launches-per-step
    windowed kernel is launch/pipeline-bound (~35% of the 2048² rate),
    while here the whole run is one launch.

    Because the full arrays are resident, every roll is an exact wrap in
    BOTH axes and wall machinery sees local == global indices — so ALL
    topology combinations are supported (unlike the windowed kernel's
    periodic-x restriction). Applicability is VMEM: roughly
    ``resident_vmem_bytes(model) <= the scoped limit`` (N≲768 f32 on a
    v5e-class core). Requires Nx % 8 == 0 and Ny % 8 == 0 on TPU —
    unlike the windowed kernel there are no manual HBM window DMAs, so
    the lane dim does NOT need 128-alignment: Mosaic pads sub-128-lane
    arrays in-register (verified on-chip at 64², where this kernel runs
    1.76x the XLA step and matches it to 1e-10 over 10 steps — r5).

    Reference behavior accelerated: the whole ``run!`` hot loop
    (SWMHD_example.jl:97, SURVEY §3.3) rather than one substage."""
    g = model.grid
    if not interpret:
        if g.Ny % SUBLANE:
            raise ValueError(f"resident step needs Ny % 8 == 0 on TPU; "
                             f"Ny={g.Ny}")
        if g.Nx % SUBLANE:
            raise ValueError(f"resident step needs Nx % 8 == 0 on TPU; "
                             f"Nx={g.Nx}")
    limit = _vmem_limit_bytes() or 16 * 2 ** 20
    need = resident_vmem_bytes(model)
    if not interpret and need > limit:
        raise ValueError(
            f"resident step working set ~{need >> 20} MiB exceeds the "
            f"VMEM limit {limit >> 20} MiB — use fused_step_fn")

    gam = tuple(float(x) for x in RK3_GAMMA)
    zet = tuple(float(x) for x in RK3_ZETA)

    def make_kernel(steps: int):
        def kernel(time_ref, h_ref, u_ref, v_ref, A_ref,
                   ho, uo, vo, Ao, sbuf, gbuf):
            outs = (ho, uo, vo, Ao)
            for n, r in enumerate((h_ref, u_ref, v_ref, A_ref)):
                sbuf[n] = r[...]
                gbuf[n] = jnp.zeros_like(r[...])  # zeta=0 at k=0; keep
                # the 0*G_prev product NaN-free on garbage scratch

            prev_roll = op_mod.set_roll_impl(_make_kernel_roll(interpret))
            try:
                def substage(k, carry):
                    stage0 = k % 3 == 0
                    stage2 = k % 3 == 2
                    # clock time is held fixed across the 3 substages of a
                    # step, exactly as the XLA path does (_local_step)
                    clock = Clock(time=time_ref[0]
                                  + (k // 3).astype(sbuf.dtype) * dt,
                                  iteration=jnp.int32(0))
                    st = State(h=sbuf[0], u=sbuf[1], v=sbuf[2],
                               A=sbuf[3], clock=clock)
                    G = local_model.tendencies(st)
                    # coefficients as explicit grid-dtype scalars: under
                    # x64 (f64 clock, r5) a bare python-float where would
                    # put 64-bit constants inside the kernel, which
                    # Mosaic rejects at lowering
                    cast = lambda x: jnp.asarray(x, sbuf.dtype)
                    gamma = jnp.where(stage0, cast(gam[0]),
                                      jnp.where(stage2, cast(gam[2]),
                                                cast(gam[1])))
                    zeta = jnp.where(stage0, cast(zet[0]),
                                     jnp.where(stage2, cast(zet[2]),
                                               cast(zet[1])))
                    for n, g_ in enumerate((G.h, G.u, G.v, G.A)):
                        sbuf[n] = sbuf[n] + dt * (gamma * g_
                                                  + zeta * gbuf[n])
                        gbuf[n] = g_
                    return carry
                # int32 bounds keep the induction variable 32-bit under
                # x64 (Mosaic rejects 64-bit types)
                jax.lax.fori_loop(jnp.int32(0), jnp.int32(3 * steps),
                                  substage, jnp.int32(0), unroll=False)
            finally:
                op_mod.set_roll_impl(prev_roll)

            for n in range(4):
                outs[n][...] = sbuf[n]
        return kernel

    local_model = model
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((g.Nx, g.Ny), g.dtype)
    kwargs = {}
    if not interpret:
        lim = _vmem_limit_bytes()
        if lim:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=lim)

    def make_call(steps: int):
        return pl.pallas_call(
            make_kernel(steps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
            out_specs=(spec,) * 4,
            out_shape=(shape,) * 4,
            scratch_shapes=[
                pltpu.VMEM((4, g.Nx, g.Ny), g.dtype),  # working state
                pltpu.VMEM((4, g.Nx, g.Ny), g.dtype),  # G_prev
            ],
            interpret=interpret,
            **kwargs,
        )

    def run_call(call, steps, state: State):
        tarr = state.clock.time.reshape(1).astype(g.dtype)
        h, u, v, A = call(tarr, state.h, state.u, state.v, state.A)
        clock = Clock(time=state.clock.time + steps * dt,
                      iteration=state.clock.iteration + steps)
        return State(h=h, u=u, v=v, A=A, clock=clock)

    if diagnostics is None:
        call = make_call(n_steps)

        def fn(state: State) -> State:
            return run_call(call, n_steps, state)
        return fn

    call1 = make_call(1)

    def fn(state: State):
        t0 = state.clock.time

        def body(s, k):
            s2 = run_call(call1, 1, s)
            # reconstructed time (see step_fn's clock note)
            s2 = s2.replace(clock=Clock(
                time=t0 + (k + 1).astype(t0.dtype) * dt,
                iteration=s2.clock.iteration))
            return s2, diagnostics(s2)
        return jax.lax.scan(body, state,
                            jnp.arange(n_steps, dtype=jnp.int32))
    return fn


class ResidentStepper:
    """Simulation-compatible wrapper around :func:`resident_step_fn`."""

    def __init__(self, model: ShallowWaterModel, interpret: bool = False):
        self.model = model
        self.interpret = interpret

    def step_fn(self, dt, n_steps: int = 1, diagnostics=None):
        return resident_step_fn(self.model, dt, n_steps=n_steps,
                                interpret=self.interpret,
                                diagnostics=diagnostics)


class FusedStepper:
    """Simulation-compatible wrapper: ``Simulation(model, ...,
    stepper=FusedStepper(model))`` drives production runs through the
    fused Pallas kernel instead of the XLA step graph, with the same
    schedules/writers/in-graph scalar series (``--fused`` on the CLI)."""

    def __init__(self, model: ShallowWaterModel,
                 tile_x: int | None = None, halo: int | None = None,
                 interpret: bool = False):
        self.model = model
        self.tile_x = tile_x
        self.halo = halo
        self.interpret = interpret

    def step_fn(self, dt, n_steps: int = 1, diagnostics=None):
        return fused_step_fn(self.model, dt, n_steps=n_steps,
                             tile_x=self.tile_x, halo=self.halo,
                             interpret=self.interpret,
                             diagnostics=diagnostics)
