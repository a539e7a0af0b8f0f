"""Probe: 2-D-gridded fused tendency kernel — compile-time scaling law.

Round-1 x-only windows (Tx+2H, Ny) made Mosaic compile time grow with Ny
(PERFORMANCE.md). This probe grids BOTH dims with manual-DMA overlapping
windows from XLA-wrap-padded inputs, and measures, per configuration:

  - Mosaic compile seconds (the round-1 blocker),
  - runtime ms per substage at N (if compile succeeds),
  - allclose agreement with the XLA tendency path.

Configs via env:  SWMHD_PROBE="TX,TY,HY,split;TX,TY,HY,split;..."
  split in {full, mom, mt}.  HY is the y (lane) halo; DMA offsets are
  j*TY - HY + HY_pad so HY also probes the lane-alignment constraint.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl                     # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402

from bench import build                                        # noqa: E402
from swmhd_tpu import operators as op_mod                      # noqa: E402
from swmhd_tpu.models.state import State, Clock                # noqa: E402
from swmhd_tpu.ops.fused_step import _make_kernel_roll         # noqa: E402
import dataclasses                                             # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
HX = 8
model, state = build(N)
g = model.grid


def tendency_parts(local_model, st, split):
    if split == "full":
        G = local_model.tendencies(st)
        return (G.h, G.u, G.v, G.A)
    lg = local_model.grid
    import swmhd_tpu.operators as op
    from swmhd_tpu.advection import upwind_biased_product
    if split == "mom":
        u, v, h = st.u, st.v, st.h
        zeta = op.vorticity_ff(u, v, lg)
        vu, vv = local_model._weno_vorticity_flux(u, v, zeta, lg)
        K = op.kinetic_energy_cc(u, v, lg)
        Gu = vu - op.ddx_f(K + 9.81 * h, lg)
        Gv = vv - op.ddy_f(K + 9.81 * h, lg)
        Gu = Gu + local_model.coriolis.tendency_u(v, lg)
        Gv = Gv + local_model.coriolis.tendency_v(u, lg)
        zero = jnp.zeros_like(h)
        Gu, Gv, _, _ = local_model._apply_forcing(st, Gu, Gv, zero, zero)
        return (Gu, Gv)
    # mt: mass + tracer
    h, A, u, v = st.h, st.A, st.u, st.v
    ms = local_model.mass_advection
    Uf = upwind_biased_product(u, ms.left_x_f(h, lg), ms.right_x_f(h, lg))
    Vf = upwind_biased_product(v, ms.left_y_f(h, lg), ms.right_y_f(h, lg))
    divU = op.ddx_c_flux(Uf, lg) + op.ddy_c_flux(Vf, lg)
    GA = local_model._tracer_tendency(A, h, Uf, Vf, divU)
    return (-divU, GA)


def make_probe(TX, TY, HY, split):
    Px, Py = TX + 2 * HX, TY + 2 * HY
    local_grid = dataclasses.replace(g, Nx=Px, Ny=Py,
                                     Lx=g.dx * Px, Ly=g.dy * Py)
    local_model = dataclasses.replace(model, grid=local_grid)
    n_out = 4 if split == "full" else 2

    def kernel(*refs):
        i, j = pl.program_id(0), pl.program_id(1)
        srcs = refs[:4]
        outs = refs[4:4 + n_out]
        buf, sems = refs[4 + n_out], refs[5 + n_out]
        copies = []
        for n_, src in enumerate(srcs):
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i * TX, Px), pl.ds(j * TY, Py)],
                buf.at[n_], sems.at[n_])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        clock = Clock(time=jnp.float32(0.0), iteration=jnp.int32(0))
        st = State(h=buf[0], u=buf[1], v=buf[2], A=buf[3], clock=clock)
        prev = op_mod.set_roll_impl(_make_kernel_roll(False))
        try:
            G = tendency_parts(local_model, st, split)
        finally:
            op_mod.set_roll_impl(prev)
        for n_, gt in enumerate(G):
            outs[n_][...] = gt[HX:HX + TX, HY:HY + TY]

    tile_spec = pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(N // TX, N // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(tile_spec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((N, N), g.dtype),) * n_out,
        scratch_shapes=[pltpu.VMEM((4, Px, Py), g.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
    )

    def pad(f):
        f = jnp.concatenate([f[-HX:], f, f[:HX]], axis=0)
        return jnp.concatenate([f[:, -HY:], f, f[:, :HY]], axis=1)

    def fn(st):
        return call(pad(st.h), pad(st.u), pad(st.v), pad(st.A))

    return fn


def sync(x):
    return float(jnp.sum(x[0]))


def run_probe(TX, TY, HY, split):
    tag = f"TX={TX} TY={TY} HY={HY} {split}"
    try:
        fn = make_probe(TX, TY, HY, split)
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        c = jfn.lower(state).compile()
        t_compile = time.perf_counter() - t0
        print(f"[{tag}] compile {t_compile:7.1f}s", flush=True)
        out = c(state)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = c(state)
        sync(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"[{tag}] run {dt*1e3:8.2f} ms/substage-eval "
              f"({N*N/dt:.3e} pts/s-substage)", flush=True)
        # correctness vs XLA tendencies
        G = jax.jit(lambda s: model.tendencies(s))(state)
        ref = (G.h, G.u, G.v, G.A) if split == "full" else None
        if ref is not None:
            for name, a, b in zip(("h", "u", "v", "A"), out, ref):
                err = float(jnp.max(jnp.abs(a - b)))
                scale = float(jnp.max(jnp.abs(b))) + 1e-30
                print(f"[{tag}]   G{name} rel err {err/scale:.2e}", flush=True)
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


probes = os.environ.get(
    "SWMHD_PROBE",
    # Mosaic rejects lane windows that are not multiples of 128
    # (benchmarks/exp_dma.py), and lane width drives compile time
    # (PERFORMANCE.md) — so the minimum feasible lane window is
    # TY + 2*HY = 256 with HY = 64.
    "128,128,64,full;512,128,64,full;128,256,64,full;128,128,64,mom")
for spec in probes.split(";"):
    tx, ty, hy, split = spec.split(",")
    run_probe(int(tx), int(ty), int(hy), split)
