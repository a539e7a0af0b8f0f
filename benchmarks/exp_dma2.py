"""Probe which DMA slice patterns Mosaic lowers (wrap-DMA design space).

Each case copies into a (1, 48, N) VMEM scratch then writes out the
interior 32 rows; what varies is how source/destination are sliced.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from jax.experimental import pallas as pl            # noqa: E402
from jax.experimental.pallas import tpu as pltpu     # noqa: E402

N = 1024
TX, H = 32, 8
PX = TX + 2 * H


def probe(case):
    def kernel(src, out, buf, sem, sems3):
        i = pl.program_id(0)
        if case == "window":           # round-1 pattern: one padded window
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i * TX, PX), :], buf.at[0], sem)
            dma.start(); dma.wait()
        elif case == "dst3d":          # full window into dim-1-sliced dst
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i * TX, PX), :],
                buf.at[0, pl.ds(0, PX), :], sem)
            dma.start(); dma.wait()
        elif case == "src8":           # 8-row source slice, affine offset
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i * TX, H), :],
                buf.at[0, pl.ds(0, H), :], sem)
            dma.start(); dma.wait()
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i * TX, PX), :], buf.at[0], sem)
            dma.start(); dma.wait()
        elif case == "when":           # conditional start, matched wait
            @pl.when(i > 0)
            def _():
                pltpu.make_async_copy(
                    src.at[pl.ds(i * TX, H), :],
                    buf.at[0, pl.ds(0, H), :], sems3.at[0]).start()

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(
                    src.at[pl.ds(N - H, H), :],
                    buf.at[0, pl.ds(0, H), :], sems3.at[0]).start()

            pltpu.make_async_copy(
                src.at[pl.ds(0, H), :],
                buf.at[0, pl.ds(0, H), :], sems3.at[0]).wait()
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i * TX, PX), :], buf.at[0], sem)
            dma.start(); dma.wait()
        out[...] = buf[0, H:H + TX, :] + 1.0

    call = pl.pallas_call(
        kernel,
        grid=(N // TX,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((TX, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, PX, N), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((3,))],
    )
    x = jnp.arange(N * N, dtype=jnp.float32).reshape(N, N) * 1e-6

    def fn(a):
        a = jnp.concatenate([a[-H:], a, a[:H]], axis=0)
        return call(a)

    try:
        t0 = time.perf_counter()
        out = jax.jit(fn)(x)
        float(jnp.sum(out))
        print(f"[{case}] OK compile {time.perf_counter()-t0:.1f}s",
              flush=True)
    except Exception as e:
        print(f"[{case}] FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


for c in os.environ.get("SWMHD_DMA2", "window,dst3d,src8,when").split(","):
    probe(c)
