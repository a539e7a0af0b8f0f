"""Minimal probe: which (Px, Py) manual-DMA window shapes Mosaic accepts.

Isolates the 2-D fused-kernel DMA pattern (exp_fused2d.py) from the
tendency graph: copy a (Px, Py) window out of a padded HBM array into a
VMEM scratch, add 1, write the (TX, TY) interior back.
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


def probe(TX, TY, HX, HY, batch_scratch=True):
    Px, Py = TX + 2 * HX, TY + 2 * HY
    tag = f"TX={TX} TY={TY} HX={HX} HY={HY} batch={batch_scratch}"

    def kernel(src, out, buf, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        dst = buf.at[0] if batch_scratch else buf
        dma = pltpu.make_async_copy(
            src.at[pl.ds(i * TX, Px), pl.ds(j * TY, Py)], dst, sem)
        dma.start()
        dma.wait()
        b = buf[0] if batch_scratch else buf[...]
        out[...] = b[HX:HX + TX, HY:HY + TY] + 1.0

    scratch = (pltpu.VMEM((1, Px, Py), jnp.float32) if batch_scratch
               else pltpu.VMEM((Px, Py), jnp.float32))
    call = pl.pallas_call(
        kernel,
        grid=(N // TX, N // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TX, TY), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA],
    )

    x = jnp.arange(N * N, dtype=jnp.float32).reshape(N, N) * 1e-6

    def fn(a):
        a = jnp.concatenate([a[-HX:], a, a[:HX]], axis=0)
        a = jnp.concatenate([a[:, -HY:], a, a[:, :HY]], axis=1)
        return call(a)

    try:
        t0 = time.perf_counter()
        out = jax.jit(fn)(x)
        err = float(jnp.max(jnp.abs(out - (x + 1.0))))
        print(f"[{tag}] OK compile {time.perf_counter()-t0:.1f}s "
              f"err {err:.1e}", flush=True)
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


specs = os.environ.get(
    "SWMHD_DMA_PROBE",
    "128,128,8,8,1;128,128,8,8,0;128,128,8,64,1;128,128,8,128,1;"
    "128,1024,8,0,1;128,128,0,8,1")
for s in specs.split(";"):
    tx, ty, hx, hy, b = (int(v) for v in s.split(","))
    probe(tx, ty, hx, hy, bool(b))
